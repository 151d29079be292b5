"""Nonlinear optimization backend — JAX Levenberg-Marquardt solvers.

Replaces the reference's g2o stack (/root/reference/src/Optimizer.cc +
Thirdparty/g2o): motion-only pose optimization, local/global bundle
adjustment with Schur-complement landmark elimination, Sim3 relative-pose
refinement and the essential-graph Sim3 pose graph. All solvers are
shape-static jitted programs over padded observation tensors; robust Huber
weighting and the chi2 gates match the reference's thresholds
(OptimConfig: 5.991 mono / 7.815 stereo).
"""

from .pose import pose_optimize
from .robust import huber_weight

__all__ = ["pose_optimize", "huber_weight"]
