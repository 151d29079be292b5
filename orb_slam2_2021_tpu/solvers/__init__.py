"""Geometric RANSAC solvers (the reference's L5 layer).

All solvers evaluate every RANSAC hypothesis in parallel (vmapped closed
forms) instead of the reference's sequential 5-iteration batches
(SURVEY.md §2 parallelism table):
- horn_sim3: 3-point similarity (Sim3Solver.cc)
- epnp: P4P camera pose for relocalization (PnPsolver.cc)
- two_view: H/F model selection + reconstruction for monocular init
  (Initializer.cc)
"""

from .horn_sim3 import sim3_ransac, horn_align
from .epnp import epnp_ransac

__all__ = ["sim3_ransac", "horn_align", "epnp_ransac"]
