"""Motion-only pose optimization (the per-frame hot LM solve).

Replaces Optimizer::PoseOptimization (/root/reference/src/Optimizer.cc:
242-452): given 2D/3D feature-landmark matches for one frame, run 4 rounds of
10 Levenberg-Marquardt iterations on the 6-DoF pose; after each round
re-classify observations as inliers/outliers by the chi2 gates (5.991 mono /
7.815 stereo) and drop the Huber kernel in later rounds exactly like the
reference (Optimizer.cc:406-414: rounds >= 2 run without robust kernel).

All N observations are processed as dense [N, ...] tensors; the 6x6 normal
equations are accumulated with einsum at HIGHEST precision and solved in
closed form. The whole optimizer is one jitted program with lax control flow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OptimConfig
from ..geometry.camera import PinholeCamera
from ..geometry.se3 import se3_compose, se3_exp
from ..xmath import HIGHEST, smm
from .robust import (
    huber_weight,
    mono_residual,
    point_jacobian_pose,
    proj_jacobian_mono,
    proj_jacobian_stereo,
    stereo_residual,
)


class PoseObs(NamedTuple):
    """Padded observation set for one frame."""
    xw: jnp.ndarray        # [N, 3] world points
    uvr: jnp.ndarray       # [N, 3] (u, v, u_r); u_r < 0 => monocular obs
    inv_sigma2: jnp.ndarray  # [N] information scalar (per octave)
    valid: jnp.ndarray     # [N] bool


def _chi2(cam, R, t, obs: PoseObs):
    """Per-observation chi2 (stereo uses 3 residual dims, mono 2)."""
    Xc = jnp.einsum("ij,nj->ni", R, obs.xw, precision=HIGHEST) + t
    r3 = stereo_residual(cam, Xc, obs.uvr)
    r2 = mono_residual(cam, Xc, obs.uvr[:, :2])
    is_stereo = obs.uvr[:, 2] >= 0
    chi_s = jnp.sum(r3 * r3, axis=-1) * obs.inv_sigma2
    chi_m = jnp.sum(r2 * r2, axis=-1) * obs.inv_sigma2
    chi = jnp.where(is_stereo, chi_s, chi_m)
    behind = Xc[:, 2] <= 0.0
    return chi, behind


def _build_normal_eq(cam, R, t, obs: PoseObs, active, use_huber, chi2_mono, chi2_stereo):
    Xc = jnp.einsum("ij,nj->ni", R, obs.xw, precision=HIGHEST) + t
    is_stereo = obs.uvr[:, 2] >= 0

    r3 = stereo_residual(cam, Xc, obs.uvr)          # [N, 3]
    r2 = mono_residual(cam, Xc, obs.uvr[:, :2])     # [N, 2]
    Jp = point_jacobian_pose(Xc)                    # [N, 3, 6]
    J3 = -smm(proj_jacobian_stereo(cam, Xc), Jp)
    J2 = -smm(proj_jacobian_mono(cam, Xc), Jp)

    # unify mono into 3-dim residual with zeroed third row
    r = jnp.where(is_stereo[:, None], r3, jnp.pad(r2, ((0, 0), (0, 1))))
    J = jnp.where(is_stereo[:, None, None], J3, jnp.concatenate([J2, jnp.zeros_like(J2[:, :1])], axis=1))

    chi = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
    delta2 = jnp.where(is_stereo, chi2_stereo, chi2_mono)
    w_huber = jnp.where(use_huber, huber_weight(chi, delta2), 1.0)
    w = obs.inv_sigma2 * w_huber * active.astype(jnp.float32)

    H = jnp.einsum("nik,n,nil->kl", J, w, J, precision=HIGHEST)
    b = jnp.einsum("nik,n,ni->k", J, w, r, precision=HIGHEST)
    # robust total cost: Huber rho(chi2) inside/outside delta2
    rho = jnp.where(
        (chi <= delta2) | ~use_huber,
        chi,
        2.0 * jnp.sqrt(delta2 * jnp.maximum(chi, 1e-12)) - delta2,
    )
    err = jnp.sum(rho * active)
    return H, b, err


def _robust_cost(cam, R, t, obs: PoseObs, active, use_huber, chi2_mono, chi2_stereo):
    """Total robust cost only — no Jacobians (the LM accept test needs just
    the scalar, so skip the [N,3,6] products of _build_normal_eq)."""
    chi, _ = _chi2(cam, R, t, obs)
    delta2 = jnp.where(obs.uvr[:, 2] >= 0, chi2_stereo, chi2_mono)
    rho = jnp.where(
        (chi <= delta2) | ~use_huber,
        chi,
        2.0 * jnp.sqrt(delta2 * jnp.maximum(chi, 1e-12)) - delta2,
    )
    return jnp.sum(rho * active)


def pose_optimize(
    cam: PinholeCamera,
    R0,
    t0,
    obs: PoseObs,
    cfg: OptimConfig,
):
    """Returns (R, t, inlier_mask, n_inliers).

    Mirrors PoseOptimization's round structure: 4 x 10 LM iterations with
    chi2-gated outlier reclassification between rounds; observations behind
    the camera are outliers.
    """
    lam0 = jnp.float32(cfg.lm_lambda_init)

    def lm_round(carry, round_idx):
        R, t, inlier = carry
        use_huber = round_idx < 2  # reference: kernels removed in rounds 3-4

        def lm_iter(carry2, _):
            R, t, lam = carry2
            H, b, err = _build_normal_eq(
                cam, R, t, obs, inlier, use_huber, cfg.chi2_mono, cfg.chi2_stereo
            )
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
            # residual model r(delta) ~ r + J delta => delta = -H^-1 J^T W r
            delta = -jnp.linalg.solve(Hd, b)
            dR, dt = se3_exp(delta)
            Rn, tn = se3_compose(dR, dt, R, t)
            err_new = _robust_cost(
                cam, Rn, tn, obs, inlier, use_huber, cfg.chi2_mono, cfg.chi2_stereo
            )
            improved = err_new < err
            R = jnp.where(improved, Rn, R)
            t = jnp.where(improved, tn, t)
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
            return (R, t, lam), None

        (R, t, _), _ = jax.lax.scan(lm_iter, (R, t, lam0), None, length=cfg.pose_iters)

        chi, behind = _chi2(cam, R, t, obs)
        delta2 = jnp.where(obs.uvr[:, 2] >= 0, cfg.chi2_stereo, cfg.chi2_mono)
        inlier = obs.valid & (chi <= delta2) & (~behind)
        return (R, t, inlier), None

    inlier0 = obs.valid
    (R, t, inlier), _ = jax.lax.scan(
        lm_round, (R0, t0, inlier0), jnp.arange(cfg.pose_rounds)
    )
    return R, t, inlier, jnp.sum(inlier)


@functools.lru_cache(maxsize=4)
def make_pose_optimizer(cfg: OptimConfig):
    return jax.jit(functools.partial(pose_optimize, cfg=cfg))
