"""Jitted device steps for the tracking front-end.

Each step fuses a matcher pass with the motion-only LM pose solve so one
device launch covers what the reference does in
TrackWithMotionModel/TrackLocalMap (Tracking.cc:887-948, 950-994): matching,
observation assembly, 4x10 LM with chi2 gating.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry.camera import PinholeCamera
from ..frontend.features import Keypoints
from ..frontend.matchers import match_last_frame, match_local_points
from ..optim.pose import PoseObs, pose_optimize
from ..xmath import HIGHEST


def _inv_sigma2(octave, scale_factor, n_levels):
    s2 = jnp.asarray(
        [scale_factor ** (2 * i) for i in range(n_levels)], jnp.float32
    )
    return 1.0 / jnp.take(s2, jnp.clip(octave, 0, n_levels - 1))


def _pose_obs_from_matches(kp: Keypoints, feat_ur, xw_per_feat, bound, cfg: SlamConfig):
    uvr = jnp.concatenate([kp.xy, feat_ur[:, None]], axis=1)
    return PoseObs(
        xw=xw_per_feat,
        uvr=uvr,
        inv_sigma2=_inv_sigma2(kp.octave, cfg.orb.scale_factor, cfg.orb.n_levels),
        valid=bound,
    )


def motion_track_step(
    cam: PinholeCamera,
    kp: Keypoints,
    feat_ur,
    R_pred, t_pred,
    last_xw, last_desc, last_octave, last_angle, last_valid,
    radius,
    cfg: SlamConfig,
):
    """SearchByProjection(cur, last) + PoseOptimization.

    Returns (R, t, match_slot [N] int32 last-frame slot per feature (-1),
    inlier [N] bool, n_inliers).
    """
    best_feat, accept, dist = match_last_frame(
        cam, kp, feat_ur, R_pred, t_pred,
        last_xw, last_desc, last_octave, last_angle, last_valid,
        cfg, radius,
    )
    n = kp.capacity
    # scatter query->feature matches into per-feature arrays
    slot = jnp.full((n,), -1, jnp.int32)
    qidx = jnp.arange(last_xw.shape[0], dtype=jnp.int32)
    slot = slot.at[jnp.where(accept, best_feat, n)].set(
        jnp.where(accept, qidx, -1), mode="drop"
    )
    bound = slot >= 0
    xw = jnp.take(last_xw, jnp.clip(slot, 0), axis=0)

    obs = _pose_obs_from_matches(kp, feat_ur, xw, bound, cfg)
    R, t, inlier, n_in = pose_optimize(cam, R_pred, t_pred, obs, cfg.optim)
    return R, t, slot, inlier, n_in, jnp.sum(bound)


def local_track_step(
    cam: PinholeCamera,
    kp: Keypoints,
    feat_ur,
    R0, t0,
    bound_xw,          # [N, 3] world pos for already-bound features
    bound_mask,        # [N] bool
    mp_pos, mp_normal, mp_min_dist, mp_max_dist, mp_desc, mp_valid,
    cfg: SlamConfig,
    th: float = 1.0,
):
    """SearchLocalPoints + final PoseOptimization (Tracking.cc:950-994).

    Returns (R, t, new_slot [N] int32 local-snapshot slot per feature (-1),
    inlier [N], n_inliers, visible [P]).
    """
    best_feat, accept, dist, visible = match_local_points(
        cam, kp, feat_ur, bound_mask, R0, t0,
        mp_pos, mp_normal, mp_min_dist, mp_max_dist, mp_desc, mp_valid,
        cfg, th,
    )
    n = kp.capacity
    slot = jnp.full((n,), -1, jnp.int32)
    qidx = jnp.arange(mp_pos.shape[0], dtype=jnp.int32)
    slot = slot.at[jnp.where(accept, best_feat, n)].set(
        jnp.where(accept, qidx, -1), mode="drop"
    )
    new_bound = slot >= 0
    xw = jnp.where(
        bound_mask[:, None], bound_xw,
        jnp.take(mp_pos, jnp.clip(slot, 0), axis=0),
    )
    all_bound = bound_mask | new_bound

    obs = _pose_obs_from_matches(kp, feat_ur, xw, all_bound, cfg)
    R, t, inlier, n_in = pose_optimize(cam, R0, t0, obs, cfg.optim)
    return R, t, slot, inlier, n_in, visible


@functools.lru_cache(maxsize=4)
def make_motion_track_fn(cfg: SlamConfig):
    return jax.jit(functools.partial(motion_track_step, cfg=cfg))


@functools.lru_cache(maxsize=4)
def make_local_track_fn(cfg: SlamConfig):
    return jax.jit(functools.partial(local_track_step, cfg=cfg), static_argnames=("th",))
