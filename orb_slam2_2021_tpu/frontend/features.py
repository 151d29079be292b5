"""ORB pyramid feature extraction — the jitted per-image front-end.

Equivalent of ORBextractor::operator()
(/root/reference/src/ORBextractor.cc:1041-1103): pyramid -> FAST per level ->
spatially-bucketed selection (quadtree intent) -> IC orientation -> blurred
rBRIEF descriptors -> keypoint coordinates scaled to level 0.

Per-level feature budgets follow the reference's geometric split
(ORBextractor.cc ctor: nDesiredFeatures * (1-1/s) / (1-1/s^L) per level).
The whole extraction is one jit-compiled function per (H, W, config).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OrbConfig
from ..ops.brief import brief_descriptors
from ..ops.fast import fast_detect
from ..ops.image import build_pyramid, gaussian_blur
from ..ops.orientation import ic_angles
from ..ops.select import select_keypoints


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set (capacity = OrbConfig.n_features)."""
    xy: jnp.ndarray        # [N, 2] float32, level-0 pixel coords (x, y)
    response: jnp.ndarray  # [N] float32
    octave: jnp.ndarray    # [N] int32
    angle: jnp.ndarray     # [N] float32 radians
    desc: jnp.ndarray      # [N, 8] uint32 packed 256-bit
    valid: jnp.ndarray     # [N] bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def level_feature_counts(n_features: int, n_levels: int, scale_factor: float):
    """Reference's per-level budget split (ORBextractor.cc:60-72)."""
    inv = 1.0 / scale_factor
    total = (1.0 - inv ** n_levels) / (1.0 - inv)
    counts = []
    for lvl in range(n_levels):
        counts.append(int(round(n_features * (inv ** lvl) / total)))
    # fix rounding drift so the sum is exactly n_features
    diff = n_features - sum(counts)
    counts[0] += diff
    return counts


def extract_orb(image, cfg: OrbConfig):
    """[H, W] float32 grayscale (0..255) -> Keypoints.

    Pure function of the image; jit with static cfg via make_extract_fn.
    """
    levels = build_pyramid(image, cfg.n_levels, cfg.scale_factor)
    counts = level_feature_counts(cfg.n_features, cfg.n_levels, cfg.scale_factor)

    all_xy, all_resp, all_oct, all_ang, all_desc, all_valid = [], [], [], [], [], []
    for lvl, (img_l, n_l) in enumerate(zip(levels, counts)):
        if n_l <= 0:
            continue
        strict, relaxed = fast_detect(
            img_l, float(cfg.ini_fast_th), float(cfg.min_fast_th), cfg.edge_threshold
        )
        ys, xs, resp, valid = select_keypoints(strict, relaxed, n_l, cfg.cell_size)
        ang = ic_angles(img_l, ys, xs)
        blurred = gaussian_blur(img_l, 7, 2.0)
        desc = brief_descriptors(blurred, ys, xs, ang)

        scale = cfg.scale_factor ** lvl
        xy = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], axis=-1) * scale
        all_xy.append(xy)
        all_resp.append(resp)
        all_oct.append(jnp.full((n_l,), lvl, jnp.int32))
        all_ang.append(ang)
        all_desc.append(desc)
        all_valid.append(valid)

    return Keypoints(
        xy=jnp.concatenate(all_xy, axis=0),
        response=jnp.concatenate(all_resp, axis=0),
        octave=jnp.concatenate(all_oct, axis=0),
        angle=jnp.concatenate(all_ang, axis=0),
        desc=jnp.concatenate(all_desc, axis=0),
        valid=jnp.concatenate(all_valid, axis=0),
    )


@functools.lru_cache(maxsize=8)
def make_extract_fn(cfg: OrbConfig):
    """jit-compiled extractor for a fixed config (shapes fixed by the image)."""
    return jax.jit(functools.partial(extract_orb, cfg=cfg))


def scale_factors(cfg: OrbConfig):
    """Per-octave scale, sigma^2 arrays (KeyFrame/MapPoint scale prediction)."""
    import numpy as np

    s = np.array([cfg.scale_factor ** i for i in range(cfg.n_levels)], np.float32)
    return jnp.asarray(s), jnp.asarray(s * s)
