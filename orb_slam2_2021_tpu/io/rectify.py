"""Stereo undistortion + rectification.

Equivalent of the reference example's preprocessing
(/root/reference/Examples/Stereo/arducam_images.cpp:229-275): read the
LEFT./RIGHT. K, D, R, P blocks from the settings YAML, build
initUndistortRectifyMap-style sampling maps once, and remap every frame.

Map construction (host, once): for each rectified pixel, back-project with
P^-1, rotate by R^-1, apply the radial/tangential distortion model, project
with K. Per-frame remap is a jitted bilinear resample on device
(jax.scipy.ndimage.map_coordinates), so the per-frame cost rides the same
launch as the rest of the front-end instead of a CPU loop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass(frozen=True)
class RectifyMaps:
    map_y: np.ndarray  # [H, W] float32 source row per rectified pixel
    map_x: np.ndarray  # [H, W] float32 source col


def build_rectify_map(K, D, R, P, size: Tuple[int, int]) -> RectifyMaps:
    """size = (width, height) of the rectified output."""
    K = np.asarray(K, np.float64)
    D = np.asarray(D, np.float64).ravel()
    D = np.pad(D, (0, max(0, 5 - len(D))))[:5]
    R = np.asarray(R, np.float64)
    P = np.asarray(P, np.float64)
    w, h = size
    u, v = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    fx_p, fy_p = P[0, 0], P[1, 1]
    cx_p, cy_p = P[0, 2], P[1, 2]
    x = (u - cx_p) / fx_p
    y = (v - cy_p) / fy_p
    ones = np.ones_like(x)
    rays = np.stack([x, y, ones], axis=-1) @ R  # R^-1 applied as row-vector @ R
    xs = rays[..., 0] / rays[..., 2]
    ys = rays[..., 1] / rays[..., 2]
    k1, k2, p1, p2, k3 = D
    r2 = xs * xs + ys * ys
    rad = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    xd = xs * rad + 2 * p1 * xs * ys + p2 * (r2 + 2 * xs * xs)
    yd = ys * rad + p1 * (r2 + 2 * ys * ys) + 2 * p2 * xs * ys
    map_x = (K[0, 0] * xd + K[0, 2]).astype(np.float32)
    map_y = (K[1, 1] * yd + K[1, 2]).astype(np.float32)
    return RectifyMaps(map_y=map_y, map_x=map_x)


@functools.lru_cache(maxsize=8)
def _make_remap(h: int, w: int):
    import jax
    import jax.numpy as jnp
    from jax.scipy.ndimage import map_coordinates

    @jax.jit
    def remap(image, map_y, map_x):
        return map_coordinates(image, [map_y, map_x], order=1, mode="constant")

    return remap


def remap(image, maps: RectifyMaps):
    """Bilinear remap on device; out-of-source pixels read 0."""
    import jax.numpy as jnp

    fn = _make_remap(*maps.map_y.shape)
    return fn(jnp.asarray(image, jnp.float32),
              jnp.asarray(maps.map_y), jnp.asarray(maps.map_x))


def rectification_from_yaml(path: str):
    """(left_maps, right_maps) from a reference-format settings YAML with
    LEFT./RIGHT. K, D, R, P blocks (arducam.yaml; consumed by
    arducam_images.cpp:236-268). Raises KeyError if the blocks are absent
    (pre-rectified datasets like KITTI)."""
    from ..config import _parse_opencv_yaml

    scalars, mats = _parse_opencv_yaml(path)
    w = int(scalars.get("LEFT.width", scalars.get("Camera.width")))
    h = int(scalars.get("LEFT.height", scalars.get("Camera.height")))
    left = build_rectify_map(
        mats["LEFT.K"], mats["LEFT.D"], mats["LEFT.R"], mats["LEFT.P"], (w, h)
    )
    right = build_rectify_map(
        mats["RIGHT.K"], mats["RIGHT.D"], mats["RIGHT.R"], mats["RIGHT.P"], (w, h)
    )
    return left, right
