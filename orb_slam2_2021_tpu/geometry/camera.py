"""Pinhole + stereo camera model.

Replaces the reference's scattered intrinsics handling (Frame.cc projection
math, Tracking.cc:60-153 settings parse). A `PinholeCamera` is a small pytree
of scalars so it can be passed through jit; `bf` = baseline * fx gives the
right-eye coordinate u_r = u - bf / z (Frame.cc:725-739, isInFrustum
Frame.cc:318-374).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    bf: jnp.ndarray  # baseline * fx (stereo); 0 for monocular
    width: int = 0   # static image size (not traced)
    height: int = 0

    @staticmethod
    def create(fx, fy, cx, cy, bf=0.0, width=0, height=0):
        f = jnp.float32
        return PinholeCamera(f(fx), f(fy), f(cx), f(cy), f(bf), int(width), int(height))

    @property
    def baseline(self):
        return self.bf / self.fx


def project_mono(cam: PinholeCamera, xc):
    """Camera-frame points [..., 3] -> pixel (u, v) [..., 2] and depth [...]."""
    z = xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * xc[..., 0] * inv_z + cam.cx
    v = cam.fy * xc[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1), z


def project_stereo(cam: PinholeCamera, xc):
    """Camera-frame points [..., 3] -> (u, v, u_r) [..., 3] and depth [...]."""
    uv, z = project_mono(cam, xc)
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur = uv[..., 0] - cam.bf * inv_z
    return jnp.concatenate([uv, ur[..., None]], axis=-1), z


def backproject(cam: PinholeCamera, uv, z):
    """Pixels [..., 2] + depth [...] -> camera-frame points [..., 3]."""
    x = (uv[..., 0] - cam.cx) * z / cam.fx
    y = (uv[..., 1] - cam.cy) * z / cam.fy
    return jnp.stack([x, y, z], axis=-1)
