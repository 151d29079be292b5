"""Robust kernels and reprojection residual/Jacobian blocks shared by all
BA-family solvers (the analogue of g2o's EdgeSE3ProjectXYZ* types,
/root/reference/Thirdparty/g2o/g2o/types/types_six_dof_expmap.{h,cpp}).

Residual convention: e = z - proj(X_c), X_c = R X_w + t (Tcw). Pose updates
are left-multiplicative: T <- exp(delta) * T with delta = (v, w); for that
parametrization dX_c/dv = I, dX_c/dw = -[X_c]x.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.camera import PinholeCamera


def huber_weight(chi2, delta2):
    """g2o RobustKernelHuber weight rho'(e) for IRLS: 1 inside delta,
    delta/|e| outside (delta2 = delta^2)."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


def stereo_residual(cam: PinholeCamera, Xc, obs_uvr):
    """[..., 3] camera points, [..., 3] (u, v, u_r) observations -> residual
    [..., 3]."""
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * Xc[..., 0] * inv_z + cam.cx
    v = cam.fy * Xc[..., 1] * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    pred = jnp.stack([u, v, ur], axis=-1)
    return obs_uvr - pred


def mono_residual(cam: PinholeCamera, Xc, obs_uv):
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * Xc[..., 0] * inv_z + cam.cx
    v = cam.fy * Xc[..., 1] * inv_z + cam.cy
    return obs_uv - jnp.stack([u, v], axis=-1)


def proj_jacobian_stereo(cam: PinholeCamera, Xc):
    """d proj / d Xc for the stereo (u, v, u_r) projection: [..., 3, 3].

    (types_six_dof_expmap.cpp:112-200 analytic form, sign folded into the
    caller: d e / d Xc = -J.)
    """
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    row_r = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2 + cam.bf * iz2], axis=-1)
    return jnp.stack([row_u, row_v, row_r], axis=-2)


def proj_jacobian_mono(cam: PinholeCamera, Xc):
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def point_jacobian_pose(Xc):
    """d Xc / d delta for left-multiplicative pose update: [..., 3, 6]
    (columns: v then w)."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # [I | -[Xc]x]
    r0 = jnp.stack([one, zero, zero, zero, z, -y], axis=-1)
    r1 = jnp.stack([zero, one, zero, -z, zero, x], axis=-1)
    r2 = jnp.stack([zero, zero, one, y, -x, zero], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)
