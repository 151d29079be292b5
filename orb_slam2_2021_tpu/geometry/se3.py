"""SE(3): rigid transforms as (R: [..,3,3], t: [..,3]) pairs.

Replaces the reference's g2o::SE3Quat
(/root/reference/Thirdparty/g2o/g2o/types/se3quat.h:1-306) and Converter glue
(/root/reference/src/Converter.cc:27-151). Convention matches the reference:
Tcw maps world points to camera frame, x_c = R x_w + t.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..xmath import apply_R, mm
from .so3 import so3_exp, so3_hat, so3_log

_EPS = 1e-8


def se3_identity(batch_shape=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return R, t


def se3_from_Rt(R, t):
    return jnp.asarray(R), jnp.asarray(t)


def _V_matrix(w):
    """Left Jacobian of SO(3): V such that t = V @ upsilon in se3 exp."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    W = so3_hat(w)
    W2 = mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def se3_exp(xi):
    """[..., 6] twist (upsilon, omega) -> (R, t).

    Layout matches g2o: translation first, rotation last
    (se3quat.h exp uses [omega, upsilon]; we fix (v, w) and document it —
    callers only ever round-trip through our own log).
    """
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = _V_matrix(w)
    t = apply_R(V, v)
    return R, t


def se3_log(R, t):
    """(R, t) -> [..., 6] twist (v, w)."""
    w = so3_log(R)
    V = _V_matrix(w)
    v = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra, ta) ∘ (Rb, tb): apply b first, then a."""
    R = mm(Ra, Rb)
    t = apply_R(Ra, tb) + ta
    return R, t


def se3_inverse(R, t):
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -apply_R(Rinv, t)
    return Rinv, tinv


def se3_apply(R, t, x):
    """Apply transform to points x: [..., 3] (broadcasting over leading dims)."""
    return apply_R(R, x) + t


def mat44(R, t):
    """(R, t) -> [..., 4, 4] homogeneous matrix."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), (*batch, 1, 4)
    )
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def from_mat44(T):
    return T[..., :3, :3], T[..., :3, 3]
