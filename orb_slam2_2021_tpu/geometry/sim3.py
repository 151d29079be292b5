"""Sim(3): similarity transforms (s, R, t) for scale-drift-aware loop closure.

Replaces g2o::Sim3 (/root/reference/Thirdparty/g2o/g2o/types/sim3.h:1-307).
Represented as a tuple (s: [...], R: [..,3,3], t: [..,3]);  x' = s * R x + t.

exp/log use the standard Sim(3) closed form (Strasdat): t = W(w, sigma) @ v
with W = C*I + A*hat(w) + B*hat(w)^2 and Taylor fallbacks near theta=0 /
sigma=0 so the maps are smooth and invertible everywhere we use them.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..xmath import apply_R, mm
from .so3 import so3_exp, so3_hat, so3_log

_EPS = 1e-8


def sim3_identity(batch_shape=(), dtype=jnp.float32):
    s = jnp.ones(batch_shape, dtype=dtype)
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return s, R, t


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """a ∘ b (apply b first)."""
    s = sa * sb
    R = mm(Ra, Rb)
    t = sa[..., None] * apply_R(Ra, tb) + ta
    return s, R, t


def sim3_inverse(s, R, t):
    sinv = 1.0 / s
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -sinv[..., None] * apply_R(Rinv, t)
    return sinv, Rinv, tinv


def sim3_apply(s, R, t, x):
    return s[..., None] * apply_R(R, x) + t


def _W_matrix(w, sigma):
    """W such that t = W @ v in the Sim(3) exponential."""
    dtype = w.dtype
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    Wh = so3_hat(w)
    Wh2 = mm(Wh, Wh)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Wh.shape)

    s = jnp.exp(sigma)
    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta < 1e-5
    safe_sig = jnp.where(small_sig, 1.0, sigma)
    safe_th = jnp.where(small_th, 1.0, theta)
    safe_th2 = jnp.where(small_th, 1.0, theta2)

    # C: coefficient on I
    C = jnp.where(small_sig, 1.0 + 0.5 * sigma + sig2 / 6.0, (s - 1.0) / safe_sig)

    # sigma small branch
    A_ss = jnp.where(small_th, 0.5, (1.0 - jnp.cos(theta)) / safe_th2)
    B_ss = jnp.where(small_th, 1.0 / 6.0, (theta - jnp.sin(theta)) / (safe_th2 * safe_th))

    # sigma large branch
    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)
    c_ = theta2 + sig2
    A_ls_th = (a_ * sigma + (1.0 - b_) * theta) / (safe_th * jnp.where(c_ < _EPS, 1.0, c_))
    B_ls_th = (C - ((b_ - 1.0) * sigma + a_ * theta) / jnp.where(c_ < _EPS, 1.0, c_)) / safe_th2
    A_ls_0 = ((sigma - 1.0) * s + 1.0) / jnp.where(small_sig, 1.0, sig2)
    B_ls_0 = (s * 0.5 * sig2 + s - 1.0 - sigma * s) / jnp.where(small_sig, 1.0, sig2 * safe_sig)
    A_ls = jnp.where(small_th, A_ls_0, A_ls_th)
    B_ls = jnp.where(small_th, B_ls_0, B_ls_th)

    A = jnp.where(small_sig, A_ss, A_ls)
    B = jnp.where(small_sig, B_ss, B_ls)

    return (
        C[..., None, None] * eye
        + A[..., None, None] * Wh
        + B[..., None, None] * Wh2
    )


def sim3_exp(xi):
    """[..., 7] twist (upsilon, omega, sigma) -> (s, R, t). sigma is log-scale."""
    v, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(w)
    Wm = _W_matrix(w, sigma)
    t = apply_R(Wm, v)
    return s, R, t


def sim3_log(s, R, t):
    """(s, R, t) -> [..., 7] twist (v, w, sigma)."""
    sigma = jnp.log(s)
    w = so3_log(R)
    Wm = _W_matrix(w, sigma)
    v = jnp.linalg.solve(Wm, t[..., None])[..., 0]
    return jnp.concatenate([v, w, sigma[..., None]], axis=-1)
