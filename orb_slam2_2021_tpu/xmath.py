"""Precision-pinned linear algebra helpers.

This platform's default matmul precision is TPU-style (bf16 passes) even for
f32 inputs, which is fine for image kernels but fatal for Lie-group chains and
bundle-adjustment normal equations (g2o runs double; we run f32 + HIGHEST).
All geometry/optimizer contractions go through these helpers; hot perception
kernels deliberately do not.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def mm(a, b):
    """Matmul at full f32 precision."""
    return jnp.matmul(a, b, precision=HIGHEST)


def einsum(subscripts, *operands):
    """Einsum at full f32 precision."""
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)


def apply_R(R, x):
    """[..., 3, 3] @ [..., 3] -> [..., 3] at full precision."""
    return jnp.einsum("...ij,...j->...i", R, x, precision=HIGHEST)


# --- batched SMALL matmuls --------------------------------------------------
# A dot_general over a large batch of 3x3 / 3x6 operands runs the MXU at <1%
# tile utilization (and 6 bf16 passes under HIGHEST). Broadcast-multiply-sum
# keeps these on the VPU in exact f32 — the right mapping when the contracted
# dims are tiny and the batch is huge (per-observation Jacobian algebra).

def smm(a, b):
    """[..., m, k] @ [..., k, n] -> [..., m, n] (tiny m/k/n, huge batch)."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def smv(a, v):
    """[..., m, k] @ [..., k] -> [..., m]."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def stmv(a, v):
    """[..., k, m]^T-style contraction: sum_k a[..., k, m] * v[..., k]."""
    return jnp.sum(a * v[..., :, None], axis=-2)


def souter(a, b):
    """sum_r a[..., r, m] * b[..., r, n] -> [..., m, n] (J^T J blocks)."""
    return jnp.sum(a[..., :, :, None] * b[..., :, None, :], axis=-3)
