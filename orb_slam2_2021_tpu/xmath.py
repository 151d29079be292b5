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
