"""Pallas TPU kernel for the packed-descriptor Hamming distance matrix.

The XLA formulation (ops/hamming.py) computes the bits matmul and the
`pa + pb - 2*dot` epilogue as separate HLOs; profiling shows the epilogue's
f32 intermediate does not fuse into the matmul output, so the [N, M] matrix
crosses HBM twice and the kernel runs at ~25-35% of its bandwidth bound.
Here one Pallas kernel keeps the dot-product tile in VMEM, applies the
epilogue in-register, and writes the final int16 matrix ONCE — the minimal
traffic the function admits (two bit-matrix reads + one int16 write).

Tile scheme: grid (N/128, M/128); per program one [128, 256] x [256, 128]
MXU contraction (bf16 inputs, f32 accumulation — exact for {0,1} bits and
row popcounts <= 256) plus the row/column popcount broadcast epilogue.

MEASURED OUTCOME on this tunneled v5e install (r5): the fused kernel is
numerically identical to the XLA path but NOT faster (0.12-0.15 ms both
ways at 2000x2000) — the ~100 us per-dispatch floor of the remote-attached
runtime dominates both, and at this size the entire bandwidth bound is
~22 us. The kernel is kept (with a correctness test) as the deployment
path for pod-native installs where launch overhead is ~us and the fused
epilogue's single int16 write wins; the default matcher stays on the XLA
formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128


def _kernel(a_ref, b_ref, pa_ref, pb_ref, out_ref):
    dot = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = (
        pa_ref[:] + pb_ref[:] - 2.0 * dot
    ).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("n_pad", "m_pad", "interpret"))
def _hamming_matrix_pallas_padded(a_bits, b_bits, pa, pb, n_pad, m_pad,
                                  interpret=False):
    grid = (n_pad // _TILE, m_pad // _TILE)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((_TILE, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 256), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.int16),
    )(a_bits, b_bits, pa, pb)


def hamming_matrix_pallas(a, b, interpret: bool = False):
    """[N, 8] x [M, 8] uint32 -> [N, M] int16 — drop-in for
    ops.hamming.hamming_matrix on TPU (interpret=True runs the Pallas
    interpreter for CPU testing)."""
    from .hamming import unpack_bits

    N, M = a.shape[0], b.shape[0]
    n_pad = -(-N // _TILE) * _TILE
    m_pad = -(-M // _TILE) * _TILE
    A = unpack_bits(a)
    B = unpack_bits(b)
    pa = jnp.sum(A, axis=1, dtype=jnp.float32)[:, None]      # [N,1]
    pb = jnp.sum(B, axis=1, dtype=jnp.float32)[None, :]      # [1,M]
    if n_pad != N:
        A = jnp.pad(A, ((0, n_pad - N), (0, 0)))
        pa = jnp.pad(pa, ((0, n_pad - N), (0, 0)))
    if m_pad != M:
        B = jnp.pad(B, ((0, m_pad - M), (0, 0)))
        pb = jnp.pad(pb, ((0, 0), (0, m_pad - M)))
    out = _hamming_matrix_pallas_padded(A, B, pa, pb, n_pad, m_pad,
                                        interpret=interpret)
    return out[:N, :M]
