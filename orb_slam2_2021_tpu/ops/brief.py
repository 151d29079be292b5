"""Rotated BRIEF (rBRIEF) 256-bit descriptors.

Role of ORBextractor::computeOrbDescriptor
(/root/reference/src/ORBextractor.cc:105-151): sample 256 intensity pairs
around the keypoint on the blurred level image, rotated by the keypoint's
orientation, and pack the comparisons into a 256-bit string.

The reference ships OpenCV's learned `bit_pattern_31_` table
(ORBextractor.cc:153-411). We do NOT reuse it: descriptor bit layout needs no
compatibility with any external vocabulary here (we train our own), so the
sampling pattern is generated once from a fixed PRNG seed — isotropic
Gaussian pairs (sigma = patch/5, the original BRIEF recipe) clipped to a disc
of radius 13 so rotated samples stay inside the EDGE_THRESHOLD=19 border the
detector already enforces (13 * sqrt2 < 19).

Sampling all keypoints x 512 points is one flat gather; packing is a
[N, 8, 32] dot with bit weights -> uint32[8] words per descriptor.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

N_BITS = 256
PATTERN_RADIUS = 13.0
PATTERN_SIGMA = 31.0 / 5.0


@functools.lru_cache(maxsize=1)
def brief_pattern():
    """[256, 2, 2] float32: (pair, endpoint, (y, x)). Fixed seed."""
    rng = np.random.default_rng(0x0FB1_5EED)
    pts = []
    while len(pts) < N_BITS * 2:
        p = rng.normal(0.0, PATTERN_SIGMA, size=2)
        if float(p @ p) <= PATTERN_RADIUS * PATTERN_RADIUS:
            pts.append(p)
    # host constant: cached across jit traces (see ops/image._gaussian_kernel)
    return np.asarray(pts, dtype=np.float32).reshape(N_BITS, 2, 2)


@functools.lru_cache(maxsize=1)
def _bit_weights():
    return (np.uint32(1) << np.arange(32, dtype=np.uint32)).astype(np.uint32)


def brief_descriptors(blurred, ys, xs, angles):
    """Descriptors for N keypoints on one (blurred) pyramid level.

    blurred: [H, W] float32; ys/xs: [N] int32 level coords; angles: [N] rad.
    Returns [N, 8] uint32 (256 bits packed little-endian per word).
    """
    h, w = blurred.shape
    pat = brief_pattern()  # [256, 2, 2] (y, x)
    ca = jnp.cos(angles)[:, None]  # [N, 1]
    sa = jnp.sin(angles)[:, None]

    py = pat[None, :, :, 0].reshape(1, -1)  # [1, 512]
    px = pat[None, :, :, 1].reshape(1, -1)

    # rotate: row = x sin + y cos, col = x cos - y sin (ORBextractor.cc:117-118 semantics)
    ry = jnp.round(px * sa + py * ca).astype(jnp.int32) + ys[:, None]
    rx = jnp.round(px * ca - py * sa).astype(jnp.int32) + xs[:, None]
    ry = jnp.clip(ry, 0, h - 1)
    rx = jnp.clip(rx, 0, w - 1)

    flat = blurred.reshape(-1)
    vals = jnp.take(flat, ry * w + rx, axis=0)  # [N, 512]
    vals = vals.reshape(vals.shape[0], N_BITS, 2)
    bits = (vals[..., 0] < vals[..., 1])  # [N, 256]

    words = bits.reshape(-1, 8, 32).astype(jnp.uint32)
    packed = jnp.sum(words * _bit_weights()[None, None, :], axis=-1, dtype=jnp.uint32)
    return packed
