"""Camera-pose-from-scratch solver for relocalization (PnP RANSAC).

Fills the role of the reference's EPnP RANSAC (PnPsolver,
/root/reference/src/PnPsolver.cc:66-349): generate absolute-pose hypotheses
from 3D-2D matches with NO initial guess, score by reprojection inliers, and
hand the winner to motion-only LM for polish (Relocalization,
Tracking.cc:1368-1532 does PnP -> PoseOptimization).

Hypothesis generator: 6-point DLT (batched 12x12 eigen-decomposition +
orthonormalization), which vectorizes cleanly on the MXU — one vmapped batch
evaluates all RANSAC samples at once, versus the reference's sequential
5-iteration EPnP rounds. The acceptance policy mirrors the reference: inlier
threshold in pixels scaled per octave, minimum inlier count from the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..xmath import HIGHEST

MIN_SAMPLE = 6


def _dlt_pose(xw, uv, fx, fy, cx, cy):
    """[6,3] world points + [6,2] pixels -> (R, t, ok). Normalized DLT."""
    # normalize pixels to camera coords
    xn = (uv[:, 0] - cx) / fx
    yn = (uv[:, 1] - cy) / fy
    n = xw.shape[0]
    zeros = jnp.zeros((n, 4))
    Xh = jnp.concatenate([xw, jnp.ones((n, 1))], axis=1)  # [6,4]
    rows_u = jnp.concatenate([Xh, zeros, -xn[:, None] * Xh], axis=1)  # [6,12]
    rows_v = jnp.concatenate([zeros, Xh, -yn[:, None] * Xh], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # [12,12]
    AtA = jnp.einsum("ni,nj->ij", A, A, precision=HIGHEST)
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0].reshape(3, 4)
    # null-vector sign: sample depths (third projective row) must be positive
    z_proj = Xh @ p[2]
    p = jnp.where(jnp.sum(z_proj > 0) >= jnp.sum(z_proj < 0), p, -p)
    M = p[:, :3]
    # orthonormalize: M ~ lam * R with lam > 0 after the sign fix
    U, S, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(jnp.sign(det))
    R = U @ D @ Vt
    scale = jnp.mean(S)
    t = p[:, 3] / jnp.maximum(scale, 1e-12)
    ok = scale > 1e-9
    return R, t, ok


def epnp_ransac(
    key,
    xw, uv,             # [N,3] world points, [N,2] observed pixels
    sigma2,             # [N] per-obs sigma^2
    valid,              # [N]
    fx, fy, cx, cy,
    n_hyps: int = 256,
    chi2_th: float = 5.991,
):
    """Vmapped PnP RANSAC. Returns (R, t, inliers [N], n_inliers)."""
    n = xw.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    keys = jax.random.split(key, n_hyps)

    def reproj_inliers(R, t):
        Xc = jnp.einsum("ij,nj->ni", R, xw, precision=HIGHEST) + t
        z = Xc[:, 2]
        zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = fx * Xc[:, 0] / zsafe + cx
        v = fy * Xc[:, 1] / zsafe + cy
        e = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        return valid & (z > 0) & (e < chi2_th * sigma2)

    def one_hyp(k):
        idx = jax.random.choice(k, n, shape=(MIN_SAMPLE,), replace=False, p=probs)
        R, t, ok = _dlt_pose(xw[idx], uv[idx], fx, fy, cx, cy)
        inl = reproj_inliers(R, t)
        return jnp.where(ok, jnp.sum(inl), 0), R, t

    counts, Rs, ts = jax.vmap(one_hyp)(keys)
    best = jnp.argmax(counts)
    R, t = Rs[best], ts[best]
    inl = reproj_inliers(R, t)
    return R, t, inl, jnp.sum(inl)


@functools.lru_cache(maxsize=2)
def make_pnp_ransac(n_hyps: int = 256):
    return jax.jit(functools.partial(epnp_ransac, n_hyps=n_hyps))
