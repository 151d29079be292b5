"""Monocular two-view initializer tests (SURVEY.md §2 #15, Initializer.cc)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_2021_tpu.geometry.so3 import so3_exp
from orb_slam2_2021_tpu.solvers.two_view import make_two_view_init

FX = FY = 400.0
CX, CY = 320.0, 240.0


def make_pair(rng, n=200, planar=False, noise=0.3, baseline=0.4):
    """Two views of a scene; frame1 at identity, frame2 translated+rotated."""
    if planar:
        pts = np.stack(
            [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), np.full(n, 8.0)], 1
        ).astype(np.float32)
    else:
        pts = np.stack(
            [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(5, 15, n)], 1
        ).astype(np.float32)
    w = rng.standard_normal(3) * 0.03
    R = np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
    t = np.array([baseline, 0.02, 0.05], np.float32)

    def proj(x):
        return np.stack(
            [FX * x[:, 0] / x[:, 2] + CX, FY * x[:, 1] / x[:, 2] + CY], 1
        ).astype(np.float32)

    p1 = proj(pts)
    x2 = pts @ R.T + t
    p2 = proj(x2)
    p1 += rng.standard_normal(p1.shape).astype(np.float32) * noise
    p2 += rng.standard_normal(p2.shape).astype(np.float32) * noise
    in_img = (
        (p1[:, 0] > 0) & (p1[:, 0] < 640) & (p2[:, 0] > 0) & (p2[:, 0] < 640)
        & (p1[:, 1] > 0) & (p1[:, 1] < 480) & (p2[:, 1] > 0) & (p2[:, 1] < 480)
    )
    return p1, p2, in_img, R, t, pts


class TestTwoView:
    def test_general_scene(self, rng):
        p1, p2, valid, R_gt, t_gt, pts = make_pair(rng, planar=False)
        fn = make_two_view_init(256)
        res = fn(jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2),
                 jnp.asarray(valid), FX, FY, CX, CY)
        assert bool(res.ok), f"init failed, good={int(jnp.sum(res.good))}"
        R = np.asarray(res.R)
        t = np.asarray(res.t)
        np.testing.assert_allclose(R, R_gt, atol=2e-2)
        # translation up to scale
        t_dir = t / np.linalg.norm(t)
        g_dir = t_gt / np.linalg.norm(t_gt)
        assert np.abs(t_dir @ g_dir) > 0.995
        # triangulated points match scene up to the same scale
        good = np.asarray(res.good)
        assert good.sum() > 100
        X = np.asarray(res.points)[good]
        scale = np.median(X[:, 2] / pts[good][:, 2])
        rel = np.abs(X[:, 2] / scale - pts[good][:, 2]) / pts[good][:, 2]
        assert np.median(rel) < 0.05

    def test_planar_scene_uses_h(self, rng):
        p1, p2, valid, R_gt, t_gt, pts = make_pair(rng, planar=True)
        fn = make_two_view_init(256)
        res = fn(jax.random.PRNGKey(1), jnp.asarray(p1), jnp.asarray(p2),
                 jnp.asarray(valid), FX, FY, CX, CY)
        assert bool(res.used_h), "planar scene should select the homography"
        if bool(res.ok):
            np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=5e-2)

    def test_no_parallax_rejected(self, rng):
        # pure rotation: must NOT produce a map
        p1, p2, valid, R_gt, t_gt, pts = make_pair(rng, baseline=0.0, noise=0.1)
        fn = make_two_view_init(256)
        res = fn(jax.random.PRNGKey(2), jnp.asarray(p1), jnp.asarray(p2),
                 jnp.asarray(valid), FX, FY, CX, CY)
        assert not bool(res.ok)
