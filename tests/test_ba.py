"""Schur-complement bundle adjustment tests on synthetic multi-camera
problems (SURVEY.md §4: LM convergence; §7 hard part 'Schur-complement BA')."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_2021_tpu.config import OptimConfig
from orb_slam2_2021_tpu.geometry.camera import PinholeCamera
from orb_slam2_2021_tpu.geometry.so3 import so3_exp
from orb_slam2_2021_tpu.optim.ba import BAProblem, make_local_ba

CFG = OptimConfig(local_ba_iters1=5, local_ba_iters2=10)
CAM = PinholeCamera.create(400.0, 400.0, 320.0, 240.0, bf=80.0, width=640, height=480)


def build_problem(
    rng, n_cams=6, n_pts=120, obs_per_pt=4, noise=0.2,
    pose_err=0.02, point_err=0.05, n_fixed=2, stereo=True,
):
    """Cameras on a line looking at a point cloud; ground truth + perturbed."""
    C, P = n_cams, n_pts
    Q = obs_per_pt
    O = P * Q

    # gt cameras: spaced along x, looking +z
    R_gt = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    t_gt = np.zeros((C, 3), np.float32)
    t_gt[:, 0] = -np.arange(C) * 0.5  # Tcw: camera i at world x = 0.5 i

    pts = np.stack(
        [rng.uniform(-2, 2 + 0.5 * C, P), rng.uniform(-2, 2, P), rng.uniform(6, 14, P)],
        axis=1,
    ).astype(np.float32)

    obs_cam = np.zeros(O, np.int32)
    obs_pt = np.zeros(O, np.int32)
    obs_uvr = np.zeros((O, 3), np.float32)
    o = 0
    pt_obs = np.full((P, Q), -1, np.int32)
    for p in range(P):
        cams = rng.choice(C, Q, replace=False)
        for qi, c in enumerate(cams):
            xc = R_gt[c] @ pts[p] + t_gt[c]
            u = 400 * xc[0] / xc[2] + 320
            v = 400 * xc[1] / xc[2] + 240
            ur = u - 80 / xc[2] if stereo else -1.0
            obs_cam[o] = c
            obs_pt[o] = p
            obs_uvr[o] = [
                u + rng.normal() * noise,
                v + rng.normal() * noise,
                (ur + rng.normal() * noise) if stereo else -1.0,
            ]
            pt_obs[p, qi] = o
            o += 1

    # perturb: fixed cams stay at gt
    R0 = R_gt.copy()
    t0 = t_gt.copy()
    free = np.zeros(C, bool)
    free[n_fixed:] = True
    for c in range(n_fixed, C):
        dR = np.asarray(so3_exp(jnp.asarray(rng.normal(0, pose_err, 3), jnp.float32)))
        R0[c] = dR @ R_gt[c]
        t0[c] = t_gt[c] + rng.normal(0, pose_err * 5, 3)
    pts0 = pts + rng.normal(0, point_err, pts.shape).astype(np.float32)

    prob = BAProblem(
        R=jnp.asarray(R0), t=jnp.asarray(t0), xw=jnp.asarray(pts0),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_inv_sigma2=jnp.ones(O, jnp.float32),
        obs_valid=jnp.ones(O, bool),
        pt_obs=jnp.asarray(pt_obs),
        cam_free=jnp.asarray(free),
    )
    return prob, R_gt, t_gt, pts


class TestLocalBA:
    def test_converges(self, rng):
        prob, R_gt, t_gt, pts_gt = build_problem(rng, noise=0.0)
        fn = make_local_ba(CFG)
        R, t, xw, inlier = fn(CAM, prob)
        R, t, xw = np.asarray(R), np.asarray(t), np.asarray(xw)
        assert np.abs(R - R_gt).max() < 2e-3, np.abs(R - R_gt).max()
        assert np.abs(t - t_gt).max() < 1e-2, np.abs(t - t_gt).max()
        assert np.abs(xw - pts_gt).max() < 5e-2, np.abs(xw - pts_gt).max()
        assert bool(np.asarray(inlier).all())

    def test_fixed_cameras_stay(self, rng):
        prob, R_gt, t_gt, pts_gt = build_problem(rng, noise=0.1)
        fn = make_local_ba(CFG)
        R, t, xw, inlier = fn(CAM, prob)
        np.testing.assert_array_equal(np.asarray(R)[:2], np.asarray(prob.R)[:2])
        np.testing.assert_array_equal(np.asarray(t)[:2], np.asarray(prob.t)[:2])

    def test_outliers_rejected(self, rng):
        prob, R_gt, t_gt, pts_gt = build_problem(rng, noise=0.2)
        uvr = np.asarray(prob.obs_uvr).copy()
        bad = rng.choice(len(uvr), 30, replace=False)
        uvr[bad, :2] += rng.uniform(15, 40, (30, 2))
        prob = prob._replace(obs_uvr=jnp.asarray(uvr))
        fn = make_local_ba(CFG)
        R, t, xw, inlier = fn(CAM, prob)
        inl = np.asarray(inlier)
        assert inl[bad].sum() < 8
        # pose error still small despite outliers
        assert np.abs(np.asarray(t) - t_gt).max() < 5e-2

    def test_mono_only(self, rng):
        prob, R_gt, t_gt, pts_gt = build_problem(rng, noise=0.1, stereo=False, obs_per_pt=5)
        fn = make_local_ba(CFG)
        R, t, xw, inlier = fn(CAM, prob)
        assert np.abs(np.asarray(t) - t_gt).max() < 5e-2
        assert np.asarray(inlier).mean() > 0.9
