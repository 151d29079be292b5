"""Matrix-free Schur-PCG bundle adjustment (optim/ba_cg.py): parity with the
dense reduced-system solver on local windows, and convergence on an all-KF
global-scale problem (RunGlobalBundleAdjustment semantics,
/root/reference/src/Optimizer.cc:51-240)."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_2021_tpu.config import OptimConfig
from orb_slam2_2021_tpu.optim.ba_cg import make_local_ba_cg, make_gba_iteration

from test_ba import CAM, CFG, build_problem

CFG_CG = OptimConfig(local_ba_iters1=5, local_ba_iters2=10, cg_iters=24)


class TestCGBA:
    def test_converges_matches_dense(self, rng):
        prob, R_gt, t_gt, pts_gt = build_problem(rng, noise=0.0)
        fn = make_local_ba_cg(CFG_CG)
        R, t, xw, inlier = fn(CAM, prob)
        R, t, xw = np.asarray(R), np.asarray(t), np.asarray(xw)
        assert np.abs(R - R_gt).max() < 2e-3, np.abs(R - R_gt).max()
        assert np.abs(t - t_gt).max() < 1e-2, np.abs(t - t_gt).max()
        assert np.abs(xw - pts_gt).max() < 5e-2, np.abs(xw - pts_gt).max()
        assert bool(np.asarray(inlier).all())

    def test_fixed_cameras_stay(self, rng):
        prob, R_gt, t_gt, pts_gt = build_problem(rng, noise=0.1)
        fn = make_local_ba_cg(CFG_CG)
        R, t, xw, inlier = fn(CAM, prob)
        np.testing.assert_array_equal(np.asarray(R)[:2], np.asarray(prob.R)[:2])
        np.testing.assert_array_equal(np.asarray(t)[:2], np.asarray(prob.t)[:2])

    def test_outliers_rejected(self, rng):
        prob, R_gt, t_gt, pts_gt = build_problem(rng, noise=0.2)
        uvr = np.asarray(prob.obs_uvr).copy()
        bad = rng.choice(len(uvr), 30, replace=False)
        uvr[bad, :2] += rng.uniform(15, 40, (30, 2))
        prob = prob._replace(obs_uvr=jnp.asarray(uvr))
        fn = make_local_ba_cg(CFG_CG)
        R, t, xw, inlier = fn(CAM, prob)
        inl = np.asarray(inlier)
        assert inl[bad].sum() < 8
        assert np.abs(np.asarray(t) - t_gt).max() < 5e-2

    def test_global_scale_problem(self, rng):
        """300 free cameras, 3000 points — far beyond the dense solver's
        local-window capacity; the CG path must still converge."""
        prob, R_gt, t_gt, pts_gt = build_problem(
            rng, n_cams=300, n_pts=3000, obs_per_pt=4, noise=0.1,
            pose_err=0.01, n_fixed=1,
        )
        step = make_gba_iteration(CFG_CG)
        R, t, xw = prob.R, prob.t, prob.xw
        lam = jnp.float32(CFG_CG.lm_lambda_init)
        active = prob.obs_valid.astype(jnp.float32)
        err0 = np.abs(np.asarray(t) - t_gt).max()
        for _ in range(10):
            R, t, xw, lam, cost = step(CAM, prob, R, t, xw, lam, active,
                                       jnp.bool_(True))
        t = np.asarray(t)
        err1 = np.abs(t - t_gt).max()
        assert err1 < 2e-2, (err0, err1)
        assert err1 < 0.3 * err0
