"""RANSAC solver + Sim3 optimizer tests (SURVEY.md §4: Horn Sim3, EPnP on
synthetic point sets; §2 #17-18)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_2021_tpu.geometry.so3 import so3_exp
from orb_slam2_2021_tpu.geometry.sim3 import sim3_exp, sim3_compose, sim3_inverse
from orb_slam2_2021_tpu.solvers.horn_sim3 import horn_align, make_sim3_ransac
from orb_slam2_2021_tpu.solvers.epnp import make_pnp_ransac
from orb_slam2_2021_tpu.optim.sim3_opt import (
    PoseGraph, make_essential_solver, make_sim3_refine,
)

FX = FY = 400.0
CX, CY = 320.0, 240.0


def random_sim3(rng, scale_spread=0.3):
    w = rng.standard_normal(3) * 0.5
    R = np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
    s = float(np.exp(rng.uniform(-scale_spread, scale_spread)))
    t = rng.standard_normal(3).astype(np.float32)
    return s, R, t


class TestHorn:
    def test_exact_recovery(self, rng):
        s, R, t = random_sim3(rng)
        x2 = rng.uniform(-3, 3, (30, 3)).astype(np.float32) + [0, 0, 8]
        x1 = s * x2 @ R.T + t
        se, Re, te = horn_align(jnp.asarray(x1), jnp.asarray(x2), False)
        assert abs(float(se) - s) < 1e-3
        np.testing.assert_allclose(np.asarray(Re), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(te), t, atol=1e-3)

    def test_fix_scale(self, rng):
        _, R, t = random_sim3(rng)
        x2 = rng.uniform(-3, 3, (30, 3)).astype(np.float32) + [0, 0, 8]
        x1 = x2 @ R.T + t
        se, Re, te = horn_align(jnp.asarray(x1), jnp.asarray(x2), True)
        assert float(se) == 1.0
        np.testing.assert_allclose(np.asarray(Re), R, atol=1e-4)

    def test_ransac_with_outliers(self, rng):
        s, R, t = random_sim3(rng)
        n = 80
        x2 = rng.uniform(-3, 3, (n, 3)).astype(np.float32) + [0, 0, 8]
        x1 = (s * x2 @ R.T + t).astype(np.float32)
        # 25% outliers
        bad = rng.choice(n, 20, replace=False)
        x1[bad] += rng.uniform(1, 3, (20, 3)).astype(np.float32)
        # observations = projections of the true points in each frame
        uv1 = np.stack([FX * x1[:, 0] / x1[:, 2] + CX, FY * x1[:, 1] / x1[:, 2] + CY], 1)
        uv2 = np.stack([FX * x2[:, 0] / x2[:, 2] + CX, FY * x2[:, 1] / x2[:, 2] + CY], 1)
        # for outliers the x1 was corrupted AFTER projection -> they disagree
        uv1_clean = np.stack(
            [FX * (s * x2 @ R.T + t)[:, 0] / (s * x2 @ R.T + t)[:, 2] + CX,
             FY * (s * x2 @ R.T + t)[:, 1] / (s * x2 @ R.T + t)[:, 2] + CY], 1)
        uv1[bad] = uv1_clean[bad]  # observed where the TRUE point projects

        fn = make_sim3_ransac(False, 128)
        se, Re, te, inl, n_in = fn(
            jax.random.PRNGKey(0),
            jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
            FX, FY, CX, CY,
        )
        assert int(n_in) >= 50
        assert abs(float(se) - s) < 0.02
        np.testing.assert_allclose(np.asarray(Re), R, atol=5e-3)


class TestPnP:
    def test_recovers_pose(self, rng):
        w = rng.standard_normal(3) * 0.3
        R = np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
        t = rng.standard_normal(3).astype(np.float32)
        n = 120
        xc = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 15, n)], 1).astype(np.float32)
        xw = (xc - t) @ R
        uv = np.stack([FX * xc[:, 0] / xc[:, 2] + CX, FY * xc[:, 1] / xc[:, 2] + CY], 1).astype(np.float32)
        uv += rng.standard_normal(uv.shape).astype(np.float32) * 0.3
        bad = rng.choice(n, 30, replace=False)
        uv[bad] += rng.uniform(20, 80, (30, 2)).astype(np.float32)

        fn = make_pnp_ransac(256)
        Re, te, inl, n_in = fn(
            jax.random.PRNGKey(1), jnp.asarray(xw), jnp.asarray(uv),
            jnp.ones(n), jnp.ones(n, bool), FX, FY, CX, CY,
        )
        assert int(n_in) >= 70, int(n_in)
        np.testing.assert_allclose(np.asarray(Re), R, atol=2e-2)
        np.testing.assert_allclose(np.asarray(te), t, atol=1e-1)

    def test_planar_scene(self, rng):
        """Coplanar landmarks: the 12x12 DLT null space is rank-deficient and
        the homography-decomposition hypotheses must carry the solve (the
        configurations EPnP's N=3 beta case covers, PnPsolver.cc:492-541)."""
        w = rng.standard_normal(3) * 0.25
        R = np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
        t = np.array([0.3, -0.2, 0.5], np.float32)
        n = 120
        # all points on the world plane z = 0.2*x - 0.1*y + 8 (camera frame
        # construction then back-projection keeps them visible)
        gx = rng.uniform(-4, 4, n)
        gy = rng.uniform(-3, 3, n)
        xw = np.stack([gx, gy, 0.2 * gx - 0.1 * gy + 2.0], 1).astype(np.float32)
        xc = xw @ R.T + t
        assert (xc[:, 2] > 0.5).all()
        uv = np.stack(
            [FX * xc[:, 0] / xc[:, 2] + CX, FY * xc[:, 1] / xc[:, 2] + CY], 1
        ).astype(np.float32)
        uv += rng.standard_normal(uv.shape).astype(np.float32) * 0.2
        bad = rng.choice(n, 25, replace=False)
        uv[bad] += rng.uniform(20, 60, (25, 2)).astype(np.float32)

        fn = make_pnp_ransac(256)
        Re, te, inl, n_in = fn(
            jax.random.PRNGKey(3), jnp.asarray(xw), jnp.asarray(uv),
            jnp.ones(n), jnp.ones(n, bool), FX, FY, CX, CY,
        )
        assert int(n_in) >= 75, int(n_in)
        np.testing.assert_allclose(np.asarray(Re), R, atol=3e-2)
        np.testing.assert_allclose(np.asarray(te), t, atol=1.5e-1)

    def test_refine_tightens_noisy_minimal_fit(self, rng):
        """The inlier-refine loop (PnPsolver.cc:271-316 semantics) must beat
        the best raw 6-point hypothesis under pixel noise: disable refine by
        reconstructing the unrefined result and compare inlier counts."""
        from orb_slam2_2021_tpu.solvers.epnp import epnp_ransac
        import functools as _ft

        w = rng.standard_normal(3) * 0.2
        R = np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
        t = rng.standard_normal(3).astype(np.float32)
        n = 150
        xc = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                       rng.uniform(4, 15, n)], 1).astype(np.float32)
        xw = (xc - t) @ R
        uv = np.stack(
            [FX * xc[:, 0] / xc[:, 2] + CX, FY * xc[:, 1] / xc[:, 2] + CY], 1
        ).astype(np.float32)
        uv += rng.standard_normal(uv.shape).astype(np.float32) * 1.0  # noisy
        args = (jnp.asarray(xw), jnp.asarray(uv), jnp.ones(n),
                jnp.ones(n, bool), FX, FY, CX, CY)
        raw = jax.jit(_ft.partial(epnp_ransac, n_hyps=64, refine_rounds=0))
        ref = jax.jit(_ft.partial(epnp_ransac, n_hyps=64, refine_rounds=2))
        key = jax.random.PRNGKey(11)
        _, _, _, n_raw = raw(key, *args)
        _, _, _, n_ref = ref(key, *args)
        assert int(n_ref) >= int(n_raw)
        assert int(n_ref) >= 100, (int(n_raw), int(n_ref))


class TestSim3Refine:
    def test_refines_perturbed(self, rng):
        s, R, t = random_sim3(rng, scale_spread=0.2)
        n = 60
        x2 = (rng.uniform(-3, 3, (n, 3)) + [0, 0, 8]).astype(np.float32)
        x1 = (s * x2 @ R.T + t).astype(np.float32)
        uv1 = np.stack([FX * x1[:, 0] / x1[:, 2] + CX, FY * x1[:, 1] / x1[:, 2] + CY], 1).astype(np.float32)
        uv2 = np.stack([FX * x2[:, 0] / x2[:, 2] + CX, FY * x2[:, 1] / x2[:, 2] + CY], 1).astype(np.float32)
        # perturb init
        dw = np.asarray(so3_exp(jnp.asarray([0.02, -0.01, 0.03], jnp.float32)))
        fn = make_sim3_refine(False)
        se, Re, te, inl, n_in = fn(
            jnp.float32(s * 1.05), jnp.asarray(dw @ R), jnp.asarray(t + 0.1),
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
            FX, FY, CX, CY,
        )
        assert int(n_in) >= 55
        assert abs(float(se) - s) < 5e-3
        np.testing.assert_allclose(np.asarray(Re), R, atol=2e-3)
        np.testing.assert_allclose(np.asarray(te), t, atol=2e-2)


class TestEssentialGraph:
    def test_corrects_drift(self, rng):
        """Circular trajectory with accumulated drift + one loop edge: the
        pose graph should spread the loop error over the chain
        (OptimizeEssentialGraph semantics)."""
        K = 24
        # ground-truth poses on a circle
        gt = []
        for i in range(K):
            th = 2 * np.pi * i / K
            Rwc = np.array(
                [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
                np.float32,
            )
            twc = np.array([np.sin(th) * 5, 0, 5 - np.cos(th) * 5], np.float32)
            R = Rwc.T
            t = -Rwc.T @ twc
            gt.append((1.0, R, t))

        # drifted estimates: inject growing yaw error
        est = []
        for i, (s, R, t) in enumerate(gt):
            err = np.asarray(so3_exp(jnp.asarray([0, 0.004 * i, 0], jnp.float32)))
            est.append((1.0, err @ R, t + np.array([0.01 * i, 0, 0], np.float32)))

        # edges: consecutive (from drifted estimates = odometry) + loop edge
        # K-1 -> 0 with the TRUE relative pose
        edges = []
        def rel(a, b):  # S_a * S_b^-1
            sa, Ra, ta = a
            sb, Rb, tb = b
            sbi, Rbi, tbi = sim3_inverse(jnp.float32(sb), jnp.asarray(Rb), jnp.asarray(tb))
            return sim3_compose(jnp.float32(sa), jnp.asarray(Ra), jnp.asarray(ta), sbi, Rbi, tbi)

        ei, ej, ms, mR, mt, wts = [], [], [], [], [], []
        for i in range(K - 1):
            s_, R_, t_ = rel(est[i + 1], est[i])  # odometry measurement (drifty)
            ei.append(i + 1); ej.append(i)
            ms.append(float(s_)); mR.append(np.asarray(R_)); mt.append(np.asarray(t_))
            wts.append(1.0)
        s_, R_, t_ = rel(gt[K - 1], gt[0])  # loop edge: true relative
        ei.append(K - 1); ej.append(0)
        ms.append(float(s_)); mR.append(np.asarray(R_)); mt.append(np.asarray(t_))
        wts.append(1.0)

        fixed = np.zeros(K, bool)
        fixed[0] = True

        g = PoseGraph(
            s=jnp.asarray([e[0] for e in est], jnp.float32),
            R=jnp.asarray(np.stack([e[1] for e in est])),
            t=jnp.asarray(np.stack([e[2] for e in est])),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            m_s=jnp.asarray(ms, jnp.float32),
            m_R=jnp.asarray(np.stack(mR)),
            m_t=jnp.asarray(np.stack(mt)),
            weight=jnp.asarray(wts, jnp.float32),
            fixed=jnp.asarray(fixed),
        )
        fn = make_essential_solver(True)
        s_new, R_new, t_new = fn(g)

        # error at the loop seam (K-1 vs gt) must shrink substantially
        def pose_err(R_est, t_est, idx):
            _, Rg, tg = gt[idx]
            c_est = -np.asarray(R_est).T @ np.asarray(t_est)
            c_gt = -Rg.T @ tg
            return np.linalg.norm(c_est - c_gt)

        err_before = pose_err(est[K - 1][1], est[K - 1][2], K - 1)
        err_after = pose_err(np.asarray(R_new[K - 1]), np.asarray(t_new[K - 1]), K - 1)
        assert err_after < 0.35 * err_before, (err_before, err_after)
