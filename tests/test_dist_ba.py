"""Distributed BA on the 8-device virtual CPU mesh (SURVEY.md §4:
multi-host tests without a cluster)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from orb_slam2_2021_tpu.config import OptimConfig
from orb_slam2_2021_tpu.parallel.dist_ba import make_dist_ba, shard_ba_problem, AXIS
from tests.test_ba import build_problem, CAM, CFG


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return Mesh(np.array(devs[:8]), (AXIS,))


class TestDistBA:
    def test_matches_single_device(self, mesh, rng):
        prob, R_gt, t_gt, pts_gt = build_problem(rng, n_cams=6, n_pts=128, noise=0.05)
        sharded = shard_ba_problem(prob, 8)
        fn = make_dist_ba(CFG, mesh)
        R, t, xw, inlier = fn(CAM, sharded)
        R, t, xw = np.asarray(R), np.asarray(t), np.asarray(xw)
        # same convergence target as the single-device solver
        assert np.abs(R - R_gt).max() < 5e-3, np.abs(R - R_gt).max()
        assert np.abs(t - t_gt).max() < 2e-2, np.abs(t - t_gt).max()
        assert np.abs(xw - pts_gt).max() < 1e-1
        # inlier rate over the real (non-padding) observations
        valid = np.asarray(sharded.obs_valid)
        assert np.asarray(inlier)[valid].mean() > 0.9

    def test_shard_prep_preserves_obs(self, rng):
        prob, *_ = build_problem(rng, n_cams=4, n_pts=64, obs_per_pt=3)
        sharded = shard_ba_problem(prob, 8)
        assert int(np.asarray(sharded.obs_valid).sum()) == int(np.asarray(prob.obs_valid).sum())
        # every valid pt_obs entry points at an obs of that point
        po = np.asarray(sharded.pt_obs)
        op = np.asarray(sharded.obs_pt)
        for p in range(po.shape[0]):
            for o in po[p]:
                if o >= 0:
                    assert op[o] == p


class TestDistGBAIteration:
    def test_host_stepped_sharded_gba_converges(self, mesh, rng):
        """The pipeline GBA path (host-driven iterations, landmark-sharded,
        abortable between steps) must converge like the single-device one."""
        from orb_slam2_2021_tpu.parallel.dist_ba import make_dist_gba_iteration

        prob, R_gt, t_gt, pts_gt = build_problem(
            rng, n_cams=8, n_pts=256, obs_per_pt=4, noise=0.05, n_fixed=1
        )
        sharded = shard_ba_problem(prob, 8)
        cfg = OptimConfig(cg_iters=16)
        step = make_dist_gba_iteration(cfg, mesh, CAM)
        R, t, xw = sharded.R, sharded.t, sharded.xw
        lam = jnp.float32(cfg.lm_lambda_init)
        active = sharded.obs_valid.astype(jnp.float32)
        for _ in range(8):
            R, t, xw, lam, cost = step(sharded, R, t, xw, lam, active, jnp.bool_(True))
        t = np.asarray(t)
        assert np.abs(t - t_gt).max() < 2e-2, np.abs(t - t_gt).max()
