"""Motion-only pose optimization tests on synthetic geometry
(SURVEY.md §4: LM convergence on synthetic BA problems)."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_2021_tpu.config import OptimConfig
from orb_slam2_2021_tpu.geometry.camera import PinholeCamera
from orb_slam2_2021_tpu.geometry.so3 import so3_exp
from orb_slam2_2021_tpu.optim.pose import PoseObs, make_pose_optimizer

pose_optimize = None  # set below: jitted, shared across tests


def setup_module(_):
    global pose_optimize
    fn = make_pose_optimizer(OptimConfig())
    pose_optimize = lambda cam, R0, t0, obs, cfg=None: fn(cam, R0, t0, obs)


def make_problem(rng, n=200, noise=0.3, outlier_frac=0.0, stereo=True):
    cam = PinholeCamera.create(400.0, 400.0, 320.0, 240.0, bf=80.0, width=640, height=480)
    # ground-truth pose
    w = rng.standard_normal(3) * 0.1
    R_gt = np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
    t_gt = rng.standard_normal(3).astype(np.float32) * 0.5

    # world points in front of the camera
    xc = np.stack(
        [
            rng.uniform(-4, 4, n),
            rng.uniform(-3, 3, n),
            rng.uniform(4, 20, n),
        ],
        axis=1,
    ).astype(np.float32)
    xw = (xc - t_gt) @ R_gt  # R^T (xc - t)

    u = 400.0 * xc[:, 0] / xc[:, 2] + 320.0
    v = 400.0 * xc[:, 1] / xc[:, 2] + 240.0
    ur = u - 80.0 / xc[:, 2]
    obs = np.stack([u, v, ur], axis=1).astype(np.float32)
    obs[:, :2] += rng.standard_normal((n, 2)).astype(np.float32) * noise
    if not stereo:
        obs[:, 2] = -1.0

    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        obs[idx, :2] += rng.uniform(20, 60, (n_out, 2)).astype(np.float32)

    pose_obs = PoseObs(
        xw=jnp.asarray(xw),
        uvr=jnp.asarray(obs),
        inv_sigma2=jnp.ones(n, jnp.float32),
        valid=jnp.ones(n, bool),
    )
    return cam, R_gt, t_gt, pose_obs, (idx if n_out else np.array([], int))


class TestPoseOptimize:
    def test_converges_from_perturbed_init(self, rng):
        cam, R_gt, t_gt, obs, _ = make_problem(rng, noise=0.0)
        # perturb initial pose
        dR = np.asarray(so3_exp(jnp.asarray([0.02, -0.03, 0.01], jnp.float32)))
        R0 = jnp.asarray(dR @ R_gt)
        t0 = jnp.asarray(t_gt + np.array([0.1, -0.05, 0.2], np.float32))
        R, t, inlier, n_in = pose_optimize(cam, R0, t0, obs, OptimConfig())
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=5e-3)
        assert int(n_in) > 190

    def test_robust_to_outliers(self, rng):
        cam, R_gt, t_gt, obs, out_idx = make_problem(rng, noise=0.2, outlier_frac=0.25)
        dR = np.asarray(so3_exp(jnp.asarray([0.01, 0.02, -0.01], jnp.float32)))
        R0 = jnp.asarray(dR @ R_gt)
        t0 = jnp.asarray(t_gt + np.array([0.05, 0.1, -0.1], np.float32))
        R, t, inlier, n_in = pose_optimize(cam, R0, t0, obs, OptimConfig())
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=5e-3)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=5e-2)
        # outliers classified out
        inl = np.asarray(inlier)
        assert inl[out_idx].sum() <= len(out_idx) * 0.2

    def test_mono_observations(self, rng):
        cam, R_gt, t_gt, obs, _ = make_problem(rng, noise=0.1, stereo=False)
        dR = np.asarray(so3_exp(jnp.asarray([0.02, 0.0, 0.0], jnp.float32)))
        R0 = jnp.asarray(dR @ R_gt)
        t0 = jnp.asarray(t_gt + 0.1)
        R, t, inlier, n_in = pose_optimize(cam, R0, t0, obs, OptimConfig())
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=5e-3)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=5e-2)

    def test_invalid_ignored(self, rng):
        cam, R_gt, t_gt, obs, _ = make_problem(rng, noise=0.0)
        # corrupt half the observations but mark them invalid
        uvr = np.asarray(obs.uvr).copy()
        uvr[:100] += 500.0
        obs = obs._replace(
            uvr=jnp.asarray(uvr),
            valid=jnp.asarray(np.arange(200) >= 100),
        )
        R, t, inlier, n_in = pose_optimize(
            cam, jnp.asarray(R_gt), jnp.asarray(t_gt), obs, OptimConfig()
        )
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-3)
        assert int(n_in) <= 100
