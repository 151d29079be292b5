"""Keypoint undistortion (Frame.cc:456-486) + RGB-D end-to-end with a
distorting lens (VERDICT round-1 item 9)."""

import numpy as np
import pytest

from orb_slam2_2021_tpu.config import synthetic_config, tum_rgbd_config
from orb_slam2_2021_tpu.io.synthetic import SyntheticStereoWorld, forward_trajectory
from orb_slam2_2021_tpu.io.trajectory import ate_rmse
from orb_slam2_2021_tpu.pipeline.system import System

# strong radial distortion for the 63-degree synthetic FOV: ~15-20 px corner
# displacement at 320x240 — enough that an unmodeled lens visibly degrades
# geometry (freiburg1's k1=0.26 class)
DIST = (0.25, -0.15, -0.002, 0.001, 0.0)


def test_undistort_roundtrip():
    """undistort(distort(x)) == x to sub-0.01 px across the image, for both a
    synthetic lens and the real freiburg1 coefficients."""
    import jax.numpy as jnp

    from orb_slam2_2021_tpu.ops.undistort import distort_points, undistort_points

    for cfg, dist in [
        (synthetic_config(width=320, height=240), DIST),
        (tum_rgbd_config("freiburg1"), tum_rgbd_config("freiburg1").dist_coef),
    ]:
        xs = np.linspace(10, cfg.width - 10, 24)
        ys = np.linspace(10, cfg.height - 10, 18)
        xy = np.stack(np.meshgrid(xs, ys), axis=-1).reshape(-1, 2).astype(np.float32)
        xd = distort_points(jnp.asarray(xy), cfg.fx, cfg.fy, cfg.cx, cfg.cy, dist)
        xu = undistort_points(xd, cfg.fx, cfg.fy, cfg.cx, cfg.cy, dist)
        err = np.abs(np.asarray(xu) - xy).max()
        assert err < 0.01, f"round-trip error {err:.4f} px for {dist}"
        # the lens actually bends: distorted coords differ from ideal
        assert np.abs(np.asarray(xd) - xy).max() > 1.0


def test_zero_coef_noop():
    import jax.numpy as jnp

    from orb_slam2_2021_tpu.ops.undistort import undistort_points

    cfg = synthetic_config(width=320, height=240)
    xy = np.array([[10.0, 20.0], [300.0, 200.0]], np.float32)
    out = undistort_points(jnp.asarray(xy), cfg.fx, cfg.fy, cfg.cx, cfg.cy,
                           (0.0, 0.0, 0.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(out), xy, atol=1e-4)


def _drive_rgbd(cfg, dist, n_frames=30, seed=4):
    world = SyntheticStereoWorld(cfg, seed=seed)
    gt = forward_trajectory(n_frames, step=0.12)
    sys_ = System(cfg)
    n_ok = 0
    for i, (R, t) in enumerate(gt):
        img, depth = world.render_rgbd(R, t, dist_coef=dist)
        if sys_.track_rgbd(img, depth, timestamp=i * 0.1) is not None:
            n_ok += 1
    est = sys_.trajectory_kitti()
    sys_.shutdown()
    gt_mats = []
    for R, t in gt[: len(est)]:
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        gt_mats.append(T)
    return n_ok, ate_rmse(est, gt_mats), gt_mats


@pytest.mark.slow
def test_rgbd_e2e_with_distortion():
    """Full RGB-D run on imagery rendered through a distorting lens: with the
    coefficients configured, keypoint undistortion recovers clean-run ATE;
    geometry uses mvKeysUn while depth reads raw coords (Frame.cc:702-723)."""
    base = synthetic_config(width=320, height=240)

    n_ok_c, ate_clean, gt_mats = _drive_rgbd(base, dist=None)
    total = np.linalg.norm(
        np.diff([T[:3, 3] for T in gt_mats], axis=0), axis=1
    ).sum()
    assert n_ok_c >= 28
    assert ate_clean < 0.05 * total, f"clean RGB-D ATE {ate_clean:.3f}"

    cfg_d = base.replace(dist_coef=DIST)
    n_ok_d, ate_dist, _ = _drive_rgbd(cfg_d, dist=DIST)
    assert n_ok_d >= 28
    # undistorted pipeline on distorted imagery matches the clean run's
    # accuracy class (allow margin for resampling blur in the renderer)
    assert ate_dist < max(2.0 * ate_clean, 0.05 * total), (
        f"distorted ATE {ate_dist:.3f} vs clean {ate_clean:.3f}"
    )


@pytest.mark.slow
def test_rgbd_distortion_unmodeled_hurts():
    """Sanity anchor: the same distorted imagery WITHOUT the coefficients
    configured must be measurably worse — proves the e2e test actually
    exercises the undistortion path."""
    base = synthetic_config(width=320, height=240)
    cfg_d = base.replace(dist_coef=DIST)
    _, ate_modeled, gt_mats = _drive_rgbd(cfg_d, dist=DIST)
    _, ate_ignored, _ = _drive_rgbd(base, dist=DIST)
    assert ate_ignored > 1.5 * ate_modeled, (
        f"modeled {ate_modeled:.4f} vs ignored {ate_ignored:.4f}"
    )
