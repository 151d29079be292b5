"""Async pipeline: tracking on the caller thread, local mapping + loop
closing on a worker, global BA on an ephemeral thread (the reference's thread
layout, /root/reference/src/System.cc:129-147). Correctness criterion is
trajectory quality, not interleaving determinism (SURVEY.md §7 hard parts)."""

import numpy as np
import pytest

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.io.synthetic import SyntheticStereoWorld, forward_trajectory
from orb_slam2_2021_tpu.io.trajectory import ate_rmse
from orb_slam2_2021_tpu.pipeline.system import System


@pytest.mark.slow
def test_async_forward_drive_matches_sync_quality():
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=3)
    gt = list(forward_trajectory(40, step=0.12))

    sys_ = System(cfg, async_mode=True)
    assert sys_.async_mode
    n_ok = 0
    for i, (R_wc, t_wc) in enumerate(gt):
        left, right = world.render(R_wc, t_wc)
        pose = sys_.track_stereo(left, right, timestamp=i * 0.1)
        n_ok += pose is not None
    sys_.shutdown()

    assert n_ok >= len(gt) - 2, f"tracking lost: {n_ok}/{len(gt)}"
    assert sys_.map.n_kf >= 2

    gt_mats = []
    for R_wc, t_wc in gt:
        T = np.eye(4)
        T[:3, :3] = R_wc
        T[:3, 3] = t_wc
        gt_mats.append(T)
    est = sys_.trajectory_kitti()
    rmse = ate_rmse(est, gt_mats[: len(est)])
    total = np.linalg.norm(np.diff([T[:3, 3] for T in gt_mats], axis=0), axis=1).sum()
    assert np.isfinite(rmse)
    assert rmse < max(0.06 * total, 0.3), f"async ATE {rmse:.3f} over {total:.1f} m"
    # the worker must actually have processed the keyframes (map grew beyond
    # the initializer's points)
    assert sys_.map.next_mp > 600


@pytest.mark.slow
def test_async_orbit_bench_scenario_zero_lost():
    """The bench configuration itself — async mode on the 560-deg cylinder
    orbit with a fired loop — must track EVERY frame and stay in the sync
    path's quality envelope, so the bench can never again be the one
    untested path (VERDICT r3 item 2: r3 shipped with 40% of bench frames
    LOST while this suite only tested async on the forward drive)."""
    from orb_slam2_2021_tpu.io.synthetic import (
        SyntheticCylinderWorld,
        orbit_trajectory,
    )

    cfg = synthetic_config(width=320, height=240)
    world = SyntheticCylinderWorld(cfg, seed=3)
    gt = orbit_trajectory(128, total_deg=560.0, r_orbit=1.5)

    sys_ = System(cfg, async_mode=True)
    for i, (R_wc, t_wc) in enumerate(gt):
        left, right = world.render(R_wc, t_wc)
        sys_.track_stereo(left, right, timestamp=i * 0.1)
    sys_.shutdown()

    n_lost = sum(1 for r in sys_.metrics if r.get("state") == "LOST")
    assert n_lost == 0, f"async orbit lost {n_lost}/{len(gt)} frames"

    est = sys_.trajectory_kitti()
    gt_mats = []
    for R_wc, t_wc in gt[: len(est)]:
        T = np.eye(4)
        T[:3, :3] = R_wc
        T[:3, 3] = t_wc
        gt_mats.append(T)
    rmse = ate_rmse(est, gt_mats)
    # sync-parity envelope: the sync orbit lands ~0.22 m (with the fired
    # loop) / ~0.36 m without; async interleaving may shift keyframe cadence
    # but must not change the regime
    assert np.isfinite(rmse)
    assert rmse < 0.45, f"async orbit ATE {rmse:.3f} (sync: ~0.22)"


@pytest.mark.slow
def test_async_loop_closure_with_background_gba():
    """Out-and-back loop driven async: loop correction runs on the worker and
    the global BA on its ephemeral thread; the merged map must stay
    consistent (LoopClosing.cc:674-779)."""
    from test_loop import out_and_back

    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=5)
    gt = out_and_back(26, 0.14)

    sys_ = System(cfg, async_mode=True)
    n_ok = 0
    for i, (R_wc, t_wc) in enumerate(gt):
        left, right = world.render(R_wc, t_wc)
        pose = sys_.track_stereo(left, right, timestamp=i * 0.1)
        n_ok += pose is not None
    sys_.shutdown()

    assert n_ok >= len(gt) - 2, f"tracking lost: {n_ok}/{len(gt)}"
    est = sys_.trajectory_kitti()
    gt_mats = []
    for R_wc, t_wc in gt[: len(est)]:
        T = np.eye(4)
        T[:3, :3] = R_wc
        T[:3, 3] = t_wc
        gt_mats.append(T)
    rmse = ate_rmse(est, gt_mats)
    total = np.linalg.norm(np.diff([T[:3, 3] for T in gt_mats], axis=0), axis=1).sum()
    assert np.isfinite(rmse)
    assert rmse < max(0.08 * total, 0.3), f"async loop ATE {rmse:.3f} over {total:.1f} m"
