"""Loop-closing integration: out-and-back trajectory where the return path
re-observes the start region without covisibility to the early keyframes, so
DetectLoop -> ComputeSim3 -> CorrectLoop must fire (SURVEY.md §3.4)."""

import numpy as np
import pytest

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.io.synthetic import SyntheticStereoWorld
from orb_slam2_2021_tpu.io.trajectory import ate_rmse
from orb_slam2_2021_tpu.pipeline.system import System


def out_and_back(n_out, step):
    """Lateral out-and-back pass over the same wall (identity orientation)."""
    poses = []
    pos = np.zeros(3, np.float32)
    for _ in range(n_out):
        poses.append((np.eye(3, dtype=np.float32), pos.copy()))
        pos = pos + np.array([step, 0, 0], np.float32)
    for _ in range(n_out):
        pos = pos - np.array([step, 0, 0], np.float32)
        poses.append((np.eye(3, dtype=np.float32), pos.copy()))
    return poses


@pytest.mark.slow
def test_loop_closure_fires_and_map_stays_consistent():
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=5)
    gt = out_and_back(26, 0.14)

    sys_ = System(cfg)
    assert sys_.place is not None, "packaged vocabulary required"
    n_ok = 0
    for i, (R_wc, t_wc) in enumerate(gt):
        left, right = world.render(R_wc, t_wc)
        pose = sys_.track_stereo(left, right, timestamp=i * 0.1)
        if pose is not None:
            n_ok += 1
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
    assert rmse < max(0.06 * total, 0.06), f"ATE {rmse:.3f} over {total:.1f} m"
    # the loop machinery must at least have run its detection path; if
    # covisibility never separated, a loop may legitimately not fire, but the
    # database must be populated
    assert len(sys_.place.kfdb.bow) == int(sys_.map.kf_valid.sum())
    # occupancy grid exists and has free+occupied structure
    grid = sys_.occupancy_grid()
    assert (grid.data == 100).sum() > 50
    assert (grid.data == 0).sum() > 100


def _run_orbit(enable_loop_closing: bool):
    from orb_slam2_2021_tpu.io.synthetic import (
        SyntheticCylinderWorld,
        orbit_trajectory,
    )

    cfg = synthetic_config(width=320, height=240)
    world = SyntheticCylinderWorld(cfg, seed=3)
    # 560 deg: the return sector overlaps the outbound for ~200 deg, enough
    # keyframes (~5 at the mapping-idle KF cadence) for the consistency
    # counter to reach th=3 (LoopClosing.cc:167-227) before the run ends
    gt = orbit_trajectory(128, total_deg=560.0, r_orbit=1.5)
    sys_ = System(cfg, enable_loop_closing=enable_loop_closing)
    n_ok = 0
    for i, (R_wc, t_wc) in enumerate(gt):
        left, right = world.render(R_wc, t_wc)
        if sys_.track_stereo(left, right, timestamp=i * 0.1) is not None:
            n_ok += 1
    sys_.shutdown()
    est = sys_.trajectory_kitti()
    # ground truth expressed in the SLAM frame (first camera = identity):
    # the gauge is pinned there (KF0 fixed, Optimizer.cc:104), so UNALIGNED
    # ATE is well-defined and measures exactly the global drift that loop
    # closure exists to remove — Horn alignment would absorb most of it
    T0 = np.eye(4)
    T0[:3, :3] = gt[0][0]
    T0[:3, 3] = gt[0][1]
    gt_mats = []
    for R_wc, t_wc in gt[: len(est)]:
        T = np.eye(4)
        T[:3, :3] = R_wc
        T[:3, 3] = t_wc
        gt_mats.append(np.linalg.inv(T0) @ T)
    return (sys_, n_ok, len(gt), ate_rmse(est, gt_mats),
            ate_rmse(est, gt_mats, align=False))


@pytest.mark.slow
def test_orbit_loop_closure_fires_end_to_end():
    """A full-orbit circuit in the cylinder world: the return sector is NOT
    covisible with the outbound keyframes (heading changed by 360 deg, fresh
    duplicate geometry built on return), so the complete
    DetectLoop -> ComputeSim3 -> CorrectLoop -> GBA chain
    (/root/reference/src/LoopClosing.cc:72-103 -> :421-614 -> :674-779) must
    fire — and its correction must strictly improve the trajectory over the
    same run with loop closing disabled."""
    sys_loop, n_ok, n_total, ate_loop, raw_loop = _run_orbit(
        enable_loop_closing=True)
    assert n_ok >= n_total - 2, f"tracking lost: {n_ok}/{n_total}"

    # the loop demonstrably fired end-to-end, and global BA ran
    assert sys_loop.loop_closer.n_loops >= 1
    assert len(sys_loop.loop_closer.gba_iter_times) > 0
    assert np.isfinite(ate_loop)

    _, n_ok2, _, ate_noloop, raw_noloop = _run_orbit(enable_loop_closing=False)
    assert n_ok2 >= n_total - 2
    # the correction must strictly reduce GLOBAL drift (unaligned ATE in the
    # pinned-gauge frame — CorrectLoop + essential graph + GBA exist to pull
    # the accumulated drift out of the whole trajectory,
    # LoopClosing.cc:421-614, Optimizer.cc:784-1048). Aligned ATE can't
    # separate the runs here because Horn alignment absorbs exactly the
    # global component the loop removes (measured: aligned 0.22 vs 0.21,
    # unaligned 0.32 vs 0.37, scripts/debug_noloop.py).
    assert raw_loop < raw_noloop, (
        f"loop correction did not reduce global drift: unaligned ATE "
        f"{raw_loop:.4f} with loops vs {raw_noloop:.4f} without"
    )
    # and both runs must stay in the healthy regime
    assert ate_loop < 0.35, f"aligned ATE {ate_loop:.3f} out of envelope"
    assert raw_loop < 0.5, f"unaligned ATE {raw_loop:.3f} out of envelope"
