"""Monocular pipeline integration: two-view bootstrap + scale-free tracking
(SURVEY.md §7 step 9; Tracking.cc:584-758)."""

import numpy as np
import pytest

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.io.synthetic import SyntheticStereoWorld, forward_trajectory
from orb_slam2_2021_tpu.io.trajectory import ate_rmse
from orb_slam2_2021_tpu.pipeline.system import System
from orb_slam2_2021_tpu.pipeline.tracking import TrackState


@pytest.mark.slow
def test_mono_odometry_synthetic():
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=9)
    n_frames = 30
    gt = forward_trajectory(n_frames, step=0.12)

    sys_ = System(cfg, sensor="mono")
    n_ok = 0
    init_frame = None
    for i, (R_wc, t_wc) in enumerate(gt):
        left, _ = world.render(R_wc, t_wc)
        pose = sys_.track_monocular(left, timestamp=i * 0.1)
        if pose is not None:
            n_ok += 1
            if init_frame is None:
                init_frame = i
    sys_.shutdown()

    assert init_frame is not None and init_frame <= 12, f"mono init too late: {init_frame}"
    assert n_ok >= n_frames - init_frame - 2, f"tracking lost: {n_ok}"

    est = sys_.trajectory_kitti()
    assert len(est) >= n_ok - 1
    gt_mats = []
    for R_wc, t_wc in gt[-len(est):]:
        T = np.eye(4)
        T[:3, :3] = R_wc
        T[:3, 3] = t_wc
        gt_mats.append(T)
    # monocular: evaluate up to scale (Sim3 alignment). The bound is loose:
    # a shallow frontal scene initialized from a short baseline carries the
    # classic mono yaw/translation ambiguity; the reference drifts comparably
    # and recovers via loop closure (quality tuning tracked for next rounds).
    rmse = ate_rmse(est, gt_mats, with_scale=True)
    total = np.linalg.norm(np.diff([T[:3, 3] for T in gt_mats], axis=0), axis=1).sum()
    assert np.isfinite(rmse)
    assert rmse < max(0.30 * total, 0.30), f"scaled ATE {rmse:.3f} over {total:.1f} m"
