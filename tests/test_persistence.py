"""Map save/load round-trip + relocalization against a loaded map
(SURVEY.md §5 checkpoint/resume; System.cc:550-596)."""

import os

import numpy as np
import pytest

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.io.synthetic import SyntheticStereoWorld, forward_trajectory
from orb_slam2_2021_tpu.pipeline.system import System
from orb_slam2_2021_tpu.pipeline.tracking import TrackState


@pytest.mark.slow
def test_save_load_relocalize(tmp_path):
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=6)
    # long enough that tracked-inlier decay crosses the NeedNewKeyFrame
    # ratio gate (0.4*nRefMatches while nKFs<2, Tracking.cc:1040-1044) —
    # the front-end tracks ~60% of the initial KF's points 16 frames out,
    # so a second keyframe only appears later in the run
    gt = forward_trajectory(28, step=0.12)

    sys_ = System(cfg)
    for i, (R, t) in enumerate(gt):
        left, right = world.render(R, t)
        sys_.track_stereo(left, right, timestamp=i * 0.1)
    # map-consistent reference for frame 8: the FINAL trajectory (local BA
    # keeps adjusting keyframes after the frame was tracked, so the live
    # estimate is not what the saved map encodes)
    est_at = {i: T[:3, 3].copy() for i, T in enumerate(sys_.trajectory_kitti())}
    n_kf = int(sys_.map.kf_valid.sum())
    n_mp = int(sys_.map.mp_valid.sum())
    assert n_kf >= 2 and n_mp > 100
    path = str(tmp_path / "map.npz")
    sys_.save_map(path)
    sys_.shutdown()

    # boot a fresh system from the checkpoint: identical map, LOST state
    sys2 = System.from_map_file(cfg, path)
    assert int(sys2.map.kf_valid.sum()) == n_kf
    assert int(sys2.map.mp_valid.sum()) == n_mp
    assert sys2.tracker.state == TrackState.LOST
    np.testing.assert_array_equal(
        np.asarray(sys2.map.kf_R[: sys_.map.next_kf]),
        np.asarray(sys_.map.kf_R[: sys_.map.next_kf]),
    )
    # KF database rebuilt for every live keyframe
    assert len(sys2.place.kfdb.bow) == n_kf

    # relocalize: feed a frame from a viewpoint seen mid-trajectory
    R, t = gt[8]
    left, right = world.render(R, t)
    pose = sys2.track_stereo(left, right, timestamp=99.0)
    assert pose is not None, "relocalization against loaded map failed"
    Rcw, tcw = pose
    c = -Rcw.T @ tcw
    # relocalized pose must agree with the original run's estimate for that
    # viewpoint up to the map's own internal adjustment (local BA + culling
    # keep reshaping the map after frame 8; the run's ATE is ~0.15 m, so the
    # map-frame disagreement budget is of the same order)
    assert np.linalg.norm(c - est_at[8]) < 0.3, np.linalg.norm(c - est_at[8])
    # and with ground truth within map drift + reloc error
    assert np.linalg.norm(c - np.asarray(gt[8][1])) < 0.45
    assert sys2.tracker.state == TrackState.OK


def test_loop_edges_survive_save_load(tmp_path):
    """Essential-graph loop constraints round-trip (the reference serializes
    mspLoopEdges, KeyFrame.cc:695-766)."""
    from orb_slam2_2021_tpu.config import synthetic_config
    from orb_slam2_2021_tpu.io.persistence import load_map, save_map
    from orb_slam2_2021_tpu.mapping.map_store import MapStore

    cfg = synthetic_config(width=64, height=48)
    m = MapStore(cfg)
    N = cfg.orb.n_features
    rng = np.random.default_rng(0)
    for k in range(4):
        neg = np.full(N, -1.0, np.float32)
        m.add_keyframe(
            np.eye(3, dtype=np.float32),
            np.array([0.1 * k, 0, 0], np.float32),
            rng.uniform(0, 40, (N, 2)).astype(np.float32), neg, neg,
            np.zeros(N, np.int32), np.zeros(N, np.float32),
            rng.integers(0, 2**32, (N, 8), dtype=np.uint32),
            np.ones(N, bool), np.full(N, -1, np.int64),
        )
    m.loop_edges = {0: {3}, 3: {0}}
    path = str(tmp_path / "map.npz")
    save_map(path, m)
    m2, _ = load_map(path, cfg)
    assert m2.loop_edges == {0: {3}, 3: {0}}
