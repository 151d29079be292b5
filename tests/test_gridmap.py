"""Occupancy-grid mapping tests (SURVEY.md §2 #5, GridMapping.cpp)."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_2021_tpu.config import synthetic_config, GridMapConfig
from orb_slam2_2021_tpu.gridmap.grid import (
    GridMapper, raycast_update, render_grid, RAY_STEPS,
)


class TestRaycast:
    def test_ray_marks_line_and_endpoint(self):
        visit = jnp.zeros((64, 64), jnp.int32)
        occ = jnp.zeros((64, 64), jnp.int32)
        cam = jnp.asarray([10.0, 10.0])
        pts = jnp.asarray([[50.0, 10.0]])  # horizontal ray
        visit, occ = raycast_update(visit, occ, cam, pts, jnp.ones(1, bool))
        v = np.asarray(visit)
        o = np.asarray(occ)
        # cells along row 10 between x=10..50 visited exactly once
        assert (v[10, 10:51] == 1).all()
        assert v.sum() == 41
        assert o[10, 50] == 1 and o.sum() == 1

    def test_invalid_rays_ignored(self):
        visit = jnp.zeros((32, 32), jnp.int32)
        occ = jnp.zeros((32, 32), jnp.int32)
        cam = jnp.asarray([5.0, 5.0])
        pts = jnp.asarray([[20.0, 20.0]])
        visit, occ = raycast_update(visit, occ, cam, pts, jnp.zeros(1, bool))
        assert int(np.asarray(visit).sum()) == 0
        assert int(np.asarray(occ).sum()) == 0

    def test_render_thresholds(self):
        cfg = GridMapConfig()
        visit = np.zeros((4, 4), np.int32)
        occ = np.zeros((4, 4), np.int32)
        visit[0, 0] = 10; occ[0, 0] = 9    # occupied
        visit[1, 1] = 10; occ[1, 1] = 0    # free
        # (2,2) unseen -> unknown
        out = render_grid(jnp.asarray(visit), jnp.asarray(occ), cfg)
        assert out[0, 0] == 100
        assert out[1, 1] == 0
        assert out[2, 2] == -1


class TestGridMapper:
    def test_kf_update_builds_grid(self):
        from orb_slam2_2021_tpu.mapping.map_store import MapStore

        cfg = synthetic_config(width=64, height=64)
        m = MapStore(cfg)
        # one KF at origin observing a few points ahead
        N = cfg.orb.n_features
        pos = np.asarray([[0.0, 0.0, 5.0], [1.0, 0.0, 6.0], [-1.0, 0.0, 7.0]], np.float32)
        ids = m.add_map_points_batch(pos, np.zeros((3, 8), np.uint32), 0)
        bind = np.full(N, -1, np.int64)
        bind[:3] = ids
        m.add_keyframe(
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            np.zeros((N, 2), np.float32), np.full(N, -1.0, np.float32),
            np.full(N, -1.0, np.float32), np.zeros(N, np.int32),
            np.zeros(N, np.float32), np.zeros((N, 8), np.uint32),
            np.ones(N, bool), bind,
        )
        gm = GridMapper(cfg, m)
        gm.process_new()
        grid = gm.occupancy_grid()
        assert (grid.data == 100).sum() >= 2  # point cells occupied
        assert (grid.data == 0).sum() > 10    # free cells along the rays
        # replay reproduces the same grid
        data1 = grid.data.copy()
        gm.process_new(loop_closed=True)
        np.testing.assert_array_equal(gm.occupancy_grid().data, data1)
