"""Tests for the aux tooling: viz, pubsub, map processor, calibration.

Coverage model: SURVEY.md §2 #21 (Viewer/FrameDrawer/MapDrawer), #26
(gridmapper offline tools), #27 (calibration), #28 (ROS glue / pc2ls relay).
"""

import json
import os
import socket

import numpy as np
import pytest

from orb_slam2_2021_tpu.config import synthetic_config


# ----------------------------------------------------------------------
# viz
# ----------------------------------------------------------------------

class TestDraw:
    def test_png_roundtrip(self, tmp_path):
        from orb_slam2_2021_tpu.viz.draw import write_png

        img = (np.random.default_rng(0).uniform(0, 255, (20, 30, 3))).astype(np.uint8)
        p = str(tmp_path / "x.png")
        write_png(p, img)
        from PIL import Image

        back = np.asarray(Image.open(p).convert("RGB"))
        assert (back == img).all()

    def test_pgm_roundtrip(self, tmp_path):
        from orb_slam2_2021_tpu.viz.draw import write_pgm

        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        p = str(tmp_path / "x.pgm")
        write_pgm(p, img)
        raw = open(p, "rb").read()
        assert raw.startswith(b"P5\n4 3\n255\n")
        assert raw.endswith(img.tobytes())

    def test_text_and_shapes(self):
        from orb_slam2_2021_tpu.viz.draw import draw_text, draw_rect, draw_line, draw_points

        img = np.zeros((40, 120, 3), np.uint8)
        draw_text(img, "SLAM 123", 2, 2, (255, 255, 255))
        draw_rect(img, 5, 15, 30, 35, (0, 255, 0))
        draw_line(img, 0, 0, 119, 39, (255, 0, 0))
        draw_points(img, np.array([[60.0, 20.0]]), (0, 0, 255), size=2)
        assert img.sum() > 0
        assert (img[:9].sum(axis=2) > 0).any()  # text rendered in top rows


class TestDrawers:
    def _mini_system(self, n=40):
        from orb_slam2_2021_tpu.mapping.map_store import MapStore

        cfg = synthetic_config(width=64, height=48)
        m = MapStore(cfg)
        rng = np.random.default_rng(0)
        pos = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        desc = rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)
        ids = m.add_map_points_batch(pos, desc, first_kf=0)
        N = cfg.orb.n_features
        bind = np.full(N, -1, np.int64)
        bind[: len(ids)] = ids
        m.add_keyframe(
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            rng.uniform(0, 48, (N, 2)).astype(np.float32),
            np.full(N, -1.0, np.float32), np.full(N, -1.0, np.float32),
            np.zeros(N, np.int32), np.zeros(N, np.float32),
            np.zeros((N, 8), np.uint32), np.ones(N, bool), bind, 0, 0.0,
        )
        return cfg, m

    def test_frame_drawer(self):
        from orb_slam2_2021_tpu.viz.frame_drawer import FrameDrawer, BAR_H

        img = np.random.default_rng(1).uniform(0, 255, (48, 64)).astype(np.float32)
        kp = np.random.default_rng(2).uniform(0, 48, (30, 2)).astype(np.float32)
        bind = np.full(30, -1, np.int64)
        bind[:10] = np.arange(10)
        out = FrameDrawer().draw(img, kp, np.ones(30, bool), bind=bind,
                                 state="OK", n_kf=3, n_mp=100)
        assert out.shape == (48 + BAR_H, 64, 3)
        assert out.dtype == np.uint8
        green = (out[..., 1] > 200) & (out[..., 0] < 50)
        assert green.any()  # tracked points drawn

    def test_map_drawer(self):
        from orb_slam2_2021_tpu.viz.map_drawer import MapDrawer

        cfg, m = self._mini_system()
        img = MapDrawer(width=200, height=200).render(
            m, cur_pose=(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        )
        assert img.shape == (200, 200, 3)
        assert (img != 255).any()  # something rendered


# ----------------------------------------------------------------------
# pubsub (#28)
# ----------------------------------------------------------------------

class TestPubSub:
    def test_bus_and_latest(self):
        from orb_slam2_2021_tpu.io.pubsub import MessageBus

        bus = MessageBus()
        got = []
        bus.subscribe("t", got.append)
        bus.publish("t", {"a": 1})
        assert got == [{"a": 1}]
        assert bus.latest("t") == {"a": 1}

    def test_tcp_publisher_roundtrip(self):
        from orb_slam2_2021_tpu.io.pubsub import MessageBus, TcpPublisher

        bus = MessageBus()
        pub = TcpPublisher(bus, ["os2_pose"], port=0)
        try:
            c = socket.create_connection(("127.0.0.1", pub.port), timeout=5)
            import time

            time.sleep(0.1)  # let the accept loop register the client
            bus.publish("os2_pose", {"t": 1.5, "Twc": np.eye(2)})
            c.settimeout(5)
            line = b""
            while not line.endswith(b"\n"):
                line += c.recv(4096)
            msg = json.loads(line)
            assert msg["topic"] == "os2_pose"
            assert msg["msg"]["Twc"]["shape"] == [2, 2]
            c.close()
        finally:
            pub.close()

    def test_pointcloud_to_laserscan(self):
        from orb_slam2_2021_tpu.io.pubsub import pointcloud_to_laserscan

        # one point straight ahead (z=5), one to the right, one too high
        pts = np.array([[0, 0, 5.0], [3.0, 0, 0.0001], [0, 9.0, 5.0]])
        ranges, angles = pointcloud_to_laserscan(pts, max_height=0.5)
        finite = np.isfinite(ranges)
        assert finite.sum() == 2
        near0 = np.abs(angles) < 0.02
        assert abs(np.nanmin(np.where(near0, ranges, np.nan)) - 5.0) < 0.1
        near90 = np.abs(angles - np.pi / 2) < 0.02
        assert abs(np.nanmin(np.where(near90, ranges, np.nan)) - 3.0) < 0.1


# ----------------------------------------------------------------------
# map processor (#26)
# ----------------------------------------------------------------------

class TestMapProcessor:
    def test_sor_filter_drops_outlier(self):
        from orb_slam2_2021_tpu.tools.map_processor import statistical_outlier_filter

        rng = np.random.default_rng(0)
        cloud = rng.normal(0, 1.0, (200, 3)).astype(np.float32)
        cloud[0] = [50.0, 50.0, 50.0]  # gross outlier
        keep = statistical_outlier_filter(cloud, k=10, std_ratio=1.0)
        assert not keep[0]
        assert keep[1:].mean() > 0.8

    def test_exports(self, tmp_path):
        from orb_slam2_2021_tpu.io.persistence import save_map
        from orb_slam2_2021_tpu.mapping.map_store import MapStore
        from orb_slam2_2021_tpu.tools.map_processor import MapProcessor

        cfg = synthetic_config(width=64, height=48)
        m = MapStore(cfg)
        rng = np.random.default_rng(0)
        pos = rng.uniform(-3, 3, (50, 3)).astype(np.float32)
        pos[:, 2] += 5
        desc = rng.integers(0, 2 ** 32, (50, 8), dtype=np.uint32)
        ids = m.add_map_points_batch(pos, desc, first_kf=0)
        N = cfg.orb.n_features
        bind = np.full(N, -1, np.int64)
        bind[: len(ids)] = ids
        m.add_keyframe(
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            rng.uniform(0, 48, (N, 2)).astype(np.float32),
            np.full(N, -1.0, np.float32), np.full(N, -1.0, np.float32),
            np.zeros(N, np.int32), np.zeros(N, np.float32),
            np.zeros((N, 8), np.uint32), np.ones(N, bool), bind, 0, 0.0,
        )
        p = str(tmp_path / "map.npz")
        save_map(p, m)

        mp = MapProcessor(p, cfg)
        assert int(mp.map.mp_valid.sum()) == 50
        pc = mp.point_cloud(filtered=False)
        assert pc.shape == (50, 3)
        mp.save_point_cloud_ply(str(tmp_path / "pc.ply"), filtered=False)
        assert "element vertex 50" in open(tmp_path / "pc.ply").read()
        mp.save_trajectory_tum(str(tmp_path / "kf.txt"))
        assert len(open(tmp_path / "kf.txt").readlines()) == 1
        grid = mp.save_grid_map_pgm(str(tmp_path / "g.pgm"), filtered=False)
        assert os.path.getsize(tmp_path / "g.pgm") > 100
        assert (grid.data == 100).sum() > 0  # occupied cells from the points


# ----------------------------------------------------------------------
# calibration (#27)
# ----------------------------------------------------------------------

def _project_np(K, dist, R, t, obj):
    xc = obj @ R.T + t
    x = xc[:, 0] / xc[:, 2]
    y = xc[:, 1] / xc[:, 2]
    k1, k2, p1, p2, k3 = dist
    r2 = x * x + y * y
    rad = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([K[0, 0] * xd + K[0, 2], K[1, 1] * yd + K[1, 2]], axis=1)


def _rot(rx, ry, rz):
    from orb_slam2_2021_tpu.tools.calibration import _rodrigues_np

    return _rodrigues_np(np.array([rx, ry, rz]))


class TestCalibration:
    def _make_views(self, K, dist, n_views=8, seed=0):
        from orb_slam2_2021_tpu.tools.calibration import board_points

        rng = np.random.default_rng(seed)
        obj = board_points(7, 5, 0.03)
        views, poses = [], []
        for _ in range(n_views):
            R = _rot(*rng.uniform(-0.35, 0.35, 3))
            t = np.array([
                rng.uniform(-0.08, 0.0), rng.uniform(-0.06, 0.0),
                rng.uniform(0.35, 0.7),
            ])
            views.append(_project_np(K, dist, R, t, obj))
            poses.append((R, t))
        return obj, views, poses

    def test_homography_dlt(self):
        from orb_slam2_2021_tpu.tools.calibration import board_points, homography_dlt

        obj = board_points(7, 5, 0.03)
        H_true = np.array([[400, 20, 300], [5, 420, 250], [0.01, -0.02, 1.0]])
        ph = np.concatenate([obj[:, :2], np.ones((len(obj), 1))], axis=1)
        img = (H_true @ ph.T).T
        img = img[:, :2] / img[:, 2:]
        H = homography_dlt(obj[:, :2], img)
        assert np.allclose(H / H[2, 2], H_true / H_true[2, 2], atol=1e-6)

    def test_mono_calibration_recovers_intrinsics(self):
        from orb_slam2_2021_tpu.tools.calibration import MonoCalibrator

        K = np.array([[420.0, 0, 320], [0, 430.0, 240], [0, 0, 1]])
        dist = np.array([-0.12, 0.05, 0, 0, 0])
        _, views, _ = self._make_views(K, dist)
        cal = MonoCalibrator(7, 5, 0.03, (640, 480))
        for v in views:
            cal.views.append(v)
        res = cal.calibrate()
        assert res.rms < 0.2, f"rms {res.rms}"
        assert abs(res.K[0, 0] - 420) < 4
        assert abs(res.K[1, 1] - 430) < 4
        assert abs(res.K[0, 2] - 320) < 4
        assert abs(res.dist[0] - (-0.12)) < 0.03

    def test_stereo_calibration_and_yaml(self):
        from orb_slam2_2021_tpu.tools.calibration import (
            StereoCalibrator, stereo_yaml, _rodrigues_np,
        )

        K = np.array([[420.0, 0, 320], [0, 420.0, 240], [0, 0, 1]])
        dist = np.zeros(5)
        R_rl = _rodrigues_np(np.array([0.0, 0.02, 0.0]))
        t_rl = np.array([-0.12, 0.0, 0.0])
        obj, views_l, poses = self._make_views(K, dist, n_views=8, seed=3)
        cal = StereoCalibrator(7, 5, 0.03, (640, 480))
        for v, (R, t) in zip(views_l, poses):
            Rr = R_rl @ R
            tr = R_rl @ t + t_rl
            vr = _project_np(K, dist, Rr, tr, obj)
            cal.add_view(v, vr)
        res = cal.calibrate()
        assert abs(res.baseline - 0.12) < 0.01
        # rectified projections share fx and row-aligned epipolar geometry
        assert abs(res.P1[0, 0] - res.P2[0, 0]) < 1e-9
        assert abs(abs(res.P2[0, 3]) - res.P2[0, 0] * res.baseline) < 1e-6
        yml = stereo_yaml(res)
        assert "Camera.bf:" in yml and "LEFT.K" in yml and "RIGHT.P" in yml

    def test_view_novelty_gating(self):
        from orb_slam2_2021_tpu.tools.calibration import MonoCalibrator

        K = np.array([[420.0, 0, 320], [0, 430.0, 240], [0, 0, 1]])
        _, views, _ = self._make_views(K, np.zeros(5), n_views=3)
        cal = MonoCalibrator(7, 5, 0.03, (640, 480))
        assert cal.add_view(views[0])
        assert not cal.add_view(views[0])  # duplicate rejected
        assert not cal.good_enough()
