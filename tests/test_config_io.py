"""Settings-YAML parsing (#24) + rectification (#22 preprocessing) tests."""

import numpy as np
import pytest

YAML = """%YAML:1.0

Camera.fx: 435.2046959714599
Camera.fy: 435.2046959714599
Camera.cx: 367.4517211914062
Camera.cy: 252.2008514404297

Camera.k1: 0.0
Camera.k2: 0.0

Camera.width: 640
Camera.height: 480

Camera.fps: 20.0
Camera.bf: 47.90639384423901

ThDepth: 35

ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7

Map.mapfile: map.bin

LEFT.height: 480
LEFT.width: 640
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28, 0.07, 0.0002, 0.00002, 0.0]
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2046959714599, 0, 367.4517211914062, 0, 0, 435.2046959714599, 252.2008514404297, 0, 0, 0, 1, 0]
RIGHT.height: 480
RIGHT.width: 640
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28, 0.07, 0.0002, 0.00002, 0.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1.0]
RIGHT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2046959714599, 0, 367.4517211914062, -47.90639384423901, 0, 435.2046959714599, 252.2008514404297, 0, 0, 0, 1, 0]
"""


@pytest.fixture
def yaml_path(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text(YAML)
    return str(p)


class TestConfigYaml:
    def test_scalars_and_orb(self, yaml_path):
        from orb_slam2_2021_tpu.config import config_from_yaml

        cfg = config_from_yaml(yaml_path)
        assert abs(cfg.fx - 435.2046959714599) < 1e-9
        assert cfg.width == 640 and cfg.height == 480
        assert abs(cfg.bf - 47.90639384423901) < 1e-9
        assert cfg.orb.n_features == 1200
        assert cfg.orb.ini_fast_th == 20
        assert cfg.tracking.th_depth_factor == 35
        assert cfg.tracking.max_frames_between_kf == 20  # = fps
        # resolved close/far split: bf/fx * ThDepth
        assert abs(cfg.resolved_depth_th() - 47.90639384423901 / 435.2046959714599 * 35) < 1e-6

    def test_matrix_parse(self, yaml_path):
        from orb_slam2_2021_tpu.config import _parse_opencv_yaml

        scalars, mats = _parse_opencv_yaml(yaml_path)
        assert mats["LEFT.K"].shape == (3, 3)
        assert abs(mats["LEFT.K"][0, 0] - 458.654) < 1e-9
        assert mats["RIGHT.P"].shape == (3, 4)
        assert scalars["Map.mapfile"] == "map.bin"


class TestRectify:
    def test_identity_maps_pass_through(self):
        from orb_slam2_2021_tpu.io.rectify import build_rectify_map, remap

        K = np.array([[400.0, 0, 32], [0, 400.0, 24], [0, 0, 1]])
        P = np.concatenate([K, np.zeros((3, 1))], axis=1)
        maps = build_rectify_map(K, np.zeros(5), np.eye(3), P, (64, 48))
        # zero distortion + identity R + P==[K|0] => identity mapping
        assert np.allclose(maps.map_x[0], np.arange(64), atol=1e-4)
        assert np.allclose(maps.map_y[:, 0], np.arange(48), atol=1e-4)
        img = np.random.default_rng(0).uniform(0, 255, (48, 64)).astype(np.float32)
        out = np.asarray(remap(img, maps))
        assert np.allclose(out, img, atol=1e-2)

    def test_yaml_rectification(self, yaml_path):
        from orb_slam2_2021_tpu.io.rectify import rectification_from_yaml, remap

        left, right = rectification_from_yaml(yaml_path)
        assert left.map_x.shape == (480, 640)
        # distorted camera: the map must differ from identity
        assert abs(left.map_x[240, 10] - 10) > 1.0
        img = np.random.default_rng(1).uniform(0, 255, (480, 640)).astype(np.float32)
        out = np.asarray(remap(img, left))
        assert out.shape == (480, 640)
        assert np.isfinite(out).all()
