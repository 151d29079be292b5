"""Structured observability (SURVEY.md §5 metrics entry): every tracked
frame produces one schema-conforming record; System dumps them as NDJSON;
the publisher surfaces them on the bus (`os2_metrics`)."""

import numpy as np
import pytest

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.io.metrics import (
    METRICS_SCHEMA, read_ndjson, validate_record, write_ndjson,
)
from orb_slam2_2021_tpu.io.synthetic import SyntheticStereoWorld, forward_trajectory
from orb_slam2_2021_tpu.pipeline.system import System


@pytest.fixture(scope="module")
def tracked_system():
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=3)
    gt = forward_trajectory(14, step=0.12)
    sys_ = System(cfg)
    for i, (R, t) in enumerate(gt):
        left, right = world.render(R, t)
        sys_.track_stereo(left, right, timestamp=i * 0.1)
    sys_.shutdown()
    return sys_


class TestMetrics:
    def test_one_record_per_frame(self, tracked_system):
        assert len(tracked_system.metrics) == 14

    def test_records_conform_to_schema(self, tracked_system):
        for rec in tracked_system.metrics:
            validate_record(rec)  # raises on violation
            assert set(rec) == set(METRICS_SCHEMA)

    def test_content_sane(self, tracked_system):
        recs = tracked_system.metrics
        # frame 0 initializes: becomes KF0
        assert recs[0]["keyframe"] and recs[0]["n_keyframes"] >= 1
        # steady-state frames track OK with real match/inlier counts
        ok = [r for r in recs[2:] if r["state"] == "OK"]
        assert len(ok) >= 8
        assert all(r["n_inliers"] > 10 for r in ok)
        assert all(r["n_matches"] >= r["n_inliers"] for r in ok)
        # stage timings are positive and sum below the total
        for r in recs:
            assert r["ms_total"] > 0
            assert r["ms_extract"] + r["ms_track"] <= r["ms_total"] + 1e-6

    def test_ndjson_round_trip(self, tracked_system, tmp_path):
        path = str(tmp_path / "metrics.ndjson")
        n = tracked_system.save_metrics_ndjson(path)
        back = read_ndjson(path)
        assert n == len(back) == len(tracked_system.metrics)
        for a, b in zip(back, tracked_system.metrics):
            validate_record(a)
            assert a["frame_id"] == b["frame_id"]
            assert a["state"] == b["state"]

    def test_validate_rejects_bad_records(self):
        good = {k: ("OK" if t is str else t(1)) for k, t in METRICS_SCHEMA.items()}
        validate_record(good)
        with pytest.raises(ValueError):
            validate_record({k: v for k, v in good.items() if k != "n_inliers"})
        with pytest.raises(ValueError):
            validate_record({**good, "state": "SPINNING"})

    def test_bus_publishes_metrics(self, tracked_system):
        from orb_slam2_2021_tpu.io.pubsub import (
            MessageBus, SystemPublisher, TOPIC_METRICS,
        )

        bus = MessageBus()
        got = []
        bus.subscribe(TOPIC_METRICS, got.append)
        pub = SystemPublisher(tracked_system, bus)
        pub.publish_frame(timestamp=1.0)
        assert len(got) == 1
        validate_record(got[0])
