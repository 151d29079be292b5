"""Thread-interleaving stress test + map-consistency invariants.

The reference synchronizes four threads with per-object mutexes and ships no
sanitizer or test for them (SURVEY.md §5 race-detection entry: hand-rolled
mutexes, known benign races). Our model is a coarse map lock with snapshot
semantics; this test is the sanitizer substitute: it shakes the
tracker-vs-worker interleaving with randomized delays injected into the
worker's stage boundaries, then checks every bidirectional bookkeeping
invariant of the SoA map (kf_mp <-> mp_obs mirrors, stereo-weighted nObs,
covisibility symmetry, spanning-tree sanity)."""

import random
import threading
import time

import numpy as np
import pytest

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.io.synthetic import SyntheticStereoWorld, forward_trajectory
from orb_slam2_2021_tpu.pipeline.system import System
from orb_slam2_2021_tpu.pipeline.local_mapping import LocalMapping


def test_invariants_clean_after_sync_run():
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=3)
    sys_ = System(cfg)
    for i, (R, t) in enumerate(forward_trajectory(16, step=0.15)):
        left, right = world.render(R, t)
        sys_.track_stereo(left, right, timestamp=i * 0.1)
    sys_.shutdown()
    bad = sys_.map.check_invariants()
    assert not bad, "\n".join(bad[:20])


@pytest.mark.slow
def test_async_interleaving_stress(monkeypatch):
    """Randomized worker delays force tracker/worker interleavings at every
    stage boundary; the map must stay consistent and tracking must survive."""
    rng = random.Random(0)
    orig_pass = LocalMapping._mapping_device_pass
    orig_ba = LocalMapping._local_ba

    def jittery_pass(self, k):
        time.sleep(rng.random() * 0.03)
        out = orig_pass(self, k)
        time.sleep(rng.random() * 0.03)
        return out

    def jittery_ba(self, k):
        time.sleep(rng.random() * 0.05)
        return orig_ba(self, k)

    monkeypatch.setattr(LocalMapping, "_mapping_device_pass", jittery_pass)
    monkeypatch.setattr(LocalMapping, "_local_ba", jittery_ba)

    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=5)
    sys_ = System(cfg, async_mode=True)

    # a reader thread hammering snapshot queries concurrently (the viewer /
    # publisher role) — must never observe torn state that crashes
    stop = threading.Event()
    reader_errors = []

    def reader():
        while not stop.is_set():
            try:
                with sys_.map.lock:
                    kfs = np.nonzero(sys_.map.kf_valid)[0]
                    if len(kfs):
                        sys_.map.covisible_keyframes(int(kfs[-1]))
                        sys_.map.local_map_snapshot(kfs[-1:], 512)
            except Exception as e:  # pragma: no cover
                reader_errors.append(repr(e))
                return
            time.sleep(0.002)

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    n_ok = 0
    for i, (R, t) in enumerate(forward_trajectory(30, step=0.15)):
        left, right = world.render(R, t)
        if sys_.track_stereo(left, right, timestamp=i * 0.1) is not None:
            n_ok += 1
    sys_.shutdown()
    stop.set()
    th.join(timeout=5)

    assert not reader_errors, reader_errors
    assert n_ok >= 26, f"tracking lost under interleaving stress: {n_ok}/30"
    bad = sys_.map.check_invariants()
    assert not bad, "\n".join(bad[:20])
