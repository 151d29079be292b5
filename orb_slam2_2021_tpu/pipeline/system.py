"""System facade — construction, per-frame entry points, shutdown, export.

Mirrors the reference's System class (/root/reference/include/System.h:65-209,
src/System.cc): wires Tracking + LocalMapping (+ LoopClosing + GridMapping as
they land), routes frames, exposes trajectory/map persistence and the
localization-mode toggle. Runs synchronously by default (deterministic; the
reference's thread interleaving is nondeterministic by design, SURVEY.md §2
parallelism table) with an async mode for throughput.
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..frontend.frame import make_stereo_frame_fn
from ..mapping.map_store import MapStore
from .local_mapping import LocalMapping
from .tracking import Tracking, TrackState


class System:
    def __init__(self, cfg: SlamConfig, enable_mapping: bool = True):
        self.cfg = cfg
        self.map = MapStore(cfg)
        self.local_mapper = LocalMapping(cfg, self.map) if enable_mapping else None
        self.tracker = Tracking(cfg, self.map, self.local_mapper)
        self._frame_fn = make_stereo_frame_fn(cfg)
        self.frame_times: List[float] = []
        self._frame_id = 0

    # ------------------------------------------------------------------
    def track_stereo(self, image_left, image_right, timestamp: float):
        """Per-frame stereo entry (System::TrackStereo, System.cc:167-216).

        Returns Tcw as (R, t) numpy arrays, or None while initializing/lost.
        """
        t0 = time.perf_counter()
        frame = self._frame_fn(jnp.asarray(image_left, jnp.float32), jnp.asarray(image_right, jnp.float32))
        pose = self.tracker.track_stereo_frame(frame, self._frame_id, timestamp)
        if self.local_mapper is not None:
            self.local_mapper.process_pending()
        self.frame_times.append(time.perf_counter() - t0)
        self._frame_id += 1
        return pose

    # ------------------------------------------------------------------
    def trajectory_kitti(self) -> List[np.ndarray]:
        return [T for _, T in self.tracker.trajectory()]

    def trajectory_tum(self) -> List[Tuple[float, np.ndarray]]:
        return self.tracker.trajectory()

    def save_trajectory_kitti(self, path: str):
        from ..io.trajectory import save_kitti

        save_kitti(path, self.trajectory_kitti())

    def save_trajectory_tum(self, path: str):
        from ..io.trajectory import save_tum

        save_tum(path, self.trajectory_tum())

    def timing_stats(self):
        ts = np.asarray(self.frame_times)
        if len(ts) == 0:
            return {}
        return {
            "median_s": float(np.median(ts)),
            "mean_s": float(ts.mean()),
            "fps": float(1.0 / np.median(ts)),
        }

    def shutdown(self):
        if self.local_mapper is not None:
            self.local_mapper.finish()
