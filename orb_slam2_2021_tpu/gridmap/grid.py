"""Occupancy grid: jitted ray-cast counter updates + grid rendering.

Counters mirror the reference (GridMapping.cpp:72-135): `visit` increments
on every cell a camera->point ray crosses, `occupied` increments at the
point's cell. The reference walks Bresenham per ray (CastLaserBeam,
:232-270); here every ray is sampled at S uniform steps and all (ray, step)
cells are scatter-added in one device op — cells can be counted at most once
per ray (duplicate samples within a ray are deduplicated by a
first-occurrence mask), matching Bresenham's visit-once semantics.

Grid rendering (BuildOccupancyGridMsg, :137-154): int8 cells, -1 unknown,
0 free, 100 occupied, using the visit/free/occupied thresholds from config
(GridMapConfig; reference values at GridMapping.cpp:77-98).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GridMapConfig, SlamConfig

RAY_STEPS = 256  # static samples per ray; >= grid diagonal in cells / ray


class OccupancyGrid(NamedTuple):
    """nav_msgs/OccupancyGrid equivalent payload."""
    data: np.ndarray       # [H, W] int8: -1 unknown / 0 free / 100 occupied
    resolution: float      # meters per cell
    origin_x: float        # world x of cell (0, 0)
    origin_z: float


def raycast_update(
    visit, occupied,            # [H, W] int32 counters
    cam_xz,                     # [2] camera (x, z) in grid cells (float)
    pts_xz,                     # [P, 2] point (x, z) in grid cells
    valid,                      # [P]
):
    """One keyframe's rays accumulated into the counters (jitted)."""
    H, W = visit.shape
    P = pts_xz.shape[0]
    f = jnp.linspace(0.0, 1.0, RAY_STEPS)[None, :, None]          # [1,S,1]
    line = cam_xz[None, None, :] + (pts_xz[:, None, :] - cam_xz[None, None, :]) * f
    cells = jnp.round(line).astype(jnp.int32)                     # [P,S,2]
    cx = jnp.clip(cells[..., 0], 0, W - 1)
    cz = jnp.clip(cells[..., 1], 0, H - 1)
    flat = cz * W + cx                                            # [P,S]
    # visit-once per ray: mask samples that repeat the previous cell
    first = jnp.concatenate(
        [jnp.ones((P, 1), bool), flat[:, 1:] != flat[:, :-1]], axis=1
    )
    w = (first & valid[:, None]).astype(jnp.int32)
    visit = visit.reshape(-1).at[flat.reshape(-1)].add(w.reshape(-1)).reshape(H, W)
    # endpoint cells -> occupied
    end = flat[:, -1]
    occupied = (
        occupied.reshape(-1).at[end].add(valid.astype(jnp.int32)).reshape(H, W)
    )
    return visit, occupied


@functools.lru_cache(maxsize=2)
def _make_raycast():
    return jax.jit(raycast_update, donate_argnums=(0, 1))


def render_grid(visit, occupied, cfg: GridMapConfig):
    """Counters -> int8 occupancy values (BuildOccupancyGridMsg)."""
    v = np.asarray(visit)
    o = np.asarray(occupied)
    out = np.full(v.shape, -1, np.int8)
    seen = v > cfg.visit_th
    ratio = np.where(seen, o / np.maximum(v, 1), 0.0)
    out[seen & (ratio >= cfg.occ_th)] = 100
    out[seen & ((1.0 - ratio) >= cfg.free_th)] = 0
    return out


class GridMapper:
    """Host wrapper: accumulates keyframes, handles loop-closure replay."""

    def __init__(self, cfg: SlamConfig, map_store):
        self.cfg = cfg
        self.map = map_store
        g = cfg.gridmap
        self.visit = jnp.zeros((g.size_z, g.size_x), jnp.int32)
        self.occupied = jnp.zeros((g.size_z, g.size_x), jnp.int32)
        # grid center at world origin (ref: mid of 6000x6300 grid, :85-92)
        self.origin_x = -g.size_x / (2.0 * g.scale)
        self.origin_z = -g.size_z / (2.0 * g.scale)
        self._fn = _make_raycast()
        self.processed = []
        self._next_kf = 0  # monotone KF-id cursor for incremental updates

    def _world_to_cells(self, xz: np.ndarray) -> np.ndarray:
        g = self.cfg.gridmap
        return np.stack(
            [
                (xz[..., 0] - self.origin_x) * g.scale,
                (xz[..., 1] - self.origin_z) * g.scale,
            ],
            axis=-1,
        ).astype(np.float32)

    def update_kf(self, k: int):
        """UpdateGridMap (:109-135): project KF center + its points."""
        if not self.map.kf_valid[k]:
            return
        P = self.cfg.gridmap.max_points_per_kf
        mp = self.map.kf_mp[k]
        ids = mp[mp >= 0]
        ids = ids[self.map.mp_valid[ids]][:P]
        if len(ids) == 0:
            return
        R, t = self.map.kf_R[k], self.map.kf_t[k]
        cam = -R.T @ t
        pts = self.map.mp_pos[ids]
        cam_xz = self._world_to_cells(cam[[0, 2]])
        pts_xz = np.zeros((P, 2), np.float32)
        pts_xz[: len(ids)] = self._world_to_cells(pts[:, [0, 2]])
        pts_xz[len(ids):] = cam_xz  # padded rays collapse to the camera cell
        valid = np.zeros(P, bool)
        valid[: len(ids)] = True
        self.visit, self.occupied = self._fn(
            self.visit, self.occupied,
            jnp.asarray(cam_xz), jnp.asarray(pts_xz), jnp.asarray(valid),
        )
        self.processed.append(k)

    def process_new(self, loop_closed: bool = False):
        """Drive from the pipeline: on loop closure rebuild everything, else
        ingest keyframes created since the last call (GridMapping::Run,
        :21-70)."""
        if loop_closed:
            self.reset_and_replay()
            self._next_kf = self.map.next_kf
            return
        while self._next_kf < self.map.next_kf:
            k = self._next_kf
            self._next_kf += 1
            if self.map.kf_valid[k]:
                self.update_kf(k)

    def reset_and_replay(self):
        """ResetGridMap + full KF replay after a loop closure (:43-60)."""
        g = self.cfg.gridmap
        self.visit = jnp.zeros((g.size_z, g.size_x), jnp.int32)
        self.occupied = jnp.zeros((g.size_z, g.size_x), jnp.int32)
        self.processed = []
        for k in np.nonzero(self.map.kf_valid)[0]:
            self.update_kf(int(k))

    def occupancy_grid(self) -> OccupancyGrid:
        g = self.cfg.gridmap
        return OccupancyGrid(
            data=render_grid(self.visit, self.occupied, g),
            resolution=1.0 / g.scale,
            origin_x=self.origin_x,
            origin_z=self.origin_z,
        )

    def point_cloud(self) -> np.ndarray:
        """ConvertToPCL (:272-306): live map points as [N, 3] float32."""
        return self.map.mp_pos[self.map.mp_valid].copy()
