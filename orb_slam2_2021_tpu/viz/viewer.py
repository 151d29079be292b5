"""Viewer — composes the frame overlay + map view, headless.

The reference's Viewer thread (/root/reference/src/Viewer.cc:59-160) polls
FrameDrawer + MapDrawer at the camera fps and renders to Pangolin/OpenCV
windows. Here `update()` is called per frame (or at any stride), renders the
same content to numpy images, optionally writes PNGs to a directory, and
publishes them on the in-process bus (topic "os2_viz") for live consumers.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .draw import write_png
from .frame_drawer import FrameDrawer
from .map_drawer import MapDrawer


class Viewer:
    def __init__(
        self,
        system,
        out_dir: Optional[str] = None,
        stride: int = 1,
        map_size: int = 720,
        bus=None,
    ):
        self.system = system
        self.out_dir = out_dir
        self.stride = max(1, stride)
        self.frame_drawer = FrameDrawer(system.cfg)
        self.map_drawer = MapDrawer(width=map_size, height=map_size)
        self.bus = bus
        self._count = 0
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

    def update(self, image: Optional[np.ndarray] = None):
        """Render the current state. `image` = the frame just tracked."""
        self._count += 1
        if (self._count - 1) % self.stride:
            return None
        sys_ = self.system
        frame_img = None
        if image is not None:
            frame_img = self.frame_drawer.draw_from_system(sys_, image)
        cur_pose = sys_.tracker.last_pose
        map_img = self.map_drawer.render(sys_.map, cur_pose=cur_pose)

        if self.out_dir:
            idx = self._count - 1
            if frame_img is not None:
                write_png(os.path.join(self.out_dir, f"frame_{idx:06d}.png"), frame_img)
            write_png(os.path.join(self.out_dir, f"map_{idx:06d}.png"), map_img)
        if self.bus is not None:
            self.bus.publish("os2_viz", {"frame": frame_img, "map": map_img})
        return frame_img, map_img
