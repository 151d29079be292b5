"""Benchmark: stereo tracking throughput on the real chip.

Runs the full per-frame hot path (stereo frame assembly: dual ORB pyramid
extraction + stereo matching; plus motion tracking with two LM pose solves on
a synthetic map) at KITTI stereo resolution and prints ONE JSON line.

vs_baseline is frames/s against the reference's real-time pacing target of
10 fps (/root/reference/Examples/Stereo/arducam.yaml Camera.fps; the
reference publishes no other throughput numbers, BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam2_2021_tpu.config import kitti_stereo_config
    from orb_slam2_2021_tpu.frontend.frame import make_stereo_frame_fn
    from orb_slam2_2021_tpu.pipeline.track_steps import make_motion_track_fn
    from orb_slam2_2021_tpu.geometry.camera import PinholeCamera

    cfg = kitti_stereo_config()
    cam = PinholeCamera.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.bf, cfg.width, cfg.height)
    frame_fn = make_stereo_frame_fn(cfg)
    motion_fn = make_motion_track_fn(cfg)

    rng = np.random.default_rng(0)
    # textured random images (dense FAST corners like real imagery)
    left = jnp.asarray(rng.uniform(0, 255, (cfg.height, cfg.width)), jnp.float32)
    right = jnp.asarray(np.roll(np.asarray(left), -8, axis=1))

    n = cfg.orb.n_features
    last_xw = jnp.asarray(rng.uniform(-10, 10, (n, 3)), jnp.float32) + jnp.asarray([0, 0, 15.0])
    last_desc = jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))
    last_oct = jnp.zeros(n, jnp.int32)
    last_ang = jnp.zeros(n, jnp.float32)
    last_valid = jnp.ones(n, bool)
    R0 = jnp.eye(3)
    t0 = jnp.zeros(3)

    def step(l, r):
        frame = frame_fn(l, r)
        out = motion_fn(
            cam, frame.kp, frame.u_right, R0, t0,
            last_xw, last_desc, last_oct, last_ang, last_valid,
            jnp.float32(7.0),
        )
        return frame, out

    # warmup/compile
    frame, out = step(left, right)
    jax.block_until_ready(out[0])

    iters = 30
    t_start = time.perf_counter()
    for _ in range(iters):
        frame, out = step(left, right)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t_start) / iters

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "stereo_tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 2),
    }))


if __name__ == "__main__":
    main()
