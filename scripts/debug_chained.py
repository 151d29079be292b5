"""Validate the fixed chained tracking lane against the per-frame path on
the bench scenario (async orbit): lost frames + ATE for both configurations.
The lane may only carry the bench once it shows zero-lost and sync-parity
ATE here (VERDICT r3 item 2)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

import numpy as np
import dataclasses

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.io.synthetic import SyntheticCylinderWorld, orbit_trajectory
from orb_slam2_2021_tpu.io.trajectory import ate_rmse
from orb_slam2_2021_tpu.pipeline.system import System


def run(chained: bool, sync_pipelined: bool = False):
    cfg = synthetic_config(width=320, height=240)
    cfg = cfg.replace(tracking=dataclasses.replace(cfg.tracking,
                                                   chained_lane=chained))
    world = SyntheticCylinderWorld(cfg, seed=3)
    gt = orbit_trajectory(128, total_deg=560.0, r_orbit=1.5)
    sys_ = System(cfg, async_mode=not sync_pipelined)
    if sync_pipelined:
        # drive the PIPELINED tracker entry with synchronous mapping: no
        # worker thread, so any chain break left is a logic bug, not a race
        import jax.numpy as jnp

        def track_pipe(l, r, timestamp):
            sys_._pre_frame()
            stacked = np.clip(np.stack([l, r]), 0, 255).astype(np.uint8)
            frame = sys_._frame_u8_fn(jnp.asarray(stacked))
            with sys_.map.lock:
                pose = sys_.tracker.track_stereo_frame_pipelined(
                    frame, sys_._frame_id, timestamp)
            sys_._post_track()
            rec = sys_.tracker.last_metrics
            if rec is not None:
                sys_.metrics.append(dict(rec))
            sys_._frame_id += 1
            return pose

        sys_.track_stereo = track_pipe
    for i, (R_wc, t_wc) in enumerate(gt):
        left, right = world.render(R_wc, t_wc)
        sys_.track_stereo(left, right, timestamp=i * 0.1)
    sys_.shutdown()
    n_lost = sum(1 for r in sys_.metrics if r.get("state") == "LOST")
    est = sys_.trajectory_kitti()
    gt_mats = []
    for R_wc, t_wc in gt[: len(est)]:
        T = np.eye(4)
        T[:3, :3] = R_wc
        T[:3, 3] = t_wc
        gt_mats.append(T)
    rmse = ate_rmse(est, gt_mats)
    n_loops = sys_.loop_closer.n_loops if sys_.loop_closer else 0
    counters = {k: v for k, v in sys_.tracker.sect_counts.items()
                if k.startswith("chain.")}
    # per-frame gt error of the exported trajectory (unaligned, SLAM frame)
    T0 = np.eye(4)
    T0[:3, :3] = gt[0][0]
    T0[:3, 3] = gt[0][1]
    errs = [float(np.linalg.norm(T[:3, 3] - (np.linalg.inv(T0) @ gt_mats[i])[:3, 3]))
            for i, T in enumerate(est)]
    worst = int(np.argmax(errs))
    print(f"chained={chained}: lost {n_lost}/128  ATE {rmse:.4f}  "
          f"n_loops={n_loops}  KFs={sys_.map.n_kf}  {counters}", flush=True)
    print("  err curve (every 8): "
          + " ".join(f"{e:.2f}" for e in errs[::8])
          + f"  worst f{worst}={errs[worst]:.2f}", flush=True)
    for ev in getattr(sys_.tracker, "chain_log", []):
        print(f"  {ev}", flush=True)


if __name__ == "__main__":
    which = os.environ.get("CHAINED_ONLY", "")
    if which == "1":
        run(chained=True)
    elif which == "0":
        run(chained=False)
    elif which == "sync":
        run(chained=True, sync_pipelined=True)
    else:
        run(chained=False)
        run(chained=True)
