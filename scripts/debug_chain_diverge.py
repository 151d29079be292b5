"""Side-by-side state divergence hunt: System A (per-frame path) vs System B
(pipelined lane, synchronous mapping) on identical frames. Prints per frame
the difference in last_pose, binding counts, KF count — the first divergence
localizes where the pipelined flow corrupts host state."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

import dataclasses

import jax.numpy as jnp
import numpy as np

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.io.synthetic import SyntheticCylinderWorld, orbit_trajectory
from orb_slam2_2021_tpu.pipeline.system import System

N = int(os.environ.get("N_FRAMES", "40"))


def main():
    cfg = synthetic_config(width=320, height=240)
    cfgB = cfg.replace(tracking=dataclasses.replace(cfg.tracking,
                                                    chained_lane=True))
    world = SyntheticCylinderWorld(cfg, seed=3)
    gt = orbit_trajectory(128, total_deg=560.0, r_orbit=1.5)

    A = System(cfg)
    B = System(cfgB)

    def track_pipe(sys_, l, r, ts):
        sys_._pre_frame()
        stacked = np.clip(np.stack([l, r]), 0, 255).astype(np.uint8)
        frame = sys_._frame_u8_fn(jnp.asarray(stacked))
        with sys_.map.lock:
            pose = sys_.tracker.track_stereo_frame_pipelined(
                frame, sys_._frame_id, ts)
        sys_._post_track()
        sys_._frame_id += 1
        return pose

    for i in range(N):
        R_wc, t_wc = gt[i]
        left, right = world.render(R_wc, t_wc)
        A.track_stereo(left, right, timestamp=i * 0.1)
        track_pipe(B, left, right, i * 0.1)
        ta = A.tracker.last_pose
        tb = B.tracker.last_pose
        dpos = (np.linalg.norm(ta[1] - tb[1])
                if (ta is not None and tb is not None) else float("nan"))
        ba_ = int((A.tracker._bind_cur >= 0).sum())
        bb_ = int((B.tracker._bind_cur >= 0).sum())
        print(f"f{i:3d}: dpos {dpos:.4f}  bindA {ba_:3d} bindB {bb_:3d}  "
              f"kfA {A.map.n_kf} kfB {B.map.n_kf}  "
              f"chainB={'Y' if B.tracker._chain_state is not None else 'n'}"
              f"{' LAG' if B.tracker._pend is not None else ''}",
              flush=True)
    for ev in getattr(B.tracker, "chain_log", []):
        print(" B:", ev, flush=True)


if __name__ == "__main__":
    main()
