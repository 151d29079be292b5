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


def run(chained: bool):
    cfg = synthetic_config(width=320, height=240)
    cfg = cfg.replace(tracking=dataclasses.replace(cfg.tracking,
                                                   chained_lane=chained))
    world = SyntheticCylinderWorld(cfg, seed=3)
    gt = orbit_trajectory(128, total_deg=560.0, r_orbit=1.5)
    sys_ = System(cfg, async_mode=True)
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
    print(f"chained={chained}: lost {n_lost}/128  ATE {rmse:.4f}  "
          f"n_loops={n_loops}  KFs={sys_.map.n_kf}", flush=True)


if __name__ == "__main__":
    run(chained=False)
    run(chained=True)
