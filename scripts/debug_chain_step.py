"""Single-step A/B of the chained device lane vs the host fused path.

Drive N frames through the normal per-frame path (sync), then for frame N+1
run BOTH:
  (a) the host fused step (_track_fused's exact inputs), and
  (b) a freshly seeded chain (_init_chain + one chained dispatch),
and compare nm1/nin1/nin2 and the reconstructed motion-stage inputs
(last-frame landmark geometry + validity) elementwise."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

import jax.numpy as jnp
import numpy as np

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.io.synthetic import SyntheticCylinderWorld, orbit_trajectory
from orb_slam2_2021_tpu.pipeline.system import System
from orb_slam2_2021_tpu.pipeline.tracking import _mat

N_WARM = int(os.environ.get("N_WARM", "24"))


def main():
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticCylinderWorld(cfg, seed=3)
    gt = orbit_trajectory(128, total_deg=560.0, r_orbit=1.5)
    sys_ = System(cfg)  # sync
    frames_dev = []
    for i in range(N_WARM + 1):
        R_wc, t_wc = gt[i]
        left, right = world.render(R_wc, t_wc)
        if i < N_WARM:
            sys_.track_stereo(left, right, timestamp=i * 0.1)
        else:
            stacked = np.clip(np.stack([left, right]), 0, 255).astype(np.uint8)
            frame = sys_._frame_u8_fn(jnp.asarray(stacked))
    tr = sys_.tracker
    print(f"state={tr.state} velocity={'ok' if tr.velocity is not None else None} "
          f"n_kf={sys_.map.n_kf}")

    # ---- (a) host fused path inputs ----
    lf = tr.last_frame_data
    n = cfg.orb.n_features
    ids = np.where(lf["mp"] >= 0, lf["mp"], -1)
    live = tr.map.resolve_replaced(ids)
    alive_h = (live >= 0) & tr.map.mp_valid[np.clip(live, 0, None)]
    lm_ids = np.where(alive_h, live, -1)
    host_xw = tr.map.mp_pos[np.clip(live, 0, None)].copy()

    # replicate to read the counters: call the fused fn directly (do NOT run
    # tr._track_fused first — it advances last_pose and would poison both
    # replications with an off-by-one prediction)
    sel = tr._select_local_kfs(lm_ids[lm_ids >= 0])
    tr._refresh_snapshot(sel[1])
    pack = np.empty(5 * n + 16, np.float32)
    geom = pack[: 4 * n].reshape(n, 4)
    geom[:, :3] = host_xw
    geom[:, 3] = alive_h
    pack[4 * n: 5 * n] = np.where(
        lm_ids >= 0, tr._id2slot[np.clip(lm_ids, 0, None)], -1
    ).astype(np.int32).view(np.float32)
    R_l, t_l = lf["pose"]  # NOTE: _track_fused uses self.last_pose
    R_l2, t_l2 = tr.last_pose
    T_pred = tr.velocity @ _mat(R_l2, t_l2)
    pp = pack[5 * n:]
    pp[:] = 0.0
    pp[:9] = T_pred[:3, :3].reshape(-1)
    pp[9:12] = T_pred[:3, 3]
    pp[12] = cfg.tracking.motion_search_radius
    pp[13] = cfg.resolved_depth_th()
    pp[14] = 20.0
    out_h = np.asarray(tr._fused_fn(
        tr.cam, frame.kp, frame.u_right, frame.depth,
        lf.kp.desc, lf.kp.octave, lf.kp.angle, lf.kp.valid,
        jnp.asarray(pack), *tr._snap_dev,
    ))
    fh = out_h[:30].view(np.float32)
    print(f"host fused: nm1={int(fh[12])} nin1={int(fh[13])} nin2={int(fh[14])}")

    # ---- (b) chained seed + one dispatch ----
    ok = tr._init_chain()
    print(f"init_chain={ok}")
    out_dev = tr._dispatch_chained(frame)
    out_c = np.asarray(out_dev)
    fc = out_c[:30].view(np.float32)
    print(f"chained:    nm1={int(fc[12])} nin1={int(fc[13])} nin2={int(fc[14])}")

    # ---- compare the motion-stage inputs the device reconstructs ----
    slots = np.where(lm_ids >= 0, tr._id2slot[np.clip(lm_ids, 0, None)], -1)
    snap_geom = np.asarray(tr._snap_dev[0])
    snap_valid = np.asarray(tr._snap_dev[2])
    dev_alive = (slots >= 0) & snap_valid[np.clip(slots, 0, None)]
    dev_xw = snap_geom[np.clip(slots, 0, None), :3]
    both = alive_h & dev_alive
    print(f"alive: host={alive_h.sum()} dev={dev_alive.sum()} both={both.sum()}")
    if both.sum():
        d = np.abs(dev_xw[both] - host_xw[both]).max()
        print(f"max |xw_dev - xw_host| on common: {d:.6f}")
    only_h = alive_h & ~dev_alive
    print(f"host-only alive: {only_h.sum()}")

    # compare the chain header pose vs host prediction
    st = np.asarray(tr._chain_state) if tr._chain_state is not None else None
    print("chain state present:", st is not None)


if __name__ == "__main__":
    main()
