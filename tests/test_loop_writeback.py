"""Essential-graph point write-back semantics (Optimizer.cc:1017-1047).

After a loop correction, points already moved by CorrectLoop (mnCorrectedByKF)
must be un-projected through the CORRECTED pose of the group KF that moved
them; all other points through their reference KF's entry pose. The invariant
this buys: every point's projection into its reference camera is preserved by
the essential-graph write-back (camera-frame coordinates change only by the
gauge scale), i.e. a large loop correction leaves reprojection residuals
small instead of scattering the loop-group points.
"""

import numpy as np

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.mapping.map_store import MapStore
from orb_slam2_2021_tpu.pipeline.loop_closing import LoopClosing, _sim3_inv, _sim3_mul
from orb_slam2_2021_tpu.place.kf_database import KeyFrameDatabase
from orb_slam2_2021_tpu.place.vocab import BinaryVocabulary


def _project(cfg, R, t, pw):
    pc = pw @ R.T + t
    z = pc[:, 2]
    u = cfg.fx * pc[:, 0] / z + cfg.cx
    v = cfg.fy * pc[:, 1] / z + cfg.cy
    return np.stack([u, v], 1), z


def test_essential_writeback_preserves_reprojection():
    cfg = synthetic_config()
    m = MapStore(cfg)
    rng = np.random.default_rng(3)

    n_kf = 8
    drift_from = 4  # KFs 4..7 carry accumulated drift
    # ground-truth camera positions along x
    gt_pos = np.stack([np.array([0.5 * k, 0, 0]) for k in range(n_kf)]).astype(np.float32)
    # drift transform applied to the later keyframes (large: 0.8 m + 12 deg)
    a = np.deg2rad(12.0)
    Rd = np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
        np.float32,
    )
    td = np.array([0.8, 0.3, -0.4], np.float32)

    kf_pw = {}
    N = cfg.orb.n_features
    for k in range(n_kf):
        R_cw = np.eye(3, dtype=np.float32)
        t_cw = (-gt_pos[k]).astype(np.float32)
        if k >= drift_from:
            # drifted pose: camera at gt_pos+td, rotated by Rd
            R_cw = Rd.T.astype(np.float32)
            t_cw = (-Rd.T @ (gt_pos[k] + td)).astype(np.float32)
        # 40 points in front of this camera, positions CONSISTENT with the
        # (possibly drifted) pose: pick camera coords, back-project
        xc = np.stack(
            [rng.uniform(-2, 2, 40), rng.uniform(-1.5, 1.5, 40), rng.uniform(4, 8, 40)],
            axis=1,
        ).astype(np.float32)
        pw = (xc - t_cw) @ R_cw  # R^T (xc - t)
        bind = np.full(N, -1, np.int64)
        valid = np.zeros(N, bool)
        valid[:40] = True
        k_id = m.add_keyframe(
            R_cw, t_cw,
            np.zeros((N, 2), np.float32), np.full(N, -1.0, np.float32),
            np.full(N, -1.0, np.float32), np.zeros(N, np.int32),
            np.zeros(N, np.float32), np.zeros((N, 8), np.uint32),
            valid, bind,
        )
        ids = m.add_map_points_batch(pw, np.zeros((40, 8), np.uint32), first_kf=k_id)
        for f, mp in enumerate(ids):
            m.kf_mp[k_id, f] = mp
            m._add_observation(int(mp), k_id, f)
        kf_pw[k] = ids
        if k > 0:
            m._set_parent(k, k - 1)
        m.update_connections(k)

    # --- simulate the CorrectLoop state at essential-graph entry ---
    # loop: KF 7 closes against KF 0; group = {7, 6}; corrected pose of 7 is
    # its ground-truth pose with a scale hypothesis (fix_scale would be s=1;
    # use s=1 here since MapStore poses are rigid)
    group = [7, 6]
    corrected, old_poses, moved_by = {}, {}, {}
    for ki in group:
        old_poses[ki] = (1.0, m.kf_R[ki].copy(), m.kf_t[ki].copy())
        corrected[ki] = (1.0, np.eye(3, dtype=np.float32), (-gt_pos[ki]).astype(np.float32))
    for ki in group:
        sc, Rc, tc = corrected[ki]
        so, Ro, to = old_poses[ki]
        for mp in kf_pw[ki]:
            mp = int(mp)
            if mp in moved_by:
                continue
            pw = m.mp_pos[mp]
            pc = so * (Ro @ pw) + to
            sci, Rci, tci = _sim3_inv(sc, Rc, tc)
            m.mp_pos[mp] = (sci * (Rci @ pc) + tci).astype(np.float32)
            moved_by[mp] = ki
        m.kf_R[ki] = Rc
        m.kf_t[ki] = (tc / sc).astype(np.float32)

    # projections of every point into its reference camera, at entry state
    mp_ids = np.nonzero(m.mp_valid)[0]
    ref = m.mp_obs_kf[mp_ids, 0]
    uv_before = np.zeros((len(mp_ids), 2), np.float32)
    for i, (mp, rk) in enumerate(zip(mp_ids, ref)):
        uv, _ = _project(cfg, m.kf_R[rk], m.kf_t[rk], m.mp_pos[mp][None])
        uv_before[i] = uv[0]

    # --- run the essential-graph optimization with the fixed write-back ---
    voc = BinaryVocabulary(2, 2, np.zeros((7, 8), np.uint32), np.ones(4, np.float32))
    lc = LoopClosing(cfg, m, KeyFrameDatabase(voc), fix_scale=True)
    lc.loop_edges.setdefault(7, set()).add(0)
    lc.loop_edges.setdefault(0, set()).add(7)
    lc._optimize_essential_graph(7, 0, corrected, old_poses, moved_by)

    uv_after = np.zeros((len(mp_ids), 2), np.float32)
    for i, (mp, rk) in enumerate(zip(mp_ids, ref)):
        uv, z = _project(cfg, m.kf_R[rk], m.kf_t[rk], m.mp_pos[mp][None])
        uv_after[i] = uv[0]
        assert z[0] > 0, "point behind its reference camera after write-back"

    err = np.linalg.norm(uv_after - uv_before, axis=1)
    assert err.max() < 1.0, (
        f"essential write-back scattered points: max reproj shift {err.max():.2f}px"
    )
