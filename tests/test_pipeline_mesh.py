"""Pipeline-level multi-chip: a System constructed with a device mesh runs
its global bundle adjustment landmark-sharded over the mesh (shard_map +
psum'd camera system, parallel/dist_ba.py) — the pipeline path, not the
standalone kernel (VERDICT #6; SURVEY.md §5 distributed-backend plan)."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.io.synthetic import SyntheticStereoWorld, forward_trajectory
from orb_slam2_2021_tpu.io.trajectory import ate_rmse
from orb_slam2_2021_tpu.parallel.dist_ba import AXIS
from orb_slam2_2021_tpu.pipeline.system import System


@pytest.mark.slow
def test_global_ba_runs_sharded_through_pipeline():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide the 8-device CPU mesh"
    mesh = Mesh(np.array(devs[:8]), (AXIS,))

    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=11)
    gt = forward_trajectory(24, step=0.14)
    sys_ = System(cfg, mesh=mesh)
    for i, (R, t) in enumerate(gt):
        left, right = world.render(R, t)
        sys_.track_stereo(left, right, timestamp=i * 0.1)

    lc = sys_.loop_closer
    assert lc is not None and lc.mesh is mesh
    n_kf = int(sys_.map.kf_valid.sum())
    assert n_kf >= 3, f"need a real map, got {n_kf} KFs"

    # force the full-map BA exactly as CorrectLoop's GBA thread would
    lc._run_global_ba(idx=lc.full_ba_idx)
    sys_.shutdown()

    # the sharded step was built and iterated
    assert lc._dist_step is not None, "GBA did not take the mesh path"
    assert len(lc.gba_iter_times) == cfg.optim.global_ba_iters

    # the optimized map is sane: finite poses/points and trajectory accuracy
    # survives the sharded solve
    kfs = np.nonzero(sys_.map.kf_valid)[0]
    assert np.isfinite(sys_.map.kf_R[kfs]).all()
    assert np.isfinite(sys_.map.kf_t[kfs]).all()
    mp = np.nonzero(sys_.map.mp_valid)[0]
    assert np.isfinite(sys_.map.mp_pos[mp]).all()

    est = sys_.trajectory_kitti()
    gt_mats = []
    for R, t in gt[: len(est)]:
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        gt_mats.append(T)
    rmse = float(ate_rmse(est, gt_mats))
    total = float(np.linalg.norm(np.diff([T[:3, 3] for T in gt_mats], axis=0), axis=1).sum())
    assert rmse < max(0.05 * total, 0.05), f"ATE {rmse:.3f} over {total:.1f} m"
