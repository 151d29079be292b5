"""Cross-process global BA for the LIVE pipeline.

The reference's RunGlobalBundleAdjustment is a single-process thread
(/root/reference/src/LoopClosing.cc:674-779). Here the running System's
background GBA executes across MULTIPLE jax.distributed processes: the
tracking/mapping pipeline lives in process 0, and when a loop closure
spawns a global BA, the assembled problem is shipped to every process and
solved in lockstep over the global device mesh (landmarks sharded over the
'map' axis, camera reductions psum'd — parallel/dist_ba.py). This is
SURVEY.md §5's distributed plan wired into the product, not a synthetic
bring-up.

Protocol (leader = the pipeline process; followers = GbaServer processes):
- work items travel through a shared work_dir (atomic rename; stands in for
  the control plane — the BULK numeric traffic rides the jax.distributed
  collectives, not these files);
- per chunk of LM iterations the leader writes `go` or `stop` BEFORE
  entering the chunk's collective program, and followers WAIT for that
  marker — a follower never enters a collective the leader has not
  committed to, which makes the abort protocol (mbStopGBA,
  LoopClosing.cc:604-608) deadlock-free across processes;
- the final state is all-gathered to replicated layout on every process, so
  the leader holds the full solution for map write-back.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, List, Optional

import numpy as np


CHUNK_ITERS = 2  # matches the single-process async GBA chunking


def _write_marker(path: str, payload: dict):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.rename(tmp, path)


def _wait_for(path: str, timeout: float, poll: float = 0.005) -> bool:
    t0 = time.monotonic()
    while not os.path.exists(path):
        if time.monotonic() - t0 > timeout:
            return False
        time.sleep(poll)
    return True


class _LockstepGBA:
    """Shared chunked LM driver — the SAME code runs on leader and
    followers; only who writes vs waits for the markers differs."""

    def __init__(self, mesh, cfg_optim, cam, work_dir: str):
        self.mesh = mesh
        self.cfg_optim = cfg_optim
        self.cam = cam
        self.work_dir = work_dir
        self._step = None
        self._gather = None

    def _ensure_programs(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .dist_ba import make_dist_gba_iteration

        if self._step is None:
            self._step = make_dist_gba_iteration(
                self.cfg_optim, self.mesh, self.cam
            )
            # all-gather of the sharded landmark block into replicated
            # layout: after this every process holds the full solution
            self._gather = jax.jit(
                lambda x: x,
                out_shardings=NamedSharding(self.mesh, P()),
            )

    def run(self, idx: int, prob_np, n_iters: int, leader: bool,
            should_stop: Optional[Callable[[], bool]] = None,
            iter_times: Optional[List[float]] = None):
        """Run the lockstep solve. Returns (R, t, xw) host numpy (full
        arrays on every process) or None when aborted."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from .dist_ba import AXIS
        from .multihost import host_array, shard_problem_global

        self._ensure_programs()
        prob = shard_problem_global(self.mesh, prob_np)
        R, t, xw = prob.R, prob.t, prob.xw
        lam = jnp.float32(self.cfg_optim.lm_lambda_init)
        active = host_array(
            self.mesh, P(AXIS),
            np.asarray(prob_np.obs_valid, np.float32),
        )
        done = 0
        chunk_j = 0
        aborted = False
        while done < n_iters:
            marker = os.path.join(self.work_dir, f"chunk_{idx}_{chunk_j}.json")
            if leader:
                stop = bool(should_stop and should_stop())
                _write_marker(marker, {"stop": stop})
            else:
                if not _wait_for(marker, timeout=300.0):
                    raise TimeoutError(f"no chunk marker {marker}")
                with open(marker) as f:
                    stop = bool(json.load(f)["stop"])
            if stop:
                aborted = True
                break
            k = min(CHUNK_ITERS, n_iters - done)
            t0 = time.perf_counter()
            for _ in range(k):
                R, t, xw, lam, _cost = self._step(
                    prob, R, t, xw, lam, active, jnp.bool_(True)
                )
            jax.block_until_ready(R)
            if iter_times is not None:
                iter_times.extend([(time.perf_counter() - t0) / k] * k)
            done += k
            chunk_j += 1
        if aborted:
            return None
        xw_full = self._gather(xw)
        return (
            np.asarray(jax.device_get(R)),
            np.asarray(jax.device_get(t)),
            np.asarray(jax.device_get(xw_full)),
        )


def _problem_path(work_dir: str, idx: int) -> str:
    return os.path.join(work_dir, f"problem_{idx}.npz")


def _save_problem(path: str, prob_np, n_iters: int):
    # np.savez appends ".npz" unless the name already ends with it — the tmp
    # name must keep the suffix or the atomic rename source never exists
    tmp = path + ".tmp.npz"
    fields = {f: np.asarray(getattr(prob_np, f)) for f in prob_np._fields
              if getattr(prob_np, f) is not None}
    np.savez(tmp, n_iters=np.int64(n_iters), **fields)
    os.rename(tmp, path)


def _load_problem(path: str):
    from ..optim.ba import BAProblem

    z = np.load(path)
    kw = {f: (z[f] if f in z.files else None) for f in BAProblem._fields}
    return BAProblem(**kw), int(z["n_iters"])


class GbaClient(_LockstepGBA):
    """Leader side, owned by the pipeline process's LoopClosing. `solve`
    ships the problem and drives the lockstep iterations."""

    def __init__(self, mesh, cfg_optim, cam, work_dir: str):
        super().__init__(mesh, cfg_optim, cam, work_dir)
        os.makedirs(work_dir, exist_ok=True)
        self._idx = 0

    def solve(self, prob_np, n_iters: int,
              should_stop: Optional[Callable[[], bool]] = None,
              iter_times: Optional[List[float]] = None):
        idx = self._idx
        self._idx += 1
        _save_problem(_problem_path(self.work_dir, idx), prob_np, n_iters)
        return self.run(idx, prob_np, n_iters, leader=True,
                        should_stop=should_stop, iter_times=iter_times)

    def shutdown(self):
        _write_marker(os.path.join(self.work_dir, "shutdown.json"), {})


class GbaServer(_LockstepGBA):
    """Follower process: waits for shipped problems and joins the lockstep
    collectives until the leader posts shutdown."""

    def serve_forever(self, poll: float = 0.01):
        idx = 0
        solved = 0
        shut = os.path.join(self.work_dir, "shutdown.json")
        while True:
            p = _problem_path(self.work_dir, idx)
            if os.path.exists(p):
                prob_np, n_iters = _load_problem(p)
                self.run(idx, prob_np, n_iters, leader=False)
                solved += 1
                idx += 1
                continue
            if os.path.exists(shut):
                return solved
            time.sleep(poll)
