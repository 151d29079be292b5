"""Multi-host distributed backend (SURVEY.md §5 distributed-communication
plan): `jax.distributed` runtime bring-up + keyframe/landmark-block sharding
of the global-BA problem across processes.

The reference is strictly single-process (SURVEY.md §2 parallelism table:
"Distributed communication backend: none"); this module is the TPU-native
scale-out path. Topology:
- each HOST is one jax process contributing its local devices to one global
  mesh over the axis "map" (the same axis dist_ba.py shards on);
- landmarks + observations are sharded over the global mesh (each device —
  on whichever host — owns P/n points and all their observations);
- cameras are replicated; the reduced camera system is psum-reduced, which
  rides ICI within a host/slice and DCN between hosts;
- the host-side driver on every process steps the SAME jitted program, so
  the abort/staleness protocol works unchanged.

Simulation recipe (SURVEY.md §4): N processes on one machine, each with
`--xla_force_host_platform_device_count=K` CPU devices, coordinated through
`jax.distributed.initialize` — the code path is identical to a real
multi-host TPU pod (only the transport differs), so CI exercises the real
sharding/collective program.
"""

from __future__ import annotations

import numpy as np

from .dist_ba import AXIS


def init_process(coordinator: str, num_processes: int, process_id: int,
                 local_devices: int = 4):
    """Bring up the jax.distributed runtime for one process of a multi-host
    group. Must run before any other jax API touches the backend.

    Returns the global Mesh over all processes' devices on axis AXIS."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    from jax.sharding import Mesh

    devs = jax.devices()  # global: all processes' devices
    return Mesh(np.array(devs), (AXIS,))


def host_array(mesh, pspec, np_value):
    """Create a GLOBAL jax.Array on a multi-host mesh from a numpy value that
    every process holds in full (single-controller-style SPMD: each process
    computes the same host-side assembly deterministically, then uploads only
    the shards its local devices own)."""
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_callback(
        np_value.shape, sharding, lambda idx: np_value[idx]
    )


def shard_problem_global(mesh, prob):
    """Upload a host-assembled (already shard_ba_problem-packed) BAProblem as
    global arrays over a multi-host mesh, matching make_dist_gba_iteration's
    in_specs."""
    from jax.sharding import PartitionSpec as P

    from ..optim.ba import BAProblem

    spec = BAProblem(
        R=P(), t=P(), xw=P(AXIS),
        obs_cam=P(AXIS), obs_pt=P(AXIS), obs_uvr=P(AXIS),
        obs_inv_sigma2=P(AXIS), obs_valid=P(AXIS),
        pt_obs=P(AXIS), cam_free=P(),
    )
    out = {}
    for field in prob._fields:
        v = getattr(prob, field)
        s = getattr(spec, field)
        if v is None:
            out[field] = None
            continue
        out[field] = host_array(mesh, s, np.asarray(v))
    return prob._replace(**out)


def run_dist_gba(mesh, cfg_optim, cam, prob_np, n_iters: int,
                 lam0: float = 1e-4):
    """Drive n_iters of the landmark-sharded global-BA LM step over a
    (possibly multi-host) mesh. `prob_np` must already be packed by
    shard_ba_problem(n_dev=mesh.size). Returns host numpy (R, t, xw, costs);
    xw is fetched via the replicated-output gather path so every process
    returns the full array."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from .dist_ba import make_dist_gba_iteration

    prob = shard_problem_global(mesh, prob_np)
    step = make_dist_gba_iteration(cfg_optim, mesh, cam)
    R, t, xw = prob.R, prob.t, prob.xw
    lam = jnp.float32(lam0)
    active = host_array(mesh, P(AXIS), np.asarray(prob_np.obs_valid, np.float32))
    costs = []
    for _ in range(n_iters):
        R, t, xw, lam, cost = step(prob, R, t, xw, lam, active, jnp.bool_(True))
        costs.append(float(jax.device_get(cost)))
    # R/t are replicated -> local fetch; xw is sharded across processes, so
    # gather through a process-local read of the addressable shards + an
    # allgather over the runtime is avoided: every process reconstructs its
    # addressable part and the caller compares hashes instead (the weights
    # live sharded in a real deployment; checkpointing goes through
    # per-process shard files, io/persistence.py-style)
    R_h, t_h = np.asarray(jax.device_get(R)), np.asarray(jax.device_get(t))
    xw_local = {}
    for shard in xw.addressable_shards:
        xw_local[shard.index[0]] = np.asarray(shard.data)
    return R_h, t_h, xw_local, costs
