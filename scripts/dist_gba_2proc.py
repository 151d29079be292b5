"""Two-process jax.distributed global-BA bring-up (VERDICT r3 item 7;
SURVEY.md §5 distributed plan).

Parent mode (no --proc): spawns TWO child processes of itself, each a
jax.distributed participant with 4 virtual CPU devices, forming one global
8-device mesh; waits; checks both children solved the SAME landmark-sharded
global-BA problem, agreed on the (replicated) camera solution bit-for-bit,
reduced the cost, and round-tripped a checkpoint across the process
boundary. Prints one JSON line with the outcome.

Child mode (--proc I): builds a deterministic synthetic BA problem (identical
on both processes — single-controller-style SPMD), runs
parallel/multihost.run_dist_gba over the global mesh, writes its camera
solution + per-shard point hashes + cost curve to OUT_DIR. Process 0
additionally writes a checkpoint of the solved cameras that process 1 (next
run phase) validates it can restore — checkpoint/restore across the host
boundary.

The transport is the real jax.distributed runtime (coordinator + cross-
process collectives); on a TPU pod only the device list changes.
"""

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.environ.get("DIST_GBA_OUT", "/tmp/dist_gba_2proc")
PORT = int(os.environ.get("DIST_GBA_PORT", "52321"))
N_PROC = 2
LOCAL_DEVS = 4
N_ITERS = 6


def build_problem():
    """Deterministic synthetic global-BA problem, packed for the 8-device
    global mesh. Both processes call this with the same seed."""
    import numpy as np

    from orb_slam2_2021_tpu.config import synthetic_config
    from orb_slam2_2021_tpu.geometry.camera import PinholeCamera
    from orb_slam2_2021_tpu.parallel.dist_ba import shard_ba_problem

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_ba import build_problem as _bp

    rng = np.random.default_rng(42)
    n_dev = N_PROC * LOCAL_DEVS
    n_pts = 512  # divisible by 8
    prob, *_ = _bp(rng, n_cams=12, n_pts=n_pts, obs_per_pt=4, noise=0.15)
    packed = shard_ba_problem(prob, n_dev)
    cfg = synthetic_config()
    cam = PinholeCamera.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.bf,
                               cfg.width, cfg.height)
    return cfg, cam, packed


def child(proc_id: int):
    t0 = time.time()
    from orb_slam2_2021_tpu.parallel.multihost import init_process, run_dist_gba

    mesh = init_process(f"127.0.0.1:{PORT}", N_PROC, proc_id,
                        local_devices=LOCAL_DEVS)
    import jax
    import numpy as np

    assert len(jax.devices()) == N_PROC * LOCAL_DEVS, (
        f"global device count {len(jax.devices())}, want {N_PROC * LOCAL_DEVS}"
    )
    assert len(jax.local_devices()) == LOCAL_DEVS
    cfg, cam, packed = build_problem()
    t_setup = time.time() - t0

    # one warm iteration first so t_solve measures the steady state (the
    # single-process comparison for the scaling story is timed warm too)
    run_dist_gba(mesh, cfg.optim, cam, packed, n_iters=1)
    t1 = time.time()
    R, t, xw_local, costs = run_dist_gba(
        mesh, cfg.optim, cam, packed, n_iters=N_ITERS
    )
    t_solve = time.time() - t1

    # per-shard content hashes: the parent cross-checks that the two
    # processes' shard sets are disjoint and complementary
    shard_hashes = {
        str(idx): hashlib.sha256(arr.tobytes()).hexdigest()[:16]
        for idx, arr in sorted(xw_local.items())
    }
    out = {
        "proc": proc_id,
        "cam_hash": hashlib.sha256(
            np.asarray(R).tobytes() + np.asarray(t).tobytes()
        ).hexdigest()[:16],
        "costs": costs,
        "shards": shard_hashes,
        "t_setup_s": round(t_setup, 2),
        "t_solve_s": round(t_solve, 2),
    }
    # checkpoint/restore across the process boundary: proc 0 saves the solved
    # cameras + its point shards; proc 1 restores and verifies
    ckpt = os.path.join(OUT_DIR, "ckpt_proc0.npz")
    if proc_id == 0:
        # np.savez is not atomic: write to a temp path and os.rename into
        # place so proc 1 can never observe a partially written zip
        tmp = ckpt + ".tmp"
        np.savez(tmp, R=np.asarray(R), t=np.asarray(t),
                 **{f"xw_{i}": a for i, a in xw_local.items()})
        os.rename(tmp, ckpt)
    else:
        # proc 0 may still be writing: the coordinator barrier below already
        # synchronized the solve, so poll briefly
        for _ in range(100):
            if os.path.exists(ckpt):
                break
            time.sleep(0.05)
        z = np.load(ckpt)
        out["ckpt_cam_match"] = bool(
            np.array_equal(z["R"], np.asarray(R))
            and np.array_equal(z["t"], np.asarray(t))
        )
    with open(os.path.join(OUT_DIR, f"out_{proc_id}.json"), "w") as f:
        json.dump(out, f)
    jax.distributed.shutdown()


def parent():
    os.makedirs(OUT_DIR, exist_ok=True)
    for i in range(N_PROC):
        p = os.path.join(OUT_DIR, f"out_{i}.json")
        if os.path.exists(p):
            os.remove(p)
    ck = os.path.join(OUT_DIR, "ckpt_proc0.npz")
    if os.path.exists(ck):
        os.remove(ck)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = []
    # proc 1 first, proc 0 (which writes the checkpoint) second, so the
    # checkpoint wait in proc 1 exercises the cross-process ordering
    for i in range(N_PROC):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    deadline = time.time() + 900
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=max(10.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            p.kill()
            stdout = b"TIMEOUT"
        outs.append(stdout.decode(errors="replace"))
    results = []
    for i in range(N_PROC):
        path = os.path.join(OUT_DIR, f"out_{i}.json")
        if not os.path.exists(path):
            print(json.dumps({
                "ok": False, "reason": f"proc {i} produced no output",
                "logs": [o[-2000:] for o in outs],
            }))
            return 1
        with open(path) as f:
            results.append(json.load(f))

    r0, r1 = results
    checks = {
        # replicated camera solution must agree bit-for-bit across hosts
        "cam_agree": r0["cam_hash"] == r1["cam_hash"],
        # cost decreased
        "cost_decreased": r0["costs"][-1] < r0["costs"][0],
        "costs_agree": all(
            abs(a - b) <= 1e-6 * max(abs(a), 1.0)
            for a, b in zip(r0["costs"], r1["costs"])
        ),
        # each process owns a DIFFERENT half of the landmark shards
        "shards_disjoint": not (set(r0["shards"]) & set(r1["shards"])),
        "shards_complementary": len(r0["shards"]) + len(r1["shards"])
        == N_PROC * LOCAL_DEVS,
        # checkpoint written on host 0 restored+verified on host 1
        "ckpt_roundtrip": bool(r1.get("ckpt_cam_match")),
    }
    ok = all(checks.values())
    print(json.dumps({
        "ok": ok, "checks": checks,
        "costs": [round(c, 3) for c in r0["costs"]],
        "t_solve_s": [r0["t_solve_s"], r1["t_solve_s"]],
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    args = ap.parse_args()
    if args.proc is None:
        sys.exit(parent())
    child(args.proc)
