"""Multi-host bring-up: TWO jax.distributed processes on one machine (the
SURVEY.md §4 simulation recipe — identical code path to a multi-host pod)
solve one landmark-sharded global-BA problem over a global 8-device mesh and
checkpoint/restore across the process boundary (VERDICT r3 item 7).

The heavy lifting runs in subprocesses (scripts/dist_gba_2proc.py) because a
jax.distributed runtime cannot be brought up inside this already-initialized
test process."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_gba():
    env = dict(os.environ)
    env["DIST_GBA_OUT"] = "/tmp/dist_gba_test"
    env["DIST_GBA_PORT"] = "52733"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dist_gba_2proc.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON output; stdout={p.stdout[-2000:]} stderr={p.stderr[-2000:]}"
    res = json.loads(lines[-1])
    assert res["ok"], f"distributed GBA bring-up failed: {res}"
    # the sharded LM converged (strict decrease is asserted by the script;
    # sanity-check magnitude here)
    assert res["costs"][-1] < res["costs"][0]


@pytest.mark.slow
def test_live_pipeline_two_process_gba():
    """The LIVE pipeline across two processes (VERDICT r5 item 5): the real
    System drives the loop-firing orbit in process 0; the fired loop's
    global BA of the ACTUAL map executes in lockstep with a GbaServer in
    process 1 over the global 8-device mesh, abort protocol included
    (scripts/dist_live_2proc.py; parallel/gba_service.py). Asserts a loop
    fired, the server co-solved >= 1 problem, tracking stayed healthy, and
    the unaligned ATE lands in the single-process run's regime."""
    env = dict(os.environ)
    env["DIST_LIVE_OUT"] = "/tmp/dist_live_test"
    env["DIST_LIVE_PORT"] = "52744"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dist_live_2proc.py")],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON output; stdout={p.stdout[-2000:]} stderr={p.stderr[-2000:]}"
    res = json.loads(lines[-1])
    assert res["ok"], f"live 2-process pipeline failed: {res}"
    assert res["leader_n_loops"] >= 1
    assert res["server_solved"] >= 1
