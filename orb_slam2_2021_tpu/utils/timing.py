"""Trustworthy device timing.

`jax.block_until_ready` is NOT a reliable completion fence on this
jax/axon (tunneled TPU) install: depending on the call pattern it can return
while the dispatched program is still executing, which turned round-3's
"frontend_fps" into a dispatch-rate measurement (VERDICT r3, Missing #3;
measured here: the bench microloop claimed 0.2 ms/frame under
block_until_ready while draining 10 dispatches through a forced readback
showed ~23 ms/frame of real device time).

The only fence that cannot lie is a host readback of (a slice of) the
result: the bytes can't arrive before the program that produces them
finishes, and the device executes dispatches in order, so reading the last
result drains the whole queue. `fence()` reads ONE element per pytree —
~4 bytes — so the fence costs one tunnel round trip (~25-30 ms), which
`time_device` measures separately on an already-ready array and subtracts.

The reference times what actually ran with plain chrono around synchronous
calls (/root/reference/Examples/Stereo/arducam_images.cpp:144-187); this is
the async-dispatch equivalent.
"""

from __future__ import annotations

import time

import numpy as np


def fence(x) -> None:
    """Block until every dispatch producing `x` (and everything before it in
    device order) has completed, via a minimal host readback."""
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if isinstance(l, jax.Array)]
    if not leaves:
        return
    # one element of the last leaf: outputs of one executable complete
    # together, and the device runs dispatches in order
    l = leaves[-1]
    if l.ndim == 0:
        np.asarray(l)
    else:
        np.asarray(l.reshape(-1)[:1])


def fence_cost(x, n: int = 3) -> float:
    """Median cost (s) of fencing an already-ready value — the pure tunnel
    round-trip latency to subtract from fenced timings."""
    fence(x)  # make sure it's ready
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fence(x)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_device(fn, n: int = 10, warmup: int = 1) -> float:
    """Mean wall time per call of `fn` (s), with a true completion fence.

    Dispatches n calls back-to-back and fences once at the end, so the fence
    latency (measured separately on a ready array) amortizes and is
    subtracted. Requires `fn` to return at least one jax.Array.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn()
    fence(out)
    overhead = fence_cost(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fence(out)
    dt = time.perf_counter() - t0 - overhead
    return max(dt, 1e-9) / n
