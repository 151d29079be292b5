"""Measure raw axon-tunnel characteristics: upload latency, pull latency,
dispatch latency, pipelining behavior of multiple in-flight transfers."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

d = jax.devices()[0]
print("platform:", d.platform)

small = np.zeros(64, np.float32)
big = np.zeros((376, 1241), np.float32)  # one KITTI image

f = jax.jit(lambda x: x + 1)
g = jax.jit(lambda x: x * 2 + 1)

# warm
xs = jnp.asarray(small); jax.block_until_ready(xs)
xb = jnp.asarray(big); jax.block_until_ready(xb)
ys = f(xs); jax.block_until_ready(ys)
yb = f(xb); jax.block_until_ready(yb)
np.asarray(ys); np.asarray(yb)

def t(label, fn, n=20):
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{label:46s} {1e3*dt:8.2f} ms")

t("upload small (64 f32) + block", lambda: jax.block_until_ready(jnp.asarray(small)))
t("upload big (1.9MB) + block", lambda: jax.block_until_ready(jnp.asarray(big)))
t("dispatch f(small) + block", lambda: jax.block_until_ready(f(xs)))
t("pull small (np.asarray)", lambda: np.asarray(f(xs)))
t("pull big", lambda: np.asarray(f(xb)))
t("pull small, already-ready array", lambda: np.asarray(ys))
t("upload big + f + pull small chain",
  lambda: np.asarray(f(jnp.asarray(big))[0, :4]))
t("2 pulls sequential", lambda: (np.asarray(f(xs)), np.asarray(g(xs))))

def pipelined():
    a = f(xs); b = g(xs)
    a.copy_to_host_async(); b.copy_to_host_async()
    return np.asarray(a), np.asarray(b)
t("2 pulls w/ copy_to_host_async", pipelined)

# device_get of a list in one call
t("jax.device_get([a,b])", lambda: jax.device_get([f(xs), g(xs)]))

# does an in-flight pull overlap with new dispatch+upload?
def overlap():
    a = f(xb)
    a.copy_to_host_async()
    b = jax.block_until_ready(f(jnp.asarray(big)))
    return np.asarray(a)
t("pull(big) overlapped with upload+dispatch", overlap)
