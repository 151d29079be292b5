"""Test harness: force CPU with 8 virtual devices so sharding/collective code
paths run in CI without TPU hardware (SURVEY.md §4)."""

import os

# The environment pre-sets JAX_PLATFORMS=axon (TPU tunnel); tests must run
# on the virtual CPU mesh, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which beats env vars — force CPU back at the config
# level so the suite runs on the virtual 8-device CPU mesh, not the tunnel.
jax.config.update("jax_platforms", "cpu")

# Pin full f32 matmul precision so test assertions (which do their own
# matmuls) are trustworthy.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the suite is compile-heavy (each jitted program
# is shape-specialized); caching across runs keeps the suite fast.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
