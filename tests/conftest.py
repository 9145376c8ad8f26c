"""Test configuration: run on a simulated 8-device CPU mesh with x64 available.

Tests run on CPU (deterministic, float64 oracles available); the benchmark harness
(bench.py) runs the same code on real TPU hardware. Multi-device sharding tests use
the 8 virtual CPU devices created here.

Note: the axon TPU plugin (sitecustomize) forces ``jax_platforms=axon,cpu`` at
import, so the CPU override must go through ``jax.config.update`` after importing
jax — the JAX_PLATFORMS env var alone is ignored.
"""

import os

# Must be set before jax initializes any backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite is dominated by XLA CPU compiles of
# the sharded/scan programs (e.g. one shard_map streaming test costs ~160 s of
# compile); cached re-runs skip them. Keyed by HLO hash, so it is always safe.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0x1557)
