"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This mirrors the idiomatic JAX answer to multi-device testing without a
cluster (SURVEY.md §4): all unit tests run on CPU; sharding tests see 8
virtual devices."""

import os

# Must run before the jax backend initializes. The sandbox's sitecustomize
# forces JAX_PLATFORMS=axon (TPU), so the env var alone is not enough — the
# config update below wins.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat test runs skip XLA compiles
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update(
        "jax_persistent_cache_enable_xla_caches", "xla_gpu_per_fusion_autotune_cache_dir"
    )
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 0
