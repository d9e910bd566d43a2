"""Test environment: force CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (set before jax import)."""

import os

# Force-set (not setdefault): the CLI honors an explicit JAX_PLATFORMS env
# var over the config value, so a stale "axon,cpu" from an outer shell would
# otherwise flip the backend mid-suite when a smoke test calls cli.main().
os.environ["JAX_PLATFORMS"] = "cpu"
# This JAX build ignores JAX_PLATFORMS; JAX_PLATFORM_NAME works.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# x64 available for float64 oracle comparisons; solvers pass explicit f32
# dtypes so this does not change their precision. (The env-var route is not
# honored by this JAX build, so use config.update.)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: eager scalar ops in the unit tests each trigger a
# small XLA compile; caching them across runs keeps the suite fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
