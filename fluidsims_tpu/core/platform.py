"""Backend-platform resolution shared by the CLI, bench.py and the tuner.

Some JAX builds read the platform list only from config, not the
JAX_PLATFORMS env var — honor the env var explicitly so
`JAX_PLATFORMS=cpu python -m fluidsims_tpu.cli ...` works everywhere.

The env var must also win over a DIFFERENT config value: the axon TPU
plugin auto-prepends itself at registration (config becomes "axon,cpu"),
so an unset-only guard would leave backend resolution pointed at a dead
tunnel even when the caller exported JAX_PLATFORMS=cpu.  The contract is
therefore *explicit env var wins*; harnesses that need a fixed backend
(tests/conftest.py) must force-set the env var, not setdefault it, so a
stale value from an outer shell cannot leak through.
"""

from __future__ import annotations

import os


def honor_env_platforms(jax) -> None:
    """Point jax.config.jax_platforms at the JAX_PLATFORMS env var.

    No-op when the env var is unset or already matches the config.
    Call before the first backend use (compilation/device query).
    """
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and getattr(
            jax.config, "jax_platforms", None) != env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass
