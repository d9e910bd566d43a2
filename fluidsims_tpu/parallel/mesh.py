"""Device-mesh construction for domain decomposition.

The reference has no distributed computing (SURVEY.md §2: no MPI/NCCL; one
CUDA device).  The TPU framework's scale axis is domain decomposition over a
`jax.sharding.Mesh`: 1-D slab decomposition in x matches the inflow→outflow
anisotropy of the hypersonic domain, with halo exchange over ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh_1d"]


def make_mesh_1d(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    import numpy as np

    return Mesh(np.array(devs[:n_devices]), (axis,))
