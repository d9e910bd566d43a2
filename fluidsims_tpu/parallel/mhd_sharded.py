"""Multi-chip MHD solver: x-slab decomposition with clamped-edge halos.

Unlike the periodic tau solvers, the MHD domain has fixed edges (the
reference computes fluxes only on the interior face band, tau_mhd.c:164-167,
and its slope/shift reads clamp at the walls).  Each device extends its slab
with HALO=2 exchanged columns; the outward ghosts on the boundary devices
use edge replication, which reproduces the dense run's shift_clamped reads
exactly.  The interior face band is re-expressed in global coordinates via
lax.axis_index, and the dt/ch fast-speed max rides lax.pmax.  Multi-chip
trajectories are bitwise equal to single-chip (tests/test_periodic_sharded.py).
"""

from __future__ import annotations

import functools
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers import mhd
from ..solvers.mhd import ConsM
from .halo import extend_with_halo_x

__all__ = ["HALO", "make_sharded_run", "shard_state"]

HALO = 2  # MC slopes (1) chained through the face flux + pair update


def shard_state(state: mhd.MHDState, mesh: Mesh, axis: str = "x"):
    field_sh = NamedSharding(mesh, P(None, axis))
    scalar_sh = NamedSharding(mesh, P())
    U = ConsM(*(jax.device_put(f, field_sh) for f in state.U))
    return mhd.MHDState(U=U, t=jax.device_put(state.t, scalar_sh))


def _local_steps(cfg: mhd.MHDConfig, axis: str, n_dev: int, n_steps: int,
                 U: ConsM, t):
    ny = cfg.ny
    nxl = cfg.nx // n_dev
    nx_ext = nxl + 2 * HALO
    cfg_ext = replace(cfg, nx=nx_ext)
    dxdy = (1.0 / cfg.nx, 1.0 / cfg.ny)

    # interior face bands in global coordinates (tau_mhd.c:164-167)
    idx = lax.axis_index(axis)
    gx = idx * nxl + jnp.arange(nx_ext) - HALO
    ybandx = jnp.asarray(
        (np.arange(ny) >= 1) & (np.arange(ny) < ny - 1))[:, None]
    ybandy = jnp.asarray(
        (np.arange(ny) >= 1) & (np.arange(ny) < ny - 2))[:, None]
    mx_face = ybandx & ((gx >= 1) & (gx < cfg.nx - 2))[None, :]
    my_face = ybandy & ((gx >= 1) & (gx < cfg.nx - 1))[None, :]

    def one_step(carry, _):
        U, t = carry
        Ue = ConsM(*(
            extend_with_halo_x(f, HALO, axis, n_dev) for f in U
        ))
        out = mhd.step(
            cfg_ext,
            mhd.MHDState(U=Ue, t=t),
            wavespeed_reduce=lambda v: lax.pmax(v, axis),
            face_masks=(mx_face, my_face),
            dxdy=dxdy,
        )
        U_new = ConsM(*(f[:, HALO:-HALO] for f in out.U))
        return (U_new, out.t), None

    (U, t), _ = lax.scan(one_step, (U, t), None, length=n_steps)
    return (*U, t)


def make_sharded_run(cfg: mhd.MHDConfig, mesh: Mesh, n_steps: int,
                     axis: str = "x"):
    n_dev = mesh.shape[axis]
    if cfg.nx % n_dev:
        raise ValueError(f"nx={cfg.nx} not divisible by {n_dev} devices")
    if cfg.nx // n_dev < HALO:
        raise ValueError(f"local slab thinner than halo {HALO}")

    body = functools.partial(_local_steps, cfg, axis, n_dev, n_steps)
    n_fields = len(ConsM._fields)
    in_specs = tuple([P(None, axis)] * n_fields + [P()])
    sharded = jax.shard_map(
        lambda U, t: body(ConsM(*U), t),
        mesh=mesh,
        in_specs=(tuple([P(None, axis)] * n_fields), P()),
        out_specs=in_specs,
        check_vma=False,
    )

    @jax.jit
    def run(state: mhd.MHDState) -> mhd.MHDState:
        *U, t = sharded(tuple(state.U), state.t)
        return mhd.MHDState(U=ConsM(*U), t=t)

    return run
