"""Multi-chip MLS-MPM: data-parallel particles + replicated grid.

Same decomposition as parallel/flip_sharded.py (see its module docstring
for the design rationale): particles are sharded over the mesh by
strided-index interleave, each device runs P2G into a full local grid,
one lax.psum merges the partial mass/momentum grids per step, the grid
update is computed redundantly on every device, and G2P / the plastic
F-update stay local.  Cross-chip equivalence is to f32 summation-order
tolerance (tests/test_sharded_particles.py).
"""

from __future__ import annotations

import functools
from dataclasses import replace

import jax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers import mpm
from .flip_sharded import interleave_perm

__all__ = ["shard_state", "make_sharded_run"]


def shard_state(state: mpm.MPMState, mesh: Mesh, axis: str = "p"):
    """Interleave-permute the particles and place them on the mesh."""
    n_dev = mesh.shape[axis]
    n = state.pos.shape[0]
    if n % n_dev:
        raise ValueError(f"particles={n} not divisible by {n_dev} devices")
    perm = interleave_perm(n, n_dev)

    def put(f):
        spec = P(axis, *([None] * (f.ndim - 1)))
        return jax.device_put(f[perm], NamedSharding(mesh, spec))

    return mpm.MPMState(pos=put(state.pos), vel=put(state.vel),
                        F=put(state.F), Jp=put(state.Jp))


def _local_steps(cfg_local, axis, n_steps, pos, vel, F, Jp):
    reduce = lambda g: lax.psum(g, axis)  # noqa: E731

    def one(carry, _):
        out = mpm.step(cfg_local, mpm.MPMState(*carry), grid_reduce=reduce)
        return tuple(out), None

    carry, _ = lax.scan(one, (pos, vel, F, Jp), None, length=n_steps)
    return carry


def make_sharded_run(cfg: mpm.MPMConfig, mesh: Mesh, n_steps: int,
                     axis: str = "p"):
    n_dev = mesh.shape[axis]
    if cfg.n % n_dev:
        raise ValueError(f"n={cfg.n} not divisible by {n_dev} devices")
    cfg_local = replace(cfg, n=cfg.n // n_dev)

    body = functools.partial(_local_steps, cfg_local, axis, n_steps)
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None, None),
                  P(axis)),
        out_specs=(P(axis, None), P(axis, None), P(axis, None, None),
                   P(axis)),
        check_vma=False,
    )

    @jax.jit
    def run(state: mpm.MPMState) -> mpm.MPMState:
        pos, vel, F, Jp = sharded(state.pos, state.vel, state.F, state.Jp)
        return mpm.MPMState(pos=pos, vel=vel, F=F, Jp=Jp)

    return run
