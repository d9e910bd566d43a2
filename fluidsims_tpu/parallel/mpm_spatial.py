"""Spatially-sharded MLS-MPM: x-slab domain decomposition + migration.

parallel/mpm_sharded.py shards the particle transfers but psums a
REPLICATED grid, so per-device memory stays O(n).  This module cuts the
DOMAIN instead — the same x-slab decomposition flip_spatial.py applies
to FLIP/APIC (the reference's scale axis is particle count, SURVEY §5):

  * the grid's Gx columns are cut into D contiguous slabs of W = Gx/D
    columns; device d OWNS the particles whose base cell column
    (floor(px/dx - 0.5), the B-spline stencil origin of
    solvers/mpm._step_dense) lies in its slab, in a fixed-capacity
    sentinel-padded buffer of P_cap = slack * n/D slots;
  * binning (ops/cell_dense.bin_rank) runs on the local buffer only —
    O(n/D log n/D) — into a local (Gy, W, K) dense slab;
  * grid arrays live as (Gy, W + 2*H) with H=2 halo columns: the
    quadratic B-spline window is one-sided ([0, +2] from the base
    cell, tau_mpm.cu:138-147), so H=2 covers both the P2G scatter and
    the G2P reads.  P2G partials accumulated into the halo columns are
    REDUCED into the owning neighbor, then the updated grid velocities
    are FILLED back (spatial_common.make_halo_ops over lax.ppermute);
  * the grid update (momentum normalize + gravity + 3-cell sticky
    bands, tau_mpm.cu:185-198) is elementwise and uses GLOBAL column
    coordinates for the boundary bands;
  * after advection, particles whose new base column crossed a slab
    boundary migrate to the neighbor device through fixed-size
    sentinel-padded ppermute buffers and each buffer recompacts
    (spatial_common.compact), exactly as in flip_spatial.py.

Every stage is per-device O(n/D + Gy*W) in compute and memory; nothing
is replicated.  Trajectories match the single-chip dense engine to f32
summation-order tolerance (P2G boundary sums merge in a different
order), compared by particle id in tests/test_sharded_particles.py.

Capacity overruns (owner buffer or migration buffer) drop particles and
are counted in `lost` — raise `slack`/`mig_cap` if it ever goes
nonzero.  Cell-capacity overflow keeps the single-chip dense-engine
semantics: particles beyond K sit out the transfers that step.

Behavioral spec: tau_mpm.cu (see solvers/mpm.py for the per-kernel
citations); the decomposition itself has no reference counterpart (the
reference is single-GPU).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import cell_dense as cd
from ..solvers import mpm
from ..solvers.mpm import MATERIALS, _bspline_w, _plastic_and_stress
from .spatial_common import make_halo_ops, migrate, owner_cap

__all__ = ["SpatialMPMState", "shard_state", "make_sharded_run",
           "gather_state"]

_H = 2          # grid halo columns (one-sided [0,+2] B-spline window)
_SENT = 2.0     # out-of-box position fill for dead slots


class SpatialMPMState(NamedTuple):
    pos: jnp.ndarray   # (D * P_cap, 2); dead slots hold _SENT
    vel: jnp.ndarray   # (D * P_cap, 2)
    F: jnp.ndarray     # (D * P_cap, 4) row-major elastic F
    Jp: jnp.ndarray    # (D * P_cap,)
    ids: jnp.ndarray   # (D * P_cap,) int32 particle id, -1 = empty
    lost: jnp.ndarray  # int32: particles dropped to capacity overruns


def _slab_w(cfg, n_dev):
    if cfg.gx % n_dev:
        raise ValueError(f"gx={cfg.gx} not divisible by {n_dev} devices")
    W = cfg.gx // n_dev
    if W < _H + 1:
        raise ValueError(f"slab width {W} must exceed the halo {_H}")
    return W


def _base_col(cfg, px):
    """The particle's stencil-origin grid column — ownership key."""
    return np.clip(np.floor(px / cfg.dx - 0.5).astype(np.int32),
                   0, cfg.gx - 1)


def shard_state(state: mpm.MPMState, cfg: mpm.MPMConfig, mesh: Mesh,
                axis: str = "x", slack: float = 4.0) -> SpatialMPMState:
    """Split a replicated MPMState into per-slab owner buffers."""
    n_dev = mesh.shape[axis]
    W = _slab_w(cfg, n_dev)
    P_cap = owner_cap(cfg.n, n_dev, slack)

    pos = np.asarray(state.pos)
    fields = [pos, np.asarray(state.vel),
              np.asarray(state.F).reshape(cfg.n, 4),
              np.asarray(state.Jp)[:, None]]
    owner = _base_col(cfg, pos[:, 0]) // W

    dt = np.dtype(cfg.jax_dtype)
    widths = (2, 2, 4, 1)
    fill = (_SENT, 0.0, 0.0, 1.0)
    bufs = [np.full((n_dev * P_cap, w), f, dt)
            for w, f in zip(widths, fill)]
    bufs[2][:] = np.asarray([1.0, 0.0, 0.0, 1.0], dt)  # identity F
    ids_g = np.full((n_dev * P_cap,), -1, np.int32)
    lost = 0
    for d in range(n_dev):
        mine = np.nonzero(owner == d)[0]
        if len(mine) > P_cap:
            lost += len(mine) - P_cap
            mine = mine[:P_cap]
        sl = slice(d * P_cap, d * P_cap + len(mine))
        for buf, f in zip(bufs, fields):
            buf[sl] = f[mine]
        ids_g[sl] = mine

    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    put = lambda a, s: jax.device_put(jnp.asarray(a), s)  # noqa: E731
    return SpatialMPMState(
        pos=put(bufs[0], shard), vel=put(bufs[1], shard),
        F=put(bufs[2], shard), Jp=put(bufs[3][:, 0], shard),
        ids=put(ids_g, shard),
        lost=put(np.asarray(lost, np.int32), rep))


def gather_state(s: SpatialMPMState, n: int) -> mpm.MPMState:
    """Reassemble an MPMState in original particle order (NaN = lost)."""
    ids = np.asarray(s.ids)
    alive = ids >= 0
    outs = []
    for f, w in ((s.pos, 2), (s.vel, 2), (s.F, 4), (s.Jp, 1)):
        a = np.asarray(f)
        if a.ndim == 1:
            a = a[:, None]
        out = np.full((n, w), np.nan, a.dtype)
        out[ids[alive]] = a[alive]
        outs.append(out)
    return mpm.MPMState(pos=outs[0], vel=outs[1],
                        F=outs[2].reshape(n, 2, 2), Jp=outs[3][:, 0])


def _local_steps(cfg, axis, n_dev, n_steps, P_cap, mig_cap,
                 pos, vel, F4, Jp, ids, lost):
    Gx, Gy = cfg.gx, cfg.gy
    W = _slab_w(cfg, n_dev)
    Wp = W + 2 * _H
    K = cfg.capacity
    dx = cfg.dx
    inv_dx = 1.0 / dx
    dt = cfg.dt
    mat = MATERIALS[cfg.material]
    dtype = cfg.jax_dtype
    d = lax.axis_index(axis)
    x0 = d * W                      # first owned grid column
    M = Gy * W

    # global coordinates of the local columns (pads included)
    gcol = x0 - _H + jnp.arange(Wp)                 # (Wp,) global grid col
    ysi = jnp.arange(Gy)[:, None]

    grid = cd.DenseGrid(Gx=W, Gy=Gy, cell=dx, K=K)
    halo_fill, halo_reduce = make_halo_ops(axis, n_dev, d, W, _H)

    def gview(g, oy, ox):
        """(Gy, Wp) grid -> (Gy, W) values at (row+oy, owned_col+ox)."""
        rows = cd.grid_shift(g, oy, 0) if oy else g
        return lax.slice_in_dim(rows, _H + ox, _H + ox + W, axis=1)

    def substep(pos, vel, F4, Jp, alive):
        n_loc = pos.shape[0]
        Xp = pos * inv_dx
        base = jnp.floor(Xp - 0.5).astype(jnp.int32)
        frac = Xp - base
        bx = jnp.clip(base[:, 0], 0, Gx - 1)
        by = jnp.clip(base[:, 1], 0, Gy - 1)
        in_slab = alive & (bx >= x0) & (bx < x0 + W)

        Fe, stress = _plastic_and_stress(
            cfg, mpm.MPMState(pos=pos, vel=vel,
                              F=F4.reshape(n_loc, 2, 2), Jp=Jp))
        m_v = cfg.particle_mass * vel

        cid = jnp.where(in_slab, by * W + (bx - x0), M)
        rank, ok, _ = cd.bin_rank(grid, pos, cid=cid)
        ok = ok & in_slab
        iota = jnp.arange(n_loc, dtype=jnp.int32)
        didx = jnp.where(ok, cid * K + rank, M * K + iota)

        packed = jnp.concatenate([
            frac,                                    # 0: fx, 1: fy
            m_v,                                     # 2, 3
            stress.reshape(n_loc, 4),                # 4..7
            Fe.reshape(n_loc, 4),                    # 8..11
            Jp[:, None],                             # 12
            pos,                                     # 13, 14
            jnp.ones((n_loc, 1), dtype),             # 15: occupancy
        ], -1)
        dall = jnp.zeros((M * K, 16), dtype).at[didx].set(
            packed, mode="drop", unique_indices=True).reshape(Gy, W, K, 16)
        occf = dall[..., 15]
        dfx, dfy = dall[..., 0], dall[..., 1]
        wxs = _bspline_w(dfx)
        wys = _bspline_w(dfy)

        # ---- P2G into the padded local grid + reverse halo exchange ----
        # bin (iy, l) contributes to grid (iy+oy, l+ox): zero-fill y shift
        # (the window never leaves [1, Gy-2] thanks to the position clamp)
        # + x pad into the halo columns.
        mass = jnp.zeros((Gy, Wp), dtype)
        gu = jnp.zeros((Gy, Wp), dtype)
        gv = jnp.zeros((Gy, Wp), dtype)
        for ox in range(3):
            dposx = (ox - dfx) * dx
            pad = ((0, 0), (_H + ox, _H - ox))
            for oy in range(3):
                dposy = (oy - dfy) * dx
                w = wxs[ox] * wys[oy] * occf
                fx = dall[..., 4] * dposx + dall[..., 5] * dposy
                fy = dall[..., 6] * dposx + dall[..., 7] * dposy
                sh = lambda s: jnp.pad(  # noqa: E731
                    cd.grid_shift(s, -oy, 0) if oy else s, pad)
                mass = mass + sh(jnp.sum(w * cfg.particle_mass, -1))
                gu = gu + sh(jnp.sum(w * (dall[..., 2] + fx), -1))
                gv = gv + sh(jnp.sum(w * (dall[..., 3] + fy), -1))

        stackd = halo_reduce(jnp.stack([mass, gu, gv]))
        mass, gu, gv = stackd[0], stackd[1], stackd[2]

        # ---- grid update with GLOBAL-coordinate sticky bands -----------
        has = mass > 0.0
        gu = jnp.where(has, gu / jnp.maximum(mass, 1e-30), gu)
        gv = jnp.where(has, gv / jnp.maximum(mass, 1e-30)
                       - cfg.gravity * dt, gv)
        gu = jnp.where(has & (((gcol[None, :] < 3) & (gu < 0))
                              | ((gcol[None, :] > Gx - 4) & (gu > 0))),
                       0.0, gu)
        gv = jnp.where(has & (((ysi < 3) & (gv < 0))
                              | ((ysi > Gy - 4) & (gv > 0))),
                       0.0, gv)
        gu = jnp.where(has, gu, 0.0)
        gv = jnp.where(has, gv, 0.0)
        stackf = halo_fill(jnp.stack([gu, gv]))
        gu, gv = stackf[0], stackf[1]

        # ---- G2P via halo-filled grid views ----------------------------
        shape = dfx.shape
        nvx = jnp.zeros(shape, dtype)
        nvy = jnp.zeros(shape, dtype)
        C00 = jnp.zeros(shape, dtype)
        C01 = jnp.zeros(shape, dtype)
        C10 = jnp.zeros(shape, dtype)
        C11 = jnp.zeros(shape, dtype)
        for ox in range(3):
            dposx = (ox - dfx) * dx
            for oy in range(3):
                dposy = (oy - dfy) * dx
                w = wxs[ox] * wys[oy] * occf
                gvx = gview(gu, oy, ox)[:, :, None]
                gvy = gview(gv, oy, ox)[:, :, None]
                nvx = nvx + w * gvx
                nvy = nvy + w * gvy
                C00 = C00 + 4.0 * inv_dx * w * gvx * dposx
                C01 = C01 + 4.0 * inv_dx * w * gvx * dposy
                C10 = C10 + 4.0 * inv_dx * w * gvy * dposx
                C11 = C11 + 4.0 * inv_dx * w * gvy * dposy

        f00, f01 = dall[..., 8], dall[..., 9]
        f10, f11 = dall[..., 10], dall[..., 11]
        n00 = (1.0 + dt * C00) * f00 + dt * C01 * f10
        n01 = (1.0 + dt * C00) * f01 + dt * C01 * f11
        n10 = dt * C10 * f00 + (1.0 + dt * C11) * f10
        n11 = dt * C10 * f01 + (1.0 + dt * C11) * f11
        oldJ = jnp.maximum(f00 * f11 - f01 * f10, 1.0e-6)
        newJ = jnp.maximum(n00 * n11 - n01 * n10, 1.0e-6)
        if mat == 0:  # mud relaxes shear
            n01 = n01 * 0.96
            n10 = n10 * 0.96
        Jp2 = jnp.clip(dall[..., 12] * oldJ / newJ, 0.05, 20.0)

        nx_ = jnp.clip(dall[..., 13] + dt * nvx, 2.0 * dx, (Gx - 3.0) * dx)
        ny_ = jnp.clip(dall[..., 14] + dt * nvy, 2.0 * dx, (Gy - 3.0) * dx)

        dense_out = jnp.stack(
            [nx_, ny_, nvx, nvy, n00, n01, n10, n11, Jp2], -1)
        got = dense_out.reshape(M * K, 9)[jnp.clip(didx, 0, M * K - 1)]
        old = jnp.concatenate([pos, vel, F4, Jp[:, None]], -1)
        return jnp.where(ok[:, None], got, old)

    def one(carry, _):
        pos, vel, F4, Jp, ids, lost = carry
        alive = ids >= 0
        out = substep(pos, vel, F4, Jp, alive)      # (P_cap, 9)

        # ---- migration across slab boundaries --------------------------
        bx_new = jnp.clip(
            jnp.floor(out[:, 0] * (1.0 / dx) - 0.5).astype(jnp.int32),
            0, Gx - 1)
        owner = bx_new // W
        payload = jnp.concatenate(
            [out, ids[:, None].astype(dtype)], axis=1)   # (P_cap, 10)
        fill10 = jnp.asarray(
            [_SENT, _SENT, 0, 0, 1, 0, 0, 1, 1, -1], dtype)
        final, ids, lost_delta = migrate(
            payload, owner, alive, axis=axis, d=d, n_dev=n_dev,
            mig_cap=mig_cap, p_cap=P_cap, fill_row=fill10)
        pos = final[:, 0:2]
        vel = final[:, 2:4]
        F4 = final[:, 4:8]
        Jp = final[:, 8]
        lost = (lost + lost_delta).astype(jnp.int32)
        return (pos, vel, F4, Jp, ids, lost), None

    carry, _ = lax.scan(one, (pos, vel, F4, Jp, ids, lost), None,
                        length=n_steps)
    return carry


def make_sharded_run(cfg: mpm.MPMConfig, mesh: Mesh, n_steps: int,
                     axis: str = "x", slack: float = 4.0,
                     mig_cap: int = 0):
    """Build run(SpatialMPMState) -> SpatialMPMState over `mesh`."""
    if cfg.n >= (1 << 24):
        raise ValueError("particle ids ride the f32 migration payload; "
                         "n must stay below 2^24")
    n_dev = mesh.shape[axis]
    _slab_w(cfg, n_dev)
    P_cap = owner_cap(cfg.n, n_dev, slack)
    if mig_cap <= 0:
        mig_cap = max(8, P_cap // 8)

    body = functools.partial(_local_steps, cfg, axis, n_dev, n_steps,
                             P_cap, mig_cap)
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )

    @jax.jit
    def run(state: SpatialMPMState) -> SpatialMPMState:
        pos, vel, F4, Jp, ids, lost = sharded(
            state.pos, state.vel, state.F, state.Jp, state.ids, state.lost)
        return SpatialMPMState(pos=pos, vel=vel, F=F4, Jp=Jp, ids=ids,
                               lost=lost)

    return run
