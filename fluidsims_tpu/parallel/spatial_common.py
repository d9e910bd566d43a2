"""Shared machinery for spatially-sharded particle solvers.

The spatial decompositions (sph_spatial, flip_spatial, mpm_spatial) all
keep per-device fixed-capacity particle buffers and migrate particles
between slab neighbors through sentinel-padded ppermute payloads; the
front-compaction scatter below is the primitive they share.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

__all__ = ["compact", "make_halo_ops", "migrate", "owner_cap"]


def owner_cap(n_particles: int, n_dev: int, slack: float) -> int:
    """Per-device owner-buffer capacity: `slack` times the uniform share,
    rounded up to the 8-row sublane alignment (min 8).  One definition so
    shard_state and make_sharded_run in every spatial module agree."""
    return max(8, int(math.ceil(slack * n_particles / n_dev / 8.0)) * 8)


def compact(vals, keep, cap, fill_row):
    """Scatter rows where keep=True to the front of a (cap, c) buffer
    (cumsum positions; overflow rows drop).  Returns (buffer, n_dropped)."""
    dst = jnp.cumsum(keep.astype(jnp.int32)) - 1
    total = jnp.sum(keep.astype(jnp.int32))
    dst = jnp.where(keep, dst, cap + jnp.arange(keep.shape[0]))
    buf = jnp.broadcast_to(fill_row, (cap, vals.shape[1])).astype(vals.dtype)
    buf = buf.at[dst].set(vals, mode="drop")
    # rows that fit are [0, cap); beyond that they were dropped by mode
    return buf, jnp.maximum(total - cap, 0)


def make_halo_ops(axis: str, n_dev: int, d, W: int, H: int):
    """Halo primitives for grid arrays laid out (..., W + 2H): W owned
    columns between H-wide pads, slabs ordered along mesh axis `axis`
    (`d` = this device's lax.axis_index).  Returns (halo_fill,
    halo_reduce):

      halo_fill(a, fill=0.0)  — overwrite the pads with the neighbors'
        owned edge columns (domain-edge devices get `fill`);
      halo_reduce(a)          — add each device's pad-column partial
        sums into the owning neighbor's interior (the reverse map;
        overlap-safe for W < 2H via the additive padded form).
    """
    Wp = W + 2 * H
    fwd = [(i, i + 1) for i in range(n_dev - 1)]   # send up (d -> d+1)
    bwd = [(i + 1, i) for i in range(n_dev - 1)]   # send down

    def halo_fill(a, fill=0.0):
        lo = lax.slice_in_dim(a, H, 2 * H, axis=-1)         # my left owned
        hi = lax.slice_in_dim(a, W, W + H, axis=-1)         # my right owned
        from_below = lax.ppermute(hi, axis, fwd)            # d-1's right
        from_above = lax.ppermute(lo, axis, bwd)            # d+1's left
        from_below = jnp.where(d == 0, fill, from_below)
        from_above = jnp.where(d == n_dev - 1, fill, from_above)
        a = lax.dynamic_update_slice_in_dim(
            a, from_below.astype(a.dtype), 0, axis=-1)
        return lax.dynamic_update_slice_in_dim(
            a, from_above.astype(a.dtype), W + H, axis=-1)

    def halo_reduce(a):
        left_pad = lax.slice_in_dim(a, 0, H, axis=-1)
        right_pad = lax.slice_in_dim(a, W + H, Wp, axis=-1)
        from_below = lax.ppermute(right_pad, axis, fwd)     # d-1's right pad
        from_above = lax.ppermute(left_pad, axis, bwd)      # d+1's left pad
        from_below = jnp.where(d == 0, jnp.zeros_like(from_below),
                               from_below)
        from_above = jnp.where(d == n_dev - 1, jnp.zeros_like(from_above),
                               from_above)
        side = [(0, 0)] * (a.ndim - 1)
        return (a + jnp.pad(from_below, side + [(H, Wp - 2 * H)])
                + jnp.pad(from_above, side + [(W, H)]))

    return halo_fill, halo_reduce


def migrate(payload, owner, alive, *, axis: str, d, n_dev: int,
            mig_cap: int, p_cap: int, fill_row):
    """Exchange boundary-crossing particles with the ±1 slab neighbors
    and re-compact survivors to the buffer front — the migration step
    shared verbatim by sph_spatial/flip_spatial/mpm_spatial.

    payload   (P, C) rows with the particle id in the LAST column as a
              float (-1 = dead slot)
    owner     per-row owning device index from the new position
    alive     id >= 0 for this row
    Movers clip to ±1 slab per step (a faster straggler sits out this
    exchange and re-migrates next step — tested conservation property).

    Returns (final (p_cap, C), ids int32 (-1 beyond the live prefix),
    lost_delta int32 — rows dropped this exchange, psum'd over `axis`).
    """
    delta = jnp.clip(jnp.where(alive, owner - d, 0), -1, 1)
    fwd = [(i, i + 1) for i in range(n_dev - 1)]   # send up (d -> d+1)
    bwd = [(i + 1, i) for i in range(n_dev - 1)]   # send down

    up_buf, lost_u = compact(payload, delta == 1, mig_cap, fill_row)
    dn_buf, lost_d = compact(payload, delta == -1, mig_cap, fill_row)
    got_up = jnp.where(d == 0, fill_row, lax.ppermute(up_buf, axis, fwd))
    got_dn = jnp.where(d == n_dev - 1, fill_row,
                       lax.ppermute(dn_buf, axis, bwd))

    keep_buf, lost_k = compact(payload, delta == 0, p_cap, fill_row)
    merged = jnp.concatenate([keep_buf, got_up, got_dn])
    m_alive = merged[:, -1] >= 0.0
    final, lost_m = compact(merged, m_alive, p_cap, fill_row)
    n_alive = jnp.sum(m_alive.astype(jnp.int32))
    ids = jnp.where(jnp.arange(p_cap) < n_alive,
                    final[:, -1].astype(jnp.int32), -1)
    lost_delta = lax.psum(lost_u + lost_d + lost_k + lost_m,
                          axis).astype(jnp.int32)
    return final, ids, lost_delta
