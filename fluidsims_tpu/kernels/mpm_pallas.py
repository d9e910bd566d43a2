"""Fused MLS-MPM transfer kernels: P2G, grid update and G2P in VMEM.

Behavioral spec: tau_mpm.cu k_p2g (:123-182), k_grid_update (:185-199)
and k_g2p (:200-258), with exactly the XLA cell-dense engine's math
(solvers/mpm._step_dense) — per-particle plastic/stress prep, binning,
the value scatter and the gather-back stay in XLA; the dense
(Gy, Gx, K)-shaped transfer arithmetic moves into kernels.

Why: the XLA dense engine is memory-bound on those intermediates
(BASELINE.md roofline: 73 G flop/s = 3% of issue).  Layout: the slab is
channel-major (16, K, rows * 128) — cell rows ride the 128-lane dim
with gx padded from Gx to 128 sentinel-occupancy lanes, so the
quadratic-B-spline offsets (0..2 cells) become static lane shifts and
row-wrapped reads land in empty pad lanes (occupancy 0).  Eight grid
rows per program; 8-row sentinel pads top and bottom make every window
two aligned row-blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers import mpm as mpm_mod

__all__ = ["make_step_pallas"]

_S = 128      # padded row stride (lanes per cell row)
_NCH = 16     # packed channels (see _step_dense's stacking order)


# the solver's own weight helper: the bitwise-equality contract between
# engines depends on both using the SAME formula object
_bw = mpm_mod._bspline_w


def _p2g_kernel(w0_ref, w1_ref, out_ref, *, cfg, Gx, Gy, K):
    """Eight grid rows of P2G.  Window = 2 slab row-blocks (16, K, 8*_S)
    covering padded rows [8i, 8i+16); target row r sits at window lane
    offset (8 + r) * _S.  out: (3, 8, _S)."""
    w = jnp.concatenate([w0_ref[:], w1_ref[:]], axis=-1)   # (16, K, 16S)
    dtype = out_ref.dtype
    dx = cfg.dx
    pm = cfg.particle_mass

    for r in range(8):
        base = (8 + r) * _S
        mass = jnp.zeros((1, _S), dtype)
        gu = jnp.zeros((1, _S), dtype)
        gv = jnp.zeros((1, _S), dtype)
        # source cell = target - (ox, oy), ox, oy in 0..2
        for oy in range(3):
            for ox in range(3):
                sl = slice(base - oy * _S - ox, base - oy * _S - ox + _S)
                fx = w[0, :, sl]
                fy = w[1, :, sl]
                occ = w[15, :, sl]
                wt = _bw(fx)[ox] * _bw(fy)[oy] * occ
                dposx = (ox - fx) * dx
                dposy = (oy - fy) * dx
                fcx = w[4, :, sl] * dposx + w[5, :, sl] * dposy
                fcy = w[6, :, sl] * dposx + w[7, :, sl] * dposy
                mass = mass + jnp.sum(wt * pm, axis=0, keepdims=True)
                gu = gu + jnp.sum(wt * (w[2, :, sl] + fcx), axis=0,
                                  keepdims=True)
                gv = gv + jnp.sum(wt * (w[3, :, sl] + fcy), axis=0,
                                  keepdims=True)
        out_ref[0, r, :] = mass[0]
        out_ref[1, r, :] = gu[0]
        out_ref[2, r, :] = gv[0]


def _grid_kernel(mass_ref, gu_ref, gv_ref, ou_ref, ov_ref, *, cfg, Gx, Gy):
    """k_grid_update: normalize, gravity, sticky boundary bands
    (_step_dense :361-372) on the (Gy, _S) padded grids."""
    dt = cfg.dt
    mass = mass_ref[:]
    gu = gu_ref[:]
    gv = gv_ref[:]
    has = mass > 0.0
    gu = jnp.where(has, gu / jnp.maximum(mass, 1e-30), gu)
    gv = jnp.where(has, gv / jnp.maximum(mass, 1e-30) - cfg.gravity * dt,
                   gv)
    xsi = lax.broadcasted_iota(jnp.int32, (Gy, _S), 1)
    ysi = lax.broadcasted_iota(jnp.int32, (Gy, _S), 0)
    gu = jnp.where(
        has & (((xsi < 3) & (gu < 0)) | ((xsi > Gx - 4) & (gu > 0))),
        0.0, gu)
    gv = jnp.where(
        has & (((ysi < 3) & (gv < 0)) | ((ysi > Gy - 4) & (gv > 0))),
        0.0, gv)
    ou_ref[:] = jnp.where(has, gu, 0.0)
    ov_ref[:] = jnp.where(has, gv, 0.0)


def _g2p_kernel(slab_ref, gu0_ref, gu1_ref, gv0_ref, gv1_ref, out_ref, *,
                cfg, Gx, Gy, K, mat):
    """Eight grid rows of G2P + F update + plastic clamp.  slab: center
    row-block (16, K, 8*_S); grids arrive as 2 row-blocks (8, _S) each
    (rows 8i..8i+15; the 3x3 stencil of row 8i+7 tops out at 8i+9)."""
    slab = slab_ref[:]
    gu = jnp.concatenate([gu0_ref[:], gu1_ref[:]], axis=0)   # (16, S)
    gv = jnp.concatenate([gv0_ref[:], gv1_ref[:]], axis=0)
    dtype = out_ref.dtype
    dx = cfg.dx
    inv_dx = 1.0 / dx
    dt = cfg.dt

    for r in range(8):
        sl = slice(r * _S, r * _S + _S)
        fx = slab[0, :, sl]
        fy = slab[1, :, sl]
        occ = slab[15, :, sl]
        wxs = _bw(fx)
        wys = _bw(fy)
        nvx = jnp.zeros((K, _S), dtype)
        nvy = jnp.zeros((K, _S), dtype)
        C00 = jnp.zeros((K, _S), dtype)
        C01 = jnp.zeros((K, _S), dtype)
        C10 = jnp.zeros((K, _S), dtype)
        C11 = jnp.zeros((K, _S), dtype)
        for oy in range(3):
            grow_u = gu[r + oy, :].reshape(1, _S)
            grow_v = gv[r + oy, :].reshape(1, _S)
            for ox in range(3):
                w = wxs[ox] * wys[oy] * occ
                dposx = (ox - fx) * dx
                dposy = (oy - fy) * dx
                if ox:
                    gvx = pltpu.roll(grow_u, (-ox) % _S, axis=1)
                    gvy = pltpu.roll(grow_v, (-ox) % _S, axis=1)
                else:
                    gvx, gvy = grow_u, grow_v
                nvx = nvx + w * gvx
                nvy = nvy + w * gvy
                C00 = C00 + 4.0 * inv_dx * w * gvx * dposx
                C01 = C01 + 4.0 * inv_dx * w * gvx * dposy
                C10 = C10 + 4.0 * inv_dx * w * gvy * dposx
                C11 = C11 + 4.0 * inv_dx * w * gvy * dposy

        f00 = slab[8, :, sl]
        f01 = slab[9, :, sl]
        f10 = slab[10, :, sl]
        f11 = slab[11, :, sl]
        n00 = (1.0 + dt * C00) * f00 + dt * C01 * f10
        n01 = (1.0 + dt * C00) * f01 + dt * C01 * f11
        n10 = dt * C10 * f00 + (1.0 + dt * C11) * f10
        n11 = dt * C10 * f01 + (1.0 + dt * C11) * f11
        oldJ = jnp.maximum(f00 * f11 - f01 * f10, 1.0e-6)
        newJ = jnp.maximum(n00 * n11 - n01 * n10, 1.0e-6)
        if mat == 0:  # mud relaxes shear
            n01 = n01 * 0.96
            n10 = n10 * 0.96
        Jp2 = jnp.clip(slab[12, :, sl] * oldJ / newJ, 0.05, 20.0)
        nx_ = jnp.clip(slab[13, :, sl] + dt * nvx, 2.0 * dx,
                       (Gx - 3.0) * dx)
        ny_ = jnp.clip(slab[14, :, sl] + dt * nvy, 2.0 * dx,
                       (Gy - 3.0) * dx)
        out_ref[0, :, r, :] = nx_
        out_ref[1, :, r, :] = ny_
        out_ref[2, :, r, :] = nvx
        out_ref[3, :, r, :] = nvy
        out_ref[4, :, r, :] = n00
        out_ref[5, :, r, :] = n01
        out_ref[6, :, r, :] = n10
        out_ref[7, :, r, :] = n11
        out_ref[8, :, r, :] = Jp2


def make_step_pallas(cfg: mpm_mod.MPMConfig, interpret: bool = False):
    """Build step(state, grid_reduce=None) on the fused kernels.

    Requires Gx <= 126 (3x3 stencil inside one padded 128-lane row) and
    Gy % 8 == 0."""
    Gx, Gy = cfg.gx, cfg.gy
    if Gx > _S - 2:
        raise ValueError(f"pallas MPM engine requires gx <= {_S - 2}")
    if Gy % 8:
        raise ValueError("pallas MPM engine requires gy % 8 == 0")
    K = cfg.capacity
    dtype = cfg.jax_dtype
    NB = Gy // 8
    mat = mpm_mod.MATERIALS[cfg.material]

    p2g_call = pl.pallas_call(
        functools.partial(_p2g_kernel, cfg=cfg, Gx=Gx, Gy=Gy, K=K),
        grid=(NB,),
        in_specs=[pl.BlockSpec(
            (_NCH, K, 8 * _S),
            functools.partial(lambda i, o: (0, 0, i + o), o=o),
            memory_space=pltpu.VMEM)
            for o in range(2)],
        out_specs=pl.BlockSpec((3, 8, _S), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Gy, _S), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    grid_call = pl.pallas_call(
        functools.partial(_grid_kernel, cfg=cfg, Gx=Gx, Gy=Gy),
        out_shape=[jax.ShapeDtypeStruct((Gy, _S), dtype) for _ in range(2)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def rowblock(o):
        return pl.BlockSpec(
            (8, _S), functools.partial(
                lambda i, o: (jnp.clip(i + o, 0, NB - 1), 0), o=o),
            memory_space=pltpu.VMEM)

    g2p_call = pl.pallas_call(
        functools.partial(_g2p_kernel, cfg=cfg, Gx=Gx, Gy=Gy, K=K,
                          mat=mat),
        grid=(NB,),
        in_specs=([pl.BlockSpec((_NCH, K, 8 * _S), lambda i: (0, 0, i + 1),
                                memory_space=pltpu.VMEM)]
                  + [rowblock(o) for o in (0, 1)]
                  + [rowblock(o) for o in (0, 1)]),
        out_specs=pl.BlockSpec((9, K, 8, _S), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, K, Gy, _S), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    from ..ops import cell_dense as cd

    grid_geom = cd.DenseGrid(Gx=Gx, Gy=Gy, cell=cfg.dx, K=K)

    def step(s: mpm_mod.MPMState, grid_reduce=None) -> mpm_mod.MPMState:
        n_p = cfg.n
        inv_dx = 1.0 / cfg.dx
        Xp = s.pos * inv_dx
        base = jnp.floor(Xp - 0.5).astype(jnp.int32)
        frac = Xp - base
        Fe, stress = mpm_mod._plastic_and_stress(cfg, s)
        m_v = cfg.particle_mass * s.vel

        bx = jnp.clip(base[:, 0], 0, Gx - 1)
        by = jnp.clip(base[:, 1], 0, Gy - 1)
        cid = by * Gx + bx
        rank, ok, _ = cd.bin_rank(grid_geom, s.pos, cid=cid)

        packed = jnp.concatenate([
            frac, m_v, stress.reshape(n_p, 4), Fe.reshape(n_p, 4),
            s.Jp[:, None], s.pos, jnp.ones((n_p, 1), dtype),
        ], -1)                                       # (n_p, 16)

        # padded-slab flat cell: 8 sentinel rows top/bottom, _S lanes/row
        Gp = (Gy + 16) * _S
        cid_pad = (by + 8) * _S + bx
        iota = jnp.arange(n_p, dtype=jnp.int32)
        flat = jnp.where(ok, rank * Gp + cid_pad, K * Gp + iota)
        slab = jnp.zeros((K * Gp, _NCH), dtype).at[flat].set(
            packed.astype(dtype), mode="drop", unique_indices=True
        ).T.reshape(_NCH, K, Gp)

        grids = p2g_call(slab, slab)
        mass, gu, gv = grids[0], grids[1], grids[2]
        if grid_reduce is not None:
            mass, gu, gv = grid_reduce((mass, gu, gv))
        gu, gv = grid_call(mass, gu, gv)

        dense_out = g2p_call(slab, gu, gu, gv, gv)

        G = Gy * _S
        got = dense_out.reshape(9, K * G).T[
            jnp.where(ok, rank * G + by * _S + bx, 0)]
        old = jnp.concatenate(
            [s.pos, s.vel, s.F.reshape(n_p, 4), s.Jp[:, None]], -1)
        out = jnp.where(ok[:, None], got, old.astype(dtype))
        return mpm_mod.MPMState(
            pos=out[:, 0:2], vel=out[:, 2:4],
            F=out[:, 4:8].reshape(n_p, 2, 2), Jp=out[:, 8])

    return step
