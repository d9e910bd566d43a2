"""Fused FLIP/APIC transfer kernels: P2G, grid phase and G2P in VMEM.

Behavioral spec: tau_flip_apic.cu k_p2g (:105-131), k_normalize_forces..
k_project (:133-184) and sample_grid/k_g2p (:186-241), with the exact
wall-clip multiplicity and FLIP/PIC/APIC blend semantics of the XLA
cell-dense engine (solvers/flip_apic._step_dense) — the two engines are
compared slot-for-slot in tests.

Why kernels: the XLA dense engine is memory-bound on (n, n, K)-shaped
intermediates (BASELINE.md roofline: 9.05 M psteps/s = 136 G flop/s =
6% of issue, with ~2.3 GB/step of materialized weight products).  Here
the dense particle slab lives in a channel-major (14, K, G) layout
(lane-major playbook: cells on lanes) and each kernel reads it once:

  * P2G: one program per grid row; 5-row halo windows of the slab; the
    9 neighbor-offset hat-weight products and their K-reductions never
    leave VMEM.  Flat-offset row wrap and the sentinel fill are both
    rejected by the hat weight itself (|gx - x_target| >= 1).
  * grid phase: normalize + gravity + clamps + divergence + all
    `jacobi` pressure sweeps + projection in ONE kernel on the (n, n)
    grids (interior masks instead of .at[] ring writes).
  * G2P: one program per grid row; the projected/pre-projection grids
    arrive as clamped-index row windows (out-of-grid rows get junk data
    but provably zero hat weight, since coordinates are clipped to
    [0, n-1.001]); outputs the 8 per-slot state channels.

Binning (packed-sort rank), the one value scatter into the slab, the
per-particle gather-back and the density raster stay in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers import flip_apic as fa

__all__ = ["make_step_pallas"]

_SENTINEL = -1.0e4

# packed slab channels (matches _step_dense's stacking order)
_C_GX, _C_GY, _C_VX, _C_VY = 0, 1, 2, 3
_C_AX0, _C_AX1, _C_AY0, _C_AY1 = 4, 5, 6, 7
_C_PX, _C_PY = 8, 9
_C_XP, _C_XM, _C_YP, _C_YM = 10, 11, 12, 13
_NCH = 14


# the solver's own hat-weight helper: the bitwise-equality contract
# between engines depends on both using the SAME formula object
_w1 = fa._w1


def _row_shift(row, ox, n):
    """(..., n) -> value shifted so out[..., i] = row[..., i + ox], zeros
    outside (the _gshift x-axis on one row).  pltpu.roll + an iota mask:
    Mosaic mis-lowers narrow lane concatenations."""
    if ox == 0:
        return row
    rolled = pltpu.roll(row, (-ox) % row.shape[-1], axis=row.ndim - 1)
    lane = lax.broadcasted_iota(jnp.int32, row.shape, row.ndim - 1)
    valid = (lane < n - ox) if ox > 0 else (lane >= -ox)
    return jnp.where(valid, rolled, 0.0)


def _vshift(a, oy, n):
    """(n, n) -> out[j, i] = a[j + oy, i], zeros outside (sublane roll)."""
    if oy == 0:
        return a
    rolled = pltpu.roll(a, (-oy) % a.shape[0], axis=0)
    row = lax.broadcasted_iota(jnp.int32, a.shape, 0)
    valid = (row < n - oy) if oy > 0 else (row >= -oy)
    return jnp.where(valid, rolled, 0.0)


def _p2g_kernel(*refs, cfg, n, K):
    """Eight grid rows of P2G per program: refs = 3 slab row-blocks
    (14, K, 8n) spanning padded rows [8i, 8i + 24) + out (3, 8, n).
    Target row r (local 0..7) is padded row 8i + 8 + r, i.e. window
    lane offset (8 + r) * n."""
    wins, out = refs[:-1], refs[-1]
    w = jnp.concatenate([r[:] for r in wins], axis=-1)   # (14, K, 24n)
    dtype = out.dtype
    pid = pl.program_id(0)
    tx = lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(dtype)
    mx0 = 1.0 + (tx == 0.0) + (tx == n - 1.0)
    inv = 1.0 / (n - 1)

    for r in range(8):
        ty = pid * 8 + r
        tyf = ty.astype(dtype)
        my0 = (1.0 + (ty == 0) + (ty == n - 1)).astype(dtype)
        base = (8 + r) * n
        mass = jnp.zeros((1, n), dtype)
        mom_u = jnp.zeros((1, n), dtype)
        mom_v = jnp.zeros((1, n), dtype)
        for oy in (-1, 0, 1):
            for ox in (-1, 0, 1):
                sl = slice(base - oy * n - ox, base - oy * n - ox + n)
                gx = w[_C_GX, :, sl]
                gy = w[_C_GY, :, sl]
                wt = (_w1(gx - tx) * (mx0 if ox == 0 else 1.0)
                      * _w1(gy - tyf) * (my0 if oy == 0 else 1.0))
                rx = (tx - gx) * inv
                ry = (tyf - gy) * inv
                vvx = (w[_C_VX, :, sl]
                       + cfg.apic * (w[_C_AX0, :, sl] * rx
                                     + w[_C_AY0, :, sl] * ry))
                vvy = (w[_C_VY, :, sl]
                       + cfg.apic * (w[_C_AX1, :, sl] * rx
                                     + w[_C_AY1, :, sl] * ry))
                mass = mass + jnp.sum(wt, axis=0, keepdims=True)
                mom_u = mom_u + jnp.sum(wt * vvx, axis=0, keepdims=True)
                mom_v = mom_v + jnp.sum(wt * vvy, axis=0, keepdims=True)
        out[0, r, :] = mass[0]
        out[1, r, :] = mom_u[0]
        out[2, r, :] = mom_v[0]


def _grid_kernel(mass_ref, mu_ref, mv_ref, up_ref, vp_ref, uo_ref, vo_ref,
                 *, cfg, n):
    """normalize + gravity + edge clamps + divergence + `jacobi` sweeps +
    projection, entirely in VMEM (_grid_phase transcription)."""
    dt = cfg.dt
    mass = mass_ref[:]
    u = mu_ref[:]
    v = mv_ref[:]
    has = mass > 1e-8
    u = jnp.where(has, u / jnp.maximum(mass, 1e-8), u)
    v = jnp.where(has, v / jnp.maximum(mass, 1e-8) - cfg.gravity * dt, v)
    col = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    row = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    edge_x = (col == 0) | (col == n - 1)
    edge_y = (row == 0) | (row == n - 1)
    interior = ~(edge_x | edge_y)
    u = jnp.where(edge_x, 0.0, u)
    v = jnp.where(edge_y, 0.0, v)
    up_ref[:] = u
    vp_ref[:] = v

    def sh(a, oy, ox):
        return _vshift(_row_shift(a, ox, n), oy, n)

    div = jnp.where(
        interior,
        -0.5 * (n - 1.0) * (sh(u, 0, 1) - sh(u, 0, -1)
                            + sh(v, 1, 0) - sh(v, -1, 0)),
        0.0)

    def jac(_, p):
        return jnp.where(
            interior,
            0.25 * (div + sh(p, 0, -1) + sh(p, 0, 1)
                    + sh(p, -1, 0) + sh(p, 1, 0)),
            0.0)

    p = lax.fori_loop(0, cfg.jacobi, jac, jnp.zeros((n, n), u.dtype))
    scale = 0.5 / (n - 1.0)
    uo_ref[:] = jnp.where(
        interior, u - scale * (sh(p, 0, 1) - sh(p, 0, -1)), 0.0)
    vo_ref[:] = jnp.where(
        interior, v - scale * (sh(p, 1, 0) - sh(p, -1, 0)), 0.0)


def _g2p_kernel(*refs, cfg, n, K):
    """Eight grid rows of G2P per program.  refs: slab rows block
    (14, K, 8n), then 3 row-blocks (8, n) each of u_prev, v_prev,
    u_proj, v_proj (blocks i-1, i, i+1, clamped at the edges: junk rows
    get provably zero hat weight for clipped coordinates), then out
    (8, K, 8, n)."""
    slab = refs[0][:]
    grids = {}
    idx = 1
    for name in ("up", "vp", "uo", "vo"):
        grids[name] = jnp.concatenate(
            [refs[idx + k][:] for k in range(3)], axis=0)  # (24, n)
        idx += 3
    out = refs[-1]
    dtype = out.dtype
    pid = pl.program_id(0)
    tx = lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(dtype)
    hi = n - 1.001
    dt = cfg.dt
    h = 1.0 / (n - 1)
    C = (0, 1)
    W = (-2, -1, 0, 1, 2)

    for r in range(8):
        ty = pid * 8 + r
        tyf = ty.astype(dtype)
        sl = slice(r * n, r * n + n)
        gx = slab[_C_GX, :, sl]
        gy = slab[_C_GY, :, sl]
        cgx = jnp.clip(gx, 0.0, hi)
        cgy = jnp.clip(gy, 0.0, hi)
        cxp = jnp.clip(slab[_C_XP, :, sl], 0.0, hi)
        cxm = jnp.clip(slab[_C_XM, :, sl], 0.0, hi)
        cyp = jnp.clip(slab[_C_YP, :, sl], 0.0, hi)
        cym = jnp.clip(slab[_C_YM, :, sl], 0.0, hi)

        def sample(g, oy_list, ox_list, sx, sy, r=r, tyf=tyf):
            # window row of grid row ty+oy: (ty+oy) - 8(pid-1) = 8+r+oy
            acc = jnp.zeros((K, n), dtype)
            for oy in oy_list:
                wy = _w1(sy - (tyf + oy))
                grow = g[8 + r + oy, :].reshape(1, n)
                for ox in ox_list:
                    wx = _w1(sx - (tx + ox))
                    acc = acc + wy * wx * _row_shift(grow, ox, n)
            return acc

        new_u = sample(grids["uo"], C, C, cgx, cgy)
        new_v = sample(grids["vo"], C, C, cgx, cgy)
        old_u = sample(grids["up"], C, C, cgx, cgy)
        old_v = sample(grids["vp"], C, C, cgx, cgy)
        vx = slab[_C_VX, :, sl]
        vy = slab[_C_VY, :, sl]
        flip_u = vx + new_u - old_u
        flip_v = vy + new_v - old_v
        vel_x = (1 - cfg.flip) * new_u + cfg.flip * flip_u
        vel_y = (1 - cfg.flip) * new_v + cfg.flip * flip_v

        ux1 = sample(grids["uo"], C, W, cxp, cgy)
        vx1 = sample(grids["vo"], C, W, cxp, cgy)
        ux0 = sample(grids["uo"], C, W, cxm, cgy)
        vx0 = sample(grids["vo"], C, W, cxm, cgy)
        uy1 = sample(grids["uo"], W, C, cgx, cyp)
        vy1 = sample(grids["vo"], W, C, cgx, cyp)
        uy0 = sample(grids["uo"], W, C, cgx, cym)
        vy0 = sample(grids["vo"], W, C, cgx, cym)
        nax_x = 0.5 * (ux1 - ux0) / h
        nax_y = 0.5 * (vx1 - vx0) / h
        nay_x = 0.5 * (uy1 - uy0) / h
        nay_y = 0.5 * (vy1 - vy0) / h

        nx_ = slab[_C_PX, :, sl] + vel_x * dt
        ny_ = slab[_C_PY, :, sl] + vel_y * dt
        hit_x = (nx_ < 0.01) | (nx_ > 0.99)
        hit_y = (ny_ < 0.01) | (ny_ > 0.99)
        vel_x = jnp.where(hit_x, vel_x * -0.35, vel_x)
        vel_y = jnp.where(hit_y, vel_y * -0.35, vel_y)
        out[0, :, r, :] = jnp.clip(nx_, 0.01, 0.99)
        out[1, :, r, :] = jnp.clip(ny_, 0.01, 0.99)
        out[2, :, r, :] = vel_x
        out[3, :, r, :] = vel_y
        out[4, :, r, :] = nax_x
        out[5, :, r, :] = nax_y
        out[6, :, r, :] = nay_x
        out[7, :, r, :] = nay_y


def make_step_pallas(cfg: fa.FlipApicConfig, interpret: bool = False):
    """Build a step(state, grid_reduce=None) on the fused kernels.

    Requires grid % 128 == 0 (grid rows ride the 128-lane dimension)."""
    n = cfg.grid
    if n % 128:
        raise ValueError("pallas FLIP engine requires grid % 128 == 0")
    K = cfg.capacity
    G = n * n
    dtype = cfg.jax_dtype
    PADR = 8           # sentinel pad rows per side (8-row block aligned)
    NB = n // 8        # programs; 8 grid rows each

    p2g_call = pl.pallas_call(
        functools.partial(_p2g_kernel, cfg=cfg, n=n, K=K),
        grid=(NB,),
        in_specs=[pl.BlockSpec(
            (_NCH, K, 8 * n),
            functools.partial(lambda i, o: (0, 0, i + o), o=o),
            memory_space=pltpu.VMEM)
            for o in range(3)],
        out_specs=pl.BlockSpec((3, 8, n), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n, n), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    grid_call = pl.pallas_call(
        functools.partial(_grid_kernel, cfg=cfg, n=n),
        out_shape=[jax.ShapeDtypeStruct((n, n), dtype) for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def rowblock(o):
        return pl.BlockSpec(
            (8, n), functools.partial(
                lambda i, o: (jnp.clip(i + o, 0, NB - 1), 0), o=o),
            memory_space=pltpu.VMEM)

    g2p_call = pl.pallas_call(
        functools.partial(_g2p_kernel, cfg=cfg, n=n, K=K),
        grid=(NB,),
        in_specs=([pl.BlockSpec((_NCH, K, 8 * n), lambda i: (0, 0, i + 1),
                                memory_space=pltpu.VMEM)]
                  + [rowblock(o) for _g in range(4) for o in (-1, 0, 1)]),
        out_specs=pl.BlockSpec((8, K, 8, n), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, K, n, n), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    from ..ops import cell_dense as cd

    grid_geom = cd.DenseGrid(Gx=n, Gy=n, cell=1.0, K=K)

    def step(s: fa.FlipApicState, grid_reduce=None) -> fa.FlipApicState:
        px, py = s.pos[:, 0], s.pos[:, 1]
        gxp = px * (n - 1)
        gyp = py * (n - 1)
        bxp = jnp.clip(jnp.floor(gxp).astype(jnp.int32), 0, n - 1)
        byp = jnp.clip(jnp.floor(gyp).astype(jnp.int32), 0, n - 1)
        cid = byp * n + bxp
        rank, ok, _ = cd.bin_rank(grid_geom, s.pos, cid=cid)

        h = 1.0 / (n - 1)
        packed = jnp.stack([
            gxp, gyp, s.vel[:, 0], s.vel[:, 1],
            s.affine_x[:, 0], s.affine_x[:, 1],
            s.affine_y[:, 0], s.affine_y[:, 1],
            px, py,
            (px + h) * (n - 1), (px - h) * (n - 1),
            (py + h) * (n - 1), (py - h) * (n - 1),
        ], -1)                                        # (np, 14)

        # slab (14, K, (n + 16) rows * n) flattened on cells, 8 sentinel
        # pad rows per side
        nprt = s.pos.shape[0]
        Gp = (n + 16) * n
        iota = jnp.arange(nprt, dtype=jnp.int32)
        flat = jnp.where(ok, rank * Gp + 8 * n + cid, K * Gp + iota)
        fill = jnp.zeros((_NCH,), dtype).at[_C_GX].set(_SENTINEL)
        fill = fill.at[_C_GY].set(_SENTINEL)
        slab = jnp.broadcast_to(fill[None, :], (K * Gp, _NCH)).at[flat].set(
            packed.astype(dtype), mode="drop", unique_indices=True
        ).T.reshape(_NCH, K, Gp)

        grids = p2g_call(*([slab] * 3))
        mass, mom_u, mom_v = grids[0], grids[1], grids[2]
        if grid_reduce is not None:
            mass, mom_u, mom_v = grid_reduce((mass, mom_u, mom_v))
        u_prev, v_prev, u_proj, v_proj = grid_call(mass, mom_u, mom_v)

        dense_out = g2p_call(slab, *([u_prev] * 3), *([v_prev] * 3),
                             *([u_proj] * 3), *([v_proj] * 3))

        got = dense_out.reshape(8, K * G).T[
            jnp.where(ok, rank * G + cid, 0)]
        okc = ok[:, None]
        old = jnp.concatenate([s.pos, s.vel, s.affine_x, s.affine_y], -1)
        out = jnp.where(okc, got, old.astype(dtype))
        out_px, out_py = out[:, 0], out[:, 1]

        rx_ = jnp.clip((out_px * n).astype(jnp.int32), 0, n - 1)
        ry_ = jnp.clip((out_py * n).astype(jnp.int32), 0, n - 1)
        density = jnp.zeros(n * n, jnp.int32).at[ry_ * n + rx_].add(1)
        if grid_reduce is not None:
            density = grid_reduce(density)

        return fa.FlipApicState(
            pos=jnp.stack([out_px, out_py], -1),
            vel=out[:, 2:4],
            affine_x=out[:, 4:6],
            affine_y=out[:, 6:8],
            density=density.reshape(n, n),
        )

    return step
