"""Fused VMEM-resident semi-Lagrangian advection for the 2-D Stam solver.

Behavioral spec: k_adv (js_cuda.cu:82-103) — bilinear back-trace on the
log-η grid with the sample clamped to [0.5, N+0.5] and a zero halo ring.

Why a kernel: the XLA path lowers the 4-corner bilinear fetch to generic
element gathers that run at ~117 M elem/s on TPU (measured, BASELINE.md),
87% of the 512² step.  Mosaic has no arbitrary 2-D gather either, but it
*does* vectorize `take_along_axis` along the 128-lane dimension.  The
kernel therefore decomposes the fetch:

  * columns (lane dim): EXACT arbitrary gather, built from 128-wide
    lane gathers over the 4 column chunks of each row + chunk selects;
  * rows (sublane dim): a banded shift — the kernel walks source-row
    offsets in [-K, K+1] (aligned 8-row dynamic loads + static
    sub-shifts, since Mosaic requires sublane starts provably 8-aligned)
    and selects each output element's two row corners by comparing its
    per-element displacement against the walked offset.

Within the band the result is identical to the exact gather (same
corners, same weights).  Backtraces farther than K rows are clamped to
the band edge and counted (`ovf` output); measured on the reference
configuration the overflow fraction at K=16 is ~5e-5 of cells
(`advect_overflow_count`, the CLI warns).  This mirrors the dense-shift
advection contract of kernels/stam3d_pallas.py (advect_k), with the
exact XLA path selectable via engine='xla'.

Measured on a v5e chip at 512² f32: 1.05 ms/advect vs 12.5 ms for the
XLA gather path (scan-amortized), ~12x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_advect_pallas", "make_lin_solve_pallas"]

_LANE = 128


def _shift_sum4(x, n):
    """Sum of the 4 neighbors with the zero halo ring, on a VMEM value
    (solvers/stam2d._sum4 on the interior array; the ring is implicit)."""
    z_row = jnp.zeros((1, n), x.dtype)
    z_col = jnp.zeros((n, 1), x.dtype)
    up = jnp.concatenate([x[1:, :], z_row], axis=0)
    dn = jnp.concatenate([z_row, x[:-1, :]], axis=0)
    lf = jnp.concatenate([x[:, 1:], z_col], axis=1)
    rt = jnp.concatenate([z_col, x[:, :-1]], axis=1)
    return up + dn + lf + rt


def _lin_solve_kernel(x_ref, b_ref, ac_ref, out_ref, *, n, iters):
    """`iters` Jacobi sweeps x <- (b + a*sum4(x))/c entirely in VMEM
    (k_lin + lin_solve, js_cuda.cu:70-80,143-158).  One kernel serves
    every solve in the step: a and c arrive as SMEM scalars, so the
    diffusion and pressure solves share the compiled body."""
    b = b_ref[:]
    a = ac_ref[0, 0]
    c = ac_ref[0, 1]

    def body(_, xk):
        return (b + a * _shift_sum4(xk, n)) / c

    out_ref[:] = lax.fori_loop(0, iters, body, x_ref[:])


def make_lin_solve_pallas(n: int, iters: int, dtype=jnp.float32,
                          interpret: bool = False):
    """Build solve(x, b, a, c) -> x' running all `iters` sweeps in one
    VMEM-resident kernel.  The XLA loop reads+writes the array from HBM
    every sweep (~2 MB x 40 per solve at 512²); here only the in/out
    arrays cross HBM."""
    call = pl.pallas_call(
        functools.partial(_lin_solve_kernel, n=n, iters=iters),
        out_shape=jax.ShapeDtypeStruct((n, n), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def solve(x, b, a, c):
        ac = jnp.asarray([[a, c]], dtype)
        return call(x.astype(dtype), b.astype(dtype), ac)

    return solve


def _colgather(S, c, n):
    """G[j,i] = S[j, c[j,i]] for c in [-1, n] (out of range -> 0), built
    from 128-lane `take_along_axis` over column chunks."""
    outs = []
    for oc in range(n // _LANE):
        idx = c[:, oc * _LANE:(oc + 1) * _LANE]
        chunk_of = idx >> 7
        acc = jnp.zeros((n, _LANE), S.dtype)
        for cb in range(n // _LANE):
            cl = jnp.clip(idx - cb * _LANE, 0, _LANE - 1)
            g = jnp.take_along_axis(S[:, cb * _LANE:(cb + 1) * _LANE], cl,
                                    axis=1)
            acc = jnp.where(chunk_of == cb, g, acc)
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def _advect_kernel(*refs, dt, n, k_band, n_fields, with_box):
    """Banded-row + exact-column advection for `n_fields` q-fields that
    share one (uu, vv) backtrace — the velocity step advects u0 and v0
    with the SAME coordinates (js_cuda.cu:176-177), so the index math
    and the per-offset corner weights are computed once and only the
    column gathers run per field.

    `with_box` additionally emits the bounding box of the out-of-band
    cells as (1, 4) int32 [rmin, rmax, cmin, cmax] ([n, -1, n, -1] when
    none overflow), so the hybrid engine's window repair
    (solvers/stam2d._repair_overflow_from_box) needs no full-grid coord
    recompute or reductions in XLA — the kernel already has the
    displacement field in VMEM."""
    qpads = refs[:n_fields]
    uu_ref, vv_ref, eta_ref, xp_ref, yp_ref = refs[n_fields:n_fields + 5]
    outs = refs[n_fields + 5:n_fields + 5 + n_fields]
    if with_box:
        ovf_ref, box_ref = refs[-2], refs[-1]
    else:
        ovf_ref = refs[-1]

    eta = eta_ref[0, :]
    xp = xp_ref[0, :]
    yp = yp_ref[0, :]
    deta = eta[1] - eta[0]
    eta_min = eta[0] - 0.5 * deta

    # back-trace in η-space, converted by the local metric (k_adv :86-92)
    bx = eta[None, :] - dt * uu_ref[:] / xp[None, :]
    by = eta[:, None].reshape(n, 1) - dt * vv_ref[:] / yp[:, None].reshape(n, 1)
    sarr = jnp.clip((bx - eta_min) / deta + 0.5, 0.5, n + 0.5)
    tarr = jnp.clip((by - eta_min) / deta + 0.5, 0.5, n + 0.5)
    i0 = jnp.floor(sarr).astype(jnp.int32)   # padded-space col in [0, n]
    j0 = jnp.floor(tarr).astype(jnp.int32)   # padded-space row in [0, n]
    s1 = sarr - i0.astype(sarr.dtype)
    t1 = tarr - j0.astype(tarr.dtype)
    s0 = 1.0 - s1
    t0 = 1.0 - t1
    c_lo = i0 - 1                            # interior cols of the 2 corners
    c_hi = i0
    row_id = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    disp = j0 - 1 - row_id                   # interior row offset, corner 1
    disp_c = jnp.clip(disp, -k_band, k_band)
    over = disp != disp_c
    # one full-grid pass: per-row out-of-band counts (int — the total and
    # every derived quantity are order-exact)
    rowcnt = jnp.sum(over.astype(jnp.int32), axis=1, keepdims=True)  # (n,1)
    ovf_ref[:, :] = jnp.sum(rowcnt, keepdims=True)
    if with_box:
        # row extent from the (n,1) row counts, column extent from one
        # axis-0 any-pass: 2 full-grid reductions total where the first
        # cut emitted 5 (ovf sum + 4 where-min/max over (n,n)) — the box
        # emission measured ~120 us/step of the hybrid's tax
        over_r = rowcnt > 0                                   # (n, 1)
        over_c = jnp.any(over, axis=0, keepdims=True)         # (1, n)
        ri = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        ci = lax.broadcasted_iota(jnp.int32, (1, n), 1)
        box_ref[:, :] = jnp.stack([
            jnp.min(jnp.where(over_r, ri, n)),
            jnp.max(jnp.where(over_r, ri, -1)),
            jnp.min(jnp.where(over_c, ci, n)),
            jnp.max(jnp.where(over_c, ci, -1)),
        ]).reshape(1, 4)

    def corner_pair(slabs, koff, accs):
        w = (jnp.where(disp_c == koff, t0, 0.0)
             + jnp.where(disp_c == koff - 1, t1, 0.0))
        out = []
        for slab, acc in zip(slabs, accs):
            g_lo = _colgather(slab, c_lo, n)
            g_hi = _colgather(slab, c_hi, n)
            out.append(acc + w * (s0 * g_lo + s1 * g_hi))
        return tuple(out)

    n_kh = (2 * k_band + 2 + 7) // 8

    def body(kh, accs):
        base = pl.multiple_of(kh * 8, 8)
        slab8s = [q[pl.ds(base, n + 8), :] for q in qpads]
        for kl in range(8):
            accs = corner_pair([s8[kl:kl + n, :] for s8 in slab8s],
                               kh * 8 + kl - k_band, accs)
        return accs

    accs = lax.fori_loop(
        0, n_kh - 1, body,
        tuple(jnp.zeros((n, n), o.dtype) for o in outs))
    # static tail: only the offsets the band actually needs
    slab8s = [q[(n_kh - 1) * 8:(n_kh - 1) * 8 + n + 8, :] for q in qpads]
    for kl in range(2 * k_band + 2 - (n_kh - 1) * 8):
        accs = corner_pair([s8[kl:kl + n, :] for s8 in slab8s],
                           (n_kh - 1) * 8 + kl - k_band, accs)
    for o, acc in zip(outs, accs):
        o[:] = acc


def make_advect_pallas(cfg, interpret: bool = False, n_fields: int = 1,
                       band: int | None = None, with_box: bool = False):
    """Build the banded advection call for cfg.

    n_fields=1: advect(q0, uu, vv) -> (q_new, overflow_count).
    n_fields=2: advect(q0a, q0b, uu, vv) -> (qa, qb, overflow_count) —
    both fields back-traced with the same coordinates (the velocity
    self-advection pair).  Requires float32 and n % 128 == 0.
    `band` overrides cfg.advect_band (the hybrid engine's wide tier uses
    bands past the config field's 128 cap; the kernel itself takes any
    band <= n).  `with_box` appends the (4,) int32 out-of-band bounding
    box [rmin, rmax, cmin, cmax] to the returns (the hybrid repair's
    input)."""
    n = cfg.n
    K = cfg.advect_band if band is None else band
    if n % _LANE:
        raise ValueError(f"pallas advection requires n % {_LANE} == 0")
    dt_ = cfg.jax_dtype
    deta = (cfg.eta_max - cfg.eta_min) / n
    idx = jnp.arange(1, n + 1, dtype=dt_)
    eta = (cfg.eta_min + (idx - 0.5) * deta).reshape(1, n)
    xp = (cfg.x0 * jnp.exp(eta)).reshape(1, n)
    yp = (cfg.y0 * jnp.exp(eta)).reshape(1, n)
    n_kh = (2 * K + 2 + 7) // 8

    out_shape = ([jax.ShapeDtypeStruct((n, n), dt_)] * n_fields
                 + [jax.ShapeDtypeStruct((1, 1), jnp.int32)])
    if with_box:
        out_shape.append(jax.ShapeDtypeStruct((1, 4), jnp.int32))
    call = pl.pallas_call(
        functools.partial(_advect_kernel, dt=cfg.dt, n=n, k_band=K,
                          n_fields=n_fields, with_box=with_box),
        out_shape=out_shape,
        # the 2-field variant needs ~115 MB of scoped VMEM at 512^2
        # (v5e has 128 MB); the default 100 MB cap rejects it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=122 * 1024 * 1024),
        interpret=interpret,
    )

    def advect(*args):
        qs = args[:n_fields]
        uu, vv = args[n_fields:]
        # rows: K zeros on top (offset -K), then enough tail zeros that the
        # last aligned 8-row load stays in bounds
        qpads = [jnp.pad(q, ((K, 8 * n_kh - K), (0, 0))) for q in qs]
        out = call(*qpads, uu, vv, eta, xp, yp)
        rets = (*out[:n_fields], out[n_fields][0, 0])
        if with_box:
            rets = (*rets, out[n_fields + 1][0])
        return rets

    return advect
