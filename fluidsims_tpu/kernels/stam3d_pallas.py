"""Fused Pallas TPU kernels for the 3-D Stam solver.

Behavioral spec: js_cuda3d.cu lin_solve (:297-313) and k_adv3d
(:192-237).  The XLA path runs 72 Jacobi stencil passes per frame (6
solves x 12 iterations), each a full HBM round trip, and its dense-shift
advection materializes every shifted volume in HBM — together ~0.2 s per
192^3 step.  These kernels keep the iteration state in VMEM:

* `make_lin_solve_pallas` — z-banded Jacobi: each program loads a
  (band + 2*halo)-slice window and runs `iters_per_pass` iterations
  in VMEM, recomputing the halo region instead of syncing through HBM.
  The reference's ping-pong ghost semantics (ring values alternate
  between x's original ghosts on even read-iterations and zeros on odd,
  lin_solve :297-313) are replicated exactly: ring values are saved from
  the window on entry and re-applied by static iteration parity.
  Bit-identical to solvers/stam3d._lin_solve for even iteration counts.

* `make_advect_pallas` — the dense-shift trilinear advection
  (_advect_dense) factored per axis: per output slice, the inner z-sum
  runs over (2K+1) window slices, then the (oy, ox) in-plane shifts are
  weighted 2-D ops — ~(2K+1)^2*(2K+3) MACs per cell, all in VMEM, exact
  for backtrace displacements <= K cells (use
  solvers.stam3d.advect_capped_count to check a run stayed uncapped).
  Offsets run -K..K only: with the displacement clipped to [-K, K] the
  hat weight of offset K+1 is identically zero (exactly 0 at the d == K
  cap), so the (2K+2)-wide form round 2 shipped carried a dead
  zero-weight slab per axis — removing it cuts the z-inner MAC count
  (2K+2)^3 -> (2K+1)^3 (216 -> 125 shifted-volume MACs at K=2) with
  bitwise-identical output.

* `make_set_bnd_pallas` — all four fields' reflective ghost faces in one
  read+write pass (the .at[].set form copies the full volume per face).

Measured at 192^3 f32 on one v5e chip with the fixed band-4 config:
29.9 steps/s (212 MLUPS) for the full frame step after the zero-weight
advection slab trim (24.4 before it), vs 4.5 steps/s for the XLA dense
path and 0.4 for the XLA exact-gather path in round 1.  (An earlier
adaptive-band build measured 31.4 steps/s in round 2; the band-16
single-pass variant it picked at 192^3 was re-measured at 23.5 steps/s
in round 3 — see the negative-result note below — so the fixed band is
what ships.)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_lin_solve_pallas", "make_advect_pallas",
           "make_set_bnd_pallas", "make_step_pallas"]

_JB = 4     # jacobi band (z slices per program); also the window halo
_JCOPIES = 3  # window copies (band + one halo block per side)
_IP = 4     # jacobi iterations fused per pass (<= _JB)
_AB = 4     # advect band

# Negative result: a deeper Jacobi band (band 16, all 12 iterations in ONE
# pass instead of 3) promises 3x less window traffic per solve, but the
# same-session hardware A/B at the 192^3 reference default measured it
# 23.5 vs 24.4 steps/s — slightly SLOWER end-to-end.  The 16x194x194
# window copies (6 in + 1 out ≈ 17 MB) exceed scoped VMEM, so Mosaic
# spills exactly the traffic the deeper band was meant to save; band 4
# (≈4.3 MB live) stays resident and the solve stays a minority of the
# step next to the dense-shift advection.  Fixed band 4 stays.  Re-tested
# after the shrinking-window change with band 8 / ip 6 (2 passes, -33%
# window traffic, ≈8.4 MB live): 31.0 vs 32.4 steps/s — still slower.


def _jacobi_kernel(a, c, it0, ip, Np, B, hw, *refs):
    """One pass of `ip` Jacobi iterations over a z-window.

    refs: JCOPIES cur blocks (B, Np, Np), JCOPIES x0 blocks, out (B, Np, Np).
    `hw` = window index of the first output slice.  `it0` = global index of
    the first iteration in this pass (static), controlling ring parity.
    """
    nc = (len(refs) - 1) // 2
    cur = jnp.concatenate([r[:] for r in refs[:nc]], axis=0)
    x0w = jnp.concatenate([r[:] for r in refs[nc:2 * nc]], axis=0)
    out = refs[-1]
    W = cur.shape[0]

    # ring mask: all 6 faces of the GLOBAL (Np, Np, Np) array, in window
    # coordinates (gz depends on the program's window start).  Edge
    # programs read clamped/duplicated halo blocks, but the ghost ring
    # cuts every dependency chain before that junk can reach a real cell.
    pid = pl.program_id(0)
    z0 = pid * B - hw                     # global z of window slice 0
    gz = jax.lax.broadcasted_iota(jnp.int32, (W, 1, 1), 0) + z0
    gy = jax.lax.broadcasted_iota(jnp.int32, (1, Np, 1), 1)
    gx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Np), 2)
    ring = ((gz == 0) | (gz == Np - 1) | (gy == 0) | (gy == Np - 1)
            | (gx == 0) | (gx == Np - 1))

    ring_vals = jnp.where(ring, cur, 0.0)

    # Shrinking active window: after iteration tt, only rows within
    # (ip - 1 - tt) slices of the output band [hw, hw + B) can still
    # influence it (the stencil reaches 1 slice per iteration), so each
    # iteration updates 2 fewer z-slices than the last — 40 -> 28
    # interior slice-updates per band-4 pass, bitwise-identical output.
    # `act` holds rows [base, base + act.shape[0]) of the window.
    act = cur
    base = 0
    for tt in range(ip):
        reach = ip - 1 - tt
        lo = hw - reach          # first row this iteration must update
        hi = hw + B + reach      # exclusive
        sub = act[lo - 1 - base:hi + 1 - base]
        rsub = ring[lo - 1:hi + 1]
        # read-ghosts at global iteration it0+tt: x's originals when even,
        # the zeroed scratch buffer's when odd (lin_solve ping-pong)
        if (it0 + tt) % 2 == 0:
            sub = jnp.where(rsub, ring_vals[lo - 1:hi + 1], sub)
        else:
            sub = jnp.where(rsub, 0.0, sub)
        s6 = (
            sub[1:-1, 1:-1, :-2] + sub[1:-1, 1:-1, 2:]
            + sub[1:-1, :-2, 1:-1] + sub[1:-1, 2:, 1:-1]
            + sub[:-2, 1:-1, 1:-1] + sub[2:, 1:-1, 1:-1]
        )
        # pad-all-dims + z-slice instead of a ((0,0),(1,1),(1,1)) pad:
        # Mosaic rejects the y/x-only pad here ("result/input offset
        # mismatch on non-concat dimension") but lowers this form fine
        act = jnp.pad((x0w[lo:hi, 1:-1, 1:-1] + a * s6) / c, 1)[1:-1]
        base = lo

    # act is now exactly the output band; an even total lands in the x
    # buffer, whose ring is x's original
    out[:] = jnp.where(ring[hw:hw + B], ring_vals[hw:hw + B], act)


def make_lin_solve_pallas(n: int, a: float, c: float, iters: int,
                          dtype=jnp.float32, interpret: bool = False):
    """Build lin_solve(x, x0) -> x_new on (n+2)^3 arrays, bit-identical to
    solvers.stam3d._lin_solve for even `iters`."""
    # Fixed band (see the negative-result note above): band _JB stays
    # VMEM-resident; ip = the largest even divisor of `iters` that fits
    # the halo (ip <= jb), so e.g. iters=12 -> ip=4 (3 passes).
    jb = _JB
    if iters % 2:
        raise ValueError(f"iters={iters} must be even")
    ip = max(p for p in range(2, jb + 1, 2) if iters % p == 0)
    if n % jb:
        raise ValueError(f"n={n} must be divisible by {jb}")
    Np = n + 2
    B = jb
    nc = _JCOPIES
    # grid over ALL z blocks of the full (Np, Np, Np) array — ghost slices
    # are produced by the kernel itself (ring re-application), so each
    # pass maps (Np,...) -> (Np,...) with ZERO XLA glue between passes.
    # Window halo blocks use clamped index maps at the edges; the junk
    # they duplicate is unreachable past the ghost ring (see kernel).
    nb = -(-Np // B)
    hw = B  # window index of the output block start

    passes = iters // ip

    def specs():
        return [
            pl.BlockSpec(
                (B, Np, Np),
                functools.partial(
                    lambda i, o: (jnp.clip(i + o - 1, 0, nb - 1), 0, 0),
                    o=o),
                memory_space=pltpu.VMEM)
            for o in range(nc)
        ]

    calls = []
    for p in range(passes):
        calls.append(pl.pallas_call(
            functools.partial(_jacobi_kernel, a, c, p * ip, ip, Np, B, hw),
            grid=(nb,),
            in_specs=specs() + specs(),
            out_specs=pl.BlockSpec((B, Np, Np), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Np, Np, Np), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        ))

    def lin_solve(x, x0):
        cur = x
        for call in calls:
            cur = call(*([cur] * nc), *([x0] * nc))
        return cur

    return lin_solve


def make_advect_pallas(cfg, interpret: bool = False):
    """Build advect(q0, u, v, w) -> full array with the interior replaced,
    equal to solvers.stam3d._advect_dense up to f32 reassociation.  The
    kernel writes the FULL (n+2)^3 output (ghost ring passed through from
    q0), so no XLA interior-update copy is needed."""
    n = cfg.n
    K = cfg.advect_k
    if K < 1:
        raise ValueError("pallas advection requires advect_k >= 1")
    B = _AB
    if 3 * B < B + 2 * K:
        raise ValueError(f"advect_k={K} too large for band {B}")
    Np = n + 2
    Nqz = Np + 2 * K       # z gets a symmetric K edge-pad
    Nq = Np + 2 * K        # x/y get a symmetric K edge-pad (offsets -K..K)
    nb = -(-Np // B)
    # window blocks j..j+2 of the z-padded volume start at qp z = j*B, so
    # the source slice for local row l at offset oz is l + K + oz

    qspecs = [
        pl.BlockSpec((B, Nq, Nq),
                     functools.partial(
                         lambda i, o: (jnp.clip(i + o, 0, nb + 2 - 1), 0, 0),
                         o=o),
                     memory_space=pltpu.VMEM)
        for o in range(3)
    ]
    vspec = pl.BlockSpec((B, Np, Np), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(_advect_kernel, cfg, K, B, Np),
        grid=(nb,),
        in_specs=qspecs + [vspec] * 4,
        out_specs=pl.BlockSpec((B, Np, Np), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Np, Np), cfg.jax_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def advect(q0, u, v, w):
        qp = jnp.pad(q0, ((K, K + (nb + 2) * B - Nqz),
                          (K, K), (K, K)), mode="edge")
        return call(qp, qp, qp, q0, u, v, w)

    return advect


def _advect_kernel(cfg, K, B, Np, *refs):
    """Factored dense-shift trilinear advection for one z-band of the FULL
    (Np, Np, Np) output.  refs: 3 qpad window blocks (B, Nq, Nq), q0 block
    (B, Np, Np) for the ring passthrough, u, v, w blocks (B, Np, Np),
    out (B, Np, Np)."""
    qwin = jnp.concatenate([r[:] for r in refs[:3]], axis=0)
    q0b = refs[3][:]
    u, v, w = refs[4][:], refs[5][:], refs[6][:]
    out = refs[7]
    n = cfg.n
    dt_ = cfg.dt
    offs = list(range(-K, K + 1))
    pid = pl.program_id(0)

    dtype = qwin.dtype
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Np), 2)
    jy = jax.lax.broadcasted_iota(jnp.int32, (1, Np, 1), 1)
    kz = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1), 0) + pid * B
    fx = ix.astype(dtype)
    fy = jy.astype(dtype)
    fz = kz.astype(dtype)

    dxc = jnp.clip(jnp.clip(fx - dt_ * u, 0.5, n + 0.5) - fx, -K, K)
    dyc = jnp.clip(jnp.clip(fy - dt_ * v, 0.5, n + 0.5) - fy, -K, K)
    dzc = jnp.clip(jnp.clip(fz - dt_ * w, 0.5, n + 0.5) - fz, -K, K)

    def hat(d, o):
        return jnp.maximum(0.0, 1.0 - jnp.abs(d - o))

    wx = [hat(dxc, o) for o in offs]
    wy = [hat(dyc, o) for o in offs]
    wz = [hat(dzc, o) for o in offs]

    acc = jnp.zeros((B, Np, Np), dtype)
    for iyo, oy in enumerate(offs):
        for ixo, ox in enumerate(offs):
            t = jnp.zeros((B, Np, Np), dtype)
            for izo, oz in enumerate(offs):
                qs = qwin[K + oz:K + oz + B,
                          oy + K:oy + K + Np,
                          ox + K:ox + K + Np]
                t = t + wz[izo] * qs
            acc = acc + (wy[iyo] * wx[ixo]) * t

    ring = ((kz == 0) | (kz == Np - 1) | (jy == 0) | (jy == Np - 1)
            | (ix == 0) | (ix == Np - 1))
    out[:] = jnp.where(ring, q0b, acc)


def _set_bnd_kernel(Np, B, signs, *refs):
    """k_set_bnd (js_cuda3d.cu:119-157) for all four fields in one pass.
    Every face write reads interior cells only, so the faces are
    order-independent and each array needs exactly one read + one write
    (the XLA .at[].set formulation copies the full 28 MB volume per face).
    refs: 4 in blocks (B, Np, Np), 4 out blocks.  signs = per-field
    (sx, sy, sz) reflection signs."""
    pid = pl.program_id(0)
    n_in = len(refs) // 2
    gz = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1), 0) + pid * B
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, Np, 1), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Np), 2)
    int_z = (gz >= 1) & (gz <= Np - 2)
    int_y = (iy >= 1) & (iy <= Np - 2)
    int_x = (ix >= 1) & (ix <= Np - 2)

    for f in range(n_in):
        g = refs[f][:]
        sx, sy, sz = signs[f]
        out = g
        # X faces (interior rows/slices only; edges and corners untouched)
        out = jnp.where((ix == 0) & int_y & int_z, sx * g[:, :, 1:2], out)
        out = jnp.where((ix == Np - 1) & int_y & int_z,
                        sx * g[:, :, Np - 2:Np - 1], out)
        # Y faces
        out = jnp.where((iy == 0) & int_x & int_z, sy * g[:, 1:2, :], out)
        out = jnp.where((iy == Np - 1) & int_x & int_z,
                        sy * g[:, Np - 2:Np - 1, :], out)
        # Z faces: the neighbor slice is in the same band (band 0 holds
        # k=0,1; the last in-range band holds k=Np-2, Np-1)
        sh_up = jnp.concatenate([g[1:], g[-1:]], axis=0)
        sh_dn = jnp.concatenate([g[:1], g[:-1]], axis=0)
        out = jnp.where((gz == 0) & int_x & int_y, sz * sh_up, out)
        out = jnp.where((gz == Np - 1) & int_x & int_y, sz * sh_dn, out)
        refs[n_in + f][:] = out


def make_set_bnd_pallas(n: int, dtype=jnp.float32, interpret: bool = False):
    """Build set_bnd(u, v, w, d) -> (u, v, w, d), bit-identical to
    solvers.stam3d.set_bnd in one fused pass."""
    Np = n + 2
    B = 2
    Zp = -(-Np // B) * B
    n_bands = Zp // B
    signs = ((-1.0, 1.0, 1.0), (1.0, -1.0, 1.0), (1.0, 1.0, -1.0),
             (1.0, 1.0, 1.0))

    spec = pl.BlockSpec((B, Np, Np), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_set_bnd_kernel, Np, B, signs),
        grid=(n_bands,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((Zp, Np, Np), dtype)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    pad = Zp - Np

    def set_bnd(u, v, w, d):
        args = [jnp.pad(f, ((0, pad), (0, 0), (0, 0))) if pad else f
                for f in (u, v, w, d)]
        outs = call(*args)
        if pad:
            outs = [o[:Np] for o in outs]
        return tuple(outs)

    return set_bnd


def make_step_pallas(cfg, interpret: bool = False):
    """Frame step on the fused kernels: same sequence as
    solvers.stam3d.step with _lin_solve and _advect_dense swapped for the
    Pallas versions (set_bnd / source / div / gradient stay XLA — single
    fused elementwise passes)."""
    from ..solvers import stam3d as s3

    n = cfg.n
    dtype = cfg.jax_dtype
    a_visc = cfg.dt * cfg.visc * n * n
    a_diff = cfg.dt * cfg.diff * n * n
    solve_visc = make_lin_solve_pallas(
        n, a_visc, 1.0 + 6.0 * a_visc, cfg.jacobi_iters, dtype, interpret)
    solve_diff = make_lin_solve_pallas(
        n, a_diff, 1.0 + 6.0 * a_diff, cfg.jacobi_iters, dtype, interpret)
    solve_proj = make_lin_solve_pallas(
        n, 1.0, 6.0, cfg.jacobi_iters, dtype, interpret)
    advect = make_advect_pallas(cfg, interpret)
    set_bnd = make_set_bnd_pallas(n, dtype, interpret)

    def project(u, v, w, p_init):
        # pad-built interior updates fuse into single passes (no
        # dynamic-update-slice volume copies)
        div = jnp.pad(
            -0.5 * (
                (u[1:-1, 1:-1, 2:] - u[1:-1, 1:-1, :-2])
                + (v[1:-1, 2:, 1:-1] - v[1:-1, :-2, 1:-1])
                + (w[2:, 1:-1, 1:-1] - w[:-2, 1:-1, 1:-1])
            ), 1)
        p = jnp.where(_interior, jnp.zeros((), u.dtype), p_init)
        p = solve_proj(p, div)
        u = u + jnp.pad(
            -0.5 * (p[1:-1, 1:-1, 2:] - p[1:-1, 1:-1, :-2]), 1)
        v = v + jnp.pad(
            -0.5 * (p[1:-1, 2:, 1:-1] - p[1:-1, :-2, 1:-1]), 1)
        w = w + jnp.pad(
            -0.5 * (p[2:, 1:-1, 1:-1] - p[:-2, 1:-1, 1:-1]), 1)
        return u, v, w, p

    idx1 = jnp.arange(0, n + 2)
    _ix = idx1[None, None, :]
    _jy = idx1[None, :, None]
    _kz = idx1[:, None, None]
    _interior = ((_ix >= 1) & (_ix <= n) & (_jy >= 1) & (_jy <= n)
                 & (_kz >= 1) & (_kz <= n))

    def source_decay(u, v, w, d, step_idx):
        # decay + orbiting source (k_decay/k_add_source3d,
        # js_cuda3d.cu:91-117) as single fused where-expressions per field
        # instead of interior-update copies
        no4 = n / 4.0
        t = cfg.src_freq * step_idx.astype(u.dtype)
        fi = _ix.astype(u.dtype)
        fj = _jy.astype(u.dtype)
        fk = _kz.astype(u.dtype)
        dx = fi - no4 * (1.0 + jnp.cos(t))
        dy = fj - no4 * (1.0 + jnp.sin(t))
        dz = fk - no4 * (1.0 + jnp.sin(t))
        r2 = dx * dx + dy * dy + dz * dz
        inside = _interior & (r2 < n)
        r = jnp.sqrt(r2) + 1e-7
        d = jnp.where(_interior, d * cfg.decay, d)
        d = jnp.where(inside, d + cfg.src_gain * jnp.exp(-r2 / n), d)
        u = jnp.where(inside, u + dz / r, u)
        v = jnp.where(inside, v + dy / r, v)
        w = jnp.where(inside, w + dx / r, w)
        return u, v, w, d

    def step(s):
        u, v, w = s.u, s.v, s.w
        u0, v0, w0 = s.u0, s.v0, s.w0
        d, d0 = s.d, s.d0

        u, v, w, d = source_decay(u, v, w, d, s.step_idx)

        u0 = solve_visc(u0, u)
        v0 = solve_visc(v0, v)
        w0 = solve_visc(w0, w)
        u0, v0, w0, d = set_bnd(u0, v0, w0, d)
        u0, v0, w0, p = project(u0, v0, w0, jnp.zeros_like(u0))
        u0, v0, w0, d = set_bnd(u0, v0, w0, d)
        u = advect(u0, u0, v0, w0)
        v = advect(v0, u0, v0, w0)
        w = advect(w0, u0, v0, w0)
        u, v, w, d = set_bnd(u, v, w, d)
        u, v, w, p = project(u, v, w, p)
        u, v, w, d = set_bnd(u, v, w, d)

        d0 = solve_diff(d0, d)
        u, v, w, d0 = set_bnd(u, v, w, d0)
        d = advect(d0, u, v, w)
        u, v, w, d = set_bnd(u, v, w, d)

        return s3.Stam3DState(u=u, v=v, w=w, u0=u0, v0=v0, w0=w0, d=d,
                              d0=d0, step_idx=s.step_idx + 1)

    return step
