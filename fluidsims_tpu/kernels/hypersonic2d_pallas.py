"""Fused Pallas TPU kernel for the flagship 2-D hypersonic step.

Why: the XLA dataflow path materializes dozens of intermediate grids per
step (predict states, face fluxes, selects) — HBM traffic dominates.  This
kernel runs the ENTIRE physics update (inflow column -> MUSCL predict ->
HLLC faces -> conservative update + diffusion -> positivity fix) on a
VMEM-resident row band: per step each conserved field is read ~(band+16)/band
times and written once — the Pallas analog of the reference's shared-memory
halo tiling (tau_hypersonic_cuda.cu:849-1176), fused across all five CUDA
kernels AND the boundary-condition fills.

Mechanics:
  * Pallas Blocked indexing cannot express overlapping windows, so the
    2-row y halos come from thin 8-row "slab" arrays (top/bottom) gathered
    on the host from clipped row indices — the y edge-clamp BC falls out of
    the clipping.  Kernel input traffic is (band + 16)/band of the field
    bytes instead of 3x for the naive 3-block scheme.
  * The x BCs never touch HBM: the left inflow ghost is a broadcast
    constant and the right outflow ghost is the block's own last column,
    both materialized in VMEM inside the kernel.
  * The inflow column write (k_apply_inflow_left) happens inside the kernel
    too; the CFL wavespeed max excludes the stale column 0 and takes
    max(..., inflow speed) instead — algebraically identical to applying
    the inflow first (column 0 is replaced by the inflow state either way).
  * The kernel body is hypersonic2d.step_core_padded — the Pallas and XLA
    paths share one implementation of the physics, so the float64-oracle
    tests cover both (equivalence asserted in tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.clock import cfl_dt
from ..ops import euler2d as e2
from ..ops.euler2d import Cons
from ..solvers import hypersonic2d as h2
from ..solvers.hypersonic2d import PAD

__all__ = ["step_pallas", "run_pallas", "make_step_pallas"]

SLAB = 8  # thin halo slab rows (min f32 tile height)


def _band_kernel(cfg, dt_ref, *refs):
    n_arr = 5  # rho, mx, my, E, mask
    centers = refs[:n_arr]
    tops = refs[n_arr:2 * n_arr]
    bots = refs[2 * n_arr:3 * n_arr]
    outs = refs[3 * n_arr:]
    dt = dt_ref[0, 0]

    def ywin(k):
        return jnp.concatenate(
            [tops[k][-PAD:, :], centers[k][:, :], bots[k][:PAD, :]], axis=0
        )

    fields = [ywin(k) for k in range(4)]
    mwin = ywin(4) > 0.5

    # inflow column (k_apply_inflow_left, tau_hypersonic_cuda.cu:772-784)
    infl = e2.prim_to_cons(h2._inflow(cfg), cfg.gamma)
    fluid0 = ~mwin[:, :1]
    fields = [
        jnp.concatenate(
            [jnp.where(fluid0, jnp.full_like(f[:, :1], v), f[:, :1]),
             f[:, 1:]], axis=1)
        for f, v in zip(fields, infl)
    ]

    # x ghosts in VMEM: inflow constants left, own-last-column right
    def xpad(f, left_val):
        left = jnp.full((f.shape[0], PAD), left_val, f.dtype)
        right = jnp.concatenate([f[:, -1:]] * PAD, axis=1)
        return jnp.concatenate([left, f, right], axis=1)

    Up = Cons(*(xpad(f, v) for f, v in zip(fields, infl)))
    mfalse = jnp.zeros((mwin.shape[0], PAD), bool)
    Mp = jnp.concatenate([mfalse, mwin, mfalse], axis=1)

    out = h2.step_core_padded(cfg, Up, Mp, dt)
    for o_ref, val in zip(outs, out):
        o_ref[:] = val


def make_step_pallas(cfg: h2.Hypersonic2DConfig, band: int = 16,
                     interpret: bool = False):
    """Build the fused step. `band` = rows per grid step (multiple of 8;
    bounded by VMEM — 16 fits the 2048-wide default)."""
    H, W = cfg.ny, cfg.nx
    if H % band:
        raise ValueError(f"ny={H} must be divisible by band={band}")
    if band % SLAB:
        raise ValueError(f"band={band} must be a multiple of {SLAB}")
    n_bands = H // band

    # row gathers for the thin halo slabs (y edge clamp = index clipping)
    top_rows = np.clip(
        (np.arange(n_bands)[:, None] * band
         + np.arange(-SLAB, 0)[None, :]).ravel(), 0, H - 1)
    bot_rows = np.clip(
        (np.arange(n_bands)[:, None] * band
         + np.arange(band, band + SLAB)[None, :]).ravel(), 0, H - 1)
    top_rows = jnp.asarray(top_rows)
    bot_rows = jnp.asarray(bot_rows)

    def spec(rows):
        return pl.BlockSpec((rows, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    dt_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    in_specs = ([dt_spec] + [spec(band)] * 5 + [spec(SLAB)] * 5
                + [spec(SLAB)] * 5)
    out_specs = [spec(band) for _ in range(4)]

    call = pl.pallas_call(
        functools.partial(_band_kernel, cfg),
        grid=(n_bands,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((H, W), cfg.jax_dtype)
                   for _ in range(4)],
        interpret=interpret,
    )

    gamma, mach = cfg.gamma, cfg.inflow_mach
    inflow_speed = float((mach + 1.0) * math.sqrt(gamma))  # |u|+a at inflow

    def step(s: h2.Hypersonic2DState) -> h2.Hypersonic2DState:
        U, mask = s.U, s.mask

        # CFL wavespeed: exclude the stale column 0 (it is about to be
        # replaced by the inflow state) and fold the inflow speed back in.
        p = e2.cons_to_prim(U, cfg.gamma)
        a = e2.sound_speed(p, cfg.gamma)
        sp = jnp.maximum(jnp.abs(p.u) + a, jnp.abs(p.v) + a)
        sp = jnp.where(jnp.isfinite(sp), sp, 1e-12)
        col0 = jnp.asarray(np.arange(cfg.nx) == 0)[None, :]
        sp = jnp.where(mask | col0, 1e-12, sp)
        any_fluid0 = jnp.any(~mask[:, 0])
        maxs = jnp.maximum(
            jnp.max(sp),
            jnp.where(any_fluid0, inflow_speed, 1e-12),
        )
        maxs = jnp.maximum(maxs, 1e-12)
        dt = cfl_dt(maxs, cfg.cfl, dx=1.0, nu_max=cfg.nu_max)
        dt_arr = jnp.reshape(dt, (1, 1))

        mf = mask.astype(cfg.jax_dtype)
        arrays = list(U) + [mf]
        tops = [f[top_rows].reshape(n_bands * SLAB, W) for f in arrays]
        bots = [f[bot_rows].reshape(n_bands * SLAB, W) for f in arrays]

        rho, mx, my, E = call(dt_arr, *arrays, *tops, *bots)
        Un = Cons(rho=rho, mx=mx, my=my, E=E)
        return h2.Hypersonic2DState(U=Un, mask=mask, t=s.t + dt)

    return step


def step_pallas(cfg, s, band: int = 16, interpret: bool = False):
    return make_step_pallas(cfg, band, interpret)(s)


def run_pallas(cfg, s, n_steps: int, band: int = 16,
               interpret: bool = False):
    from ..core.stepper import scan_steps

    step = make_step_pallas(cfg, band, interpret)
    return scan_steps(step, s, n_steps)
