"""Fused Pallas TPU kernel for the flagship 2-D hypersonic step.

Why: the XLA dataflow path materializes dozens of intermediate grids per
step (predict states, face fluxes, selects) — HBM traffic dominates.  This
kernel runs the ENTIRE physics update (MUSCL predict -> HLLC faces ->
conservative update + diffusion -> positivity fix) on a VMEM-resident row
band, the Pallas analog of the reference's shared-memory halo tiling
(tau_hypersonic_cuda.cu:849-1176) but fused across all five CUDA kernels.
Measured on one v5e chip at 2048^2 f32: ~1.65x over the already-fused XLA
dataflow path, bit-identical results.

Mechanics: Pallas Blocked indexing cannot express overlapping windows, so
each field is passed three times (previous/current/next row band) and the
halo-2 window is assembled with two concats in VMEM.  The BC-resolved
padding (hypersonic2d.pad_bc semantics) is built host-side in a single
fused pad per field, extended to whole bands.  The kernel body is
hypersonic2d.step_core_padded — the Pallas and XLA paths share one
implementation of the physics, so the float64-oracle tests cover both
(equivalence asserted in tests/test_pallas_kernels.py).

VMEM budget: the core keeps ~90 band-sized temporaries live; band=16 fits
the 16MB scoped VMEM at W=2048 (band=32 OOMs).  Larger W needs a smaller
band.

(An in-kernel-BC + thin-halo-slab variant that would cut input traffic to
~(band+16)/band was tried and reliably crashes this environment's remote
Mosaic compile helper; revisit when the toolchain updates.)
"""

from __future__ import annotations

import functools

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


def _band_kernel(cfg, n_fields, dt_ref, *refs):
    """One row band: assemble halo windows from 3 adjacent blocks per field
    and run the shared physics core."""
    ins = refs[: 3 * (n_fields + 1)]
    outs = refs[3 * (n_fields + 1):]
    dt = dt_ref[0, 0]

    def window(a, b, c):
        return jnp.concatenate([a[-PAD:, :], b[:, :], c[:PAD, :]], axis=0)

    fields = []
    for k in range(n_fields + 1):
        a, b, c = ins[3 * k], ins[3 * k + 1], ins[3 * k + 2]
        fields.append(window(a[:], b[:], c[:]))

    Up = Cons(*fields[:4])
    Mp = fields[4] > 0.5

    out = h2.step_core_padded(cfg, Up, Mp, dt)
    for o_ref, val in zip(outs, out):
        o_ref[:] = val


def make_step_pallas(cfg: h2.Hypersonic2DConfig, band: int = 16,
                     interpret: bool = False):
    """Build the fused step. `band` = rows per grid step (multiple of 8,
    VMEM-bounded — see module docstring)."""
    H, W = cfg.ny, cfg.nx
    if H % band:
        raise ValueError(f"ny={H} must be divisible by band={band}")
    # ~90 band-sized f32 temporaries stay live in the fused core; past this
    # the Mosaic scoped-VMEM (16MB) overflows (x-tiling would be needed).
    if (band + 2 * PAD) * (W + 2 * PAD) * 4 * 90 > 15_000_000:
        raise ValueError(
            f"band={band} x width={W} exceeds the VMEM budget of the fused "
            "kernel; reduce band (>=8) or use the XLA path for very wide "
            "grids")
    n_bands = H // band
    Wp = W + 2 * PAD
    n_fields = 4

    in_specs = []
    for _k in range(n_fields + 1):
        for off in range(3):
            in_specs.append(
                pl.BlockSpec((band, Wp),
                             functools.partial(lambda i, o: (i + o, 0),
                                               o=off),
                             memory_space=pltpu.VMEM)
            )
    dt_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    out_specs = [
        pl.BlockSpec((band, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(n_fields)
    ]

    call = pl.pallas_call(
        functools.partial(_band_kernel, cfg, n_fields),
        grid=(n_bands,),
        in_specs=[dt_spec] + in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((H, W), cfg.jax_dtype)
                   for _ in range(n_fields)],
        interpret=interpret,
    )

    infl = e2.prim_to_cons(h2._inflow(cfg), cfg.gamma)
    ypad = band  # BC rows extended to a whole band (extra rows never read)

    def pad_field(f, left_val):
        """Single fused pad: y edge-clamp extended to `band` rows, x right
        edge copy (outflow), x left inflow constant — the pad_bc semantics
        (hypersonic2d.pad_bc) in one materialization."""
        f = jnp.pad(f, ((ypad, ypad), (0, PAD)), mode="edge")
        left = jnp.full((f.shape[0], PAD), left_val, f.dtype)
        return jnp.concatenate([left, f], axis=1)

    def step(s: h2.Hypersonic2DState) -> h2.Hypersonic2DState:
        U, mask = s.U, s.mask

        first_col = jnp.asarray(np.arange(cfg.nx) == 0)[None, :] & ~mask
        U = e2.c_where(first_col, h2._bcast(infl, U.rho.shape), U)

        maxs = h2.max_wavespeed(cfg, U, mask)
        dt = cfl_dt(maxs, cfg.cfl, dx=1.0, nu_max=cfg.nu_max)
        dt_arr = jnp.reshape(dt, (1, 1))

        padded = [pad_field(f, v) for f, v in zip(U, infl)]
        mf = jnp.pad(mask.astype(cfg.jax_dtype), ((ypad, ypad), (0, 0)),
                     mode="edge")
        mf = jnp.pad(mf, ((0, 0), (PAD, PAD)), mode="constant")
        padded.append(mf)

        args = [dt_arr]
        for f in padded:
            args.extend([f, f, f])
        rho, mx, my, E = call(*args)
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
