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
the 16MB scoped VMEM at tile width 2048 (band=32 OOMs).  Wider grids are
x-tiled: the grid becomes (n_bands, n_tiles) and each field is laid out
host-side as a concatenation of tiles that each carry their own halo-2
columns, so the Blocked (non-overlapping) x index stays exact — the x
analog of the y triple-block trick, with the overlap materialized in the
layout instead of in triplicate block reads.  `pick_tile_width` chooses the
widest power-of-two divisor of W that fits; the reference-native 8192-wide
grid runs as 4 tiles of 2048.

(An in-kernel-BC + thin-halo-slab variant that would cut input traffic to
~(band+16)/band was tried and reliably crashes this environment's remote
Mosaic compile helper; revisit when the toolchain updates.  A single-read
banded layout — halo rows materialized host-side via a row-take, blocks
read once instead of three times — was measured SLOWER than the triple
read at both 2048^2 and 8192x1024 (197 vs 205, 94 vs 98 steps/s): the
kernel is compute/pipeline-bound, and the extra host-side materialization
pass costs more than the saved reads.)
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


def _band_kernel(cfg, n_fields, wtp, dt_ref, *refs):
    """One row band x one column tile: assemble halo windows from 3
    adjacent row blocks per field and run the shared physics core.  `wtp`
    is the logical tile width incl. x halos; stored blocks may be wider
    (padded to a 128 multiple for Mosaic) — the excess columns are junk."""
    ins = refs[: 3 * (n_fields + 1)]
    outs = refs[3 * (n_fields + 1):]
    dt = dt_ref[0, 0]

    def window(a, b, c):
        return jnp.concatenate(
            [a[-PAD:, :wtp], b[:, :wtp], c[:PAD, :wtp]], axis=0)

    fields = []
    for k in range(n_fields + 1):
        a, b, c = ins[3 * k], ins[3 * k + 1], ins[3 * k + 2]
        fields.append(window(a[:], b[:], c[:]))

    Up = Cons(*fields[:4])
    Mp = fields[4] > 0.5

    # Negative result: gating the positivity contraction rounds and the
    # HLLE fallback behind per-band any(bad) scalar conds (the reference's
    # early-exit, tau_hypersonic_cuda.cu:373-398) looked like free
    # arithmetic removal for the clean bands but MEASURED 28% SLOWER on
    # hardware (159 vs 222 steps/s at 2048^2, band=16): Mosaic keeps both
    # branch states live across the cond (the kernel needed a 64M VMEM
    # limit raise just to compile) and the bands lose software pipelining,
    # costing more than the skipped vector work saves.  Straight-line
    # dataflow stays.
    out = h2.step_core_padded(cfg, Up, Mp, dt)
    for o_ref, val in zip(outs, out):
        o_ref[:] = val


def pick_tile_width(W: int, band: int, itemsize: int = 4) -> int:
    """Widest divisor of W (halved repeatedly) whose halo tile fits the
    16MB scoped VMEM with the core's ~90 live band temporaries.  The
    untiled threshold (15M in formula terms) is empirically validated at
    2048x16xf32; tiling adds 128-multiple junk columns and was measured
    22% over the formula, hence the tighter 13M tiled threshold."""
    wt = W
    while (band + 2 * PAD) * (wt + 2 * PAD) * itemsize * 90 > (
            15_000_000 if wt == W else 13_000_000):
        if wt % 2 or wt // 2 < 256:
            raise ValueError(
                f"band={band} x width={W} cannot be x-tiled to fit the VMEM "
                "budget (need a power-of-two-divisible width or a smaller "
                "band >= 8); use the XLA path")
        wt //= 2
    if wt != W and wt % 128:
        # Mosaic requires the trailing block dim to be a 128 multiple
        # (or the whole array), so a partial-width tile must be x128
        raise ValueError(
            f"x-tile width {wt} for nx={W} is not a multiple of 128; "
            "pick a 128-multiple grid width or use the XLA path")
    return wt


def make_step_pallas(cfg: h2.Hypersonic2DConfig, band: int = 16,
                     interpret: bool = False, tile_w: int | None = None):
    """Build the fused step. `band` = rows per grid step (multiple of 8);
    `tile_w` = columns per grid step (default: widest fit — see module
    docstring)."""
    H, W = cfg.ny, cfg.nx
    if H % band:
        raise ValueError(f"ny={H} must be divisible by band={band}")
    itemsize = jnp.dtype(cfg.jax_dtype).itemsize
    Wt = pick_tile_width(W, band, itemsize) if tile_w is None else tile_w
    if W % Wt:
        raise ValueError(f"nx={W} must be divisible by tile_w={Wt}")
    n_bands = H // band
    n_tiles = W // Wt
    Wtp = Wt + 2 * PAD
    # stored tile width: Mosaic needs the trailing block dim to be a
    # multiple of 128 (or the whole array); the excess columns are junk
    Wts = Wtp if n_tiles == 1 else -(-Wtp // 128) * 128
    n_fields = 4

    in_specs = []
    for _k in range(n_fields + 1):
        for off in range(3):
            in_specs.append(
                pl.BlockSpec((band, Wts),
                             functools.partial(lambda i, j, o: (i + o, j),
                                               o=off),
                             memory_space=pltpu.VMEM)
            )
    dt_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                           memory_space=pltpu.SMEM)
    out_specs = [
        pl.BlockSpec((band, Wt), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM)
        for _ in range(n_fields)
    ]

    call = pl.pallas_call(
        functools.partial(_band_kernel, cfg, n_fields, Wtp),
        grid=(n_bands, n_tiles),
        in_specs=[dt_spec] + in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((H, W), cfg.jax_dtype)
                   for _ in range(n_fields)],
        interpret=interpret,
    )

    infl = e2.prim_to_cons(h2._inflow(cfg), cfg.gamma)
    ypad = band  # BC rows extended to a whole band (extra rows never read)

    def tile_layout(f):
        """Re-lay a BC-padded (Hp, W + 2*PAD) field as n_tiles x-tiles that
        each carry their own halo-2 columns (zero-padded to the stored
        width Wts), concatenated to (Hp, n_tiles * Wts) so Blocked x
        indexing is exact."""
        if n_tiles == 1:
            return f
        tiles = [f[:, j * Wt:(j + 1) * Wt + 2 * PAD] for j in range(n_tiles)]
        if Wts > Wtp:
            tiles = [jnp.pad(t, ((0, 0), (0, Wts - Wtp))) for t in tiles]
        return jnp.concatenate(tiles, axis=1)

    def pad_field(f, left_val):
        """Single fused pad: y edge-clamp extended to `band` rows, x right
        edge copy (outflow), x left inflow constant — the pad_bc semantics
        (hypersonic2d.pad_bc) in one materialization."""
        f = jnp.pad(f, ((ypad, ypad), (0, PAD)), mode="edge")
        left = jnp.full((f.shape[0], PAD), left_val, f.dtype)
        return tile_layout(jnp.concatenate([left, f], axis=1))

    def core(U: Cons, mask, dt) -> Cons:
        """pad_bc + step_core_padded, fused (the exchangeable engine of
        h2.step — same signature contract as the XLA default)."""
        dt_arr = jnp.reshape(dt, (1, 1))
        padded = [pad_field(f, v) for f, v in zip(U, infl)]
        mf = jnp.pad(mask.astype(cfg.jax_dtype), ((ypad, ypad), (0, 0)),
                     mode="edge")
        mf = tile_layout(jnp.pad(mf, ((0, 0), (PAD, PAD)),
                                 mode="constant"))
        padded.append(mf)

        args = [dt_arr]
        for f in padded:
            args.extend([f, f, f])
        rho, mx, my, E = call(*args)
        return Cons(rho=rho, mx=mx, my=my, E=E)

    def step(s: h2.Hypersonic2DState) -> h2.Hypersonic2DState:
        return h2.step(cfg, s, core=core)

    step.core = core
    return step


def make_core_pallas(cfg: h2.Hypersonic2DConfig, band: int = 16,
                     interpret: bool = False, tile_w: int | None = None):
    """The fused-kernel cell-update engine alone: (U, mask, dt) -> Cons.
    Plug into h2.step(..., core=...) — including on the halo-extended
    slabs of the sharded runners (the kernel's own BC padding only touches
    the cropped halo region there, exactly like pad_bc)."""
    return make_step_pallas(cfg, band, interpret, tile_w).core


def step_pallas(cfg, s, band: int = 16, interpret: bool = False,
                tile_w: int | None = None):
    return make_step_pallas(cfg, band, interpret, tile_w)(s)


def run_pallas(cfg, s, n_steps: int, band: int = 16,
               interpret: bool = False, tile_w: int | None = None):
    from ..core.stepper import scan_steps

    step = make_step_pallas(cfg, band, interpret, tile_w)
    return scan_steps(step, s, n_steps)
