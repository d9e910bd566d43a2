"""Fused Pallas TPU kernel for the 3-D hypersonic step.

The XLA dataflow path materializes ~100 full-volume intermediates per step
(three axes of WENO faces, HLLC fluxes, wall mirrors) — HBM traffic bound.
This kernel runs the entire cell update (hypersonic3d.step_core_padded:
WENO -> HLLC + wall mirroring -> update -> repair -> Landau-Teller ->
sponges) on a VMEM-resident z-band, the 3-D analog of the 2-D flagship
kernel (hypersonic2d_pallas.py) and of the reference's 3-D shared-memory
tile (tau_hypersonic_3d_cuda.cu:997-1057, WENO_HALO=3).

Same triple-block trick: Blocked indexing cannot express overlapping
windows, so each field is passed three times (previous/current/next
z-band) and the halo-3 window is assembled with two concats in VMEM.
The kernel body is the shared step_core_padded, so the float64-oracle
test covers this path too (equivalence asserted in
tests/test_pallas_kernels.py).

The state encode/decode, BC-resolved padding, wavespeed max, and the
dtau feedback stay in XLA (elementwise / global-reduction work).

Status: at 64^3 f32 (band=4/tile_y=16), scan-batched 25 steps/dispatch:
525 steps/s vs 369 for the XLA path — 1.42x, bit-identical results.
(Unbatched per-step dispatch costs ~0.8 ms through the device tunnel and
compresses the gap to 283 vs 255; always scan-batch at this grid size.)
Wider y tiles hit the Mosaic helper's complexity limit (see pick_tile_y).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers import hypersonic3d as h3
from ..solvers.hypersonic3d import HALO, PrimT

__all__ = ["make_step_pallas", "run_pallas"]

N_FIELDS = 6  # r, u, v, w, p, ev (+ solid mask handled separately)


def _band_kernel(cfg, typ, solid_box, scal_ref, *refs):
    ins = refs[: 3 * (N_FIELDS + 1)]
    outs = refs[3 * (N_FIELDS + 1):]
    dt = scal_ref[0, 0]
    gain = scal_ref[0, 1]

    def window(a, b, c):
        return jnp.concatenate(
            [a[-HALO:, :typ, :], b[:, :typ, :], c[:HALO, :typ, :]], axis=0)

    fields = []
    for k in range(N_FIELDS + 1):
        a, b, c = ins[3 * k], ins[3 * k + 1], ins[3 * k + 2]
        fields.append(window(a[:], b[:], c[:]))

    qp = PrimT(*fields[:N_FIELDS])
    sp = fields[N_FIELDS] > 0.5

    q1 = h3.step_core_padded(cfg, qp, sp, dt, gain, solid_box=solid_box,
                             sponge_mode="dense")
    for o_ref, val in zip(outs, q1):
        o_ref[:] = val


def pick_tile_y(ny: int, band: int, nxp: int, itemsize: int = 4) -> int:
    """Widest y tile (halved repeatedly, min 8) whose core temporaries fit
    the 16MB scoped VMEM.  The budget `120 live (band+2H)(ty+2H)(nx+2H)
    temporaries <= 8M` is calibrated on hardware at 64^3: band=4/ty=16
    (7.4M) and band=8/ty=8 (6.6M) compile; band=8/ty=16 (10.3M) crashes
    the remote Mosaic helper."""
    ty = ny
    while (band + 2 * HALO) * (ty + 2 * HALO) * nxp * itemsize * 120 \
            > 8_000_000:
        if ty % 2 or ty // 2 < 8:
            raise ValueError(
                f"band={band} x ny={ny} x nxp={nxp} cannot be y-tiled to "
                "fit the VMEM budget; use the XLA path")
        ty //= 2
    return ty


def make_step_pallas(cfg: h3.Hypersonic3DConfig, band: int = 4,
                     interpret: bool = False, tile_y: int | None = None):
    """Build a full step whose cell-update engine is the fused kernel.
    `band` = z planes per grid step (>= HALO, divides nz); `tile_y` = y
    rows per grid step (multiple of 8, divides ny; default widest fit)."""
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    if nz % band:
        raise ValueError(f"nz={nz} must be divisible by band={band}")
    if band < HALO:
        raise ValueError(f"band={band} must be >= {HALO}")
    n_bands = nz // band
    nxp = nx + 2 * HALO
    dtype = cfg.jax_dtype
    itemsize = jnp.dtype(dtype).itemsize
    Ty = pick_tile_y(ny, band, nxp, itemsize) if tile_y is None else tile_y
    if ny % Ty:
        raise ValueError(f"ny={ny} must be divisible by tile_y={Ty}")
    n_ytiles = ny // Ty
    Typ = Ty + 2 * HALO
    # stored tile rows: Mosaic needs the second-to-last block dim to be a
    # multiple of 8 (or the full array); excess rows are junk
    Tys = Typ if n_ytiles == 1 else -(-Typ // 8) * 8

    in_specs = []
    for _k in range(N_FIELDS + 1):
        for off in range(3):
            in_specs.append(
                pl.BlockSpec((band, Tys, nxp),
                             functools.partial(
                                 lambda i, j, o: (i + o, j, 0), o=off),
                             memory_space=pltpu.VMEM)
            )
    scal_spec = pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM)
    out_specs = [
        pl.BlockSpec((band, Ty, nx), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(N_FIELDS)
    ]

    # The static-geometry restrictions (boxed wall flux, sponge slabs)
    # stay DENSE inside the kernel: both slice the lane (x) dimension at
    # unaligned offsets, which Mosaic cannot lower ("result/input offset
    # mismatch on non-concat dimension") — and at nx=64 the whole x axis
    # occupies one 128-lane vector, so a boxed slice saves no vector work
    # anyway.  The XLA path keeps both cuts (solvers/hypersonic3d.py:891).
    kernel_box = "dense"

    call = pl.pallas_call(
        functools.partial(_band_kernel, cfg, Typ, kernel_box),
        grid=(n_bands, n_ytiles),
        in_specs=[scal_spec] + in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((nz, ny, nx), dtype)
                   for _ in range(N_FIELDS)],
        interpret=interpret,
    )

    # z pads extended from HALO to a whole band (extra planes never read)
    zext = band - HALO

    def tile_layout(f):
        """(nzx, ny + 2*HALO, nxp) -> y tiles with their own halos,
        concatenated to (nzx, n_ytiles * Tys, nxp)."""
        if n_ytiles == 1:
            return f
        tiles = [f[:, j * Ty:(j + 1) * Ty + 2 * HALO, :]
                 for j in range(n_ytiles)]
        if Tys > Typ:
            tiles = [jnp.pad(t, ((0, 0), (0, Tys - Typ), (0, 0)))
                     for t in tiles]
        return jnp.concatenate(tiles, axis=1)

    def core(qp, solid_pad, dt, gain):
        """(padded prims, halo-3 solid mask, dt, inflow gain) -> q1.  The
        solid mask is a regular traced input (constant-folded for the
        single-chip static geometry; per-device slabs in the sharded
        path)."""
        scal = jnp.stack([dt.astype(dtype),
                          gain.astype(dtype)]).reshape(1, 2)
        args = [scal]
        for f in qp:
            fe = tile_layout(
                jnp.pad(f, ((zext, zext), (0, 0), (0, 0)), mode="edge"))
            args.extend([fe, fe, fe])
        sf = tile_layout(jnp.pad(solid_pad.astype(dtype),
                                 ((zext, zext), (0, 0), (0, 0)),
                                 mode="edge"))
        args.extend([sf, sf, sf])
        return PrimT(*call(*args))

    solid_pad_j = jnp.asarray(np.asarray(h3.build_solid(cfg, pad=HALO)))

    def step(s: h3.Hypersonic3DState) -> h3.Hypersonic3DState:
        return h3.step(cfg, s, solid_pad=solid_pad_j, core=core)

    step.core = core
    return step


def pick_band(nz: int) -> int:
    """Largest divisor of nz that is >= HALO and <= 8 (the calibrated
    sweet spot)."""
    for b in (8, 7, 6, 5, 4, 3):
        if nz % b == 0:
            return b
    raise ValueError(f"nz={nz} has no band divisor in [3, 8]")


def make_core_pallas(cfg: h3.Hypersonic3DConfig, band: int | None = None,
                     interpret: bool = False, tile_y: int | None = None):
    """The fused-kernel cell-update engine alone:
    (padded prims, solid_pad, dt, gain) -> q1.  Plug into
    h3.step(..., core=...) — including on the halo-extended z-slabs of the
    sharded runner (pass a cfg with nz = local slab depth)."""
    band = pick_band(cfg.nz) if band is None else band
    return make_step_pallas(cfg, band, interpret, tile_y).core


def run_pallas(cfg, s, n_steps: int, band: int = 4,
               interpret: bool = False, tile_y: int | None = None):
    from ..core.stepper import scan_steps

    return scan_steps(make_step_pallas(cfg, band, interpret, tile_y),
                      s, n_steps)
