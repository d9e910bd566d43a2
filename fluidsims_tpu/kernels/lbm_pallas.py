"""Pallas TPU kernels for the D2Q9 collide+stream update.

Two kernels:

* ``make_step_pallas`` — ONE grid step per HBM round trip (moments, BGK
  collision, pull-streaming and on-link bounce-back of tau_lbm.cu:94-132
  via the pull formulation of solvers/lbm.py, fused in VMEM).  Status:
  the XLA dataflow path measures ~2500 MLUPS at 2048x1024 f32 — at the
  HBM roofline for the 9-direction pattern — so a single-step fused
  kernel cannot beat it (this one measured 219 MLUPS triple-block /
  857 MLUPS banded).  Verified bit-identical to the dense step; retained
  as the reference Pallas formulation.

* ``make_multistep_pallas`` — the round-3 engine: K steps per HBM round
  trip (temporal blocking).  Because the single-step bound is TRAFFIC,
  the remaining lever is running block_k steps per VMEM residency: each
  row band is loaded once as a 9-field (band + 2K, W + 128) slab with
  wrapped ghost rows/columns, stepped K times entirely in VMEM (garbage
  from the slab edge creeps inward one cell per step — the D2Q9 stencil
  radius is 1 — so after K steps the interior [K:K+band, 64:64+W] is
  exactly the true solution), and written once.  HBM traffic per step
  drops ~K-fold.

Correctness of the wrapped-y ghosts in the multistep kernel: the grid is
NOT y-periodic, but the XLA step's y handling (shift_axis_wrapped + oob
mask, solvers/lbm.py:129-138) coincides with plain wrapping BECAUSE rows
0 and ny-1 are always walls (build_solid, tau_lbm.cu:84-87): a wrapped
read lands on a solid row and triggers the same on-link bounce-back the
oob mask would.  The solid mask rides in the slab (wrapped the same
way), so walls also stop the garbage creep dead at the domain edges.
``drive`` rides in SMEM so interactive +/- nudges (tau_lbm.cu:281-286)
reuse one compiled kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers import lbm

__all__ = ["make_step_pallas", "run_pallas", "make_multistep_pallas",
           "run_multistep"]


def _kernel(cfg, fA, fB, fC, sA, sB, sC, out_ref):
    def window(a, b, c):
        return jnp.concatenate([a[..., -1:, :], b[...], c[..., :1, :]],
                               axis=-2)

    f = window(fA[:], fB[:], fC[:])          # (9, band+2, W+2)
    solid = window(sA[:], sB[:], sC[:]) > 0.5  # (band+2, W+2)

    rho = jnp.sum(f, axis=0)
    # per-direction scalar weights (avoid captured constant arrays, which
    # pallas_call rejects)
    ux = sum(float(lbm.EX[q]) * f[q] for q in range(9) if lbm.EX[q])
    uy = sum(float(lbm.EY[q]) * f[q] for q in range(9) if lbm.EY[q])
    rho = jnp.maximum(rho, 1e-6)
    ux = ux / rho + cfg.drive
    uy = uy / rho
    omega = 1.0 / cfg.tau

    post = [f[q] - omega * (f[q] - lbm.feq(q, rho, ux, uy))
            for q in range(9)]

    def shift2(a, dy, dx):
        """Interior-shaped view of the window at domain offset (-dy, -dx):
        element (y, x) = window value at domain (y-dy, x-dx)."""
        ys = slice(1 - dy, 1 - dy + a.shape[-2] - 2)
        xs = slice(1 - dx, 1 - dx + a.shape[-1] - 2)
        return a[..., ys, xs]

    outs = []
    for q in range(9):
        exq, eyq = int(lbm.EX[q]), int(lbm.EY[q])
        opp = int(lbm.OPP[q])
        src_post = shift2(post[q], eyq, exq)   # upstream cell (y-ey, x-ex)
        src_solid = shift2(solid, eyq, exq)
        center_post_opp = shift2(post[opp], 0, 0)
        center_f_opp = shift2(f[opp], 0, 0)
        center_solid = shift2(solid, 0, 0)
        streamed = jnp.where(src_solid, center_post_opp, src_post)
        outs.append(jnp.where(center_solid, center_f_opp, streamed))

    for q in range(9):
        out_ref[q] = outs[q]


def make_step_pallas(cfg: lbm.LBMConfig, band: int = 32,
                     interpret: bool = False):
    H, W = cfg.ny, cfg.nx
    if H % band:
        raise ValueError(f"ny={H} must be divisible by band={band}")
    n_bands = H // band
    Wp = W + 2

    def fspec(off):
        return pl.BlockSpec((9, band, Wp),
                            functools.partial(lambda i, o: (0, i + o, 0),
                                              o=off),
                            memory_space=pltpu.VMEM)

    def sspec(off):
        return pl.BlockSpec((band, Wp),
                            functools.partial(lambda i, o: (i + o, 0),
                                              o=off),
                            memory_space=pltpu.VMEM)

    in_specs = [fspec(0), fspec(1), fspec(2), sspec(0), sspec(1), sspec(2)]
    out_specs = pl.BlockSpec((9, band, W), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(_kernel, cfg),
        grid=(n_bands,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((9, H, W), cfg.jax_dtype),
        interpret=interpret,
    )

    def pad_all(f):
        # x periodic wrap columns; y extended by a whole band of edge copies
        # (only the adjacent halo row is ever read, and the channel walls
        # gate it)
        f = jnp.concatenate([f[..., -1:], f, f[..., :1]], axis=-1)
        return jnp.concatenate(
            [jnp.repeat(f[..., :1, :], band, axis=-2), f,
             jnp.repeat(f[..., -1:, :], band, axis=-2)], axis=-2)

    def step(s: lbm.LBMState) -> lbm.LBMState:
        fp = pad_all(s.f)
        sp = pad_all(s.solid.astype(s.f.dtype))
        out = call(fp, fp, fp, sp, sp, sp)
        return lbm.LBMState(f=out, solid=s.solid)

    return step


def run_pallas(cfg, s, n_steps, band: int = 32, interpret: bool = False):
    from ..core.stepper import scan_steps

    return scan_steps(make_step_pallas(cfg, band, interpret), s, n_steps)


# ---------------------------------------------------------------------------
# K-step temporally-blocked kernel (see module docstring).
# ---------------------------------------------------------------------------

_CG = 64   # wrapped ghost columns per side (keeps width a lane multiple)


def _ms_kernel(cfg, k, band, W, drive_ref, fA, fB, fC, sA, sB, sC, f_out):
    import jax.lax as lax

    drive = drive_ref[0, 0]
    omega = 1.0 / cfg.tau
    R = band + 2 * k
    C = W + 2 * _CG

    f0 = tuple(
        jnp.concatenate([fA[q, -k:, :], fB[q, :, :], fC[q, :k, :]], axis=0)
        for q in range(9)
    )
    solid = jnp.concatenate([sA[-k:, :], sB[:, :], sC[:k, :]], axis=0)
    is_solid = solid > 0.5

    def pull(a, exq, eyq):
        # S[y, x] = a[(y - ey) % R, (x - ex) % C]: the upstream cell.
        # pltpu.roll(a, s, axis)[i] = a[(i - s) % n]; shifts must be >= 0.
        if exq:
            a = pltpu.roll(a, exq % C, axis=1)
        if eyq:
            a = pltpu.roll(a, eyq % R, axis=0)
        return a

    # loop-invariant: which upstream links are walls, per direction
    src_is_solid = tuple(
        pull(solid, int(lbm.EX[q]), int(lbm.EY[q])) > 0.5
        for q in range(1, 9)
    )

    def body(_t, f):
        rho = f[0] + f[1] + f[2] + f[3] + f[4] + f[5] + f[6] + f[7] + f[8]
        rho = jnp.maximum(rho, 1e-6)
        ux = (f[1] - f[3] + f[5] - f[6] - f[7] + f[8]) / rho + drive
        uy = (f[2] - f[4] + f[5] + f[6] - f[7] - f[8]) / rho

        post = tuple(
            f[q] - omega * (f[q] - lbm.feq(q, rho, ux, uy))
            for q in range(9)
        )

        out = [jnp.where(is_solid, f[0], post[0])]   # q=0: rest packet
        for q in range(1, 9):
            opp = int(lbm.OPP[q])
            src = pull(post[q], int(lbm.EX[q]), int(lbm.EY[q]))
            streamed = jnp.where(src_is_solid[q - 1], post[opp], src)
            out.append(jnp.where(is_solid, f[opp], streamed))
        return tuple(out)

    f = lax.fori_loop(0, k, body, f0)
    for q in range(9):
        f_out[q, :, :] = f[q][k:k + band, _CG:_CG + W]


def band_fits_vmem(W: int, band: int, k: int) -> bool:
    """Conservative scoped-VMEM stack check for the multistep kernel:
    Mosaic's stack holds ~10 copies of the 9-field (band+2k, W+128) f32
    slab (measured 108.6M at band=128, k=8, W=2048 against the ~102M
    scoped limit, which failed; band=64 at 60M ran)."""
    return 10 * 9 * (band + 2 * k) * (W + 2 * _CG) * 4 <= 96 * 1024 * 1024


def make_multistep_pallas(cfg: lbm.LBMConfig, k: int = 8,
                          band: int | None = None,
                          interpret: bool = False):
    """Build superstep(state, drive) -> state advancing k steps.

    Requires nx % 128 == 0, ny % band == 0, k <= min(band, 64), f32.
    `drive` is a traced scalar (SMEM)."""
    H, W = cfg.ny, cfg.nx
    if W % 128:
        raise ValueError(f"nx={W} must be a multiple of 128")
    if band is None:
        band = next((b for b in (128, 64, 32, 16)
                     if H % b == 0 and b >= k
                     and band_fits_vmem(W, b, k)), None)
        if band is None:
            raise ValueError(f"no valid band for ny={H}, k={k}")
    if H % band or k > band or k > _CG:
        raise ValueError(
            f"need ny % band == 0 and k <= min(band, {_CG}); "
            f"got ny={H} band={band} k={k}")
    n_bands = H // band
    Wp = W + 2 * _CG

    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [scal]
    for off in range(3):
        in_specs.append(
            pl.BlockSpec((9, band, Wp),
                         functools.partial(lambda i, o: (0, i + o, 0),
                                           o=off),
                         memory_space=pltpu.VMEM))
    for off in range(3):
        in_specs.append(
            pl.BlockSpec((band, Wp),
                         functools.partial(lambda i, o: (i + o, 0), o=off),
                         memory_space=pltpu.VMEM))
    out_specs = pl.BlockSpec((9, band, W), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(_ms_kernel, cfg, k, band, W),
        grid=(n_bands,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((9, H, W), cfg.jax_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def pad_periodic(a):
        a = jnp.concatenate([a[..., -_CG:], a, a[..., :_CG]], axis=-1)
        return jnp.concatenate(
            [a[..., -band:, :], a, a[..., :band, :]], axis=-2)

    def superstep(s: lbm.LBMState, drive=None):
        dr = jnp.asarray(cfg.drive if drive is None else drive,
                         cfg.jax_dtype).reshape(1, 1)
        fp = pad_periodic(s.f)
        sp = pad_periodic(s.solid.astype(cfg.jax_dtype))
        f2 = call(dr, fp, fp, fp, sp, sp, sp)
        return lbm.LBMState(f=f2, solid=s.solid)

    return superstep


def run_multistep(cfg, s, n_steps, k: int = 8, band: int | None = None,
                  interpret: bool = False, drive=None):
    """n_steps = supersteps of k fused steps + an XLA remainder; equal to
    the XLA path to f32 FMA-contraction ulps."""
    from ..core.stepper import scan_steps

    sup = make_multistep_pallas(cfg, k, band, interpret)
    n_sup, rem = divmod(n_steps, k)
    if n_sup:
        s = scan_steps(lambda st: sup(st, drive=drive), s, n_sup)
    if rem:
        s = scan_steps(lambda st: lbm.step(cfg, st, drive=drive), s, rem)
    return s
