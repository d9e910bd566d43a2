"""Fused Pallas TPU kernel for the D2Q9 collide+stream update.

One grid step = one row band of the (9, ny, nx) lattice fully updated in
VMEM: moments, BGK collision, pull-streaming and on-link bounce-back
(tau_lbm.cu:94-132 semantics via the pull formulation of solvers/lbm.py)
in a single pass.

Status: the XLA dataflow path measures ~2500 MLUPS at 2048x1024 f32 with
chained 50-step scans (151 MB moved per step -> ~180 GB/s, i.e. at the
HBM roofline), so no fused kernel can beat it — the whole update is one
XLA-fused single-pass op already.  This kernel measures 219 MLUPS
(triple-block reads) and a single-read banded-layout revision measured
857 MLUPS; both kept out of the default path.  Verified bit-identical to
the dense step; retained as the reference Pallas formulation.

The y boundary rows are always solid channel walls (build_solid,
tau_lbm.cu:84-87), so the out-of-bounds pull case of the dense step can
never fire on the rows where it would differ — the banded window with
1-row halos is exact (asserted vs the dense path in
tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers import lbm

__all__ = ["make_step_pallas", "run_pallas"]


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
