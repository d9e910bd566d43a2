"""Fused Pallas TPU kernel for the Gray–Scott update.

Measured ~15.6 Gcell-steps/s at 2048^2 f32 on one v5e chip with chained
100-step scans — statistically equal to the XLA path (~16.2), which is
already at the HBM roofline for this single-pass stencil.  Bit-identical
results; band=64 fits VMEM at 2048-wide grids.  (An earlier "3.8x over
XLA" record compared dispatch-dominated small-chunk measurements.)

One grid step = one row band fully updated in VMEM: reads u,v once (+1-row
halos via adjacent blocks), computes the 5-point periodic Laplacian +
reaction (tau_gray_scott.cu:141-171), writes u,v once — minimal HBM
traffic vs. the roll-based XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers import gray_scott as gs

__all__ = ["make_step_pallas", "run_pallas", "make_multistep_pallas",
           "run_multistep"]


def _kernel(cfg, uA, uB, uC, vA, vB, vC, u_out, v_out):
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)

    def window(a, b, c):
        # rows: 1-halo from the adjacent bands; cols: periodic wrap built
        # into the padded layout (first/last col duplicated on host)
        return jnp.concatenate([a[-1:, :], b[:, :], c[:1, :]], axis=0)

    u = window(uA[:], uB[:], uC[:])   # (band+2, W+2)
    v = window(vA[:], vB[:], vC[:])

    def lap(f):
        c = f[1:-1, 1:-1]
        return (f[1:-1, :-2] + f[1:-1, 2:] + f[:-2, 1:-1] + f[2:, 1:-1]
                - 4.0 * c) * inv_dx2

    uc = u[1:-1, 1:-1]
    vc = v[1:-1, 1:-1]
    uvv = uc * vc * vc
    du = cfg.Du * lap(u) - uvv + cfg.feed * (1.0 - uc)
    dv = cfg.Dv * lap(v) + uvv - (cfg.feed + cfg.kill) * vc
    u_out[:] = uc + cfg.dt * du
    v_out[:] = vc + cfg.dt * dv


def make_step_pallas(cfg: gs.GrayScottConfig, band: int = 64,
                     interpret: bool = False):
    H, W = cfg.ny, cfg.nx
    if H % band:
        raise ValueError(f"ny={H} must be divisible by band={band}")
    n_bands = H // band
    Wp = W + 2

    in_specs = []
    for _f in range(2):
        for off in range(3):
            in_specs.append(
                pl.BlockSpec((band, Wp),
                             functools.partial(lambda i, o: (i + o, 0),
                                               o=off),
                             memory_space=pltpu.VMEM)
            )
    out_specs = [
        pl.BlockSpec((band, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(2)
    ]

    call = pl.pallas_call(
        functools.partial(_kernel, cfg),
        grid=(n_bands,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((H, W), cfg.jax_dtype)
                   for _ in range(2)],
        interpret=interpret,
    )

    def pad_periodic(f):
        # x wrap columns + y wrap extended to whole bands
        f = jnp.concatenate([f[:, -1:], f, f[:, :1]], axis=1)
        top = f[-band:, :]
        bot = f[:band, :]
        return jnp.concatenate([top, f, bot], axis=0)

    def step(s: gs.GrayScottState) -> gs.GrayScottState:
        up = pad_periodic(s.u)
        vp = pad_periodic(s.v)
        u2, v2 = call(up, up, up, vp, vp, vp)
        return gs.GrayScottState(u=u2, v=v2)

    return step


def run_pallas(cfg, s, n_steps, band: int = 64, interpret: bool = False):
    from ..core.stepper import scan_steps

    return scan_steps(make_step_pallas(cfg, band, interpret), s, n_steps)


# ---------------------------------------------------------------------------
# K-step temporally-blocked kernel.
#
# The single-step update is HBM-bound (≈80% of the measured 320 GB/s:
# BASELINE.md roofline) at only ~18% of the vector-issue ceiling, so the
# one lever left is TRAFFIC, not fusion: run K steps per HBM round trip.
# Each grid band is loaded once into VMEM as a (band + 2K, W + 128) slab
# with wrapped ghost rows/columns, stepped K times entirely in registers/
# VMEM with circular rolls (garbage from the slab edge creeps inward one
# cell per step, so after K steps the interior [K:K+band, 64:64+W] is
# exactly the true periodic solution), and written once.  HBM traffic per
# step drops ~K-fold; the redundant ghost compute is (1 - band*W /
# ((band+2K)(W+128))) ≈ 13-30%.  feed/kill ride in SMEM so interactive
# nudges reuse one compiled kernel.  K <= 64 (column ghosts) and
# K <= band (row halo view) are required; rolls verified bitwise vs
# jnp.roll on hardware.
# ---------------------------------------------------------------------------

_CG = 64   # wrapped ghost columns per side (keeps width a lane multiple)


def _ms_kernel(cfg, k, band, W, feed_ref, kill_ref, uA, uB, uC, vA, vB, vC,
               u_out, v_out):
    import jax.lax as lax

    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)
    feed = feed_ref[0, 0]
    kill = kill_ref[0, 0]
    R = band + 2 * k
    C = W + 2 * _CG

    u = jnp.concatenate([uA[-k:, :], uB[:, :], uC[:k, :]], axis=0)
    v = jnp.concatenate([vA[-k:, :], vB[:, :], vC[:k, :]], axis=0)

    def lap(f):
        # same 4-term add order as solvers.gray_scott._laplacian_periodic
        # (right, left, down, up) for bitwise-identical interiors
        right = pltpu.roll(f, C - 1, axis=1)   # f[(x+1) % C]
        left = pltpu.roll(f, 1, axis=1)        # f[(x-1) % C]
        down = pltpu.roll(f, R - 1, axis=0)    # f[(y+1) % R]
        up = pltpu.roll(f, 1, axis=0)          # f[(y-1) % R]
        return (right + left + down + up - 4.0 * f) * inv_dx2

    def body(_t, uv):
        u, v = uv
        uvv = u * v * v
        du = cfg.Du * lap(u) - uvv + feed * (1.0 - u)
        dv = cfg.Dv * lap(v) + uvv - (feed + kill) * v
        return (u + cfg.dt * du, v + cfg.dt * dv)

    u, v = lax.fori_loop(0, k, body, (u, v))
    u_out[:, :] = u[k:k + band, _CG:_CG + W]
    v_out[:, :] = v[k:k + band, _CG:_CG + W]


def make_multistep_pallas(cfg: gs.GrayScottConfig, k: int = 16,
                          band: int | None = None,
                          interpret: bool = False):
    """Build superstep(state, feed, kill) -> state advancing k steps.

    Requires nx % 128 == 0, ny % band == 0, k <= min(band, 64), f32.
    feed/kill are traced scalars (SMEM)."""
    H, W = cfg.ny, cfg.nx
    if W % 128:
        raise ValueError(f"nx={W} must be a multiple of 128")
    if band is None:
        # 256 first: the hardware-measured 1.94x config at 2048^2 is
        # (k=16, band=256); larger bands buy little (the ghost-column
        # overhead is width-fixed) and compile slower
        band = next((b for b in (256, 512, 128, 64, 32, 16)
                     if H % b == 0 and b >= k), None)
        if band is None:
            raise ValueError(f"no valid band for ny={H}, k={k}")
    if H % band or k > band or k > _CG:
        raise ValueError(
            f"need ny % band == 0 and k <= min(band, {_CG}); "
            f"got ny={H} band={band} k={k}")
    n_bands = H // band
    Wp = W + 2 * _CG

    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [scal, scal]
    for _f in range(2):
        for off in range(3):
            in_specs.append(
                pl.BlockSpec((band, Wp),
                             functools.partial(lambda i, o: (i + o, 0),
                                               o=off),
                             memory_space=pltpu.VMEM))
    out_specs = [
        pl.BlockSpec((band, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(2)
    ]

    call = pl.pallas_call(
        functools.partial(_ms_kernel, cfg, k, band, W),
        grid=(n_bands,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((H, W), cfg.jax_dtype)
                   for _ in range(2)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def pad_periodic(f):
        f = jnp.concatenate([f[:, -_CG:], f, f[:, :_CG]], axis=1)
        return jnp.concatenate([f[-band:, :], f, f[:band, :]], axis=0)

    def superstep(s: gs.GrayScottState, feed=None, kill=None):
        fd = jnp.asarray(cfg.feed if feed is None else feed,
                         cfg.jax_dtype).reshape(1, 1)
        kl = jnp.asarray(cfg.kill if kill is None else kill,
                         cfg.jax_dtype).reshape(1, 1)
        up = pad_periodic(s.u)
        vp = pad_periodic(s.v)
        u2, v2 = call(fd, kl, up, up, up, vp, vp, vp)
        return gs.GrayScottState(u=u2, v=v2)

    return superstep


def run_multistep(cfg, s, n_steps, k: int = 16, band: int | None = None,
                  interpret: bool = False, feed=None, kill=None):
    """n_steps = supersteps of k fused steps + an XLA remainder;
    bit-identical to the XLA path."""
    from ..core.stepper import scan_steps

    sup = make_multistep_pallas(cfg, k, band, interpret)
    n_sup, rem = divmod(n_steps, k)
    if n_sup:
        s = scan_steps(lambda st: sup(st, feed=feed, kill=kill), s, n_sup)
    if rem:
        s = scan_steps(lambda st: gs.step(cfg, st, feed=feed, kill=kill),
                       s, rem)
    return s
