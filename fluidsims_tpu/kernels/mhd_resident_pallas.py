"""Whole-solve-resident K-step kernel for the GLM-MHD solver.

Behavioral spec: tau_mhd.c (flux_x/flux_y :78-99, hlld_glm_flux :103-127,
face-scatter step :159-176) — the SAME update as solvers.mhd.step, K steps
per kernel launch.

Why residency: at the 320x220 reference default the 7-field state is
~2 MB and the XLA path is bound by per-step pass glue, not by any device
resource (BASELINE.md roofline: "dispatch-latency-bound at the reference
size").  One kernel launch loads the state once, runs K full steps in
VMEM (grid=()), and writes once.

Clamped boundaries without in-kernel clamps: the superstep edge-replicates
each field to (ceil8(ny), ceil128(nx)) before the call.  Inside the
kernel every shift is a pure pltpu.roll on the padded array:

  * a +1 shift at the real edge reads the adjacent pad cell, which holds
    the edge copy — exactly the clamped value;
  * roll wraparound lands only in pad cells, whose fluxes the face-band
    masks zero, so junk never enters the real region;
  * pad cells never update (their face fluxes are masked to zero and the
    psi damp scales them identically to the edge cells they copy), so the
    edge-copy invariant holds for all K steps and the kernel matches the
    XLA path on the real region to f32 FMA/fusion ulps (measured 1e-8
    rho, 8e-6 E over 12 Orszag-Tang steps; the accumulated t and every
    per-step dt are bitwise equal — pad cells duplicate edge-cell
    wavespeeds and duplicates cannot change the global max).

The physics body is solvers.mhd.step_core itself, parameterized by the
shift primitives — one source of truth for both engines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers import mhd

__all__ = ["make_multistep_pallas", "run_multistep", "resident_eligible"]

# Padded-cell bound for whole-solve VMEM residency.  The kernel holds the
# 7-field state three times over (input refs + output refs + fori_loop
# carry) at 4 B/cell, i.e. 84 B/cell before flux temporaries — so 1M cells
# ~= 84 MB against the 100 MB vmem_limit_bytes below; 2M would already
# exceed the limit on inputs+outputs alone (112 MB).
_MAX_CELLS = 1024 * 1024


def _padded_dims(cfg: mhd.MHDConfig):
    Hp = -(-cfg.ny // 8) * 8
    Wp = -(-cfg.nx // 128) * 128
    return Hp, Wp


def resident_eligible(cfg: mhd.MHDConfig) -> bool:
    Hp, Wp = _padded_dims(cfg)
    return cfg.dtype == "float32" and Hp * Wp <= _MAX_CELLS


def make_multistep_pallas(cfg: mhd.MHDConfig, k: int = 16,
                          interpret: bool = False):
    """Build superstep(MHDState) -> MHDState advancing k steps in VMEM."""
    if not resident_eligible(cfg):
        raise ValueError(
            "resident kernel requires float32 and padded nx*ny <= "
            f"{_MAX_CELLS}; got nx={cfg.nx} ny={cfg.ny} dtype={cfg.dtype}")
    H, W = cfg.ny, cfg.nx
    Hp, Wp = _padded_dims(cfg)
    dxdy = (1.0 / W, 1.0 / H)
    dtype = cfg.jax_dtype

    def kernel(*refs):
        t_ref = refs[0]
        f_in = refs[1:8]
        f_out = refs[8:15]
        t_out = refs[15]

        iy = lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
        ix = lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
        # interior face bands on the REAL dims (default_face_masks)
        mx_face = (iy >= 1) & (iy <= H - 2) & (ix >= 1) & (ix <= W - 3)
        my_face = (iy >= 1) & (iy <= H - 3) & (ix >= 1) & (ix <= W - 2)
        zero = jnp.asarray(0.0, dtype)

        def shift(f, dy, dx):
            # S[y, x] = f[y+dy, x+dx] on the padded torus; edge-copy pads
            # make this the clamped read on the real region
            if dx:
                f = pltpu.roll(f, (-dx) % Wp, axis=1)
            if dy:
                f = pltpu.roll(f, (-dy) % Hp, axis=0)
            return f

        def zero_shift_x(fx):
            return jnp.where(ix == 0, zero, pltpu.roll(fx, 1, axis=1))

        def zero_shift_y(fy):
            return jnp.where(iy == 0, zero, pltpu.roll(fy, 1, axis=0))

        def body(_i, carry):
            t, fields = carry
            Un, dt = mhd.step_core(
                cfg, mhd.ConsM(*fields), shift=shift,
                zero_shift_x=zero_shift_x, zero_shift_y=zero_shift_y,
                face_masks=(mx_face, my_face), dxdy=dxdy)
            return (t + dt, tuple(Un))

        t, fields = lax.fori_loop(
            0, k, body, (t_ref[0, 0], tuple(r[:, :] for r in f_in)))
        for r, f in zip(f_out, fields):
            r[:, :] = f
        t_out[0, 0] = t

    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    field = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        in_specs=[scal] + [field] * 7,
        out_specs=[field] * 7 + [scal],
        out_shape=([jax.ShapeDtypeStruct((Hp, Wp), dtype)] * 7
                   + [jax.ShapeDtypeStruct((1, 1), dtype)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def pad(f):
        return jnp.pad(f, ((0, Hp - H), (0, Wp - W)), mode="edge")

    def superstep(s: mhd.MHDState) -> mhd.MHDState:
        out = call(s.t.reshape(1, 1), *(pad(f) for f in s.U))
        U = mhd.ConsM(*(f[:H, :W] for f in out[:7]))
        return mhd.MHDState(U=U, t=out[7][0, 0])

    return superstep


def run_multistep(cfg, s, n_steps, k: int = 16, interpret: bool = False):
    """n_steps = supersteps of k fused steps + an XLA remainder."""
    from ..core.stepper import scan_steps

    sup = make_multistep_pallas(cfg, k, interpret)
    n_sup, rem = divmod(n_steps, k)
    if n_sup:
        s = scan_steps(sup, s, n_sup)
    if rem:
        s = scan_steps(lambda st: mhd.step(cfg, st), s, rem)
    return s
