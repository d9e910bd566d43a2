"""Whole-solve-resident K-step kernel for shallow water.

Behavioral spec: tau_shallow_water.cu (hll_x :327-358, hll_y :360-392,
update_kernel :474-513, viscosity_uv :516-547, tau clock :673-692) — the
SAME update as solvers.shallow_water.step, K steps per kernel launch.

Why residency: at the 512x512 reference default the measured rate sits at
no single bound — ~30% of HBM, ~30% of the vector-issue ceiling
(BASELINE.md roofline) — i.e. XLA's per-step pass structure materializes
intermediates and pays glue.  The whole state is 3 MB, so ALL of it fits
in VMEM: this kernel loads (sigma, u, v) once, runs K full steps in VMEM
(grid=() — one invocation, no banding, so periodic wraps are EXACT
pltpu.rolls and the per-step global CFL max is the exact global max, no
ghost-creep approximation anywhere), and writes once.  The physics body
is solvers.shallow_water.step_fields itself, parameterized by the shift
primitive — one source of truth for both engines.

The t/tau clock scalars ride in SMEM and are advanced inside the loop
(dt = min(t*dtau, CFL*min(dx,dy)/cmax) depends on t per step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers import shallow_water as sw

__all__ = ["make_multistep_pallas", "run_multistep", "resident_eligible"]

# conservative VMEM budget: state + double-buffered carry + HLL working set
_MAX_CELLS = 2 * 1024 * 1024


def resident_eligible(cfg: sw.ShallowWaterConfig) -> bool:
    return (cfg.dtype == "float32" and cfg.nx % 128 == 0
            and cfg.nx * cfg.ny <= _MAX_CELLS)


def _kernel(cfg, k, t_ref, tau_ref, sig_in, u_in, v_in,
            sig_out, u_out, v_out, t_out, tau_out):
    import jax.lax as lax

    H, W = cfg.ny, cfg.nx

    def shift(f, dy, dx):
        # S[y, x] = f[(y+dy) % H, (x+dx) % W], matching ops.shift.
        # pltpu.roll(f, s, axis)[i] = f[(i - s) % n]; shifts must be >= 0.
        if dx:
            f = pltpu.roll(f, (-dx) % W, axis=1)
        if dy:
            f = pltpu.roll(f, (-dy) % H, axis=0)
        return f

    def body(_i, carry):
        sig, u, v, t, tau = carry
        sig2, u2, v2 = sw.step_fields(cfg, sig, u, v, t, shift=shift)
        t2 = t * jnp.exp(jnp.asarray(cfg.dtau, t.dtype))
        return (sig2, u2, v2, t2, tau + jnp.asarray(cfg.dtau, tau.dtype))

    sig, u, v, t, tau = lax.fori_loop(
        0, k, body,
        (sig_in[:, :], u_in[:, :], v_in[:, :], t_ref[0, 0], tau_ref[0, 0]))
    sig_out[:, :] = sig
    u_out[:, :] = u
    v_out[:, :] = v
    t_out[0, 0] = t
    tau_out[0, 0] = tau


def make_multistep_pallas(cfg: sw.ShallowWaterConfig, k: int = 16,
                          interpret: bool = False):
    """Build superstep(state) -> state advancing k steps entirely in VMEM.

    Requires f32, nx % 128 == 0, nx*ny <= 2M cells (VMEM residency)."""
    if not resident_eligible(cfg):
        raise ValueError(
            "resident kernel requires float32, nx % 128 == 0 and "
            f"nx*ny <= {_MAX_CELLS}; got nx={cfg.nx} ny={cfg.ny} "
            f"dtype={cfg.dtype}")
    H, W = cfg.ny, cfg.nx

    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    field = pl.BlockSpec(memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(_kernel, cfg, k),
        in_specs=[scal, scal, field, field, field],
        out_specs=[field, field, field, scal, scal],
        out_shape=[
            jax.ShapeDtypeStruct((H, W), cfg.jax_dtype),
            jax.ShapeDtypeStruct((H, W), cfg.jax_dtype),
            jax.ShapeDtypeStruct((H, W), cfg.jax_dtype),
            jax.ShapeDtypeStruct((1, 1), cfg.jax_dtype),
            jax.ShapeDtypeStruct((1, 1), cfg.jax_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def superstep(s: sw.ShallowWaterState) -> sw.ShallowWaterState:
        sig, u, v, t, tau = call(
            s.t.reshape(1, 1), s.tau.reshape(1, 1), s.sigma, s.u, s.v)
        return sw.ShallowWaterState(sigma=sig, u=u, v=v,
                                    t=t[0, 0], tau=tau[0, 0])

    return superstep


def run_multistep(cfg, s, n_steps, k: int = 16, interpret: bool = False):
    """n_steps = supersteps of k fused steps + an XLA remainder; equal to
    the XLA path to f32 transcendental/FMA ulps."""
    from ..core.stepper import scan_steps

    sup = make_multistep_pallas(cfg, k, interpret)
    n_sup, rem = divmod(n_steps, k)
    if n_sup:
        s = scan_steps(sup, s, n_sup)
    if rem:
        s = scan_steps(lambda st: sw.step(cfg, st), s, rem)
    return s
