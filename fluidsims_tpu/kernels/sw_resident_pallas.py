"""Whole-solve-resident K-step kernel for shallow water.

Behavioral spec: tau_shallow_water.cu (hll_x :327-358, hll_y :360-392,
update_kernel :474-513, viscosity_uv :516-547, tau clock :673-692) — the
SAME update as solvers.shallow_water.step, K steps per kernel launch.

Why residency: at the 512x512 reference default the measured rate sits at
no single bound — ~30% of HBM, ~30% of the vector-issue ceiling
(BASELINE.md roofline) — i.e. XLA's per-step pass structure materializes
intermediates and pays glue.  The whole state is 3 MB, so ALL of it fits
in VMEM: one kernel launch loads (sigma, u, v) once, runs K full steps
(grid=() — no banding, so periodic wraps are EXACT pltpu.rolls and the
per-step global CFL max is the exact global max; no ghost-creep
approximation anywhere), and writes once.  The physics body is
solvers.shallow_water.step_fields itself, parameterized by the shift
primitive — one source of truth for both engines (scaffold:
kernels/resident_multistep.py).
"""

from __future__ import annotations

from ..solvers import shallow_water as sw
from .resident_multistep import make_resident_multistep

__all__ = ["make_multistep_pallas", "run_multistep", "resident_eligible"]

# conservative VMEM budget: state + double-buffered carry + HLL working set
_MAX_CELLS = 2 * 1024 * 1024


def resident_eligible(cfg: sw.ShallowWaterConfig) -> bool:
    return (cfg.dtype == "float32" and cfg.nx % 128 == 0
            and cfg.nx * cfg.ny <= _MAX_CELLS)


def make_multistep_pallas(cfg: sw.ShallowWaterConfig, k: int = 16,
                          interpret: bool = False):
    """Build superstep(state) -> state advancing k steps entirely in VMEM.

    Requires f32, nx % 128 == 0, nx*ny <= 2M cells (VMEM residency)."""
    if not resident_eligible(cfg):
        raise ValueError(
            "resident kernel requires float32, nx % 128 == 0 and "
            f"nx*ny <= {_MAX_CELLS}; got nx={cfg.nx} ny={cfg.ny} "
            f"dtype={cfg.dtype}")

    def body(fields, t, shift):
        sigma, u, v = fields
        return sw.step_fields(cfg, sigma, u, v, t, shift=shift)

    sup = make_resident_multistep(body, 3, (cfg.ny, cfg.nx), cfg.jax_dtype,
                                  cfg.dtau, k, interpret)

    def superstep(s: sw.ShallowWaterState) -> sw.ShallowWaterState:
        t, tau, sig, u, v = sup(s.t, s.tau, s.sigma, s.u, s.v)
        return sw.ShallowWaterState(sigma=sig, u=u, v=v, t=t, tau=tau)

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
