"""Whole-solve-resident K-step kernel for 2-D viscous Burgers.

Behavioral spec: tau_burgers.cu (flux kernels :364-455, update :458-487,
viscosity :490-525, tau clock do_step :677-718) — the SAME update as
solvers.burgers.step, K steps per kernel launch.

Why residency: after the decoded-shift fix halved the asinh-codec count,
the remaining per-step cost is the codec + flux arithmetic threaded
through XLA's pass structure; at 512x512 the whole (phi_u, phi_v) state
is 2 MB, so it fits in VMEM.  One kernel launch loads the state once,
runs K full steps (grid=() — periodic wraps are EXACT pltpu.rolls, the
per-step global CFL max is the exact global max; no ghost-creep
approximation anywhere), and writes once.  The physics body is
solvers.burgers.step_fields itself, parameterized by the shift primitive
— one source of truth for both engines (scaffold:
kernels/resident_multistep.py).
"""

from __future__ import annotations

from ..solvers import burgers as bg
from .resident_multistep import make_resident_multistep

__all__ = ["make_multistep_pallas", "run_multistep", "resident_eligible"]

# conservative VMEM budget: 2-field state + carry + flux working set
_MAX_CELLS = 3 * 1024 * 1024


def resident_eligible(cfg: bg.BurgersConfig) -> bool:
    return (cfg.dtype == "float32" and cfg.nx % 128 == 0
            and cfg.nx * cfg.ny <= _MAX_CELLS and not cfg.colehopf)


def make_multistep_pallas(cfg: bg.BurgersConfig, k: int = 16,
                          interpret: bool = False):
    """Build superstep(state) -> state advancing k steps entirely in VMEM.

    Requires f32, nx % 128 == 0, nx*ny <= 3M cells, not colehopf mode."""
    if not resident_eligible(cfg):
        raise ValueError(
            "resident kernel requires float32, nx % 128 == 0, "
            f"nx*ny <= {_MAX_CELLS} and colehopf=False; got nx={cfg.nx} "
            f"ny={cfg.ny} dtype={cfg.dtype} colehopf={cfg.colehopf}")

    def body(fields, t, shift):
        phi_u, phi_v = fields
        # Mosaic has no sinh/asinh lowering; the cancellation-free
        # tanh/log1p forms are a few-ulp substitute (solvers.burgers)
        return bg.step_fields(cfg, phi_u, phi_v, t, shift=shift,
                              codec=(bg.sinh_mosaic, bg.asinh_mosaic))

    sup = make_resident_multistep(body, 2, (cfg.ny, cfg.nx), cfg.jax_dtype,
                                  cfg.dtau, k, interpret)

    def superstep(s: bg.BurgersState) -> bg.BurgersState:
        t, tau, phi_u, phi_v = sup(s.t, s.tau, s.phi_u, s.phi_v)
        return bg.BurgersState(phi_u=phi_u, phi_v=phi_v, t=t, tau=tau)

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
        s = scan_steps(lambda st: bg.step(cfg, st), s, rem)
    return s
