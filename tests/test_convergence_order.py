"""Order-of-accuracy gate for the flagship MUSCL-Hancock solver.

A smooth density pulse in a uniform subsonic (u, p) base flow is an exact
contact solution of the Euler equations: u and p stay constant and rho
advects at u.  Refining 100 -> 200 -> 400 cells (fixed final time; steps
scale with resolution since dt ~ dx/|u+c|) must show ~2nd-order L1
convergence — the design order of the MUSCL-Hancock predictor
(tau_hypersonic_cuda.cu:849-962).  The reference has no such gate; its
fidelity check is snapshot self-consistency only
(tau_hypersonic_cuda_tests.cu:534-557).

Measured rates: 1.81-1.92 per refinement (limiter clipping at the pulse
extremum costs the remainder to 2.0).
"""

import jax.numpy as jnp
import numpy as np

from fluidsims_tpu.ops import euler2d as e2
from fluidsims_tpu.solvers import hypersonic2d as h2

GAMMA = 1.4
MACH = 0.1  # subsonic: the pulse must advect much slower than sound


def _run_pulse(nx, steps):
    ny = 4
    cfg = h2.Hypersonic2DConfig(
        nx=nx, ny=ny, gamma=GAMMA, cfl=0.4,
        visc_nu=0.0, visc_rho=0.0, visc_e=0.0, inflow_mach=MACH,
        geom_x0=-1e6, geom_cy=ny / 2, geom_Rb=ny / 12, geom_Rn=ny / 24,
        dtype="float64",
    )
    mask = h2.build_mask(cfg)
    dt64 = cfg.jax_dtype
    # base flow = the inflow state (rho=1, p=1, u=M*sqrt(gamma)) so the
    # left x-pad matches and injects no boundary wave
    u0 = MACH * np.sqrt(GAMMA)
    x = (np.arange(nx) + 0.5) / nx
    w = 0.08
    rho0 = 1.0 + 0.2 * np.exp(-(((x - 0.3) / w) ** 2))
    rho = jnp.asarray(np.tile(rho0, (ny, 1)), dt64)
    U = e2.prim_to_cons(
        e2.Prim(rho, jnp.full((ny, nx), u0, dt64),
                jnp.zeros((ny, nx), dt64), jnp.ones((ny, nx), dt64)),
        GAMMA,
    )
    s = h2.Hypersonic2DState(U=U, mask=mask, t=jnp.asarray(0.0, dt64))
    s = h2.run(cfg, s, steps)
    t_end = float(s.t)

    q = e2.cons_to_prim(s.U, GAMMA)
    rho_n = np.asarray(q.rho)[2]
    u_n = np.asarray(q.u)[2]
    p_n = np.asarray(q.p)[2]
    # exact: the pulse translated by u0*t (solver dx = 1 cell)
    xc = np.arange(nx) + 0.5
    rho_e = 1.0 + 0.2 * np.exp(
        -((((xc - u0 * t_end) / nx) - 0.3) / w) ** 2)
    err = np.abs(rho_n - rho_e).mean()
    # u and p must stay uniform to tight tolerance (exact contact)
    upert = np.abs(u_n - u0).max()
    ppert = np.abs(p_n - 1.0).max()
    return err, upert, ppert


def test_contact_advection_is_second_order():
    # measured: 1.12e-4 / 3.20e-5 / 8.81e-6 -> rates 1.81, 1.86
    e100, up100, pp100 = _run_pulse(100, 40)
    e200, _, _ = _run_pulse(200, 80)
    e400, _, _ = _run_pulse(400, 160)
    rate1 = np.log2(e100 / e200)
    rate2 = np.log2(e200 / e400)
    assert e100 < 3e-4
    assert rate1 > 1.7, f"order fell to {rate1:.2f} (100->200)"
    assert rate2 > 1.7, f"order fell to {rate2:.2f} (200->400)"
    # pressure/velocity perturbations stay at the scheme's round-off scale
    assert up100 < 1e-3 and pp100 < 1e-3
