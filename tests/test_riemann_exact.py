"""Exact-Riemann (shock tube) analytic gates for the flagship Euler solver.

The reference's only convergence-against-truth harness is Cole-Hopf for
Burgers (tau_burgers.cu:16-19,720-736); it ships no analytic test for its
Euler solvers.  This gate is stricter: the flagship 2-D solver, run as a
1-D shock tube (y-uniform data, viscosity off, obstacle out of domain),
must match the exact self-similar Riemann solution (Toro ch. 4,
tests/oracles/riemann_exact.py).

Setup note: the solver's left x-pad is the inflow state (rho=1, p=1,
u=M*sqrt(gamma), solvers/hypersonic2d.py pad_bc) — with inflow_mach ~ 0
that IS the Sod left state, so the Sod tube runs with exact boundary
states.  The double-rarefaction tube's left state does not match the pad,
so it runs short enough that the boundary transient never reaches the fan
(waves cover < nx/4 cells); its tolerance is loose — it is a
near-vacuum positivity/robustness gate, not a convergence gate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsims_tpu.ops import euler2d as e2
from fluidsims_tpu.solvers import hypersonic2d as h2
from tests.oracles.riemann_exact import sample, solve_star

GAMMA = 1.4


def _tube_cfg(nx, ny=4, cfl=0.4):
    # Obstacle pushed out of the domain (geom_x0 = -1e6 puts the whole SDF
    # at sd > 0) and all explicit viscosity off: pure Euler.
    return h2.Hypersonic2DConfig(
        nx=nx, ny=ny, gamma=GAMMA, cfl=cfl,
        visc_nu=0.0, visc_rho=0.0, visc_e=0.0, inflow_mach=1e-9,
        geom_x0=-1e6, geom_cy=ny / 2.0, geom_Rb=ny / 12.0,
        geom_Rn=ny / 24.0, dtype="float64",
    )


def _run_tube(nx, steps, left, right):
    """Run a y-uniform Riemann problem; return (xi, rho, u, p, t_end)."""
    cfg = _tube_cfg(nx)
    mask = h2.build_mask(cfg)
    assert not bool(np.asarray(mask).any()), "obstacle must be out of domain"
    dt = cfg.jax_dtype
    ny = cfg.ny
    x_half = nx // 2
    sel = (jnp.arange(nx) < x_half)[None, :]

    def f(a, b):
        return jnp.where(sel, a, b).repeat(ny, 0).astype(dt)

    U = e2.prim_to_cons(
        e2.Prim(f(left[0], right[0]), f(left[1], right[1]),
                jnp.zeros((ny, nx), dt), f(left[2], right[2])),
        cfg.gamma,
    )
    s = h2.Hypersonic2DState(U=U, mask=mask, t=jnp.asarray(0.0, dt))
    s = h2.run(cfg, s, steps)
    t_end = float(s.t)
    q = e2.cons_to_prim(s.U, cfg.gamma)
    rho = np.asarray(q.rho)
    # y-uniform data must stay exactly y-uniform (v=0, equal-state y fluxes)
    assert np.abs(rho - rho[ny // 2][None, :]).max() == 0.0
    xi = (np.arange(nx) + 0.5 - x_half) / t_end
    return xi, rho[ny // 2], np.asarray(q.u)[ny // 2], np.asarray(q.p)[ny // 2], t_end


def _rel_l1(num, exact):
    return float(np.abs(num - exact).mean() / np.abs(exact).mean())


def test_star_state_matches_toro():
    # Published star values (Toro table 4.2): Sod and the 123 problem.
    p, u = solve_star(1.0, 0.0, 1.0, 0.125, 0.0, 0.1, GAMMA)
    assert abs(p - 0.30313) < 1e-5 and abs(u - 0.92745) < 1e-5
    p, u = solve_star(1.0, -2.0, 0.4, 1.0, 2.0, 0.4, GAMMA)
    assert abs(p - 0.00189) < 1e-5 and abs(u) < 1e-12


def test_sod_shock_tube_matches_exact():
    left, right = (1.0, 0.0, 1.0), (0.125, 0.0, 0.1)
    xi, rho, u, p, t_end = _run_tube(600, 300, left, right)
    re, ue, pe = sample(xi, *left, *right, GAMMA)
    # waves must stay far from both x boundaries: exact solution still at
    # the initial left/right states in the outer 60 cells
    assert np.abs(re[:60] - left[0]).max() < 1e-12
    assert np.abs(re[-60:] - right[0]).max() < 1e-12
    # MUSCL-Hancock+HLLC at 600 cells: measured rel L1 ~ 0.24% rho,
    # 0.17% p (discontinuity smearing dominates)
    assert _rel_l1(rho, re) < 6e-3
    assert _rel_l1(p, pe) < 5e-3
    assert np.abs(u - ue).mean() < 8e-3
    # the shock (rightmost jump) must sit at the exact shock speed +-2 cells
    p_s, u_s = solve_star(*left, *right, GAMMA)
    a_r = np.sqrt(GAMMA * right[2] / right[0])
    gp, gm = (GAMMA + 1) / (2 * GAMMA), (GAMMA - 1) / (2 * GAMMA)
    s_shock = right[1] + a_r * np.sqrt(gp * p_s / right[2] + gm)
    rho_post = right[0] * ((p_s / right[2] + (GAMMA - 1) / (GAMMA + 1))
                           / ((GAMMA - 1) / (GAMMA + 1) * p_s / right[2] + 1))
    thresh = 0.5 * (right[0] + rho_post)   # halfway up the shock jump
    i_num = np.where(rho > thresh)[0].max()
    assert abs(xi[i_num] - s_shock) * t_end < 2.5


def test_double_rarefaction_positivity_and_symmetry():
    # Symmetric expansion (scaled-down Toro 123): near-vacuum center.
    left, right = (1.0, -0.4, 0.4), (1.0, 0.4, 0.4)
    xi, rho, u, p, t_end = _run_tube(600, 100, left, right)
    assert (rho > 0).all() and (p > 0).all()
    re, ue, pe = sample(xi, *left, *right, GAMMA)
    # The left x-pad (inflow: p=1 vs local 0.4) launches a transient from
    # x=0 that reaches ~25 cells by t~34; compare on the interior window.
    w = slice(100, 500)
    assert _rel_l1(rho[w], re[w]) < 6e-3      # measured 0.23%
    assert _rel_l1(p[w], pe[w]) < 6e-3        # measured 0.25%
    # exact solution is symmetric: u antisymmetric, rho symmetric — and the
    # discrete scheme preserves it to round-off away from the boundaries
    assert np.abs(u[w] + u[::-1][w]).max() < 1e-12
    assert np.abs(rho[w] - rho[::-1][w]).max() < 1e-12


def test_sod_shock_tube_3d_weno_matches_exact():
    """The 3-D WENO5+HLLC solver as a 1-D Sod tube (y/z-uniform, periodic).

    Physics switches: sphere out of domain, sponges off (sponge_n=0),
    Landau-Teller frozen (tau_vib=1e9), vibrational mode frozen out
    (theta_v=1e3 => e_v^eq ~ 0, e_v stays at the 1e-10 seed) — a pure
    gamma-law gas at gamma_floor=1.4.  The left x-pad is the inflow
    primitives (rho=1, u=0, p=1) = the Sod left state; the right
    (transmissive-outflow) boundary relaxes subsonic outlet pressure
    toward inflow_p per the reference (tau_hypersonic_3d_cuda.cu:691-722),
    which launches a left-moving wave from x=1 — the comparison window
    [0.1, 0.8] excludes it (it reaches ~x=0.85 by t~0.1).

    The state clock t = t0*e^(sum dtau) differs from the integrated
    physics time sum(dt) by O(dtau) per step, so the exact solution is
    sampled at the accumulated sum of the per-step dt actually applied.
    """
    import jax
    from jax import lax

    from fluidsims_tpu.solvers import hypersonic3d as h3

    nx, nyz = 256, 4
    cfg = h3.Hypersonic3DConfig(
        nx=nx, ny=nyz, nz=nyz, dx=1.0 / nx, dy=1.0 / nx, dz=1.0 / nx,
        cfl=0.3333, u_ref=10.0, R=1.0, gamma_floor=GAMMA, Twall=0.02,
        tau_vib=1e9, theta_v=1e3,
        sdf_cx=-100.0, sdf_cy=0.5, sdf_cz=0.5, sdf_r=0.25,
        inflow_r=1.0, inflow_p=1.0, inflow_u=0.0,
        sponge_n=0, sponge_out_n=0,
        t0=1e-3, dtau0=5e-3, dtype="float64",
    )
    solid = jnp.asarray(h3.build_solid(cfg))
    assert not bool(np.asarray(solid).any())
    dt64 = cfg.jax_dtype
    shape = (nyz, nyz, nx)
    x = (np.arange(nx) + 0.5) / nx
    sel = jnp.asarray(x < 0.5)[None, None, :]

    def f(a, b):
        return jnp.where(sel, a, b) * jnp.ones(shape, dt64)

    q = h3.PrimT(r=f(1.0, 0.125), u=jnp.zeros(shape, dt64),
                 v=jnp.zeros(shape, dt64), w=jnp.zeros(shape, dt64),
                 p=f(1.0, 0.1), ev=jnp.full(shape, 1e-10, dt64))
    xi0, phix, phiy, phiz, lam, zet = h3._encode(cfg, q)
    s = h3.Hypersonic3DState(
        xi=xi0, phix=phix, phiy=phiy, phiz=phiz, lam=lam, zet=zet,
        solid=solid, t=jnp.asarray(cfg.t0, dt64),
        dtau=jnp.asarray(cfg.dtau0, dt64),
    )

    def body(carry, _):
        st, acc = carry
        dt_step = st.t * jnp.exp(st.dtau) * st.dtau  # the step's own dt
        return (h3.step(cfg, st), acc + dt_step), None

    (s, t_eff), _ = jax.jit(
        lambda c: lax.scan(body, c, None, length=400)
    )((s, jnp.asarray(0.0, dt64)))
    t_eff = float(t_eff)
    assert 0.05 < t_eff < 0.16  # waves resolved, boundary wave still clear

    rho = np.asarray(jnp.exp(s.xi))[nyz // 2, nyz // 2]
    u = np.asarray(cfg.u_ref * jnp.sinh(s.phix))[nyz // 2, nyz // 2]
    p = np.asarray(jnp.exp(s.lam))[nyz // 2, nyz // 2]
    # y/z-uniformity must be preserved exactly
    assert np.abs(np.asarray(s.xi) - np.asarray(s.xi)[0, 0][None, None, :]).max() == 0.0

    left, right = (1.0, 0.0, 1.0), (0.125, 0.0, 0.1)
    re, ue, pe = sample((x - 0.5) / t_eff, *left, *right, GAMMA)
    w = (x > 0.1) & (x < 0.80)
    # measured: 0.35% rho, 0.28% p, 0.0046 u at 256 cells
    assert _rel_l1(rho[w], re[w]) < 8e-3
    assert _rel_l1(p[w], pe[w]) < 7e-3
    assert np.abs(u[w] - ue[w]).mean() < 1.2e-2


def test_mhd_hydro_limit_matches_exact_euler():
    """The GLM-MHD solver with B=psi=0 is exactly 2-D Euler, so the Sod
    tube must match the exact Euler Riemann solution.

    Gate runs stable_hll=True (the textbook HLL sign); the default
    anti-diffusive FHLL (reference parity, tau_mhd.c:123) is excluded —
    it survives Brio-Wu via the invalid-revert but diverges on this tube.
    The reference scheme zeroes boundary-face fluxes (face loop bounds,
    tau_mhd.c:164-167), which leaks momentum at both x edges and drives
    inward waves, so the run is short and the comparison windowed.
    """
    from fluidsims_tpu.solvers import mhd

    nx, ny = 600, 6
    cfg = mhd.MHDConfig(nx=nx, ny=ny, gamma=GAMMA, cfl=0.22,
                        stable_hll=True, dtype="float64")
    dt64 = cfg.jax_dtype
    xp = (np.arange(nx) + 0.5) / nx   # unit square: dx = 1/nx
    sel = jnp.asarray(xp < 0.5)[None, :]

    def f(a, b):
        return jnp.where(sel, a, b) * jnp.ones((ny, nx), dt64)

    z = jnp.zeros((ny, nx), dt64)
    U = mhd.prim_to_cons(
        mhd.PrimM(rho=f(1.0, 0.125), u=z, v=z, p=f(1.0, 0.1),
                  Bx=z, By=z, psi=z), cfg.gamma)
    s = mhd.run(cfg, mhd.MHDState(U=U, t=jnp.asarray(0.0, dt64)), 600)
    t_end = float(s.t)
    assert 0.03 < t_end < 0.055  # boundary waves stay outside the window

    q = mhd.cons_to_prim(s.U, cfg.gamma)
    # B and psi must stay identically zero (hydro limit is exact)
    assert np.abs(np.asarray(q.Bx)).max() == 0.0
    assert np.abs(np.asarray(q.By)).max() == 0.0

    rho = np.asarray(q.rho)[ny // 2]
    p = np.asarray(q.p)[ny // 2]
    re, ue, pe = sample((xp - 0.5) / t_end, 1.0, 0.0, 1.0,
                        0.125, 0.0, 0.1, GAMMA)
    w = (xp > 0.2) & (xp < 0.85)
    # measured: 1.8% rho, 2.2% p (first-order HLL, ~45-cell fan)
    assert _rel_l1(rho[w], re[w]) < 0.035
    assert _rel_l1(p[w], pe[w]) < 0.04


def test_shallow_water_dam_break_matches_exact():
    """The log-depth HLL shallow-water solver as a 1-D dam break must
    match the exact wet-bed SWE Riemann solution (Stoker problem;
    tests/oracles/swe_riemann_exact.py).

    The domain is periodic (shift_wrapped), so the x=0/nx seam is a
    second, mirrored dam break; the run is short enough that both seam
    waves (rarefaction head c=3.13 cells/t rightward, bore ~2.6 leftward)
    stay outside the comparison window.  dt = min(t*dtau, CFL); the
    physical time is the accumulated per-step dt, recomputed here with
    the solver's own formula.
    """
    import jax
    from jax import lax

    from fluidsims_tpu.solvers import shallow_water as sw
    from tests.oracles.swe_riemann_exact import sample as swe_sample

    nx, ny, g = 600, 4, 9.81
    cfg = sw.ShallowWaterConfig(
        nx=nx, ny=ny, dx=1.0, dy=1.0, g=g, nu=0.0, H0=1.0, bump_amp=0.0,
        swirl=0.0, cfl=0.45, t0=1.0, dtau=1.0, dtype="float64")
    dt64 = cfg.jax_dtype
    x = np.arange(nx) + 0.5
    x_half = nx // 2
    h0 = np.where(x < x_half, 1.0, 0.1)
    sigma0 = jnp.asarray(np.log(np.tile(h0, (ny, 1))), dt64)
    z = jnp.zeros((ny, nx), dt64)

    def body(carry, _):
        sig, u, v, t, acc = carry
        h = jnp.exp(sig)
        c = jnp.sqrt(cfg.g * h)
        cmax = jnp.maximum(
            jnp.max(jnp.maximum(jnp.abs(u) + c, jnp.abs(v) + c)), 1e-12)
        dt = jnp.minimum(t * cfg.dtau,
                         cfg.cfl * min(cfg.dx, cfg.dy) / cmax)
        sig2, u2, v2 = sw.step_fields(cfg, sig, u, v, t)
        return (sig2, u2, v2, t * jnp.exp(jnp.asarray(cfg.dtau, dt64)),
                acc + dt), None

    (sig, u, v, _, t_eff), _ = jax.jit(
        lambda c: lax.scan(body, c, None, length=400)
    )((sigma0, z, z, jnp.asarray(cfg.t0, dt64), jnp.asarray(0.0, dt64)))
    t_eff = float(t_eff)
    assert 30.0 < t_eff < 45.0  # seam waves (3.13 c/t) stay below x=150

    h = np.asarray(jnp.exp(sig))[ny // 2]
    un = np.asarray(u)[ny // 2]
    he, ue = swe_sample((x - x_half) / t_eff, 1.0, 0.0, 0.1, 0.0, g)
    w = (x > 160) & (x < 450)
    # measured: 1.1% h, 0.027 u mae at 600 cells
    assert _rel_l1(h[w], he[w]) < 0.025
    assert np.abs(un[w] - ue[w]).mean() < 0.06
    assert (h > 0).all()


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
