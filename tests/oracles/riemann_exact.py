"""Exact solution of the 1-D Euler Riemann problem (Toro ch. 4).

Independent analytic oracle for the shock-capturing solvers: given left and
right primitive states, solves the star-region pressure with Newton
iteration (two-rarefaction initial guess) and samples the self-similar
solution rho/u/p at query speeds xi = x/t.  Pure NumPy float64; used by the
Sod shock-tube gates in tests/test_riemann_exact.py — the compressible
analog of the reference's Cole-Hopf analytic harness
(tau_burgers.cu:16-19,720-736; the reference itself has no Euler
analytic test, this gate is stricter).
"""

from __future__ import annotations

import numpy as np


def _pressure_fn(p, rho_k, p_k, a_k, g):
    """f_K(p) and df_K/dp for one side (Toro 4.6-4.8)."""
    if p > p_k:  # shock
        A = 2.0 / ((g + 1.0) * rho_k)
        B = (g - 1.0) / (g + 1.0) * p_k
        sq = np.sqrt(A / (p + B))
        f = (p - p_k) * sq
        df = sq * (1.0 - 0.5 * (p - p_k) / (B + p))
    else:  # rarefaction
        f = 2.0 * a_k / (g - 1.0) * ((p / p_k) ** ((g - 1.0) / (2.0 * g)) - 1.0)
        df = 1.0 / (rho_k * a_k) * (p / p_k) ** (-(g + 1.0) / (2.0 * g))
    return f, df


def solve_star(rho_l, u_l, p_l, rho_r, u_r, p_r, gamma):
    """Return (p_star, u_star) of the star region."""
    g = gamma
    a_l = np.sqrt(g * p_l / rho_l)
    a_r = np.sqrt(g * p_r / rho_r)
    du = u_r - u_l
    if 2.0 * (a_l + a_r) / (g - 1.0) <= du:
        raise ValueError("vacuum is generated; no star state")
    # two-rarefaction guess (Toro 4.46)
    z = (g - 1.0) / (2.0 * g)
    p = ((a_l + a_r - 0.5 * (g - 1.0) * du)
         / (a_l / p_l ** z + a_r / p_r ** z)) ** (1.0 / z)
    p = max(p, 1e-14)
    for _ in range(60):
        f_l, df_l = _pressure_fn(p, rho_l, p_l, a_l, g)
        f_r, df_r = _pressure_fn(p, rho_r, p_r, a_r, g)
        dp = (f_l + f_r + du) / (df_l + df_r)
        p_new = max(p - dp, 1e-14)
        if abs(p_new - p) <= 1e-13 * p:
            p = p_new
            break
        p = p_new
    f_l, _ = _pressure_fn(p, rho_l, p_l, a_l, g)
    f_r, _ = _pressure_fn(p, rho_r, p_r, a_r, g)
    u = 0.5 * (u_l + u_r) + 0.5 * (f_r - f_l)
    return p, u


def sample(xi, rho_l, u_l, p_l, rho_r, u_r, p_r, gamma):
    """Sample the exact solution at similarity speeds xi = x/t.

    Returns (rho, u, p) arrays of xi's shape.
    """
    g = gamma
    xi = np.asarray(xi, dtype=np.float64)
    p_s, u_s = solve_star(rho_l, u_l, p_l, rho_r, u_r, p_r, g)
    a_l = np.sqrt(g * p_l / rho_l)
    a_r = np.sqrt(g * p_r / rho_r)
    gp = (g + 1.0) / (2.0 * g)
    gm = (g - 1.0) / (2.0 * g)

    rho = np.empty_like(xi)
    u = np.empty_like(xi)
    p = np.empty_like(xi)

    left = xi <= u_s
    right = ~left

    # --- left side of the contact ---
    if p_s > p_l:  # left shock
        rho_sl = rho_l * ((p_s / p_l + (g - 1.0) / (g + 1.0))
                          / ((g - 1.0) / (g + 1.0) * p_s / p_l + 1.0))
        s_l = u_l - a_l * np.sqrt(gp * p_s / p_l + gm)
        pre = left & (xi < s_l)
        post = left & ~pre
        rho[pre], u[pre], p[pre] = rho_l, u_l, p_l
        rho[post], u[post], p[post] = rho_sl, u_s, p_s
    else:  # left rarefaction
        rho_sl = rho_l * (p_s / p_l) ** (1.0 / g)
        a_sl = a_l * (p_s / p_l) ** ((g - 1.0) / (2.0 * g))
        head, tail = u_l - a_l, u_s - a_sl
        pre = left & (xi < head)
        fan = left & (xi >= head) & (xi < tail)
        post = left & (xi >= tail)
        rho[pre], u[pre], p[pre] = rho_l, u_l, p_l
        c = 2.0 / (g + 1.0) + (g - 1.0) / ((g + 1.0) * a_l) * (u_l - xi[fan])
        rho[fan] = rho_l * c ** (2.0 / (g - 1.0))
        u[fan] = 2.0 / (g + 1.0) * (a_l + 0.5 * (g - 1.0) * u_l + xi[fan])
        p[fan] = p_l * c ** (2.0 * g / (g - 1.0))
        rho[post], u[post], p[post] = rho_sl, u_s, p_s

    # --- right side of the contact ---
    if p_s > p_r:  # right shock
        rho_sr = rho_r * ((p_s / p_r + (g - 1.0) / (g + 1.0))
                          / ((g - 1.0) / (g + 1.0) * p_s / p_r + 1.0))
        s_r = u_r + a_r * np.sqrt(gp * p_s / p_r + gm)
        post = right & (xi <= s_r)
        pre = right & ~post
        rho[post], u[post], p[post] = rho_sr, u_s, p_s
        rho[pre], u[pre], p[pre] = rho_r, u_r, p_r
    else:  # right rarefaction
        rho_sr = rho_r * (p_s / p_r) ** (1.0 / g)
        a_sr = a_r * (p_s / p_r) ** ((g - 1.0) / (2.0 * g))
        head, tail = u_r + a_r, u_s + a_sr
        post = right & (xi <= tail)
        fan = right & (xi > tail) & (xi <= head)
        pre = right & (xi > head)
        rho[post], u[post], p[post] = rho_sr, u_s, p_s
        c = 2.0 / (g + 1.0) - (g - 1.0) / ((g + 1.0) * a_r) * (u_r - xi[fan])
        rho[fan] = rho_r * c ** (2.0 / (g - 1.0))
        u[fan] = 2.0 / (g + 1.0) * (-a_r + 0.5 * (g - 1.0) * u_r + xi[fan])
        p[fan] = p_r * c ** (2.0 * g / (g - 1.0))
        rho[pre], u[pre], p[pre] = rho_r, u_r, p_r

    return rho, u, p
