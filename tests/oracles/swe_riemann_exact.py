"""Exact solution of the 1-D shallow-water Riemann problem (wet bed).

Toro, "Shock-Capturing Methods for Free-Surface Shallow Flows", ch. 5-6:
depth-function Newton solve for the star region, self-similar sampling.
Pure NumPy float64; the dam-break gate in tests/test_riemann_exact.py uses
it against the log-depth HLL solver (solvers/shallow_water.py).
"""

from __future__ import annotations

import numpy as np


def _depth_fn(h, h_k, g):
    """f_K(h) and df/dh for one side."""
    c_k = np.sqrt(g * h_k)
    if h <= h_k:  # rarefaction
        c = np.sqrt(g * h)
        return 2.0 * (c - c_k), np.sqrt(g / h)
    # shock (bore)
    ge = 0.5 * g * (h + h_k) / (h * h_k)
    sq = np.sqrt(ge)
    f = (h - h_k) * sq
    df = sq - 0.25 * g * (h - h_k) / (sq * h * h)
    return f, df


def solve_star(h_l, u_l, h_r, u_r, g):
    """Return (h_star, u_star); raises on dry-bed generation."""
    c_l, c_r = np.sqrt(g * h_l), np.sqrt(g * h_r)
    if 2.0 * (c_l + c_r) <= u_r - u_l:
        raise ValueError("dry bed is generated; no wet star state")
    # two-rarefaction guess
    h = ((0.5 * (c_l + c_r) - 0.25 * (u_r - u_l)) ** 2) / g
    h = max(h, 1e-14)
    for _ in range(60):
        f_l, df_l = _depth_fn(h, h_l, g)
        f_r, df_r = _depth_fn(h, h_r, g)
        dh = (f_l + f_r + (u_r - u_l)) / (df_l + df_r)
        h_new = max(h - dh, 1e-14)
        if abs(h_new - h) <= 1e-13 * h:
            h = h_new
            break
        h = h_new
    f_l, _ = _depth_fn(h, h_l, g)
    f_r, _ = _depth_fn(h, h_r, g)
    u = 0.5 * (u_l + u_r) + 0.5 * (f_r - f_l)
    return h, u


def sample(xi, h_l, u_l, h_r, u_r, g):
    """Sample (h, u) at similarity speeds xi = x/t."""
    xi = np.asarray(xi, dtype=np.float64)
    h_s, u_s = solve_star(h_l, u_l, h_r, u_r, g)
    c_l, c_r = np.sqrt(g * h_l), np.sqrt(g * h_r)
    c_s = np.sqrt(g * h_s)

    h = np.empty_like(xi)
    u = np.empty_like(xi)
    left = xi <= u_s
    right = ~left

    if h_s > h_l:  # left bore
        q_l = np.sqrt(0.5 * (h_s + h_l) * h_s / (h_l * h_l))
        s_l = u_l - c_l * q_l
        pre = left & (xi < s_l)
        post = left & ~pre
        h[pre], u[pre] = h_l, u_l
        h[post], u[post] = h_s, u_s
    else:  # left rarefaction
        head, tail = u_l - c_l, u_s - c_s
        pre = left & (xi < head)
        fan = left & (xi >= head) & (xi < tail)
        post = left & (xi >= tail)
        h[pre], u[pre] = h_l, u_l
        c = (u_l + 2.0 * c_l - xi[fan]) / 3.0
        h[fan] = c * c / g
        u[fan] = (u_l + 2.0 * c_l + 2.0 * xi[fan]) / 3.0
        h[post], u[post] = h_s, u_s

    if h_s > h_r:  # right bore
        q_r = np.sqrt(0.5 * (h_s + h_r) * h_s / (h_r * h_r))
        s_r = u_r + c_r * q_r
        post = right & (xi <= s_r)
        pre = right & ~post
        h[post], u[post] = h_s, u_s
        h[pre], u[pre] = h_r, u_r
    else:  # right rarefaction
        head, tail = u_r + c_r, u_s + c_s
        post = right & (xi <= tail)
        fan = right & (xi > tail) & (xi <= head)
        pre = right & (xi > head)
        h[post], u[post] = h_s, u_s
        c = (-u_r + 2.0 * c_r + xi[fan]) / 3.0
        h[fan] = c * c / g
        u[fan] = (u_r - 2.0 * c_r + 2.0 * xi[fan]) / 3.0
        h[pre], u[pre] = h_r, u_r

    return h, u
