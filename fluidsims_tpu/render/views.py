"""Diagnostic view-mode library for the 2-D hypersonic solver.

Behavioral spec: the 7 view modes of tau_hypersonic_cuda.cu
(k_render_vals :1178-1238, mode list :6-14): log rho, log p, speed,
schlieren |grad rho| (with BC-aware neighbor sampling, sample_prim_bc
:706-727), vorticity asinh(omega), Mach, log(p/rho); masked min/max
normalization (:1240-1334) and the jet colormap render (k_render_pixels
:1262-1279, solid cells gray 110).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import euler2d as e2
from ..solvers import hypersonic2d as h2
from .colormap import jet, to_rgba

__all__ = ["VIEW_MODES", "render_value", "normalize_masked", "render_rgba"]

VIEW_MODES = [
    "log_rho", "log_p", "speed", "schlieren", "vorticity", "mach",
    "log_p_over_rho",
]


def _sample_prim_bc(cfg, U, mask, dy, dx):
    """Neighbor prim with BC semantics (sample_prim_bc)."""
    center = e2.cons_to_prim(U, cfg.gamma)
    nb = h2._neighbor(cfg, U, mask, center, dy, dx)
    return e2.cons_to_prim(nb, cfg.gamma)


def render_value(cfg, state: h2.Hypersonic2DState, mode: str):
    """Per-cell scalar for a view mode; 0 in masked/non-finite cells."""
    U, mask = state.U, state.mask
    p = e2.cons_to_prim(U, cfg.gamma)

    if mode == "log_rho":
        v = jnp.log(p.rho)
    elif mode == "log_p":
        v = jnp.log(p.p)
    elif mode == "speed":
        v = jnp.sqrt(p.u**2 + p.v**2)
    elif mode == "schlieren":
        rl = _sample_prim_bc(cfg, U, mask, 0, -1).rho
        rr = _sample_prim_bc(cfg, U, mask, 0, 1).rho
        rb = _sample_prim_bc(cfg, U, mask, -1, 0).rho
        rt = _sample_prim_bc(cfg, U, mask, 1, 0).rho
        gx = 0.5 * (rr - rl)
        gy = 0.5 * (rt - rb)
        v = jnp.log(1e-12 + jnp.sqrt(gx * gx + gy * gy))
    elif mode == "vorticity":
        pl = _sample_prim_bc(cfg, U, mask, 0, -1)
        pr = _sample_prim_bc(cfg, U, mask, 0, 1)
        pb = _sample_prim_bc(cfg, U, mask, -1, 0)
        pt = _sample_prim_bc(cfg, U, mask, 1, 0)
        omega = 0.5 * (pr.v - pl.v) - 0.5 * (pt.u - pb.u)
        v = jnp.arcsinh(omega)
    elif mode == "mach":
        a = e2.sound_speed(p, cfg.gamma)
        v = jnp.sqrt(p.u**2 + p.v**2) / jnp.maximum(a, 1e-30)
    elif mode == "log_p_over_rho":
        v = jnp.log(jnp.maximum(p.p / jnp.maximum(p.rho, e2.EPS_RHO), 1e-30))
    else:
        raise ValueError(f"unknown view mode {mode}")

    v = jnp.where(jnp.isfinite(v), v, 0.0)
    return jnp.where(mask, 0.0, v)


def normalize_masked(v, mask):
    """Min/max over fluid cells only (k_render_vals/k_reduce_minmax)."""
    big = jnp.asarray(1e30, v.dtype)
    mn = jnp.min(jnp.where(mask, big, v))
    mx = jnp.max(jnp.where(mask, -big, v))
    inv = 1.0 / jnp.maximum(mx - mn, 1e-30)
    return (v - mn) * inv


def render_rgba(cfg, state: h2.Hypersonic2DState, mode: str) -> np.ndarray:
    """(ny, nx, 4) uint8 frame; solids gray (110,110,110)
    (k_render_pixels :1270-1272)."""
    v = render_value(cfg, state, mode)
    t = np.asarray(normalize_masked(v, state.mask))
    rgba = to_rgba(jet(t))
    solid = np.asarray(state.mask)
    rgba[solid] = np.array([110, 110, 110, 255], np.uint8)
    return rgba
