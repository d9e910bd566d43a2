"""Flagship 2-D hypersonic compressible Euler solver (MUSCL-Hancock + HLLC).

Behavioral spec: tau_hypersonic_cuda.cu — double-precision 8192x1024 flow
past a sphere-cone capsule with explicit 4th-order-stencil diffusion:
  * config + validation      tau_hypersonic_cuda.cu:37-50, 1394-1409, 1482-1639
  * geometry mask            :740-770 (SDF rasterized, rounded by Rb)
  * inflow left column       :772-784
  * CFL dt from max wavespeed:786-847, 1852-1869
  * MUSCL predict face states:849-962
  * HLLC face fluxes         :964-1030
  * update + diffusion + fix :1032-1176

TPU-native design choices (vs the CUDA pipeline):
  * One fused dataflow step: the predict/flux/update kernels become a single
    jit region of whole-array shifts + selects; XLA fuses them so the four
    face-state SoA arrays and two flux SoA arrays that the reference streams
    through HBM never need to be materialized as separate passes.
  * dt stays on device: the reference's per-step device->host wavespeed
    readback (:1846-1850) is replaced by a traced `jnp.max` feeding the
    update directly — the whole multi-step loop is one `lax.scan`.
  * Branch-free BCs: neighbor_or_wall's branches (:266-290) become shifted
    arrays + mask selects evaluated for the entire grid at once.
  * float32 by default (TPU f64 is emulated); dtype is configurable and the
    regression gate compares against a float64 NumPy oracle at f32 tolerance.

A Pallas fused kernel for the hot path lives in
fluidsims_tpu.kernels.hypersonic2d_pallas (same contract, same tests).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.clock import cfl_dt
from ..core.config import BaseConfig
from ..ops import euler2d as e2
from ..ops.euler2d import Cons, Prim
from ..ops.riemann import hllc
from ..ops.sdf import sd_sphere_cone_capsule, spherecone_xb
from ..ops.shift import shift_clamped

__all__ = [
    "Hypersonic2DConfig",
    "Hypersonic2DState",
    "default_config",
    "build_mask",
    "init",
    "step",
    "run",
    "max_wavespeed",
    "compute_dt",
]


@dataclass(frozen=True)
class Hypersonic2DConfig(BaseConfig):
    nx: int = 8192
    ny: int = 1024
    gamma: float = 1.1
    cfl: float = 0.25
    visc_nu: float = 5e-2
    visc_rho: float = 5e-2
    visc_e: float = 2e-2
    inflow_mach: float = 25.0
    geom_x0: float = 125.0
    geom_cy: float = 512.0
    geom_Rb: float = 1024.0 / 12.0
    geom_Rn: float = 1024.0 / 24.0
    geom_theta: float = math.pi / 4.0
    steps_per_frame: int = 2
    dtype: str = "float32"

    def validate(self):
        # Two-stage validation mirroring tau_hypersonic_cuda.cu:1538-1639.
        self._require(self.nx > 0 and self.ny > 0, "grid dims must be positive")
        self._require(self.gamma > 1.0, f"gamma {self.gamma} must be > 1")
        self._require(self.cfl > 0.0, "cfl must be > 0")
        self._require(self.visc_nu >= 0.0, "visc_nu must be >= 0")
        self._require(self.visc_rho >= 0.0, "visc_rho must be >= 0")
        self._require(self.visc_e >= 0.0, "visc_e must be >= 0")
        self._require(self.inflow_mach > 0.0, "inflow_mach must be > 0")
        self._require(
            0 < self.steps_per_frame <= 1024, "steps_per_frame must be in [1,1024]"
        )
        self._require(math.isfinite(self.geom_x0), "geom_x0 must be finite")
        self._require(math.isfinite(self.geom_cy), "geom_cy must be finite")
        self._require(self.geom_Rb > 0.0, "geom_Rb must be > 0")
        self._require(self.geom_Rn > 0.0, "geom_Rn must be > 0")
        self._require(
            0.0 < self.geom_theta < 0.5 * math.pi, "geom_theta must be in (0, pi/2)"
        )
        # Geometry tangency: base radius must reach past the sphere tangent.
        rt = self.geom_Rn * math.cos(self.geom_theta)
        self._require(
            self.geom_Rb >= rt,
            f"geom_Rb {self.geom_Rb} below tangent radius {rt}; "
            "require Rb >= Rn*cos(theta)",
        )
        tt = math.tan(self.geom_theta)
        self._require(math.isfinite(tt) and tt > 0.0, "tan(theta) must be positive")
        xb = spherecone_xb(self.geom_Rb, self.geom_Rn, self.geom_theta)
        xt = self.geom_Rn * (1.0 - math.sin(self.geom_theta))
        self._require(math.isfinite(xb) and xb >= xt, "cone base behind tangent point")

    @property
    def nu_max(self) -> float:
        return max(self.visc_nu, self.visc_rho, self.visc_e)


def default_config(nx: int = 8192, ny: int = 1024, **kw) -> Hypersonic2DConfig:
    """Defaults scaled to the grid as in tau_hypersonic_cuda.cu:1394-1409
    (cy = ny/2, Rb = ny/12, Rn = ny/24)."""
    base = dict(
        nx=nx,
        ny=ny,
        geom_x0=125.0 * nx / 8192.0 if nx != 8192 else 125.0,
        geom_cy=ny / 2.0,
        geom_Rb=ny / 12.0,
        geom_Rn=ny / 24.0,
    )
    base.update(kw)
    return Hypersonic2DConfig(**base)


class Hypersonic2DState(NamedTuple):
    U: Cons                  # conserved fields, each (ny, nx)
    mask: jnp.ndarray        # bool (ny, nx), True = solid
    t: jnp.ndarray           # sim time (scalar)


def _inflow(cfg: Hypersonic2DConfig) -> Prim:
    return e2.inflow_prim(cfg.gamma, cfg.inflow_mach, cfg.jax_dtype)


def build_mask(cfg: Hypersonic2DConfig) -> jnp.ndarray:
    """Rasterize the rounded sphere-cone SDF to a solid mask
    (tau_hypersonic_cuda.cu:740-765): sd = capsule_sd - Rb, clipped behind
    the base plane."""
    dt = cfg.jax_dtype
    x = jnp.arange(cfg.nx, dtype=dt) - dt.type(cfg.geom_x0)
    y = jnp.arange(cfg.ny, dtype=dt) - dt.type(cfg.geom_cy)
    X, Y = jnp.meshgrid(x, y)  # (ny, nx)
    xb = spherecone_xb(cfg.geom_Rb, cfg.geom_Rn, cfg.geom_theta)
    sd = sd_sphere_cone_capsule(X, Y, cfg.geom_Rb, cfg.geom_Rn, cfg.geom_theta)
    sd = sd - cfg.geom_Rb
    sd = jnp.maximum(sd, X - xb)
    return sd < 0.0


def init(cfg: Hypersonic2DConfig) -> Hypersonic2DState:
    """Fill the domain with inflow; solid cells hold the stagnant state
    (rho, 0, 0, p) (tau_hypersonic_cuda.cu:767-769)."""
    mask = build_mask(cfg)
    infl = _inflow(cfg)
    shape = (cfg.ny, cfg.nx)
    dt = cfg.jax_dtype

    def full(v):
        return jnp.full(shape, v, dtype=dt)

    fluid = e2.prim_to_cons(
        Prim(full(infl.rho), full(infl.u), full(infl.v), full(infl.p)), cfg.gamma
    )
    solid = e2.prim_to_cons(
        Prim(full(infl.rho), full(0.0), full(0.0), full(infl.p)), cfg.gamma
    )
    U = e2.c_where(mask, solid, fluid)
    return Hypersonic2DState(U=U, mask=mask, t=jnp.asarray(0.0, dt))


# ---------------------------------------------------------------------------
# Branch-free neighbor access with boundary conditions
# ---------------------------------------------------------------------------


def _neighbor(cfg, U: Cons, mask, center_prim: Prim, dy: int, dx: int) -> Cons:
    """Whole-grid neighbor_or_wall (tau_hypersonic_cuda.cu:266-290):
    y edge-clamped; x<0 -> inflow; x>=nx -> last column (edge clamp);
    in-bounds solid neighbor -> no-slip ghost of the center cell."""
    Un = Cons(*(shift_clamped(f, dy, dx) for f in U))
    mn = shift_clamped(mask, dy, dx)

    ghost = e2.prim_to_cons(e2.wall_ghost(center_prim), cfg.gamma)

    if dx != 0:
        # The wall-ghost substitution only applies where the x-neighbor was
        # in-bounds (the reference checks x bounds before the mask).
        nx = cfg.nx
        col = np.arange(nx) + dx
        in_x = jnp.asarray((col >= 0) & (col < nx))
        sel = mn & in_x[None, :]
    else:
        sel = mn
    out = e2.c_where(sel, ghost, Un)

    if dx < 0:
        # First |dx| columns read past the inflow boundary.
        infl = e2.prim_to_cons(_inflow(cfg), cfg.gamma)
        nx = cfg.nx
        col_inflow = jnp.asarray(np.arange(nx) + dx < 0)
        out = e2.c_where(col_inflow[None, :], _bcast(infl, out.rho.shape), out)
    return out


def _bcast(c: Cons, shape) -> Cons:
    return Cons(*(jnp.broadcast_to(f, shape) for f in c))


# ---------------------------------------------------------------------------
# Step pipeline
# ---------------------------------------------------------------------------


def max_wavespeed(cfg, U: Cons, mask):
    """Max |u|+a, |v|+a over fluid cells — the reference's two-stage shared
    memory reduction (tau_hypersonic_cuda.cu:786-847) is a single jnp.max."""
    p = e2.cons_to_prim(U, cfg.gamma)
    a = e2.sound_speed(p, cfg.gamma)
    s = jnp.maximum(jnp.abs(p.u) + a, jnp.abs(p.v) + a)
    s = jnp.where(jnp.isfinite(s), s, 1e-12)
    s = jnp.where(mask, 1e-12, s)
    return jnp.maximum(jnp.max(s), 1e-12)


def compute_dt(cfg, U: Cons, mask):
    return cfl_dt(max_wavespeed(cfg, U, mask), cfg.cfl, dx=1.0, nu_max=cfg.nu_max)


def _predict_faces(cfg, U: Cons, mask, center: Prim, half_dt, axis: int):
    """MUSCL reconstruction + Hancock half-step along one axis
    (tau_hypersonic_cuda.cu:920-962). Returns (low_face, high_face) cons."""
    dy, dx = (0, 1) if axis == 0 else (1, 0)
    qm = e2.cons_to_prim(_neighbor(cfg, U, mask, center, -dy, -dx), cfg.gamma)
    qp = e2.cons_to_prim(_neighbor(cfg, U, mask, center, dy, dx), cfg.gamma)
    qL, qR = e2.reconstruct_faces(qm, center, qp)

    FL = e2.flux(e2.prim_to_cons(qL, cfg.gamma), cfg.gamma, axis)
    FR = e2.flux(e2.prim_to_cons(qR, cfg.gamma), cfg.gamma, axis)
    dF = e2.c_sub(FR, FL)

    pL = e2.clamp_prim(e2.half_step_predict(qL, dF, half_dt, cfg.gamma))
    pR = e2.clamp_prim(e2.half_step_predict(qR, dF, half_dt, cfg.gamma))
    return e2.prim_to_cons(pL, cfg.gamma), e2.prim_to_cons(pR, cfg.gamma)


def _face_flux_x(cfg, U: Cons, mask, xL: Cons, xR: Cons) -> Cons:
    """HLLC flux on every x-face, shape (ny, nx+1)
    (tau_hypersonic_cuda.cu:964-996). Face fx sits between cells fx-1, fx."""
    ny, nx = mask.shape
    fluid = ~mask

    def pad_l(f):  # value from the left cell (fx-1); col 0 padded
        return jnp.concatenate([f[:, :1], f], axis=1)

    def pad_r(f):  # value from the right cell (fx); col nx padded
        return jnp.concatenate([f, f[:, -1:]], axis=1)

    hasL = jnp.concatenate([jnp.zeros((ny, 1), bool), fluid], axis=1)
    hasR = jnp.concatenate([fluid, jnp.zeros((ny, 1), bool)], axis=1)

    # Left input state: predicted high-face state of cell fx-1 when fluid;
    # else inflow (fx==0) or wall ghost of the right cell.
    UL_pred = Cons(*(pad_l(f) for f in xR))
    right_prim = e2.cons_to_prim(Cons(*(pad_r(f) for f in U)), cfg.gamma)
    ghost_right = e2.prim_to_cons(e2.wall_ghost(right_prim), cfg.gamma)
    infl = e2.prim_to_cons(_inflow(cfg), cfg.gamma)
    first_col = jnp.asarray(np.arange(nx + 1) == 0)[None, :]
    UL_bc = e2.c_where(first_col, _bcast(infl, (ny, nx + 1)), ghost_right)
    UL = e2.c_where(hasL, UL_pred, UL_bc)

    # Right input state: predicted low-face state of cell fx when fluid; else
    # outflow copy (fx==nx -> cell nx-1) or wall ghost of the left cell.
    UR_pred = Cons(*(pad_r(f) for f in xL))
    left_prim = e2.cons_to_prim(Cons(*(pad_l(f) for f in U)), cfg.gamma)
    ghost_left = e2.prim_to_cons(e2.wall_ghost(left_prim), cfg.gamma)
    last_col = jnp.asarray(np.arange(nx + 1) == nx)[None, :]
    outflow = Cons(*(jnp.broadcast_to(f[:, -1:], (ny, nx + 1)) for f in U))
    UR_bc = e2.c_where(last_col, outflow, ghost_left)
    UR = e2.c_where(hasR, UR_pred, UR_bc)

    F = hllc(UL, UR, cfg.gamma, axis=0)
    zero = Cons(*(jnp.zeros_like(F.rho) for _ in range(4)))
    return e2.c_where(hasL | hasR, F, zero)


def _face_flux_y(cfg, U: Cons, mask, yL: Cons, yR: Cons) -> Cons:
    """HLLC flux on every y-face, shape (ny+1, nx)
    (tau_hypersonic_cuda.cu:998-1030). y boundaries are edge-clamped: the
    ghost beyond row 0 / ny-1 is the row itself, so the Riemann problem at
    the wall faces is (U, U) -> plain physical flux."""
    ny, nx = mask.shape
    fluid = ~mask

    def pad_b(f):  # value from cell below (fy-1)
        return jnp.concatenate([f[:1, :], f], axis=0)

    def pad_t(f):  # value from cell above (fy)
        return jnp.concatenate([f, f[-1:, :]], axis=0)

    hasB = jnp.concatenate([jnp.zeros((1, nx), bool), fluid], axis=0)
    hasT = jnp.concatenate([fluid, jnp.zeros((1, nx), bool)], axis=0)

    UB_pred = Cons(*(pad_b(f) for f in yR))
    top_prim = e2.cons_to_prim(Cons(*(pad_t(f) for f in U)), cfg.gamma)
    ghost_top = e2.prim_to_cons(e2.wall_ghost(top_prim), cfg.gamma)
    # fy==0 with hasT: neighbor_or_wall clamps y to 0 -> the top cell itself.
    first_row = jnp.asarray(np.arange(ny + 1) == 0)[:, None]
    top_cell = Cons(*(pad_t(f) for f in U))
    UB_bc = e2.c_where(first_row, top_cell, ghost_top)
    UB = e2.c_where(hasB, UB_pred, UB_bc)

    UT_pred = Cons(*(pad_t(f) for f in yL))
    bot_prim = e2.cons_to_prim(Cons(*(pad_b(f) for f in U)), cfg.gamma)
    ghost_bot = e2.prim_to_cons(e2.wall_ghost(bot_prim), cfg.gamma)
    last_row = jnp.asarray(np.arange(ny + 1) == ny)[:, None]
    bot_cell = Cons(*(pad_b(f) for f in U))
    UT_bc = e2.c_where(last_row, bot_cell, ghost_bot)
    UT = e2.c_where(hasT, UT_pred, UT_bc)

    F = hllc(UB, UT, cfg.gamma, axis=1)
    zero = Cons(*(jnp.zeros_like(F.rho) for _ in range(4)))
    return e2.c_where(hasB | hasT, F, zero)


def _diffusion(cfg, U: Cons, mask, center: Prim, Un: Cons, dt) -> Cons:
    """Explicit diffusion with the 5-tap 4th-order second derivative
    (tau_hypersonic_cuda.cu:1117-1164), neighbors fetched with the same BC
    semantics (neighbor_for_diff)."""
    inv12 = 1.0 / 12.0

    def d2(axis):
        dy, dx = (0, 1) if axis == 0 else (1, 0)
        m2 = _neighbor(cfg, U, mask, center, -2 * dy, -2 * dx)
        m1 = _neighbor(cfg, U, mask, center, -dy, -dx)
        p1 = _neighbor(cfg, U, mask, center, dy, dx)
        p2 = _neighbor(cfg, U, mask, center, 2 * dy, 2 * dx)
        return Cons(
            *(
                (-a + 16.0 * b - 30.0 * c + 16.0 * d - e) * inv12
                for a, b, c, d, e in zip(m2, m1, U, p1, p2)
            )
        )

    lap = e2.c_add(d2(0), d2(1))
    return Cons(
        rho=Un.rho + (cfg.visc_rho * dt) * lap.rho,
        mx=Un.mx + (cfg.visc_nu * dt) * lap.mx,
        my=Un.my + (cfg.visc_nu * dt) * lap.my,
        E=Un.E + (cfg.visc_e * dt) * lap.E,
    )


def step(
    cfg: Hypersonic2DConfig,
    s: Hypersonic2DState,
    inflow_cols=None,
    wavespeed_reduce=None,
) -> Hypersonic2DState:
    """One full physics step — the reference's 5-kernel sequence
    (tau_hypersonic_cuda.cu:1833-1889) as one fused jit region.

    `inflow_cols` / `wavespeed_reduce` are hooks for the sharded multi-chip
    path (fluidsims_tpu.parallel): a traced bool column mask selecting where
    the inflow BC applies (default: global column 0), and a cross-device
    reduction (lax.pmax over the mesh axis) for the CFL wavespeed.
    """
    U, mask = s.U, s.mask

    # Inflow left column (k_apply_inflow_left, :772-784).
    infl = e2.prim_to_cons(_inflow(cfg), cfg.gamma)
    if inflow_cols is None:
        inflow_cols = jnp.asarray(np.arange(cfg.nx) == 0)[None, :]
    first_col = inflow_cols & ~mask
    U = e2.c_where(first_col, _bcast(infl, U.rho.shape), U)

    # CFL dt, on device (:1852-1869).
    maxs = max_wavespeed(cfg, U, mask)
    if wavespeed_reduce is not None:
        maxs = wavespeed_reduce(maxs)
    dt = cfl_dt(maxs, cfg.cfl, dx=1.0, nu_max=cfg.nu_max)
    half_dt = 0.5 * dt

    center = e2.cons_to_prim(U, cfg.gamma)

    # Predict face states both axes (k_predict_face_states).
    xL, xR = _predict_faces(cfg, U, mask, center, half_dt, axis=0)
    yL, yR = _predict_faces(cfg, U, mask, center, half_dt, axis=1)

    # Face fluxes (k_compute_xface_flux / k_compute_yface_flux).
    Fx = _face_flux_x(cfg, U, mask, xL, xR)
    Gy = _face_flux_y(cfg, U, mask, yL, yR)

    # Conservative update (k_step).
    FxL = Cons(*(f[:, :-1] for f in Fx))
    FxR = Cons(*(f[:, 1:] for f in Fx))
    GyB = Cons(*(f[:-1, :] for f in Gy))
    GyT = Cons(*(f[1:, :] for f in Gy))

    Un = Cons(
        *(
            u - dt * (fr - fl) - dt * (gt - gb)
            for u, fl, fr, gb, gt in zip(U, FxL, FxR, GyB, GyT)
        )
    )

    Un = _diffusion(cfg, U, mask, center, Un, dt)

    # Positivity / finiteness repair (:1166-1173).
    Un = Un._replace(rho=jnp.maximum(Un.rho, e2.EPS_RHO))
    pp = e2.cons_to_prim(Un, cfg.gamma)
    bad = (
        (pp.p <= e2.EPS_P)
        | ~jnp.isfinite(pp.p)
        | ~jnp.isfinite(pp.rho)
        | ~jnp.isfinite(pp.u)
        | ~jnp.isfinite(pp.v)
    )
    fixed = e2.prim_to_cons(e2.clamp_prim(pp), cfg.gamma)
    Un = e2.c_where(bad, fixed, Un)

    # Solid cells keep their state (:1092-1094).
    Un = e2.c_where(mask, U, Un)

    return Hypersonic2DState(U=Un, mask=mask, t=s.t + dt)


def run(cfg: Hypersonic2DConfig, s: Hypersonic2DState, n_steps: int):
    from ..core.stepper import scan_steps

    return scan_steps(lambda st: step(cfg, st), s, n_steps)
