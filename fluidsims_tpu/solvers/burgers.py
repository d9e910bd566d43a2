"""2-D viscous Burgers in asinh log-velocity state, on the τ clock.

Behavioral spec: tau_burgers.cu — state stores phi = asinh(u/u0) so velocity
magnitude is log-compressed (:12); periodic domain; Rusanov (local
Lax–Friedrichs) face fluxes with optional MUSCL/minmod reconstruction
(flux_x_kernel :364-408, flux_y_kernel :411-455); convective update in real
velocity then re-encode (:458-487); K explicit viscosity substeps
(:490-525, :711-717); τ clock t=t0*e^tau with dt_eff=min(t*dtau, CFL/smax)
(:688-692) and post-step tau+=dtau, t*=e^dtau (:756-757, :801-802);
Cole–Hopf 1-D analytic validation (:256-273, :720-736).

TPU design: the flux/update/viscosity kernels are one fused jit region of
periodic shifts; the whole τ loop runs inside lax.scan with dt on device.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.config import BaseConfig
from ..ops.limiters import minmod
from ..ops.shift import shift_wrapped

__all__ = [
    "BurgersConfig",
    "BurgersState",
    "init",
    "step",
    "step_fields",
    "resolve_engine",
    "run",
    "velocities",
    "cole_hopf_exact",
    "cole_hopf_rel_l2",
]


@dataclass(frozen=True)
class BurgersConfig(BaseConfig):
    nx: int = 512
    ny: int = 512
    dx: float = 1.0
    dy: float = 1.0
    nu: float = 0.1
    u0: float = 1.0
    # initial swirl + gaussian field
    amp: float = 1.0
    bsig: float = 16.0
    swirl: float = 10.0
    rc: float = 40.0
    offx: float = 0.0
    offy: float = 0.0
    asym: float = 0.0
    # time
    cfl: float = 0.45
    tau0: float = 0.0
    t0: float = 1.0
    dtau: float = 1.0
    # toggles
    muscl: bool = False
    visc_substeps: int = 1
    # Cole-Hopf 1-D validation mode
    colehopf: bool = False
    ck: int = 4
    ca: float = 0.5
    dtype: str = "float32"
    engine: str = "auto"     # auto | xla | pallas (whole-solve VMEM resident)
    block_k: int = 16        # fused steps per kernel launch (pallas)

    def validate(self):
        self._require(self.nx > 0 and self.ny > 0, "grid dims must be positive")
        self._require(self.u0 != 0.0, "u0 must be nonzero")
        self._require(self.cfl > 0.0, "CFL must be > 0")
        self._require(self.visc_substeps >= 1, "visc_substeps must be >= 1")
        self._require(self.engine in ("auto", "xla", "pallas"),
                      "engine must be auto, xla or pallas")
        self._require(self.block_k >= 1, "block_k must be >= 1")
        if self.colehopf:
            self._require(abs(self.ca) < 1.0, "Cole-Hopf amplitude |ca| must be < 1")


class BurgersState(NamedTuple):
    phi_u: jnp.ndarray  # asinh(u/u0), (ny, nx)
    phi_v: jnp.ndarray
    t: jnp.ndarray      # physical time (t0 * e^tau)
    tau: jnp.ndarray    # log time


def sinh_mosaic(x):
    """sinh from primitives Mosaic lowers (tanh/exp — it has no sinh).

    |x| <= 1: with t = tanh(x/2), sinh(x) = 2t / (1 - t^2) — cancellation-
    free at small |x| (t ~ x/2 keeps full relative accuracy), unlike the
    (e^x - e^-x)/2 form.  |x| > 1: the exp form (e^|x| - e^-|x|)/2, whose
    cancellation is bounded by e^-2 there, while the tanh form saturates
    (1 - t^2 loses ~2e-4 relative by |x| ~ 8)."""
    ax = jnp.abs(x)
    t = jnp.tanh(0.5 * x)
    small = 2.0 * t / (1.0 - t * t)
    e = jnp.exp(ax)
    big = jnp.sign(x) * (0.5 * (e - 1.0 / e))
    return jnp.where(ax > 1.0, big, small)


def asinh_mosaic(x):
    """asinh from primitives Mosaic lowers (log1p/sqrt — no asinh):
    sign(x) * log1p(|x| + x^2/(1 + sqrt(1 + x^2))), the standard
    cancellation-free rearrangement of log(x + sqrt(x^2+1))."""
    ax = jnp.abs(x)
    h = jnp.sqrt(1.0 + ax * ax)
    return jnp.sign(x) * jnp.log1p(ax + ax * ax / (1.0 + h))


def _encode(cfg, u, asinh=jnp.arcsinh):
    return asinh(u / cfg.u0)


def _decode(cfg, phi, sinh=jnp.sinh):
    return cfg.u0 * sinh(phi)


def velocities(cfg: BurgersConfig, s: BurgersState):
    return _decode(cfg, s.phi_u), _decode(cfg, s.phi_v)


def cole_hopf_exact(cfg: BurgersConfig, t: float) -> np.ndarray:
    """Exact 1-D solution u(x,t) = 2 nu a k e^{-nu k^2 t} sin(kx) /
    (1 + a e^{-nu k^2 t} cos(kx)) (tau_burgers.cu:16-19)."""
    Lx = cfg.dx * cfg.nx
    k = 2.0 * math.pi * cfg.ck / Lx
    x = (np.arange(cfg.nx) + 0.5) * cfg.dx
    decay = math.exp(-cfg.nu * k * k * t)
    return (2.0 * cfg.nu * cfg.ca * k * decay * np.sin(k * x)) / (
        1.0 + cfg.ca * decay * np.cos(k * x)
    )


def cole_hopf_rel_l2(cfg: BurgersConfig, s: BurgersState) -> float:
    """Relative L2 error vs the exact solution (tau_burgers.cu:720-736)."""
    u = np.asarray(_decode(cfg, s.phi_u))[0]
    u_ex = cole_hopf_exact(cfg, float(s.t))
    den = float((u_ex**2).sum())
    num = float(((u - u_ex) ** 2).sum())
    return math.sqrt(num / den) if den > 0 else math.sqrt(num)


def init(cfg: BurgersConfig) -> BurgersState:
    nx, ny = cfg.nx, cfg.ny
    dt = cfg.jax_dtype
    if cfg.colehopf:
        # 1-D exact-driven init on a ny-row strip (reference forces ny=1).
        u_row = cole_hopf_exact(cfg, 0.0)
        u = np.broadcast_to(u_row, (ny, nx)).astype(np.float64)
        v = np.zeros((ny, nx))
    else:
        cx = 0.5 * nx + cfg.offx
        cy = 0.5 * ny + cfg.offy
        i = np.arange(nx)[None, :]
        j = np.arange(ny)[:, None]
        dxc = i - cx
        dyc = j - cy
        r2 = (dxc * dxc + dyc * dyc) / max(cfg.bsig**2, 1e-6)
        theta = np.arctan2(dyc, dxc)
        mod = 1.0 + cfg.asym * np.cos(theta)

        rx = dxc * cfg.dx
        ry = dyc * cfg.dy
        r = np.sqrt(rx * rx + ry * ry)
        rc = cfg.rc * min(cfg.dx, cfg.dy)
        with np.errstate(invalid="ignore", divide="ignore"):
            u_theta = np.where(
                r > 0.0, cfg.swirl * r * np.exp(-0.5 * (r / rc) ** 2), 0.0
            )
            u = np.where(r > 0.0, -u_theta * ry / np.maximum(r, 1e-30), 0.0)
            v = np.where(r > 0.0, u_theta * rx / np.maximum(r, 1e-30), 0.0)
        g = cfg.amp * mod * np.exp(-0.5 * r2)
        u = u + 0.5 * g
        v = v - 0.5 * g

    phi_u = np.arcsinh(u / cfg.u0)
    phi_v = np.arcsinh(v / cfg.u0)
    return BurgersState(
        phi_u=jnp.asarray(phi_u, dt),
        phi_v=jnp.asarray(phi_v, dt),
        t=jnp.asarray(cfg.t0, dt),
        tau=jnp.asarray(cfg.tau0, dt),
    )


def _muscl_faces(q, axis: int, shift=shift_wrapped):
    """Face states (left cell's right face, right cell's left face) with
    minmod slope limiting on phi (tau_burgers.cu:379-395)."""
    qp = shift(q, 0, 1) if axis == 0 else shift(q, 1, 0)
    qm = shift(q, 0, -1) if axis == 0 else shift(q, -1, 0)
    qpp = shift(q, 0, 2) if axis == 0 else shift(q, 2, 0)

    sL = 0.5 * minmod(q - qm, qp - q)
    sR = 0.5 * minmod(qpp - qp, qp - q)
    return q + sL, qp - sR


def _rusanov_faces(cfg, phi_u, phi_v, u, v, axis: int,
                   shift=shift_wrapped, sinh=jnp.sinh):
    """Rusanov (LLF) face fluxes for both components along one axis.

    `u`/`v` are the decoded velocities (sinh(phi)*u0), passed in so the
    non-MUSCL path never re-decodes: sinh is elementwise and the face
    shift is a permutation, so shift(sinh(phi)) == sinh(shift(phi))
    BITWISE — reusing the step's one decode halves the transcendental
    count of this transcendental-bound solver (BASELINE.md roofline:
    the asinh codec, not the flux arithmetic, is the bound).  The MUSCL
    path reconstructs on phi and must decode the reconstructed faces
    (tau_burgers.cu:379-395 semantics)."""
    if cfg.muscl:
        pUL, pUR = _muscl_faces(phi_u, axis, shift)
        pVL, pVR = _muscl_faces(phi_v, axis, shift)
        uL, vL = _decode(cfg, pUL, sinh), _decode(cfg, pVL, sinh)
        uR, vR = _decode(cfg, pUR, sinh), _decode(cfg, pVR, sinh)
    else:
        uL, vL = u, v
        uR = shift(u, 0, 1) if axis == 0 else shift(u, 1, 0)
        vR = shift(v, 0, 1) if axis == 0 else shift(v, 1, 0)

    if axis == 0:
        FL_u, FL_v = 0.5 * uL * uL, uL * vL
        FR_u, FR_v = 0.5 * uR * uR, uR * vR
        a = jnp.maximum(jnp.abs(uL), jnp.abs(uR))
        F_u = 0.5 * (FL_u + FR_u) - 0.5 * a * (uR - uL)
        F_v = 0.5 * (FL_v + FR_v) - 0.5 * a * (vR - vL)
    else:
        GL_u, GL_v = uL * vL, 0.5 * vL * vL
        GR_u, GR_v = uR * vR, 0.5 * vR * vR
        a = jnp.maximum(jnp.abs(vL), jnp.abs(vR))
        F_u = 0.5 * (GL_u + GR_u) - 0.5 * a * (uR - uL)
        F_v = 0.5 * (GL_v + GR_v) - 0.5 * a * (vR - vL)
    return F_u, F_v


def step_fields(cfg: BurgersConfig, phi_u, phi_v, t,
                shift=shift_wrapped, wavespeed_reduce=None,
                codec=(jnp.sinh, jnp.arcsinh)):
    """One τ-clock step on the raw (phi_u, phi_v) fields; returns
    (phi_u2, phi_v2) (tau_burgers.cu do_step :677-718).

    `shift` is the periodic 2-D shift primitive — shift_wrapped for the
    XLA path, a pltpu.roll-based equivalent inside the resident Pallas
    kernel (kernels/burgers_resident_pallas.py) — so both engines share
    this one physics source.  `wavespeed_reduce` (e.g. lax.pmax over a
    mesh axis) extends the CFL max across devices for the sharded path.
    `codec` is the (sinh, asinh) pair for the log-velocity state — the
    kernel passes (sinh_mosaic, asinh_mosaic) because Mosaic has no
    sinh/asinh lowering."""
    sinh, asinh = codec
    one_d = cfg.colehopf
    # the ONE decode of the step: faces reuse u0/v0 (see _rusanov_faces)
    u0 = _decode(cfg, phi_u, sinh)
    v0 = _decode(cfg, phi_v, sinh)
    u, v = u0, v0

    inv_dy = 0.0 if (one_d or cfg.ny <= 1) else 1.0 / cfg.dy
    smax = jnp.max(jnp.abs(u) / cfg.dx + jnp.abs(v) * inv_dy)
    if wavespeed_reduce is not None:
        smax = wavespeed_reduce(smax)
    smax = jnp.maximum(smax, 1e-12)
    dt = jnp.minimum(t * cfg.dtau, cfg.cfl / smax)

    Fu_x, Fv_x = _rusanov_faces(cfg, phi_u, phi_v, u0, v0, axis=0,
                                shift=shift, sinh=sinh)
    dFx_u = Fu_x - shift(Fu_x, 0, -1)
    dFx_v = Fv_x - shift(Fv_x, 0, -1)
    u = u - dt * dFx_u / cfg.dx
    v = v - dt * dFx_v / cfg.dx

    if not one_d:
        Gu_y, Gv_y = _rusanov_faces(cfg, phi_u, phi_v, u0, v0, axis=1,
                                    shift=shift, sinh=sinh)
        dGy_u = Gu_y - shift(Gu_y, -1, 0)
        dGy_v = Gv_y - shift(Gv_y, -1, 0)
        u = u - dt * dGy_u / cfg.dy
        v = v - dt * dGy_v / cfg.dy

    # Viscosity substeps (tau_burgers.cu:490-525, :711-717). The reference
    # re-encodes phi between substeps; sinh(asinh(x)) is the identity, so we
    # stay in real velocity across substeps and encode once at the end.
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)
    inv_dy2 = 0.0 if one_d else 1.0 / (cfg.dy * cfg.dy)
    sub = dt / cfg.visc_substeps
    for _ in range(cfg.visc_substeps):
        lap_u = (
            (shift(u, 0, 1) - 2 * u + shift(u, 0, -1)) * inv_dx2
            + (shift(u, 1, 0) - 2 * u + shift(u, -1, 0)) * inv_dy2
        )
        lap_v = (
            (shift(v, 0, 1) - 2 * v + shift(v, 0, -1)) * inv_dx2
            + (shift(v, 1, 0) - 2 * v + shift(v, -1, 0)) * inv_dy2
        )
        u = u + cfg.nu * sub * lap_u
        v = v + cfg.nu * sub * lap_v

    return _encode(cfg, u, asinh), _encode(cfg, v, asinh)


def step(cfg: BurgersConfig, s: BurgersState,
         wavespeed_reduce=None) -> BurgersState:
    phi_u2, phi_v2 = step_fields(cfg, s.phi_u, s.phi_v, s.t,
                                 wavespeed_reduce=wavespeed_reduce)
    return BurgersState(
        phi_u=phi_u2,
        phi_v=phi_v2,
        t=s.t * jnp.exp(jnp.asarray(cfg.dtau, s.t.dtype)),
        tau=s.tau + cfg.dtau,
    )


def resolve_engine(cfg: BurgersConfig) -> str:
    """'pallas' = the whole-solve VMEM-resident K-step kernel
    (kernels/burgers_resident_pallas.make_multistep_pallas).  Needs f32,
    nx % 128 == 0, nx*ny <= 3M cells, not colehopf.  'auto' takes it on
    TPU: measured 42115 steps/s at the 512^2 reference default with k=16
    vs 22648 for the XLA path — 1.86x (round-3 tune sweep, after the
    sinh_mosaic/asinh_mosaic codec fix; a few-ulp codec difference vs
    the XLA path's native sinh/asinh)."""
    from ..kernels.burgers_resident_pallas import resident_eligible

    if cfg.engine != "auto":
        if cfg.engine == "pallas" and not resident_eligible(cfg):
            raise ValueError(
                "engine='pallas' requires float32, nx % 128 == 0, "
                "nx*ny <= 3M cells and colehopf=False")
        return cfg.engine
    import jax

    return ("pallas" if (resident_eligible(cfg)
                         and jax.default_backend() == "tpu") else "xla")


def run(cfg: BurgersConfig, s: BurgersState, n_steps: int) -> BurgersState:
    from ..core.stepper import scan_steps

    if resolve_engine(cfg) == "pallas":
        import jax

        from ..kernels.burgers_resident_pallas import run_multistep

        return run_multistep(cfg, s, n_steps, k=cfg.block_k,
                             interpret=jax.default_backend() != "tpu")
    return scan_steps(lambda st: step(cfg, st), s, n_steps)
