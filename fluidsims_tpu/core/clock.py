"""Time-stepping clocks: CFL controller and the log-time (τ) clock.

The reference's "tau_" programs advance a log-time clock `t = t0 * e^τ`
with `dt_eff = min(t*dτ, dt_CFL)` (tau_burgers.cu:13,692,
tau_shallow_water.cu:8-10,688, tau_sph.cu:666-668,718-721), and the 3-D
solver adds a feedback controller that shrinks dτ by 0.8x when the τ-step
exceeds the CFL limit and grows it by 1.1x otherwise
(tau_hypersonic_3d_cuda.cu:1697-1704, th3cs.cu:1178-1183).

Everything here is a pure function of traced scalars so the whole
steps-per-frame loop stays inside one compiled `lax.scan` — unlike the
reference, which syncs dt to the host every step
(tau_hypersonic_cuda.cu:1846-1850).  Keeping dt on-device deletes that
device→host round trip entirely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["TauClock", "tau_tick", "tau_tick_feedback", "dtau_feedback", "cfl_dt"]


class TauClock(NamedTuple):
    """Carry state for the τ clock (all traced scalars)."""

    t: jnp.ndarray      # physical time
    tau: jnp.ndarray    # log-time
    dtau: jnp.ndarray   # current log-time step


def tau_clock(t0: float = 1e-3, dtau: float = 1e-2, dtype=jnp.float32) -> TauClock:
    return TauClock(
        t=jnp.asarray(t0, dtype),
        tau=jnp.asarray(0.0, dtype),
        dtau=jnp.asarray(dtau, dtype),
    )


def tau_tick(clock: TauClock, dt_cfl) -> tuple[TauClock, jnp.ndarray]:
    """One τ-clock advance with CFL capping: dt = min(t*dτ, dt_cfl).

    Mirrors the simple variant (tau_burgers.cu:692, tau_sph.cu:718-721):
    the τ coordinate always advances by dτ, physical time by the capped dt.
    """
    dt_tau = clock.t * clock.dtau
    dt = jnp.minimum(dt_tau, dt_cfl)
    new = TauClock(t=clock.t + dt, tau=clock.tau + clock.dtau, dtau=clock.dtau)
    return new, dt


def dtau_feedback(
    dtau,
    dt,
    dt_cfl,
    shrink: float = 0.80,
    grow: float = 1.10,
    hi_band: float = 1.10,
    lo_band: float = 0.85,
    dtau_min: float = 1e-7,
    dtau_max: float = 5e-2,
):
    """The reference's dτ feedback controller with deadband
    (tau_hypersonic_3d_cuda.cu:1697-1704, th3cs.cu:1178-1183).

    Shrink dτ 0.8x only when the τ-implied dt overshoots 1.10*dt_cfl; grow
    1.1x only when it undershoots 0.85*dt_cfl; hold inside the deadband.
    Clamped to the reference's [1e-7, 5e-2].
    """
    return jnp.clip(
        jnp.where(
            dt > hi_band * dt_cfl, dtau * shrink,
            jnp.where(dt < lo_band * dt_cfl, dtau * grow, dtau),
        ),
        dtau_min,
        dtau_max,
    )


def tau_tick_feedback(
    clock: TauClock,
    dt_cfl,
    shrink: float = 0.8,
    grow: float = 1.1,
    dtau_min: float = 1e-7,
    dtau_max: float = 5e-2,
) -> tuple[TauClock, jnp.ndarray]:
    """τ advance with dτ feedback control (tau_hypersonic_3d_cuda.cu:1697-1704).

    dt is capped at the CFL limit, and dτ is adjusted by the reference's
    deadband controller (`dtau_feedback`): shrink 0.8x when the τ-implied dt
    exceeds 1.10*dt_cfl, grow 1.1x when it falls under 0.85*dt_cfl, hold in
    between, clamped to the reference's [1e-7, 5e-2].
    """
    dt_tau = clock.t * clock.dtau
    dt = jnp.minimum(dt_tau, dt_cfl)
    new_dtau = dtau_feedback(
        clock.dtau, dt_tau, dt_cfl,
        shrink=shrink, grow=grow, dtau_min=dtau_min, dtau_max=dtau_max,
    )
    new = TauClock(t=clock.t + dt, tau=clock.tau + clock.dtau, dtau=new_dtau)
    return new, dt


def cfl_dt(max_wavespeed, cfl: float, dx: float = 1.0, nu_max: float = 0.0):
    """Combined convective + explicit-diffusion stable dt.

    dt_conv = CFL*dx/maxs; if diffusion is active the explicit 2-D limit
    dt_diff = 0.25*dx^2/nu caps it (tau_hypersonic_cuda.cu:1852-1865).
    `max_wavespeed` is a traced scalar; non-finite values are floored, so the
    result is always a usable positive dt.
    """
    maxs = jnp.where(jnp.isfinite(max_wavespeed), max_wavespeed, 1e-12)
    maxs = jnp.maximum(maxs, 1e-12)
    dt = cfl * dx / maxs
    if nu_max > 1e-12:
        dt = jnp.minimum(dt, 0.25 * dx * dx / nu_max)
    return dt
