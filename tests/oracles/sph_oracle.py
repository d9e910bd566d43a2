"""Independent all-pairs float64 oracle for the weakly-compressible SPH
solver.

Transcribes tau_sph.cu's substep pipeline (W_cubic :105-116, gradW_cubic
:118-135, k_density_pressure_cell :178-214 with the log-density Tait EOS,
k_forces_cell :216-273 with Monaghan viscosity, k_integrate :324-350
restitution walls, k_xsph_cell :275-313 applied AFTER integration with
the pre-integration densities — the reference's call-order quirk,
:694-705; clock :660-721) as per-particle Python loops over ALL pairs
within the 2h kernel support — structurally unlike the cell-dense
vectorized solver.  Rain must be disabled (the LCG emitter is exercised
separately)."""

from __future__ import annotations

import math

import numpy as np


def _w_cubic(r, h):
    q = r / h
    alpha = 10.0 / (7.0 * math.pi * h * h)
    if q < 1.0:
        return alpha * (1.0 - 1.5 * q * q + 0.75 * q ** 3)
    if q < 2.0:
        t = 2.0 - q
        return alpha * 0.25 * t ** 3
    return 0.0


def _gradw_cubic(rx, ry, r, h):
    if r <= 1e-8 or r >= 2.0 * h:
        return 0.0, 0.0
    q = r / h
    alpha = 10.0 / (7.0 * math.pi * h * h)
    if q < 1.0:
        dwdq = alpha * (-3.0 * q + 2.25 * q * q)
    else:
        t = 2.0 - q
        dwdq = alpha * (-0.75 * t * t)
    f = dwdq / (h * r)
    return f * rx, f * ry


class SPHOracle:
    def __init__(self, cfg, pos, vel, t, tau):
        assert not cfg.rain, "oracle covers the rain-free pipeline"
        self.cfg = cfg
        self.pos = np.asarray(pos, np.float64).copy()
        self.vel = np.asarray(vel, np.float64).copy()
        self.t = float(t)
        self.tau = float(tau)

    def step(self):
        cfg = self.cfg
        n = len(self.pos)
        h = cfg.h
        mass = cfg.mass
        K = max(cfg.visc_substeps, 1)
        dt_try = self.t * cfg.dtau
        dt_cfl = cfg.cfl * h / (cfg.c0 * (1.0 + 2.0 * cfg.visc_alpha))
        dt_eff = min(dt_try, dt_cfl)
        dt = dt_eff / K
        twoh2 = (2.0 * h) ** 2

        for _ in range(K):
            # density + Tait pressure on log-density (k_density_pressure)
            s_log = np.empty(n)
            press = np.empty(n)
            for i in range(n):
                rho = 0.0
                for j in range(n):  # includes self
                    rx = self.pos[i, 0] - self.pos[j, 0]
                    ry = self.pos[i, 1] - self.pos[j, 1]
                    r2 = rx * rx + ry * ry
                    if r2 >= twoh2:
                        continue
                    rho += mass * _w_cubic(math.sqrt(r2), h)
                si = math.log(max(rho, 1e-6))
                s_log[i] = si
                rho = math.exp(si)
                p = (cfg.c0 ** 2) * cfg.rho0 * (
                    (rho / cfg.rho0) ** cfg.gamma_eos - 1.0) / cfg.gamma_eos
                press[i] = max(p, 0.0)

            # forces (k_forces_cell)
            acc = np.zeros((n, 2))
            for i in range(n):
                rhoi = math.exp(s_log[i])
                pi_ = press[i]
                ax = ay = 0.0
                for j in range(n):
                    if j == i:
                        continue
                    rx = self.pos[i, 0] - self.pos[j, 0]
                    ry = self.pos[i, 1] - self.pos[j, 1]
                    r2 = rx * rx + ry * ry
                    if r2 >= twoh2 or r2 <= 1e-16:
                        continue
                    r = math.sqrt(r2)
                    gwx, gwy = _gradw_cubic(rx, ry, r, h)
                    rhoj = math.exp(s_log[j])
                    common = -mass * (pi_ / (rhoi * rhoi)
                                      + press[j] / (rhoj * rhoj))
                    ax += common * gwx
                    ay += common * gwy
                    if cfg.use_visc:
                        vijx = self.vel[i, 0] - self.vel[j, 0]
                        vijy = self.vel[i, 1] - self.vel[j, 1]
                        dot = vijx * rx + vijy * ry
                        if dot < 0.0:
                            mu = (h * dot) / (r2 + 0.01 * h * h)
                            rho_bar = 0.5 * (rhoi + rhoj)
                            pi_ij = (-cfg.visc_alpha * cfg.c0 * mu) / rho_bar
                            ax += -mass * pi_ij * gwx
                            ay += -mass * pi_ij * gwy
                if cfg.use_grav:
                    ay += -cfg.gravity
                acc[i] = (ax, ay)

            # integrate with restitution walls (k_integrate)
            pre_pos = self.pos.copy()
            for i in range(n):
                v = self.vel[i] + acc[i] * dt
                x = self.pos[i] + v * dt
                e = 0.2
                if x[0] < 0.0:
                    x[0] = 0.0
                    v[0] = -e * v[0]
                if x[0] > cfg.box_x:
                    x[0] = cfg.box_x
                    v[0] = -e * v[0]
                if x[1] < 0.0:
                    x[1] = 0.0
                    v[1] = -e * v[1]
                if x[1] > cfg.box_y:
                    x[1] = cfg.box_y
                    v[1] = -e * v[1]
                self.pos[i] = x
                self.vel[i] = v

            # XSPH after integration, with pre-integration densities but
            # post-integration pos/vel (the reference's call order)
            if cfg.use_xsph and cfg.xsph_eps > 0.0:
                del pre_pos  # the reference reads the UPDATED positions
                dvel = np.zeros((n, 2))
                for i in range(n):
                    rhoi = math.exp(s_log[i])
                    dx = dy = 0.0
                    for j in range(n):
                        if j == i:
                            continue
                        rx = self.pos[i, 0] - self.pos[j, 0]
                        ry = self.pos[i, 1] - self.pos[j, 1]
                        r2 = rx * rx + ry * ry
                        if r2 >= twoh2:
                            continue
                        w = _w_cubic(math.sqrt(r2), h)
                        rho_bar = 0.5 * (rhoi + math.exp(s_log[j]))
                        dx += (mass / rho_bar) * (
                            self.vel[j, 0] - self.vel[i, 0]) * w
                        dy += (mass / rho_bar) * (
                            self.vel[j, 1] - self.vel[i, 1]) * w
                    dvel[i] = (cfg.xsph_eps * dx, cfg.xsph_eps * dy)
                self.vel += dvel

            # clock (:719-721)
            self.tau += dt / max(self.t, 1e-9)
            self.t = cfg.t0 * math.exp(self.tau)
