"""Independent per-cell float64 oracle for the shallow-water solver.

Transcribes tau_shallow_water.cu's step (hll_x/hll_y :327-391,
flux kernels :425-471, update_kernel :474-514 with the depth floor
before the velocity division, viscosity_uv :516-545, tau clock) as
plain loops over cells and faces.  The reference's viscosity kernel
reads neighbors it may have already overwritten (a benign data race);
both this oracle and the solver use the deterministic reading — both
Laplacians evaluated on the pre-viscosity field."""

from __future__ import annotations

import math

import numpy as np

H_EPS = 1e-6


def _hll(hL, uL, vL, hR, uR, vR, g, axis):
    cL, cR = math.sqrt(g * hL), math.sqrt(g * hR)
    unL = uL if axis == 0 else vL
    unR = uR if axis == 0 else vR
    sL = min(unL - cL, unR - cR)
    sR = max(unL + cL, unR + cR)
    mL, mR = hL * uL, hR * uR
    nL, nR = hL * vL, hR * vR
    if axis == 0:
        FL = (mL, mL * uL + 0.5 * g * hL * hL, mL * vL)
        FR = (mR, mR * uR + 0.5 * g * hR * hR, mR * vR)
    else:
        FL = (nL, mL * vL, nL * vL + 0.5 * g * hL * hL)
        FR = (nR, mR * vR, nR * vR + 0.5 * g * hR * hR)
    if sL >= 0.0:
        return FL
    if sR <= 0.0:
        return FR
    UL = (hL, mL, nL)
    UR = (hR, mR, nR)
    inv = 1.0 / (sR - sL)
    return tuple(
        (sR * fl - sL * fr + sR * sL * (ur - ul)) * inv
        for fl, fr, ul, ur in zip(FL, FR, UL, UR)
    )


class SWOracle:
    def __init__(self, cfg, sigma, u, v, t, tau):
        self.cfg = cfg
        self.sigma = np.asarray(sigma, np.float64).copy()
        self.u = np.asarray(u, np.float64).copy()
        self.v = np.asarray(v, np.float64).copy()
        self.t = float(t)
        self.tau = float(tau)

    def step(self):
        cfg = self.cfg
        nx, ny = cfg.nx, cfg.ny
        g = cfg.g
        h = np.exp(self.sigma)

        cmax = 1e-12
        for j in range(ny):
            for i in range(nx):
                c = math.sqrt(g * h[j, i])
                cmax = max(cmax, max(abs(self.u[j, i]) + c,
                                     abs(self.v[j, i]) + c))
        dt = min(self.t * cfg.dtau, cfg.cfl * min(cfg.dx, cfg.dy) / cmax)

        Fx = np.empty((ny, nx, 3))
        Gy = np.empty((ny, nx, 3))
        for j in range(ny):
            for i in range(nx):
                iR = (i + 1) % nx
                Fx[j, i] = _hll(h[j, i], self.u[j, i], self.v[j, i],
                                h[j, iR], self.u[j, iR], self.v[j, iR],
                                g, 0)
                jT = (j + 1) % ny
                Gy[j, i] = _hll(h[j, i], self.u[j, i], self.v[j, i],
                                h[jT, i], self.u[jT, i], self.v[jT, i],
                                g, 1)

        h2 = np.empty_like(h)
        u2 = np.empty_like(h)
        v2 = np.empty_like(h)
        inv_dx, inv_dy = 1.0 / cfg.dx, 1.0 / cfg.dy
        for j in range(ny):
            for i in range(nx):
                im, jm = (i - 1) % nx, (j - 1) % ny
                hh = h[j, i]
                mx = hh * self.u[j, i]
                my = hh * self.v[j, i]
                hh = hh - dt * ((Fx[j, i, 0] - Fx[j, im, 0]) * inv_dx
                                + (Gy[j, i, 0] - Gy[jm, i, 0]) * inv_dy)
                mx = mx - dt * ((Fx[j, i, 1] - Fx[j, im, 1]) * inv_dx
                                + (Gy[j, i, 1] - Gy[jm, i, 1]) * inv_dy)
                my = my - dt * ((Fx[j, i, 2] - Fx[j, im, 2]) * inv_dx
                                + (Gy[j, i, 2] - Gy[jm, i, 2]) * inv_dy)
                hh = max(hh, H_EPS)
                h2[j, i] = hh
                u2[j, i] = mx / hh
                v2[j, i] = my / hh

        if cfg.nu > 0.0:
            inv_dx2, inv_dy2 = inv_dx * inv_dx, inv_dy * inv_dy
            for f in (u2, v2):
                lap = np.empty_like(f)
                for j in range(ny):
                    for i in range(nx):
                        lap[j, i] = (
                            (f[j, (i + 1) % nx] - 2 * f[j, i]
                             + f[j, (i - 1) % nx]) * inv_dx2
                            + (f[(j + 1) % ny, i] - 2 * f[j, i]
                               + f[(j - 1) % ny, i]) * inv_dy2)
                f += cfg.nu * dt * lap

        self.sigma = np.log(h2)
        self.u = u2
        self.v = v2
        self.t *= math.exp(cfg.dtau)
        self.tau += cfg.dtau
