"""Independent per-cell float64 oracle for the 2-D viscous Burgers solver.

Transcribes tau_burgers.cu's do_step (:677-718): per-cell CFL wavespeed
max, Rusanov x/y face fluxes with optional MUSCL minmod slopes on the
asinh-encoded state (flux_x_kernel :364-409, flux_y_kernel :411-456),
conservative convective update (update_convective :458-488), and K
viscosity substeps (viscosity_step :490-526) — as plain loops.  The
reference re-encodes phi=asinh(u/u0) after every stage; the vectorized
solver stays in real velocity across substeps (sinh∘asinh is the
identity to 1 ulp), so float64 agreement is to that reassociation
level.  2-D mode only (the 1-D Cole-Hopf mode has its own analytic
gate)."""

from __future__ import annotations

import math

import numpy as np


def _mm(a, b):
    if a * b <= 0.0:
        return 0.0
    return a if abs(a) < abs(b) else b


class BurgersOracle:
    def __init__(self, cfg, phi_u, phi_v, t, tau):
        assert not cfg.colehopf
        self.cfg = cfg
        self.pu = np.asarray(phi_u, np.float64).copy()
        self.pv = np.asarray(phi_v, np.float64).copy()
        self.t = float(t)
        self.tau = float(tau)

    def step(self):
        cfg = self.cfg
        nx, ny = cfg.nx, cfg.ny
        u0 = cfg.u0
        u = u0 * np.sinh(self.pu)
        v = u0 * np.sinh(self.pv)

        smax = 1e-12
        for j in range(ny):
            for i in range(nx):
                smax = max(smax, abs(u[j, i]) / cfg.dx
                           + abs(v[j, i]) / cfg.dy)
        dt = min(self.t * cfg.dtau, cfg.cfl / smax)

        def face(pL, pR, pLm, pRp):
            if cfg.muscl:
                sL = 0.5 * _mm(pL - pLm, pR - pL)
                sR = 0.5 * _mm(pRp - pR, pR - pL)
                return pL + sL, pR - sR
            return pL, pR

        Fu = np.empty((ny, nx))
        Fv = np.empty((ny, nx))
        Gu = np.empty((ny, nx))
        Gv = np.empty((ny, nx))
        for j in range(ny):
            for i in range(nx):
                iR, iLm, iRp = (i + 1) % nx, (i - 1) % nx, (i + 2) % nx
                pUL, pUR = face(self.pu[j, i], self.pu[j, iR],
                                self.pu[j, iLm], self.pu[j, iRp])
                pVL, pVR = face(self.pv[j, i], self.pv[j, iR],
                                self.pv[j, iLm], self.pv[j, iRp])
                uL, vL = u0 * math.sinh(pUL), u0 * math.sinh(pVL)
                uR, vR = u0 * math.sinh(pUR), u0 * math.sinh(pVR)
                a = max(abs(uL), abs(uR))
                Fu[j, i] = 0.5 * (0.5 * uL * uL + 0.5 * uR * uR) \
                    - 0.5 * a * (uR - uL)
                Fv[j, i] = 0.5 * (uL * vL + uR * vR) - 0.5 * a * (vR - vL)

                jT, jBm, jTp = (j + 1) % ny, (j - 1) % ny, (j + 2) % ny
                pUB, pUT = face(self.pu[j, i], self.pu[jT, i],
                                self.pu[jBm, i], self.pu[jTp, i])
                pVB, pVT = face(self.pv[j, i], self.pv[jT, i],
                                self.pv[jBm, i], self.pv[jTp, i])
                uB, vB = u0 * math.sinh(pUB), u0 * math.sinh(pVB)
                uT, vT = u0 * math.sinh(pUT), u0 * math.sinh(pVT)
                ay = max(abs(vB), abs(vT))
                Gu[j, i] = 0.5 * (uB * vB + uT * vT) - 0.5 * ay * (uT - uB)
                Gv[j, i] = 0.5 * (0.5 * vB * vB + 0.5 * vT * vT) \
                    - 0.5 * ay * (vT - vB)

        u2 = np.empty_like(u)
        v2 = np.empty_like(v)
        for j in range(ny):
            for i in range(nx):
                im, jm = (i - 1) % nx, (j - 1) % ny
                u2[j, i] = u[j, i] - dt * (
                    (Fu[j, i] - Fu[j, im]) / cfg.dx
                    + (Gu[j, i] - Gu[jm, i]) / cfg.dy)
                v2[j, i] = v[j, i] - dt * (
                    (Fv[j, i] - Fv[j, im]) / cfg.dx
                    + (Gv[j, i] - Gv[jm, i]) / cfg.dy)

        K = max(cfg.visc_substeps, 1)
        sub = dt / K
        for _ in range(K):
            un = np.empty_like(u2)
            vn = np.empty_like(v2)
            for j in range(ny):
                for i in range(nx):
                    for f, o in ((u2, un), (v2, vn)):
                        lap = (f[j, (i + 1) % nx] - 2 * f[j, i]
                               + f[j, (i - 1) % nx]) / (cfg.dx * cfg.dx) \
                            + (f[(j + 1) % ny, i] - 2 * f[j, i]
                               + f[(j - 1) % ny, i]) / (cfg.dy * cfg.dy)
                        o[j, i] = f[j, i] + cfg.nu * sub * lap
            u2, v2 = un, vn

        self.pu = np.arcsinh(u2 / u0)
        self.pv = np.arcsinh(v2 / u0)
        self.t *= math.exp(cfg.dtau)
        self.tau += cfg.dtau
