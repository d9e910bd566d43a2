"""Independent per-cell float64 oracle for the ideal-MHD + GLM solver.

Transcribes tau_mhd.c's step (:159-176) literally: full-grid fast-speed
max, MC-limited conserved-variable MUSCL faces (slope_at/slope_y_at
:129-142), the FHLL flux with the reference's anti-diffusive sign on the
U-jump term (:103-127, kept as documented behavior), conservative
face-pair scatter over the interior bands, GLM psi damping, and the
invalid-cell revert — as plain Python loops, structurally unlike the
vectorized solver.  Requires cfg.stable_hll=False (the parity mode)."""

from __future__ import annotations

import math

import numpy as np

GAMMA = 1.4
EPS_RHO = 1e-8
EPS_P = 1e-8
GLM_ALPHA = 0.18
NC = 7  # rho, mx, my, E, Bx, By, psi


def _c2p(c):
    rho = max(c[0], EPS_RHO)
    u, v = c[1] / rho, c[2] / rho
    Bx, By, psi = c[4], c[5], c[6]
    ek = 0.5 * rho * (u * u + v * v)
    em = 0.5 * (Bx * Bx + By * By)
    p = max((GAMMA - 1.0) * (c[3] - ek - em), EPS_P)
    return rho, u, v, p, Bx, By, psi


def _fast(pr, xdir):
    rho, u, v, p, Bx, By, psi = pr
    a2 = GAMMA * p / rho
    b2 = (Bx * Bx + By * By) / rho
    bn2 = (Bx if xdir else By) ** 2 / rho
    disc = max((a2 + b2) ** 2 - 4.0 * a2 * bn2, 0.0)
    return math.sqrt(0.5 * ((a2 + b2) + math.sqrt(disc)))


def _flux(c, ch, xdir):
    rho, u, v, p, Bx, By, psi = _c2p(c)
    pt = p + 0.5 * (Bx * Bx + By * By)
    vb = u * Bx + v * By
    if xdir:
        return np.array([c[1], c[1] * u + pt - Bx * Bx, c[2] * u - Bx * By,
                         (c[3] + pt) * u - Bx * vb, psi,
                         u * By - v * Bx, ch * ch * Bx])
    return np.array([c[2], c[1] * v - By * Bx, c[2] * v + pt - By * By,
                     (c[3] + pt) * v - By * vb, v * Bx - u * By, psi,
                     ch * ch * By])


def _hlld_glm(UL, UR, xdir, ch):
    L, R = _c2p(UL), _c2p(UR)
    unL = L[1] if xdir else L[2]
    unR = R[1] if xdir else R[2]
    cfL, cfR = _fast(L, xdir), _fast(R, xdir)
    SL = min(min(unL - cfL, unR - cfR), -ch)
    SR = max(max(unL + cfL, unR + cfR), ch)
    FL, FR = _flux(UL, ch, xdir), _flux(UR, ch, xdir)
    if SL >= 0.0:
        return FL
    if SR <= 0.0:
        return FR
    # the reference's anti-diffusive sign: -(UR-UL)*SL*SR, tau_mhd.c:123
    FHLL = (FL * SR - FR * SL - (UR - UL) * SL * SR) / (SR - SL)
    ptL = L[3] + 0.5 * (L[4] ** 2 + L[5] ** 2)
    ptR = R[3] + 0.5 * (R[4] ** 2 + R[5] ** 2)
    den = L[0] * (SL - unL) - R[0] * (SR - unR)
    SM = (ptR - ptL + L[0] * unL * (SL - unL)
          - R[0] * unR * (SR - unR)) / den if den != 0 else math.inf
    ptStar = 0.5 * (ptL + ptR + L[0] * (SL - unL) * (SM - unL)
                    + R[0] * (SR - unR) * (SM - unR)) \
        if math.isfinite(SM) else math.inf
    # both branches return FHLL (the reference keeps the HLL family)
    _ = ptStar
    return FHLL


def _mm(a, b):
    if a * b <= 0.0:
        return 0.0
    return a if abs(a) < abs(b) else b


def _mc(dl, dc, dr):
    return _mm(_mm(dl, dr), _mm(dc, _mm(2.0 * dl, 2.0 * dr)))


class MHDOracle:
    def __init__(self, cfg, U, t=0.0):
        assert not cfg.stable_hll, "oracle transcribes the parity flux"
        self.cfg = cfg
        # (ny, nx, 7)
        self.U = np.stack([np.asarray(f, np.float64) for f in U], -1).copy()
        self.t = float(t)

    def _slope(self, x, y, dx, dy):
        q = self.U[y, x]
        qm = self.U[y - dy, x - dx]
        qp = self.U[y + dy, x + dx]
        return np.array([
            _mc(q[k] - qm[k], 0.5 * (qp[k] - qm[k]), qp[k] - q[k])
            for k in range(NC)
        ])

    def step(self):
        cfg = self.cfg
        Wd, Hd = cfg.nx, cfg.ny
        maxs = 1e-6
        for y in range(Hd):
            for x in range(Wd):
                pr = _c2p(self.U[y, x])
                maxs = max(maxs, math.hypot(pr[1], pr[2])
                           + max(_fast(pr, 1), _fast(pr, 0)))
        dx, dy = 1.0 / Wd, 1.0 / Hd
        ch = maxs
        dt = cfg.cfl * min(dx, dy) / max(maxs + ch, 1e-6)

        Unew = self.U.copy()
        for y in range(1, Hd - 1):
            for x in range(1, Wd - 2):
                qL = self.U[y, x] + 0.5 * self._slope(x, y, 1, 0)
                qR = self.U[y, x + 1] - 0.5 * self._slope(x + 1, y, 1, 0)
                f = _hlld_glm(qL, qR, 1, ch)
                Unew[y, x] -= f * (dt / dx)
                Unew[y, x + 1] += f * (dt / dx)
        for y in range(1, Hd - 2):
            for x in range(1, Wd - 1):
                qL = self.U[y, x] + 0.5 * self._slope(x, y, 0, 1)
                qR = self.U[y + 1, x] - 0.5 * self._slope(x, y + 1, 0, 1)
                f = _hlld_glm(qL, qR, 0, ch)
                Unew[y, x] -= f * (dt / dy)
                Unew[y + 1, x] += f * (dt / dy)

        damp = math.exp(-GLM_ALPHA * ch * dt / min(dx, dy))
        for y in range(Hd):
            for x in range(Wd):
                Unew[y, x, 6] *= damp
                c = Unew[y, x]
                pr = _c2p(c)
                ok = (all(math.isfinite(v) for v in c)
                      and pr[0] > EPS_RHO and pr[3] > EPS_P)
                if not ok:
                    Unew[y, x] = self.U[y, x]
        self.U = Unew
        self.t += dt
