"""Independent per-cell float64 oracle for the log-η Stam solver.

Transcribes js_cuda.cu's frame (:361-368: k_decay -> k_add_source ->
vel_step -> dens_step) literally on (N+2)^2 arrays with the reference's
permanently-zero ghost ring: k_lin Jacobi ping-pong (:70-79, lin_solve
:143-158 — the warm start is the output buffer's stale interior),
η-space semi-Lagrangian advection with the C int-cast truncation
(k_adv :82-102), metric divergence/projection with the reference's
divide-then-multiply cell widths (k_div :105-114, k_proj :116-124), and
the orbiting source with integer-truncated center (k_add_source
:126-141)."""

from __future__ import annotations

import math

import numpy as np


class Stam2DOracle:
    def __init__(self, cfg, u, v, u0, v0, d, d0, step_idx=0):
        self.cfg = cfg
        n = cfg.n

        def full(interior):
            f = np.zeros((n + 2, n + 2))
            f[1:-1, 1:-1] = np.asarray(interior, np.float64)
            return f

        # arrays indexed [j, i] like the solver; IX(i, j) = [j, i]
        self.u, self.v = full(u), full(v)
        self.u0, self.v0 = full(u0), full(v0)
        self.d, self.d0 = full(d), full(d0)
        self.step_idx = int(step_idx)

        deta = (cfg.eta_max - cfg.eta_min) / n
        idx = np.arange(0, n + 2)
        eta = cfg.eta_min + (idx - 0.5) * deta
        self.dxw = cfg.x0 * (np.exp(eta + deta / 2) - np.exp(eta - deta / 2))
        self.dyw = cfg.y0 * (np.exp(eta + deta / 2) - np.exp(eta - deta / 2))
        self.deta = deta

    # ------------------------------------------------------------------

    def _lin_solve(self, x, x0, a, c, iters=None):
        cfg = self.cfg
        iters = cfg.jacobi_iters if iters is None else iters
        read = x.copy()
        for _ in range(iters):
            new = np.zeros_like(read)
            new[1:-1, 1:-1] = (
                x0[1:-1, 1:-1] + a * (read[1:-1, :-2] + read[1:-1, 2:]
                                      + read[:-2, 1:-1] + read[2:, 1:-1])
            ) / c
            read = new
        return read

    def _diffuse(self, x, x0, diffc):
        n = self.cfg.n
        a = self.cfg.dt * diffc * n * n
        return self._lin_solve(x, x0, a, 1.0 + 4.0 * a)

    def _adv(self, q0, uu, vv):
        cfg = self.cfg
        n = cfg.n
        out = np.zeros_like(q0)
        for j in range(1, n + 1):
            for i in range(1, n + 1):
                ex = cfg.eta_min + (i - 0.5) * self.deta
                ey = cfg.eta_min + (j - 0.5) * self.deta
                xp = cfg.x0 * math.exp(ex)
                yp = cfg.y0 * math.exp(ey)
                bx = ex - cfg.dt * uu[j, i] / xp
                by = ey - cfg.dt * vv[j, i] / yp
                s = (bx - cfg.eta_min) / self.deta + 0.5
                t = (by - cfg.eta_min) / self.deta + 0.5
                s = min(max(s, 0.5), n + 0.5)
                t = min(max(t, 0.5), n + 0.5)
                i0 = int(s)   # C int cast: truncation
                j0 = int(t)
                i1, j1 = i0 + 1, j0 + 1
                s1, t1 = s - i0, t - j0
                s0, t0 = 1 - s1, 1 - t1
                out[j, i] = s0 * (t0 * q0[j0, i0] + t1 * q0[j1, i0]) \
                    + s1 * (t0 * q0[j0, i1] + t1 * q0[j1, i1])
        return out

    def _div_p(self, uu, vv):
        n = self.cfg.n
        div = np.zeros_like(uu)
        div[1:-1, 1:-1] = -0.5 * (
            (uu[1:-1, 2:] - uu[1:-1, :-2]) / self.dxw[None, 1:n + 1]
            + (vv[2:, 1:-1] - vv[:-2, 1:-1]) / self.dyw[1:n + 1, None]
        )
        return div

    def _proj(self, uu, vv, p):
        n = self.cfg.n
        uu[1:-1, 1:-1] -= 0.5 * self.dxw[None, 1:n + 1] * (
            p[1:-1, 2:] - p[1:-1, :-2])
        vv[1:-1, 1:-1] -= 0.5 * self.dyw[1:n + 1, None] * (
            p[2:, 1:-1] - p[:-2, 1:-1])

    # ------------------------------------------------------------------

    def step(self):
        cfg = self.cfg
        n = cfg.n

        # decay + orbiting source (k_decay, k_add_source)
        self.d[1:-1, 1:-1] *= cfg.dens_decay
        ang = self.step_idx * 0.015
        cx = n // 2 + int((n / 4) * math.cos(ang))
        cy = n // 2 + int((n / 4) * math.sin(ang))
        amp = 0.5 + 0.4 * math.sin(self.step_idx * 0.02)
        R, swirl = 3.0, 0.6
        for j in range(1, n + 1):
            for i in range(1, n + 1):
                dx, dy = i - cx, j - cy
                r2 = dx * dx + dy * dy
                if r2 < R * R:
                    r = math.sqrt(r2) + 1e-6
                    self.d[j, i] += amp * math.exp(-r2 / (R * R))
                    self.u[j, i] += -swirl * dy / r
                    self.v[j, i] += swirl * dx / r

        # vel_step
        self.u0 = self._diffuse(self.u0, self.u, cfg.visc)
        self.v0 = self._diffuse(self.v0, self.v, cfg.visc)
        div = self._div_p(self.u0, self.v0)
        p = self._lin_solve(np.zeros_like(div), div, 1.0, 4.0)
        self._proj(self.u0, self.v0, p)
        self.u = self._adv(self.u0, self.u0, self.v0)
        self.v = self._adv(self.v0, self.u0, self.v0)
        div = self._div_p(self.u, self.v)
        p = self._lin_solve(np.zeros_like(div), div, 1.0, 4.0)
        self._proj(self.u, self.v, p)

        # dens_step
        self.d0 = self._diffuse(self.d0, self.d, cfg.diff)
        self.d = self._adv(self.d0, self.u, self.v)

        self.step_idx += 1
