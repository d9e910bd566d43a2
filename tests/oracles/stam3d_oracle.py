"""Independent float64 oracle for the 3-D Stam solver.

Transcribes js_cuda3d.cu's frame (:727-732: decay -> k_add_source3d ->
vel_step -> dens_step) on (N+2)^3 arrays: warm-started 12-iteration
Jacobi ping-pong (lin_solve :297-313), full k_set_bnd reflective
boundaries at the reference's exact call sites (:333-363), trilinear
semi-Lagrangian advection (k_adv3d :192-230, per-cell loops), metric-free
divergence/projection (k_div/k_proj), and the orbiting source with its
crossed u<-dz / w<-dx assignment (:98-117).  Arrays are indexed
[k, j, i] like the solver (reference IX(i, j, k))."""

from __future__ import annotations

import math

import numpy as np


class Stam3DOracle:
    def __init__(self, cfg, u, v, w, u0, v0, w0, d, d0, step_idx=0):
        self.cfg = cfg
        self.u = np.asarray(u, np.float64).copy()
        self.v = np.asarray(v, np.float64).copy()
        self.w = np.asarray(w, np.float64).copy()
        self.u0 = np.asarray(u0, np.float64).copy()
        self.v0 = np.asarray(v0, np.float64).copy()
        self.w0 = np.asarray(w0, np.float64).copy()
        self.d = np.asarray(d, np.float64).copy()
        self.d0 = np.asarray(d0, np.float64).copy()
        self.step_idx = int(step_idx)

    # ------------------------------------------------------------------

    def _lin_solve(self, x, x0, a, c):
        """Ping-pong between the x buffer and the zeroed scratch: only
        interiors are written, so ghost reads alternate between x's ghost
        ring and zeros (lin_solve, js_cuda3d.cu:297-313)."""
        read = x.copy()
        for it in range(self.cfg.jacobi_iters):
            base = np.zeros_like(x) if it % 2 == 0 else x.copy()
            base[1:-1, 1:-1, 1:-1] = (
                x0[1:-1, 1:-1, 1:-1]
                + a * (read[1:-1, 1:-1, :-2] + read[1:-1, 1:-1, 2:]
                       + read[1:-1, :-2, 1:-1] + read[1:-1, 2:, 1:-1]
                       + read[:-2, 1:-1, 1:-1] + read[2:, 1:-1, 1:-1])
            ) / c
            read = base
        if self.cfg.jacobi_iters % 2:
            out = np.zeros_like(x)
            out[1:-1, 1:-1, 1:-1] = read[1:-1, 1:-1, 1:-1]
            return out
        return read

    def _diffuse(self, x, x0, diffc):
        n = self.cfg.n
        a = self.cfg.dt * diffc * n * n
        return self._lin_solve(x, x0, a, 1.0 + 6.0 * a)

    def _set_bnd(self):
        for f, neg_ax in ((self.u, 2), (self.v, 1), (self.w, 0)):
            for ax in range(3):
                sgn = -1.0 if ax == neg_ax else 1.0
                sl_lo = [slice(1, -1)] * 3
                sl_lo[ax] = 0
                sl_in = [slice(1, -1)] * 3
                sl_in[ax] = 1
                f[tuple(sl_lo)] = sgn * f[tuple(sl_in)]
                sl_hi = [slice(1, -1)] * 3
                sl_hi[ax] = -1
                sl_in2 = [slice(1, -1)] * 3
                sl_in2[ax] = -2
                f[tuple(sl_hi)] = sgn * f[tuple(sl_in2)]

    def _set_bnd_d(self, d):
        for ax in range(3):
            sl_lo = [slice(1, -1)] * 3
            sl_lo[ax] = 0
            sl_in = [slice(1, -1)] * 3
            sl_in[ax] = 1
            d[tuple(sl_lo)] = d[tuple(sl_in)]
            sl_hi = [slice(1, -1)] * 3
            sl_hi[ax] = -1
            sl_in2 = [slice(1, -1)] * 3
            sl_in2[ax] = -2
            d[tuple(sl_hi)] = d[tuple(sl_in2)]

    def _adv(self, q0, uu, vv, ww):
        cfg = self.cfg
        n = cfg.n
        out = q0.copy()  # ghost ring preserved
        for k in range(1, n + 1):
            for j in range(1, n + 1):
                for i in range(1, n + 1):
                    x = i - cfg.dt * uu[k, j, i]
                    y = j - cfg.dt * vv[k, j, i]
                    z = k - cfg.dt * ww[k, j, i]
                    x = min(max(x, 0.5), n + 0.5)
                    y = min(max(y, 0.5), n + 0.5)
                    z = min(max(z, 0.5), n + 0.5)
                    i0 = int(math.floor(x))
                    j0 = int(math.floor(y))
                    k0 = int(math.floor(z))
                    sx, sy, sz = x - i0, y - j0, z - k0
                    tx, ty, tz = 1 - sx, 1 - sy, 1 - sz
                    c00 = tx * q0[k0, j0, i0] + sx * q0[k0, j0, i0 + 1]
                    c10 = tx * q0[k0, j0 + 1, i0] + sx * q0[k0, j0 + 1, i0 + 1]
                    c01 = tx * q0[k0 + 1, j0, i0] + sx * q0[k0 + 1, j0, i0 + 1]
                    c11 = tx * q0[k0 + 1, j0 + 1, i0] \
                        + sx * q0[k0 + 1, j0 + 1, i0 + 1]
                    c0 = ty * c00 + sy * c10
                    c1 = ty * c01 + sy * c11
                    out[k, j, i] = tz * c0 + sz * c1
        return out

    def _project(self, uu, vv, ww, p):
        div = np.zeros_like(uu)
        div[1:-1, 1:-1, 1:-1] = -0.5 * (
            uu[1:-1, 1:-1, 2:] - uu[1:-1, 1:-1, :-2]
            + vv[1:-1, 2:, 1:-1] - vv[1:-1, :-2, 1:-1]
            + ww[2:, 1:-1, 1:-1] - ww[:-2, 1:-1, 1:-1])
        p = p.copy()
        p[1:-1, 1:-1, 1:-1] = 0.0
        p = self._lin_solve(p, div, 1.0, 6.0)
        uu[1:-1, 1:-1, 1:-1] -= 0.5 * (p[1:-1, 1:-1, 2:] - p[1:-1, 1:-1, :-2])
        vv[1:-1, 1:-1, 1:-1] -= 0.5 * (p[1:-1, 2:, 1:-1] - p[1:-1, :-2, 1:-1])
        ww[1:-1, 1:-1, 1:-1] -= 0.5 * (p[2:, 1:-1, 1:-1] - p[:-2, 1:-1, 1:-1])
        return p

    # ------------------------------------------------------------------

    def step(self):
        cfg = self.cfg
        n = cfg.n

        self.d[1:-1, 1:-1, 1:-1] *= cfg.decay

        # orbiting source (crossed u<-dz / w<-dx assignment)
        no4 = n / 4.0
        t = cfg.src_freq * self.step_idx
        for k in range(1, n + 1):
            for j in range(1, n + 1):
                for i in range(1, n + 1):
                    dx = i - no4 * (1.0 + math.cos(t))
                    dy = j - no4 * (1.0 + math.sin(t))
                    dz = k - no4 * (1.0 + math.sin(t))
                    r2 = dx * dx + dy * dy + dz * dz
                    if r2 < n:
                        r = math.sqrt(r2) + 1e-7
                        self.d[k, j, i] += cfg.src_gain * math.exp(-r2 / n)
                        self.u[k, j, i] += dz / r
                        self.v[k, j, i] += dy / r
                        self.w[k, j, i] += dx / r

        # vel_step
        self.u0 = self._diffuse(self.u0, self.u, cfg.visc)
        self.v0 = self._diffuse(self.v0, self.v, cfg.visc)
        self.w0 = self._diffuse(self.w0, self.w, cfg.visc)
        # set_bnd in the reference acts on whichever velocity buffers are
        # "current" at each call site (u0/v0/w0 here, u/v/w later)
        self.u, self.u0 = self.u0, self.u
        self.v, self.v0 = self.v0, self.v
        self.w, self.w0 = self.w0, self.w
        self._set_bnd()
        self._set_bnd_d(self.d)
        p = self._project(self.u, self.v, self.w, np.zeros_like(self.u))
        self._set_bnd()
        self._set_bnd_d(self.d)
        self.u0, self.v0, self.w0 = self.u, self.v, self.w
        self.u = self._adv(self.u0, self.u0, self.v0, self.w0)
        self.v = self._adv(self.v0, self.u0, self.v0, self.w0)
        self.w = self._adv(self.w0, self.u0, self.v0, self.w0)
        self._set_bnd()
        self._set_bnd_d(self.d)
        self._project(self.u, self.v, self.w, p)
        self._set_bnd()
        self._set_bnd_d(self.d)

        # dens_step
        self.d0 = self._diffuse(self.d0, self.d, cfg.diff)
        self._set_bnd_d(self.d0)
        self.d = self._adv(self.d0, self.u, self.v, self.w)
        self._set_bnd_d(self.d)

        self.step_idx += 1
