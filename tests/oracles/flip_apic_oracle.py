"""Independent per-particle float64 oracle for the FLIP/APIC solver.

Transcribes tau_flip_apic.cu's step pipeline (k_p2g :105-131,
k_normalize_forces :133-150, k_divergence :152-161, k_jacobi :162-172
ping-pong loop :275-280, k_project :173-184, sample_grid :186-200,
k_g2p :202-241) as plain Python loops over particles and cells —
structurally unlike the vectorized solver (which replaces the atomicAdd
scatters with sorted segment sums).  Scatter-add order differs, so
float64 agreement is to summation-reassociation level, not bitwise.

Grid layout matches the solver: a[j][i] (reference gix(i,j) = i + n*j).
"""

from __future__ import annotations

import numpy as np


def _w1(x):
    x = abs(x)
    return 1.0 - x if x < 1.0 else 0.0


class FlipOracle:
    def __init__(self, cfg, pos, vel, ax, ay):
        self.cfg = cfg
        self.n = cfg.grid
        self.pos = np.asarray(pos, np.float64).copy()
        self.vel = np.asarray(vel, np.float64).copy()
        self.ax = np.asarray(ax, np.float64).copy()
        self.ay = np.asarray(ay, np.float64).copy()
        self.density = np.zeros((self.n, self.n), np.int64)

    def _sample(self, u, v, x, y):
        n = self.n
        gx = min(max(x * (n - 1), 0.0), n - 1.001)
        gy = min(max(y * (n - 1), 0.0), n - 1.001)
        i0, j0 = int(np.floor(gx)), int(np.floor(gy))
        i1, j1 = min(i0 + 1, n - 1), min(j0 + 1, n - 1)
        tx, ty = gx - i0, gy - j0
        su = (1 - tx) * ((1 - ty) * u[j0, i0] + ty * u[j1, i0]) \
            + tx * ((1 - ty) * u[j0, i1] + ty * u[j1, i1])
        sv = (1 - tx) * ((1 - ty) * v[j0, i0] + ty * v[j1, i0]) \
            + tx * ((1 - ty) * v[j0, i1] + ty * v[j1, i1])
        return su, sv

    def step(self):
        cfg, n = self.cfg, self.n
        npart = len(self.pos)
        mass = np.zeros((n, n))
        u = np.zeros((n, n))
        v = np.zeros((n, n))

        # P2G (k_p2g)
        for k in range(npart):
            gx, gy = self.pos[k, 0] * (n - 1), self.pos[k, 1] * (n - 1)
            bx, by = int(np.floor(gx)), int(np.floor(gy))
            for oy in (-1, 0, 1):
                j = min(max(by + oy, 0), n - 1)
                wy = _w1(gy - j)
                for ox in (-1, 0, 1):
                    i = min(max(bx + ox, 0), n - 1)
                    wt = _w1(gx - i) * wy
                    if wt <= 0.0:
                        continue
                    rx, ry = (i - gx) / (n - 1), (j - gy) / (n - 1)
                    vvx = self.vel[k, 0] + cfg.apic * (
                        self.ax[k, 0] * rx + self.ay[k, 0] * ry)
                    vvy = self.vel[k, 1] + cfg.apic * (
                        self.ax[k, 1] * rx + self.ay[k, 1] * ry)
                    mass[j, i] += wt
                    u[j, i] += wt * vvx
                    v[j, i] += wt * vvy

        # normalize + gravity + wall clamps (k_normalize_forces)
        for j in range(n):
            for i in range(n):
                if mass[j, i] > 1e-8:
                    u[j, i] /= mass[j, i]
                    v[j, i] = v[j, i] / mass[j, i] - cfg.gravity * cfg.dt
                if i == 0 or i == n - 1:
                    u[j, i] = 0.0
                if j == 0 or j == n - 1:
                    v[j, i] = 0.0
        u_prev, v_prev = u.copy(), v.copy()

        # divergence (k_divergence, interior)
        div = np.zeros((n, n))
        div[1:-1, 1:-1] = -0.5 * (n - 1) * (
            u[1:-1, 2:] - u[1:-1, :-2] + v[2:, 1:-1] - v[:-2, 1:-1])

        # Jacobi ping-pong (k_jacobi), boundary ring stays zero
        p = np.zeros((n, n))
        for _ in range(cfg.jacobi):
            pn = np.zeros((n, n))
            pn[1:-1, 1:-1] = 0.25 * (
                div[1:-1, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
                + p[:-2, 1:-1] + p[2:, 1:-1])
            p = pn

        # projection (k_project), interior only; cleared grids outside
        u_proj = np.zeros((n, n))
        v_proj = np.zeros((n, n))
        u_proj[1:-1, 1:-1] = u[1:-1, 1:-1] \
            - 0.5 * (p[1:-1, 2:] - p[1:-1, :-2]) / (n - 1)
        v_proj[1:-1, 1:-1] = v[1:-1, 1:-1] \
            - 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1]) / (n - 1)

        # G2P (k_g2p)
        self.density[:] = 0
        h = 1.0 / (n - 1)
        for k in range(npart):
            x, y = self.pos[k]
            nu, nv = self._sample(u_proj, v_proj, x, y)
            ou, ov = self._sample(u_prev, v_prev, x, y)
            fu = self.vel[k, 0] + nu - ou
            fv = self.vel[k, 1] + nv - ov
            vx = (1 - cfg.flip) * nu + cfg.flip * fu
            vy = (1 - cfg.flip) * nv + cfg.flip * fv

            ux1, vx1 = self._sample(u_proj, v_proj, x + h, y)
            ux0, vx0 = self._sample(u_proj, v_proj, x - h, y)
            uy1, vy1 = self._sample(u_proj, v_proj, x, y + h)
            uy0, vy0 = self._sample(u_proj, v_proj, x, y - h)
            self.ax[k] = (0.5 * (ux1 - ux0) / h, 0.5 * (vx1 - vx0) / h)
            self.ay[k] = (0.5 * (uy1 - uy0) / h, 0.5 * (vy1 - vy0) / h)

            x2 = x + vx * cfg.dt
            y2 = y + vy * cfg.dt
            if x2 < 0.01 or x2 > 0.99:
                vx *= -0.35
                x2 = min(max(x2, 0.01), 0.99)
            if y2 < 0.01 or y2 > 0.99:
                vy *= -0.35
                y2 = min(max(y2, 0.01), 0.99)
            self.pos[k] = (x2, y2)
            self.vel[k] = (vx, vy)
            rx = min(max(int(x2 * n), 0), n - 1)
            ry = min(max(int(y2 * n), 0), n - 1)
            self.density[ry, rx] += 1
