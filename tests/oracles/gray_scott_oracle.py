"""Independent per-cell float64 oracle for the Gray-Scott solver:
tau_gray_scott.cu's step_kernel (:141-171) as plain loops — periodic
5-point Laplacian, uv^2 reaction, forward Euler."""

from __future__ import annotations

import numpy as np


class GrayScottOracle:
    def __init__(self, cfg, u, v):
        self.cfg = cfg
        self.u = np.asarray(u, np.float64).copy()
        self.v = np.asarray(v, np.float64).copy()

    def step(self):
        cfg = self.cfg
        nx, ny = cfg.nx, cfg.ny
        un = np.empty_like(self.u)
        vn = np.empty_like(self.v)
        dx2 = cfg.dx * cfg.dx
        for j in range(ny):
            for i in range(nx):
                ip, im = (i + 1) % nx, (i - 1) % nx
                jp, jm = (j + 1) % ny, (j - 1) % ny
                u = self.u[j, i]
                v = self.v[j, i]
                lap_u = (self.u[j, ip] + self.u[j, im] + self.u[jp, i]
                         + self.u[jm, i] - 4.0 * u) / dx2
                lap_v = (self.v[j, ip] + self.v[j, im] + self.v[jp, i]
                         + self.v[jm, i] - 4.0 * v) / dx2
                uvv = u * v * v
                un[j, i] = u + cfg.dt * (cfg.Du * lap_u - uvv
                                         + cfg.feed * (1.0 - u))
                vn[j, i] = v + cfg.dt * (cfg.Dv * lap_v + uvv
                                         - (cfg.feed + cfg.kill) * v)
        self.u, self.v = un, vn
