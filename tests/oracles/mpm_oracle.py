"""Independent per-particle float64 oracle for the MLS-MPM solver.

Transcribes tau_mpm.cu's step pipeline (k_p2g :123-183 with per-material
plasticity, k_grid_update :185-198 sticky boundary bands, k_g2p :200-257
affine C / F update / Jp tracking) as plain Python loops over particles
and 3x3 stencils — structurally unlike the vectorized solver (which uses
sorted scatter-adds and einsum 2x2 algebra).  Scatter order differs, so
float64 agreement is to summation-reassociation level.

Grid layout: flat id = iy * Gx + ix, matching the reference.
"""

from __future__ import annotations

import numpy as np


def _quad_w(f):
    return (0.5 * (1.5 - f) ** 2,
            0.75 - (f - 1.0) ** 2,
            0.5 * (f - 0.5) ** 2)


class MPMOracle:
    def __init__(self, cfg, pos, vel, F, Jp):
        self.cfg = cfg
        self.pos = np.asarray(pos, np.float64).copy()
        self.vel = np.asarray(vel, np.float64).copy()
        self.F = np.asarray(F, np.float64).copy()      # (n, 2, 2)
        self.Jp = np.asarray(Jp, np.float64).copy()
        from fluidsims_tpu.solvers.mpm import MATERIALS

        self.material = MATERIALS[cfg.material]

    def step(self):
        cfg = self.cfg
        Gx, Gy = cfg.gx, cfg.gy
        dx = cfg.dx
        inv_dx = 1.0 / dx
        dt = cfg.dt
        mat = self.material
        n = len(self.pos)

        gmass = np.zeros(Gx * Gy)
        gvel = np.zeros((Gx * Gy, 2))

        # P2G
        for p in range(n):
            Xpx, Xpy = self.pos[p, 0] * inv_dx, self.pos[p, 1] * inv_dx
            bx, by = int(np.floor(Xpx - 0.5)), int(np.floor(Xpy - 0.5))
            fx, fy = Xpx - bx, Xpy - by
            wx, wy = _quad_w(fx), _quad_w(fy)

            Fe = self.F[p].copy()
            if mat == 1:  # snow: clamp diagonal, relax shear
                Fe[0, 0] = min(max(Fe[0, 0], 1.0 - cfg.critical_compression),
                               1.0 + cfg.critical_stretch)
                Fe[1, 1] = min(max(Fe[1, 1], 1.0 - cfg.critical_compression),
                               1.0 + cfg.critical_stretch)
                Fe[0, 1] *= 0.98
                Fe[1, 0] *= 0.98
            J = max(np.linalg.det(Fe), 0.2)
            e = np.exp(cfg.hardening * (1.0 - self.Jp[p]))
            mu = cfg.mu0 * e
            lam = cfg.lambda0 * e
            if mat == 0:
                mu *= 0.25
            if mat == 2:
                mu *= 1.8
                lam *= 0.75
            I = np.eye(2)
            PFt = mu * (Fe @ Fe.T - I) + lam * np.log(J) * J * I
            stress = PFt * (-4.0 * inv_dx * inv_dx * dt * cfg.volume)

            for gx in range(3):
                for gy in range(3):
                    ix, iy = bx + gx, by + gy
                    if not (0 <= ix < Gx and 0 <= iy < Gy):
                        continue
                    w = wx[gx] * wy[gy]
                    dpos = np.array([(gx - fx) * dx, (gy - fy) * dx])
                    mom = cfg.particle_mass * self.vel[p]
                    force = stress @ dpos
                    gid = iy * Gx + ix
                    gmass[gid] += w * cfg.particle_mass
                    gvel[gid] += w * (mom + force)
            self.F[p] = Fe

        # grid update
        for gid in range(Gx * Gy):
            if gmass[gid] <= 0.0:
                continue
            gvel[gid, 0] /= gmass[gid]
            gvel[gid, 1] = gvel[gid, 1] / gmass[gid] - cfg.gravity * dt
            x, y = gid % Gx, gid // Gx
            if (x < 3 and gvel[gid, 0] < 0.0) or \
                    (x > Gx - 4 and gvel[gid, 0] > 0.0):
                gvel[gid, 0] = 0.0
            if (y < 3 and gvel[gid, 1] < 0.0) or \
                    (y > Gy - 4 and gvel[gid, 1] > 0.0):
                gvel[gid, 1] = 0.0

        # G2P
        for p in range(n):
            Xpx, Xpy = self.pos[p, 0] * inv_dx, self.pos[p, 1] * inv_dx
            bx, by = int(np.floor(Xpx - 0.5)), int(np.floor(Xpy - 0.5))
            fx, fy = Xpx - bx, Xpy - by
            wx, wy = _quad_w(fx), _quad_w(fy)
            newV = np.zeros(2)
            C = np.zeros((2, 2))
            for gx in range(3):
                for gy in range(3):
                    ix, iy = bx + gx, by + gy
                    if not (0 <= ix < Gx and 0 <= iy < Gy):
                        continue
                    w = wx[gx] * wy[gy]
                    gv = gvel[iy * Gx + ix]
                    dpos = np.array([(gx - fx) * dx, (gy - fy) * dx])
                    newV += w * gv
                    C += 4.0 * inv_dx * w * np.outer(gv, dpos)
            oldF = self.F[p]
            newF = (np.eye(2) + dt * C) @ oldF
            oldJ = max(np.linalg.det(oldF), 1e-6)
            newJ = max(np.linalg.det(newF), 1e-6)
            if mat == 0:  # mud relaxes shear
                newF[0, 1] *= 0.96
                newF[1, 0] *= 0.96
            self.Jp[p] = min(max(self.Jp[p] * oldJ / newJ, 0.05), 20.0)
            self.F[p] = newF
            x = self.pos[p] + dt * newV
            x[0] = min(max(x[0], 2.0 * dx), (Gx - 3.0) * dx)
            x[1] = min(max(x[1], 2.0 * dx), (Gy - 3.0) * dx)
            self.pos[p] = x
            self.vel[p] = newV
