"""Independent per-cell float64 PUSH-streaming oracle for the D2Q9 LBM
solver.

Transcribes tau_lbm.cu's collide_stream_kernel (:94-132) literally: each
cell collides and PUSHES its post-collision populations to neighbors,
with on-link bounce-back (out-of-bounds y or solid target -> reflect into
the opposite direction at the source) and solid cells reflecting their
own populations.  The vectorized solver (solvers/lbm.py) uses the PULL
reformulation of the same update — this oracle proves the two
formulations produce identical lattices."""

from __future__ import annotations

import numpy as np

EX = (0, 1, 0, -1, 0, 1, -1, -1, 1)
EY = (0, 0, 1, 0, -1, 1, 1, -1, -1)
OPP = (0, 3, 4, 1, 2, 7, 8, 5, 6)
W = (4 / 9, 1 / 9, 1 / 9, 1 / 9, 1 / 9, 1 / 36, 1 / 36, 1 / 36, 1 / 36)


def _feq(q, rho, ux, uy):
    cu = 3.0 * (EX[q] * ux + EY[q] * uy)
    u2 = ux * ux + uy * uy
    return W[q] * rho * (1.0 + cu + 0.5 * cu * cu - 1.5 * u2)


class LBMOracle:
    def __init__(self, cfg, f, solid):
        self.cfg = cfg
        self.f = np.asarray(f, np.float64).copy()       # (9, ny, nx)
        self.solid = np.asarray(solid, bool).copy()     # (ny, nx)

    def step(self):
        cfg = self.cfg
        nx, ny = cfg.nx, cfg.ny
        fin = self.f
        fout = np.empty_like(fin)
        omega = 1.0 / cfg.tau

        for j in range(ny):
            for i in range(nx):
                local = fin[:, j, i]
                if self.solid[j, i]:
                    for q in range(9):
                        fout[OPP[q], j, i] = local[q]
                    continue
                rho = local.sum()
                ux = float(sum(local[q] * EX[q] for q in range(9)))
                uy = float(sum(local[q] * EY[q] for q in range(9)))
                rho = max(rho, 1e-6)
                ux = ux / rho + cfg.drive
                uy = uy / rho
                for q in range(9):
                    post = local[q] - omega * (local[q]
                                               - _feq(q, rho, ux, uy))
                    ni = (i + EX[q] + nx) % nx
                    nj = j + EY[q]
                    if nj < 0 or nj >= ny or self.solid[nj, ni]:
                        fout[OPP[q], j, i] = post
                    else:
                        fout[q, nj, ni] = post
        self.f = fout
