"""WENO5 reconstruction (Jiang–Shu weights).

Behavioral spec: weno5_left/weno5_right of the 3-D reference solver
(tau_hypersonic_3d_cuda.cu:534-563): classic 5-point WENO with eps=1e-6 and
linear weights (0.1, 0.6, 0.3); the right-biased variant is the mirror.
Vectorized over whole grids.
"""

from __future__ import annotations

__all__ = ["weno5_left", "weno5_right", "WENO_EPS"]

WENO_EPS = 1e-6


def weno5_left(v0, v1, v2, v3, v4):
    """Left-biased WENO5 face value from 5 upwind samples."""
    p0 = (2.0 * v0 - 7.0 * v1 + 11.0 * v2) * (1.0 / 6.0)
    p1 = (-1.0 * v1 + 5.0 * v2 + 2.0 * v3) * (1.0 / 6.0)
    p2 = (2.0 * v2 + 5.0 * v3 - 1.0 * v4) * (1.0 / 6.0)

    b0 = (13.0 / 12.0) * (v0 - 2.0 * v1 + v2) ** 2 \
        + 0.25 * (v0 - 4.0 * v1 + 3.0 * v2) ** 2
    b1 = (13.0 / 12.0) * (v1 - 2.0 * v2 + v3) ** 2 + 0.25 * (v1 - v3) ** 2
    b2 = (13.0 / 12.0) * (v2 - 2.0 * v3 + v4) ** 2 \
        + 0.25 * (3.0 * v2 - 4.0 * v3 + v4) ** 2

    a0 = 0.1 / ((WENO_EPS + b0) * (WENO_EPS + b0))
    a1 = 0.6 / ((WENO_EPS + b1) * (WENO_EPS + b1))
    a2 = 0.3 / ((WENO_EPS + b2) * (WENO_EPS + b2))
    s = a0 + a1 + a2
    return (a0 * p0 + a1 * p1 + a2 * p2) / s


def weno5_right(v0, v1, v2, v3, v4):
    """Right-biased WENO5 (mirror of the left-biased stencil)."""
    return weno5_left(v4, v3, v2, v1, v0)
