"""WENO5 reconstruction (Jiang–Shu weights).

Behavioral spec: weno5_left/weno5_right of the 3-D reference solver
(tau_hypersonic_3d_cuda.cu:534-563): classic 5-point WENO with eps=1e-6 and
linear weights (0.1, 0.6, 0.3); the right-biased variant is the mirror.
Vectorized over whole grids.
"""

from __future__ import annotations

__all__ = ["weno5_left", "weno5_right", "weno5_lr_slab", "WENO_EPS"]

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


def weno5_lr_slab(fp, axis: int, halo: int = 3):
    """Both face reconstructions (L, R) for every face of a `halo`-padded
    cell array, with the cross-face/cross-side arithmetic shared.

    Equivalent to calling weno5_left / weno5_right on the 6 shifted cell
    windows (to ~1 ulp: the only change is alpha = w * (1/(eps+beta)^2)
    instead of w / (eps+beta)^2), but exploits two identities the
    windowed form recomputes:

      * every smoothness indicator is (13/12)*d2_i^2 + (1/4)*edge_i^2 of
        PER-CELL second-difference / edge-difference forms, so the three
        beta arrays S0/S1/S2 (and their reciprocal squares — the
        expensive divisions) are computed once per cell and reused by
        BOTH sides: beta_R(face k) = (S2, S1, S0) at face k+1;
      * the candidate polynomials pair up: p1_R(k) = p2_L(k),
        p2_R(k) = p1_L(k), and p0 on each side is a per-cell form
        (A at cell k for L, B at cell k+1 for R).

    Measured op count: ~77 + 5 divisions per face for both sides vs
    ~120 + 8 divisions for the two windowed calls.

    `fp` has extent n + 2*halo along `axis` (halo >= 3); returns (L, R)
    arrays of extent n + 1 (one per face)."""
    import jax

    n = fp.shape[axis] - 2 * halo
    if halo < 3:
        raise ValueError("weno5_lr_slab needs halo >= 3")

    def s(off, length):
        # slice by PADDED offset: cell i sits at padded offset i + halo
        return jax.lax.slice_in_dim(
            fp, halo - 3 + off, halo - 3 + off + length, axis=axis)

    # Face k (k = 0..n) sits between cells c = k-1 and c+1 = k.  All the
    # `s(off, ...)` below use off = padded_offset - (halo - 3), i.e.
    # off 0 addresses cell -3 (the first cell face 0's stencils reach).
    c13 = 13.0 / 12.0
    # D_arr[j] = (13/12) * d2_{j-2}^2 over cells j-2 in [-2, n+1]
    d2 = s(0, n + 4) - 2.0 * s(1, n + 4) + s(2, n + 4)
    D = c13 * d2 * d2
    # per-cell edge/central forms over i = j-1 in [-1, n] (length n+2)
    cd = s(3, n + 2) - s(1, n + 2)                        # v_{i+1} - v_{i-1}
    C = 0.25 * cd * cd
    gd = s(0, n + 2) - 4.0 * s(1, n + 2) + 3.0 * s(2, n + 2)
    G = 0.25 * gd * gd                                    # (v_{i-2}-4v_{i-1}+3v_i)
    fd = 3.0 * s(2, n + 2) - 4.0 * s(3, n + 2) + s(4, n + 2)
    F = 0.25 * fd * fd                                    # (3v_i-4v_{i+1}+v_{i+2})
    # candidate polynomials per face k = 0..n (left cell c = k-1)
    A = (2.0 * s(0, n + 1) - 7.0 * s(1, n + 1)
         + 11.0 * s(2, n + 1)) * (1.0 / 6.0)              # p0_L (cell c)
    M = (-s(1, n + 1) + 5.0 * s(2, n + 1)
         + 2.0 * s(3, n + 1)) * (1.0 / 6.0)               # p1_L = p2_R
    N = (2.0 * s(2, n + 1) + 5.0 * s(3, n + 1)
         - s(4, n + 1)) * (1.0 / 6.0)                     # p2_L = p1_R
    B = (11.0 * s(3, n + 1) - 7.0 * s(4, n + 1)
         + 2.0 * s(5, n + 1)) * (1.0 / 6.0)               # p0_R (cell c+1)

    def sub(a, j0, length):
        return jax.lax.slice_in_dim(a, j0, j0 + length, axis=axis)

    # shared beta arrays over i = j-1 in [-1, n] (length n+2):
    #   S0_i = D_{i-1} + G_i, S1_i = D_i + C_i, S2_i = D_{i+1} + F_i
    S0 = sub(D, 0, n + 2) + G
    S1 = sub(D, 1, n + 2) + C
    S2 = sub(D, 2, n + 2) + F
    inv = []
    for S in (S0, S1, S2):
        t = WENO_EPS + S
        inv.append(1.0 / (t * t))

    # left-biased face k: betas at cell i = c = k-1 -> j = k (slice [0:n+1])
    a0 = 0.1 * sub(inv[0], 0, n + 1)
    a1 = 0.6 * sub(inv[1], 0, n + 1)
    a2 = 0.3 * sub(inv[2], 0, n + 1)
    L = (a0 * A + a1 * M + a2 * N) / (a0 + a1 + a2)

    # right-biased face k reuses the SAME betas at i = c+1 with 0<->2 swap
    r0 = 0.1 * sub(inv[2], 1, n + 1)
    r1 = 0.6 * sub(inv[1], 1, n + 1)
    r2 = 0.3 * sub(inv[0], 1, n + 1)
    R = (r0 * B + r1 * N + r2 * M) / (r0 + r1 + r2)
    return L, R
