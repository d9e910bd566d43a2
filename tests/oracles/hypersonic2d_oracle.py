"""Float64 NumPy oracle for the flagship 2-D hypersonic solver.

A deliberately *loop-structured* per-cell transcription of the reference
pipeline (tau_hypersonic_cuda.cu k_apply_inflow_left -> wavespeed ->
k_predict_face_states -> k_compute_{x,y}face_flux -> k_step), independent of
the vectorized JAX implementation it validates.  Slow — use tiny grids.
"""

from __future__ import annotations

import math

import numpy as np

EPS_RHO = 1e-25
EPS_P = 1e-25


class Cfg:
    def __init__(self, nx, ny, gamma=1.1, cfl=0.25, visc_nu=5e-2, visc_rho=5e-2,
                 visc_e=2e-2, inflow_mach=25.0, geom_x0=None, geom_cy=None,
                 geom_Rb=None, geom_Rn=None, geom_theta=math.pi / 4):
        self.nx, self.ny = nx, ny
        self.gamma, self.cfl = gamma, cfl
        self.visc_nu, self.visc_rho, self.visc_e = visc_nu, visc_rho, visc_e
        self.inflow_mach = inflow_mach
        self.geom_x0 = geom_x0 if geom_x0 is not None else nx / 8.0
        self.geom_cy = geom_cy if geom_cy is not None else ny / 2.0
        self.geom_Rb = geom_Rb if geom_Rb is not None else ny / 12.0
        self.geom_Rn = geom_Rn if geom_Rn is not None else ny / 24.0
        self.geom_theta = geom_theta


def cons_to_prim(c, g):
    rho = max(c[0], EPS_RHO)
    u = c[1] / rho
    v = c[2] / rho
    eint = c[3] - 0.5 * rho * (u * u + v * v)
    p = (g - 1.0) * max(eint, EPS_P)
    return (rho, u, v, p)


def prim_to_cons(q, g):
    rho = max(q[0], EPS_RHO)
    p = max(q[3], EPS_P)
    return np.array(
        [rho, rho * q[1], rho * q[2],
         p / (g - 1.0) + 0.5 * rho * (q[1] ** 2 + q[2] ** 2)]
    )


def sound(q, g):
    return math.sqrt(g * max(q[3], EPS_P) / max(q[0], EPS_RHO))


def flux(c, g, axis):
    q = cons_to_prim(c, g)
    un = q[1] if axis == 0 else q[2]
    if axis == 0:
        return np.array([c[1], c[1] * un + q[3], c[2] * un, (c[3] + q[3]) * un])
    return np.array([c[2], c[1] * un, c[2] * un + q[3], (c[3] + q[3]) * un])


def minmod(a, b):
    if a * b <= 0.0:
        return 0.0
    return a if abs(a) < abs(b) else b


def mc(dl, dc, dr):
    return minmod(minmod(dl, dr), minmod(minmod(dc, 2 * dl), minmod(dc, 2 * dr)))


def inflow_prim(cfg):
    a = math.sqrt(cfg.gamma)
    return (1.0, cfg.inflow_mach * a, 0.0, 1.0)


def wall_ghost(q):
    return (q[0], -q[1], -q[2], q[3])


def sd_segment(px, py, ax, ay, bx, by):
    abx, aby = bx - ax, by - ay
    apx, apy = px - ax, py - ay
    t = (apx * abx + apy * aby) / (abx * abx + aby * aby + 1e-30)
    t = min(max(t, 0.0), 1.0)
    return math.hypot(px - (ax + t * abx), py - (ay + t * aby))


def sd_capsule(x, y, Rb, Rn, theta):
    r = abs(y)
    st, ct, tt = math.sin(theta), math.cos(theta), math.tan(theta)
    xt = Rn * (1.0 - st)
    rt = Rn * ct
    xb = xt + (Rb - rt) / max(tt, 1e-30)
    if x < 0.0:
        rprof = -1.0
    elif x <= xt:
        inside = Rn * Rn - (x - Rn) ** 2
        rprof = math.sqrt(inside) if inside > 0 else 0.0
    elif x <= xb:
        rprof = rt + (x - xt) * tt
    else:
        rprof = -1.0
    inside = x >= 0.0 and x <= xb and r <= rprof
    d = min(
        abs(math.hypot(x - Rn, r) - Rn),
        sd_segment(x, r, xt, rt, xb, Rb),
        sd_segment(x, y, xb, -Rb, xb, Rb),
        math.hypot(x - xb, r - Rb),
    )
    return -d if inside else d


def build_mask(cfg):
    mask = np.zeros((cfg.ny, cfg.nx), dtype=bool)
    st = math.sin(cfg.geom_theta)
    ct = math.cos(cfg.geom_theta)
    tt = math.tan(cfg.geom_theta)
    xt = cfg.geom_Rn * (1.0 - st)
    rt = cfg.geom_Rn * ct
    xb = xt + (cfg.geom_Rb - rt) / max(tt, 1e-30)
    for y in range(cfg.ny):
        for x in range(cfg.nx):
            X = x - cfg.geom_x0
            Y = y - cfg.geom_cy
            sd = sd_capsule(X, Y, cfg.geom_Rb, cfg.geom_Rn, cfg.geom_theta)
            sd -= cfg.geom_Rb
            sd = max(sd, X - xb)
            mask[y, x] = sd < 0.0
    return mask


def init(cfg):
    mask = build_mask(cfg)
    infl = inflow_prim(cfg)
    U = np.zeros((cfg.ny, cfg.nx, 4))
    for y in range(cfg.ny):
        for x in range(cfg.nx):
            if mask[y, x]:
                U[y, x] = prim_to_cons((infl[0], 0.0, 0.0, infl[3]), cfg.gamma)
            else:
                U[y, x] = prim_to_cons(infl, cfg.gamma)
    return U, mask


def neighbor_or_wall(cfg, U, mask, x, y, dx, dy):
    g = cfg.gamma
    xn, yn = x + dx, y + dy
    yn = min(max(yn, 0), cfg.ny - 1)
    if xn < 0:
        return prim_to_cons(inflow_prim(cfg), g)
    if xn >= cfg.nx:
        return U[yn, cfg.nx - 1].copy()
    if mask[yn, xn]:
        return prim_to_cons(wall_ghost(cons_to_prim(U[y, x], g)), g)
    return U[yn, xn].copy()


def enforce_positive(qm, qc, qp):
    qm, qp = list(qm), list(qp)
    for _ in range(8):
        bad = (qm[0] <= EPS_RHO or qp[0] <= EPS_RHO
               or qm[3] <= EPS_P or qp[3] <= EPS_P)
        if not bad:
            break
        for k in range(4):
            qm[k] = 0.5 * (qm[k] + qc[k])
            qp[k] = 0.5 * (qp[k] + qc[k])
    qm[0] = max(qm[0], EPS_RHO)
    qp[0] = max(qp[0], EPS_RHO)
    qm[3] = max(qm[3], EPS_P)
    qp[3] = max(qp[3], EPS_P)
    return tuple(qm), tuple(qp)


def reconstruct(cfg, U, mask, x, y, axis):
    g = cfg.gamma
    dx, dy = (1, 0) if axis == 0 else (0, 1)
    qc = cons_to_prim(U[y, x], g)
    qm = cons_to_prim(neighbor_or_wall(cfg, U, mask, x, y, -dx, -dy), g)
    qp = cons_to_prim(neighbor_or_wall(cfg, U, mask, x, y, dx, dy), g)
    s = [mc(qc[k] - qm[k], 0.5 * (qp[k] - qm[k]), qp[k] - qc[k]) for k in range(4)]
    qL = tuple(qc[k] - 0.5 * s[k] for k in range(4))
    qR = tuple(qc[k] + 0.5 * s[k] for k in range(4))
    return enforce_positive(qL, qc, qR)


def half_step(q, dF, half_dt, g):
    c = prim_to_cons(q, g) - half_dt * dF
    out = cons_to_prim(c, g)
    return (max(out[0], EPS_RHO), out[1], out[2], max(out[3], EPS_P))


def predict_faces(cfg, U, mask, half_dt):
    g = cfg.gamma
    ny, nx = cfg.ny, cfg.nx
    xL = np.zeros_like(U)
    xR = np.zeros_like(U)
    yL = np.zeros_like(U)
    yR = np.zeros_like(U)
    for y in range(ny):
        for x in range(nx):
            if mask[y, x]:
                xL[y, x] = xR[y, x] = yL[y, x] = yR[y, x] = U[y, x]
                continue
            qLx, qRx = reconstruct(cfg, U, mask, x, y, axis=0)
            FL = flux(prim_to_cons(qLx, g), g, 0)
            FR = flux(prim_to_cons(qRx, g), g, 0)
            dF = FR - FL
            pL = half_step(qLx, dF, half_dt, g)
            pR = half_step(qRx, dF, half_dt, g)
            xL[y, x] = prim_to_cons(pL, g)
            xR[y, x] = prim_to_cons(pR, g)

            qLy, qRy = reconstruct(cfg, U, mask, x, y, axis=1)
            GL = flux(prim_to_cons(qLy, g), g, 1)
            GR = flux(prim_to_cons(qRy, g), g, 1)
            dG = GR - GL
            pB = half_step(qLy, dG, half_dt, g)
            pT = half_step(qRy, dG, half_dt, g)
            yL[y, x] = prim_to_cons(pB, g)
            yR[y, x] = prim_to_cons(pT, g)
    return xL, xR, yL, yR


def hlle_flux(UL, UR, g, axis):
    L = cons_to_prim(UL, g)
    R = cons_to_prim(UR, g)
    uL = L[1] if axis == 0 else L[2]
    uR = R[1] if axis == 0 else R[2]
    SL = min(uL - sound(L, g), uR - sound(R, g))
    SR = max(uL + sound(L, g), uR + sound(R, g))
    FL = flux(UL, g, axis)
    FR = flux(UR, g, axis)
    if SL >= 0.0:
        return FL
    if SR <= 0.0:
        return FR
    if abs(SR - SL) < 1e-14:
        return 0.5 * (FL + FR)
    return (SR * FL - SL * FR + SL * SR * (UR - UL)) / (SR - SL)


def hllc_flux(UL, UR, g, axis):
    L = cons_to_prim(UL, g)
    R = cons_to_prim(UR, g)
    unL = L[1] if axis == 0 else L[2]
    unR = R[1] if axis == 0 else R[2]
    utL = L[2] if axis == 0 else L[1]
    utR = R[2] if axis == 0 else R[1]
    SL = min(unL - sound(L, g), unR - sound(R, g))
    SR = max(unL + sound(L, g), unR + sound(R, g))
    FL = flux(UL, g, axis)
    FR = flux(UR, g, axis)
    if SL >= 0.0:
        return FL
    if SR <= 0.0:
        return FR
    rhoL, rhoR, pL, pR = L[0], R[0], L[3], R[3]
    num = pR - pL + rhoL * unL * (SL - unL) - rhoR * unR * (SR - unR)
    den = rhoL * (SL - unL) - rhoR * (SR - unR)
    if abs(den) < 1e-14 or not (math.isfinite(num) and math.isfinite(den)):
        return hlle_flux(UL, UR, g, axis)
    SM = num / den
    if not math.isfinite(SM):
        return hlle_flux(UL, UR, g, axis)
    pStar = max(pL + rhoL * (SL - unL) * (SM - unL), EPS_P)
    dLS, dRS = SL - SM, SR - SM
    if abs(dLS) < 1e-14 or abs(dRS) < 1e-14:
        return hlle_flux(UL, UR, g, axis)
    rhoStarL = rhoL * (SL - unL) / dLS
    rhoStarR = rhoR * (SR - unR) / dRS
    if not (rhoStarL > 0 and rhoStarR > 0) or not (
        math.isfinite(rhoStarL) and math.isfinite(rhoStarR)
    ):
        return hlle_flux(UL, UR, g, axis)
    EStarL = ((SL - unL) * UL[3] - pL * unL + pStar * SM) / dLS
    EStarR = ((SR - unR) * UR[3] - pR * unR + pStar * SM) / dRS
    if not (math.isfinite(EStarL) and math.isfinite(EStarR)):
        return hlle_flux(UL, UR, g, axis)
    if axis == 0:
        UsL = np.array([rhoStarL, rhoStarL * SM, rhoStarL * utL, EStarL])
        UsR = np.array([rhoStarR, rhoStarR * SM, rhoStarR * utR, EStarR])
    else:
        UsL = np.array([rhoStarL, rhoStarL * utL, rhoStarL * SM, EStarL])
        UsR = np.array([rhoStarR, rhoStarR * utR, rhoStarR * SM, EStarR])
    if SM >= 0.0:
        return FL + SL * (UsL - UL)
    return FR + SR * (UsR - UR)


def step(cfg, U, mask):
    g = cfg.gamma
    ny, nx = cfg.ny, cfg.nx

    # inflow left column
    inflC = prim_to_cons(inflow_prim(cfg), g)
    for y in range(ny):
        if not mask[y, 0]:
            U[y, 0] = inflC

    # dt
    maxs = 1e-12
    for y in range(ny):
        for x in range(nx):
            if mask[y, x]:
                continue
            q = cons_to_prim(U[y, x], g)
            a = sound(q, g)
            maxs = max(maxs, abs(q[1]) + a, abs(q[2]) + a)
    dt_conv = cfg.cfl / maxs
    nu_max = max(cfg.visc_nu, cfg.visc_rho, cfg.visc_e)
    dt = min(dt_conv, 0.25 / nu_max) if nu_max > 1e-12 else dt_conv

    xL, xR, yL, yR = predict_faces(cfg, U, mask, 0.5 * dt)

    # x-face fluxes (ny, nx+1)
    Fx = np.zeros((ny, nx + 1, 4))
    for y in range(ny):
        for fx in range(nx + 1):
            xl, xr = fx - 1, fx
            hasL = xl >= 0 and not mask[y, xl]
            hasR = xr < nx and not mask[y, xr]
            if hasL and hasR:
                UL, UR = xR[y, xl], xL[y, xr]
            elif hasR:
                UL = neighbor_or_wall(cfg, U, mask, xr, y, -1, 0)
                UR = xL[y, xr]
            elif hasL:
                UL = xR[y, xl]
                UR = neighbor_or_wall(cfg, U, mask, xl, y, +1, 0)
            else:
                continue
            Fx[y, fx] = hllc_flux(UL, UR, g, 0)

    # y-face fluxes (ny+1, nx)
    Gy = np.zeros((ny + 1, nx, 4))
    for fy in range(ny + 1):
        for x in range(nx):
            yb, yt = fy - 1, fy
            hasB = yb >= 0 and not mask[yb, x]
            hasT = yt < ny and not mask[yt, x]
            if hasB and hasT:
                UB, UT = yR[yb, x], yL[yt, x]
            elif hasT:
                UB = neighbor_or_wall(cfg, U, mask, x, yt, 0, -1)
                UT = yL[yt, x]
            elif hasB:
                UB = yR[yb, x]
                UT = neighbor_or_wall(cfg, U, mask, x, yb, 0, +1)
            else:
                continue
            Gy[fy, x] = hllc_flux(UB, UT, g, 1)

    Un = U.copy()
    inv12 = 1.0 / 12.0
    for y in range(ny):
        for x in range(nx):
            if mask[y, x]:
                continue
            un = (
                U[y, x]
                - dt * (Fx[y, x + 1] - Fx[y, x])
                - dt * (Gy[y + 1, x] - Gy[y, x])
            )
            # diffusion
            xm2 = neighbor_or_wall(cfg, U, mask, x, y, -2, 0)
            xm1 = neighbor_or_wall(cfg, U, mask, x, y, -1, 0)
            xp1 = neighbor_or_wall(cfg, U, mask, x, y, +1, 0)
            xp2 = neighbor_or_wall(cfg, U, mask, x, y, +2, 0)
            d2x = (-xm2 + 16 * xm1 - 30 * U[y, x] + 16 * xp1 - xp2) * inv12
            ym2 = neighbor_or_wall(cfg, U, mask, x, y, 0, -2)
            ym1 = neighbor_or_wall(cfg, U, mask, x, y, 0, -1)
            yp1 = neighbor_or_wall(cfg, U, mask, x, y, 0, +1)
            yp2 = neighbor_or_wall(cfg, U, mask, x, y, 0, +2)
            d2y = (-ym2 + 16 * ym1 - 30 * U[y, x] + 16 * yp1 - yp2) * inv12
            lap = d2x + d2y
            un = un + dt * np.array(
                [cfg.visc_rho * lap[0], cfg.visc_nu * lap[1],
                 cfg.visc_nu * lap[2], cfg.visc_e * lap[3]]
            )

            un[0] = max(un[0], EPS_RHO)
            q = cons_to_prim(un, g)
            if q[3] <= EPS_P or not all(math.isfinite(v) for v in q):
                q = (max(q[0], EPS_RHO), q[1], q[2], max(q[3], EPS_P))
                un = prim_to_cons(q, g)
            Un[y, x] = un

    return Un, dt
