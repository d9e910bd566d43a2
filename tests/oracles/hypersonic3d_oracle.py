"""Float64 loop-structured oracle for the 3-D hypersonic solver.

Independent per-cell transcription of tau_hypersonic_3d_cuda.cu's k_step
pipeline (WENO5/degraded faces -> HLLC with entropy fix + HLL blending ->
update -> repair -> Landau-Teller -> sponges -> τ feedback), structured like
the CUDA kernel (per-cell, both faces per axis) rather than the vectorized
face-array JAX implementation it validates.  Tiny grids only.
"""

from __future__ import annotations

import math

import numpy as np

RHO_P_FLOOR = 1e-30
THERM_FLOOR = 1e-12
DENOM_EPS = 1e-12
NEWTON_FLOOR = 1e-6
TAU_VIB_MIN = 1e-9
WENO_EPS = 1e-6


class P:
    """Mirror of the reference Params with the JAX config's defaults."""

    def __init__(self, cfg):
        for k, v in cfg.asdict().items():
            setattr(self, k, v)
        self.gamma = cfg.gamma_floor


def evib_eq(p, T):
    a = p.theta_v / max(T, NEWTON_FLOOR)
    return (p.R * p.theta_v) / max(math.exp(a) - 1.0, NEWTON_FLOOR)


def prim_to_cons(p, q):
    r, u, v, w, pr, ev = q
    ke = 0.5 * (u * u + v * v + w * w)
    eth = pr / max((p.gamma - 1.0) * r, RHO_P_FLOOR)
    return np.array([r, r * u, r * v, r * w, r * (ke + eth + ev), r * ev])


def cons_to_prim(p, U):
    r = max(U[0], RHO_P_FLOOR)
    u, v, w = U[1] / r, U[2] / r, U[3] / r
    ke = 0.5 * (u * u + v * v + w * w)
    ev = max(U[5] / r, 0.0)
    eth = max(U[4] / r - ke - ev, THERM_FLOOR)
    pr = max((p.gamma - 1.0) * r * eth, RHO_P_FLOOR)
    return (r, u, v, w, pr, ev)


def sound(p, q):
    return math.sqrt(max(p.gamma * q[4] / q[0], DENOM_EPS))


def axis_flux(p, q, ax):
    r, u, v, w, pr, ev = q
    un = (u, v, w)[ax]
    H = pr / r + 0.5 * (u * u + v * v + w * w) + ev \
        + pr / max((p.gamma - 1.0) * r, RHO_P_FLOOR)
    mom = [r * u * un, r * v * un, r * w * un]
    mom[ax] += pr
    return np.array([r * un, mom[0], mom[1], mom[2], r * H * un, r * ev * un])


def sgn_denom(x):
    return math.copysign(max(abs(x), DENOM_EPS), x) if x != 0 \
        else DENOM_EPS


def entropy_fix(s, a_ref):
    d = 0.1 * a_ref
    if abs(s) >= d:
        return s
    sm = 0.5 * (s * s / max(d, DENOM_EPS) + d)
    return sm if s >= 0 else -sm


def hllc(p, L, R, ax):
    aL, aR = sound(p, L), sound(p, R)
    unL = (L[1], L[2], L[3])[ax]
    unR = (R[1], R[2], R[3])[ax]
    sL = min(unL - aL, unR - aR)
    sR = max(unL + aL, unR + aR)
    aRef = max(aL, aR)
    sL = entropy_fix(sL, aRef)
    sR = entropy_fix(sR, aRef)

    UL = prim_to_cons(p, L)
    UR = prim_to_cons(p, R)
    FL = axis_flux(p, L, ax)
    FR = axis_flux(p, R, ax)
    if sL >= 0.0:
        return FL
    if sR <= 0.0:
        return FR

    den = sgn_denom(L[0] * (sL - unL) - R[0] * (sR - unR))
    sM = (R[4] - L[4] + L[0] * unL * (sL - unL)
          - R[0] * unR * (sR - unR)) / den
    pStar = 0.5 * ((L[4] + L[0] * (sL - unL) * (sM - unL))
                   + (R[4] + R[0] * (sR - unR) * (sM - unR)))

    others = [(L[1], R[1]), (L[2], R[2]), (L[3], R[3])]
    crossL = sum(abs(a) for i, (a, b) in enumerate(others) if i != ax)
    crossR = sum(abs(b) for i, (a, b) in enumerate(others) if i != ax)
    vcross = 0.5 * (crossL + crossR)
    align = min(max(1.0 - vcross / max(aRef, DENOM_EPS), 0.0), 1.0)
    dp = abs(R[4] - L[4]) / max(R[4] + L[4], DENOM_EPS)
    dr = abs(R[0] - L[0]) / max(R[0] + L[0], DENOM_EPS)
    alpha = min(max(5.0 * 0.5 * (dp + dr), 0.0), 1.0) * align

    FHLL = (sR * FL - sL * FR + sL * sR * (UR - UL)) / sgn_denom(sR - sL)

    if sM >= 0.0:
        q, U, F, s = L, UL, FL, sL
    else:
        q, U, F, s = R, UR, FR, sR
    un = (q[1], q[2], q[3])[ax]
    d = sgn_denom(s - sM)
    rStar = q[0] * (s - un) / d
    EStar = ((s - un) * U[4] - q[4] * un + pStar * sM) / d
    EvStar = U[5] * (s - un) / d
    mom = [rStar * q[1], rStar * q[2], rStar * q[3]]
    mom[ax] = rStar * sM
    UStar = np.array([rStar, mom[0], mom[1], mom[2], EStar, EvStar])
    FHLLC = F + s * (UStar - U)
    return (1.0 - alpha) * FHLLC + alpha * FHLL


def weno5_left(v0, v1, v2, v3, v4):
    p0 = (2 * v0 - 7 * v1 + 11 * v2) / 6.0
    p1 = (-v1 + 5 * v2 + 2 * v3) / 6.0
    p2 = (2 * v2 + 5 * v3 - v4) / 6.0
    b0 = 13 / 12 * (v0 - 2 * v1 + v2) ** 2 + 0.25 * (v0 - 4 * v1 + 3 * v2) ** 2
    b1 = 13 / 12 * (v1 - 2 * v2 + v3) ** 2 + 0.25 * (v1 - v3) ** 2
    b2 = 13 / 12 * (v2 - 2 * v3 + v4) ** 2 + 0.25 * (3 * v2 - 4 * v3 + v4) ** 2
    a0 = 0.1 / (WENO_EPS + b0) ** 2
    a1 = 0.6 / (WENO_EPS + b1) ** 2
    a2 = 0.3 / (WENO_EPS + b2) ** 2
    s = a0 + a1 + a2
    return (a0 * p0 + a1 * p1 + a2 * p2) / s


def weno_face(q0, q1, q2, q3, q4, q5):
    L = tuple(weno5_left(q0[c], q1[c], q2[c], q3[c], q4[c]) for c in range(6))
    R = tuple(weno5_left(q5[c], q4[c], q3[c], q2[c], q1[c]) for c in range(6))
    return floor_prim(L), floor_prim(R)


def floor_prim(q):
    return (max(q[0], RHO_P_FLOOR), q[1], q[2], q[3],
            max(q[4], RHO_P_FLOOR), max(q[5], 0.0))


def wall_prim(p, q):
    pr = max(q[4], RHO_P_FLOOR)
    r = max(pr / (p.R * max(p.Twall, NEWTON_FLOOR)), RHO_P_FLOOR)
    return (r, 0.0, 0.0, 0.0, pr, evib_eq(p, p.Twall))


def inflow_prim(p):
    r = max(p.inflow_r, RHO_P_FLOOR)
    pr = max(p.inflow_p, RHO_P_FLOOR)
    return (r, p.inflow_u, p.inflow_v, p.inflow_w, pr,
            evib_eq(p, pr / (r * p.R)))


def mirror(q, ax):
    out = list(q)
    out[1 + ax] = -out[1 + ax]
    return tuple(out)


class Oracle3D:
    def __init__(self, cfg):
        self.p = P(cfg)
        self.nx, self.ny, self.nz = cfg.nx, cfg.ny, cfg.nz
        p = self.p
        self.solid = np.zeros((self.nz, self.ny, self.nx), bool)
        for z in range(self.nz):
            for y in range(self.ny):
                for x in range(self.nx):
                    self.solid[z, y, x] = self._sdf(x, y, z) < 0.0
        # init (k_init semantics)
        self.q = np.zeros((self.nz, self.ny, self.nx, 6))
        r = max(p.inflow_r, RHO_P_FLOOR)
        pr = max(p.inflow_p, RHO_P_FLOOR)
        for z in range(self.nz):
            for y in range(self.ny):
                for x in range(self.nx):
                    if self.solid[z, y, x]:
                        self.q[z, y, x] = wall_prim(p, (r, 0, 0, 0, pr, 0))
                    else:
                        self.q[z, y, x] = (r, 0, 0, 0, pr,
                                           evib_eq(p, pr / (r * p.R)))
        self.t = cfg.t0
        self.dtau = cfg.dtau0

    def _sdf(self, x, y, z):
        p = self.p
        X, Y, Z = (x + 0.5) * p.dx, (y + 0.5) * p.dy, (z + 0.5) * p.dz
        return math.sqrt((X - p.sdf_cx) ** 2 + (Y - p.sdf_cy) ** 2
                         + (Z - p.sdf_cz) ** 2) - p.sdf_r

    def solid_at(self, x, y, z):
        y %= self.ny
        z %= self.nz
        if 0 <= x < self.nx:
            return self.solid[z, y, x]
        return self._sdf(x, y, z) < 0.0

    def prim_at(self, x, y, z):
        """prim_at_xbc + solid wall substitution (shared-mem loader
        semantics, tau_hypersonic_3d_cuda.cu:1019-1057)."""
        p = self.p
        y %= self.ny
        z %= self.nz
        if x < 0:
            q = inflow_prim(p)
        elif x >= self.nx:
            q = self._outflow(y, z)
        else:
            q = tuple(self.q[z, y, x])
        if self.solid_at(x, y, z):
            q = wall_prim(p, q)
        return q

    def _outflow(self, y, z):
        p = self.p
        qR = tuple(self.q[z, y, self.nx - 1])
        aR = sound(p, qR)
        un = qR[1]
        if un < 0.0:
            return inflow_prim(p)
        q = list(qR)
        if un < aR:
            q[4] = max(q[4] + 0.05 * (max(p.inflow_p, RHO_P_FLOOR) - q[4]),
                       RHO_P_FLOOR)
        q[0] = max(q[0], RHO_P_FLOOR)
        q[4] = max(q[4], RHO_P_FLOOR)
        q[5] = max(q[5], 0.0)
        return tuple(q)

    def _face_fluxes(self, x, y, z, ax):
        """(F_minus, F_plus) for cell (x,y,z) along axis ax, with the wall/
        stencil degradation (tau_hypersonic_3d_cuda.cu:1113-1264)."""
        d = [0, 0, 0]
        d[ax] = 1

        def q_at(o):
            return self.prim_at(x + o * d[0], y + o * d[1], z + o * d[2])

        def s_at(o):
            return self.solid_at(x + o * d[0], y + o * d[1], z + o * d[2])

        qs = {o: q_at(o) for o in range(-3, 4)}

        def face(side):
            # side=-1: minus face; side=+1: plus face
            if side < 0:
                face_solid = s_at(-1) or s_at(0)
                sten = any(s_at(o) for o in range(-3, 3))
                L6 = [qs[o] for o in range(-3, 3)]
                first = (qs[-1], qs[0])
                mirror_pair = (mirror(qs[0], ax), qs[0])
            else:
                face_solid = s_at(0) or s_at(1)
                sten = any(s_at(o) for o in range(-2, 4))
                L6 = [qs[o] for o in range(-2, 4)]
                first = (qs[0], qs[1])
                mirror_pair = (qs[0], mirror(qs[0], ax))
            if face_solid:
                if side < 0:
                    L, R = mirror_pair
                else:
                    L, R = mirror_pair
                return hllc(self.p, L, R, ax)
            if sten:
                L, R = floor_prim(first[0]), floor_prim(first[1])
                return hllc(self.p, L, R, ax)
            L, R = weno_face(*L6)
            return hllc(self.p, L, R, ax)

        return face(-1), face(+1)

    def step(self):
        p = self.p
        self.t *= math.exp(self.dtau)
        dt = self.t * self.dtau
        gain = min(max(self.t / 0.02, 0.0), 1.0)

        new_q = self.q.copy()
        maxs = 0.0
        for z in range(self.nz):
            for y in range(self.ny):
                for x in range(self.nx):
                    if self.solid[z, y, x]:
                        continue
                    q0 = tuple(self.q[z, y, x])
                    U0 = prim_to_cons(p, q0)
                    dU = np.zeros(6)
                    for ax, dd in ((0, p.dx), (1, p.dy), (2, p.dz)):
                        Fm, Fp = self._face_fluxes(x, y, z, ax)
                        dU -= (Fp - Fm) / dd
                    U1 = U0 + dt * dU
                    q1 = list(cons_to_prim(p, U1))
                    if (not all(math.isfinite(v) for v in q1)
                            or q1[0] <= 0 or q1[4] <= 0 or q1[5] < 0):
                        q1 = list(inflow_prim(p))
                    T1 = q1[4] / (q1[0] * p.R)
                    ev_eq = evib_eq(p, T1)
                    q1[5] = max(q1[5] + (ev_eq - q1[5])
                                * (dt / max(p.tau_vib, TAU_VIB_MIN)), 0.0)
                    # sponges
                    if p.sponge_n > 0 and x < p.sponge_n:
                        s = min(max(1.0 - x / p.sponge_n, 0.0), 1.0)
                        k = p.sponge_strength * s * s
                        tr = max(p.inflow_r, RHO_P_FLOOR)
                        tp = max(p.inflow_p, RHO_P_FLOOR)
                        tev = evib_eq(p, tp / (tr * p.R))
                        q1[0] = max(q1[0] + k * (tr - q1[0]), RHO_P_FLOOR)
                        q1[4] = max(q1[4] + k * (tp - q1[4]), RHO_P_FLOOR)
                        q1[1] += k * (gain * p.inflow_u - q1[1])
                        q1[2] += k * (gain * p.inflow_v - q1[2])
                        q1[3] += k * (gain * p.inflow_w - q1[3])
                        q1[5] = max(q1[5] + k * (tev - q1[5]), 0.0)
                    if p.sponge_out_n > 0 and x >= self.nx - p.sponge_out_n:
                        xo = x - (self.nx - p.sponge_out_n)
                        s = min(max(xo / p.sponge_out_n, 0.0), 1.0)
                        k = p.sponge_out_strength * s * s
                        tr = max(p.inflow_r, RHO_P_FLOOR)
                        tp = max(p.inflow_p, RHO_P_FLOOR)
                        tev = evib_eq(p, tp / (tr * p.R))
                        q1[0] = max(q1[0] + k * (tr - q1[0]), RHO_P_FLOOR)
                        q1[4] = max(q1[4] + k * (tp - q1[4]), RHO_P_FLOOR)
                        q1[1] += k * (0.0 - q1[1])
                        q1[2] += k * (0.0 - q1[2])
                        q1[3] += k * (0.0 - q1[3])
                        q1[5] = max(q1[5] + k * (tev - q1[5]), 0.0)
                    a = sound(p, q1)
                    ss = (abs(q1[1]) + a) / p.dx + (abs(q1[2]) + a) / p.dy \
                        + (abs(q1[3]) + a) / p.dz
                    if math.isfinite(ss):
                        maxs = max(maxs, ss)
                    # log-space encode/decode roundtrip (storage effect)
                    q1[0] = math.exp(math.log(max(q1[0], RHO_P_FLOOR)))
                    q1[4] = math.exp(math.log(max(q1[4], RHO_P_FLOOR)))
                    q1[5] = math.exp(math.log(max(q1[5], RHO_P_FLOOR)))
                    new_q[z, y, x] = q1
        self.q = new_q

        dt_cfl = self.p.cfl / max(maxs, 1e-9)
        if dt > 1.10 * dt_cfl:
            self.dtau *= 0.80
        elif dt < 0.85 * dt_cfl:
            self.dtau *= 1.10
        self.dtau = min(max(self.dtau, 1e-7), 5e-2)
