"""Port of the reference's device-math micro unit tests
(tau_hypersonic_cuda_tests.cu:245-484) as pure-JAX function tests.

The reference runs these in <<<1,1>>> CUDA kernels; here they are direct
function calls at float64 (the tests' tolerances are double-precision) via
numpy inputs — the ops are dtype-polymorphic.
"""

import jax.numpy as jnp
import numpy as np

from fluidsims_tpu.ops import euler2d as e2
from fluidsims_tpu.ops import riemann
from fluidsims_tpu.ops.limiters import mc_limiter, minmod
from fluidsims_tpu.ops.sdf import sd_sphere_cone_capsule

GAMMA = 1.1  # default_config gamma (tau_hypersonic_cuda.cu:1396)


def f64(*xs):
    return [jnp.asarray(x, jnp.float64) for x in xs]


def prim(rho, u, v, p):
    return e2.Prim(*f64(rho, u, v, p))


def test_roundtrip_preserves_state():
    p = prim(1.4, 2.2, -0.7, 3.6)
    q = e2.cons_to_prim(e2.prim_to_cons(p, GAMMA), GAMMA)
    np.testing.assert_allclose(float(q.rho), 1.4, atol=1e-12)
    np.testing.assert_allclose(float(q.u), 2.2, atol=1e-12)
    np.testing.assert_allclose(float(q.v), -0.7, atol=1e-12)
    np.testing.assert_allclose(float(q.p), 3.6, atol=1e-12)


def test_clamps():
    c = e2.prim_to_cons(prim(-2.0, 1.5, -0.5, -7.0), GAMMA)
    assert abs(float(c.rho) - e2.EPS_RHO) <= 1e-30
    assert float(c.E) >= e2.EPS_P / (GAMMA - 1.0)
    q = e2.cons_to_prim(e2.Cons(*f64(1.0, 3.0, 4.0, 1e-20)), GAMMA)
    np.testing.assert_allclose(float(q.rho), 1.0, atol=1e-12)
    # Guaranteed floor is (gamma-1)*EPS_P: p = (g-1)*max(eint, EPS_P). (The
    # reference test asserts p >= EPS_P, which its own math cannot satisfy
    # for gamma=1.1 — that test only ever compile-checked in CI, see
    # .github/workflows/ci.yml:82-88.)
    assert float(q.p) >= (GAMMA - 1.0) * e2.EPS_P * (1 - 1e-12)


def test_limiters():
    a, b = f64(1.0, 2.0)
    np.testing.assert_allclose(float(minmod(a, b)), 1.0, atol=1e-15)
    a, b = f64(-1.0, 2.0)
    np.testing.assert_allclose(float(minmod(a, b)), 0.0, atol=1e-15)
    dl, dc, dr = f64(1.0, 1.2, 1.5)
    mc = float(mc_limiter(dl, dc, dr))
    assert 0.0 < mc <= 1.0
    dl, dc, dr = f64(-1.0, 0.2, 1.0)
    np.testing.assert_allclose(float(mc_limiter(dl, dc, dr)), 0.0, atol=1e-15)


def test_fluxes_and_sound():
    p = prim(2.0, 3.0, -4.0, 5.0)
    U = e2.prim_to_cons(p, GAMMA)
    Fx = e2.flux(U, GAMMA, axis=0)
    Fy = e2.flux(U, GAMMA, axis=1)
    np.testing.assert_allclose(float(Fx.rho), 6.0, atol=1e-12)
    np.testing.assert_allclose(float(Fx.mx), 23.0, atol=1e-12)
    np.testing.assert_allclose(float(Fx.my), -24.0, atol=1e-12)
    # E = p/(gamma-1) + 0.5*rho*(u^2+v^2) = 5/0.1 + 25 = 75, so
    # Fx.E = (E+p)*u = 240 and Fy.E = (E+p)*v = -320. (The reference test
    # hardcodes 102/-136, which is inconsistent with its own gamma=1.1 EOS —
    # that test only ever compile-checked in CI.)
    np.testing.assert_allclose(float(Fx.E), 240.0, atol=1e-12)
    np.testing.assert_allclose(float(Fy.rho), -8.0, atol=1e-12)
    np.testing.assert_allclose(float(Fy.mx), -24.0, atol=1e-12)
    np.testing.assert_allclose(float(Fy.my), 37.0, atol=1e-12)
    np.testing.assert_allclose(float(Fy.E), -320.0, atol=1e-12)
    np.testing.assert_allclose(
        float(e2.sound_speed(p, GAMMA)), np.sqrt(GAMMA * 5.0 / 2.0), atol=1e-12
    )


def test_inflow_state():
    infl = e2.inflow_prim(GAMMA, 25.0, dtype=jnp.float64)
    np.testing.assert_allclose(float(infl.rho), 1.0, atol=1e-12)
    np.testing.assert_allclose(float(infl.u), 25.0 * np.sqrt(GAMMA), atol=1e-12)
    np.testing.assert_allclose(float(infl.v), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(infl.p), 1.0, atol=1e-12)


def test_hllc_consistency_equal_states():
    p = prim(1.0, 3.0, -0.5, 2.0)
    U = e2.prim_to_cons(p, GAMMA)
    for axis in (0, 1):
        F = riemann.hllc(U, U, GAMMA, axis)
        Fref = e2.flux(U, GAMMA, axis)
        for a, b in zip(F, Fref):
            np.testing.assert_allclose(float(a), float(b), atol=1e-11)


def test_hlle_consistency_equal_states():
    p = prim(1.3, -2.0, 0.4, 1.7)
    U = e2.prim_to_cons(p, GAMMA)
    for axis in (0, 1):
        F = riemann.hlle(U, U, GAMMA, axis)
        Fref = e2.flux(U, GAMMA, axis)
        for a, b in zip(F, Fref):
            np.testing.assert_allclose(float(a), float(b), atol=1e-11)


def test_enforce_positive_repairs():
    qc = prim(1.0, 4.0, -2.0, 1.0)
    qm = prim(-1.0, 8.0, -4.0, -3.0)
    qp = prim(-2.0, -8.0, 4.0, -2.0)
    qm2, qp2 = e2.enforce_positive_faces(qm, qc, qp)
    assert float(qm2.rho) >= e2.EPS_RHO
    assert float(qm2.p) >= e2.EPS_P
    assert float(qp2.rho) >= e2.EPS_RHO
    assert float(qp2.p) >= e2.EPS_P


def test_enforce_positive_no_change():
    qc = prim(1.0, 2.0, -1.0, 1.0)
    qm = prim(0.8, 2.2, -0.9, 1.1)
    qp = prim(1.2, 1.8, -1.2, 0.9)
    qm2, qp2 = e2.enforce_positive_faces(qm, qc, qp)
    np.testing.assert_allclose(float(qm2.rho), 0.8, atol=1e-12)
    np.testing.assert_allclose(float(qm2.p), 1.1, atol=1e-12)
    np.testing.assert_allclose(float(qp2.rho), 1.2, atol=1e-12)
    np.testing.assert_allclose(float(qp2.p), 0.9, atol=1e-12)


def test_sdf_sign():
    x, y = f64(1.0, 0.0)
    assert float(sd_sphere_cone_capsule(x, y, 5.0, 2.0, 0.6)) < 0.0
    x, y = f64(40.0, 0.0)
    assert float(sd_sphere_cone_capsule(x, y, 5.0, 2.0, 0.6)) > 0.0


def test_hllc_supersonic_upwinds():
    # Strongly supersonic left-moving and right-moving states pick F(U) of
    # the upwind side exactly (SL>=0 / SR<=0 early-outs).
    fast_right = prim(1.0, 50.0, 0.0, 1.0)
    U = e2.prim_to_cons(fast_right, GAMMA)
    F = riemann.hllc(U, U, GAMMA, 0)
    Fref = e2.flux(U, GAMMA, 0)
    for a, b in zip(F, Fref):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-12)
