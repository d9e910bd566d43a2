"""3-D hypersonic solver tests: EOS/WENO unit checks + physics invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from fluidsims_tpu.ops.weno import weno5_left, weno5_right
from fluidsims_tpu.solvers import hypersonic3d as h3


def small_cfg(n=16, **kw):
    return h3.default_config(n, **kw)


def test_weno_reproduces_smooth_polynomial():
    # WENO5 is 5th-order: exact for constants and near-exact for smooth data
    v = jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0], jnp.float64)
    np.testing.assert_allclose(float(weno5_left(*v)), 1.0, atol=1e-12)
    # linear data -> face value = midpoint extrapolation (i+1/2 from center 2)
    x = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0], jnp.float64)
    np.testing.assert_allclose(float(weno5_left(*x)), 2.5, atol=1e-10)
    np.testing.assert_allclose(float(weno5_right(*x)), 1.5, atol=1e-10)


def test_eos_roundtrip_and_tv_newton():
    cfg = small_cfg()
    q = h3.PrimT(
        r=jnp.asarray(0.5, jnp.float64), u=jnp.asarray(3.0, jnp.float64),
        v=jnp.asarray(-1.0, jnp.float64), w=jnp.asarray(0.3, jnp.float64),
        p=jnp.asarray(0.7, jnp.float64), ev=jnp.asarray(0.2, jnp.float64),
    )
    q2 = h3.cons_to_prim(cfg, h3.prim_to_cons(cfg, q))
    for a, b in zip(q, q2):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-10)

    # Tv Newton converges toward the temperature whose evib_eq matches
    T = jnp.asarray(0.5, jnp.float64)
    ev = h3.evib_eq(cfg, T)
    Tv = h3.tv_from_evib(cfg, ev, T)
    np.testing.assert_allclose(float(Tv), 0.5, rtol=1e-3)


def test_hllc_consistency():
    cfg = small_cfg()
    q = h3.PrimT(
        r=jnp.asarray(0.4, jnp.float64), u=jnp.asarray(1.0, jnp.float64),
        v=jnp.asarray(0.2, jnp.float64), w=jnp.asarray(-0.1, jnp.float64),
        p=jnp.asarray(0.9, jnp.float64), ev=jnp.asarray(0.1, jnp.float64),
    )
    for axis in range(3):
        F = h3.hllc_flux(cfg, q, q, axis)
        Fref = h3.axis_flux(cfg, q, axis)
        for a, b in zip(F, Fref):
            # entropy fix + HLL blending perturb nothing for equal states
            np.testing.assert_allclose(float(a), float(b), rtol=1e-6,
                                       atol=1e-9, err_msg=f"axis {axis}")


def test_solid_mask_sphere():
    cfg = small_cfg(16)
    solid = h3.build_solid(cfg)
    assert solid[8, 8, 8]          # center inside
    assert not solid[0, 0, 0]      # corner outside
    padded = h3.build_solid(cfg, pad=3)
    assert padded.shape == (22, 22, 22)
    np.testing.assert_array_equal(padded[3:-3, 3:-3, 3:-3], solid)


def test_step_runs_and_stays_physical():
    cfg = small_cfg(16)
    s = h3.init(cfg)
    out = jax.jit(lambda st: h3.run(cfg, st, 20))(s)
    for name in ("xi", "phix", "phiy", "phiz", "lam", "zet"):
        f = np.asarray(getattr(out, name))
        assert np.isfinite(f).all(), name
    rho = np.exp(np.asarray(out.xi))
    p = np.exp(np.asarray(out.lam))
    assert (rho > 0).all() and (p > 0).all()
    # clock advanced and dtau stayed in controller bounds
    assert float(out.t) > float(s.t)
    assert 1e-7 <= float(out.dtau) <= 5e-2


def test_flow_develops_toward_sphere():
    cfg = small_cfg(24)
    s = h3.init(cfg)
    out = jax.jit(lambda st: h3.run(cfg, st, 120))(s)
    solid = np.asarray(out.solid)
    u = cfg.u_ref * np.sinh(np.asarray(out.phix))
    # inflow ramp has begun pushing gas in +x in the sponge region
    assert u[~solid].max() > 0.1
    # vis modes all produce finite fields
    for mode in h3.VIS_MODES:
        f = np.asarray(h3.vis_field(cfg, out, mode))
        assert np.isfinite(f).all(), mode
        assert (f[solid] == 0).all(), mode


def test_dtau_controller_reacts():
    cfg = small_cfg(16)
    s = h3.init(cfg)
    step = jax.jit(lambda st: h3.step(cfg, st))
    dtaus = [float(s.dtau)]
    for _ in range(10):
        s = step(s)
        dtaus.append(float(s.dtau))
    # controller moved dtau (grows while dt << dt_cfl early on)
    assert any(abs(a - b) > 0 for a, b in zip(dtaus, dtaus[1:]))
