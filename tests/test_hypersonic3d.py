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


def test_characteristic_outflow_runs_and_matches_supersonic_extrap():
    cfg = small_cfg(12, outflow="characteristic", dtype="float64")
    s = h3.init(cfg)
    out = jax.jit(lambda st: h3.run(cfg, st, 10))(s)
    for name in ("xi", "phix", "lam", "zet"):
        assert np.isfinite(np.asarray(getattr(out, name))).all(), name

    # supersonic outflow (un > a): every wave is outgoing, so the LODI
    # ghost reduces exactly to the linear extrapolation of the last two
    # columns (tau_hypersonic_3d_cuda.cu:668-676 gates all pass)
    q = h3.PrimT(
        r=jnp.full((4, 4, 6), 0.5, jnp.float64),
        u=jnp.full((4, 4, 6), 50.0, jnp.float64),
        v=jnp.zeros((4, 4, 6), jnp.float64),
        w=jnp.zeros((4, 4, 6), jnp.float64),
        p=jnp.full((4, 4, 6), 0.3, jnp.float64),
        ev=jnp.full((4, 4, 6), 0.1, jnp.float64),
    )
    # make the last two columns differ so extrapolation is nontrivial
    q = q._replace(p=q.p.at[:, :, -1].set(0.32), r=q.r.at[:, :, -1].set(0.52))
    infl = h3.inflow_prim(cfg, jnp.float64)
    ghosts = h3._outflow_characteristic(cfg, q, infl)
    for g in range(h3.HALO):
        gf = g + 1.0
        np.testing.assert_allclose(
            np.asarray(ghosts.p[:, :, g]), 0.32 + gf * (0.32 - 0.3),
            rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ghosts.r[:, :, g]), 0.52 + gf * (0.52 - 0.5),
            rtol=1e-12)


def test_outflow_reflection_metric():
    cfg = small_cfg(12, dtype="float64")
    s = h3.init(cfg)
    m = float(h3.outflow_reflection_metric(cfg, s, nprobe=6))
    # init state: p == inflow_p everywhere -> metric 0
    np.testing.assert_allclose(m, 0.0, atol=1e-12)
    # bump one cell in the probe region
    lam = s.lam.at[3, 3, -2].set(jnp.log(0.05))
    m2 = float(h3.outflow_reflection_metric(cfg, s._replace(lam=lam), 6))
    np.testing.assert_allclose(m2, 0.05 - cfg.inflow_p, rtol=1e-10)
    # the same bump outside the probe window is invisible
    lam3 = s.lam.at[3, 3, 0].set(jnp.log(0.05))
    m3 = float(h3.outflow_reflection_metric(cfg, s._replace(lam=lam3), 6))
    np.testing.assert_allclose(m3, 0.0, atol=1e-12)


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


def test_matches_loop_oracle_f64():
    """Full-pipeline cross-check vs the independent per-cell float64 oracle
    (tests/oracles/hypersonic3d_oracle.py) on a tiny grid."""
    from tests.oracles.hypersonic3d_oracle import Oracle3D

    # t0=5e-3 puts the inflow ramp gain at ~0.25+ so the sponge drives real
    # dynamics (shock formation, WENO + wall branches) within a few steps
    cfg = h3.Hypersonic3DConfig(
        nx=10, ny=8, nz=8, dx=1.0 / 10, dy=1.0 / 8, dz=1.0 / 8,
        sponge_n=3, sponge_out_n=3, t0=5e-3, dtau0=5e-3, dtype="float64",
    )
    s = h3.init(cfg)
    orc = Oracle3D(cfg)

    # Seed a small uniform +x velocity in both implementations.  With the
    # quiescent init the outlet u is pure roundoff noise (~1e-34) and the
    # transmissive-outflow "reversed flow -> inflow" branch (un < 0,
    # tau_hypersonic_3d_cuda.cu:705) flips chaotically between otherwise
    # bit-equal implementations.  A solidly positive outlet u makes the
    # branch well-determined while exercising strictly more physics.
    u0 = 0.05
    fl = ~np.asarray(s.solid)
    phix = np.asarray(s.phix).copy()
    phix[fl] = np.arcsinh(u0 / cfg.u_ref)
    s = s._replace(phix=jnp.asarray(phix))
    orc.q[..., 1] = np.where(fl, u0, orc.q[..., 1])

    step = jax.jit(lambda st: h3.step(cfg, st))
    for _ in range(10):
        s = step(s)
        orc.step()
    # dynamics actually developed (velocities nonzero)
    assert float(np.abs(np.asarray(s.phix)).max()) > 1e-3

    got = np.stack([
        np.exp(np.asarray(s.xi)),
        cfg.u_ref * np.sinh(np.asarray(s.phix)),
        cfg.u_ref * np.sinh(np.asarray(s.phiy)),
        cfg.u_ref * np.sinh(np.asarray(s.phiz)),
        np.exp(np.asarray(s.lam)),
        np.exp(np.asarray(s.zet)),
    ], axis=-1)
    fl = ~np.asarray(s.solid)
    ref = orc.q
    scale = np.maximum(np.abs(ref[fl]), 1e-3)
    rel = np.abs(got[fl] - ref[fl]) / scale
    # measured 1.1e-13 after 10 steps; 1e-10 leaves slack for BLAS variation
    assert float(rel.max()) < 1e-10, f"max rel err {rel.max()}"
    np.testing.assert_allclose(float(s.t), orc.t, rtol=1e-10)
    np.testing.assert_allclose(float(s.dtau), orc.dtau, rtol=1e-10)


def test_hllc_wall_flux_matches_generic_bitwise():
    """The specialized symmetric-pair HLLC (hllc_wall_flux) must be
    BITWISE equal to the generic hllc_flux on (q, mirror(q)) pairs for
    both orientations and all three axes."""
    import jax.numpy as jnp

    cfg = h3.default_config(16)
    rng = np.random.default_rng(1)
    shape = (5, 6, 7)
    q = h3.PrimT(
        r=jnp.asarray(rng.uniform(0.01, 5, shape), jnp.float32),
        u=jnp.asarray(rng.normal(0, 3, shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, 3, shape), jnp.float32),
        w=jnp.asarray(rng.normal(0, 3, shape), jnp.float32),
        p=jnp.asarray(rng.uniform(0.01, 10, shape), jnp.float32),
        ev=jnp.asarray(rng.uniform(0, 2, shape), jnp.float32),
    )
    for axis in range(3):
        pairs = (
            (h3.hllc_flux(cfg, q, h3._mirror(q, axis), axis),
             h3.hllc_wall_flux(cfg, q, axis, left=True)),
            (h3.hllc_flux(cfg, h3._mirror(q, axis), q, axis),
             h3.hllc_wall_flux(cfg, q, axis, left=False)),
        )
        for ref, got in pairs:
            for f_ref, f_got in zip(ref, got):
                np.testing.assert_array_equal(np.asarray(f_got),
                                              np.asarray(f_ref))


def test_weno5_lr_slab_matches_windowed():
    """The shared-form WENO pair must track the windowed left/right
    reconstructions to a few ulp on every axis."""
    import jax
    import jax.numpy as jnp

    from fluidsims_tpu.ops.weno import (weno5_left, weno5_lr_slab,
                                        weno5_right)

    rng = np.random.default_rng(0)
    for shape, axis in (((30,), 0), ((4, 30), 1), ((30, 5, 6), 0)):
        n = shape[axis] - 6
        fp = jnp.asarray(rng.normal(size=shape), jnp.float32)
        L2, R2 = weno5_lr_slab(fp, axis)

        def sl(off):
            return jax.lax.slice_in_dim(fp, 2 + off, 2 + off + n + 1,
                                        axis=axis)

        L1 = weno5_left(sl(-2), sl(-1), sl(0), sl(1), sl(2))
        R1 = weno5_right(sl(-1), sl(0), sl(1), sl(2), sl(3))
        np.testing.assert_allclose(np.asarray(L2), np.asarray(L1),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R1),
                                   rtol=0, atol=1e-6)


def test_boxed_wall_flux_equals_dense():
    """step_core_padded with a static solid_box must match the dense
    wall-flux path — including a sphere pushed against the domain
    boundary (box clamping) and an unbounded-z kernel-style box.  The
    SELECTED wall-flux values are verified bitwise below; the step-level
    comparison allows ulp-level noise because the two programs lower to
    different XLA fusions (FMA contraction differs — the same reason the
    sharded tests use 3e-6, test_sharded3d.py:31)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fluidsims_tpu.solvers import hypersonic3d as h3

    # off-center sphere touching the -x / -y boundary region
    cfg = h3.default_config(16, sdf_cx=0.12, sdf_cy=0.2, sdf_cz=0.6,
                            sdf_r=0.22)
    mask = h3.build_solid(cfg, pad=h3.HALO)
    assert mask.any()
    box = h3.solid_box_from_mask(mask)

    rng = np.random.default_rng(3)
    H = h3.HALO
    shp = (16 + 2 * H,) * 3
    qp = h3.PrimT(*(jnp.asarray(rng.random(shp), jnp.float32) + 0.5
                    for _ in range(6)))
    sp = jnp.asarray(mask)
    dt = jnp.float32(1e-4)
    gain = jnp.float32(1.0)

    # the wall fluxes themselves must agree BITWISE at every face the
    # flux select can read them (face_solid true)
    for axis in range(3):
        arr_ax = {0: 2, 1: 1, 2: 0}[axis]
        fsl = h3._sl(sp, arr_ax, H - 1, 1)
        fsr = h3._sl(sp, arr_ax, H, 1)
        fs = np.asarray(fsl | fsr)
        assert fs.any()
        L, R, qface_l, qface_r = jax.jit(
            lambda qp, a=axis: h3._face_prims(cfg, qp, sp, a))(qp)
        for left, qf in ((True, qface_l), (False, qface_r)):
            d, b = jax.jit(lambda qf, a=axis, lf=left: (
                h3.hllc_wall_flux(cfg, qf, a, left=lf),
                h3._boxed_wall_flux(cfg, qf, a, lf, box)))(qf)
            for name, dd, bb in zip(d._fields, d, b):
                np.testing.assert_array_equal(
                    np.asarray(dd)[fs], np.asarray(bb)[fs],
                    err_msg=f"axis{axis} left={left} {name}")

    dense = jax.jit(lambda qp: h3.step_core_padded(
        cfg, qp, sp, dt, gain, solid_box="dense"))(qp)
    boxed = jax.jit(lambda qp: h3.step_core_padded(
        cfg, qp, sp, dt, gain, solid_box=box))(qp)
    for name, a, b in zip(dense._fields, dense, boxed):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6, err_msg=name)

    # kernel-style box: x-only restriction, z/y unbounded
    kbox = ((0, 1 << 30), (0, 1 << 30), box[2])
    xonly = jax.jit(lambda qp: h3.step_core_padded(
        cfg, qp, sp, dt, gain, solid_box=kbox))(qp)
    for name, a, b in zip(dense._fields, dense, xonly):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6, err_msg=name)

    # no solid at all: box None skips the wall fluxes, same result
    cfg2 = h3.default_config(16, sdf_r=1e-6)
    mask2 = h3.build_solid(cfg2, pad=h3.HALO)
    if not mask2.any():
        sp2 = jnp.asarray(mask2)
        dense2 = jax.jit(lambda qp: h3.step_core_padded(
            cfg2, qp, sp2, dt, gain, solid_box="dense"))(qp)
        none2 = jax.jit(lambda qp: h3.step_core_padded(
            cfg2, qp, sp2, dt, gain, solid_box=None))(qp)
        for name, a, b in zip(dense2._fields, dense2, none2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=2e-6, err_msg=name)
