"""Pallas kernel equivalence tests (interpret mode on CPU): the fused
kernels must reproduce the XLA dataflow paths to float32 round-off."""

import numpy as np

from fluidsims_tpu.kernels import gray_scott_pallas as gsp
from fluidsims_tpu.kernels import hypersonic2d_pallas as hp
from fluidsims_tpu.solvers import gray_scott as gs
from fluidsims_tpu.solvers import hypersonic2d as h2


def test_hypersonic_pallas_matches_xla():
    cfg = h2.default_config(nx=64, ny=32)
    s = h2.init(cfg)
    step_p = hp.make_step_pallas(cfg, band=8, interpret=True)
    a, b = s, s
    for _ in range(4):
        a = step_p(a)
        b = h2.step(cfg, b)
    for f, g, n in zip(a.U, b.U, ("rho", "mx", "my", "E")):
        fa, ga = np.asarray(f), np.asarray(g)
        scale = np.maximum(np.abs(ga), 1.0)
        assert (np.abs(fa - ga) / scale).max() < 1e-5, n
    np.testing.assert_allclose(float(a.t), float(b.t), rtol=1e-6)


def test_gray_scott_pallas_matches_xla():
    cfg = gs.GrayScottConfig(nx=48, ny=32)
    s = gs.init(cfg)
    step_p = gsp.make_step_pallas(cfg, band=8, interpret=True)
    a, b = s, s
    for _ in range(10):
        a = step_p(a)
        b = gs.step(cfg, b)
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v),
                               rtol=1e-6, atol=1e-7)


def test_hypersonic_pallas_xtiled_matches_untiled():
    # force 2 x-tiles on a small grid: the tiled layout must be exact
    cfg = h2.default_config(nx=128, ny=32)
    s = h2.init(cfg)
    step_t = hp.make_step_pallas(cfg, band=8, interpret=True, tile_w=64)
    step_1 = hp.make_step_pallas(cfg, band=8, interpret=True, tile_w=128)
    a, b = s, s
    for _ in range(3):
        a = step_t(a)
        b = step_1(b)
    for f, g, n in zip(a.U, b.U, ("rho", "mx", "my", "E")):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(g),
                                      err_msg=n)


def test_hypersonic_pallas_band_validation():
    cfg = h2.default_config(nx=64, ny=30)
    import pytest

    with pytest.raises(ValueError):
        hp.make_step_pallas(cfg, band=8)


def test_pick_tile_width():
    # 2048 wide fits whole at band=16; 8192 must split into 1024 tiles
    # (tiled threshold is tighter — junk columns, measured headroom)
    assert hp.pick_tile_width(2048, 16) == 2048
    assert hp.pick_tile_width(8192, 16) == 1024
    # f64 halves the budget once more
    assert hp.pick_tile_width(8192, 16, itemsize=8) == 512
    import pytest

    with pytest.raises(ValueError):  # 300 is not power-of-two divisible
        hp.pick_tile_width(4800 * 4, 4096)


def test_lbm_pallas_matches_xla():
    from fluidsims_tpu.kernels import lbm_pallas as lp
    from fluidsims_tpu.solvers import lbm

    cfg = lbm.LBMConfig(nx=64, ny=32, drive=1e-4)
    s = lbm.init(cfg)
    step_p = lp.make_step_pallas(cfg, band=8, interpret=True)
    a, b = s, s
    for _ in range(5):
        a = step_p(a)
        b = lbm.step(cfg, b)
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f),
                               rtol=1e-5, atol=1e-6)


def test_hypersonic3d_pallas_matches_xla():
    from fluidsims_tpu.kernels import hypersonic3d_pallas as hp3
    from fluidsims_tpu.solvers import hypersonic3d as h3

    cfg = h3.default_config(16, dtype="float64")
    s = h3.init(cfg)
    step_p = hp3.make_step_pallas(cfg, band=4, interpret=True)
    a, b = s, s
    for _ in range(3):
        a = step_p(a)
        b = h3.step(cfg, b)
    for name in ("xi", "phix", "phiy", "phiz", "lam", "zet"):
        fa = np.asarray(getattr(a, name))
        fb = np.asarray(getattr(b, name))
        assert np.abs(fa - fb).max() < 1e-12, name
    np.testing.assert_allclose(float(a.t), float(b.t), rtol=1e-12)
    np.testing.assert_allclose(float(a.dtau), float(b.dtau), rtol=1e-12)


def test_hypersonic3d_pallas_band_validation():
    from fluidsims_tpu.kernels import hypersonic3d_pallas as hp3
    from fluidsims_tpu.solvers import hypersonic3d as h3

    import pytest

    cfg = h3.default_config(16)
    with pytest.raises(ValueError):
        hp3.make_step_pallas(cfg, band=5)   # does not divide nz
    with pytest.raises(ValueError):
        hp3.make_step_pallas(cfg, band=2)   # < HALO


def test_stam2d_advect_pallas_matches_xla_in_band():
    """The banded VMEM advection (kernels/stam2d_pallas.py) must agree
    with the exact XLA gather path on every cell whose backtrace stays
    within the row band, and count the clamped cells exactly."""
    import jax
    import jax.numpy as jnp

    from fluidsims_tpu.kernels import stam2d_pallas as s2p
    from fluidsims_tpu.solvers import stam2d as st

    cfg = st.Stam2DConfig(n=128, advect_band=8)
    rng = np.random.default_rng(3)
    q0 = jnp.asarray(rng.random((128, 128), dtype=np.float32))
    # velocities with a hot spot that exceeds the band near small y
    uu = jnp.asarray((rng.random((128, 128)) * 0.2 - 0.1).astype(np.float32))
    vv = jnp.asarray((rng.random((128, 128)) * 0.3 - 0.15).astype(np.float32))

    adv = s2p.make_advect_pallas(cfg, interpret=True)
    out, ovf = jax.jit(adv)(q0, uu, vv)
    ref = jax.jit(lambda q, u, v: st._advect(cfg, q, u, v))(q0, uu, vv)

    n = cfg.n
    deta = (cfg.eta_max - cfg.eta_min) / n
    idx = np.arange(1, n + 1)
    eta = cfg.eta_min + (idx - 0.5) * deta
    yp = cfg.y0 * np.exp(eta)[:, None]
    tarr = np.clip((eta[:, None] - cfg.dt * np.asarray(vv) / yp
                    - cfg.eta_min) / deta + 0.5, 0.5, n + 0.5)
    disp = np.floor(tarr).astype(int) - 1 - np.arange(n)[:, None]
    in_band = (disp >= -cfg.advect_band) & (disp <= cfg.advect_band)
    assert int(ovf) == int((~in_band).sum())
    assert (~in_band).sum() > 0  # the fixture must exercise clamping
    d = np.abs(np.asarray(out) - np.asarray(ref))
    # borderline backtraces may floor to the other corner under the
    # kernel's fma ordering; the value difference stays at weight-noise
    assert d[in_band].max() < 1e-4


def test_stam2d_engine_equivalence_no_overflow():
    """With dt small enough that no backtrace leaves the band, the pallas
    engine's trajectory matches the exact XLA engine."""
    import jax

    from fluidsims_tpu.solvers import stam2d as st

    kw = dict(n=128, dt=0.02)
    cfg_p = st.Stam2DConfig(engine="pallas", **kw)
    cfg_x = st.Stam2DConfig(engine="xla", **kw)
    s0 = st.init(cfg_x)
    a = jax.jit(lambda s: st.run(cfg_p, s, 10))(s0)
    b = jax.jit(lambda s: st.run(cfg_x, s, 10))(s0)
    assert int(st.advect_overflow_count(cfg_p, a)) == 0
    for f in ("u", "v", "d"):
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=0, atol=1e-4)


def test_stam2d_resolve_engine_validation():
    import pytest

    from fluidsims_tpu.solvers import stam2d as st

    assert st.resolve_engine(st.Stam2DConfig(n=512, engine="xla")) == "xla"
    # n not divisible by 128 -> pallas must refuse
    with pytest.raises(ValueError):
        st.resolve_engine(st.Stam2DConfig(n=48, engine="pallas"))
    # f64 -> pallas must refuse
    with pytest.raises(ValueError):
        st.resolve_engine(st.Stam2DConfig(n=128, engine="pallas",
                                          dtype="float64"))


def test_stam2d_lin_solve_pallas_matches_xla():
    """The whole-solve-in-VMEM Jacobi kernel must reproduce the XLA
    fori_loop sweeps (same neighbor-sum order, same per-sweep math)."""
    import jax
    import jax.numpy as jnp

    from fluidsims_tpu.kernels.stam2d_pallas import make_lin_solve_pallas
    from fluidsims_tpu.solvers import stam2d as st

    cfg = st.Stam2DConfig(n=128)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((128, 128), np.float32))
    b = jnp.asarray(rng.random((128, 128), np.float32))
    solve = make_lin_solve_pallas(128, cfg.jacobi_iters, interpret=True)
    for a, c in ((1.0, 4.0), (0.26, 2.04)):
        got = np.asarray(jax.jit(
            lambda x, b, a=a, c=c: solve(x, b, a, c))(x, b))
        ref = np.asarray(jax.jit(
            lambda x, b, a=a, c=c: st._lin_solve(cfg, x, b, a, c))(x, b))
        # fma-contraction order differs per sweep; 40 sweeps accumulate
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_stam2d_pair_advect_matches_single():
    """The shared-coordinate two-field advection (n_fields=2) must equal
    two single-field calls exactly (same gathers, same weights)."""
    import jax
    import jax.numpy as jnp

    from fluidsims_tpu.kernels import stam2d_pallas as s2p
    from fluidsims_tpu.solvers import stam2d as st

    cfg = st.Stam2DConfig(n=128, advect_band=8)
    rng = np.random.default_rng(11)
    qa = jnp.asarray(rng.random((128, 128), dtype=np.float32))
    qb = jnp.asarray(rng.random((128, 128), dtype=np.float32))
    uu = jnp.asarray((rng.random((128, 128)) * 0.2 - 0.1).astype(np.float32))
    vv = jnp.asarray((rng.random((128, 128)) * 0.2 - 0.1).astype(np.float32))
    adv1 = s2p.make_advect_pallas(cfg, interpret=True)
    adv2 = s2p.make_advect_pallas(cfg, interpret=True, n_fields=2)
    ra, ovf_a = jax.jit(adv1)(qa, uu, vv)
    rb, ovf_b = jax.jit(adv1)(qb, uu, vv)
    pa, pb, ovf_p = jax.jit(adv2)(qa, qb, uu, vv)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(ra))
    np.testing.assert_array_equal(np.asarray(pb), np.asarray(rb))
    assert int(ovf_p) == int(ovf_a) == int(ovf_b)


def test_stam2d_hybrid_engine_exact_by_default():
    """The hybrid engine must (a) run the exact gather on frames where the
    banded kernel would clamp — a violent single step matches the exact
    XLA engine to lin-solve-kernel reassociation noise, while the pure
    banded engine visibly deviates and counts overflow — and (b) keep
    state.ovf at 0 across a violent multi-frame run.  (Tight multi-frame
    equality is not testable: the in-band banded result differs from the
    gather by ~1e-7 reassociation per frame, which the turbulent flow
    amplifies chaotically.)"""
    import jax
    import jax.numpy as jnp

    from fluidsims_tpu.solvers import stam2d as st

    # default dt: the seed swirl overflows a small band heavily
    kw = dict(n=128, advect_band=4)
    cfg_h = st.Stam2DConfig(engine="hybrid", **kw)
    cfg_p = st.Stam2DConfig(engine="pallas", **kw)
    cfg_x = st.Stam2DConfig(engine="xla", **kw)
    s0 = st.init(cfg_x)
    assert bool(st._row_overflow_any(cfg_h, s0.v)), \
        "seed flow must overflow the band for this test to bite"

    a1 = jax.jit(lambda s: st.step(cfg_h, s))(s0)
    b1 = jax.jit(lambda s: st.step(cfg_x, s))(s0)
    p1 = jax.jit(lambda s: st.step(cfg_p, s))(s0)
    assert int(p1.ovf) > 0, "the pure banded engine must clamp here"
    assert int(a1.ovf) == 0
    # hybrid d comes from the exact branch; banded d is visibly clamped
    d_hx = float(np.abs(np.asarray(a1.d) - np.asarray(b1.d)).max())
    d_px = float(np.abs(np.asarray(p1.d) - np.asarray(b1.d)).max())
    assert d_hx < 1e-5, d_hx
    assert d_px > 10 * max(d_hx, 1e-7), (d_px, d_hx)

    # violent multi-frame run: ovf must stay 0 (every clamping frame took
    # the exact branch)
    a5 = jax.jit(lambda s: st.run(cfg_h, s, 5))(s0)
    assert int(a5.ovf) == 0

    # calm flow: the banded branch runs and matches the exact engine
    kw2 = dict(n=128, dt=0.02)
    cfg_h2 = st.Stam2DConfig(engine="hybrid", **kw2)
    cfg_x2 = st.Stam2DConfig(engine="xla", **kw2)
    s2 = st.init(cfg_x2)
    assert not bool(st._row_overflow_any(cfg_h2, s2.v))
    a2 = jax.jit(lambda s: st.run(cfg_h2, s, 5))(s2)
    b2 = jax.jit(lambda s: st.run(cfg_x2, s, 5))(s2)
    assert int(a2.ovf) == 0
    for f in ("u", "v", "d"):
        np.testing.assert_allclose(np.asarray(getattr(a2, f)),
                                   np.asarray(getattr(b2, f)),
                                   rtol=0, atol=1e-4, err_msg=f)


def test_stam2d_hybrid_window_repair_is_exact():
    """The window repair must overwrite EVERY out-of-band cell with the
    exact per-cell gather (bitwise equal to the exact path there), keep
    the rest within blend-association noise of exact, and report
    in_window=False when the out-of-band bounding box exceeds the
    window."""
    import jax
    import jax.numpy as jnp

    from fluidsims_tpu.kernels import stam2d_pallas as s2p
    from fluidsims_tpu.solvers import stam2d as st

    cfg = st.Stam2DConfig(n=128, advect_band=4, repair_window=64,
                          engine="hybrid")
    rng = np.random.default_rng(9)
    q0 = jnp.asarray(rng.random((128, 128), dtype=np.float32))
    uu = jnp.asarray((rng.random((128, 128)) * 0.2 - 0.1).astype(np.float32))
    # a hot stripe that overflows band 4 at a few hundred cells; the
    # background noise is small enough to stay in band even at the
    # smallest metric rows (disp ~ v / (yp * deta))
    vv = np.zeros((128, 128), np.float32)
    vv[60:70, 30:50] = 0.4
    vv += (rng.random((128, 128)) * 0.01).astype(np.float32)
    vv = jnp.asarray(vv)

    banded = s2p.make_advect_pallas(cfg, interpret=True)
    qb, ovf = jax.jit(banded)(q0, uu, vv)
    assert int(ovf) > 0

    repair = jax.jit(
        lambda qb, q0, u, v: st._repair_overflow(cfg, (qb,), (q0,), u, v))
    (fixed,), ok = repair(qb, q0, uu, vv)
    assert bool(ok)

    exact = jax.jit(lambda q, u, v: st._advect(cfg, q, u, v))(q0, uu, vv)

    # overflow mask in the kernel's displacement convention
    i0, j0, s1, t1 = st._backtrace_coords(cfg, uu, vv)
    over = np.abs(np.asarray(j0) - 1 - np.arange(128)[:, None]) > 4
    np.testing.assert_array_equal(np.asarray(fixed)[over],
                                  np.asarray(exact)[over])
    # cells outside the window keep the banded kernel's values; window
    # cells get exact ones (same corners/weights, different blend
    # association -> ~1e-5 noise either way)
    np.testing.assert_allclose(np.asarray(fixed), np.asarray(exact),
                               rtol=0, atol=3e-5)
    # without the repair, the banded result is visibly clamped there
    assert np.abs(np.asarray(qb)[over] - np.asarray(exact)[over]).max() \
        > 1e-3

    # a second cluster far away blows the bounding box past the window:
    # the repair must report in_window=False (the step then lax.conds to
    # the full exact gather)
    vv2 = np.asarray(vv).copy()
    vv2[5:10, 90:110] = 0.4
    qb2, ovf2 = jax.jit(banded)(q0, uu, jnp.asarray(vv2))
    (_,), ok2 = repair(qb2, q0, uu, jnp.asarray(vv2))
    assert not bool(ok2)


def test_stam2d_repair_from_kernel_box_matches():
    """The fused repair path (kernel-emitted out-of-band bounding box +
    window coord recompute, round-5) must reproduce the reference repair
    (_repair_overflow's full-grid recompute) bitwise: same box, same ok,
    same repaired field."""
    import jax
    import jax.numpy as jnp

    from fluidsims_tpu.kernels import stam2d_pallas as s2p
    from fluidsims_tpu.solvers import stam2d as st

    cfg = st.Stam2DConfig(n=128, advect_band=4, repair_window=64,
                          engine="hybrid")
    rng = np.random.default_rng(9)
    q0 = jnp.asarray(rng.random((128, 128), dtype=np.float32))
    uu = jnp.asarray((rng.random((128, 128)) * 0.2 - 0.1).astype(np.float32))
    vv = np.zeros((128, 128), np.float32)
    vv[60:70, 30:50] = 0.4
    vv += (rng.random((128, 128)) * 0.01).astype(np.float32)
    vv = jnp.asarray(vv)

    adv = s2p.make_advect_pallas(cfg, interpret=True, with_box=True)
    qk, ovf, box = jax.jit(adv)(q0, uu, vv)
    assert int(ovf) > 0

    # the kernel's box must equal the host-side overflow bounding box
    i0, j0, s1, t1 = st._backtrace_coords(cfg, uu, vv)
    over = np.abs(np.asarray(j0) - 1 - np.arange(128)[:, None]) > 4
    rows, cols = np.nonzero(over)
    np.testing.assert_array_equal(
        np.asarray(box), [rows.min(), rows.max(), cols.min(), cols.max()])

    new = jax.jit(lambda qk, q0, u, v, b: st._repair_overflow_from_box(
        cfg, (qk,), (q0,), u, v, b))
    old = jax.jit(lambda qk, q0, u, v: st._repair_overflow(
        cfg, (qk,), (q0,), u, v))
    (r_new,), ok_new = new(qk, q0, uu, vv, box)
    (r_old,), ok_old = old(qk, q0, uu, vv)
    assert bool(ok_new) == bool(ok_old) is True
    np.testing.assert_array_equal(np.asarray(r_new), np.asarray(r_old))

    # empty box (calm flow): ok=True and the window rewrite is benign
    calm = jnp.zeros((128, 128), jnp.float32)
    qk2, ovf2, box2 = jax.jit(adv)(q0, calm, calm)
    assert int(ovf2) == 0 and int(box2[0]) == 128 and int(box2[1]) == -1
    (r2,), ok2 = new(qk2, q0, calm, calm, box2)
    assert bool(ok2)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(qk2),
                               rtol=0, atol=3e-5)

    # two distant clusters: box exceeds the window, ok=False both paths
    vv2 = np.asarray(vv).copy()
    vv2[5:10, 90:110] = 0.4
    qk3, _, box3 = jax.jit(adv)(q0, uu, jnp.asarray(vv2))
    (_,), ok3 = new(qk3, q0, uu, jnp.asarray(vv2), box3)
    assert not bool(ok3)
