"""Native threaded Barnes-Hut engine (native/nbody_bh.c) cross-checks.

theta=0 makes the MAC never accept a multipole, so the tree traversal
degenerates to the exact O(n^2) pairwise sum — compared here against an
independent dense-NumPy implementation of the same force law.  The
worker pool must be deterministic at fixed thread count (per-worker
accumulators merged in fixed order); different thread counts reassociate
the FP sums, so cross-count agreement is to roundoff, not bitwise."""

import numpy as np
import pytest

from fluidsims_tpu.solvers import nbody_graph as ng
from fluidsims_tpu.solvers import nbody_native as nn

pytestmark = pytest.mark.skipif(
    not nn.native_available(), reason="no C compiler / pthread library")


def _cfg(n=200, dims=2):
    return ng.GraphLayoutConfig(max_number=n, dims=dims, dtype="float64")


def _rand_state(cfg, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(cfg.n_bodies, cfg.dims)) * 50.0
    pos[0] = 0.0
    return pos, np.zeros_like(pos)


def _numpy_step(cfg, edges, pos, vel):
    f = np.zeros_like(pos)
    src, dst = edges[:, 0], edges[:, 1]
    d = pos[dst] - pos[src]
    d2 = (d * d).sum(-1) + cfg.softening
    inv = 1.0 / np.sqrt(d2)
    fm = cfg.spring_k * (d2 * inv - cfg.link_length) * inv
    np.add.at(f, src[src != 0], (fm[:, None] * d)[src != 0])
    np.add.at(f, dst[dst != 0], (-fm[:, None] * d)[dst != 0])
    dd = pos[:, None, :] - pos[None, :, :]
    dd2 = (dd * dd).sum(-1) + cfg.softening
    iv = 1.0 / np.sqrt(dd2)
    fm2 = cfg.repulsion / dd2 * iv
    np.fill_diagonal(fm2, 0.0)
    f += (fm2[..., None] * dd).sum(1)
    v = (vel + f * cfg.dt) * cfg.damping
    sp = np.sqrt((v * v).sum(-1, keepdims=True))
    v = np.where(sp > cfg.max_speed,
                 v * cfg.max_speed / np.maximum(sp, 1e-30), v)
    v[0] = 0.0
    p = pos + v * cfg.dt
    p[0] = 0.0
    return p, v


@pytest.mark.parametrize("dims", [2, 3])
def test_theta0_matches_exact_pairwise(dims):
    cfg = _cfg(180, dims)
    edges = ng.generate_edges(cfg.max_number)
    pos, vel = _rand_state(cfg)
    with nn.BHEngine(cfg, edges, n_threads=2, theta=0.0) as eng:
        eng.set_state(pos, vel)
        eng.run(3)
        p, v = eng.get_state()
    pr, vr = pos.copy(), vel.copy()
    for _ in range(3):
        pr, vr = _numpy_step(cfg, edges, pr, vr)
    assert np.abs(p - pr).max() < 1e-10
    assert np.abs(v - vr).max() < 1e-10


def test_thread_count_determinism_and_agreement():
    cfg = _cfg(200)
    edges = ng.generate_edges(cfg.max_number)
    pos, vel = _rand_state(cfg)

    def run(nt):
        with nn.BHEngine(cfg, edges, n_threads=nt, theta=0.0) as eng:
            eng.set_state(pos, vel)
            eng.run(5)
            return eng.get_state()

    pa, va = run(4)
    pb, vb = run(4)
    np.testing.assert_array_equal(pa, pb)   # fixed count -> bitwise
    np.testing.assert_array_equal(va, vb)
    p1, _ = run(1)
    assert np.abs(pa - p1).max() < 1e-9     # across counts -> roundoff


def test_theta_bh_approximates_exact():
    cfg = _cfg(300)
    edges = ng.generate_edges(cfg.max_number)
    pos, vel = _rand_state(cfg, seed=3)

    def run(theta):
        with nn.BHEngine(cfg, edges, n_threads=2, theta=theta) as eng:
            eng.set_state(pos, vel)
            eng.run(1)
            return eng.get_state()[0]

    exact = run(0.0)
    approx = run(0.75)
    # one step: displacement error of the MAC approximation stays small
    disp = np.abs(exact - pos).max()
    err = np.abs(approx - exact).max()
    assert err < 0.05 * max(disp, 1.0)


def test_run_native_drives_graph_layout_state():
    cfg = ng.GraphLayoutConfig(max_number=150, dims=3, dtype="float32")
    s = ng.init(cfg)
    out = nn.run_native(cfg, s, 10, n_threads=2, theta=0.75)
    assert int(out.steps) == 10
    p = np.asarray(out.pos)
    assert np.isfinite(p).all()
    assert np.abs(p[0]).max() == 0.0        # root pinned
    # layout contracted from the huge init circle toward link lengths
    assert np.sqrt((p[1:] ** 2).sum(-1)).mean() < 20.0 * np.sqrt(150)
