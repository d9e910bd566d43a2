"""Prime/divisor graph layout tests: edge generation parity vs a direct
sieve, repulsion accuracy vs brute force, and layout dynamics."""

import jax
import jax.numpy as jnp
import numpy as np

from fluidsims_tpu.solvers import nbody_graph as ng


def test_edge_generation_matches_sieve():
    edges = ng.generate_edges(20)
    es = set(map(tuple, edges.tolist()))
    # primes <= 20: 2,3,5,7,11,13,17,19 -> edges root(0) -> n-1
    for p in (2, 3, 5, 7, 11, 13, 17, 19):
        assert (0, p - 1) in es
    assert (0, 3) not in es  # 4 is not prime
    # divisor edges: from -> multiples
    assert (1, 3) in es   # 2 -> 4
    assert (1, 5) in es   # 2 -> 6
    assert (2, 5) in es   # 3 -> 6
    assert (4, 9) in es   # 5 -> 10
    # count: primes + sum(max/n - 1)
    expected = 8 + sum(20 // f - 1 for f in range(2, 21))
    assert len(edges) == expected


def brute_repulsion(cfg, pos):
    pos = np.asarray(pos, np.float64)
    n = pos.shape[0]
    out = np.zeros_like(pos)
    for i in range(n):
        d = pos[i] - pos
        d2 = (d * d).sum(-1) + cfg.softening
        d2[i] = np.inf
        f = cfg.repulsion / d2
        out[i] = ((f / np.sqrt(d2))[:, None] * d).sum(0)
    return out


def test_grid_repulsion_approximates_brute_force():
    cfg = ng.GraphLayoutConfig(max_number=256, grid_res=16)
    s = ng.init(cfg)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(scale=100.0, size=(cfg.n_bodies, 2))
                      .astype(np.float32))
    approx = np.asarray(ng._repulsion_grid(cfg, pos))
    exact = brute_repulsion(cfg, pos)
    # relative error of the monopole+near-field approximation
    num = np.linalg.norm(approx - exact, axis=-1)
    den = np.linalg.norm(exact, axis=-1) + 1e-9
    assert np.median(num / den) < 0.15


def test_layout_expands_and_settles():
    cfg = ng.GraphLayoutConfig(max_number=128, grid_res=8)
    s = ng.init(cfg)
    out = jax.jit(lambda st: ng.run(cfg, st, 100))(s)
    pos = np.asarray(out.pos)
    assert np.isfinite(pos).all()
    # root stays pinned
    np.testing.assert_allclose(pos[0], 0.0, atol=1e-6)
    # speed clamp respected
    v = np.asarray(out.vel)
    assert (np.linalg.norm(v, axis=-1) <= cfg.max_speed + 1e-3).all()


def test_layout_3d_runs():
    cfg = ng.GraphLayoutConfig(max_number=64, dims=3, grid_res=8)
    s = ng.init(cfg)
    out = jax.jit(lambda st: ng.run(cfg, st, 30))(s)
    pos = np.asarray(out.pos)
    assert pos.shape == (64, 3)
    assert np.isfinite(pos).all()


def test_exact_repulsion_matches_allpairs_oracle():
    """The default engine's chunked all-pairs force equals a float64
    double-loop oracle of the reference force law
    (apply_repulsion_from_tree leaf case, number_fluid2d.c:399-409)."""
    cfg = ng.GraphLayoutConfig(max_number=256, chunk=64)
    s = ng.init(cfg)
    pos = np.asarray(s.pos, np.float64)
    n = pos.shape[0]
    ref = np.zeros_like(pos)
    for i in range(n):
        d = pos[i] - pos
        d2 = (d * d).sum(-1) + cfg.softening
        w = cfg.repulsion / (d2 * np.sqrt(d2))
        w[i] = 0.0
        ref[i] = (w[:, None] * d).sum(0)
    got = np.asarray(ng._repulsion_exact(cfg, s.pos))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-4)


def test_exact_engine_beats_grid_engine():
    """Force error of the exact engine is ~0; the grid engine's is not —
    the fidelity ordering the engine default relies on."""
    from dataclasses import replace

    cfg = ng.GraphLayoutConfig(max_number=2048, chunk=256)
    s = ng.init(cfg)
    # relax a few steps so bodies leave the degenerate init circle
    s = jax.jit(lambda st: ng.run(cfg, st, 5))(s)
    exact = np.asarray(ng._repulsion_exact(cfg, s.pos), np.float64)
    grid = np.asarray(ng._repulsion_grid(replace(cfg, engine="grid"),
                                         s.pos), np.float64)
    scale = np.abs(exact).max()
    err_grid = np.abs(grid - exact).max() / scale
    assert err_grid > 1e-4  # the approximation is visibly approximate


def test_render_points_schemes():
    from fluidsims_tpu.render.points import SCHEMES, render_points

    cfg = ng.GraphLayoutConfig(max_number=512)
    s = ng.init(cfg)
    pos = np.asarray(s.pos)
    for scheme in SCHEMES:
        frame = render_points(pos, W=40, H=20, scheme=scheme)
        assert frame.count("\n") == 19
        assert "▀" in frame or "▄" in frame
    mono = render_points(pos, W=40, H=20, color=False)
    assert "\x1b" not in mono
    assert any(c in mono for c in "█▀▄")


def test_sharded_nbody_matches_single_chip():
    """Body-sharded exact all-pairs run on the 8-virtual-device mesh
    matches the single-chip trajectory (spring psum reassociates sums ->
    f32 tolerance)."""
    from fluidsims_tpu.parallel import nbody_sharded as nsh
    from fluidsims_tpu.parallel.mesh import make_mesh_1d

    cfg = ng.GraphLayoutConfig(max_number=2048, chunk=256)
    mesh = make_mesh_1d(8, axis="b")
    s0 = ng.init(cfg)
    out = nsh.make_sharded_run(cfg, mesh, 5)(nsh.shard_state(s0, mesh))
    ref = jax.jit(lambda s: ng.run(cfg, s, 5))(s0)
    scale = float(np.abs(np.asarray(ref.pos)).max())
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=2e-5 * scale)


def test_render_points_zoom_lod():
    """Zoom-LOD point sizing (number_fluid2d.c:738-760): a zoomed-in
    camera splats points as 2x2 blocks then discs, so an isolated point
    covers more cells at higher zoom; auto-fit stays single-subpixel."""
    from fluidsims_tpu.render.points import (Camera2D, _splat_offsets,
                                             render_points)

    assert _splat_offsets(1.0) == ((0, 0),)
    assert len(_splat_offsets(2.0)) == 4
    assert len(_splat_offsets(20.0)) > 4   # disc of radius 7

    pos = np.asarray([[0.0, 0.0], [100.0, 0.0]])

    def lit(zoom):
        f = render_points(pos, W=40, H=20, color=False,
                          camera=Camera2D(tx=0.0, ty=0.0, zoom=zoom))
        return sum(ch != " " for ch in f if ch not in "\n")

    assert lit(1.0) <= 2          # two single-subpixel points
    assert lit(6.0) > lit(1.0)    # disc splat covers more cells
