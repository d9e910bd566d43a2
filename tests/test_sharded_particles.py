"""Multi-chip particle solver: FLIP/APIC data-parallel particles +
replicated grid (parallel/flip_sharded.py), verified on the 8-virtual-
device CPU mesh against the single-chip trajectory."""

import jax
import numpy as np

from fluidsims_tpu.parallel import flip_sharded as fsh
from fluidsims_tpu.parallel.mesh import make_mesh_1d
from fluidsims_tpu.solvers import flip_apic as fa


def _cfg(**kw):
    kw.setdefault("particles", 4096)
    kw.setdefault("grid", 32)
    kw.setdefault("jacobi", 8)
    return fa.FlipApicConfig(**kw)


def test_interleave_perm():
    perm = fsh.interleave_perm(12, 4)
    # block d owns original indices d::4
    assert list(perm[:3]) == [0, 4, 8]
    assert list(perm[3:6]) == [1, 5, 9]
    assert sorted(perm) == list(range(12))


def test_sharded_flip_matches_single_chip():
    """8-device particle-sharded run tracks the single-chip trajectory to
    f32 summation-order tolerance (per-device P2G partials + psum
    reassociate the grid sums)."""
    n_dev = 8
    cfg = _cfg()
    mesh = make_mesh_1d(n_dev, axis="p")
    s0 = fa.init(cfg)

    sharded = fsh.shard_state(s0, mesh)
    run = fsh.make_sharded_run(cfg, mesh, n_steps=5)
    out = run(sharded)

    ref = jax.jit(lambda s: fa.run(cfg, s, 5))(s0)

    perm = fsh.interleave_perm(cfg.particles, n_dev)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos)[perm], atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(out.vel), np.asarray(ref.vel)[perm], atol=3e-4)
    # density rasters agree except possibly for particles within FP noise
    # of a cell boundary
    dd = np.abs(np.asarray(out.density) - np.asarray(ref.density))
    assert dd.sum() <= 4
    assert int(np.asarray(out.density).sum()) == cfg.particles


def test_sharded_flip_scatter_engine():
    """The exact scatter engine composes with the particle sharding too."""
    n_dev = 4
    cfg = _cfg(particles=1024, grid=24, engine="scatter")
    mesh = make_mesh_1d(n_dev, axis="p")
    out = fsh.make_sharded_run(cfg, mesh, 3)(fsh.shard_state(fa.init(cfg),
                                                             mesh))
    ref = jax.jit(lambda s: fa.run(cfg, s, 3))(fa.init(cfg))
    perm = fsh.interleave_perm(cfg.particles, n_dev)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos)[perm], atol=3e-5)


def test_sharded_flip_capacity_scales_down():
    """Interleaved shards thin every cell, so the per-device cell-dense
    capacity (and with it per-device compute) drops with the device
    count."""
    from dataclasses import replace

    cfg = _cfg(particles=1 << 14, grid=64)
    local = replace(cfg, particles=cfg.particles // 8)
    assert local.capacity < cfg.capacity


def test_sharded_mpm_matches_single_chip():
    """MLS-MPM with the same particle-sharded + psum'd-grid design."""
    from fluidsims_tpu.parallel import mpm_sharded as msh
    from fluidsims_tpu.solvers import mpm

    n_dev = 8
    cfg = mpm.MPMConfig(n=4096, gx=48, gy=48)
    mesh = make_mesh_1d(n_dev, axis="p")
    out = msh.make_sharded_run(cfg, mesh, 5)(
        msh.shard_state(mpm.init(cfg), mesh))
    ref = jax.jit(lambda s: mpm.run(cfg, s, 5))(mpm.init(cfg))
    perm = fsh.interleave_perm(cfg.n, n_dev)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos)[perm], atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(out.Jp), np.asarray(ref.Jp)[perm], rtol=2e-4)


def test_sharded_sph_matches_single_chip():
    """Cell-block-sharded SPH: every output block is computed by exactly
    one program in both the single-chip and 8-device runs (disjoint-band
    psum = all-gather), so trajectories agree to within compiler FMA
    contraction of the surrounding glue — observed as at most 1 ulp on a
    rain-spawn position when the two graphs fuse it differently."""
    from fluidsims_tpu.kernels import sph_pallas as sp
    from fluidsims_tpu.parallel import sph_sharded as ssh
    from fluidsims_tpu.solvers import sph

    # n=16384 -> 32x32 cells = 8 blocks of 128 -> one block per device
    cfg = sph.SPHConfig(n=16384, rain=True, dtau=1e-2)
    mesh = make_mesh_1d(8, axis="c")
    s0 = sph.init(cfg)

    out = ssh.make_sharded_run(cfg, mesh, 3, interpret=True)(
        ssh.shard_state(s0, mesh))

    step_p = sp.make_step_pallas(cfg, interpret=True)
    ref = s0
    for _ in range(3):
        ref = step_p(ref)

    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.tau), np.asarray(ref.tau))
    # the pair physics itself is identical: velocities match exactly
    assert (np.asarray(out.vel) == np.asarray(ref.vel)).mean() > 0.9999
