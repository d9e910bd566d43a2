#!/usr/bin/env python
"""Hardware cost of the sharded runners: 1-device mesh vs unsharded twin.

Every sharded family is correctness-gated at 2/4/8 virtual devices
(tests/test_sharded*.py), but a shard_map body pays real machinery even
with zero ICI traffic: the ppermute halo concat/crop, the pmax/psum
reductions, the per-step ghost fills, and whatever XLA loses by compiling
the body per-shard.  Running each sharded runner on a ONE-device mesh on
the real chip and dividing by its unsharded twin measures exactly that
machinery — the floor on multi-chip parallel efficiency (an overhead of
f means >= f must be won back from the slab-size reduction before a
second chip pays for itself).

Usage:
  python tools/bench_sharded.py              # orchestrate all families
  python tools/bench_sharded.py --one NAME   # one family, JSON on stdout

The orchestrator runs each family in a subprocess under a timeout
(remote Mosaic compiles through the axon tunnel can stall for minutes or
hang), then writes SHARDED_BENCH.json.  Measurements interleave the
sharded and unsharded timing windows — the chip is shared, so only
same-window A/B ratios are trustworthy — and report the fastest of
`windows` rounds of each.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def _sync_tree(o):
    import jax
    import numpy as np

    x = jax.tree_util.tree_leaves(o)[0]
    return np.asarray(x.ravel()[:1].block_until_ready())


def _rate_pair(run_u, run_s, su, ss, chunk, reps=2, windows=3):
    """Interleaved A/B timing: (unsharded steps/s, sharded steps/s)."""
    ou = run_u(su)
    _sync_tree(ou)
    os_ = run_s(ss)
    _sync_tree(os_)
    bu = bs = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            ou = run_u(ou)
        _sync_tree(ou)
        bu = min(bu, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(reps):
            os_ = run_s(os_)
        _sync_tree(os_)
        bs = min(bs, time.perf_counter() - t0)
    n = chunk * reps
    return n / bu, n / bs


def _scan_jit(step_fn, chunk):
    import jax

    from fluidsims_tpu.core.stepper import scan_steps

    return jax.jit(lambda s: scan_steps(step_fn, s, chunk))


# ---------------------------------------------------------------- families


def fam_hyp2d_xslab_xla():
    from fluidsims_tpu.parallel import hypersonic2d_sharded as sh
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.solvers import hypersonic2d as h2

    cfg = h2.default_config(nx=2048, ny=2048)
    state = h2.init(cfg)
    mesh = make_mesh_1d(1)
    chunk = 50
    run_u = _scan_jit(lambda s: h2.step(cfg, s), chunk)
    run_s = sh.make_sharded_run(cfg, mesh, n_steps=chunk, impl="xla")
    return run_u, run_s, state, sh.shard_state(state, mesh), chunk, 2


def fam_hyp2d_xslab_pallas():
    from fluidsims_tpu.kernels import hypersonic2d_pallas as hp
    from fluidsims_tpu.parallel import hypersonic2d_sharded as sh
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.solvers import hypersonic2d as h2

    cfg = h2.default_config(nx=2048, ny=2048)
    state = h2.init(cfg)
    mesh = make_mesh_1d(1)
    chunk = 50
    run_u = _scan_jit(hp.make_step_pallas(cfg, band=16), chunk)
    run_s = sh.make_sharded_run(cfg, mesh, n_steps=chunk, impl="pallas")
    return run_u, run_s, state, sh.shard_state(state, mesh), chunk, 2


def fam_hyp2d_mesh2d():
    from fluidsims_tpu.parallel import hypersonic2d_sharded2d as sh2d
    from fluidsims_tpu.solvers import hypersonic2d as h2

    cfg = h2.default_config(nx=2048, ny=2048)
    state = h2.init(cfg)
    mesh = sh2d.make_mesh_2d(1, 1)
    chunk = 50
    run_u = _scan_jit(lambda s: h2.step(cfg, s), chunk)
    run_s = sh2d.make_sharded_run(cfg, mesh, n_steps=chunk)
    return run_u, run_s, state, sh2d.shard_state(state, mesh), chunk, 2


def fam_hyp3d_zslab_xla():
    from fluidsims_tpu.parallel import hypersonic3d_sharded as sh3
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.solvers import hypersonic3d as h3

    cfg = h3.default_config(64)
    state = h3.init(cfg)
    mesh = make_mesh_1d(1, axis="z")
    chunk = 50
    run_u = _scan_jit(lambda s: h3.step(cfg, s), chunk)
    run_s = sh3.make_sharded_run(cfg, mesh, n_steps=chunk, impl="xla")
    return run_u, run_s, state, sh3.shard_state(state, mesh), chunk, 2


def fam_hyp3d_zslab_pallas():
    from fluidsims_tpu.kernels import hypersonic3d_pallas as hp3
    from fluidsims_tpu.parallel import hypersonic3d_sharded as sh3
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.solvers import hypersonic3d as h3

    cfg = h3.default_config(64)
    state = h3.init(cfg)
    mesh = make_mesh_1d(1, axis="z")
    chunk = 100
    run_u = _scan_jit(hp3.make_step_pallas(cfg), chunk)
    run_s = sh3.make_sharded_run(cfg, mesh, n_steps=chunk, impl="pallas")
    return run_u, run_s, state, sh3.shard_state(state, mesh), chunk, 2


def fam_stam2d_xslab():
    from fluidsims_tpu.parallel import stam2d_sharded as s2sh
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.solvers import stam2d as s2

    cfg = s2.Stam2DConfig(n=512, engine="xla")
    state = s2.init(cfg)
    mesh = make_mesh_1d(1)
    chunk = 20
    run_u = _scan_jit(lambda s: s2.step(cfg, s), chunk)
    run_s = s2sh.make_sharded_run(cfg, mesh, n_steps=chunk, halo_k=8)
    return run_u, run_s, state, s2sh.shard_state(state, mesh), chunk, 2


def fam_stam3d_zslab():
    from fluidsims_tpu.parallel import stam3d_sharded as s3sh
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.solvers import stam3d as s3

    cfg = s3.Stam3DConfig(n=192, advect_k=2, engine="xla")
    state = s3.init(cfg)
    mesh = make_mesh_1d(1)
    chunk = 4
    run_u = _scan_jit(lambda s: s3.step(cfg, s), chunk)
    run_s = s3sh.make_sharded_run(cfg, mesh, n_steps=chunk, halo_k=4)
    ss = s3sh.shard_state(state, mesh)
    return run_u, run_s, state, ss, chunk, 1


def fam_burgers_xslab():
    from fluidsims_tpu.parallel.tau_sharded import (
        make_sharded_burgers_run, shard_burgers)
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.solvers import burgers as bg

    cfg = bg.BurgersConfig(nx=512, ny=512)
    state = bg.init(cfg)
    mesh = make_mesh_1d(1)
    chunk = 1000
    run_u = _scan_jit(lambda s: bg.step(cfg, s), chunk)
    run_s = make_sharded_burgers_run(cfg, mesh, chunk)
    return run_u, run_s, state, shard_burgers(state, mesh), chunk, 2


def fam_sw_xslab():
    from fluidsims_tpu.parallel.tau_sharded import (
        make_sharded_shallow_water_run, shard_shallow_water)
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.solvers import shallow_water as sw

    cfg = sw.ShallowWaterConfig(nx=512, ny=512)
    state = sw.init(cfg)
    mesh = make_mesh_1d(1)
    chunk = 1000
    run_u = _scan_jit(lambda s: sw.step(cfg, s), chunk)
    run_s = make_sharded_shallow_water_run(cfg, mesh, chunk)
    return run_u, run_s, state, shard_shallow_water(state, mesh), chunk, 2


def fam_mhd_xslab():
    from fluidsims_tpu.parallel import mhd_sharded as msh
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.solvers import mhd

    cfg = mhd.MHDConfig()
    state = mhd.init(cfg)
    mesh = make_mesh_1d(1)
    chunk = 1000
    run_u = _scan_jit(lambda s: mhd.step(cfg, s), chunk)
    run_s = msh.make_sharded_run(cfg, mesh, chunk)
    return run_u, run_s, state, msh.shard_state(state, mesh), chunk, 2


def fam_gray_scott_kdeep():
    # communication-avoiding composition: halo=K, XLA K-step local body
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.parallel.periodic_sharded import (
        make_sharded_periodic_run, shard_arrays)
    from fluidsims_tpu.solvers import gray_scott as gs

    K, n_sup = 8, 50
    cfg = gs.GrayScottConfig(nx=2048, ny=2048)
    state = gs.init(cfg)
    mesh = make_mesh_1d(1)
    cfg_ext = gs.GrayScottConfig(nx=cfg.nx + 2 * K, ny=cfg.ny, dx=cfg.dx,
                                 dt=cfg.dt, Du=cfg.Du, Dv=cfg.Dv,
                                 feed=cfg.feed, kill=cfg.kill)

    def local(ext):
        st = gs.GrayScottState(u=ext[0], v=ext[1])
        for _ in range(K):
            st = gs.step(cfg_ext, st)
        return (st.u, st.v)

    chunk = K * n_sup
    run_u = _scan_jit(lambda s: gs.step(cfg, s), chunk)
    run_s = make_sharded_periodic_run(local, mesh, halo=K, n_steps=n_sup)
    return (run_u, run_s, state, shard_arrays((state.u, state.v), mesh),
            chunk, 1)


def fam_sph_spatial():
    from fluidsims_tpu.parallel import sph_spatial as sspat
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.solvers import sph

    cfg = sph.SPHConfig(n=1 << 16, rain=False)
    state = sph.init(cfg)
    mesh = make_mesh_1d(1, axis="c")
    chunk = 10
    run_u = _scan_jit(lambda s: sph.step(cfg, s), chunk)
    run_s = sspat.make_sharded_run(cfg, mesh, n_steps=chunk)
    ss = sspat.shard_state(state, cfg, mesh)
    return run_u, run_s, state, ss, chunk, 2


FAMILIES = {
    "hyp2d_xslab_xla": fam_hyp2d_xslab_xla,
    "hyp2d_xslab_pallas": fam_hyp2d_xslab_pallas,
    "hyp2d_mesh2d": fam_hyp2d_mesh2d,
    "hyp3d_zslab_xla": fam_hyp3d_zslab_xla,
    "hyp3d_zslab_pallas": fam_hyp3d_zslab_pallas,
    "stam2d_xslab": fam_stam2d_xslab,
    "stam3d_zslab": fam_stam3d_zslab,
    "burgers_xslab": fam_burgers_xslab,
    "sw_xslab": fam_sw_xslab,
    "mhd_xslab": fam_mhd_xslab,
    "gray_scott_kdeep": fam_gray_scott_kdeep,
    "sph_spatial": fam_sph_spatial,
}


def run_one(name: str) -> dict:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    from fluidsims_tpu.core.platform import honor_env_platforms

    honor_env_platforms(jax)
    run_u, run_s, su, ss, chunk, reps = FAMILIES[name]()
    r_u, r_s = _rate_pair(run_u, run_s, su, ss, chunk, reps=reps)
    return {
        "family": name,
        "unsharded_steps_per_sec": round(r_u, 3),
        "sharded_1dev_steps_per_sec": round(r_s, 3),
        "overhead_pct": round((r_u / r_s - 1.0) * 100.0, 1),
    }


def orchestrate(names, timeout):
    records = []
    for name in names:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", name]
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout)
        except subprocess.TimeoutExpired:
            records.append({"family": name, "error": "timeout"})
            print(json.dumps(records[-1]), flush=True)
            continue
        if p.returncode != 0:
            tail = (p.stderr or "").strip().splitlines()
            records.append({"family": name,
                            "error": (tail[-1][:200] if tail
                                      else f"exit {p.returncode}")})
        else:
            records.append(json.loads(p.stdout.strip().splitlines()[-1]))
        print(json.dumps(records[-1]), flush=True)
    return records


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--one", help="run a single family in-process")
    ap.add_argument("--families", help="comma-separated subset")
    ap.add_argument("--timeout", type=float, default=1200.0)
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "SHARDED_BENCH.json"))
    args = ap.parse_args()

    if args.one:
        print(json.dumps(run_one(args.one)), flush=True)
        return

    names = (args.families.split(",") if args.families
             else list(FAMILIES))
    records = orchestrate(names, args.timeout)
    with open(args.out, "w") as f:
        json.dump(records, f, indent=1)
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
