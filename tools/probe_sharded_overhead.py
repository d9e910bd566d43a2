#!/usr/bin/env python
"""Decompose the 1-device-mesh overhead of the worst sharded runners.

SHARDED_BENCH.json showed three runners paying far more than halo
arithmetic can explain on a 1-device mesh (gray_scott 243%, stam2d 55%,
shallow water 41%).  This probe times each family in peel-off variants so
the overhead lands on a mechanism instead of a number:

  base   unsharded jit(scan(step))                       — the twin
  ext    unsharded scan on the halo-EXTENDED width       — lane-alignment
         (gray_scott only: 2048+2K=2064 is not a multiple of the 128-lane
         tile, so every op on the extended slab runs padded/misaligned)
  noop   jit(shard_map(scan(step))) with NO exchange/crop — pure shard_map
         structure cost (manual-sharding partitioning, donation, layout)
  full   the shipped sharded runner                       — adds ppermute
         exchange + crop (+ K-deep restructure where applicable)

Usage:
  python tools/probe_sharded_overhead.py                  # all
  python tools/probe_sharded_overhead.py --one gs:ext     # one variant
Writes PROBE_SHARDED.json (orchestrated mode).
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


def _sync(o):
    import jax
    import numpy as np

    x = jax.tree_util.tree_leaves(o)[0]
    return np.asarray(x.ravel()[:1].block_until_ready())


def _rate(run, state, chunk, reps=2, windows=3):
    out = run(state)
    _sync(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(out)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return chunk * reps / best


def _scan_jit(step_fn, chunk):
    import jax

    from fluidsims_tpu.core.stepper import scan_steps

    return jax.jit(lambda s: scan_steps(step_fn, s, chunk))


# ------------------------------------------------------------ gray_scott


def gs_variants(variant):
    import jax
    from jax.sharding import PartitionSpec as P

    from fluidsims_tpu.core.stepper import scan_steps
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.parallel.periodic_sharded import (
        make_sharded_periodic_run, shard_arrays)
    from fluidsims_tpu.solvers import gray_scott as gs

    K, n_sup = 8, 50
    chunk = K * n_sup
    cfg = gs.GrayScottConfig(nx=2048, ny=2048)
    state = gs.init(cfg)

    if variant == "base":
        return _scan_jit(lambda s: gs.step(cfg, s), chunk), state, chunk

    if variant == "ext":
        # same per-step math on the extended (misaligned) width
        cfg_e = gs.GrayScottConfig(nx=cfg.nx + 2 * K, ny=cfg.ny)
        st_e = gs.GrayScottState(
            u=jax.numpy.pad(state.u, ((0, 0), (K, K)), mode="wrap"),
            v=jax.numpy.pad(state.v, ((0, 0), (K, K)), mode="wrap"))
        return _scan_jit(lambda s: gs.step(cfg_e, s), chunk), st_e, chunk

    mesh = make_mesh_1d(1)

    if variant == "noop":
        spec = P(None, "x")

        def body(u, v):
            st = scan_steps(lambda s: gs.step(cfg, s),
                            gs.GrayScottState(u=u, v=v), chunk)
            return st.u, st.v

        sharded = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(spec, spec),
            out_specs=(spec, spec), check_vma=False))
        arrays = shard_arrays((state.u, state.v), mesh)
        return lambda t: sharded(*t), arrays, chunk

    if variant == "full":
        cfg_ext = gs.GrayScottConfig(nx=cfg.nx + 2 * K, ny=cfg.ny,
                                     dx=cfg.dx, dt=cfg.dt, Du=cfg.Du,
                                     Dv=cfg.Dv, feed=cfg.feed,
                                     kill=cfg.kill)

        def local(ext):
            st = gs.GrayScottState(u=ext[0], v=ext[1])
            for _ in range(K):
                st = gs.step(cfg_ext, st)
            return (st.u, st.v)

        run = make_sharded_periodic_run(local, mesh, halo=K,
                                        n_steps=n_sup)
        return run, shard_arrays((state.u, state.v), mesh), chunk

    raise ValueError(variant)


# -------------------------------------------------------- shallow water


def sw_variants(variant):
    import jax
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from fluidsims_tpu.core.stepper import scan_steps
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.parallel.tau_sharded import (
        make_sharded_shallow_water_run, shard_shallow_water)
    from fluidsims_tpu.solvers import shallow_water as sw

    chunk = 1000
    cfg = sw.ShallowWaterConfig(nx=512, ny=512)
    state = sw.init(cfg)

    if variant == "base":
        return _scan_jit(lambda s: sw.step(cfg, s), chunk), state, chunk

    mesh = make_mesh_1d(1)

    if variant == "noop":
        n_f = 3
        fspec = P(None, "x")
        specs = tuple([fspec] * n_f
                      + [P()] * (len(sw.ShallowWaterState._fields) - n_f))

        def body(*parts):
            out = scan_steps(
                lambda s: sw.step(cfg, s,
                                  wavespeed_reduce=lambda v:
                                  lax.pmax(v, "x")),
                sw.ShallowWaterState(*parts), chunk)
            return tuple(out)

        sharded = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=specs, out_specs=specs,
            check_vma=False))
        st = shard_shallow_water(state, mesh)
        return (lambda s: sw.ShallowWaterState(*sharded(*s))), st, chunk

    if variant == "full":
        run = make_sharded_shallow_water_run(cfg, mesh, chunk)
        return run, shard_shallow_water(state, mesh), chunk

    raise ValueError(variant)


# -------------------------------------------------------------- stam2d


def stam2d_variants(variant):
    import jax
    from jax.sharding import PartitionSpec as P

    from fluidsims_tpu.core.stepper import scan_steps
    from fluidsims_tpu.parallel.mesh import make_mesh_1d
    from fluidsims_tpu.parallel import stam2d_sharded as s2sh
    from fluidsims_tpu.solvers import stam2d as s2

    chunk = 20
    cfg = s2.Stam2DConfig(n=512, engine="xla")
    state = s2.init(cfg)

    if variant == "base":
        return _scan_jit(lambda s: s2.step(cfg, s), chunk), state, chunk

    mesh = make_mesh_1d(1)

    if variant == "noop":
        n_f = 6
        fspec = P(None, "x")
        specs = tuple([fspec] * n_f
                      + [P()] * (len(s2.Stam2DState._fields) - n_f))

        def body(*parts):
            out = scan_steps(lambda s: s2.step(cfg, s),
                             s2.Stam2DState(*parts), chunk)
            return tuple(out)

        sharded = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=specs, out_specs=specs,
            check_vma=False))
        st = s2sh.shard_state(state, mesh)
        return (lambda s: s2.Stam2DState(*sharded(*s))), st, chunk

    if variant in ("full", "halo16", "halo4"):
        hk = {"full": 8, "halo16": 16, "halo4": 4}[variant]
        run = s2sh.make_sharded_run(cfg, mesh, n_steps=chunk, halo_k=hk)
        return run, s2sh.shard_state(state, mesh), chunk

    raise ValueError(variant)


FAMS = {"gs": gs_variants, "sw": sw_variants, "stam2d": stam2d_variants}
VARIANTS = {
    "gs": ["base", "ext", "noop", "full"],
    "sw": ["base", "noop", "full"],
    "stam2d": ["base", "noop", "full", "halo16"],
}


def run_one(spec: str) -> dict:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    from fluidsims_tpu.core.platform import honor_env_platforms

    honor_env_platforms(jax)
    fam, variant = spec.split(":")
    run, state, chunk = FAMS[fam](variant)
    r = _rate(run, state, chunk)
    return {"probe": spec, "steps_per_sec": round(r, 3)}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--one")
    ap.add_argument("--probes", help="comma-separated fam:variant subset")
    ap.add_argument("--timeout", type=float, default=1200.0)
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "PROBE_SHARDED.json"))
    args = ap.parse_args()

    if args.one:
        print(json.dumps(run_one(args.one)), flush=True)
        return

    probes = (args.probes.split(",") if args.probes else
              [f"{f}:{v}" for f in VARIANTS for v in VARIANTS[f]])
    records = []
    for spec in probes:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", spec]
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.timeout)
        except subprocess.TimeoutExpired:
            records.append({"probe": spec, "error": "timeout"})
            print(json.dumps(records[-1]), flush=True)
            continue
        if p.returncode != 0:
            tail = (p.stderr or "").strip().splitlines()
            records.append({"probe": spec,
                            "error": (tail[-1][:200] if tail
                                      else f"exit {p.returncode}")})
        else:
            records.append(json.loads(p.stdout.strip().splitlines()[-1]))
        print(json.dumps(records[-1]), flush=True)
    with open(args.out, "w") as f:
        json.dump(records, f, indent=1)
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
