#!/usr/bin/env python
"""Sweep the tunable Pallas-engine configs on the attached TPU and record
the winners.

The reference auto-tunes CUDA tile sizes per SM generation
(tau_hypersonic_cuda.cu:1420-1446); the TPU analog is this sweep over the
temporal-blocking / residency knobs (block_k, band).  Each config runs in
its OWN subprocess with a hard timeout: remote Mosaic compiles through the
axon tunnel can stall for minutes (or hang), and one bad config must not
kill the sweep.  Results go to TUNE.json at the repo root:

    {"gray_scott": {"best": {...}, "results": [...]}, ...}

Usage:
    python tools/tune_kernels.py [solver ...]     # default: all
    python tools/tune_kernels.py --timeout 300 gray_scott lbm

A single measurement (used internally via subprocess):
    python tools/tune_kernels.py --one gray_scott:k=16,band=256
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# per-solver sweep grids; None means the kernel's own auto choice
SWEEPS = {
    "gray_scott": [{"k": k, "band": b}
                   for k in (8, 16, 32) for b in (256, 512)],
    # band=128 at 2048 wide exceeds the scoped-VMEM stack (kernel gate
    # band_fits_vmem) — sweep only bands that can compile there
    "lbm": [{"k": k, "band": b} for k in (4, 8, 16) for b in (32, 64)],
    "shallow_water": [{"k": k} for k in (8, 16, 32)],
    "burgers": [{"k": k} for k in (8, 16, 32)],
    "mhd": [{"k": k} for k in (8, 16, 32, 64)],
}


def _measure(solver: str, params: dict) -> list:
    """Window steps/sec rates of one engine config on the current backend
    (called in a subprocess).  Mirrors bench.py's methodology: chained
    scans, one-element device sync, 5 timing windows (the shared chip's
    contention makes single windows untrustworthy — the caller keeps the
    max as the uncontended-rate estimate and the spread as the noise
    band)."""
    sys.path.insert(0, ROOT)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    import jax
    import numpy as np

    from fluidsims_tpu.core.platform import honor_env_platforms

    honor_env_platforms(jax)

    from fluidsims_tpu.core.stepper import scan_steps

    def sync(tree):
        x = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(x.ravel()[:1].block_until_ready())

    def rate(fn, s0, n_calls, steps_per_call, windows=5):
        s = fn(s0)
        sync(s)
        # size the window to >= 0.5 s: the ~10 ms tunnel dispatch+sync
        # latency otherwise depresses fast configs 5-15% (bench.py
        # methodology; BASELINE round-2 postmortem)
        t0 = time.perf_counter()
        s = fn(s)
        sync(s)
        per_call = max(time.perf_counter() - t0, 1e-5)
        n_calls = max(n_calls, int(0.5 / per_call) + 1)
        rates = []
        for _ in range(windows):
            st, t0 = s, time.perf_counter()
            for _ in range(n_calls):
                st = fn(st)
            sync(st)
            rates.append(n_calls / (time.perf_counter() - t0)
                         * steps_per_call)
        return rates

    k = params.get("k")
    band = params.get("band")
    if solver == "gray_scott":
        from fluidsims_tpu.kernels.gray_scott_pallas import (
            make_multistep_pallas)
        from fluidsims_tpu.solvers import gray_scott as gs

        cfg = gs.GrayScottConfig(nx=2048, ny=2048)
        sup = make_multistep_pallas(cfg, k=k, band=band)
        per = (512 // k) * k
        f = jax.jit(lambda s: scan_steps(sup, s, 512 // k))
        return rate(f, gs.init(cfg), 4, per)
    if solver == "lbm":
        from fluidsims_tpu.kernels.lbm_pallas import make_multistep_pallas
        from fluidsims_tpu.solvers import lbm

        cfg = lbm.LBMConfig(nx=2048, ny=1024)
        sup = make_multistep_pallas(cfg, k=k, band=band)
        per = (256 // k) * k
        f = jax.jit(lambda s: scan_steps(sup, s, 256 // k))
        return rate(f, lbm.init(cfg), 4, per)
    if solver == "shallow_water":
        from fluidsims_tpu.kernels.sw_resident_pallas import (
            make_multistep_pallas)
        from fluidsims_tpu.solvers import shallow_water as sw

        cfg = sw.ShallowWaterConfig(nx=512, ny=512)
        sup = make_multistep_pallas(cfg, k=k)
        per = (1024 // k) * k
        f = jax.jit(lambda s: scan_steps(sup, s, 1024 // k))
        return rate(f, sw.init(cfg), 4, per)
    if solver == "burgers":
        from fluidsims_tpu.kernels.burgers_resident_pallas import (
            make_multistep_pallas)
        from fluidsims_tpu.solvers import burgers as bg

        cfg = bg.BurgersConfig(nx=512, ny=512)
        sup = make_multistep_pallas(cfg, k=k)
        per = (1024 // k) * k
        f = jax.jit(lambda s: scan_steps(sup, s, 1024 // k))
        return rate(f, bg.init(cfg), 4, per)
    if solver == "mhd":
        from fluidsims_tpu.kernels.mhd_resident_pallas import (
            make_multistep_pallas)
        from fluidsims_tpu.solvers import mhd

        cfg = mhd.MHDConfig()   # 320x220 reference default
        sup = make_multistep_pallas(cfg, k=k)
        per = (1024 // k) * k
        f = jax.jit(lambda s: scan_steps(sup, s, 1024 // k))
        return rate(f, mhd.init(cfg), 4, per)
    raise SystemExit(f"unknown solver {solver}")


def _parse_one(spec: str):
    solver, _, kv = spec.partition(":")
    if solver not in SWEEPS:
        raise SystemExit(
            f"unknown solver {solver!r}; choose from {sorted(SWEEPS)}")
    params = {}
    for item in filter(None, kv.split(",")):
        key, _, val = item.partition("=")
        params[key] = int(val)
    if "k" not in params:
        raise SystemExit(f"spec {spec!r} needs k=<steps>, e.g. {solver}:k=16")
    return solver, params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("solvers", nargs="*", default=None)
    ap.add_argument("--timeout", type=int, default=600,
                    help="per-config subprocess timeout (compile stalls)")
    ap.add_argument("--one", default=None,
                    help="internal: measure one config and print JSON")
    args = ap.parse_args(argv)

    if args.one:
        solver, params = _parse_one(args.one)
        rates = sorted(_measure(solver, params))
        print(json.dumps({"steps_per_sec": max(rates),
                          "windows": [round(r, 3) for r in rates]}))
        return 0

    solvers = args.solvers or list(SWEEPS)
    unknown = [s for s in solvers if s not in SWEEPS]
    if unknown:
        raise SystemExit(
            f"unknown solver(s) {unknown}; choose from {sorted(SWEEPS)}")
    out_path = os.path.join(ROOT, "TUNE.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)

    for solver in solvers:
        rows = []
        for params in SWEEPS[solver]:
            spec = solver + ":" + ",".join(
                f"{k}={v}" for k, v in params.items())
            cmd = [sys.executable, os.path.abspath(__file__), "--one", spec]
            print(f"tune {spec} ...", flush=True)
            try:
                p = subprocess.run(
                    cmd, capture_output=True, text=True, cwd=ROOT,
                    timeout=args.timeout)
                if p.returncode == 0:
                    r = json.loads(p.stdout.strip().splitlines()[-1])
                    rows.append({**params, **r})
                    print(f"  -> {r['steps_per_sec']:.1f} steps/s",
                          flush=True)
                else:
                    err = (p.stderr or "").strip().splitlines()
                    rows.append({**params, "error": err[-1][:200] if err
                                 else f"exit {p.returncode}"})
                    print(f"  -> failed: {rows[-1]['error']}", flush=True)
            except subprocess.TimeoutExpired:
                rows.append({**params,
                             "error": f"timeout {args.timeout}s (compile "
                                      "stall?)"})
                print("  -> timeout", flush=True)
        ok = [r for r in rows if "steps_per_sec" in r]
        results[solver] = {
            "best": max(ok, key=lambda r: r["steps_per_sec"]) if ok else None,
            "results": rows,
        }
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"{solver}: best = {results[solver]['best']}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
