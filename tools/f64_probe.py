#!/usr/bin/env python
"""On-device double precision for the flagship: measure what it costs.

The reference's flagship is fp64 end-to-end (tau_hypersonic_cuda.cu:109-115:
double SoA at 8192x1024).  TPU v5e has no fp64 ALU; the options are
(a) XLA's emulated f64 (jax_enable_x64 + dtype=float64 — every op lowers
to multi-word f32 sequences), (b) double-double (f32-pair) arithmetic for
selected accumulations, (c) the shipped default: f32 state + the
1000-step f64-oracle drift gate (tests/test_long_horizon.py).

This probe measures (a) and (b) on the attached chip and prints JSON:

  * flagship XLA step at --nx x --ny in f32 vs f64 (steps/s);
  * microbenchmark chains: f32 mul-add, f64 mul-add, and double-double
    add (two_sum, 20 f32 ops) / mul (Dekker split, no FMA assumption)
    to bound what a hand-rolled compensated path could do.

Writes F64_PROBE.json; BASELINE.md carries the verdict.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _sync(x):
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[:1].block_until_ready())


def _rate(fn, x, iters=3):
    out = fn(x)
    _sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(out)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def two_sum(a, b):
    """Error-free f32 addition (Knuth): returns (s, e), a+b = s+e exactly."""
    s = a + b
    bb = s - a
    e = (a - bb) + (b - (s - bb))
    return s, e


def split(a):
    """Dekker split of an f32 into hi+lo halves (12-bit hi)."""
    c = a * 4097.0  # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free f32 product without FMA (Dekker)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_add(xh, xl, yh, yl):
    """Double-double addition (sloppy variant, 11 f32 ops)."""
    sh, se = two_sum(xh, yh)
    se = se + (xl + yl)
    h = sh + se
    return h, se - (h - sh)

def dd_mul(xh, xl, yh, yl):
    """Double-double multiplication (Dekker two_prod core)."""
    ph, pe = two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    h = ph + pe
    return h, pe - (h - ph)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--ny", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(ROOT, "F64_PROBE.json"))
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    from fluidsims_tpu.core.platform import honor_env_platforms

    honor_env_platforms(jax)
    import jax.numpy as jnp

    from fluidsims_tpu.core.stepper import scan_steps
    from fluidsims_tpu.solvers import hypersonic2d as h2

    rec = {"device": str(jax.devices()[0]), "nx": args.nx, "ny": args.ny}

    # ---- flagship step, f32 vs f64 -----------------------------------
    for dt_name in ("float32", "float64"):
        cfg = h2.default_config(nx=args.nx, ny=args.ny, dtype=dt_name)
        state = h2.init(cfg)
        run = jax.jit(lambda s, c=cfg: scan_steps(
            lambda x: h2.step(c, x), s, args.steps))
        try:
            wall = _rate(run, state)
            rec[f"step_{dt_name}_steps_per_sec"] = round(args.steps / wall, 3)
        except Exception as e:
            rec[f"step_{dt_name}_error"] = str(e)[:300]

    # ---- arithmetic chains -------------------------------------------
    import numpy as np

    n = 1 << 20
    depth = 64

    def chain_f(dtype):
        x0 = jnp.asarray(np.random.default_rng(0).random(n), dtype)

        @jax.jit
        def f(x):
            for _ in range(depth):
                x = x * 1.000001 + 0.3
            return x

        wall = _rate(f, x0)
        return n * depth * 2 / wall / 1e9  # G op/s (mul+add counted as 2)

    rec["f32_mul_add_gops"] = round(chain_f(jnp.float32), 1)
    rec["f64_mul_add_gops"] = round(chain_f(jnp.float64), 1)

    def chain_dd():
        rng = np.random.default_rng(0)
        x0 = (jnp.asarray(rng.random(n), jnp.float32),
              jnp.zeros(n, jnp.float32))

        @jax.jit
        def f(xs):
            h, l = xs
            for _ in range(depth):
                h, l = dd_mul(h, l, 1.000001, 1e-9)
                h, l = dd_add(h, l, 0.3, 0.0)
            return h, l

        out = f(x0)
        _sync(out[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(out)
            _sync(out[0])
            best = min(best, time.perf_counter() - t0)
        # equivalent f64-op rate: one dd mul+add pair == 2 "f64 ops"
        return n * depth * 2 / best / 1e9

    rec["dd_mul_add_equiv_gops"] = round(chain_dd(), 1)
    print(json.dumps(rec, indent=1))
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
