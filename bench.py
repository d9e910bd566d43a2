#!/usr/bin/env python
"""Headless benchmark entry point for the driver.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Benchmarks the flagship 2-D hypersonic solver at 2048x2048 float32 (the
BASELINE.json target metric: steps/sec at 2048^2 hypersonic grid on one
chip), using the fused Pallas kernel when it compiles (XLA dataflow
fallback otherwise).  The reference publishes no numbers (BASELINE.md), so
vs_baseline is reported against the recorded prior-round value when
available, else 1.0.  A secondary SPH particle-steps/sec line goes to
stderr.

Env overrides: FST_BENCH_NX / FST_BENCH_NY / FST_BENCH_STEPS / FST_BENCH_IMPL
(pallas|xla) / FST_BENCH_SPH=0 to skip the secondary metric.
"""

import json
import os
import sys
import time


def _sync(x):
    import numpy as np

    return np.asarray(x).ravel()[:1]


def bench_hypersonic(jax, nx, ny, steps, impl):
    from fluidsims_tpu.core.stepper import scan_steps
    from fluidsims_tpu.solvers import hypersonic2d as h2

    cfg = h2.default_config(nx=nx, ny=ny)
    state = h2.init(cfg)
    chunk = max(1, min(50, steps))

    step_fn = None
    used = "xla"
    if impl != "xla":
        try:
            from fluidsims_tpu.kernels import hypersonic2d_pallas as hp

            band = 16 if ny % 16 == 0 else 8
            cand = hp.make_step_pallas(cfg, band=band)
            probe = jax.jit(cand)(state)
            _sync(probe.t)
            step_fn = cand
            used = "pallas"
        except Exception as e:
            print(f"# pallas kernel unavailable ({str(e)[:120]}); "
                  "falling back to XLA", file=sys.stderr)
    if step_fn is None:
        step_fn = lambda s: h2.step(cfg, s)  # noqa: E731

    # chunked lax.scan: per-dispatch tunnel latency (~0.8 ms) otherwise
    # dominates and underreports device throughput
    run = jax.jit(lambda s: scan_steps(step_fn, s, chunk))
    out = run(state)
    _sync(out.t)

    reps = max(1, steps // chunk)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(out)
    _sync(out.t)
    wall = time.perf_counter() - t0
    return reps * chunk / wall, used, cfg


def bench_sph(jax, steps=50):
    from fluidsims_tpu.solvers import sph

    cfg = sph.SPHConfig(n=1 << 16, rain=False)
    state = sph.init(cfg)
    run = jax.jit(lambda s: sph.run(cfg, s, 10))
    out = run(state)
    _sync(out.t)
    t0 = time.perf_counter()
    o = state
    for _ in range(steps // 10):
        o = run(o)
    _sync(o.t)
    wall = time.perf_counter() - t0
    n_steps = 10 * (steps // 10)
    return cfg.n * n_steps / wall


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    nx = int(os.environ.get("FST_BENCH_NX", "2048"))
    ny = int(os.environ.get("FST_BENCH_NY", "2048"))
    steps = int(os.environ.get("FST_BENCH_STEPS", "100"))
    impl = os.environ.get("FST_BENCH_IMPL", "auto")

    value, used, cfg = bench_hypersonic(jax, nx, ny, steps, impl)

    prior = None
    for fname in sorted(os.listdir(".")):
        if fname.startswith("BENCH_r") and fname.endswith(".json"):
            try:
                with open(fname) as f:
                    rec = json.load(f)
                if rec.get("metric", "").startswith("hypersonic2d"):
                    prior = rec.get("value")
            except Exception:
                pass
    vs = value / prior if prior else 1.0

    print(json.dumps({
        "metric": f"hypersonic2d_{nx}x{ny}_steps_per_sec",
        "value": round(value, 3),
        "unit": "steps/sec",
        "vs_baseline": round(vs, 3),
    }))
    print(
        f"# {nx}x{ny} f32 [{used}], {steps} steps "
        f"({nx * ny * value / 1e6:.1f} Mcell-steps/s) on {jax.devices()[0]}",
        file=sys.stderr,
    )

    if os.environ.get("FST_BENCH_SPH", "1") != "0":
        try:
            psps = bench_sph(jax)
            print(f"# sph 65536 particles: {psps / 1e6:.2f} M particle-steps/s",
                  file=sys.stderr)
        except Exception as e:
            print(f"# sph bench failed: {str(e)[:120]}", file=sys.stderr)


if __name__ == "__main__":
    main()
