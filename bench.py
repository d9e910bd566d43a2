#!/usr/bin/env python
"""Headless benchmark entry point for the driver.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Benchmarks the flagship 2-D hypersonic solver at 2048x2048 float32 (the
BASELINE.json target metric: steps/sec at 2048^2 hypersonic grid on one
chip).  The reference publishes no numbers (BASELINE.md), so vs_baseline is
reported against the recorded prior-round value when available, else 1.0.

Env overrides: FST_BENCH_NX / FST_BENCH_NY / FST_BENCH_STEPS for smaller
grids when running off-TPU.
"""

import json
import os
import sys
import time


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

    from fluidsims_tpu.solvers import hypersonic2d as h2

    cfg = h2.default_config(nx=nx, ny=ny)
    state = h2.init(cfg)

    chunk = min(steps, 25)
    reps = max(1, steps // chunk)
    run = jax.jit(lambda s: h2.run(cfg, s, chunk), donate_argnums=0)

    # Warmup / compile with the same trace that will be timed.
    warm = run(state)
    jax.block_until_ready(warm)
    import numpy as np

    _ = np.asarray(warm.t)  # hard sync through the device tunnel

    state = h2.init(cfg)
    t0 = time.perf_counter()
    out = state
    for _ in range(reps):
        out = run(out)
    _ = np.asarray(out.t)
    wall = time.perf_counter() - t0
    steps = chunk * reps

    steps_per_sec = steps / wall
    value = steps_per_sec

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

    print(
        json.dumps(
            {
                "metric": f"hypersonic2d_{nx}x{ny}_steps_per_sec",
                "value": round(value, 3),
                "unit": "steps/sec",
                "vs_baseline": round(vs, 3),
            }
        )
    )
    # Extra context on stderr (not part of the contract line).
    print(
        f"# {nx}x{ny} f32, {steps} steps in {wall:.2f}s "
        f"({nx*ny*steps/wall/1e6:.1f} Mcell-steps/s) on {jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
