#!/usr/bin/env python
"""Headless benchmark entry point for the driver.

Prints the driver metric (flagship 2-D hypersonic steps/sec at 2048^2 f32,
the BASELINE.json target) as the FIRST JSON line, then one JSON line per
solver so regressions anywhere in the framework are driver-visible
(VERDICT r1 item 7).  Each line: {"metric", "value", "unit",
"vs_baseline"} against the committed prior-round table (PRIOR below;
update it each round from BASELINE.md).  The full sweep is also written
to BENCH_SWEEP.json for the record.  Each measurement reports its
fastest of two windows — the chip behind the axon tunnel is shared and
single windows can be depressed several-fold by other tenants.

Env overrides: FST_BENCH_NX / FST_BENCH_NY / FST_BENCH_STEPS /
FST_BENCH_IMPL (pallas|xla) / FST_BENCH_SWEEP=0 to skip the per-solver
sweep / FST_BENCH_SPH=0 to skip the legacy SPH stderr line.
"""

import json
import os
import sys
import time

# round-4 values (BENCH_r04.json / BASELINE.md): the baseline for
# round-5 comparisons
PRIOR = {
    "hypersonic2d_2048x2048_steps_per_sec": 213.8,
    "gray_scott_2048x2048_steps_per_sec": 10649.3,
    "burgers_512x512_steps_per_sec": 43185.2,
    "shallow_water_512x512_steps_per_sec": 43692.8,
    # MHD keeps its round-3 prior: round 4 read 27570 (0.909x) without
    # touching the kernel, and VERDICT r4 asks round 5 to settle whether
    # that was contention noise — so round 5 still compares against the
    # value the regression claim was made against
    "mhd_320x220_steps_per_sec": 30325.2,
    "lbm_2048x1024_mlups": 9680.9,
    "sph_65536_mpsps": 10.83,
    "flip_65536_mpsps": 10.4,
    "mpm_32768_mpsps": 11.05,
    "hypersonic3d_64_steps_per_sec": 727.6,
    "stam2d_512x512_steps_per_sec": 721.3,
    "stam2d_512x512_exact_steps_per_sec": 553.4,
    "stam3d_192_steps_per_sec": 32.9,
    "nbody_131072_exact_steps_per_sec": 9.32,
    }


def _sync(x):
    # slice ONE element on device before transferring: np.asarray on the
    # full array would pull it through the ~50 MB/s tunnel and dominate
    # the measurement
    import numpy as np

    return np.asarray(x.ravel()[:1].block_until_ready())


def _sync_tree(o):
    import jax

    return _sync(jax.tree_util.tree_leaves(o)[0])


LAST_WINDOWS = []  # window rates of the most recent _chunked call


def _chunked(jax, step_fn, state, total, chunk, windows=5):
    """Wall-clock steps/sec over `total` steps in `chunk`-step scans,
    warmup (compile) excluded, hard host sync bracketing.  The whole
    measurement runs `windows` times and the fastest window is reported —
    the chip behind the axon tunnel is shared, so a single window can be
    depressed several-fold by another tenant's bursts.  All window rates
    land in LAST_WINDOWS so the sweep can record the noise band."""
    from fluidsims_tpu.core.stepper import scan_steps

    run = jax.jit(lambda s: scan_steps(step_fn, s, chunk))
    out = run(state)
    _sync_tree(out)
    reps = max(1, total // chunk)
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(out)
        _sync_tree(out)
        rates.append(reps * chunk / (time.perf_counter() - t0))
    LAST_WINDOWS[:] = sorted(rates)
    return max(rates)


def bench_hypersonic(jax, nx, ny, steps, impl):
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

    rate = _chunked(jax, step_fn, state, max(steps, chunk), chunk)
    return rate, used, cfg



def _pallas_engine_rate(spec, timeout=900):
    """Measure a Pallas-engine config in a SUBPROCESS (tools/tune_kernels.py
    --one): remote Mosaic compiles through the axon tunnel can stall for
    minutes or hang outright, and a hung compile inside this process would
    take the whole bench run down with it.  Returns steps/sec or raises."""
    import json as _json
    import subprocess

    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "tune_kernels.py"),
           "--one", spec]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if p.returncode != 0:
        tail = (p.stderr or "").strip().splitlines()
        raise RuntimeError(tail[-1][:160] if tail else f"exit {p.returncode}")
    rec = _json.loads(p.stdout.strip().splitlines()[-1])
    return rec["steps_per_sec"], rec.get("windows", [])


def _max_with_pallas(r_xla, solver, k, gate):
    """Best of the XLA rate and the solver's Pallas engine (K-step
    temporally-blocked or whole-solve VMEM-resident), measured in a
    subprocess so a remote Mosaic compile stall cannot hang the bench.
    `gate` guards eligibility (TPU backend, kernel size checks).
    LAST_WINDOWS ends up holding the winning engine's window rates."""
    if not gate:
        return r_xla
    xla_windows = list(LAST_WINDOWS)
    try:
        rp, wp = _pallas_engine_rate(f"{solver}:k={k}")
        print(f"# {solver} engines: xla {r_xla:.1f} steps/s, "
              f"pallas(k={k}) {rp:.1f} steps/s", file=sys.stderr)
        LAST_WINDOWS[:] = wp if rp > r_xla else xla_windows
        return max(r_xla, rp)
    except Exception as e:
        print(f"# {solver} pallas engine failed, using xla: "
              f"{str(e)[:120]}", file=sys.stderr)
        LAST_WINDOWS[:] = xla_windows
        return r_xla


def _sweep(jax):
    """One (metric, value, unit) per solver, each at its reference-default
    size.  Fast solvers use enough steps that each timing window runs
    ~0.5-1 s — the ~10 ms tunnel dispatch+sync latency otherwise skews
    them.  The whole sweep stays in minutes."""
    import fluidsims_tpu.solvers.burgers as bg
    import fluidsims_tpu.solvers.flip_apic as fa
    import fluidsims_tpu.solvers.gray_scott as gs
    import fluidsims_tpu.solvers.hypersonic3d as h3
    import fluidsims_tpu.solvers.lbm as lbm
    import fluidsims_tpu.solvers.mhd as mhd
    import fluidsims_tpu.solvers.mpm as mpm
    import fluidsims_tpu.solvers.nbody_graph as nb
    import fluidsims_tpu.solvers.shallow_water as sw
    import fluidsims_tpu.solvers.sph as sph
    import fluidsims_tpu.solvers.stam2d as s2
    import fluidsims_tpu.solvers.stam3d as s3

    def gray_scott():
        cfg = gs.GrayScottConfig(nx=2048, ny=2048)
        state = gs.init(cfg)
        r = _chunked(jax, lambda s: gs.step(cfg, s), state, 2000, 500)
        # K-step temporally-blocked kernel: one HBM round trip per
        # block_k steps (the single-step update is HBM-bound)
        r = _max_with_pallas(r, "gray_scott", cfg.block_k,
                             gs.resolve_engine(cfg) == "pallas")
        return "gray_scott_2048x2048_steps_per_sec", r, "steps/sec"

    def burgers():
        cfg = bg.BurgersConfig(nx=512, ny=512)
        state = bg.init(cfg)
        r = _chunked(jax, lambda s: bg.step(cfg, s), state, 4000, 1000)
        # whole-solve VMEM-resident K-step kernel
        r = _max_with_pallas(r, "burgers", cfg.block_k,
                             jax.default_backend() == "tpu")
        return "burgers_512x512_steps_per_sec", r, "steps/sec"

    def shallow_water():
        cfg = sw.ShallowWaterConfig(nx=512, ny=512)
        state = sw.init(cfg)
        r = _chunked(jax, lambda s: sw.step(cfg, s), state, 4000, 1000)
        # whole-solve VMEM-resident K-step kernel
        r = _max_with_pallas(r, "shallow_water", cfg.block_k,
                             jax.default_backend() == "tpu")
        return "shallow_water_512x512_steps_per_sec", r, "steps/sec"

    def mhd_b():
        cfg = mhd.MHDConfig()
        r = _chunked(jax, lambda s: mhd.step(cfg, s), mhd.init(cfg), 4000, 1000)
        # whole-solve VMEM-resident K-step kernel (the default size is
        # bound by per-step pass glue)
        r = _max_with_pallas(r, "mhd", cfg.block_k,
                             jax.default_backend() == "tpu")
        return "mhd_320x220_steps_per_sec", r, "steps/sec"

    def lbm_b():
        cfg = lbm.LBMConfig(nx=2048, ny=1024)
        state = lbm.init(cfg)
        r = _chunked(jax, lambda s: lbm.step(cfg, s), state, 1000, 250)
        # K-step temporally-blocked kernel (one HBM round trip per
        # block_k steps; the single-step update is HBM-bound)
        r = _max_with_pallas(r, "lbm", cfg.block_k,
                             lbm.pallas_eligible(cfg)
                             and jax.default_backend() == "tpu")
        return "lbm_2048x1024_mlups", r * cfg.nx * cfg.ny / 1e6, "MLUPS"

    def sph_b():
        cfg = sph.SPHConfig(n=1 << 16, rain=False)
        r = _chunked(jax, lambda s: sph.step(cfg, s), sph.init(cfg), 100, 10)
        return "sph_65536_mpsps", r * cfg.n / 1e6, "M particle-steps/sec"

    def flip_b():
        cfg = fa.FlipApicConfig()
        r = _chunked(jax, lambda s: fa.step(cfg, s), fa.init(cfg), 100, 10)
        return "flip_65536_mpsps", r * cfg.particles / 1e6, \
            "M particle-steps/sec"

    def mpm_b():
        cfg = mpm.MPMConfig()
        r = _chunked(jax, lambda s: mpm.step(cfg, s), mpm.init(cfg), 100, 10)
        return "mpm_32768_mpsps", r * cfg.n / 1e6, "M particle-steps/sec"

    def hyp3d():
        cfg = h3.Hypersonic3DConfig()
        state = h3.init(cfg)
        try:
            from fluidsims_tpu.kernels import hypersonic3d_pallas as hp3

            step = hp3.make_step_pallas(cfg)
            _sync_tree(jax.jit(step)(state))
        except Exception as e:
            # Loud fallback: a silent one masked a broken kernel for a
            # whole sweep (the round-5 static-geometry cut didn't lower
            # in Mosaic and the 924 steps/s reading was this XLA path).
            print(f"# hyp3d: pallas engine failed ({type(e).__name__}); "
                  "benchmarking the XLA step", file=sys.stderr)
            step = lambda s: h3.step(cfg, s)  # noqa: E731
        r = _chunked(jax, step, state, 400, 100)
        return "hypersonic3d_64_steps_per_sec", r, "steps/sec"

    def stam2d_b():
        # the banded engine (the round-3 metric's semantics: clamps +
        # counts backtraces beyond the band)
        cfg = s2.Stam2DConfig(engine="pallas")
        r = _chunked(jax, lambda s: s2.step(cfg, s), s2.init(cfg), 400, 100)
        return "stam2d_512x512_steps_per_sec", r, "steps/sec"

    def stam2d_exact_b():
        # the hybrid never-clamps engine (the TPU auto default): banded
        # kernel + sparse exact repair, full exact gather on frames whose
        # clamped count exceeds the repair budget
        cfg = s2.Stam2DConfig(engine="hybrid")
        r = _chunked(jax, lambda s: s2.step(cfg, s), s2.init(cfg), 400, 100)
        return "stam2d_512x512_exact_steps_per_sec", r, "steps/sec"

    def stam3d_b():
        cfg = s3.Stam3DConfig()  # engine auto -> pallas on TPU, advect_k=2
        r = _chunked(jax, lambda s: s3.step(cfg, s), s3.init(cfg), 20, 5)
        return "stam3d_192_steps_per_sec", r, "steps/sec"

    def nbody_b():
        # exact all-pairs engine (round 2 default); the round-1 metric
        # measured the grid-monopole approximation, so this is a new name
        cfg = nb.GraphLayoutConfig(max_number=1 << 17)
        r = _chunked(jax, lambda s: nb.step(cfg, s), nb.init(cfg), 20, 5)
        return "nbody_131072_exact_steps_per_sec", r, "steps/sec"

    return [gray_scott, burgers, shallow_water, mhd_b, lbm_b, sph_b,
            flip_b, mpm_b, hyp3d, stam2d_b, stam2d_exact_b, stam3d_b,
            nbody_b]


def _load_prior():
    # vs_baseline is always against the committed prior-round table; a
    # BENCH_SWEEP.json from a contended run must not silently become the
    # baseline (the chip behind the tunnel is shared)
    return dict(PRIOR)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    from fluidsims_tpu.core.platform import honor_env_platforms

    honor_env_platforms(jax)

    nx = int(os.environ.get("FST_BENCH_NX", "2048"))
    ny = int(os.environ.get("FST_BENCH_NY", "2048"))
    steps = int(os.environ.get("FST_BENCH_STEPS", "100"))
    impl = os.environ.get("FST_BENCH_IMPL", "auto")
    prior = _load_prior()

    # Device-probe watchdog: when the TPU tunnel is dark, jax.devices()
    # hangs forever (uninterruptibly) — probe it on a daemon thread and
    # bail out with a well-formed zero record instead of hanging the
    # caller's bench run.
    import threading

    probe_done = threading.Event()
    probe_err = []

    def _probe():
        try:
            jax.devices()
        except Exception as e:  # fast init failure != hang
            probe_err.append(e)
        finally:
            probe_done.set()

    threading.Thread(target=_probe, daemon=True).start()
    if probe_done.wait(float(os.environ.get(
            "FST_BENCH_DEVICE_TIMEOUT", "600"))):
        if probe_err:
            raise probe_err[0]
    else:
        key = f"hypersonic2d_{nx}x{ny}_steps_per_sec"
        print(json.dumps({"metric": key, "value": 0.0, "unit": "steps/sec",
                          "vs_baseline": 0.0}), flush=True)
        print("# backend unreachable: jax.devices() did not answer within "
              "the probe timeout (dark TPU tunnel?)", file=sys.stderr)
        os._exit(1)

    value, used, cfg = bench_hypersonic(jax, nx, ny, steps, impl)
    key = f"hypersonic2d_{nx}x{ny}_steps_per_sec"
    records = [{
        "metric": key,
        "value": round(value, 3),
        "unit": "steps/sec",
        "vs_baseline": round(value / prior[key], 3) if prior.get(key) else 1.0,
    }]
    print(json.dumps(records[0]), flush=True)
    w = sorted(LAST_WINDOWS)
    if w:
        records[0]["noise"] = {
            "n_windows": len(w),
            "median_over_best": round(w[len(w) // 2] / w[-1], 4),
            "min_over_best": round(w[0] / w[-1], 4),
        }
    print(
        f"# {nx}x{ny} f32 [{used}], {steps} steps "
        f"({nx * ny * value / 1e6:.1f} Mcell-steps/s) on {jax.devices()[0]}",
        file=sys.stderr,
    )

    if os.environ.get("FST_BENCH_SWEEP", "1") != "0":
        for fn in _sweep(jax):
            try:
                metric, val, unit = fn()
            except Exception as e:
                print(f"# sweep {fn.__name__} failed: {str(e)[:160]}",
                      file=sys.stderr)
                continue
            vs = (round(val / prior[metric], 3)
                  if prior.get(metric) else 1.0)
            rec = {"metric": metric, "value": round(val, 3), "unit": unit,
                   "vs_baseline": vs}
            print(json.dumps(rec), flush=True)
            # noise band of the winning engine's timing windows (unit-free
            # ratios to the reported best-window value): cross-round
            # vs_baseline readings are only meaningful outside this band
            w = sorted(LAST_WINDOWS)
            if w:
                rec["noise"] = {
                    "n_windows": len(w),
                    "median_over_best": round(w[len(w) // 2] / w[-1], 4),
                    "min_over_best": round(w[0] / w[-1], 4),
                }
            records.append(rec)

        try:
            with open("BENCH_SWEEP.json", "w") as f:
                json.dump(records, f, indent=1)
        except Exception as e:
            print(f"# could not write BENCH_SWEEP.json: {e}", file=sys.stderr)

    if os.environ.get("FST_BENCH_SPH", "1") != "0":
        sph_rec = [r for r in records if r["metric"].startswith("sph_")]
        if sph_rec:
            print(f"# sph 65536 particles: {sph_rec[0]['value']:.2f} "
                  "M particle-steps/s", file=sys.stderr)


if __name__ == "__main__":
    main()
