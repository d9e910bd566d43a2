import sys, time, functools
import jax, jax.numpy as jnp
from fluidsims_tpu.solvers import hypersonic2d as h2
from fluidsims_tpu.kernels import hypersonic2d_pallas as hp
from fluidsims_tpu.core.stepper import scan_steps

skip = sys.argv[1] == "skip" if len(sys.argv) > 1 else True
if not skip:
    # force the unconditional path inside the band kernel
    orig = h2.step_core_padded
    h2.step_core_padded = functools.partial(orig, skip_clean=False)
    def patched(cfg, Up, Mp, dt, skip_clean=False):
        return orig(cfg, Up, Mp, dt, skip_clean=False)
    h2.step_core_padded = patched

cfg = h2.default_config(nx=2048, ny=2048)
state = h2.init(cfg)
step = hp.make_step_pallas(cfg, band=16)
run = jax.jit(lambda s: scan_steps(step, s, 100))
s = run(state); jax.block_until_ready(s.U.rho[0, 0])
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    s2 = run(s)
    jax.block_until_ready(s2.U.rho[0, 0])
    dt = time.perf_counter() - t0
    best = max(best, 100 / dt)
print(f"skip_clean={skip}: {best:.1f} steps/s")
