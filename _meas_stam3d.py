import sys
import time
import numpy as np
import jax
import fluidsims_tpu.kernels.stam3d_pallas as sp
import fluidsims_tpu.solvers.stam3d as s3
from fluidsims_tpu.core.stepper import scan_steps


def measure(tag):
    cfg = s3.Stam3DConfig()
    state = s3.init(cfg)
    run = jax.jit(lambda s: scan_steps(lambda t: s3.step(cfg, t), s, 5))
    s = run(state)
    np.asarray(s.d.ravel()[:1].block_until_ready())
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        s = run(s)
        np.asarray(s.d.ravel()[:1].block_until_ready())
        best = max(best, 5 / (time.perf_counter() - t0))
    print(f"{tag}: {best:.1f} steps/s", flush=True)


orig = sp._pick_jacobi_band
for mode in sys.argv[1:] or ["new", "old"]:
    sp._pick_jacobi_band = orig if mode == "new" else (lambda n, it: (4, 4))
    measure(f"stam3d 192^3 band={'picker' if mode == 'new' else '(4,4)'}")
