"""Headless 3-D hypersonic run exporting a schlieren `.4spl` volume video.

Behavioral spec: th3cs.cu — the same Params/physics as
tau_hypersonic_3d_cuda.cu (solvers/hypersonic3d.py) run headless for 60
frames x 4 steps (:1132-1134), schlieren |grad rho| per frame
(k_schlieren_export :641-673 — identical to the viewer's schlieren mode),
256-entry heat palette (:1144-1150), per-frame min/max normalization with
gamma 0.65 and 8-bit quantization (:1199-1222), written with header flags
0x0004 (:1226-1228) via the 4splat API (io/fourspl*).
"""

from __future__ import annotations

import jax
import numpy as np

from ..io import fourspl
from ..io.fourspl_native import write_4spl_best
from . import hypersonic3d as h3

__all__ = ["export_4spl"]


def export_4spl(
    path,
    cfg: h3.Hypersonic3DConfig | None = None,
    frames: int = 60,
    steps_per_frame: int = 4,
    p_size: int = 256,
    use_native: bool = True,
    verbose: bool = False,
    impl: str = "auto",
) -> fourspl.Splat4DVideo:
    """Run the 3-D solver and export the schlieren volume video.
    `impl`: 'pallas' (fused kernel), 'xla', or 'auto' (pallas with XLA
    fallback)."""
    cfg = cfg or h3.default_config()
    state = h3.init(cfg)

    run_frame = None
    if impl in ("pallas", "auto"):
        try:
            from ..core.stepper import scan_steps
            from ..kernels import hypersonic3d_pallas as hp3

            step_p = hp3.make_step_pallas(cfg)
            run_frame = jax.jit(
                lambda s: scan_steps(step_p, s, steps_per_frame))
            jax.block_until_ready(run_frame(state).xi)
        except Exception:
            if impl == "pallas":
                raise
            run_frame = None
    if run_frame is None:
        run_frame = jax.jit(lambda s: h3.run(cfg, s, steps_per_frame))
    sch = jax.jit(lambda s: h3.vis_field(cfg, s, "schlieren"))

    indices = np.empty((frames, cfg.nz, cfg.ny, cfg.nx), np.uint8)
    for f in range(frames):
        state = run_frame(state)
        vol = np.asarray(sch(state))
        indices[f] = fourspl.quantize_frame(vol, gamma=0.65)
        if verbose:
            print(f"frame {f + 1}/{frames} t={float(state.t):.6f}")

    video = fourspl.Splat4DVideo(
        width=cfg.nx, height=cfg.ny, depth=cfg.nz, frames=frames,
        palette=fourspl.heat_palette(p_size), indices=indices,
        flags=fourspl.FLAG_F32_PRECISION,
    )
    if use_native:
        write_4spl_best(path, video)
    else:
        fourspl.write_4spl(path, video)
    return video
