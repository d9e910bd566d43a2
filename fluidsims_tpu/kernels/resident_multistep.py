"""Generic whole-solve VMEM-resident K-step Pallas kernel builder.

The pattern (first used for shallow water, then Burgers): when a solver's
entire state fits in VMEM, run K full steps per kernel launch with the
state resident — grid=(), so periodic wraps are EXACT pltpu.rolls and
per-step global reductions (the CFL max) are the exact global reductions;
there is no ghost-creep approximation anywhere.  This removes the
per-step HBM traffic for intermediates and XLA pass glue that bound the
small-grid solvers (BASELINE.md roofline: shallow water sits at ~30% of
both HBM and issue on the XLA path).

The physics body is the solver's own ``step_fields`` function,
parameterized by the shift primitive — one source of truth for both
engines.  The t/tau τ-clock scalars ride in SMEM and advance inside the
loop (dt depends on t per step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_resident_multistep"]


def make_resident_multistep(step_fields, n_fields: int, shape, dtype,
                            dtau: float, k: int, interpret: bool = False):
    """Build a function (t, tau, *fields) -> (t2, tau2, *fields2) that
    advances k τ-clock steps entirely in VMEM.

    ``step_fields(fields_tuple, t, shift)`` must return the new fields
    tuple; ``shift(f, dy, dx)`` is the periodic 2-D shift primitive
    handed to it (pltpu.roll-based in-kernel)."""
    H, W = shape

    def kernel(*refs):
        import jax.lax as lax

        t_ref, tau_ref = refs[0], refs[1]
        f_in = refs[2:2 + n_fields]
        f_out = refs[2 + n_fields:2 + 2 * n_fields]
        t_out, tau_out = refs[2 + 2 * n_fields], refs[3 + 2 * n_fields]

        def shift(f, dy, dx):
            # S[y, x] = f[(y+dy) % H, (x+dx) % W], matching ops.shift.
            # pltpu.roll(f, s, axis)[i] = f[(i - s) % n]; shifts >= 0.
            if dx:
                f = pltpu.roll(f, (-dx) % W, axis=1)
            if dy:
                f = pltpu.roll(f, (-dy) % H, axis=0)
            return f

        def body(_i, carry):
            fields, t, tau = carry
            f2 = step_fields(fields, t, shift)
            t2 = t * jnp.exp(jnp.asarray(dtau, t.dtype))
            return (tuple(f2), t2, tau + jnp.asarray(dtau, tau.dtype))

        fields, t, tau = lax.fori_loop(
            0, k, body,
            (tuple(r[:, :] for r in f_in), t_ref[0, 0], tau_ref[0, 0]))
        for r, f in zip(f_out, fields):
            r[:, :] = f
        t_out[0, 0] = t
        tau_out[0, 0] = tau

    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    field = pl.BlockSpec(memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        in_specs=[scal, scal] + [field] * n_fields,
        out_specs=[field] * n_fields + [scal, scal],
        out_shape=(
            [jax.ShapeDtypeStruct((H, W), dtype) for _ in range(n_fields)]
            + [jax.ShapeDtypeStruct((1, 1), dtype),
               jax.ShapeDtypeStruct((1, 1), dtype)]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def superstep(t, tau, *fields):
        out = call(t.reshape(1, 1), tau.reshape(1, 1), *fields)
        return (out[n_fields][0, 0], out[n_fields + 1][0, 0],
                *out[:n_fields])

    return superstep
