"""Checkpoint / resume for simulation state pytrees.

The reference has NO checkpointing (SURVEY.md §5: interactive 'R' re-inits
from scratch, tau_hypersonic_cuda.cu:1825-1828); this is deliberate new
capability.  States are NamedTuple pytrees of arrays + scalars; they
round-trip through a single .npz with the tree structure recorded, or
through orbax when available (multi-host friendly).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_state", "load_state", "save_orbax", "load_orbax"]


def save_state(path, state) -> None:
    """Write a state pytree to one .npz (host-side, device_get included)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = [np.asarray(x) for x in jax.device_get(leaves)]
    payload = {f"leaf_{i}": a for i, a in enumerate(arrays)}
    payload["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    # version-independent identity: the state class name survives JAX
    # upgrades that reword the treedef repr, so a wrong-solver checkpoint
    # with coincidentally matching leaf shapes still fails loudly
    payload["__state_class__"] = np.frombuffer(
        type(state).__name__.encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **payload)


def load_state(path, like, strict: bool = True) -> object:
    """Load a state saved by save_state; `like` provides the tree structure
    (and target dtypes) to restore into.

    `strict=False` downgrades the legacy-checkpoint treedef-mismatch
    error to a warning (escape hatch for pre-__state_class__ files after
    a JAX upgrade reworded the treedef repr; the per-leaf
    count/shape/dtype checks still apply)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves)
    if "__state_class__" in data:
        saved_cls = bytes(data["__state_class__"]).decode()
        if saved_cls != type(like).__name__:
            raise ValueError(
                f"checkpoint holds a {saved_cls} state but the template is "
                f"{type(like).__name__} — refusing to resume a different "
                "solver's checkpoint"
            )
    if "__treedef__" in data:
        # treedef repr is not a stable serialization across JAX versions, so
        # when the state class above already verified, a string mismatch is
        # only a warning (the authoritative checks are the per-leaf
        # count/shape/dtype validations below).  Legacy checkpoints without
        # __state_class__ have no other structural check — same-shape field
        # permutations would resume silently wrong — so there the mismatch
        # stays a hard error.
        saved_td = json.loads(bytes(data["__treedef__"]).decode())
        if saved_td != str(treedef):
            msg = (
                "checkpoint treedef string differs from the template state "
                "(may be a JAX version change); "
                f"\n  saved:    {saved_td}\n  template: {treedef}"
            )
            if "__state_class__" in data or not strict:
                import warnings

                warnings.warn(
                    msg + "\nvalidating leaf count and shapes instead")
            else:
                raise ValueError(
                    msg + "\n(legacy checkpoint without __state_class__: "
                    "same-shape field permutations are undetectable; pass "
                    "strict=False to load_state — or --load-lenient on the "
                    "CLI — to accept it anyway)")
    restored = []
    for i, ref in enumerate(leaves):
        if f"leaf_{i}" not in data:
            raise ValueError(
                f"checkpoint has {i} leaves but the template state has {n}"
            )
        a = data[f"leaf_{i}"]
        ref_shape = getattr(ref, "shape", None)
        if ref_shape is not None and tuple(a.shape) != tuple(ref_shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {tuple(a.shape)} does not match "
                f"template shape {tuple(ref_shape)}"
            )
        arr = jnp.asarray(a, getattr(ref, "dtype", None))
        # restore the template's placement: a mesh-sharded template leaf
        # (e.g. from parallel/*.shard_state) gets the checkpoint data
        # re-sharded onto the same mesh, so a multi-chip run resumes with
        # its original layout
        sharding = getattr(ref, "sharding", None)
        if sharding is not None and getattr(sharding, "mesh", None) is not None:
            arr = jax.device_put(arr, sharding)
        restored.append(arr)
    if f"leaf_{n}" in data:
        raise ValueError("checkpoint has more leaves than the template state")
    return jax.tree_util.tree_unflatten(treedef, restored)


def save_orbax(path, state) -> bool:
    """Checkpoint via orbax if installed; returns False otherwise."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return False
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(Path(path).absolute(), jax.device_get(state), force=True)
    return True


def load_orbax(path, like):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(Path(path).absolute(), item=jax.device_get(like))
    return jax.tree_util.tree_map(jnp.asarray, restored)
