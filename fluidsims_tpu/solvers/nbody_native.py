"""ctypes binding to the native threaded Barnes-Hut engine
(native/nbody_bh.c) — the host-side runtime counterpart of
nbody_graph.py, rebuilding the reference's pthread worker pool +
quadtree/octree architecture (number_fluid2d.c:44-79, :244-354;
number_fluid3d.c:255-382) natively.

Builds libnbody_bh.so on first use (cc -O2 -shared -fPIC -lpthread -lm).
`run_native` drives the same GraphLayoutConfig/GraphLayoutState types as
the JAX solver; `theta` is the BH multipole-acceptance knob (0 = exact
pairwise, reference uses 0.75)."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .nbody_graph import GraphLayoutConfig, GraphLayoutState

__all__ = ["native_available", "run_native", "BHEngine"]

_LIB = None
_TRIED = False


def _repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = _repo_root() / "native" / "nbody_bh.c"
    so = _repo_root() / "native" / "libnbody_bh.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O2", "-shared", "-fPIC", str(src), "-o",
                         str(so), "-lpthread", "-lm"],
                        check=True, capture_output=True,
                    )
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
            else:
                return None
        lib = ctypes.CDLL(str(so))
        dbl_p = ctypes.POINTER(ctypes.c_double)
        i32_p = ctypes.POINTER(ctypes.c_int32)
        lib.bh_create.restype = ctypes.c_void_p
        lib.bh_create.argtypes = [ctypes.c_int, ctypes.c_int, i32_p,
                                  ctypes.c_int, dbl_p, ctypes.c_int]
        lib.bh_destroy.argtypes = [ctypes.c_void_p]
        lib.bh_set_state.argtypes = [ctypes.c_void_p, dbl_p, dbl_p]
        lib.bh_get_state.argtypes = [ctypes.c_void_p, dbl_p, dbl_p]
        lib.bh_run.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class BHEngine:
    """Owns a native simulation: persistent worker pool + tree buffers."""

    def __init__(self, cfg: GraphLayoutConfig, edges: np.ndarray,
                 n_threads: int | None = None, theta: float = 0.75):
        import os

        if n_threads is None:
            n_threads = max(1, os.cpu_count() or 1)
        lib = _build_and_load()
        if lib is None:
            raise RuntimeError("native nbody_bh library unavailable")
        self._lib = lib
        self.cfg = cfg
        self.n = cfg.n_bodies
        self.dims = cfg.dims
        edges = np.ascontiguousarray(edges, np.int32)
        params = np.asarray([
            cfg.link_length, cfg.spring_k, cfg.softening, cfg.repulsion,
            cfg.damping, cfg.dt, cfg.max_speed, theta,
        ], np.float64)
        self._h = lib.bh_create(
            cfg.dims, self.n,
            edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(edges), _dp(params), n_threads)
        if not self._h:
            raise RuntimeError("bh_create failed")

    def set_state(self, pos: np.ndarray, vel: np.ndarray) -> None:
        pos = np.ascontiguousarray(pos, np.float64)
        vel = np.ascontiguousarray(vel, np.float64)
        assert pos.shape == (self.n, self.dims) == vel.shape
        self._lib.bh_set_state(self._h, _dp(pos), _dp(vel))

    def get_state(self):
        pos = np.empty((self.n, self.dims), np.float64)
        vel = np.empty((self.n, self.dims), np.float64)
        self._lib.bh_get_state(self._h, _dp(pos), _dp(vel))
        return pos, vel

    def run(self, n_steps: int) -> None:
        self._lib.bh_run(self._h, int(n_steps))

    def close(self) -> None:
        if self._h:
            self._lib.bh_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def run_native(cfg: GraphLayoutConfig, s: GraphLayoutState, n_steps: int,
               n_threads: int | None = None,
               theta: float = 0.75) -> GraphLayoutState:
    """Advance a GraphLayoutState with the native engine (float64).
    n_threads defaults to the machine's CPU count."""
    import jax.numpy as jnp

    with BHEngine(cfg, np.asarray(s.edges), n_threads, theta) as eng:
        eng.set_state(np.asarray(s.pos, np.float64),
                      np.asarray(s.vel, np.float64))
        eng.run(n_steps)
        pos, vel = eng.get_state()
    dt = cfg.jax_dtype
    return GraphLayoutState(
        pos=jnp.asarray(pos, dt), vel=jnp.asarray(vel, dt),
        edges=s.edges, steps=s.steps + n_steps,
    )
