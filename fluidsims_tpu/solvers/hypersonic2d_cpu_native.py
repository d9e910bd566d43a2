"""ctypes binding to the native CPU 2-D hypersonic solver
(native/hypersonic2d_cpu.c) — the auto-vectorizable C build of the CPU
reference pair (behavioral spec tau_hypersonic.c + tau_hypersonic_simd.c,
which keeps bit-for-bit math order with the scalar file).  The C solver
mirrors solvers/hypersonic2d_cpu.py's arithmetic and face-update order,
so the two implementations agree to the last bit (asserted in
tests/test_hypersonic2d_cpu.py)."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .hypersonic2d_cpu import HypersonicCPUConfig

__all__ = ["native_available", "HypersonicCPUNative"]

_LIB = None
_TRIED = False


def _repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = _repo_root() / "native" / "hypersonic2d_cpu.c"
    so = _repo_root() / "native" / "libhypersonic2d_cpu.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            # -march=native enables the explicit AVX2 compute_dt kernels
            # (native/hypersonic2d_cpu.c); retry portable if unsupported
            for flags in (["-O3", "-march=native", "-ffp-contract=off"],
                          ["-O3"]):
                built = False
                for cc in ("cc", "gcc", "clang"):
                    try:
                        subprocess.run(
                            [cc, *flags, "-shared", "-fPIC", str(src),
                             "-o", str(so), "-lm"],
                            check=True, capture_output=True,
                        )
                        built = True
                        break
                    except (FileNotFoundError, subprocess.CalledProcessError):
                        continue
                if built:
                    break
            else:
                return None
        lib = ctypes.CDLL(str(so))
        dbl_p = ctypes.POINTER(ctypes.c_double)
        u8_p = ctypes.POINTER(ctypes.c_uint8)
        lib.h2_create.restype = ctypes.c_void_p
        lib.h2_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                  ctypes.c_double, ctypes.c_double,
                                  ctypes.c_double]
        lib.h2_destroy.argtypes = [ctypes.c_void_p]
        lib.h2_get.argtypes = [ctypes.c_void_p, dbl_p, u8_p, dbl_p]
        lib.h2_set.argtypes = [ctypes.c_void_p, dbl_p, ctypes.c_double]
        lib.h2_step.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class HypersonicCPUNative:
    """Same interface shape as HypersonicCPU: .U, .mask, .t, .step()."""

    def __init__(self, cfg: HypersonicCPUConfig):
        lib = _build_and_load()
        if lib is None:
            raise RuntimeError("native hypersonic2d_cpu library unavailable")
        self._lib = lib
        self.cfg = cfg
        self._h = lib.h2_create(cfg.w, cfg.h, cfg.gamma, cfg.cfl, cfg.mach)
        if not self._h:
            raise RuntimeError("h2_create failed")

    @property
    def state(self):
        cfg = self.cfg
        U = np.empty((cfg.h, cfg.w, 4), np.float64)
        mask = np.empty((cfg.h, cfg.w), np.uint8)
        t = np.zeros(1, np.float64)
        self._lib.h2_get(
            self._h, _dp(U),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _dp(t))
        return U, mask.astype(bool), float(t[0])

    @property
    def U(self):
        return self.state[0]

    @property
    def mask(self):
        return self.state[1]

    @property
    def t(self):
        return self.state[2]

    def set_state(self, U: np.ndarray, t: float = 0.0) -> None:
        U = np.ascontiguousarray(U, np.float64)
        self._lib.h2_set(self._h, _dp(U), float(t))

    def step(self, n: int = 1) -> None:
        self._lib.h2_step(self._h, int(n))

    def close(self) -> None:
        if self._h:
            self._lib.h2_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
