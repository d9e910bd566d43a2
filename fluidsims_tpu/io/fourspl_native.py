"""ctypes binding to the native `.4spl` writer (native/fourspl.c).

Builds libfourspl.so on first use (cc -O2 -shared -fPIC); falls back to the
pure-Python writer in fourspl.py if no compiler is available.  The native
writer implements the extern "C" API the reference's th3cs.cu links against
(th3cs.cu:21-63).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from . import fourspl as fpy

__all__ = ["native_available", "write_4spl_native", "write_4spl_best"]

_LIB = None
_TRIED = False


def _repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = _repo_root() / "native" / "fourspl.c"
    so = _repo_root() / "native" / "libfourspl.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O2", "-shared", "-fPIC", str(src), "-o",
                         str(so)],
                        check=True, capture_output=True,
                    )
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
            else:
                return None
        lib = ctypes.CDLL(str(so))
        lib.fourspl_write_file.restype = ctypes.c_bool
        lib.fourspl_write_file.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def write_4spl_native(path, video: fpy.Splat4DVideo) -> None:
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native fourspl library unavailable")
    pal = np.ascontiguousarray(video.palette, np.float32)
    idx = np.ascontiguousarray(video.indices, np.uint8)
    ok = lib.fourspl_write_file(
        str(path).encode(),
        video.width, video.height, video.depth, video.frames,
        video.p_size, video.flags,
        pal.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if not ok:
        raise IOError(f"native 4spl write failed: {path}")


def write_4spl_best(path, video: fpy.Splat4DVideo) -> str:
    """Write with the native library when available, else pure Python.
    Returns 'native' or 'python'."""
    if native_available():
        write_4spl_native(path, video)
        return "native"
    fpy.write_4spl(path, video)
    return "python"
