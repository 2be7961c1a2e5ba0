"""ctypes bindings for the native post-processing/metrics kernels.

The shared library is compiled lazily with g++ on first use (cached under
the package's _build/ directory, keyed by source mtime).  Every binding
returns None on any failure so callers fall back to the scipy path —
the framework never hard-requires the toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "postproc.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libpostproc.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> Optional[ctypes.CDLL]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    stamp = os.path.join(_BUILD_DIR, "source.mtime")
    src_mtime = str(os.path.getmtime(_SRC))
    if not (
        os.path.exists(_LIB_PATH)
        and os.path.exists(stamp)
        and open(stamp).read() == src_mtime
    ):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH]
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        with open(stamp, "w") as f:
            f.write(src_mtime)
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.largest_cc_fillhole.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
    lib.largest_cc_fillhole.restype = None
    lib.largest_cc_nd.argtypes = [u8p, i64p, ctypes.c_int, u8p]
    lib.largest_cc_nd.restype = None
    lib.surface_distances.argtypes = [u8p, u8p, i64p, ctypes.c_int, f64p, ctypes.c_int64]
    lib.surface_distances.restype = ctypes.c_int64
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is None and not _failed:
            try:
                _lib = _build()
            except Exception:
                _failed = True
    return _lib


def _u8(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a.astype(np.uint8))


def largest_cc_fillhole_native(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = _get_lib()
    if lib is None or mask.ndim != 2:
        return None
    m = _u8(mask)
    out = np.zeros_like(m)
    lib.largest_cc_fillhole(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(np.int64)


def largest_cc_nd_native(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = _get_lib()
    if lib is None or mask.ndim > 4:
        return None
    m = _u8(mask)
    dims = np.asarray(m.shape, np.int64)
    out = np.zeros_like(m)
    lib.largest_cc_nd(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        m.ndim,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(mask.dtype if np.issubdtype(np.asarray(mask).dtype, np.integer) else np.int64)


def surface_distances_native(result: np.ndarray, reference: np.ndarray) -> Optional[np.ndarray]:
    lib = _get_lib()
    if lib is None or result.ndim > 4:
        return None
    r = _u8(result)
    g = _u8(reference)
    dims = np.asarray(r.shape, np.int64)
    cap = int(r.size)
    out = np.empty(cap, np.float64)
    n = lib.surface_distances(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        r.ndim,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cap,
    )
    if n == -1:
        raise RuntimeError("The first input does not contain any binary object.")
    if n == -2:
        raise RuntimeError("The second input does not contain any binary object.")
    if n < 0 or n > cap:
        return None
    return out[:n].copy()
