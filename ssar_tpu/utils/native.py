"""ctypes bindings for the native C++ kernels (host-side).

Compiles native/efficient_quantile.cpp with g++ on first use and caches the
shared object.  These are the host-path equivalents of the reference's
C++ torch extension (SURVEY.md §2.6); the device path uses the sort-based
jnp quantiles in ssar_tpu/ops/quantile.py, and the test suite asserts both
agree (tests/test_native.py).
"""
from __future__ import annotations

import ctypes
import subprocess
from functools import lru_cache
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    src = _NATIVE_DIR / "efficient_quantile.cpp"
    so = _NATIVE_DIR / "efficient_quantile.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(src), "-o", str(so)],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(str(so))
    lib.quantile_f32.restype = ctypes.c_double
    lib.quantile_f32.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double]
    lib.quantile_f32_cols.restype = None
    lib.quantile_f32_cols.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_double,
                                      ctypes.POINTER(ctypes.c_double)]
    lib.standardize_f32.restype = None
    lib.standardize_f32.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                                    ctypes.c_double, ctypes.c_double]
    return lib


def _as_f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x), dtype=np.float32)


def quantile(x, q: float) -> float:
    """Exact linear-interpolation quantile over all elements (C++ nth_element)."""
    buf = _as_f32(x).reshape(-1)
    return float(_lib().quantile_f32(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                                     buf.size, float(q)))


def quantile_cols(x, q: float) -> np.ndarray:
    """Per-column quantiles of an (n, m) matrix."""
    buf = _as_f32(x)
    n, m = buf.shape
    out = np.empty(m, np.float64)
    _lib().quantile_f32_cols(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, m,
                             float(q), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def standardize(x, lo_q: float = 0.25, hi_q: float = 0.75) -> np.ndarray:
    """IQR clamp + min-max normalise (ssar/features/processing.py:58-61), in C++."""
    buf = _as_f32(x).copy()
    flat = buf.reshape(-1)
    _lib().standardize_f32(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           flat.size, float(lo_q), float(hi_q))
    return buf
