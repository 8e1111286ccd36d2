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


# ------------------------------------------------- mmap window loader --
@lru_cache(maxsize=1)
def _loader_lib() -> ctypes.CDLL:
    src = _NATIVE_DIR / "window_loader.cpp"
    so = _NATIVE_DIR / "window_loader.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             str(src), "-o", str(so)],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(str(so))
    lib.wl_open.restype = ctypes.c_void_p
    lib.wl_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.wl_close.argtypes = [ctypes.c_void_p]
    lib.wl_gather.restype = ctypes.c_int
    lib.wl_gather.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                              ctypes.c_int64, ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.wl_rows.restype = ctypes.c_int64
    lib.wl_rows.argtypes = [ctypes.c_void_p]
    return lib


def _npy_header(path) -> tuple[tuple, int]:
    """(shape, data_offset_bytes) of a float32 .npy without loading it."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        shape, fortran, dtype = np.lib.format._read_array_header(f, version)
        if fortran or dtype != np.float32:
            raise ValueError(f"{path}: loader requires C-order float32 .npy")
        return shape, f.tell()


class MmapWindows:
    """Zero-copy windowed view of an on-disk float32 .npy (rows, ...): the
    C++-backed core of the data loader (SURVEY.md §2.5 — the FFCV
    replacement).  ``gather(starts)`` -> (n, window, *trailing)."""

    def __init__(self, path, window: int):
        shape, offset = _npy_header(path)
        self.window = int(window)
        self.trailing = tuple(shape[1:])
        cols = int(np.prod(self.trailing)) if self.trailing else 1
        self._lib = _loader_lib()
        self._h = self._lib.wl_open(str(path).encode(), shape[0], cols, offset)
        if not self._h:
            raise OSError(f"wl_open failed for {path}")
        self.rows = int(shape[0])
        self.cols = cols

    def gather(self, starts, n_threads: int = 4) -> np.ndarray:
        starts = np.ascontiguousarray(starts, np.int64)
        out = np.empty((len(starts), self.window, self.cols), np.float32)
        rc = self._lib.wl_gather(self._h, starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                                 len(starts), self.window,
                                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
        if rc != 0:
            raise IndexError("window start out of range")
        return out.reshape((len(starts), self.window) + self.trailing)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.wl_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
