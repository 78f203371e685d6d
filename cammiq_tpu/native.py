"""ctypes bindings to the native C++ kernels (native/*.cpp).

The native library provides the production host-side engines:
- SA-IS suffix array (replaces the reference's external libdivsufsort,
  src/gsa.cpp:20-37) with OpenMP;
- Kasai LCP with per-thread carry (src/gsa.cpp:145-167);
- fast FASTQ batch parsing.

Build with `make -C native` (see native/Makefile).  Everything degrades
gracefully to the numpy engines when the library is absent.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "native", "libcammiq_native.so"),
    os.path.join(os.path.dirname(__file__), "libcammiq_native.so"),
)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
                lib.cammiq_sais64.restype = ctypes.c_int
                lib.cammiq_sais64.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64,
                ]
                lib.cammiq_kasai.restype = None
                lib.cammiq_kasai.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64,
                    ctypes.c_int64,
                ]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return _load() is not None


def suffix_array(s: np.ndarray) -> np.ndarray:
    """SA-IS suffix array of a uint8 text."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    s = np.ascontiguousarray(s, dtype=np.uint8)
    n = s.shape[0]
    sa = np.empty(n, dtype=np.int64)
    rc = lib.cammiq_sais64(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n),
    )
    if rc != 0:
        raise RuntimeError(f"native sais failed with code {rc}")
    return sa


def lcp_kasai(s: np.ndarray, sa: np.ndarray, clamp: int = 0xFFFF) -> np.ndarray:
    """Kasai LCP (convention: LCP[i] = lcp(SA[i-1], SA[i]), [n+1] output)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    s = np.ascontiguousarray(s, dtype=np.uint8)
    sa = np.ascontiguousarray(sa, dtype=np.int64)
    n = s.shape[0]
    lcp = np.zeros(n + 1, dtype=np.int64)
    lib.cammiq_kasai(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lcp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n),
        ctypes.c_int64(clamp),
    )
    return lcp
