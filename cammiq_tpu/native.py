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
                lib.cammiq_parse_fastq.restype = ctypes.c_int64
                lib.cammiq_parse_fastq.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int8),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64,
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.c_uint64,
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


def parse_fastq(data: bytes, max_len: int, min_len: int = 0,
                seed: int = 1):
    """Parse FASTQ bytes into (codes [R, max_len] int8, lengths [R] int32).

    Native replacement for the per-line Python loop (the reference parses
    line-by-line too, src/query.cpp:371-445); N/non-ACGT bases become
    LCG-random bases."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    nl = data.count(b"\n")
    max_reads = max(nl // 4 + 1, 1)
    codes = np.zeros((max_reads, max_len), np.int8)
    lengths = np.zeros(max_reads, np.int32)
    r = lib.cammiq_parse_fastq(
        data,
        ctypes.c_int64(len(data)),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(max_reads),
        ctypes.c_int32(max_len),
        ctypes.c_int32(min_len),
        ctypes.c_uint64(seed),
    )
    return codes[:r], lengths[:r]


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
