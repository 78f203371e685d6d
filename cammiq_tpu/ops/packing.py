"""DNA symbol tables and 2-bit packing (numpy host side).

Byte-level parity with the reference corpus layout:
- genome bases are stored as ASCII + 165 (mod 256) bytes
  (reference: src/build.hpp:60 base_offset, src/build.cpp:188-193);
- contig separators are 4 bytes of the 28-bit contig id in 7-bit chunks,
  values in [0, 127] (reference: src/build.cpp:218-239);
- the 2-bit code is A=0, C=1, G=2, T=3 (reference symbolIdx,
  src/query.cpp:1860-1873 / src/hashtrie.cpp:701-714).

Packing convention used by the flat index and the query probe: base t of a
window lives at bits [2t, 2t+1] of word t//16 (little-endian within each
uint32 word), so masking a window to length l is a per-word AND with
((1 << 2*min(max(l-16w, 0), 16)) - 1).
"""

from __future__ import annotations

import numpy as np

BASE_OFFSET = 165  # reference: src/build.hpp:60

# ASCII -> 2-bit code; -1 for anything that is not A/C/G/T (upper or lower).
# Mirrors the reference symbolIdx including the offset-165 aliases at
# indices 230..249 (src/query.cpp:1860-1873).
SYMBOL_IDX = np.full(256, -1, dtype=np.int8)
for _c, _v in (("A", 0), ("C", 1), ("G", 2), ("T", 3)):
    SYMBOL_IDX[ord(_c)] = _v
    SYMBOL_IDX[ord(_c.lower())] = _v
    SYMBOL_IDX[(ord(_c) + BASE_OFFSET) % 256] = _v

# ASCII -> reverse-complement ASCII (A<->T, C<->G); identity elsewhere is
# never used because reads are N-scrubbed first (reference rcIdx,
# src/query.cpp:1875-1881).
RC_IDX = np.arange(256, dtype=np.uint8)
for _a, _b in ((ord("A"), ord("T")), (ord("C"), ord("G")),
               (ord("a"), ord("T")), (ord("c"), ord("G")),
               (ord("g"), ord("C")), (ord("t"), ord("A"))):
    RC_IDX[_a] = _b
RC_IDX[ord("T")] = ord("A")
RC_IDX[ord("G")] = ord("C")

ALPHABET = np.frombuffer(b"ACGT", dtype=np.uint8)

# 2-bit code -> complement code (A<->T is 0<->3, C<->G is 1<->2) == 3 - code.
CODE_COMPLEMENT = np.array([3, 2, 1, 0], dtype=np.int8)


def encode_ascii(seq: bytes | np.ndarray) -> np.ndarray:
    """ASCII bases -> 2-bit codes, -1 for non-ACGT."""
    arr = np.frombuffer(seq, dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else np.asarray(seq, dtype=np.uint8)
    return SYMBOL_IDX[arr]


def decode_codes(codes: np.ndarray) -> bytes:
    """2-bit codes -> ASCII bytes (for debugging / round trips)."""
    return ALPHABET[np.asarray(codes, dtype=np.int64)].tobytes()


def revcomp_ascii(seq: np.ndarray) -> np.ndarray:
    """Reverse complement of an ASCII uint8 array (reference getRC,
    src/query.cpp:447-450)."""
    return RC_IDX[np.asarray(seq, dtype=np.uint8)[::-1]]


def pack_words(codes: np.ndarray, n_words: int) -> np.ndarray:
    """Pack 2-bit codes [*, W*16] -> uint32 words [*, W].

    codes: int array whose last axis is the base axis; bases beyond the
    array (or negative codes) must be pre-masked by the caller.  Base t of
    the window goes to bits [2*(t%16)] of word t//16.
    """
    codes = np.asarray(codes)
    L = codes.shape[-1]
    need = n_words * 16
    if L < need:
        pad = np.zeros(codes.shape[:-1] + (need - L,), dtype=codes.dtype)
        codes = np.concatenate([codes, pad], axis=-1)
    elif L > need:
        codes = codes[..., :need]
    c = codes.astype(np.uint64) & 0x3
    c = c.reshape(codes.shape[:-1] + (n_words, 16))
    shifts = (2 * np.arange(16, dtype=np.uint64))
    words = np.bitwise_or.reduce(c << shifts, axis=-1)
    return words.astype(np.uint32)


def rev2bit_u32(x: np.ndarray) -> np.ndarray:
    """Reverse the 16 2-bit groups within each uint32.

    With the base-t-at-low-bits packing convention, reversed words compare
    symbol-lexicographically (base 0 lands in the most-significant bits),
    which sorted-order prefix checks rely on."""
    C = np.uint32
    x = np.asarray(x, np.uint32)
    x = ((x & C(0x33333333)) << C(2)) | ((x >> C(2)) & C(0x33333333))
    x = ((x & C(0x0F0F0F0F)) << C(4)) | ((x >> C(4)) & C(0x0F0F0F0F))
    x = ((x & C(0x00FF00FF)) << C(8)) | ((x >> C(8)) & C(0x00FF00FF))
    return ((x << C(16)) | (x >> C(16))).astype(np.uint32)


def length_masks(lengths: np.ndarray, n_words: int) -> np.ndarray:
    """Per-word AND-masks selecting the first `lengths` bases.

    lengths: [...] int; returns uint32 [..., n_words]."""
    lengths = np.asarray(lengths)
    w = np.arange(n_words)
    nb = np.clip(lengths[..., None] - 16 * w, 0, 16).astype(np.uint64)
    # (1 << 2*nb) - 1, with nb=16 -> 0xFFFFFFFF
    masks = ((np.uint64(1) << (2 * nb)) - np.uint64(1)).astype(np.uint32)
    return masks


def prefix_key(words: np.ndarray, h: int) -> tuple[np.ndarray, np.ndarray]:
    """(key_lo, key_hi) uint32 pair for the h-base prefix of packed windows.

    words: [..., >=2] uint32 packed window words.  h in [5, 31]: the prefix
    occupies words 0..1; word 1 is masked to the residual bases.
    """
    nb1 = min(max(h - 16, 0), 16)
    mask1 = np.uint32((1 << (2 * nb1)) - 1) if nb1 < 16 else np.uint32(0xFFFFFFFF)
    nb0 = min(h, 16)
    mask0 = np.uint32((1 << (2 * nb0)) - 1) if nb0 < 16 else np.uint32(0xFFFFFFFF)
    lo = words[..., 0] & mask0
    hi = (words[..., 1] & mask1) if h > 16 else np.zeros_like(lo)
    return lo, hi
