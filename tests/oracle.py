"""Brute-force oracles implementing the *definitions* (not the reference's
code paths) of every build-phase quantity, for validating the vectorized
kernels on tiny corpora."""

from __future__ import annotations

import numpy as np


def oracle_suffix_array(s: np.ndarray) -> np.ndarray:
    s = bytes(bytearray(np.asarray(s, dtype=np.uint8)))
    return np.asarray(sorted(range(len(s)), key=lambda i: s[i:]), dtype=np.int64)


def oracle_lcp(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    s = bytes(bytearray(np.asarray(s, dtype=np.uint8)))
    n = len(s)
    out = np.zeros(n + 1, dtype=np.int64)
    for k in range(1, n):
        a, b = s[sa[k - 1]:], s[sa[k]:]
        h = 0
        while h < len(a) and h < len(b) and a[h] == b[h]:
            h += 1
        out[k] = h
    return out


def genome_of_position(pos: int, ref_pos: np.ndarray, ref_id: np.ndarray) -> int:
    j = int(np.searchsorted(np.asarray(ref_pos, dtype=np.int64), pos, side="right"))
    return int(ref_id[j])


def oracle_unique_lcp0(s, sa, gsa, el):
    """Per rank i: max(el, longest prefix of suffix SA[i] shared with any
    suffix of a different genome); edge rules as in the reference
    (first/last run handled by the sweep, reproduced here directly from the
    sweep's defining min/max recurrences over true LCPs)."""
    n = len(sa)
    s = bytes(bytearray(np.asarray(s, dtype=np.uint8)))

    def lcp_pair(a, b):
        x, y = s[a:], s[b:]
        h = 0
        while h < len(x) and h < len(y) and x[h] == y[h]:
            h += 1
        return h

    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        best_up = None
        for j in range(i + 1, n):
            if gsa[j] != gsa[i]:
                best_up = lcp_pair(sa[i], sa[j])
                break
        best_dn = None
        for j in range(i - 1, -1, -1):
            if gsa[j] != gsa[i]:
                best_dn = lcp_pair(sa[i], sa[j])
                break
        if best_up is None and best_dn is None:
            out[i] = 0
        elif best_up is None:      # last run: backward value, no el floor
            out[i] = best_dn
        elif best_dn is None:      # first run: forward value with el floor
            out[i] = max(el, best_up)
        else:
            out[i] = max(el, best_up, best_dn)
    return out


def oracle_occurrences(s, sub: bytes) -> list[int]:
    """All occurrence positions of sub in s."""
    s = bytes(bytearray(np.asarray(s, dtype=np.uint8)))
    out = []
    start = 0
    while True:
        k = s.find(sub, start)
        if k < 0:
            break
        out.append(k)
        start = k + 1
    return out


def oracle_genomes_containing(s, sub: bytes, ref_pos, ref_id) -> set[int]:
    return {
        genome_of_position(p, ref_pos, ref_id)
        for p in oracle_occurrences(s, sub)
    }


def substring_at(s, pos: int, length: int) -> bytes:
    s = bytes(bytearray(np.asarray(s, dtype=np.uint8)))
    return s[pos : pos + length]
