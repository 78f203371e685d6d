"""Test-only scalar transcriptions of the reference sweeps (src/gsa.cpp),
used to validate the vectorized segmented-scan kernels bug-for-bug.
Single-thread semantics; LCP[0] treated as 0 (see unique.py docstring)."""

from __future__ import annotations

import numpy as np

INF = np.iinfo(np.int64).max


def ref_unique_lcp0(gsa, lcp, el):
    """computeGnrLcpArray16/32 (src/gsa.cpp:239-309)."""
    n = len(gsa)
    lcp0 = np.zeros(n, dtype=np.int64)
    if n == 1:
        return lcp0
    end = n - 1
    while end > 0 and gsa[end] == gsa[end - 1]:
        end -= 1
    i = 0
    while i < end:
        nextd = 0
        while gsa[i + nextd] == gsa[i + nextd + 1]:
            nextd += 1
        minlcp = INF
        for j in range(nextd, -1, -1):
            minlcp = min(minlcp, lcp[i + j + 1])
            lcp0[i + j] = max(el, minlcp)
        i += nextd + 1
    for i in range(end, n):
        lcp0[i] = 0
    end = 0
    while end + 1 < n and gsa[end] == gsa[end + 1]:
        end += 1
    i = n - 1
    while i > end:
        nextd = 0
        while gsa[i - nextd] == gsa[i - nextd - 1]:
            nextd += 1
        minlcp = INF
        for j in range(nextd, -1, -1):
            minlcp = min(minlcp, lcp[i - j])
            lcp0[i - j] = max(lcp0[i - j], minlcp)
        i -= nextd + 1
    return lcp0


def ref_doubly_lcp0(sa, gsa, lcp, el, ulmax):
    """computeGnrLcpArray16_d (src/gsa.cpp:311-406), threads=1."""
    n = len(gsa)
    lcp0 = np.zeros(n, dtype=np.int64)
    gsa2 = np.zeros(n, dtype=np.int64)  # per text position
    if n == 1:
        return lcp0, gsa2
    end = n - 1
    while end > 0 and gsa[end] == gsa[end - 1]:
        end -= 1
    # forward pass
    i = 0
    while i < end:
        nextd = 0
        while gsa[i + nextd] == gsa[i + nextd + 1]:
            nextd += 1
        minlcp = INF
        for j in range(nextd, -1, -1):
            minlcp = min(minlcp, lcp[i + j + 1])
            lcp0[i + j] = minlcp
            gsa2[sa[i + j]] = gsa[i + nextd + 1]
        i += nextd + 1
    for i in range(end, n):
        lcp0[i] = 0
    # backward pass
    end = 0
    while end + 1 < n and gsa[end] == gsa[end + 1]:
        end += 1
    i = n - 1
    while i > end:
        nextd = 0
        while i - nextd - 1 >= 0 and gsa[i - nextd] == gsa[i - nextd - 1]:
            nextd += 1
        minlcp = INF
        for j in range(nextd, -1, -1):
            p = i - j
            minlcp = min(minlcp, lcp[p])
            if lcp0[p] < minlcp:
                # case 1: second genome = preceding run's genome
                min2lcp = INF
                i_ = i - nextd - 1
                while i_ > 0 and gsa[i_] == gsa[i_ - 1]:
                    min2lcp = min(min2lcp, lcp[i_])
                    i_ -= 1
                min2lcp = min(min2lcp, lcp[i_])
                min2lcp = min(min2lcp, minlcp)
                lcp0[p] = max(lcp0[p], min2lcp)
                lcp0[p] = max(lcp0[p], el)
                gsa2[sa[p]] = gsa[i - nextd - 1]
                if lcp0[p] >= minlcp:
                    lcp0[p] = ulmax + 2
            elif lcp0[p] > minlcp:
                # case 2: second genome stays the following run's genome
                min2lcp = INF
                i_ = i
                while i_ + 1 < n and gsa[i_] == gsa[i_ + 1]:
                    min2lcp = min(min2lcp, lcp[i_ + 1])
                    i_ += 1
                min2lcp = min(min2lcp, lcp[i_ + 1])
                i_ += 1
                while i_ + 1 < n and gsa[i_] == gsa[i_ + 1]:
                    min2lcp = min(min2lcp, lcp[i_ + 1])
                    i_ += 1
                min2lcp = min(min2lcp, lcp[i_ + 1])
                v = max(minlcp, min2lcp, el)
                if v >= lcp0[p]:
                    lcp0[p] = ulmax + 2
                else:
                    lcp0[p] = v
            else:
                lcp0[p] = ulmax + 2
        i -= nextd + 1
    return lcp0, gsa2


def ref_occ_unique(sa, gsa, lcp, lcp0):
    """computeOCC16/32 (src/gsa.cpp:544-614), occ per text position."""
    n = len(gsa)
    occ = np.ones(n, dtype=np.int64)
    for i in range(n - 1):
        minlcp = lcp[i + 1]
        j = 0
        while i + j <= n - 2 and gsa[i + j + 1] == gsa[i] and minlcp > lcp0[i]:
            occ[sa[i]] += 1
            j += 1
            minlcp = min(minlcp, lcp[i + j + 1])
    for i in range(n - 1, 0, -1):
        minlcp = lcp[i]
        j = 0
        while i - j > 0 and gsa[i - j - 1] == gsa[i] and minlcp > lcp0[i]:
            occ[sa[i]] += 1
            j += 1
            minlcp = min(minlcp, lcp[i - j])
    return occ


def ref_occ_doubly(sa, gsa, gsa2_text, lcp, lcp0, ulmax):
    """computeOCC16_d (src/gsa.cpp:616-663)."""
    n = len(gsa)
    occ = np.zeros(n, dtype=np.int64)
    occ2 = np.zeros(n, dtype=np.int64)
    end = 0
    while end + 1 < n and gsa[end] == gsa[end + 1]:
        end += 1
    begin = n - 1
    for i in range(begin, end, -1):
        if lcp0[i] <= ulmax:
            p = sa[i]
            g2 = gsa2_text[p]
            occ[p] = 1
            minlcp = INF
            j = 0
            while i - j > end and (gsa[i - j - 1] == gsa[i] or gsa[i - j - 1] == g2):
                minlcp = min(minlcp, lcp[i - j])
                if minlcp > lcp0[i]:
                    if gsa[i - j - 1] == gsa[i]:
                        occ[p] += 1
                    if gsa[i - j - 1] == g2:
                        occ2[p] += 1
                j += 1
            minlcp = INF
            j = 0
            while i + j <= begin - 1 and (gsa[i + j + 1] == gsa[i] or gsa[i + j + 1] == g2):
                minlcp = min(minlcp, lcp[i + j + 1])
                if minlcp > lcp0[i]:
                    if gsa[i + j + 1] == gsa[i]:
                        occ[p] += 1
                    if gsa[i + j + 1] == g2:
                        occ2[p] += 1
                j += 1
    return occ, occ2
