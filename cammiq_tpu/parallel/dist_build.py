"""Cross-host suffix-array construction: per-slice bounded sorts + an
exact bounded-key merge (SURVEY §7 hard part (a)).

The single-host build bounded-sorts the whole concatenation in one
OpenMP pass (native/bsort.cpp).  At the reference's corpus cap
(maxN = 2^36 bytes, src/util.hpp:13) no single host holds the text, so
the sort must shard:

1. The corpus splits into H contiguous byte slices.  Host h sees ONLY
   its slice plus a `depth`-byte halo from the next slice (`depth` =
   cfg.sa_depth = L+2, the bound every LCP0/OCC/MU comparison in the
   pipeline thresholds at — src/gsa.cpp:239-712).  It bounded-sorts the
   subtext with native/bsort.cpp and keeps the suffixes starting in its
   slice: every kept suffix has its full `depth`-byte window inside the
   subtext, so the kept order equals the global bounded order.
2. Each host ships (global positions, `depth`-byte keys packed as
   big-endian uint64 words + a length tiebreak) — O(n_h · depth) bytes;
   no host ever touches another's corpus bytes.
3. Slices merge pairwise (log2 H rounds) with a vectorized
   lexicographic binary-search rank merge on the bounded keys.  Key
   comparison reproduces the sorter's virtual-sentinel convention
   (shorter suffix first on exhaustion — corpus bytes CAN be zero, the
   first contig separator is 4 zero bytes, so zero padding alone would
   conflate and the suffix length breaks the tie).
4. Ties at the depth cap stay in arbitrary order, exactly like the
   single-host bounded sort; the downstream pipeline is tie-insensitive
   (the bsort-vs-SAIS index-equality tests prove it), so the dist build
   produces an IDENTICAL index (tests/test_dist_build.py).

Host emulation: slice sorts run in separate PROCESSES, each handed only
its subtext bytes (multiprocessing pickles the slice — the honest
analog of a host reading its shard).  Reference single-node anchor:
src/gsa.cpp:20-58.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _pack_keys(subtext: np.ndarray, local_sa: np.ndarray, depth: int,
               tail_len: int | None = None):
    """(words, lens) bounded sort keys for suffixes `local_sa` of
    subtext: the first `depth` bytes as big-endian uint64 words (numpy
    '>u8' compares lexicographically) plus the in-text suffix length
    (min(depth, bytes to text end)) as the exhaustion tiebreak.
    tail_len: bytes of subtext that reach the GLOBAL text end (None =
    subtext ends at the global end, i.e. the last slice)."""
    n = subtext.shape[0]
    d8 = (depth + 7) // 8
    padded = np.concatenate([subtext, np.zeros(d8 * 8, np.uint8)])
    win = np.lib.stride_tricks.sliding_window_view(padded, d8 * 8)
    rows = np.ascontiguousarray(win[local_sa][:, : d8 * 8])
    # the comparator must be EXACTLY as coarse as the bounded sort: bytes
    # past `depth` in the final word would order ties the sorter left
    # arbitrary, contradicting the per-slice order the merge assumes
    rows[:, depth:] = 0
    words = rows.view(">u8").reshape(rows.shape[0], d8)
    if tail_len is None:
        lens = np.minimum(n - local_sa, depth).astype(np.int64)
    else:
        # middle slice: subtext ends at a halo cut, not the text end —
        # every kept suffix has `depth` real bytes available
        lens = np.full(local_sa.shape[0], depth, np.int64)
    return words, lens


def _slice_worker(args):
    """Bounded-sort one slice's suffixes from its subtext only.
    args: (subtext bytes, slice_len, global_start, depth, is_last)."""
    from .. import native

    sub_b, slice_len, start, depth, is_last = args
    sub = np.frombuffer(sub_b, np.uint8)
    sa = native.bounded_sa(sub, depth)
    keep = sa < slice_len
    local = sa[keep]
    words, lens = _pack_keys(sub, local, depth,
                             tail_len=None if is_last else depth)
    return (local + start).astype(np.int64), words, lens


def _lex_less(xw, xl, yw, yl):
    """Bounded-suffix 'strictly less': big-endian word compare, shorter
    suffix first when the padded words tie (virtual sentinel)."""
    m, d8 = xw.shape
    neq = xw != yw
    any_neq = neq.any(axis=1)
    first = np.argmax(neq, axis=1)
    rows = np.arange(m)
    xb = xw[rows, first]
    yb = yw[rows, first]
    return np.where(any_neq, xb < yb, xl < yl)


def _rank(keys_w, keys_l, q_w, q_l, side: str) -> np.ndarray:
    """Vectorized binary search of queries in a sorted key list:
    side='left' counts keys < q, side='right' counts keys <= q."""
    n = keys_w.shape[0]
    m = q_w.shape[0]
    lo = np.zeros(m, np.int64)
    hi = np.full(m, n, np.int64)
    for _ in range(max(int(n).bit_length(), 1)):
        act = lo < hi
        mid = (lo + hi) >> 1
        midc = np.minimum(mid, max(n - 1, 0))
        kw = keys_w[midc]
        kl = keys_l[midc]
        if side == "left":
            go_right = _lex_less(kw, kl, q_w, q_l)
        else:
            go_right = ~_lex_less(q_w, q_l, kw, kl)
        lo = np.where(act & go_right, mid + 1, lo)
        hi = np.where(act & ~go_right, mid, hi)
    return lo


def merge_sorted_slices(a, b):
    """Stable merge of two (pos, words, lens) sorted slices (a first on
    ties — ties at the depth bound are interchangeable anyway)."""
    pa, wa, la = a
    pb, wb, lb = b
    na, nb = pa.shape[0], pb.shape[0]
    if na == 0:
        return b
    if nb == 0:
        return a
    idx_a = np.arange(na) + _rank(wb, lb, wa, la, "left")
    idx_b = np.arange(nb) + _rank(wa, la, wb, lb, "right")
    n = na + nb
    pos = np.empty(n, np.int64)
    words = np.empty((n, wa.shape[1]), dtype=wa.dtype)
    lens = np.empty(n, np.int64)
    pos[idx_a], pos[idx_b] = pa, pb
    words[idx_a], words[idx_b] = wa, wb
    lens[idx_a], lens[idx_b] = la, lb
    return pos, words, lens


def dist_bounded_sa(seq: np.ndarray, depth: int, hosts: int,
                    processes: bool = True) -> np.ndarray:
    """Depth-bounded suffix array of `seq` built from `hosts` corpus
    slices, each sorted from its own subtext in a separate process.
    Output ordering contract == native.bounded_sa (ties arbitrary)."""
    n = seq.shape[0]
    hosts = max(1, min(hosts, n))
    cuts = [n * i // hosts for i in range(hosts + 1)]
    jobs = []
    for h in range(hosts):
        start, stop = cuts[h], cuts[h + 1]
        sub = seq[start : min(stop + depth, n)]
        jobs.append((sub.tobytes(), stop - start, start, depth,
                     stop + depth >= n))
    if processes and hosts > 1:
        import multiprocessing as mp

        with mp.get_context("spawn").Pool(min(hosts, 4)) as pool:
            parts = pool.map(_slice_worker, jobs)
    else:
        parts = [_slice_worker(j) for j in jobs]
    while len(parts) > 1:
        nxt: List[Tuple] = []
        for i in range(0, len(parts) - 1, 2):
            nxt.append(merge_sorted_slices(parts[i], parts[i + 1]))
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0][0]
