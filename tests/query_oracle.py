"""Scalar transcription of the reference query loop (query64_p/query64_sc,
src/query.cpp:458-1080) against a FlatIndex, for validating the vectorized
classifier."""

from __future__ import annotations

import numpy as np

from cammiq_tpu.index.table import FlatIndex, _prefix_lo_hi
from cammiq_tpu.ops.packing import length_masks, pack_words


class OracleTable:
    def __init__(self, idx: FlatIndex):
        self.idx = idx
        self.h = idx.h
        self.kw = idx.kw
        self.buckets = {}
        plo_all, phi_all = _prefix_lo_hi(idx.key_words, idx.h)
        for e in range(idx.num_entries):
            key = (int(plo_all[e]), int(phi_all[e]))
            self.buckets.setdefault(key, []).append(e)

    def find(self, codes: np.ndarray, o: int, rl: int):
        """Entry id matching at offset o, or None."""
        idx = self.idx
        win = codes[o : o + self.kw * 16]
        words = pack_words(win[None, :], self.kw)[0]
        nb0 = min(self.h, 16)
        m0 = 0xFFFFFFFF if nb0 >= 16 else (1 << (2 * nb0)) - 1
        nb1 = min(max(self.h - 16, 0), 16)
        m1 = 0xFFFFFFFF if nb1 >= 16 else (1 << (2 * nb1)) - 1
        key = (int(words[0]) & m0, (int(words[1]) & m1) if self.h > 16 else 0)
        for e in self.buckets.get(key, ()):
            l = int(idx.length[e])
            if l > rl - o:
                continue
            masks = length_masks(np.asarray(l), self.kw)
            if all(
                (int(words[w]) & int(masks[w])) == int(idx.key_words[e, w])
                for w in range(self.kw)
            ):
                return e
        return None


def oracle_classify(
    idx_u: FlatIndex,
    idx_d: FlatIndex | None,
    reads_codes: np.ndarray,
    lengths: np.ndarray,
    num_genome_slots: int,
):
    """Returns dict mirroring BatchCounts (numpy int64)."""
    tab_u = OracleTable(idx_u)
    tab_d = OracleTable(idx_d) if idx_d is not None else None
    G = num_genome_slots
    cnts_u = np.zeros(G, np.int64)
    cnts_d = np.zeros(G, np.int64)
    rcount_u = np.zeros(max(idx_u.num_entries, 1), np.int64)
    rcount_d = np.zeros(max(idx_d.num_entries, 1) if idx_d is not None else 1, np.int64)
    nundet = 0
    nconf = 0
    pair_counts = {}

    def payload(tag, e):
        idx = idx_u if tag == 0 else idx_d
        return int(idx.rid1[e]), int(idx.rid2[e])

    for r in range(reads_codes.shape[0]):
        rl = int(lengths[r])
        if rl == 0:
            continue
        codes = reads_codes[r, :rl].astype(np.int64)
        rc = (3 - codes)[::-1]
        pnodes = set()
        for strand in (codes, rc):
            h = idx_u.h
            for o in range(rl - h + 1):
                e = tab_u.find(strand, o, rl)
                if e is not None:
                    pnodes.add((0, e))
                if tab_d is not None:
                    e = tab_d.find(strand, o, rl)
                    if e is not None:
                        pnodes.add((1, e))
        rids = set()
        rid_pairs = set()
        for tag, e in pnodes:
            r1, r2 = payload(tag, e)
            if r2 == 0:
                rids.add(r1)
            else:
                rid_pairs.add((min(r1, r2), max(r1, r2)))

        def bump_rcounts():
            for tag, e in pnodes:
                if tag == 0:
                    rcount_u[e] += 1
                else:
                    rcount_d[e] += 1

        P, U = len(rid_pairs), len(rids)
        if P == 0:
            if U == 0:
                nundet += 1
            elif U == 1:
                cnts_u[next(iter(rids))] += 1
                bump_rcounts()
            else:
                nconf += 1
        elif U > 1:
            nconf += 1
        elif U == 1:
            rid = next(iter(rids))
            if all(rid in p for p in rid_pairs):
                cnts_u[rid] += 1
                cnts_d[rid] += 1
                bump_rcounts()
            else:
                nconf += 1
        elif P == 1:
            (a, b) = next(iter(rid_pairs))
            cnts_d[a] += 1
            cnts_d[b] += 1
            bump_rcounts()
            key = (a, b)
            pair_counts[key] = pair_counts.get(key, 0) + 1
        else:
            inter = None
            for p in rid_pairs:
                cur = {p[0], p[1]}
                inter = cur if inter is None else {x for x in inter if x in cur}
            if len(inter) == 1:
                cnts_d[next(iter(inter))] += 1
                bump_rcounts()
            else:
                nconf += 1

    return dict(
        cnts_u=cnts_u, cnts_d=cnts_d, rcount_u=rcount_u, rcount_d=rcount_d,
        nundet=nundet, nconf=nconf, pair_counts=pair_counts,
    )
