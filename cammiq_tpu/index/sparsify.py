"""Sparsified index selection + unique-L-mer counting.

Operational port of the reference's computeIndexmin / computeIndexmin_d(_)
(src/build.cpp:336-629): walk candidate end-positions (MU-set) in text
order; maintain the greedy covering state (start_, last{j,l,r}) so that
every unique L-mer contains at least one emitted substring; count unique
L-mers per genome file with contig-boundary corrections.

Group semantics: the reference partitions genome files over min(t, 4)
pthreads and resets the walk state per thread (src/build.cpp:660,344-348).
`num_groups` reproduces that partition deterministically (sequentially).

Known deviation: the unique variant of the reference advances at most one
contig boundary per candidate (`if`, src/build.cpp:362) while the doubly
variants loop (`while`, src/build.cpp:460); here both loop, which only
differs when a candidate jumps two contig boundaries at once.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..io.fasta import Corpus
from ..ops.packing import BASE_OFFSET
from .unique import MU_EMPTY

# ASCII codes of A, C, G, T after the +165 offset (mod 256)
_ACGT_OFFSET = {(65 + BASE_OFFSET) % 256, (67 + BASE_OFFSET) % 256,
                (71 + BASE_OFFSET) % 256, (84 + BASE_OFFSET) % 256}


@dataclasses.dataclass
class SelectedSubstrings:
    """Emitted index substrings + per-file unique-L-mer counts."""

    start: np.ndarray      # int64 [S] text position of substring start
    length: np.ndarray     # int64 [S]
    rid: np.ndarray        # int64 [S] genome (species) id
    occ: np.ndarray        # int64 [S] own-genome occurrence count
    rid2: np.ndarray       # int64 [S] second genome id (0 for unique index)
    occ2: np.ndarray       # int64 [S]
    ulm_count: np.ndarray  # int64 [M] unique-L-mer count per genome FILE

    @property
    def size(self) -> int:
        return int(self.start.shape[0])


def _is_acgt(seq: np.ndarray) -> np.ndarray:
    ok = np.zeros(256, dtype=bool)
    for v in _ACGT_OFFSET:
        ok[v] = True
    return ok[seq]


def select_substrings(
    corpus: Corpus,
    mu: np.ndarray,
    occ: np.ndarray,
    L: int,
    Lmax: int,
    gsa2_text: Optional[np.ndarray] = None,
    occ2: Optional[np.ndarray] = None,
    num_groups: int = 1,
) -> SelectedSubstrings:
    """Reference-exact sequential engine (src/build.cpp:336-629).

    mu: int array [n+1] (MU_EMPTY where unset); occ/occ2/gsa2_text indexed
    by text position.  Pass gsa2_text/occ2 for the doubly variant.
    """
    contig_pos = corpus.contig_pos.astype(np.int64)
    ref_pos = corpus.ref_pos.astype(np.int64)
    ref_id = corpus.ref_id.astype(np.int64)
    seq = corpus.seq
    M = len(ref_pos)
    C = len(contig_pos)
    num_groups = max(1, min(num_groups, 4, M))
    doubly = gsa2_text is not None

    acgt = _is_acgt(seq)
    # prefix sums for O(1) "window all ACGT" tests
    acgt_cum = np.concatenate([[0], np.cumsum(acgt.astype(np.int64))])

    ulm = np.zeros(M, dtype=np.int64)
    exist_unique = np.ones(C, dtype=bool)
    out_start: List[int] = []
    out_len: List[int] = []
    out_rid: List[int] = []
    out_occ: List[int] = []
    out_rid2: List[int] = []
    out_occ2: List[int] = []

    mu = np.asarray(mu)
    cand_pos = np.nonzero(mu[: int(ref_pos[-1])] != MU_EMPTY)[0]
    cand_pos = cand_pos[cand_pos >= 1]

    nref = M // num_groups
    for tid in range(num_groups):
        i0 = 1 if tid == 0 else int(ref_pos[tid * nref - 1])
        nexti = int(ref_pos[M - 1]) if tid == num_groups - 1 else int(ref_pos[(tid + 1) * nref - 1])
        ci = int(np.searchsorted(contig_pos, i0, side="right"))
        ri = tid * nref
        lastr = ri
        start = 0
        start_ = 0
        lastj = 0
        lastl = 0

        lo = int(np.searchsorted(cand_pos, i0, side="left"))
        hi = int(np.searchsorted(cand_pos, nexti, side="left"))
        for i in cand_pos[lo:hi]:
            i = int(i)
            j = i - int(mu[i])

            # contig separator region (src/build.cpp:362-377 / 460-475)
            while ci < C and i >= contig_pos[ci] - 4:
                if start + L + 2 >= contig_pos[ci] and exist_unique[ci]:
                    corr = start + L + 3 - int(contig_pos[ci])
                    ulm[ri if ri == lastr else lastr] -= corr
                start = max(int(contig_pos[ci]), i - L)
                ci += 1
                if ci >= C:
                    break
                if ri < M and i >= ref_pos[ri] - 4:
                    ri += 1
                if start + L + 2 >= contig_pos[ci]:
                    exist_unique[ci] = False
            if ci >= C:
                break

            # substring spans two contigs (src/build.cpp:380-383)
            if ci > 0 and j - 1 < contig_pos[ci - 1]:
                continue
            # substring contains non-ACGT (src/build.cpp:386-398)
            if acgt_cum[i] - acgt_cum[j - 1] != i - (j - 1):
                continue
            # substring too long (src/build.cpp:401-405)
            length = i - j + 1
            if length > Lmax:
                continue

            # greedy covering insert (src/build.cpp:407-414)
            if i > start_ + L and lastl > 0:
                p0 = lastj - 1
                out_start.append(p0)
                out_len.append(lastl)
                out_rid.append(int(ref_id[lastr]))
                out_occ.append(int(occ[p0]))
                if doubly:
                    out_rid2.append(int(gsa2_text[p0]))
                    out_occ2.append(int(occ2[p0]))
                else:
                    out_rid2.append(0)
                    out_occ2.append(0)
                start_ = lastj

            # unique L-mer aggregation (src/build.cpp:416-423)
            if i <= start + L:
                ulm[ri] += j - start
            else:
                ulm[ri] += j + L - i
            start = j

            lastr = ri
            lastl = length
            lastj = j

    return SelectedSubstrings(
        start=np.asarray(out_start, dtype=np.int64),
        length=np.asarray(out_len, dtype=np.int64),
        rid=np.asarray(out_rid, dtype=np.int64),
        occ=np.asarray(out_occ, dtype=np.int64),
        rid2=np.asarray(out_rid2, dtype=np.int64),
        occ2=np.asarray(out_occ2, dtype=np.int64),
        ulm_count=ulm,
    )
