"""Query driver: probe + classify over batches, count accumulation.

Host-side equivalent of FqReader::queryFastq_p / _sc up to (but excluding)
the solver stage (src/query.cpp:231-369).  The distributed variant lives in
parallel/dist_query.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import QueryConfig
from ..index.table import FlatIndex
from ..io.fastq import ReadSet
from ..utils.timing import Timings, stage_timer
from .classify import classify_batch
from .probe import DeviceIndex, to_device_index


@dataclasses.dataclass
class QueryCounts:
    """Accumulated classification results for one query file."""

    cnts_u: np.ndarray      # int64 [G] read_cnts_u by species id
    cnts_d: np.ndarray      # int64 [G]
    rcount_u: np.ndarray    # int64 [Eu] per unique-index entry
    rcount_d: np.ndarray    # int64 [Ed]
    nundet: int
    nconf: int
    pair_counts: Dict[Tuple[int, int], int]
    num_reads: int
    mean_read_len: int      # integer mean, reference: tlengths/reads.size()


class QuerySession:
    """Loads both indexes onto the device and classifies read sets."""

    def __init__(
        self,
        index_u: FlatIndex,
        index_d: Optional[FlatIndex],
        num_genome_slots: int,
        cfg: QueryConfig | None = None,
        engine: str = "gather",
        mesh=None,
    ):
        """engine: 'gather' (baseline per-position probe) or 'sortjoin'
        (lax.sort merge join; fastest on TPU).

        mesh: optional ('data', 'model') jax Mesh - classification runs
        distributed (reads sharded over 'data', the merged index over
        'model', counts psum-merged; the TPU-native replacement for the
        reference's OpenMP read loop, src/query.cpp:650-889)."""
        import jax

        self.cfg = cfg or QueryConfig()
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.dist_query import DistSortJoinSession

            self._index_u, self._index_d = index_u, index_d
            self._dist_sessions: Dict[bool, DistSortJoinSession] = {}
            self.num_genome_slots = num_genome_slots
            self.num_entries_u = index_u.num_entries
            self.num_entries_d = index_d.num_entries if index_d is not None else 0
            self.engine = "sortjoin-dist"

            def dist_classify(codes, lengths, with_rcounts=True, sc_mode=False):
                key = bool(sc_mode)
                if key not in self._dist_sessions:
                    self._dist_sessions[key] = DistSortJoinSession(
                        mesh, self._index_u, self._index_d,
                        num_genome_slots, sc_mode=sc_mode,
                    )
                return self._dist_sessions[key].classify(codes, lengths)

            self._classify = dist_classify
            return
        self.num_genome_slots = num_genome_slots
        self.num_entries_u = index_u.num_entries
        self.num_entries_d = index_d.num_entries if index_d is not None else 0
        self.didx_u = to_device_index(index_u)
        if index_d is None:
            # empty doubly table: dummy never-matching index with same h
            from ..index.sparsify import SelectedSubstrings
            from ..index.table import build_flat_index

            empty = build_flat_index(
                np.zeros(1, np.uint8),
                SelectedSubstrings(
                    start=np.zeros(0, np.int64), length=np.zeros(0, np.int64),
                    rid=np.zeros(0, np.int64), occ=np.zeros(0, np.int64),
                    rid2=np.zeros(0, np.int64), occ2=np.zeros(0, np.int64),
                    ulm_count=np.zeros(0, np.int64),
                ),
                index_u.h, 32, True,
            )
            self.didx_d = to_device_index(empty)
        else:
            if index_d.h != index_u.h:
                # the reference asserts hash_len_u == hash_len_d at query
                # time (src/query.cpp:460)
                raise ValueError("unique/doubly hash lengths must match at query time")
            self.didx_d = to_device_index(index_d)

        self.engine = engine
        if engine == "sortjoin":
            from .sortjoin import build_merged_index, make_sortjoin_classifier, to_device_merged

            dm = to_device_merged(build_merged_index(index_u, index_d))
            classifiers = {}

            def get_classifier(frac, maxm):
                key = (frac, maxm)
                if key not in classifiers:
                    classifiers[key] = make_sortjoin_classifier(
                        dm, num_genome_slots,
                        hit_capacity_frac=frac, maxm=maxm,
                    )
                return classifiers[key]

            def wrapped(codes, lengths, with_rcounts=True, sc_mode=False):
                import numpy as _np

                ln = _np.asarray(lengths)
                real = ln[ln > 0]
                ul = int(real[0]) if real.size and (real == real[0]).all() and (ln > 0).all() else None
                # fwd-only probe: N = B*O, so frac=32 gives the same
                # absolute hit capacity the 2-strand probe had at 64
                frac, maxm = 32, 16
                while True:
                    inner = get_classifier(frac, maxm)
                    out, ovh, ovs = inner(codes, lengths,
                                          with_rcounts=with_rcounts,
                                          sc_mode=sc_mode, uniform_len=ul)
                    if not (int(ovh) or int(ovs)):
                        return out
                    # capacity overflow: widen and retry (recompiles once
                    # per capacity tier, then cached)
                    if int(ovh):
                        frac = max(frac // 2, 1)
                    if int(ovs):
                        maxm *= 2
                    if frac < 1 or maxm > 4096:
                        raise RuntimeError(
                            f"sort-join capacity overflow persists "
                            f"(hits={int(ovh)}, slots={int(ovs)})")

            self._classify = wrapped
        else:
            self._classify = jax.jit(
                partial(
                    classify_batch,
                    self.didx_u,
                    self.didx_d,
                    num_genome_slots=num_genome_slots,
                ),
                static_argnames=("with_rcounts", "sc_mode"),
            )

    def run(self, reads: ReadSet, sc_mode: bool = False,
            timings: Timings | None = None, verbose: bool = False) -> QueryCounts:
        import jax.numpy as jnp

        G = self.num_genome_slots
        cnts_u = np.zeros(G, np.int64)
        cnts_d = np.zeros(G, np.int64)
        rcount_u = np.zeros(self.num_entries_u, np.int64)
        rcount_d = np.zeros(self.num_entries_d, np.int64)
        nundet = 0
        nconf = 0
        pair_counts: Dict[Tuple[int, int], int] = {}

        # avoid gross padding: shrink the batch to the read count (rounded
        # to a power of two) and the width to the longest read (rounded to
        # a multiple of 16)
        bs = self.cfg.batch_size
        if reads.num_reads < bs:
            bs = max(256, 1 << (max(reads.num_reads - 1, 1)).bit_length())
            bs = min(bs, self.cfg.batch_size)
        if self.mesh is not None:
            dp = self.mesh.shape["data"]
            bs = ((bs + dp - 1) // dp) * dp
        if reads.num_reads:
            # trim the batch width to the longest read: every extra column
            # adds probe offsets to the hot loop
            lp_eff = min(reads.codes.shape[1], int(reads.lengths.max()))
            if lp_eff < reads.codes.shape[1]:
                reads = ReadSet(
                    codes=reads.codes[:, :lp_eff], lengths=reads.lengths,
                    total_len=reads.total_len, name=reads.name,
                )
        with stage_timer("query", timings, verbose):
            for batch in reads.batches(bs):
                out = self._classify(
                    jnp.asarray(batch.codes),
                    jnp.asarray(batch.lengths),
                    with_rcounts=not sc_mode,
                    sc_mode=sc_mode,
                )
                cnts_u += np.asarray(out.cnts_u, np.int64)
                cnts_d += np.asarray(out.cnts_d, np.int64)
                rcount_u += np.asarray(out.rcount_u, np.int64)[: self.num_entries_u]
                rcount_d += np.asarray(out.rcount_d, np.int64)[: self.num_entries_d]
                nundet += int(out.nundet)
                nconf += int(out.nconf)
                if sc_mode:
                    lo = np.asarray(out.pair_lo)
                    hi = np.asarray(out.pair_hi)
                    sel = lo >= 0
                    if sel.any():
                        pairs, counts = np.unique(
                            np.stack([lo[sel], hi[sel]], axis=1), axis=0,
                            return_counts=True,
                        )
                        for (a, b), c in zip(pairs, counts):
                            key = (int(a), int(b))
                            pair_counts[key] = pair_counts.get(key, 0) + int(c)

        nr = reads.num_reads
        return QueryCounts(
            cnts_u=cnts_u, cnts_d=cnts_d,
            rcount_u=rcount_u, rcount_d=rcount_d,
            nundet=nundet, nconf=nconf,
            pair_counts=pair_counts,
            num_reads=nr,
            mean_read_len=(reads.total_len // nr) if nr else 0,
        )
