"""sc-mode at G > 4096 (BASELINE config-#4 regime).

Round 3 fell back to per-batch host np.unique above PAIR_MATRIX_MAX_G =
4096; round 4 replaced the pair accounting with an on-device pair-table
accumulator that is bounded at ANY genome count.  This test runs the
full sc pipeline at G = 5000 and checks the pair counts EXACTLY against
an independent host-side recount of the per-read pair assignments.
"""

import sys

import numpy as np
import pytest

from cammiq_tpu.config import BuildConfig, QueryConfig
from cammiq_tpu.index.builder import build_index
from cammiq_tpu.io.fasta import corpus_from_sequences
from cammiq_tpu.io.fastq import reads_from_arrays
from cammiq_tpu.query.pipeline import QuerySession

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)
NUM_G = 5000
GLEN = 1200


@pytest.fixture(scope="module")
def big_g():
    rng = np.random.default_rng(21)
    # segments shared by exactly two genomes -> doubly-unique content and
    # real pair assignments across a genome-id range far beyond 4096
    pair_seg = {}
    genomes = []
    for g in range(NUM_G):
        own = rng.integers(0, 4, GLEN)
        mate = g ^ 1
        if mate < NUM_G:
            key = (min(g, mate), max(g, mate))
            if key not in pair_seg:
                pair_seg[key] = rng.integers(0, 4, 300)
            ins = int(rng.integers(0, GLEN - 300))
            own[ins : ins + 300] = pair_seg[key]
        genomes.append([ALPHA[own].tobytes()])
    corpus = corpus_from_sequences(genomes)
    art = build_index(corpus, BuildConfig(k=14, L=60, Lmax=30, h=14,
                                          mode="both"), engine="auto")
    reads = []
    rng2 = np.random.default_rng(22)
    for _ in range(2000):
        g = int(rng2.integers(0, NUM_G))
        c = genomes[g][0]
        p = int(rng2.integers(0, len(c) - 60))
        reads.append(c[p : p + 60])
    rs = reads_from_arrays(reads, max_len=64)
    G = int(corpus.ref_id.max()) + 1
    assert G > 4096
    return art, rs, G


def test_sc_pair_accounting_at_large_g(big_g):
    import jax.numpy as jnp

    art, rs, G = big_g
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=14, batch_size=512),
                        engine="sortjoin")
    got = sess.run(rs, sc_mode=True)
    assert got.pair_counts, "mixture must produce pair assignments"

    # independent recount: classify each batch, recount pairs on host
    from cammiq_tpu.query.sortjoin import (
        build_merged_index, classify_batch_sortjoin, to_device_merged)

    dm = to_device_merged(build_merged_index(art.unique_index,
                                             art.doubly_index))
    want = {}
    for batch in rs.batches(512):
        out, ovh, ovs = classify_batch_sortjoin(
            dm, jnp.asarray(batch.codes), jnp.asarray(batch.lengths), G,
            with_rcounts=False, sc_mode=True, hit_capacity_frac=2,
            maxm=64)
        assert int(ovh) == 0 and int(ovs) == 0
        lo = np.asarray(out.pair_lo)
        hi = np.asarray(out.pair_hi)
        for a, b in zip(lo[lo >= 0], hi[lo >= 0]):
            want[(int(a), int(b))] = want.get((int(a), int(b)), 0) + 1
    assert got.pair_counts == want
    hi_ids = [p for p in got.pair_counts if p[1] > 4096]
    print(f"# G={G}: {len(got.pair_counts)} distinct pairs, "
          f"{len(hi_ids)} with ids beyond 4096", file=sys.stderr)
    assert hi_ids, "pairs beyond the old 4096 matrix bound must occur"


def test_sc_cnts_at_large_g(big_g):
    """Type-I/II count vectors are well-formed at G > 4096."""
    art, rs, G = big_g
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=14, batch_size=512),
                        engine="sortjoin")
    got = sess.run(rs, sc_mode=True)
    assert got.cnts_u.shape[0] == G
    assert int(got.cnts_u.sum()) + int(got.cnts_d.sum()) > 0
    assert got.nconf + got.nundet < rs.num_reads
