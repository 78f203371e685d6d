"""End-to-end build + probe + classify tests vs. the scalar query oracle."""

import numpy as np
import pytest

from cammiq_tpu.config import BuildConfig, QueryConfig
from cammiq_tpu.index.builder import build_index
from cammiq_tpu.io.fastq import reads_from_arrays
from cammiq_tpu.query.pipeline import QuerySession

from query_oracle import oracle_classify

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_genomes(rng, num=4, length=400, shared_frac=0.35):
    shared = rng.integers(0, 4, size=int(length * shared_frac))
    out = []
    for g in range(num):
        own = rng.integers(0, 4, size=length)
        ins = int(rng.integers(0, length - len(shared)))
        seq = np.concatenate([own[:ins], shared, own[ins:]])
        out.append([ALPHA[seq].tobytes()])
    return out


def sample_reads(rng, genomes, n_reads=60, L=60, erate=0.0):
    reads = []
    src = []
    for _ in range(n_reads):
        g = int(rng.integers(0, len(genomes)))
        contig = genomes[g][0]
        p = int(rng.integers(0, len(contig) - L))
        read = bytearray(contig[p : p + L])
        if rng.random() < 0.5:
            comp = {65: 84, 67: 71, 71: 67, 84: 65}
            read = bytearray(comp[b] for b in reversed(read))
        for i in range(L):
            if rng.random() < erate:
                read[i] = int(ALPHA[rng.integers(0, 4)])
        reads.append(bytes(read))
        src.append(g + 1)
    return reads, src


@pytest.fixture(scope="module")
def built(request):
    rng = np.random.default_rng(7)
    genomes = make_genomes(rng)
    from cammiq_tpu.io.fasta import corpus_from_sequences

    corpus = corpus_from_sequences(genomes)
    cfg = BuildConfig(k=12, L=60, Lmax=30, h=12, mode="both")
    art = build_index(corpus, cfg, engine="numpy")
    return rng, genomes, corpus, cfg, art


def test_indexes_nonempty(built):
    _, _, _, _, art = built
    assert art.unique_index.num_entries > 0
    assert art.doubly_index.num_entries > 0


def test_classify_matches_oracle(built):
    rng, genomes, corpus, cfg, art = built
    reads, _ = sample_reads(rng, genomes, n_reads=80, L=60)
    rs = reads_from_arrays(reads, max_len=64)
    G = int(corpus.ref_id.max()) + 1
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=cfg.h, batch_size=32))
    got = sess.run(rs)
    want = oracle_classify(art.unique_index, art.doubly_index,
                           rs.codes, rs.lengths, G)
    np.testing.assert_array_equal(got.cnts_u, want["cnts_u"])
    np.testing.assert_array_equal(got.cnts_d, want["cnts_d"])
    np.testing.assert_array_equal(got.rcount_u, want["rcount_u"])
    np.testing.assert_array_equal(got.rcount_d, want["rcount_d"])
    assert got.nundet == want["nundet"]
    assert got.nconf == want["nconf"]


def test_classify_with_errors_matches_oracle(built):
    rng, genomes, corpus, cfg, art = built
    reads, _ = sample_reads(rng, genomes, n_reads=80, L=60, erate=0.05)
    rs = reads_from_arrays(reads, max_len=64)
    G = int(corpus.ref_id.max()) + 1
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=cfg.h, batch_size=64))
    got = sess.run(rs, sc_mode=True)
    want = oracle_classify(art.unique_index, art.doubly_index,
                           rs.codes, rs.lengths, G)
    np.testing.assert_array_equal(got.cnts_u, want["cnts_u"])
    np.testing.assert_array_equal(got.cnts_d, want["cnts_d"])
    assert got.pair_counts == want["pair_counts"]


def test_unique_only_session(built):
    rng, genomes, corpus, cfg, art = built
    reads, _ = sample_reads(rng, genomes, n_reads=40, L=60)
    rs = reads_from_arrays(reads, max_len=64)
    G = int(corpus.ref_id.max()) + 1
    sess = QuerySession(art.unique_index, None, G, QueryConfig(h=cfg.h, batch_size=64))
    got = sess.run(rs)
    want = oracle_classify(art.unique_index, None, rs.codes, rs.lengths, G)
    np.testing.assert_array_equal(got.cnts_u, want["cnts_u"])
    assert got.nundet == want["nundet"]


def test_most_clean_reads_classified(built):
    """Sanity: clean reads from indexed genomes should mostly classify."""
    rng, genomes, corpus, cfg, art = built
    reads, src = sample_reads(rng, genomes, n_reads=100, L=60)
    rs = reads_from_arrays(reads, max_len=64)
    G = int(corpus.ref_id.max()) + 1
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=cfg.h, batch_size=128))
    got = sess.run(rs)
    assigned = got.cnts_u.sum() + (got.cnts_d.sum() // 2)
    assert got.nconf == 0
    assert assigned + got.nundet >= 100 - 5
    assert got.nundet < 40
