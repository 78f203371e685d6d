"""Native C++ kernels (SA-IS, Kasai, FASTQ parser) vs. numpy engines."""

import numpy as np
import pytest

from cammiq_tpu import native
from cammiq_tpu.ops.lcp import lcp_from_sa_numpy
from cammiq_tpu.ops.sa import suffix_array_numpy

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


@pytest.mark.parametrize("n,sigma", [(1, 2), (2, 2), (64, 2), (1000, 4), (5000, 3), (20000, 4)])
def test_native_sais(rng, n, sigma):
    s = rng.integers(0, sigma, size=n).astype(np.uint8) + 230
    np.testing.assert_array_equal(native.suffix_array(s), suffix_array_numpy(s))


def test_native_sais_repetitive(rng):
    s = np.frombuffer(b"abcabcabcabc" * 100 + b"xy", dtype=np.uint8)
    np.testing.assert_array_equal(native.suffix_array(s), suffix_array_numpy(s))


def test_native_sais_corpus_like(rng):
    # corpus-like: offset bases + low separator bytes + sentinels
    from cammiq_tpu.io.fasta import corpus_from_sequences

    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [[alpha[rng.integers(0, 4, 500)].tobytes()] for _ in range(3)]
    corpus = corpus_from_sequences(genomes)
    s = corpus.seq
    np.testing.assert_array_equal(native.suffix_array(s), suffix_array_numpy(s))


@pytest.mark.parametrize("n,sigma", [(2, 2), (1000, 2), (5000, 4)])
def test_native_kasai(rng, n, sigma):
    s = rng.integers(0, sigma, size=n).astype(np.uint8) + 230
    sa = native.suffix_array(s)
    np.testing.assert_array_equal(native.lcp_kasai(s, sa), lcp_from_sa_numpy(s, sa))


def test_native_fastq_parser(tmp_path, rng):
    import ctypes

    from cammiq_tpu.io.fastq import read_fastq

    lines = []
    reads = []
    for i in range(50):
        L = int(rng.integers(60, 120))
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        if i % 7 == 0:
            seq = seq[:10] + "N" + seq[11:]
        reads.append(seq)
        lines += [f"@r{i}", seq, "+", "I" * L]
    p = tmp_path / "t.fq"
    p.write_text("\n".join(lines) + "\n")

    lib = native._load()
    lib.cammiq_parse_fastq.restype = ctypes.c_int64
    buf = p.read_bytes()
    max_reads, max_len = 100, 128
    codes = np.zeros((max_reads, max_len), np.int8)
    lengths = np.zeros(max_reads, np.int32)
    r = lib.cammiq_parse_fastq(
        buf, ctypes.c_int64(len(buf)),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(max_reads), ctypes.c_int32(max_len),
        ctypes.c_int32(0), ctypes.c_uint64(7),
    )
    assert r == 50
    want = read_fastq(str(p), max_len=max_len, engine="python")
    np.testing.assert_array_equal(lengths[:50], want.lengths)
    # all non-N positions must agree
    for i, seq in enumerate(reads):
        for t, ch in enumerate(seq[:max_len]):
            if ch in "ACGT":
                assert codes[i, t] == "ACGT".index(ch)


def test_read_fastq_native_engine_parity(tmp_path, rng):
    """The bound native loader (engine='native', the read_fastq default
    when the library is built) must match the Python loader exactly on
    N-free input, including the min-length filter and truncation."""
    from cammiq_tpu.io.fastq import read_fastq

    lines = []
    for i in range(500):
        L = int(rng.integers(5, 300))
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        lines += [f"@r{i}", seq, "+", "I" * L]
    p = tmp_path / "t2.fq"
    p.write_text("\n".join(lines) + "\n")
    for min_len, max_len in ((0, 256), (60, 256), (0, 128)):
        a = read_fastq(str(p), min_len=min_len, max_len=max_len,
                       engine="native")
        b = read_fastq(str(p), min_len=min_len, max_len=max_len,
                       engine="python")
        assert a.num_reads == b.num_reads
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_array_equal(a.lengths, b.lengths)
        assert a.total_len == b.total_len


def _pipeline_arrays(rng, num_genomes=4, glen=400, shared_frac=0.4):
    from cammiq_tpu.io.fasta import corpus_from_sequences

    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    shared = rng.integers(0, 4, size=int(glen * shared_frac))
    genomes = []
    for g in range(num_genomes):
        own = rng.integers(0, 4, size=glen)
        ins = int(rng.integers(0, glen - 1))
        seq = np.concatenate([own[:ins], shared, own[ins:]])
        genomes.append([alpha[seq].tobytes()])
    corpus = corpus_from_sequences(genomes)
    n = corpus.n
    sa = native.suffix_array(corpus.seq)[:n]
    return corpus, sa


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sweeps_match_numpy_unique(seed):
    """sweeps.cpp production engine == numpy segmented-scan engine."""
    if not native.has_sweeps():
        pytest.skip("sweeps not built")
    from cammiq_tpu.index.unique import (
        compute_gsa, min_unique, occ_unique, unique_lcp0,
    )
    from cammiq_tpu.ops.lcp import lcp_from_sa_numpy

    rng = np.random.default_rng(100 + seed)
    corpus, sa = _pipeline_arrays(rng)
    n = corpus.n
    lcp64 = lcp_from_sa_numpy(corpus.seq[:n], sa)
    lcp16 = native.kasai_u16(corpus.seq[:n], sa)
    np.testing.assert_array_equal(lcp16.astype(np.int64),
                                  np.minimum(lcp64, 0xFFFF))
    gsa_np = compute_gsa(sa, corpus.ref_pos, corpus.ref_id)
    gsa_nat = native.gsa32(sa, corpus.ref_pos, corpus.ref_id)
    np.testing.assert_array_equal(gsa_nat.astype(np.int64), gsa_np)
    el = 11
    l0_np = unique_lcp0(gsa_np, lcp64, el)
    l0_nat = native.unique_lcp0_32(gsa_nat, lcp16, el)
    np.testing.assert_array_equal(l0_nat.astype(np.int64), l0_np)
    occ_np = occ_unique(sa, gsa_np, lcp64, l0_np)
    occ_nat = native.occ_unique_u8(sa, gsa_nat, lcp16, l0_nat)
    np.testing.assert_array_equal(occ_nat.astype(np.int64), occ_np)
    mu_np = min_unique(sa, l0_np, n)
    mu_nat = native.min_unique_u16(sa, l0_nat, n)
    np.testing.assert_array_equal(mu_nat.astype(np.int64), mu_np)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sweeps_match_numpy_doubly(seed):
    if not native.has_sweeps():
        pytest.skip("sweeps not built")
    from cammiq_tpu.index.unique import (
        compute_gsa, doubly_lcp0, min_unique, occ_doubly,
    )
    from cammiq_tpu.ops.lcp import lcp_from_sa_numpy

    rng = np.random.default_rng(200 + seed)
    corpus, sa = _pipeline_arrays(rng, num_genomes=5, glen=350)
    n = corpus.n
    lcp64 = lcp_from_sa_numpy(corpus.seq[:n], sa)
    lcp16 = native.kasai_u16(corpus.seq[:n], sa)
    gsa_np = compute_gsa(sa, corpus.ref_pos, corpus.ref_id)
    gsa_nat = native.gsa32(sa, corpus.ref_pos, corpus.ref_id)
    el, ulmax = 11, 100
    d_np = doubly_lcp0(sa, gsa_np, lcp64, el, ulmax)
    l0_nat, g2_nat = native.doubly_lcp0_32(sa, gsa_nat, lcp16, el, ulmax)
    np.testing.assert_array_equal(l0_nat.astype(np.int64), d_np.lcp0)
    np.testing.assert_array_equal(g2_nat.astype(np.int64), d_np.gsa2)
    occ_np, occ2_np = occ_doubly(sa, gsa_np, d_np.gsa2, lcp64, d_np.lcp0, ulmax)
    occ_nat, occ2_nat = native.occ_doubly_u8(sa, gsa_nat, g2_nat, lcp16,
                                             l0_nat, ulmax)
    np.testing.assert_array_equal(occ_nat.astype(np.int64), occ_np)
    np.testing.assert_array_equal(occ2_nat.astype(np.int64), occ2_np)
    mu_np = min_unique(sa, d_np.lcp0, n, ulmax=ulmax)
    mu_nat = native.min_unique_u16(sa, l0_nat, n, ulmax=ulmax)
    np.testing.assert_array_equal(mu_nat.astype(np.int64), mu_np)


def test_builder_native_engine_matches_numpy(rng):
    """build_index(engine='native') (SA-IS + C++ sweeps) must produce the
    same indexes as engine='numpy'."""
    if not native.has_sweeps():
        pytest.skip("sweeps not built")
    from cammiq_tpu.config import BuildConfig
    from cammiq_tpu.index.builder import build_index
    from cammiq_tpu.io.fasta import corpus_from_sequences

    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    shared = rng.integers(0, 4, size=150)
    genomes = []
    for g in range(5):
        own = rng.integers(0, 4, size=400)
        ins = int(rng.integers(0, 399))
        seq = np.concatenate([own[:ins], shared, own[ins:]])
        genomes.append([alpha[seq].tobytes()])
    corpus = corpus_from_sequences(genomes)
    cfg = BuildConfig(k=14, L=80, Lmax=30, h=14, mode="both")
    a = build_index(corpus, cfg, engine="native")
    b = build_index(corpus, cfg, engine="numpy")
    for ia, ib in ((a.unique_index, b.unique_index),
                   (a.doubly_index, b.doubly_index)):
        assert ia.num_entries == ib.num_entries
        np.testing.assert_array_equal(ia.key_words, ib.key_words)
        np.testing.assert_array_equal(ia.length, ib.length)
        np.testing.assert_array_equal(ia.rid1, ib.rid1)
        np.testing.assert_array_equal(ia.rid2, ib.rid2)
        np.testing.assert_array_equal(ia.ucount1, ib.ucount1)
        np.testing.assert_array_equal(ia.ucount2, ib.ucount2)
    np.testing.assert_array_equal(a.ulm_count_u, b.ulm_count_u)
    np.testing.assert_array_equal(a.ulm_count_d, b.ulm_count_d)


@pytest.mark.parametrize("ng,cls,groups,doubly", [
    (3, [[200], [150], [300]], 1, False),
    (4, [[80, 90], [120], [60, 70, 50]], 2, False),
    (6, [[100, 40], [200]], 3, True),
    (5, [[30, 35, 28], [90]], 2, False),
])
def test_native_select_matches_fast(rng, ng, cls, groups, doubly):
    """cammiq_select sweep == numpy fast/exact selection engines."""
    if not native.has_sweeps():
        pytest.skip("sweeps not built")
    from cammiq_tpu.index.sparsify import (
        select_substrings, select_substrings_fast,
    )
    from cammiq_tpu.index.unique import (
        compute_gsa, doubly_lcp0, min_unique, occ_doubly, occ_unique,
        unique_lcp0,
    )
    from cammiq_tpu.io.fasta import corpus_from_sequences
    from cammiq_tpu.ops.lcp import lcp_from_sa_numpy
    from cammiq_tpu.ops.sa import suffix_array_numpy

    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    shared = rng.integers(0, 4, size=60)
    genomes = []
    for g in range(ng):
        contigs = []
        for cl in cls[g % len(cls)]:
            own = rng.integers(0, 4, size=cl)
            ins = int(rng.integers(0, max(cl - 1, 1)))
            seq = np.concatenate([own[:ins], shared[: cl // 2], own[ins:]])
            contigs.append(alpha[seq].tobytes())
        genomes.append(contigs)
    corpus = corpus_from_sequences(genomes)
    s = corpus.seq
    sa = suffix_array_numpy(s)
    lcp = lcp_from_sa_numpy(s, sa)
    gsa = compute_gsa(sa, corpus.ref_pos, corpus.ref_id)
    L, Lmax, k = 60, 30, 12
    n = len(s)
    if doubly:
        d = doubly_lcp0(sa, gsa, lcp, k - 1, L)
        occ, occ2 = occ_doubly(sa, gsa, d.gsa2, lcp, d.lcp0, L)
        mu = min_unique(sa, d.lcp0, n, ulmax=L)
        kw = dict(gsa2_text=d.gsa2, occ2=occ2)
    else:
        lcp0 = unique_lcp0(gsa, lcp, k - 1)
        occ = occ_unique(sa, gsa, lcp, lcp0)
        mu = min_unique(sa, lcp0, n)
        kw = {}
    a = select_substrings(corpus, mu, occ, L, Lmax, num_groups=groups, **kw)
    b = select_substrings_fast(corpus, mu, occ, L, Lmax, num_groups=groups, **kw)
    np.testing.assert_array_equal(a.start, b.start)
    np.testing.assert_array_equal(a.length, b.length)
    np.testing.assert_array_equal(a.rid, b.rid)
    np.testing.assert_array_equal(a.occ, b.occ)
    np.testing.assert_array_equal(a.rid2, b.rid2)
    np.testing.assert_array_equal(a.occ2, b.occ2)
    np.testing.assert_array_equal(a.ulm_count, b.ulm_count)
