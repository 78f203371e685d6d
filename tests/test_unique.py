"""Validate the vectorized uniqueness kernels against (a) scalar
reference-transcription oracles and (b) definition-level brute force."""

import numpy as np
import pytest

from cammiq_tpu.index.unique import (
    MU_EMPTY,
    compute_gsa,
    doubly_lcp0,
    min_unique,
    occ_doubly,
    occ_unique,
    unique_lcp0,
)
from cammiq_tpu.io.fasta import corpus_from_sequences
from cammiq_tpu.ops.lcp import lcp_from_sa_numpy
from cammiq_tpu.ops.sa import suffix_array_numpy

from oracle import (
    oracle_genomes_containing,
    oracle_unique_lcp0,
    substring_at,
)
from ref_oracle import (
    ref_doubly_lcp0,
    ref_occ_doubly,
    ref_occ_unique,
    ref_unique_lcp0,
)


def make_corpus(rng, num_genomes=3, contig_len=120, contigs_per_genome=1,
                shared_frac=0.3):
    """Random genomes with some shared sequence to create non-trivial
    LCP structure."""
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    shared = rng.integers(0, 4, size=int(contig_len * shared_frac))
    genomes = []
    for g in range(num_genomes):
        contigs = []
        for c in range(contigs_per_genome):
            own = rng.integers(0, 4, size=contig_len)
            ins = int(rng.integers(0, max(1, contig_len - len(shared))))
            seq = np.concatenate([own[:ins], shared, own[ins:]])
            contigs.append(alpha[seq].tobytes())
        genomes.append(contigs)
    return corpus_from_sequences(genomes)


def pipeline(corpus):
    s = corpus.seq
    sa = suffix_array_numpy(s)
    lcp = lcp_from_sa_numpy(s, sa)
    gsa = compute_gsa(sa, corpus.ref_pos, corpus.ref_id)
    return s, sa, lcp, gsa


CASES = [(2, 80, 1, 0.2), (3, 120, 1, 0.3), (4, 60, 2, 0.4), (2, 200, 1, 0.6)]


@pytest.mark.parametrize("ng,cl,cpg,sf", CASES)
def test_unique_lcp0_matches_ref(rng, ng, cl, cpg, sf):
    corpus = make_corpus(rng, ng, cl, cpg, sf)
    s, sa, lcp, gsa = pipeline(corpus)
    el = 9
    got = unique_lcp0(gsa, lcp, el)
    want = ref_unique_lcp0(gsa, lcp, el)
    np.testing.assert_array_equal(got, want)


def test_unique_lcp0_matches_definition(rng):
    corpus = make_corpus(rng, 3, 100, 1, 0.3)
    s, sa, lcp, gsa = pipeline(corpus)
    got = unique_lcp0(gsa, lcp, el=5)
    want = oracle_unique_lcp0(s, sa, gsa, el=5)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ng,cl,cpg,sf", CASES)
def test_doubly_lcp0_matches_ref(rng, ng, cl, cpg, sf):
    corpus = make_corpus(rng, ng, cl, cpg, sf)
    s, sa, lcp, gsa = pipeline(corpus)
    el, ulmax = 9, 100
    got = doubly_lcp0(sa, gsa, lcp, el, ulmax)
    want_lcp0, want_gsa2 = ref_doubly_lcp0(sa, gsa, lcp, el, ulmax)
    np.testing.assert_array_equal(got.lcp0, want_lcp0)
    np.testing.assert_array_equal(got.gsa2, want_gsa2)


@pytest.mark.parametrize("ng,cl,cpg,sf", CASES)
def test_occ_unique_matches_ref(rng, ng, cl, cpg, sf):
    corpus = make_corpus(rng, ng, cl, cpg, sf)
    s, sa, lcp, gsa = pipeline(corpus)
    lcp0 = unique_lcp0(gsa, lcp, el=9)
    got = occ_unique(sa, gsa, lcp, lcp0)
    want = ref_occ_unique(sa, gsa, lcp, lcp0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ng,cl,cpg,sf", CASES)
def test_occ_doubly_matches_ref(rng, ng, cl, cpg, sf):
    corpus = make_corpus(rng, ng, cl, cpg, sf)
    s, sa, lcp, gsa = pipeline(corpus)
    el, ulmax = 9, 100
    d = doubly_lcp0(sa, gsa, lcp, el, ulmax)
    got_occ, got_occ2 = occ_doubly(sa, gsa, d.gsa2, lcp, d.lcp0, ulmax)
    want_occ, want_occ2 = ref_occ_doubly(sa, gsa, d.gsa2, lcp, d.lcp0, ulmax)
    np.testing.assert_array_equal(got_occ, want_occ)
    np.testing.assert_array_equal(got_occ2, want_occ2)


def test_min_unique_scatter(rng):
    corpus = make_corpus(rng, 3, 100, 1, 0.3)
    s, sa, lcp, gsa = pipeline(corpus)
    lcp0 = unique_lcp0(gsa, lcp, el=9)
    n = len(s)
    mu = min_unique(sa, lcp0, n)
    # definition: mu[e] = min lcp0 over ranks whose substring ends at e
    want = np.full(n + 1, MU_EMPTY, dtype=np.int64)
    for i in range(n):
        tgt = sa[i] + lcp0[i] + 1
        if tgt <= n:
            want[tgt] = min(want[tgt], lcp0[i])
    np.testing.assert_array_equal(mu, want)


def test_unique_substrings_are_unique(rng):
    """Property: a substring of natural (non-el-floored, non-edge) LCP0+1
    length occurs in exactly one genome, and its 1-shorter prefix occurs in
    more than one."""
    corpus = make_corpus(rng, 3, 150, 1, 0.4)
    s, sa, lcp, gsa = pipeline(corpus)
    el = 0  # no floor, pure structure
    lcp0 = unique_lcp0(gsa, lcp, el)
    checked = 0
    for i in range(0, len(sa), 7):
        l = int(lcp0[i]) + 1
        p = int(sa[i])
        if p + l > len(s) or l <= 1:
            continue
        sub = substring_at(s, p, l)
        gs = oracle_genomes_containing(s, sub, corpus.ref_pos, corpus.ref_id)
        assert gs == {int(gsa[i])}, f"rank {i}: {sub} in {gs}"
        shorter = substring_at(s, p, l - 1)
        gs2 = oracle_genomes_containing(s, shorter, corpus.ref_pos, corpus.ref_id)
        assert len(gs2) >= 1
        # minimality: the shorter prefix must hit another genome, unless
        # lcp0 came from an edge run (first/last run one-sided rules)
        checked += 1
    assert checked > 10


def test_doubly_substrings_hit_exactly_two(rng):
    """Property: valid (non-sentinel, non-first-run) doubly-unique
    substrings occur in exactly the two genomes {g, g2}."""
    corpus = make_corpus(rng, 4, 150, 1, 0.5)
    s, sa, lcp, gsa = pipeline(corpus)
    el, ulmax = 0, 10**9
    d = doubly_lcp0(sa, gsa, lcp, el, ulmax)
    from cammiq_tpu.index.unique import run_info

    runs = run_info(gsa)
    checked = 0
    for i in range(len(sa)):
        if runs.rid[i] == 0:
            continue  # first run keeps unvalidated forward values
        l = int(d.lcp0[i]) + 1
        if d.lcp0[i] >= ulmax or l <= 1:
            continue
        p = int(sa[i])
        if p + l > len(s):
            continue
        sub = substring_at(s, p, l)
        gs = oracle_genomes_containing(s, sub, corpus.ref_pos, corpus.ref_id)
        g2 = int(d.gsa2[p])
        assert gs == {int(gsa[i]), g2}, f"rank {i}: {sub} -> {gs} vs ({gsa[i]},{g2})"
        checked += 1
    assert checked > 5


def test_occ_unique_wrap_u8(rng):
    """Bit-parity mode: occ counts wrap mod 256 like the reference's
    uint8 counters (src/gsa.cpp:546).  A 300x-repeated pattern drives the
    count past 255."""
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    rep = alpha[rng.integers(0, 4, 7)].tobytes()
    g1 = rep * 300 + alpha[rng.integers(0, 4, 64)].tobytes()
    g2 = alpha[rng.integers(0, 4, 256)].tobytes()
    from cammiq_tpu.io.fasta import corpus_from_sequences

    corpus = corpus_from_sequences([[g1], [g2]])
    n = corpus.n
    sa = suffix_array_numpy(corpus.seq)[:n]
    lcp = lcp_from_sa_numpy(corpus.seq, sa)
    gsa = compute_gsa(sa, corpus.ref_pos, corpus.ref_id)
    lcp0 = unique_lcp0(gsa, lcp, 4)
    occ_sat = occ_unique(sa, gsa, lcp, lcp0)
    occ_wrap = occ_unique(sa, gsa, lcp, lcp0, wrap_u8=True)
    # reference scalar oracle counts in unbounded ints
    ref = ref_occ_unique(sa, gsa, lcp, lcp0)
    np.testing.assert_array_equal(occ_sat, np.minimum(ref, 255))
    np.testing.assert_array_equal(occ_wrap, ref & 0xFF)
    assert (occ_sat == 255).any(), "test corpus must exceed 255 occurrences"
    assert (occ_wrap != occ_sat).any()
