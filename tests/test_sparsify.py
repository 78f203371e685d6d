"""Vectorized sparsify must match the scalar reference transcription."""

import numpy as np
import pytest

from cammiq_tpu.config import BuildConfig
from cammiq_tpu.index.sparsify import (
    select_substrings_exact,
    select_substrings_fast,
)
from cammiq_tpu.index.unique import (
    compute_gsa, doubly_lcp0, min_unique, occ_doubly, occ_unique, unique_lcp0,
)
from cammiq_tpu.io.fasta import corpus_from_sequences
from cammiq_tpu.ops.lcp import lcp_from_sa_numpy
from cammiq_tpu.ops.sa import suffix_array_numpy

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_corpus(rng, num_genomes, contig_lens, shared_frac=0.3):
    shared = rng.integers(0, 4, size=40)
    genomes = []
    for g in range(num_genomes):
        contigs = []
        for cl in contig_lens[g % len(contig_lens)]:
            own = rng.integers(0, 4, size=cl)
            if cl > 60 and rng.random() < 0.8:
                ins = int(rng.integers(0, cl - 41))
                own = np.concatenate([own[:ins], shared, own[ins:]])
            contigs.append(ALPHA[own].tobytes())
        genomes.append(contigs)
    return corpus_from_sequences(genomes)


CASES = [
    (3, [[200], [150], [300]], 1, False),
    (3, [[200], [150], [300]], 1, True),
    (4, [[80, 90], [120], [60, 70, 50]], 1, False),
    (4, [[80, 90], [120], [60, 70, 50]], 2, False),
    (6, [[100, 40], [200]], 3, True),
    (5, [[30, 35, 28], [90]], 2, False),   # short contigs: boundary-heavy
]


@pytest.mark.parametrize("ng,cls,groups,doubly", CASES)
def test_fast_matches_exact(rng, ng, cls, groups, doubly):
    corpus = make_corpus(rng, ng, cls)
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
    a = select_substrings_exact(corpus, mu, occ, L, Lmax, num_groups=groups, **kw)
    b = select_substrings_fast(corpus, mu, occ, L, Lmax, num_groups=groups, **kw)
    np.testing.assert_array_equal(a.start, b.start)
    np.testing.assert_array_equal(a.length, b.length)
    np.testing.assert_array_equal(a.rid, b.rid)
    np.testing.assert_array_equal(a.occ, b.occ)
    np.testing.assert_array_equal(a.rid2, b.rid2)
    np.testing.assert_array_equal(a.occ2, b.occ2)
    np.testing.assert_array_equal(a.ulm_count, b.ulm_count)


def test_unique_if_advance_parity_mode(rng):
    """Bit-parity switch: the reference's unique sparsifier advances at
    most one contig boundary per candidate (`if`, src/build.cpp:362).
    With long contigs the two modes are identical; with contigs shorter
    than ~L the if-advance path executes and stays well-formed."""
    from cammiq_tpu.index.sparsify import select_substrings

    # long contigs: identical output
    corpus = make_corpus(rng, 3, [[200], [150], [300]])
    s = corpus.seq
    sa = suffix_array_numpy(s)
    lcp = lcp_from_sa_numpy(s, sa)
    gsa = compute_gsa(sa, corpus.ref_pos, corpus.ref_id)
    L, Lmax, k = 60, 30, 12
    lcp0 = unique_lcp0(gsa, lcp, k - 1)
    occ = occ_unique(sa, gsa, lcp, lcp0)
    mu = min_unique(sa, lcp0, len(s))
    a = select_substrings(corpus, mu, occ, L, Lmax)
    b = select_substrings(corpus, mu, occ, L, Lmax, unique_if_advance=True)
    np.testing.assert_array_equal(a.start, b.start)
    np.testing.assert_array_equal(a.ulm_count, b.ulm_count)

    # boundary-heavy corpus: tiny contigs force double-boundary jumps
    corpus = make_corpus(rng, 4, [[30, 25, 28, 22], [26, 24], [40, 20], [90]])
    s = corpus.seq
    sa = suffix_array_numpy(s)
    lcp = lcp_from_sa_numpy(s, sa)
    gsa = compute_gsa(sa, corpus.ref_pos, corpus.ref_id)
    lcp0 = unique_lcp0(gsa, lcp, k - 1)
    occ = occ_unique(sa, gsa, lcp, lcp0)
    mu = min_unique(sa, lcp0, len(s))
    b = select_substrings(corpus, mu, occ, L, Lmax, unique_if_advance=True)
    assert (b.length > 0).all() and (b.start >= 0).all()
    assert (b.start + b.length <= len(s)).all()
