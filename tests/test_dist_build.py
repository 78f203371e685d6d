"""Cross-host sharded SA construction (parallel/dist_build.py) must
produce an index IDENTICAL to the single-host bounded-sort build."""

import numpy as np
import pytest

from cammiq_tpu import native
from cammiq_tpu.config import BuildConfig
from cammiq_tpu.index.builder import build_index
from cammiq_tpu.io.fasta import corpus_from_sequences

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)

pytestmark = pytest.mark.skipif(
    not (native.available() and native.has_bsort()),
    reason="native bounded sort not built",
)


def _corpus(num=6, glen=3000, seed=7):
    """Genomes with a shared segment so repeats cross slice boundaries
    and unique/doubly/multi content all exist."""
    rng = np.random.default_rng(seed)
    shared = rng.integers(0, 4, 600)
    genomes = []
    for g in range(num):
        own = rng.integers(0, 4, glen)
        ins = int(rng.integers(0, glen - 600))
        seq = np.concatenate([own[:ins], shared, own[ins:]])
        genomes.append([ALPHA[seq].tobytes()])
    return corpus_from_sequences(genomes)


def _index_tuple(idx):
    if idx is None:
        return None
    order = np.lexsort(
        tuple(idx.key_words[:, c] for c in range(idx.kw - 1, -1, -1))
        + (idx.length, idx.rid1, idx.rid2)
    )
    return tuple(
        np.asarray(a)[order].tobytes()
        for a in (idx.key_words, idx.length, idx.rid1, idx.rid2,
                  idx.ucount1, idx.ucount2)
    )


def test_dist_sa_is_valid_bounded_order():
    """The merged SA must be a permutation in bounded-key order, with the
    single-host SA's exact key sequence (ties may permute)."""
    from cammiq_tpu.parallel.dist_build import _pack_keys, dist_bounded_sa

    corpus = _corpus()
    depth = 102
    seq = corpus.seq
    sa1 = native.bounded_sa(seq, depth)
    sa2 = dist_bounded_sa(seq, depth, hosts=3, processes=False)
    assert sorted(sa2) == sorted(sa1)
    w1, l1 = _pack_keys(seq, sa1, depth)
    w2, l2 = _pack_keys(seq, sa2, depth)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(l1, l2)


@pytest.mark.parametrize("hosts", [2, 3])
def test_dist_build_identical_index(hosts):
    corpus = _corpus()
    cfg = BuildConfig(k=14, L=80, Lmax=40, h=14, mode="both")
    ref = build_index(corpus, cfg, engine="native")
    got = build_index(corpus, cfg, engine="native", sa_hosts=hosts)
    assert _index_tuple(got.unique_index) == _index_tuple(ref.unique_index)
    assert _index_tuple(got.doubly_index) == _index_tuple(ref.doubly_index)
    np.testing.assert_array_equal(got.ulm_count_u, ref.ulm_count_u)
    np.testing.assert_array_equal(got.ulm_count_d, ref.ulm_count_d)


def test_dist_build_processes():
    """2 real worker processes, each handed only its subtext bytes."""
    from cammiq_tpu.parallel.dist_build import dist_bounded_sa

    corpus = _corpus(num=3, glen=2000)
    depth = 102
    sa1 = native.bounded_sa(corpus.seq, depth)
    sa2 = dist_bounded_sa(corpus.seq, depth, hosts=2, processes=True)
    from cammiq_tpu.parallel.dist_build import _pack_keys

    w1, l1 = _pack_keys(corpus.seq, sa1, depth)
    w2, l2 = _pack_keys(corpus.seq, sa2, depth)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(l1, l2)
