"""Depth-bounded suffix sort (native/bsort.cpp) vs the full sort.

Two layers of evidence:
1. order tests: the bounded SA is a permutation of [0, n) whose order
   agrees with the true suffix array on the first `depth` bytes
   (including the shorter-suffix-first end-of-text rule), and the
   bounded LCP equals the true adjacent LCP clamped at `depth`;
2. pipeline tests: build_index with bounded_sa=True produces the same
   FlatIndex contents and ulm counts as bounded_sa=False on corpora
   engineered to stress the bound (shared repeats longer than the
   depth, repeats adjacent to contig boundaries, strain families).
"""

import numpy as np
import pytest

from cammiq_tpu import native
from cammiq_tpu.config import BuildConfig
from cammiq_tpu.index.builder import build_index
from cammiq_tpu.io.fasta import corpus_from_sequences
from cammiq_tpu.ops.sa import suffix_array_numpy

pytestmark = pytest.mark.skipif(
    not (native.available() and native.has_bsort()),
    reason="native bounded sort not built",
)

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def window_rows(seq: np.ndarray, sa: np.ndarray, depth: int) -> np.ndarray:
    """[len(sa), depth+1] int16 rows: the first `depth` bytes of each
    suffix, -1 past the end of text, with a final remaining-length
    tiebreak column replicating the virtual-sentinel rule."""
    n = seq.shape[0]
    idx = sa[:, None] + np.arange(depth)[None, :]
    inb = idx < n
    rows = np.full((sa.shape[0], depth + 1), -1, dtype=np.int32)
    rows[:, :depth] = np.where(inb, seq[np.minimum(idx, n - 1)].astype(np.int32), -1)
    # suffixes shorter than depth: all are prefixes of... the tiebreak is
    # already encoded by the -1 padding (shorter => -1 earlier => smaller)
    rows[:, depth] = 0
    return rows


def assert_bounded_order(seq: np.ndarray, depth: int):
    n = seq.shape[0]
    bsa = native.bounded_sa(seq, depth)
    assert sorted(bsa.tolist()) == list(range(n)), "not a permutation"
    tsa = suffix_array_numpy(seq)[:n]
    rb = window_rows(seq, bsa, depth)
    rt = window_rows(seq, tsa, depth)
    np.testing.assert_array_equal(rb, rt)
    # bounded LCP == true adjacent LCP (of the bounded order) clamped
    blcp = native.bounded_lcp_u16(seq, bsa, depth)
    assert blcp[0] == 0 and blcp[n] == 0
    exp = np.zeros(n, dtype=np.int64)
    for r in range(1, n):
        a, b = int(bsa[r - 1]), int(bsa[r])
        h = 0
        while a + h < n and b + h < n and h < depth and seq[a + h] == seq[b + h]:
            h += 1
        exp[r] = h
    np.testing.assert_array_equal(blcp[:n].astype(np.int64), exp)


def test_order_random_small():
    rng = np.random.default_rng(0)
    seq = ALPHA[rng.integers(0, 4, size=3000)].copy()
    assert_bounded_order(seq, depth=128)


def test_order_with_separators_and_zeros():
    # corpus-like bytes: base runs + 4-byte separators including 0 bytes
    rng = np.random.default_rng(1)
    parts = []
    for c in range(6):
        parts.append(ALPHA[rng.integers(0, 4, size=400)])
        parts.append(np.array([0, 0, c // 128, c % 128], dtype=np.uint8))
    seq = np.concatenate(parts)
    assert_bounded_order(seq, depth=128)


def test_order_deep_repeats_and_ties():
    # repeats far longer than the depth bound -> large tie groups
    rng = np.random.default_rng(2)
    unit = ALPHA[rng.integers(0, 4, size=300)]
    seq = np.concatenate([np.tile(unit, 20),
                          ALPHA[rng.integers(0, 4, size=500)],
                          np.tile(unit, 7)])
    assert_bounded_order(seq, depth=96)


def test_order_iupac_bytes():
    # non-ACGT letters (N etc. at ASCII+165) land between base values and
    # must interleave exactly
    rng = np.random.default_rng(3)
    seq = ALPHA[rng.integers(0, 4, size=4000)].copy()
    pos = rng.choice(4000, size=120, replace=False)
    iupac = np.frombuffer(b"NRYWSKMBDHVU", dtype=np.uint8)
    seq[pos] = iupac[rng.integers(0, len(iupac), size=120)]
    assert_bounded_order(seq, depth=128)


def test_order_end_of_text():
    # short text: every suffix shorter than the bound
    rng = np.random.default_rng(4)
    seq = ALPHA[rng.integers(0, 2, size=60)].copy()
    assert_bounded_order(seq, depth=128)


def make_adversarial_genomes(rng, num=8, glen=6000, repeat_len=800):
    """Genomes sharing a repeat much longer than the sort depth, including
    placements flush against contig ends (the skipped-candidate boundary
    bookkeeping corner)."""
    shared = rng.integers(0, 4, size=repeat_len)
    genomes = []
    for g in range(num):
        own = rng.integers(0, 4, size=glen)
        if g % 3 == 0:
            own[:repeat_len] = shared            # repeat at contig start
        elif g % 3 == 1:
            own[-repeat_len:] = shared           # repeat flush at contig end
        else:
            at = int(rng.integers(0, glen - repeat_len))
            own[at:at + repeat_len] = shared
        genomes.append([ALPHA[own].tobytes()])
    return genomes


def _flat_eq(a, b):
    assert (a is None) == (b is None)
    if a is None:
        return
    np.testing.assert_array_equal(a.key_words, b.key_words)
    np.testing.assert_array_equal(a.length, b.length)
    np.testing.assert_array_equal(a.rid1, b.rid1)
    np.testing.assert_array_equal(a.rid2, b.rid2)
    np.testing.assert_array_equal(a.ucount1, b.ucount1)
    np.testing.assert_array_equal(a.ucount2, b.ucount2)
    np.testing.assert_array_equal(a.table_start, b.table_start)
    np.testing.assert_array_equal(a.table_count, b.table_count)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_index_equality_adversarial(seed):
    rng = np.random.default_rng(seed)
    genomes = make_adversarial_genomes(rng)
    corpus = corpus_from_sequences(genomes)
    cfg_b = BuildConfig(k=11, L=36, Lmax=24, h=11, mode="both", bounded_sa=True)
    cfg_f = BuildConfig(k=11, L=36, Lmax=24, h=11, mode="both", bounded_sa=False)
    art_b = build_index(corpus, cfg_b, engine="native")
    art_f = build_index(corpus, cfg_f, engine="native")
    _flat_eq(art_b.unique_index, art_f.unique_index)
    _flat_eq(art_b.doubly_index, art_f.doubly_index)
    np.testing.assert_array_equal(art_b.ulm_count_u, art_f.ulm_count_u)
    np.testing.assert_array_equal(art_b.ulm_count_d, art_f.ulm_count_d)


def test_index_equality_strain_family():
    # 99% identical strains: megabase-scale shared backbone analog
    rng = np.random.default_rng(7)
    base = rng.integers(0, 4, size=20000)
    genomes = []
    for g in range(6):
        v = base.copy()
        pos = rng.choice(v.shape[0], size=200, replace=False)
        v[pos] = (v[pos] + rng.integers(1, 4, size=200)) % 4
        genomes.append([ALPHA[v].tobytes()])
    corpus = corpus_from_sequences(genomes)
    cfg_b = BuildConfig(k=11, L=36, Lmax=24, h=11, mode="both", bounded_sa=True)
    cfg_f = BuildConfig(k=11, L=36, Lmax=24, h=11, mode="both", bounded_sa=False)
    art_b = build_index(corpus, cfg_b, engine="native")
    art_f = build_index(corpus, cfg_f, engine="native")
    _flat_eq(art_b.unique_index, art_f.unique_index)
    _flat_eq(art_b.doubly_index, art_f.doubly_index)
    np.testing.assert_array_equal(art_b.ulm_count_u, art_f.ulm_count_u)
    np.testing.assert_array_equal(art_b.ulm_count_d, art_f.ulm_count_d)
