"""Fwd-only sort-join correctness on RC-augmented prefix chains.

The forward-only probe folds every entry's reverse complement into the
merged index.  The augmented key set can violate prefix-freeness (RC(k1)
is a prefix of RC(k2) whenever k1 is a suffix of k2), contain palindromic
twins, and contain equal keys with different payloads (k in one genome,
RC(k) an entry of another).  These are handled by chain-coloring; this
test constructs all three cases and checks the sort-join output against
the 2-strand gather-probe baseline (classify_batch).
"""

import numpy as np
import pytest

from cammiq_tpu.index.sparsify import SelectedSubstrings
from cammiq_tpu.index.table import build_flat_index
from cammiq_tpu.ops.packing import SYMBOL_IDX
from cammiq_tpu.query.classify import classify_batch
from cammiq_tpu.query.probe import to_device_index
from cammiq_tpu.query.sortjoin import (
    _chain_colors,
    _revcomp_packed,
    build_merged_index,
    classify_batch_sortjoin,
    to_device_merged,
)

H = 5


def _mk_index(keys, rids, corpus_parts):
    """Build a FlatIndex whose entries are exactly `keys` (ASCII strings)."""
    corpus = np.frombuffer("".join(corpus_parts).encode(), np.uint8)
    starts, lens = [], []
    text = "".join(corpus_parts)
    for k in keys:
        p = text.find(k)
        assert p >= 0, k
        starts.append(p)
        lens.append(len(k))
    sel = SelectedSubstrings(
        start=np.asarray(starts, np.int64),
        length=np.asarray(lens, np.int64),
        rid=np.asarray(rids, np.int64),
        occ=np.ones(len(keys), np.int64),
        rid2=np.zeros(len(keys), np.int64),
        occ2=np.zeros(len(keys), np.int64),
        ulm_count=np.zeros(len(keys), np.int64),
    )
    return build_flat_index(corpus, sel, H, 16, is_doubly=False)


def _empty_doubly():
    sel = SelectedSubstrings(
        start=np.zeros(0, np.int64), length=np.zeros(0, np.int64),
        rid=np.zeros(0, np.int64), occ=np.zeros(0, np.int64),
        rid2=np.zeros(0, np.int64), occ2=np.zeros(0, np.int64),
        ulm_count=np.zeros(0, np.int64),
    )
    return build_flat_index(np.zeros(1, np.uint8), sel, H, 16, is_doubly=True)


def _reads(strings, Lp=24):
    B = len(strings)
    codes = np.zeros((B, Lp), np.int8)
    lengths = np.zeros(B, np.int32)
    for i, s in enumerate(strings):
        arr = SYMBOL_IDX[np.frombuffer(s.encode(), np.uint8)]
        codes[i, : len(s)] = arr
        lengths[i] = len(s)
    return codes, lengths


def test_revcomp_packed_roundtrip():
    rng = np.random.default_rng(0)
    kw = 2
    E = 50
    lens = rng.integers(H, kw * 16 + 1, size=E).astype(np.int32)
    codes = rng.integers(0, 4, size=(E, kw * 16))
    t = np.arange(kw * 16)
    codes = np.where(t[None, :] < lens[:, None], codes, 0)
    from cammiq_tpu.ops.packing import pack_words

    words = pack_words(codes, kw)
    rc = _revcomp_packed(words, lens, kw)
    rc2 = _revcomp_packed(rc, lens, kw)
    np.testing.assert_array_equal(words, rc2)


def test_chain_colors_separate_prefixes_and_dups():
    from cammiq_tpu.ops.packing import pack_words

    def enc(s):
        return SYMBOL_IDX[np.frombuffer(s.encode(), np.uint8)].astype(np.int64)

    kw = 2
    keys = ["CGGTT", "CGGTTA", "CGGTTAC", "CGGTTAC", "TTTTT"]
    maxl = kw * 16
    codes = np.zeros((len(keys), maxl), np.int64)
    lens = np.zeros(len(keys), np.int32)
    for i, k in enumerate(keys):
        codes[i, : len(k)] = enc(k)
        lens[i] = len(k)
    colors = _chain_colors(pack_words(codes, kw), lens, kw)
    # chain CGGTT < CGGTTA < CGGTTAC must get strictly increasing colors;
    # the duplicate CGGTTAC pair must differ; TTTTT is unrelated
    assert colors[0] < colors[1] < colors[2]
    assert colors[2] != colors[3] and colors[1] < colors[3]
    assert colors[4] == 0


@pytest.fixture(scope="module")
def chain_setup():
    # k1 = TAACCG is a suffix of k2 = GTAACCG, so RC(k1) = CGGTTA is a
    # prefix of RC(k2) = CGGTTAC (a chain in the augmented set).
    # pal = AACGTT is its own reverse complement (palindromic twin).
    # dup pair: k3 = ACGTAC (genome 3) and k4 = RC(k3) = GTACGT
    # (genome 4) collide as augmented keys with different payloads.
    keys = ["TAACCG", "GTAACCG", "AACGTT", "ACGTAC", "GTACGT"]
    rids = [1, 2, 1, 3, 4]
    idx_u = _mk_index(keys, rids, ["TAACCG", "GTAACCG", "AACGTT",
                                   "ACGTAC", "GTACGT"])
    idx_d = _empty_doubly()
    m = build_merged_index(idx_u, idx_d)
    assert m.n_colors >= 2  # the chains must actually exercise coloring
    return idx_u, idx_d, m


def test_chain_cases_match_baseline(chain_setup):
    import jax
    import jax.numpy as jnp

    idx_u, idx_d, m = chain_setup
    dm = to_device_merged(m)
    du, dd = to_device_index(idx_u), to_device_index(idx_d)
    G = 6

    reads = [
        "CGGTTACGGG",          # contains RC(k2) and RC(k1) at the SAME offset
        "GGGTAACCGGG",         # contains k1 and k2 (fwd)
        "AACGTTAAAA",          # palindrome
        "ACGTACGTAC",          # contains k3, RC(k3)=k4, k4, RC(k4)=k3 ...
        "TTTTTTTTTT",          # no match
        "CGGTTATTTT",          # RC(k1) only (chain shorter member alone)
    ]
    codes, lengths = _reads(reads)

    base = classify_batch(du, dd, jnp.asarray(codes), jnp.asarray(lengths), G)
    got, ovh, ovs = classify_batch_sortjoin(
        dm, jnp.asarray(codes), jnp.asarray(lengths), G)
    assert int(ovh) == 0 and int(ovs) == 0
    np.testing.assert_array_equal(np.asarray(got.cnts_u), np.asarray(base.cnts_u))
    np.testing.assert_array_equal(np.asarray(got.cnts_d), np.asarray(base.cnts_d))
    np.testing.assert_array_equal(
        np.asarray(got.rcount_u), np.asarray(base.rcount_u))
    assert int(got.nundet) == int(base.nundet)
    assert int(got.nconf) == int(base.nconf)


def test_tiny_batch_capacity_clamp(chain_setup):
    """Regression: K = max(N//frac, 256) used to exceed N+NB on tiny
    batches/indexes, crashing the compaction slice (round-1 red test)."""
    import jax.numpy as jnp

    idx_u, idx_d, m = chain_setup
    dm = to_device_merged(m)
    du, dd = to_device_index(idx_u), to_device_index(idx_d)
    G = 6

    # a single short read: N = B*O is far below 256
    codes, lengths = _reads(["CGGTTACGGG"], Lp=12)
    base = classify_batch(du, dd, jnp.asarray(codes), jnp.asarray(lengths), G)
    got, ovh, ovs = classify_batch_sortjoin(
        dm, jnp.asarray(codes), jnp.asarray(lengths), G)
    assert int(ovh) == 0 and int(ovs) == 0
    np.testing.assert_array_equal(np.asarray(got.cnts_u), np.asarray(base.cnts_u))
    np.testing.assert_array_equal(
        np.asarray(got.rcount_u), np.asarray(base.rcount_u))
