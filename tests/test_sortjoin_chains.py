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


def test_four_color_chain_bloom_equals_sort():
    """Force a 4-deep prefix chain (fwd-u ⊂ fwd-d ⊂ rc-u ⊂ rc-d) so
    n_colors >= 4 and the bucket scan's per-color select path (the
    production #5 regime, COLOR_SELECT_UNROLL) is equality-tested
    against the sort join — previously only n_colors=2 fixtures
    existed."""
    import dataclasses

    import jax.numpy as jnp

    from cammiq_tpu.index.table import build_flat_index_from_entries
    from cammiq_tpu.query.sortjoin import (build_merged_index,
                                           collect_matches_sortjoin,
                                           to_device_merged)

    rng = np.random.default_rng(123)
    h = 26
    comp = {0: 3, 1: 2, 2: 1, 3: 0}

    def rc(codes):
        return [comp[c] for c in reversed(codes)]

    def pack(codes, kw):
        w = [0] * kw
        for i, c in enumerate(codes):
            w[i // 16] |= (c & 3) << (2 * (i % 16))
        return w

    P1 = list(rng.integers(0, 4, h))
    P2 = P1 + [1, 2]                       # fwd doubly key, P1 prefix
    K3 = P2 + [0, 3]                       # = rc of a unique entry
    K4 = P2 + [0, 3, 2, 1]                 # = rc of a doubly entry
    u_keys = [P1, rc(K3)]
    d_keys = [P2, rc(K4)]
    # random filler so buckets/bloom have content
    for _ in range(40):
        u_keys.append(list(rng.integers(0, 4, int(rng.integers(h, 34)))))
    kw = 4
    def table(keys, is_doubly):
        words = np.asarray([pack(k, kw) for k in keys], np.uint32)
        lens = np.asarray([len(k) for k in keys], np.int64)
        n = len(keys)
        rid1 = np.arange(1, n + 1, dtype=np.int64)
        rid2 = (np.arange(2, n + 2, dtype=np.int64)
                if is_doubly else np.zeros(n, np.int64))
        uc = np.ones(n, np.int64)
        return build_flat_index_from_entries(
            words, lens, rid1, uc, rid2, uc, h, is_doubly)

    idx_u = table(u_keys, False)
    idx_d = table(d_keys, True)
    m = build_merged_index(idx_u, idx_d)
    assert m.n_colors >= 4, f"chain construction failed: {m.n_colors}"
    dm = to_device_merged(m)
    assert dm.cuckoo_kv is not None or dm.cuckoo is not None

    # reads embedding the chained strings (every chain member matches at
    # the same offset on some strand) + random filler
    B, L = 64, 100
    reads = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    for b, s in enumerate([K4, K3, P2, P1, rc(K4), rc(P1)] * 4):
        off = int(rng.integers(0, L - len(s)))
        reads[b, off:off + len(s)] = s
    lengths = np.full(B, L, np.int32)
    cd, ld = jnp.asarray(reads), jnp.asarray(lengths)

    a, ovh_a, _ = collect_matches_sortjoin(dm, cd, ld, join="bloom",
                                           hit_capacity_frac=1)
    dm_sort = dataclasses.replace(dm, bloom=None, cuckoo=None,
                                  cuckoo_kv=None, dir_start=None)
    b_, ovh_b, _ = collect_matches_sortjoin(dm_sort, cd, ld, join="sort",
                                            hit_capacity_frac=1)
    assert int(ovh_a) == 0 and int(ovh_b) == 0
    for f in ("slots", "rid1", "rid2", "in_u"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b_, f)),
                                      err_msg=f)
    # the deepest chain member must actually produce 4 distinct matches
    # at one offset for some read (the whole point of the colors)
    assert int((np.asarray(a.slots)[0] < (1 << 30)).sum()) >= 4
