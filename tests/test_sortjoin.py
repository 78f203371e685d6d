"""Sort-join probe must match the baseline gather probe exactly."""

import numpy as np
import pytest

from cammiq_tpu.config import BuildConfig, QueryConfig
from cammiq_tpu.index.builder import build_index
from cammiq_tpu.io.fasta import corpus_from_sequences
from cammiq_tpu.io.fastq import reads_from_arrays
from cammiq_tpu.query.pipeline import QuerySession
from cammiq_tpu.query.sortjoin import (
    build_merged_index,
    classify_batch_sortjoin,
    to_device_merged,
)

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(9)
    shared = rng.integers(0, 4, 150)
    genomes = []
    for g in range(5):
        own = rng.integers(0, 4, 500)
        ins = int(rng.integers(0, 350))
        seq = np.concatenate([own[:ins], shared, own[ins:]])
        genomes.append([ALPHA[seq].tobytes()])
    corpus = corpus_from_sequences(genomes)
    art = build_index(corpus, BuildConfig(k=12, L=60, Lmax=30, h=12, mode="both"),
                      engine="numpy")
    reads = []
    for _ in range(300):
        g = int(rng.integers(0, 5))
        c = genomes[g][0]
        p = int(rng.integers(0, len(c) - 60))
        r = bytearray(c[p : p + 60])
        if rng.random() < 0.5:
            comp = {65: 84, 67: 71, 71: 67, 84: 65}
            r = bytearray(comp[b] for b in reversed(r))
        for i in range(60):
            if rng.random() < 0.02:
                r[i] = int(ALPHA[rng.integers(0, 4)])
        reads.append(bytes(r))
    rs = reads_from_arrays(reads, max_len=64)
    G = int(corpus.ref_id.max()) + 1
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=12, batch_size=512))
    ref = sess.run(rs, sc_mode=False)
    ref_sc = sess.run(rs, sc_mode=True)
    return art, rs, G, ref, ref_sc


@pytest.mark.parametrize("sc", [False, True])
def test_sortjoin_matches_baseline(setup, sc):
    import jax
    import jax.numpy as jnp

    art, rs, G, ref, ref_sc = setup
    m = build_merged_index(art.unique_index, art.doubly_index)
    dm = to_device_merged(m)
    out, ovh, ovs = jax.jit(
        lambda c, l: classify_batch_sortjoin(
            dm, c, l, G, with_rcounts=not sc, sc_mode=sc)
    )(jnp.asarray(rs.codes), jnp.asarray(rs.lengths))
    assert int(ovh) == 0 and int(ovs) == 0
    want = ref_sc if sc else ref
    np.testing.assert_array_equal(np.asarray(out.cnts_u), want.cnts_u)
    np.testing.assert_array_equal(np.asarray(out.cnts_d), want.cnts_d)
    assert int(out.nundet) == want.nundet
    assert int(out.nconf) == want.nconf
    if not sc:
        np.testing.assert_array_equal(np.asarray(out.rcount_u), ref.rcount_u)
        np.testing.assert_array_equal(np.asarray(out.rcount_d), ref.rcount_d)
    else:
        lo = np.asarray(out.pair_lo)
        hi = np.asarray(out.pair_hi)
        got = {}
        for a, b in zip(lo[lo >= 0], hi[lo >= 0]):
            got[(int(a), int(b))] = got.get((int(a), int(b)), 0) + 1
        assert got == ref_sc.pair_counts


def test_unique_only(setup):
    import jax
    import jax.numpy as jnp

    art, rs, G, ref, ref_sc = setup
    m = build_merged_index(art.unique_index, None)
    dm = to_device_merged(m)
    out, ovh, ovs = jax.jit(
        lambda c, l: classify_batch_sortjoin(dm, c, l, G)
    )(jnp.asarray(rs.codes), jnp.asarray(rs.lengths))
    sess = QuerySession(art.unique_index, None, G, QueryConfig(h=12, batch_size=512))
    want = sess.run(rs)
    np.testing.assert_array_equal(np.asarray(out.cnts_u), want.cnts_u)
    np.testing.assert_array_equal(np.asarray(out.rcount_u), want.rcount_u)


def test_session_sortjoin_engine(setup):
    art, rs, G, ref, ref_sc = setup
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=12, batch_size=512), engine="sortjoin")
    got = sess.run(rs)
    np.testing.assert_array_equal(got.cnts_u, ref.cnts_u)
    np.testing.assert_array_equal(got.cnts_d, ref.cnts_d)
    np.testing.assert_array_equal(got.rcount_u, ref.rcount_u)
    np.testing.assert_array_equal(got.rcount_d, ref.rcount_d)
    got_sc = sess.run(rs, sc_mode=True)
    assert got_sc.pair_counts == ref_sc.pair_counts


def test_dir_join_matches_sort_join():
    """The directory + binary-search join (large-index regime) must
    produce exactly the same matches as the 2-operand sort join."""
    import jax.numpy as jnp

    from dist_fixture import make_dist_fixture
    from cammiq_tpu.query.sortjoin import (
        build_merged_index, collect_matches_sortjoin, to_device_merged,
    )

    art, rs, G = make_dist_fixture(seed=11)
    dm = to_device_merged(build_merged_index(art.unique_index, art.doubly_index))
    codes = jnp.asarray(rs.codes)
    lengths = jnp.asarray(rs.lengths)
    a, ovh_a, ovs_a = collect_matches_sortjoin(dm, codes, lengths, join="sort", hit_capacity_frac=1)
    b, ovh_b, ovs_b = collect_matches_sortjoin(dm, codes, lengths, join="dir", hit_capacity_frac=1)
    assert int(ovh_a) == 0 and int(ovh_b) == 0
    np.testing.assert_array_equal(np.asarray(a.slots), np.asarray(b.slots))
    np.testing.assert_array_equal(np.asarray(a.rid1), np.asarray(b.rid1))
    np.testing.assert_array_equal(np.asarray(a.rid2), np.asarray(b.rid2))
    np.testing.assert_array_equal(np.asarray(a.in_u), np.asarray(b.in_u))


def test_bloom_join_matches_sort_join():
    """The bloom-prefiltered directory join (production large-index path)
    must produce exactly the same matches as the 2-operand sort join and
    the pure directory join."""
    import jax.numpy as jnp

    from dist_fixture import make_dist_fixture
    from cammiq_tpu.query.sortjoin import (
        build_merged_index, collect_matches_sortjoin, to_device_merged,
    )

    art, rs, G = make_dist_fixture(seed=13)
    dm = to_device_merged(build_merged_index(art.unique_index, art.doubly_index))
    assert dm.bloom is not None
    codes = jnp.asarray(rs.codes)
    lengths = jnp.asarray(rs.lengths)
    a, ovh_a, _ = collect_matches_sortjoin(dm, codes, lengths, join="sort",
                                           hit_capacity_frac=1)
    b, ovh_b, _ = collect_matches_sortjoin(dm, codes, lengths, join="bloom",
                                           hit_capacity_frac=1)
    assert int(ovh_a) == 0 and int(ovh_b) == 0
    np.testing.assert_array_equal(np.asarray(a.slots), np.asarray(b.slots))
    np.testing.assert_array_equal(np.asarray(a.rid1), np.asarray(b.rid1))
    np.testing.assert_array_equal(np.asarray(a.rid2), np.asarray(b.rid2))
    np.testing.assert_array_equal(np.asarray(a.in_u), np.asarray(b.in_u))


@pytest.mark.parametrize("sc", [False, True])
def test_expanded_bucket_scan_matches_baseline(setup, sc, monkeypatch):
    """Force the segment-expanded bucket scan (the production path when
    max_bucket exceeds the unroll cutover) and require exact equality."""
    import jax
    import jax.numpy as jnp

    import cammiq_tpu.query.sortjoin as sj

    monkeypatch.setattr(sj, "BUCKET_SCAN_UNROLL", 0)
    art, rs, G, ref, ref_sc = setup
    m = build_merged_index(art.unique_index, art.doubly_index)
    dm = to_device_merged(m)
    out, ovh, ovs = jax.jit(
        lambda c, l: classify_batch_sortjoin(
            dm, c, l, G, with_rcounts=not sc, sc_mode=sc)
    )(jnp.asarray(rs.codes), jnp.asarray(rs.lengths))
    assert int(ovh) == 0 and int(ovs) == 0
    want = ref_sc if sc else ref
    np.testing.assert_array_equal(np.asarray(out.cnts_u), want.cnts_u)
    np.testing.assert_array_equal(np.asarray(out.cnts_d), want.cnts_d)
    assert int(out.nundet) == want.nundet
    assert int(out.nconf) == want.nconf
    if not sc:
        np.testing.assert_array_equal(np.asarray(out.rcount_u), ref.rcount_u)
        np.testing.assert_array_equal(np.asarray(out.rcount_d), ref.rcount_d)


def test_cuckoo_span_table_exact():
    """_build_cuckoo/_cuckoo_lookup: every distinct bucket hash resolves
    to its full hlo-run span; absent keys are rejected (host numpy twin
    of the in-jit lookup)."""
    import jax.numpy as jnp

    from cammiq_tpu.query.sortjoin import _build_cuckoo, _cuckoo_lookup

    rng = np.random.default_rng(5)
    nd = 40000
    keys = np.unique(rng.integers(0, 1 << 32, nd * 2, np.int64)
                     .astype(np.uint32))[:nd]
    # synthesize bucket rows: some keys get duplicate rows (hhi splits)
    reps = rng.integers(1, 3, nd)
    pref_lo = np.sort(np.repeat(keys, reps))
    first = np.ones(pref_lo.shape[0], bool)
    first[1:] = pref_lo[1:] != pref_lo[:-1]
    starts = rng.integers(0, 1 << 20, pref_lo.shape[0]).astype(np.int32)
    counts = rng.integers(1, 5, pref_lo.shape[0]).astype(np.int32)
    # rows of one run must share the span (as build_merged_index emits)
    run_id = np.cumsum(first) - 1
    starts = starts[np.nonzero(first)[0]][run_id]
    counts = counts[np.nonzero(first)[0]][run_id]
    tab, tlog = _build_cuckoo(pref_lo, starts, counts)
    # present keys
    f, st, ct = _cuckoo_lookup(jnp.asarray(tab), tlog,
                               jnp.asarray(pref_lo[first]), jnp)
    assert bool(np.all(np.asarray(f)))
    np.testing.assert_array_equal(np.asarray(st), starts[first])
    np.testing.assert_array_equal(np.asarray(ct), counts[first])
    # absent keys
    absent = np.setdiff1d(
        rng.integers(0, 1 << 32, 4096, np.int64).astype(np.uint32),
        keys)
    f2, _, _ = _cuckoo_lookup(jnp.asarray(tab), tlog, jnp.asarray(absent),
                              jnp)
    assert not bool(np.any(np.asarray(f2)))


def test_bloom_join_cuckoo_matches_binary_search():
    """The cuckoo span-table search and the pre-r5 directory binary
    search (cuckoo=None fallback, the old-artifact path) must agree
    exactly."""
    import dataclasses

    import jax.numpy as jnp

    from dist_fixture import make_dist_fixture
    from cammiq_tpu.query.sortjoin import (
        build_merged_index, collect_matches_sortjoin, to_device_merged,
    )

    art, rs, G = make_dist_fixture(seed=17)
    dm = to_device_merged(build_merged_index(art.unique_index, art.doubly_index))
    assert dm.cuckoo is not None or dm.cuckoo_kv is not None
    dm_nock = dataclasses.replace(dm, cuckoo=None, cuckoo_kv=None,
                                  cuckoo_log=0)
    codes = jnp.asarray(rs.codes)
    lengths = jnp.asarray(rs.lengths)
    a, ovh_a, _ = collect_matches_sortjoin(dm, codes, lengths, join="bloom",
                                           hit_capacity_frac=1)
    b, ovh_b, _ = collect_matches_sortjoin(dm_nock, codes, lengths,
                                           join="bloom", hit_capacity_frac=1)
    assert int(ovh_a) == 0 and int(ovh_b) == 0
    for fld in ("slots", "rid1", "rid2", "in_u"):
        np.testing.assert_array_equal(np.asarray(getattr(a, fld)),
                                      np.asarray(getattr(b, fld)))
