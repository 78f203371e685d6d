"""Distributed query on an emulated 8-device CPU mesh: results must match
the single-device classifier exactly under every (data, model) layout."""

import numpy as np
import pytest

from cammiq_tpu.config import BuildConfig, QueryConfig
from cammiq_tpu.index.builder import build_index
from cammiq_tpu.io.fasta import corpus_from_sequences
from cammiq_tpu.io.fastq import reads_from_arrays
from cammiq_tpu.parallel.dist_query import DistQuerySession, shard_flat_index
from cammiq_tpu.parallel.mesh import make_mesh
from cammiq_tpu.query.pipeline import QuerySession

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.fixture(scope="module")
def setup():
    from dist_fixture import make_dist_fixture

    art, rs, G = make_dist_fixture()
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=12, batch_size=256))
    ref_counts = sess.run(rs, sc_mode=False)
    ref_sc = sess.run(rs, sc_mode=True)
    return art, rs, G, ref_counts, ref_sc


def test_shard_roundtrip(setup):
    art, rs, G, ref, ref_sc = setup
    sh = shard_flat_index(art.unique_index, 4)
    ids = sh.orig_id[sh.orig_id >= 0]
    assert sorted(ids.tolist()) == list(range(art.unique_index.num_entries))


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2), (2, 4), (1, 8), (2, 2)])
def test_dist_matches_single(setup, dp, mp):
    import jax

    art, rs, G, ref, ref_sc = setup
    if dp * mp > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(dp, mp)
    ds = DistQuerySession(mesh, art.unique_index, art.doubly_index, G,
                          sc_mode=True)
    out = ds.classify(rs.codes, rs.lengths)
    np.testing.assert_array_equal(out.cnts_u, ref.cnts_u)
    np.testing.assert_array_equal(out.cnts_d, ref.cnts_d)
    np.testing.assert_array_equal(out.rcount_u, ref.rcount_u)
    np.testing.assert_array_equal(out.rcount_d, ref.rcount_d)
    assert out.nundet == ref.nundet
    assert out.nconf == ref.nconf
    # pair accounting matches the single-device sc run
    lo, hi = np.asarray(out.pair_lo), np.asarray(out.pair_hi)
    got_pairs = {}
    for a, b in zip(lo[lo >= 0], hi[lo >= 0]):
        got_pairs[(int(a), int(b))] = got_pairs.get((int(a), int(b)), 0) + 1
    assert got_pairs == ref_sc.pair_counts


@pytest.mark.parametrize("dp,mp", [(4, 2), (2, 4), (8, 1)])
def test_dist_sortjoin_matches_single(setup, dp, mp):
    import jax

    from cammiq_tpu.parallel.dist_query import DistSortJoinSession

    art, rs, G, ref, ref_sc = setup
    if dp * mp > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(dp, mp)
    ds = DistSortJoinSession(mesh, art.unique_index, art.doubly_index, G,
                             sc_mode=True)
    out = ds.classify(rs.codes, rs.lengths)
    np.testing.assert_array_equal(out.cnts_u, ref.cnts_u)
    np.testing.assert_array_equal(out.cnts_d, ref.cnts_d)
    np.testing.assert_array_equal(out.rcount_u, ref.rcount_u)
    np.testing.assert_array_equal(out.rcount_d, ref.rcount_d)
    assert out.nundet == ref.nundet
    assert out.nconf == ref.nconf


def test_dist_sortjoin_overflow_autowiden(setup):
    """A deliberately undersized capacity must auto-widen and still match
    (the single-device wrapper's retry, now on the distributed session)."""
    import jax

    from cammiq_tpu.parallel.dist_query import DistSortJoinSession

    art, rs, G, ref, ref_sc = setup
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    mesh = make_mesh(4, 2)
    ds = DistSortJoinSession(mesh, art.unique_index, art.doubly_index, G,
                             maxm=1, hit_capacity_frac=1 << 20)
    out = ds.classify(rs.codes, rs.lengths)
    np.testing.assert_array_equal(out.cnts_u, ref.cnts_u)
    np.testing.assert_array_equal(out.cnts_d, ref.cnts_d)
    np.testing.assert_array_equal(out.rcount_u, ref.rcount_u)
    np.testing.assert_array_equal(out.rcount_d, ref.rcount_d)


@pytest.mark.parametrize("dp,mp", [(4, 2), (8, 1)])
def test_query_session_mesh_matches_single(setup, dp, mp):
    """QuerySession(mesh=...) - the product-reachable distributed path
    (CLI -t / --model_shards) - must equal the single-device session."""
    import jax

    art, rs, G, ref, ref_sc = setup
    if dp * mp > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(dp, mp)
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=12, batch_size=256), mesh=mesh)
    out = sess.run(rs, sc_mode=False)
    np.testing.assert_array_equal(out.cnts_u, ref.cnts_u)
    np.testing.assert_array_equal(out.cnts_d, ref.cnts_d)
    np.testing.assert_array_equal(out.rcount_u, ref.rcount_u)
    np.testing.assert_array_equal(out.rcount_d, ref.rcount_d)
    assert out.nundet == ref.nundet and out.nconf == ref.nconf
    sc = sess.run(rs, sc_mode=True)
    assert sc.pair_counts == ref_sc.pair_counts
