"""Merged-index artifact (index/artifact.py): saving the precomputed
merged index and querying from it must be bit-identical to the live
session (single-device AND distributed), and the quant payload shims must
reproduce the original tables' columns.

VERDICT round-2 item #2 (sharded, streamed index artifact).
"""

import numpy as np
import pytest

from cammiq_tpu.config import QueryConfig
from cammiq_tpu.index.artifact import (
    is_merged_artifact,
    load_merged_artifact,
    prepare_merged,
    save_merged_artifact,
)
from cammiq_tpu.parallel.mesh import make_mesh
from cammiq_tpu.query.pipeline import QuerySession
from cammiq_tpu.query.sortjoin import build_merged_index


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from dist_fixture import make_dist_fixture

    art, rs, G = make_dist_fixture()
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=12, batch_size=256))
    ref = sess.run(rs, sc_mode=False)
    out = tmp_path_factory.mktemp("merged")
    m = build_merged_index(art.unique_index, art.doubly_index)
    save_merged_artifact(m, art.unique_index, art.doubly_index, str(out))
    return art, rs, G, ref, m, str(out)


def test_artifact_roundtrip_arrays(setup):
    art, rs, G, ref, m, path = setup
    assert is_merged_artifact(path)
    a = load_merged_artifact(path)
    m2 = a.to_merged_index()
    np.testing.assert_array_equal(np.asarray(m2.key_words), m.key_words)
    np.testing.assert_array_equal(np.asarray(m2.length), m.length)
    np.testing.assert_array_equal(np.asarray(m2.color), m.color)
    np.testing.assert_array_equal(np.asarray(m2.gid), m.gid)
    np.testing.assert_array_equal(np.asarray(m2.rid1), m.rid1)
    np.testing.assert_array_equal(np.asarray(m2.rid2), m.rid2)
    np.testing.assert_array_equal(np.asarray(m2.pref_lo), m.pref_lo)
    np.testing.assert_array_equal(np.asarray(m2.pref_hi), m.pref_hi)
    np.testing.assert_array_equal(np.asarray(m2.bucket_start), m.bucket_start)
    np.testing.assert_array_equal(np.asarray(m2.bucket_count), m.bucket_count)
    assert (m2.max_bucket, m2.n_colors) == (m.max_bucket, m.n_colors)

    # quant payload shims == original table columns
    pu, pd = a.payloads()
    for col in ("length", "rid1", "rid2", "ucount1", "ucount2"):
        np.testing.assert_array_equal(
            np.asarray(getattr(pu, col)), getattr(art.unique_index, col))
        np.testing.assert_array_equal(
            np.asarray(getattr(pd, col)), getattr(art.doubly_index, col))
    assert pu.num_entries == art.unique_index.num_entries
    assert pd.num_entries == art.doubly_index.num_entries


def test_artifact_session_matches_live(setup):
    art, rs, G, ref, m, path = setup
    a = load_merged_artifact(path)
    sess = QuerySession.from_artifact(a, G, QueryConfig(h=12, batch_size=256))
    out = sess.run(rs, sc_mode=False)
    np.testing.assert_array_equal(out.cnts_u, ref.cnts_u)
    np.testing.assert_array_equal(out.cnts_d, ref.cnts_d)
    np.testing.assert_array_equal(out.rcount_u, ref.rcount_u)
    np.testing.assert_array_equal(out.rcount_d, ref.rcount_d)
    assert out.nundet == ref.nundet and out.nconf == ref.nconf


@pytest.mark.parametrize("dp,mp", [(4, 2), (2, 4), (8, 1)])
def test_artifact_dist_matches_live(setup, dp, mp):
    import jax

    art, rs, G, ref, m, path = setup
    if dp * mp > len(jax.devices()):
        pytest.skip("not enough devices")
    a = load_merged_artifact(path)
    mesh = make_mesh(dp, mp)
    sess = QuerySession.from_artifact(
        a, G, QueryConfig(h=12, batch_size=256), mesh=mesh)
    out = sess.run(rs, sc_mode=False)
    np.testing.assert_array_equal(out.cnts_u, ref.cnts_u)
    np.testing.assert_array_equal(out.cnts_d, ref.cnts_d)
    np.testing.assert_array_equal(out.rcount_u, ref.rcount_u)
    np.testing.assert_array_equal(out.rcount_d, ref.rcount_d)
    assert out.nundet == ref.nundet and out.nconf == ref.nconf


@pytest.mark.parametrize("dp,mp", [(4, 2), (2, 4)])
def test_dist_fused_shards_match_single(setup, dp, mp):
    """The rewritten fused-record sharding (no precomputed artifact) must
    still equal the single-device session."""
    import jax

    from cammiq_tpu.parallel.dist_query import DistSortJoinSession

    art, rs, G, ref, m, path = setup
    if dp * mp > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(dp, mp)
    ds = DistSortJoinSession(mesh, art.unique_index, art.doubly_index, G)
    out = ds.classify(rs.codes, rs.lengths)
    np.testing.assert_array_equal(out.cnts_u, ref.cnts_u)
    np.testing.assert_array_equal(out.cnts_d, ref.cnts_d)
    np.testing.assert_array_equal(out.rcount_u, ref.rcount_u)
    np.testing.assert_array_equal(out.rcount_d, ref.rcount_d)


def test_prepare_merged_cli(tmp_path):
    """prepare_merged (the npz -> artifact converter) round-trips."""
    from dist_fixture import make_dist_fixture

    from cammiq_tpu.index.table import save_flat_index

    art, rs, G = make_dist_fixture()
    u_path = str(tmp_path / "idx_u.npz")
    d_path = str(tmp_path / "idx_d.npz")
    save_flat_index(u_path, art.unique_index)
    save_flat_index(d_path, art.doubly_index)
    (tmp_path / "genome_lengths.out").write_text("1\t1000\n")
    out = str(tmp_path / "merged")
    prepare_merged(u_path, d_path, out)
    assert is_merged_artifact(out)
    import os

    assert os.path.exists(os.path.join(out, "genome_lengths.out"))
    a = load_merged_artifact(out)
    sess = QuerySession.from_artifact(a, G, QueryConfig(h=12, batch_size=256))
    live = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=12, batch_size=256))
    o1 = sess.run(rs, sc_mode=False)
    o2 = live.run(rs, sc_mode=False)
    np.testing.assert_array_equal(o1.cnts_u, o2.cnts_u)
    np.testing.assert_array_equal(o1.rcount_u, o2.rcount_u)
    np.testing.assert_array_equal(o1.rcount_d, o2.rcount_d)
