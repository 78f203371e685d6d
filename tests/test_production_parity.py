"""Production-shape parity (r4 VERDICT item 6): the transcribed
reference oracles and the refcompat codec meet the REAL config-#3 index
(15.4M entries), where width edge cases (dense doubly content, deep
buckets) actually live — not just the 24-genome toy DBs.

Cache-gated like test_dist_production.py (the artifact is built once by
bench.py); test_midscale_paths.py covers a fresh checkout."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CDIR = os.path.join(REPO, "bench_cache", "g1000_l300k")
ART = os.path.join(CDIR, "merged")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ART, "meta.json")),
    reason="production bench artifact not built (run bench.py once)",
)


def _planted_reads(art, num_entries, B, L=100, seed=5):
    rng = np.random.default_rng(seed)
    erec = np.asarray(art.erec)
    kw = art.kw
    lens = (erec[:, kw] & 0xFFFF).astype(np.int64)
    ok = np.nonzero(lens <= 50)[0]
    picks = ok[rng.integers(0, len(ok), num_entries)]
    codes = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    lengths = np.full(B, L, np.int32)
    for b, e in enumerate(picks):
        elen = int(lens[e])
        off = int(rng.integers(0, L - elen))
        for t in range(elen):
            w = int(erec[e, t // 16])
            codes[b, off + t] = (w >> (2 * (t % 16))) & 3
    return codes, lengths


def test_engine_vs_oracle_production():
    """query_oracle.oracle_classify vs the full sortjoin engine on the
    config-#3 artifact: exact count agreement on 512 sampled reads
    (half with planted index entries, half random)."""
    import jax.numpy as jnp

    from query_oracle import oracle_classify
    from cammiq_tpu.index.artifact import load_merged_artifact
    from cammiq_tpu.index.table import load_flat_index
    from cammiq_tpu.query.sortjoin import (make_sortjoin_classifier,
                                           to_device_merged_artifact)

    art = load_merged_artifact(ART)
    idx_u = load_flat_index(os.path.join(CDIR, "index_u.npz"))
    idx_d = load_flat_index(os.path.join(CDIR, "index_d.npz"))
    G = 1001
    codes, lengths = _planted_reads(art, num_entries=256, B=512)

    dm = to_device_merged_artifact(art)
    classify = make_sortjoin_classifier(dm, G)
    got, ovh, ovs = classify(jnp.asarray(codes), jnp.asarray(lengths),
                             with_rcounts=True, sc_mode=False,
                             uniform_len=None)
    assert int(ovh) == 0 and int(ovs) == 0

    want = oracle_classify(idx_u, idx_d, codes, lengths, G)
    np.testing.assert_array_equal(np.asarray(got.cnts_u), want["cnts_u"])
    np.testing.assert_array_equal(np.asarray(got.cnts_d), want["cnts_d"])
    np.testing.assert_array_equal(np.asarray(got.rcount_u),
                                  want["rcount_u"])
    np.testing.assert_array_equal(np.asarray(got.rcount_d),
                                  want["rcount_d"])
    assert int(got.nundet) == want["nundet"]
    assert int(got.nconf) == want["nconf"]
    assert int(np.asarray(got.cnts_u).sum()) > 100, "planted reads matched"


def _subset_flat(idx, rows):
    from cammiq_tpu.index.table import build_flat_index_from_entries

    return build_flat_index_from_entries(
        idx.key_words[rows], idx.length[rows], idx.rid1[rows],
        idx.ucount1[rows], idx.rid2[rows], idx.ucount2[rows],
        idx.h, idx.is_doubly)


def _flat_tuple(idx):
    order = np.lexsort(
        tuple(idx.key_words[:, c] for c in range(idx.kw - 1, -1, -1))
        + (idx.length,))
    return tuple(np.asarray(a)[order].tobytes()
                 for a in (idx.key_words, idx.length, idx.rid1, idx.rid2,
                           idx.ucount1, idx.ucount2))


@pytest.mark.parametrize("table", ["u", "d"])
def test_refcompat_roundtrip_production_content(table, tmp_path):
    """encode->decode the reference .bin1/.bin2 format over 200K entries
    sampled from the REAL config-#3 tables (deep buckets, realized
    ucount/length distributions) and require FlatIndex equality.  The
    full 15.4M-entry table is out of reach for the scalar bit codec in a
    test budget; the sample keeps every realized field width."""
    from cammiq_tpu.index.refcompat import (reference_index_to_flat,
                                            write_reference_index)
    from cammiq_tpu.index.table import load_flat_index

    idx = load_flat_index(os.path.join(CDIR, f"index_{table}.npz"))
    if idx.num_entries == 0:
        pytest.skip("table empty")
    rng = np.random.default_rng(11)
    take = min(200_000, idx.num_entries)
    rows = np.sort(rng.choice(idx.num_entries, take, replace=False))
    sub = _subset_flat(idx, rows)
    path = str(tmp_path / f"index_{table}.bin{2 if table == 'd' else 1}")
    write_reference_index(path, sub)
    back = reference_index_to_flat(path, Lmax=50)
    assert _flat_tuple(back) == _flat_tuple(sub)
