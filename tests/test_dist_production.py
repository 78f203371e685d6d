"""Distributed query on the PRODUCTION merged artifact.

Loads the bench_cache 1000-genome / 15.4M-entry artifact (built by
bench.py) into DistSortJoinSession on the 8-device CPU mesh and asserts
EXACT equality against the single-device session on a read batch with
planted matches, logging the shard stats (e_pad / nb_pad /
dir_span_steps / per-shard utilization) the sharding layer computes.

Skipped when the artifact has not been built (fresh checkout).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_cache", "g1000_l300k", "merged")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ART, "meta.json")),
    reason="production bench artifact not built (run bench.py once)",
)


def _planted_reads(art, num_entries=96, B=512, L=100, seed=3):
    """Reads with index entries embedded at random offsets (plus random
    filler reads), decoded from the artifact's packed key words."""
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


def test_dist_production_artifact_exact():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from cammiq_tpu.index.artifact import load_merged_artifact
    from cammiq_tpu.parallel.dist_query import (
        DistSortJoinSession, _MergedSource, shard_merged_cuts)
    from cammiq_tpu.query.sortjoin import (
        make_sortjoin_classifier, to_device_merged_artifact)

    art = load_merged_artifact(ART)
    G = 1001
    codes, lengths = _planted_reads(art)

    # single-device reference
    dm = to_device_merged_artifact(art)
    classify = make_sortjoin_classifier(dm, G)
    ref, ovh, ovs = classify(jnp.asarray(codes), jnp.asarray(lengths),
                             with_rcounts=True, sc_mode=False,
                             uniform_len=None)
    assert int(ovh) == 0 and int(ovs) == 0
    assert int(np.asarray(ref.cnts_u).sum()) > 0, "planted reads must match"

    # shard stats at production scale (VERDICT r3: record them)
    src = _MergedSource.from_artifact(art)
    (cuts_b, e_lo, e_hi, e_pad, nb_pad, db, bloom_log,
     ck_log) = shard_merged_cuts(src, 2)
    sizes = [e_hi[i] - e_lo[i] for i in range(2)]
    print(f"[dist-production] E={art.E} NB={art.NB} shards=2 "
          f"e_pad={e_pad} nb_pad={nb_pad} db={db} bloom_log={bloom_log} "
          f"util={[round(s / e_pad, 3) for s in sizes]}", file=sys.stderr)
    assert e_pad >= max(sizes) and min(sizes) / e_pad > 0.9

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    sess = DistSortJoinSession(mesh, num_genome_slots=G, merged=art,
                               verbose=True)
    got = sess.classify(codes, lengths)

    np.testing.assert_array_equal(np.asarray(got.cnts_u), np.asarray(ref.cnts_u))
    np.testing.assert_array_equal(np.asarray(got.cnts_d), np.asarray(ref.cnts_d))
    np.testing.assert_array_equal(np.asarray(got.rcount_u), np.asarray(ref.rcount_u))
    np.testing.assert_array_equal(np.asarray(got.rcount_d), np.asarray(ref.rcount_d))
    assert int(got.nundet) == int(ref.nundet)
    assert int(got.nconf) == int(ref.nconf)
