"""Unconditional mid-scale coverage (r4 VERDICT weak #6): a fresh
checkout must exercise the PRODUCTION code paths — the bloom join
(NB > 4N), the cuckoo search, dist-session equality, and sc-mode pair
accounting — without depending on the gitignored bench_cache.

One ~150-genome x 50 kb DB (~15 MB corpus incl. RC) built once per
session; batch B=1024 keeps 4N below NB so join='auto' resolves to the
bloom path, and keeps CPU compiles in test budget."""

from __future__ import annotations

import numpy as np
import pytest

from cammiq_tpu.config import BuildConfig
from cammiq_tpu.index.builder import build_index
from cammiq_tpu.io.fasta import corpus_from_sequences

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)
B, L = 1024, 100


@pytest.fixture(scope="module")
def midscale():
    rng = np.random.default_rng(42)
    shared = rng.integers(0, 4, 10_000)
    genomes = []
    for g in range(150):
        own = rng.integers(0, 4, 50_000)
        ins = int(rng.integers(0, len(own) - len(shared)))
        genomes.append(
            [ALPHA[np.concatenate([own[:ins], shared, own[ins:]])].tobytes()])
    corpus = corpus_from_sequences(genomes)
    cfg = BuildConfig(k=26, L=100, Lmax=50, h=26, mode="both")
    art = build_index(corpus, cfg, engine="auto")

    from cammiq_tpu.query.sortjoin import build_merged_index, to_device_merged

    m = build_merged_index(art.unique_index, art.doubly_index)
    dm = to_device_merged(m)

    # reads: half planted from genome text, half random
    reads = np.zeros((B, L), np.int8)
    lengths = np.full(B, L, np.int32)
    gsel = rng.integers(0, len(genomes), B)
    from cammiq_tpu.ops.packing import SYMBOL_IDX

    for b in range(B // 2):
        g = genomes[gsel[b]][0]
        p = int(rng.integers(0, len(g) - L))
        reads[b] = SYMBOL_IDX[np.frombuffer(g[p:p + L], np.uint8)]
    reads[B // 2:] = rng.integers(0, 4, size=(B - B // 2, L))
    return art, m, dm, reads, lengths


def test_bloom_path_engages(midscale):
    art, m, dm, reads, lengths = midscale
    NB = m.pref_lo.shape[0]
    N = B * (L - m.h + 1)
    assert NB > 4 * N, (
        f"DB too small for the production bloom regime (NB={NB}, 4N={4*N})")
    assert dm.bloom is not None
    assert dm.cuckoo_kv is not None or dm.cuckoo is not None


@pytest.mark.parametrize("sc", [False, True])
def test_bloom_equals_sort_midscale(midscale, sc):
    """join='auto' (bloom+cuckoo) vs the zero-gather sort join: exact
    equality of the full classify output, quant and sc modes."""
    import jax.numpy as jnp

    from cammiq_tpu.query.sortjoin import make_sortjoin_classifier

    art, m, dm, reads, lengths = midscale
    G = 151
    cd, ld = jnp.asarray(reads), jnp.asarray(lengths)
    auto = make_sortjoin_classifier(dm, G)
    out_a, ovh, ovs = auto(cd, ld, with_rcounts=True, sc_mode=sc,
                           uniform_len=None)
    assert int(ovh) == 0 and int(ovs) == 0

    from cammiq_tpu.query import sortjoin as sj

    # force the sort join by building a classifier over a bloomless view
    import dataclasses

    dm_sort = dataclasses.replace(dm, bloom=None, cuckoo=None,
                                  cuckoo_kv=None, dir_start=None)
    sortc = sj.make_sortjoin_classifier(dm_sort, G)
    out_b, ovh2, ovs2 = sortc(cd, ld, with_rcounts=True, sc_mode=sc,
                              uniform_len=None)
    assert int(ovh2) == 0 and int(ovs2) == 0
    for f in ("cnts_u", "cnts_d", "rcount_u", "rcount_d", "pair_lo",
              "pair_hi"):
        np.testing.assert_array_equal(np.asarray(getattr(out_a, f)),
                                      np.asarray(getattr(out_b, f)),
                                      err_msg=f)
    assert int(np.asarray(out_a.cnts_u).sum()) > B // 4, "planted reads hit"


def test_dist_session_equality_midscale(midscale):
    """DistSortJoinSession on whatever devices exist (model shards the
    index) must equal the single-device classifier exactly."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from cammiq_tpu.parallel.dist_query import DistSortJoinSession
    from cammiq_tpu.query.sortjoin import make_sortjoin_classifier

    art, m, dm, reads, lengths = midscale
    G = 151
    nd = len(jax.devices())
    mp = min(nd, 4)
    mesh = Mesh(np.array(jax.devices()[:mp]).reshape(1, mp),
                ("data", "model"))
    sess = DistSortJoinSession(mesh, merged=m, num_genome_slots=G)
    got = sess.classify(reads, lengths)

    ref, ovh, ovs = make_sortjoin_classifier(dm, G)(
        jnp.asarray(reads), jnp.asarray(lengths), with_rcounts=True,
        sc_mode=False, uniform_len=None)
    assert int(ovh) == 0 and int(ovs) == 0
    np.testing.assert_array_equal(got.cnts_u, np.asarray(ref.cnts_u))
    np.testing.assert_array_equal(got.cnts_d, np.asarray(ref.cnts_d))
    np.testing.assert_array_equal(got.rcount_u, np.asarray(ref.rcount_u))
    np.testing.assert_array_equal(got.rcount_d, np.asarray(ref.rcount_d))
