"""Device (JAX) uniqueness kernels must match the host-numpy engine."""

import numpy as np
import pytest

from cammiq_tpu.index.unique import (
    compute_gsa, doubly_lcp0, min_unique, occ_doubly, occ_unique, unique_lcp0,
)
from cammiq_tpu.io.fasta import corpus_from_sequences
from cammiq_tpu.ops.lcp import lcp_from_sa_numpy
from cammiq_tpu.ops.sa import suffix_array_numpy

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def make(rng, ng=4, cl=150, sf=0.4):
    shared = rng.integers(0, 4, int(cl * sf))
    gs = []
    for g in range(ng):
        own = rng.integers(0, 4, cl)
        ins = int(rng.integers(0, cl - len(shared)))
        gs.append([ALPHA[np.concatenate([own[:ins], shared, own[ins:]])].tobytes()])
    return corpus_from_sequences(gs)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_kernels_match_host(seed):
    import jax.numpy as jnp

    from cammiq_tpu.index.unique_jax import (
        compute_gsa_jax, doubly_lcp0_jax, min_unique_jax,
        occ_doubly_jax, occ_unique_jax, unique_lcp0_jax,
    )

    rng = np.random.default_rng(seed)
    corpus = make(rng)
    s = corpus.seq
    n = len(s)
    sa = suffix_array_numpy(s)
    lcp = lcp_from_sa_numpy(s, sa)
    gsa = compute_gsa(sa, corpus.ref_pos, corpus.ref_id)
    el, ulmax = 9, 60

    sa_j = jnp.asarray(sa, jnp.int32)
    lcp_j = jnp.asarray(lcp, jnp.int32)
    gsa_j = compute_gsa_jax(sa_j, jnp.asarray(corpus.ref_pos, jnp.int64),
                            jnp.asarray(corpus.ref_id, jnp.int32))
    np.testing.assert_array_equal(np.asarray(gsa_j), gsa)

    lcp0 = unique_lcp0(gsa, lcp, el)
    lcp0_j = unique_lcp0_jax(gsa_j, lcp_j, el)
    np.testing.assert_array_equal(np.asarray(lcp0_j), lcp0)

    occ = occ_unique(sa, gsa, lcp, lcp0)
    occ_j = occ_unique_jax(sa_j, gsa_j, lcp_j, lcp0_j)
    np.testing.assert_array_equal(np.asarray(occ_j), occ)

    mu = min_unique(sa, lcp0, n)
    mu_j = min_unique_jax(sa_j, lcp0_j, n)
    np.testing.assert_array_equal(np.asarray(mu_j)[:n], mu[:n])

    d = doubly_lcp0(sa, gsa, lcp, el, ulmax)
    dl_j, g2_j = doubly_lcp0_jax(sa_j, gsa_j, lcp_j, el, ulmax)
    np.testing.assert_array_equal(np.asarray(dl_j), d.lcp0)
    np.testing.assert_array_equal(np.asarray(g2_j), d.gsa2)

    od, od2 = occ_doubly(sa, gsa, d.gsa2, lcp, d.lcp0, ulmax)
    od_j, od2_j = occ_doubly_jax(sa_j, gsa_j, g2_j, lcp_j, dl_j, ulmax)
    np.testing.assert_array_equal(np.asarray(od_j), od)
    np.testing.assert_array_equal(np.asarray(od2_j), od2)


def test_builder_jax_engine_matches_numpy():
    from cammiq_tpu.config import BuildConfig
    from cammiq_tpu.index.builder import build_index

    rng = np.random.default_rng(3)
    corpus = make(rng, ng=3, cl=200)
    cfg = BuildConfig(k=12, L=60, Lmax=30, h=12, mode="both")
    a = build_index(corpus, cfg, engine="numpy")
    b = build_index(corpus, cfg, engine="jax")
    for attr in ("key_words", "length", "rid1", "rid2", "ucount1", "ucount2"):
        np.testing.assert_array_equal(
            getattr(a.unique_index, attr), getattr(b.unique_index, attr))
        np.testing.assert_array_equal(
            getattr(a.doubly_index, attr), getattr(b.doubly_index, attr))
    np.testing.assert_array_equal(a.ulm_count_u, b.ulm_count_u)
    np.testing.assert_array_equal(a.ulm_count_d, b.ulm_count_d)


def test_builder_stage_resume(tmp_path):
    from cammiq_tpu.config import BuildConfig
    from cammiq_tpu.index.builder import build_index

    rng = np.random.default_rng(5)
    corpus = make(rng, ng=3, cl=150)
    cfg = BuildConfig(k=12, L=60, Lmax=30, h=12, mode="unique")
    sd = str(tmp_path / "stages")
    a = build_index(corpus, cfg, engine="numpy", stage_dir=sd)
    # second run must reuse the staged SA/LCP and produce identical output
    b = build_index(corpus, cfg, engine="numpy", stage_dir=sd)
    np.testing.assert_array_equal(a.unique_index.key_words, b.unique_index.key_words)
    np.testing.assert_array_equal(a.ulm_count_u, b.ulm_count_u)
    import os
    assert os.path.exists(os.path.join(sd, "sa.bin"))
