"""Memory-honest cross-host build (parallel/dist_build.py:
dist_build_index) — identical index AND measured per-worker peak RSS
scaling as ~N/H (r4 VERDICT item 3: the r4 prototype proved only the
algorithm; the merge centralized ~120 B/suffix in the driver and the
sweeps ran on full-corpus arrays)."""

import tempfile

import numpy as np
import pytest

from cammiq_tpu import native
from cammiq_tpu.config import BuildConfig
from cammiq_tpu.index.builder import build_index
from cammiq_tpu.io.fasta import corpus_from_sequences
from cammiq_tpu.parallel.dist_build import dist_build_index

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)

pytestmark = pytest.mark.skipif(
    not (native.available() and native.has_bsort()),
    reason="native bounded sort not built",
)


def _corpus(num=6, glen=3000, seed=7, nctg=1):
    rng = np.random.default_rng(seed)
    shared = rng.integers(0, 4, min(600, glen // 5))
    genomes = []
    for g in range(num):
        own = rng.integers(0, 4, glen)
        ins = int(rng.integers(0, glen - len(shared)))
        seq = ALPHA[np.concatenate([own[:ins], shared, own[ins:]])].tobytes()
        k = max(len(seq) // nctg, 1)
        genomes.append([seq[i * k:(i + 1) * k] for i in range(nctg)])
    return corpus_from_sequences(genomes)


def _index_tuple(idx):
    if idx is None:
        return None
    order = np.lexsort(
        tuple(idx.key_words[:, c] for c in range(idx.kw - 1, -1, -1))
        + (idx.length, idx.rid1, idx.rid2)
    )
    return tuple(
        np.asarray(a)[order].tobytes()
        for a in (idx.key_words, idx.length, idx.rid1, idx.rid2,
                  idx.ucount1, idx.ucount2)
    )


def _assert_same(got, ref):
    assert _index_tuple(got.unique_index) == _index_tuple(ref.unique_index)
    assert _index_tuple(got.doubly_index) == _index_tuple(ref.doubly_index)
    np.testing.assert_array_equal(got.ulm_count_u, ref.ulm_count_u)
    np.testing.assert_array_equal(got.ulm_count_d, ref.ulm_count_d)


@pytest.mark.parametrize("hosts,nctg", [(2, 1), (3, 1), (3, 3)])
def test_dist_full_identical_index(hosts, nctg):
    """dist_build_index(hosts=H) == build_index(num_groups=H): the text
    shards ARE the reference's per-thread selection groups."""
    corpus = _corpus(nctg=nctg)
    cfg = BuildConfig(k=14, L=80, Lmax=40, h=14, mode="both",
                      num_groups=min(hosts, 4, corpus.num_files))
    ref = build_index(corpus, cfg, engine="native")
    with tempfile.TemporaryDirectory() as wd:
        got, _ = dist_build_index(corpus, cfg, hosts, wd, processes=False)
    _assert_same(got, ref)


def test_dist_full_processes_rss_scaling():
    """Real worker processes; per-worker peak RSS must scale down with H
    (measured, not asserted-by-comment) and stay under an explicit
    c * N/H * record budget, while the index stays identical."""
    corpus = _corpus(num=8, glen=1_500_000, seed=3)
    n = corpus.n
    rec = None
    peaks = {}
    for hosts in (2, 4):
        # the text shards are the selection groups, so the monolithic
        # twin uses num_groups=hosts (reference t=hosts thread behavior)
        cfg = BuildConfig(k=14, L=80, Lmax=40, h=14, mode="both",
                          num_groups=min(hosts, 4, corpus.num_files))
        rec = (cfg.sa_depth // 8) * 8 + 16  # packed key + pos + len bytes
        ref = build_index(corpus, cfg, engine="native")
        with tempfile.TemporaryDirectory() as wd:
            got, rss = dist_build_index(corpus, cfg, hosts, wd,
                                        processes=True)
        _assert_same(got, ref)
        base = max(rss.get("baseline", [300]))
        heavy = rss["p1_sort_partition"] + rss["p2_merge_chunks"]
        peaks[hosts] = max(heavy) - base
        # absolute budget: worker baseline (~numpy import etc.) + c
        # times its slice's key records.  c=6 covers the sort + pack
        # transients; the point is the N/H factor, not the constant.
        budget_mb = 6 * (n / hosts) * rec / 1e6
        assert peaks[hosts] <= budget_mb, (
            f"hosts={hosts}: worker peak {peaks[hosts]:.0f} MB over "
            f"baseline exceeds budget {budget_mb:.0f} MB ({rss})")
    # halving the shard size must show up in the baseline-corrected peaks
    assert peaks[4] <= 0.7 * peaks[2], peaks


def test_streaming_corpus_matches_in_memory(tmp_path):
    """io.fasta.build_corpus_streaming must be byte-identical to
    build_corpus (same seq bytes, contig/ref tables) — it is the
    memory-honest driver entry of the cross-host build."""
    import os

    from cammiq_tpu.io.fasta import build_corpus, build_corpus_streaming

    rng = np.random.default_rng(4)
    files = []
    for g in range(4):
        p = tmp_path / f"g{g}.fasta"
        with open(p, "w") as f:
            for c in range(3):
                seq = "".join("ACGT"[x] for x in rng.integers(0, 4, 700))
                f.write(f">g{g}c{c}\n{seq[:333]}\n{seq[333:]}\n")
        files.append((str(p), g + 1))
    a = build_corpus(files)
    b = build_corpus_streaming(files, str(tmp_path / "seq.bin"))
    np.testing.assert_array_equal(np.asarray(b.seq), a.seq)
    np.testing.assert_array_equal(b.contig_pos, a.contig_pos)
    np.testing.assert_array_equal(b.ref_pos, a.ref_pos)
    np.testing.assert_array_equal(b.ref_id, a.ref_id)


def test_dist_build_from_streamed_corpus(tmp_path):
    """dist_build_index over a memmap-backed streamed corpus (the CLI
    --build_hosts path) must equal the in-memory build."""
    import os

    from cammiq_tpu.io.fasta import build_corpus, build_corpus_streaming

    rng = np.random.default_rng(9)
    shared = "".join("ACGT"[x] for x in rng.integers(0, 4, 500))
    files = []
    for g in range(6):
        p = tmp_path / f"g{g}.fasta"
        own = "".join("ACGT"[x] for x in rng.integers(0, 4, 2500))
        ins = int(rng.integers(0, len(own) - len(shared)))
        with open(p, "w") as f:
            f.write(f">g{g}\n{own[:ins] + shared + own[ins:]}\n")
        files.append((str(p), g + 1))
    cfg = BuildConfig(k=14, L=80, Lmax=40, h=14, mode="both", num_groups=2)
    ref = build_index(build_corpus(files), cfg, engine="native")
    corpus = build_corpus_streaming(files, str(tmp_path / "seq.bin"))
    with tempfile.TemporaryDirectory() as wd:
        got, _ = dist_build_index(corpus, cfg, 2, wd, processes=False)
    _assert_same(got, ref)
