"""Shared deterministic fixture for the distributed-query tests: a small
4-genome --both index plus 256 simulated reads.  Imported both by
test_dist.py (in-process 8-device CPU mesh) and by multihost_worker.py
(every process rebuilds the identical fixture)."""

from __future__ import annotations

import numpy as np

from cammiq_tpu.config import BuildConfig
from cammiq_tpu.index.builder import build_index
from cammiq_tpu.io.fasta import corpus_from_sequences
from cammiq_tpu.io.fastq import reads_from_arrays

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_dist_fixture(seed: int = 5):
    rng = np.random.default_rng(seed)
    length = 400
    shared = rng.integers(0, 4, size=150)
    genomes = []
    for g in range(4):
        own = rng.integers(0, 4, size=length)
        ins = int(rng.integers(0, length - 150))
        seq = np.concatenate([own[:ins], shared, own[ins:]])
        genomes.append([ALPHA[seq].tobytes()])
    corpus = corpus_from_sequences(genomes)
    cfg = BuildConfig(k=12, L=60, Lmax=30, h=12, mode="both")
    art = build_index(corpus, cfg, engine="numpy")
    reads = []
    for _ in range(256):
        g = int(rng.integers(0, 4))
        c = genomes[g][0]
        p = int(rng.integers(0, len(c) - 60))
        r = c[p : p + 60]
        if rng.random() < 0.5:
            comp = {65: 84, 67: 71, 71: 67, 84: 65}
            r = bytes(comp[b] for b in reversed(r))
        reads.append(r)
    rs = reads_from_arrays(reads, max_len=64)
    G = int(corpus.ref_id.max()) + 1
    return art, rs, G
