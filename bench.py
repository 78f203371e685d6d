"""Benchmark: k-mer probe + count-accumulation inner loop on one TPU chip.

Builds a synthetic multi-genome index, classifies batches of simulated
reads with the jitted probe+classify step, and reports steady-state
reads/s/chip.  Baseline north star (BASELINE.md): 10M reads/s on a
v5p-16 (16 chips), i.e. 625K reads/s/chip; vs_baseline is measured
against that per-chip figure.

Prints ONE JSON line:
  {"metric": "reads_per_sec_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": N / 625000.0}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

PER_CHIP_BASELINE = 10_000_000 / 16.0  # BASELINE.md target / v5p-16 chips


def build_bench_index(num_genomes=64, glen=50_000, seed=0):
    from cammiq_tpu.config import BuildConfig
    from cammiq_tpu.index.builder import build_index
    from cammiq_tpu.io.fasta import corpus_from_sequences

    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    shared = rng.integers(0, 4, size=glen // 5)
    genomes = []
    for g in range(num_genomes):
        own = rng.integers(0, 4, size=glen)
        ins = int(rng.integers(0, glen - len(shared)))
        seq = np.concatenate([own[:ins], shared, own[ins:]])
        genomes.append([alpha[seq].tobytes()])
    corpus = corpus_from_sequences(genomes)
    cfg = BuildConfig(k=26, L=100, Lmax=50, h=26, mode="both")
    art = build_index(corpus, cfg, engine="auto")
    return corpus, genomes, art


def sample_read_batch(rng, genomes, batch, L=100, Lpad=100, erate=0.01):
    num = len(genomes)
    codes = np.zeros((batch, Lpad), np.int8)
    lengths = np.full(batch, L, np.int32)
    from cammiq_tpu.ops.packing import SYMBOL_IDX

    gsel = rng.integers(0, num, size=batch)
    for b in range(batch):
        c = genomes[gsel[b]][0]
        p = int(rng.integers(0, len(c) - L))
        arr = SYMBOL_IDX[np.frombuffer(c[p : p + L], np.uint8)]
        codes[b, :L] = arr
    # substitution errors
    errs = rng.random((batch, L)) < erate
    codes[:, :L] = np.where(errs, rng.integers(0, 4, size=(batch, L)), codes[:, :L])
    return codes, lengths


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    # persistent compile cache: TPU compiles go through a slow remote
    # service on this machine; cache across bench runs
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


    t0 = time.time()
    rng = np.random.default_rng(1)
    corpus, genomes, art = build_bench_index()
    print(f"# index built in {time.time()-t0:.1f}s: "
          f"unique={art.unique_index.num_entries} "
          f"doubly={art.doubly_index.num_entries} entries", file=sys.stderr)

    from cammiq_tpu.query.sortjoin import (
        build_merged_index, make_sortjoin_classifier, to_device_merged,
    )

    dm = to_device_merged(build_merged_index(art.unique_index, art.doubly_index))
    G = len(genomes) + 1

    batch = 8192
    classify = make_sortjoin_classifier(dm, G)

    def fn(codes, lengths):
        out, ovh, ovs = classify(codes, lengths, with_rcounts=True,
                                 sc_mode=False, uniform_len=100)
        return out

    codes, lengths = sample_read_batch(rng, genomes, batch)
    codes_d = jnp.asarray(codes)
    lengths_d = jnp.asarray(lengths)

    # compile + warmup
    out = fn(codes_d, lengths_d)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    print(f"# compile+warmup at {t_compile:.1f}s", file=sys.stderr)

    # steady state: repeat until >= 3s measured
    iters = 2
    while True:
        t1 = time.time()
        for _ in range(iters):
            out = fn(codes_d, lengths_d)
        jax.block_until_ready(out)
        dt = time.time() - t1
        if dt > 3.0 or iters >= 256:
            break
        iters *= 2
    reads_per_sec = batch * iters / dt
    classified = int(np.asarray(out.cnts_u).sum() + np.asarray(out.cnts_d).sum() / 2)
    print(f"# {iters} iters in {dt:.2f}s; {classified}/{batch} reads assigned",
          file=sys.stderr)

    print(json.dumps({
        "metric": "reads_per_sec_per_chip",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / PER_CHIP_BASELINE, 4),
    }))


if __name__ == "__main__":
    main()
