"""Build-scale driver: full --both index build on a multi-genome synthetic
corpus, with per-stage timings and peak-RSS tracking.

The BASELINE config #3 shape (1K genomes / >1 GB corpus) run:
  python benchmarks/build_scale.py --genomes 1000 --glen 1000000

Prints one JSON line with corpus size, stage seconds, peak RSS, and index
entry counts.  Reference bar: "a few hours with multiple threads",
peak RAM <= 37*N bytes (README.md:187).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def peak_rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / (1024 * 1024)
    return 0.0


def gen_genomes(num, glen, seed=0, shared_pool=16, shared_len_frac=0.02):
    """Random genomes with segments drawn from a shared pool, so unique,
    doubly-unique, and >2-genome content all exist."""
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    seg = max(int(glen * shared_len_frac), 1000)
    pool = [rng.integers(0, 4, size=seg).astype(np.int8) for _ in range(shared_pool)]
    genomes = []
    for g in range(num):
        own = rng.integers(0, 4, size=glen).astype(np.int8)
        # splice 2 pool segments at random positions (some pairs of genomes
        # will share a segment -> doubly-unique material)
        for _ in range(2):
            p = pool[int(rng.integers(0, shared_pool))]
            at = int(rng.integers(0, glen - seg))
            own[at : at + seg] = p
        genomes.append([alpha[own].tobytes()])
    return genomes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=1000)
    ap.add_argument("--glen", type=int, default=1_000_000)
    ap.add_argument("--mode", default="both")
    ap.add_argument("--engine", default="native")
    ap.add_argument("--stage-dir", default="")
    ap.add_argument("--out", default="", help="save indexes to this dir")
    args = ap.parse_args()

    from cammiq_tpu.config import BuildConfig
    from cammiq_tpu.index.builder import build_index, save_index
    from cammiq_tpu.io.fasta import corpus_from_sequences

    t0 = time.time()
    genomes = gen_genomes(args.genomes, args.glen)
    corpus = corpus_from_sequences(genomes)
    del genomes
    t_gen = time.time() - t0
    print(f"# corpus: {corpus.n/1e9:.3f} GB ({args.genomes} genomes x "
          f"{args.glen/1e6:.1f} Mb + RC), generated in {t_gen:.0f}s",
          file=sys.stderr)

    cfg = BuildConfig(k=26, L=100, Lmax=50, h=26, mode=args.mode)
    t1 = time.time()
    art = build_index(corpus, cfg, engine=args.engine, verbose=True,
                      stage_dir=args.stage_dir or None)
    t_build = time.time() - t1
    if args.out:
        save_index(art, args.out)

    stages = {k: round(v, 1) for k, v in art.timings.as_dict().items()}
    out = {
        "corpus_bytes": corpus.n,
        "genomes": args.genomes,
        "build_seconds": round(t_build, 1),
        "peak_rss_gb": round(peak_rss_gb(), 2),
        "rss_over_n": round(peak_rss_gb() * (1 << 30) / corpus.n, 1),
        "unique_entries": art.unique_index.num_entries if art.unique_index else 0,
        "doubly_entries": art.doubly_index.num_entries if art.doubly_index else 0,
        "stages": stages,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
