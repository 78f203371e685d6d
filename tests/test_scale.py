"""Medium-scale end-to-end (BASELINE config #2 shape): ~50-genome DB,
both indexes, simulated reads with errors, full quant pipeline."""

import numpy as np
import pytest

from cammiq_tpu import native
from cammiq_tpu.config import BuildConfig, FineParams, QueryConfig
from cammiq_tpu.index.builder import build_index
from cammiq_tpu.io.fasta import corpus_from_sequences
from cammiq_tpu.io.fastq import reads_from_arrays
from cammiq_tpu.models.quant import abundances, build_problem, solve_quant
from cammiq_tpu.query.pipeline import QuerySession

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="needs native SA-IS for speed")

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def test_fifty_genome_quant():
    rng = np.random.default_rng(12)
    NG, GLEN = 50, 20_000
    shared = rng.integers(0, 4, GLEN // 4)
    genomes = []
    for g in range(NG):
        own = rng.integers(0, 4, GLEN)
        ins = int(rng.integers(0, GLEN - len(shared)))
        genomes.append([ALPHA[np.concatenate([own[:ins], shared, own[ins:]])].tobytes()])
    corpus = corpus_from_sequences(genomes)
    cfg = BuildConfig(k=26, L=100, Lmax=50, h=26, mode="both")
    art = build_index(corpus, cfg, engine="native")
    assert art.unique_index.num_entries > NG * 100

    # simulate skewed reads: genome g gets weight ~ (g % 5) + 1
    w = np.array([(g % 5) + 1 for g in range(NG)], float)
    w /= w.sum()
    R = 20000
    counts = rng.multinomial(R, w)
    reads = []
    for g in range(NG):
        c = genomes[g][0]
        for _ in range(counts[g]):
            p = int(rng.integers(0, GLEN * 1.2 - 100))
            p = min(p, len(c) - 100)
            r = bytearray(c[p : p + 100])
            if rng.random() < 0.5:
                comp = {65: 84, 67: 71, 71: 67, 84: 65}
                r = bytearray(comp[b] for b in reversed(r))
            e = rng.random(100) < 0.01
            for i in np.nonzero(e)[0]:
                r[i] = int(ALPHA[rng.integers(0, 4)])
            reads.append(bytes(r))
    rs = reads_from_arrays(reads, max_len=112)

    G = NG + 1
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=26, batch_size=8192), engine="sortjoin")
    out = sess.run(rs)
    assert out.nconf < R * 0.01
    assert out.cnts_u.sum() > R * 0.7  # ~20% of reads fall in the all-shared region

    gl = np.concatenate([[0], np.full(NG, GLEN, float)])
    nus = np.concatenate([[0], art.ulm_count_u.astype(float)])
    nds = np.concatenate([[0], art.ulm_count_d.astype(float)])
    # independent random genomes have ~no doubly-unique substrings, so
    # the default doubly-count threshold would (correctly, per reference
    # semantics) reject everything; relax it
    fine = FineParams(read_cnt_thres=5, easy_to_identify_thres=10**9)
    # this synthetic DB has only ~100 doubly entries, so the reference's
    # 1000/#substrings(g) weighting makes the doubly residuals dominate;
    # quantify on the unique objective (the doubly-weighted variant is
    # exercised in the e2e tests with realistic weights)
    prob = build_problem(
        art.unique_index, None, out.rcount_u, out.rcount_d,
        out.cnts_u.astype(float), out.cnts_d.astype(float),
        nus, nds, gl, out.mean_read_len, out.num_reads, 0.01, fine,
    )
    exist, cov, info = solve_quant(prob)
    ab = abundances(exist, cov)
    # the prefilter may (faithfully to the reference alpha test) drop
    # genomes with doubly L-mers but no doubly read counts; the solver
    # must keep every survivor and recover their relative abundances
    surv = prob.exist0
    assert (exist == surv).all()
    assert surv[1:].sum() >= NG * 0.7
    w_surv = np.where(surv[1:], w, 0.0)
    w_surv = w_surv / w_surv.sum()
    l1 = np.abs(ab[1:] - w_surv).sum()
    assert l1 < 0.06, l1
