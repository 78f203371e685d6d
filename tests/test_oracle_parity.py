"""End-to-end engine-vs-oracle parity on a realistic strain database.

The reference binary cannot run here (CPLEX/Gurobi link requirement,
/root/reference/src/Makefile:40-44), so the transcribed scalar oracles are
the executable stand-in for "matches CAMMiQ" (BASELINE.md: exact genome
set + <= 1e-3 L1):

  query_oracle.oracle_classify  = query64_p  (src/query.cpp:458-648)
  quant_oracle.oracle_miqp      = runILP_cplex (src/query.cpp:1082-1298)

This test runs BOTH pipelines end-to-end on the same simulated read set
over a strain-family database (95-99.9% ANI families + unrelated
genomes) and asserts:

  1. identical classification counts (cnts/rcounts/pairs/nundet/nconf);
  2. identical selected genome set from the solvers;
  3. L1(engine abundances, oracle abundances) <= 1e-3.
"""

import sys

import numpy as np
import pytest

from cammiq_tpu.cli import main as cli_main
from cammiq_tpu.config import FineParams, QueryConfig
from cammiq_tpu.index.table import load_flat_index
from cammiq_tpu.io.fastq import read_fastq
from cammiq_tpu.io.mapfile import load_genome_lengths, load_smap
from cammiq_tpu.models.quant import abundances, build_problem, solve_quant
from cammiq_tpu.query.pipeline import QuerySession
from cammiq_tpu.tools.simulate import simulate

from query_oracle import oracle_classify
from quant_oracle import oracle_miqp

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)

GLEN = 10_000
FAMILIES = 4
STRAIN_RATES = [0.05, 0.01, 0.003, 0.001]   # 95..99.9% ANI
UNRELATED = 8
PRIVATE_SEGS = 3
PRIVATE_LEN = 250


@pytest.fixture(scope="module")
def parity_db(tmp_path_factory):
    root = tmp_path_factory.mktemp("paritydb")
    db = root / "fasta"
    db.mkdir()
    rng = np.random.default_rng(23)
    backbone = rng.integers(0, 4, size=2000)

    genomes = []
    for fam in range(FAMILIES):
        anc = rng.integers(0, 4, size=GLEN)
        for s, rate in enumerate(STRAIN_RATES):
            v = anc.copy()
            m = int(round(rate * GLEN))
            pos = rng.choice(GLEN, size=m, replace=False)
            v[pos] = (v[pos] + rng.integers(1, 4, size=m)) % 4
            for _ in range(PRIVATE_SEGS):
                at = int(rng.integers(0, GLEN - PRIVATE_LEN))
                v[at: at + PRIVATE_LEN] = rng.integers(0, 4, size=PRIVATE_LEN)
            genomes.append((f"f{fam}s{s}", v))
    for u in range(UNRELATED):
        genomes.append((f"u{u}", rng.integers(0, 4, size=GLEN)))
    for gi in range(0, len(genomes), 3):
        _, v = genomes[gi]
        at = int(rng.integers(0, GLEN - backbone.shape[0]))
        v[at: at + backbone.shape[0]] = backbone

    entries = []
    for gi, (name, v) in enumerate(genomes):
        fn = f"{name}.fasta"
        with open(db / fn, "w") as f:
            f.write(f">{name}\n")
            s = ALPHA[v].tobytes().decode()
            for i in range(0, len(s), 80):
                f.write(s[i: i + 80] + "\n")
        entries.append((fn, gi + 1, 7000 + gi, name))
    with open(root / "genome_map.out", "w") as f:
        for fn, gid, taxid, name in entries:
            f.write(f"{fn}\t{gid}\t{taxid}\t{name}\n")

    idx = root / "idx"
    idx.mkdir()
    cli_main([
        "--build", "--both",
        "-f", str(root / "genome_map.out"), "-D", str(db) + "/",
        "-k", "21", "-L", "100", "-Lmax", "40", "-h", "21",
        "-i", str(idx / "index_u.npz"), str(idx / "index_d.npz"),
        "--engine", "auto",
    ])
    return root, db, idx, entries


def test_engine_matches_oracle_end_to_end(parity_db, tmp_path):
    root, db, idx, entries = parity_db
    present = ["f0s0", "f0s3", "f1s2", "f2s3", "u0", "u3", "u5"]
    by_name = {name: (gid, taxid) for (fn, gid, taxid, name) in entries}
    present_tax = [str(by_name[n][1]) for n in present]

    fq = tmp_path / "parity.fq"
    simulate(str(root / "genome_map.out"), str(db), str(fq),
             str(tmp_path / "truth.out"), num_reads=8000, L=100,
             erate=0.0, genome_ids=present_tax, dist="lognormal", seed=3)

    index_u = load_flat_index(str(idx / "index_u.npz"))
    index_d = load_flat_index(str(idx / "index_d.npz"))
    table = load_smap(str(root / "genome_map.out"))
    load_genome_lengths(table, str(idx))
    G = table.n_species + 1
    reads = read_fastq(str(fq))

    # ---- stage 1 parity: classification counts
    sess = QuerySession(index_u, index_d, G, QueryConfig(batch_size=2048),
                        engine="sortjoin")
    got = sess.run(reads, sc_mode=False)
    want = oracle_classify(index_u, index_d, reads.codes, reads.lengths, G)

    np.testing.assert_array_equal(got.cnts_u, want["cnts_u"])
    np.testing.assert_array_equal(got.cnts_d, want["cnts_d"])
    np.testing.assert_array_equal(got.rcount_u, want["rcount_u"])
    np.testing.assert_array_equal(got.rcount_d, want["rcount_d"])
    assert got.nundet == want["nundet"]
    assert got.nconf == want["nconf"]
    print(f"# parity counts: assigned_u={int(got.cnts_u.sum())} "
          f"assigned_d={int(got.cnts_d.sum())} nundet={got.nundet} "
          f"nconf={got.nconf}", file=sys.stderr)

    # ---- stage 2 parity: solver genome set + abundances (engine counts
    # feed both solvers; stage 1 already proved counts identical)
    gl, nus, nds = table.arrays()
    fine = FineParams(easy_to_identify_thres=100000, ilp_alpha=0.001)
    prob = build_problem(
        index_u, index_d, got.rcount_u, got.rcount_d,
        got.cnts_u.astype(np.float64), got.cnts_d.astype(np.float64),
        nus.astype(np.float64), nds.astype(np.float64),
        gl, got.mean_read_len, got.num_reads, 0.0, fine,
    )
    n_surv = int(prob.exist0.sum())
    print(f"# parity survivors: {n_surv}", file=sys.stderr)
    assert n_surv <= 14, "oracle enumeration would be too slow"
    exist, cov, info = solve_quant(prob)

    osel, ocov, oobj = oracle_miqp(
        index_u, index_d, want["rcount_u"], want["rcount_d"],
        want["cnts_u"].astype(np.float64), want["cnts_d"].astype(np.float64),
        nus.astype(np.float64), nds.astype(np.float64),
        gl, got.mean_read_len, got.num_reads, 0.0, fine,
    )
    assert np.isfinite(oobj), "oracle found no feasible assignment"

    got_set = set(np.nonzero(exist)[0].tolist())
    want_set = set(np.nonzero(osel)[0].tolist())
    assert got_set == want_set, (
        f"genome set mismatch: engine {got_set} vs oracle {want_set} "
        f"(obj {info['objective']:.6g} vs {oobj:.6g})")

    ab = abundances(exist, cov)
    oab = abundances(osel, ocov)
    l1 = float(np.abs(ab - oab).sum())
    print(f"# parity abundance L1 = {l1:.2e} "
          f"(obj {info['objective']:.6g} vs oracle {oobj:.6g})",
          file=sys.stderr)
    assert l1 <= 1e-3, f"abundance L1 {l1:.2e} > 1e-3"
