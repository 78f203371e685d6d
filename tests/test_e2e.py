"""End-to-end: simulate -> build (CLI) -> query (CLI) -> check genome set
and abundances against ground truth (SURVEY.md section 7 minimum slice)."""

import os

import numpy as np
import pytest

from cammiq_tpu.cli import main as cli_main
from cammiq_tpu.models.output import parse_quant_output
from cammiq_tpu.tools.simulate import simulate

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.fixture(scope="module")
def toy_db(tmp_path_factory):
    root = tmp_path_factory.mktemp("toydb")
    rng = np.random.default_rng(42)
    db = root / "fasta"
    db.mkdir()
    entries = []
    for g in range(5):
        seq = ALPHA[rng.integers(0, 4, size=2000)]
        fn = f"genome{g+1}.fasta"
        with open(db / fn, "w") as f:
            f.write(f">g{g+1} contig1\n")
            s = seq.tobytes().decode()
            for i in range(0, len(s), 80):
                f.write(s[i : i + 80] + "\n")
        entries.append((fn, g + 1, 1000 + g, f"Genome_{g+1}"))
    map_file = root / "genome_map.out"
    with open(map_file, "w") as f:
        for fn, gid, taxid, name in entries:
            f.write(f"{fn}\t{gid}\t{taxid}\t{name}\n")
    return root, db, map_file, entries


@pytest.fixture(scope="module")
def built_idx(toy_db):
    root, db, map_file, entries = toy_db
    idx = root / "idx"
    idx.mkdir()
    cli_main([
        "--build", "--both",
        "-f", str(map_file), "-D", str(db) + "/",
        "-k", "20", "-L", "100", "-Lmax", "40", "-h", "20",
        "-i", str(idx / "index_u.npz"), str(idx / "index_d.npz"),
        "--engine", "numpy",
    ])
    assert (idx / "index_u.npz").exists()
    assert (idx / "index_d.npz").exists()
    assert (idx / "genome_lengths.out").exists()
    return idx


def test_meta_outputs(built_idx, toy_db):
    root, db, map_file, entries = toy_db
    gl = {}
    for line in open(built_idx / "genome_lengths.out"):
        k, v = line.split()
        gl[int(k)] = int(v)
    assert gl == {g + 1: 2000 for g in range(5)}
    ul = {}
    for line in open(built_idx / "unique_lmer_count_u.out"):
        k, v = line.split()
        ul[int(k)] = int(v)
    # random 2kb genomes: nearly every L-mer is unique (both strands)
    for g in range(1, 6):
        assert ul[g] > 2000, ul


def test_quant_e2e(toy_db, built_idx, tmp_path):
    root, db, map_file, entries = toy_db
    fq = tmp_path / "sim.fq"
    rep = tmp_path / "truth.out"
    simulate(str(map_file), str(db), str(fq), str(rep),
             num_reads=3000, L=100, erate=0.0, seed=1)
    out = tmp_path / "quant.out"
    cli_main([
        "--query",
        "-f", str(map_file),
        "-i", str(built_idx / "index_u.npz"), str(built_idx / "index_d.npz"),
        "-q", str(fq), "-o", str(out),
        "-e", "0.0",
    ])
    blocks = parse_quant_output(str(out))
    assert len(blocks) == 1
    rows = blocks[0]["rows"]
    taxids = sorted(t for t, _, _ in rows)
    assert taxids == [1000, 1001, 1002, 1003, 1004]
    abunds = np.array([a for _, a, _ in rows])
    assert abs(abunds.sum() - 1.0) < 1e-6
    np.testing.assert_allclose(abunds, 0.2, atol=0.03)


def test_quant_e2e_with_errors(toy_db, built_idx, tmp_path):
    root, db, map_file, entries = toy_db
    fq = tmp_path / "sim_err.fq"
    rep = tmp_path / "truth.out"
    simulate(str(map_file), str(db), str(fq), str(rep),
             num_reads=3000, L=100, erate=0.01, seed=2)
    out = tmp_path / "quant_err.out"
    cli_main([
        "--query",
        "-f", str(map_file),
        "-i", str(built_idx / "index_u.npz"), str(built_idx / "index_d.npz"),
        "-q", str(fq), "-o", str(out),
        "-e", "0.01",
    ])
    rows = parse_quant_output(str(out))[0]["rows"]
    assert sorted(t for t, _, _ in rows) == [1000, 1001, 1002, 1003, 1004]
    abunds = np.array([a for _, a, _ in rows])
    np.testing.assert_allclose(abunds, 0.2, atol=0.04)


def test_read_cnts_type1(toy_db, built_idx, tmp_path):
    root, db, map_file, entries = toy_db
    fq = tmp_path / "sim1.fq"
    simulate(str(map_file), str(db), str(fq), str(tmp_path / "t.out"),
             num_reads=500, L=100, erate=0.0, seed=3)
    out = tmp_path / "cnts.out"
    cli_main([
        "--query", "--read_cnts",
        "-f", str(map_file),
        "-i", str(built_idx / "index_u.npz"), str(built_idx / "index_d.npz"),
        "-q", str(fq), "-o", str(out),
    ])
    lines = open(out).read().strip().split("\n")
    assert lines[0].startswith("QUERY/TAXID\t")
    header = [int(x) for x in lines[0].split("\t")[1:]]
    assert header == [1000, 1001, 1002, 1003, 1004]
    counts = [int(x) for x in lines[1].split("\t")[1:]]
    assert sum(counts) > 400  # most reads classified uniquely


def test_read_cnts_type2(toy_db, built_idx, tmp_path):
    root, db, map_file, entries = toy_db
    fq = tmp_path / "sim2.fq"
    simulate(str(map_file), str(db), str(fq), str(tmp_path / "t2.out"),
             num_reads=500, L=100, erate=0.0, seed=4)
    out = tmp_path / "cnts2.out"
    cli_main([
        "--query", "--read_cnts", "--doubly_unique",
        "-f", str(map_file),
        "-i", str(built_idx / "index_u.npz"), str(built_idx / "index_d.npz"),
        "-q", str(fq), "-o", str(out),
    ])
    lines = open(out).read().strip().split("\n")
    counts = [int(x) for x in lines[1].split("\t")[1:]]
    assert sum(counts) > 400


def test_quant_lognormal_abundances(toy_db, built_idx, tmp_path):
    """Non-uniform abundances must be recovered (L1 tolerance)."""
    root, db, map_file, entries = toy_db
    fq = tmp_path / "sim_ln.fq"
    rep = tmp_path / "truth_ln.out"
    simulate(str(map_file), str(db), str(fq), str(rep),
             num_reads=4000, L=100, erate=0.0, dist="lognormal", seed=7)
    truth = {}
    for line in open(rep):
        gid, ab = line.split()
        truth[int(gid)] = float(ab)
    out = tmp_path / "quant_ln.out"
    cli_main([
        "--query",
        "-f", str(map_file),
        "-i", str(built_idx / "index_u.npz"), str(built_idx / "index_d.npz"),
        "-q", str(fq), "-o", str(out),
    ])
    rows = parse_quant_output(str(out))[0]["rows"]
    got = {t - 1000 + 1: a for t, a, _ in rows}
    # all genomes with non-negligible truth must be found
    for gid, ab in truth.items():
        if ab > 0.02:
            assert gid in got, (gid, ab, got)
    l1 = sum(abs(got.get(g, 0.0) - truth[g]) for g in truth)
    assert l1 < 0.1, (l1, got, truth)


def test_multi_file_query(toy_db, built_idx, tmp_path):
    """Multiple -q files: per-file blocks, counters reset between files
    (reference resetCounters, src/query.cpp:259-260)."""
    root, db, map_file, entries = toy_db
    fqs = []
    for k in range(2):
        fq = tmp_path / f"multi{k}.fq"
        simulate(str(map_file), str(db), str(fq), str(tmp_path / f"t{k}.out"),
                 num_reads=1500, L=100, erate=0.0, seed=20 + k,
                 genome_ids=[str(1000 + k), str(1001 + k)])
        fqs.append(str(fq))
    out = tmp_path / "multi.out"
    cli_main([
        "--query", "-f", str(map_file),
        "-i", str(built_idx / "index_u.npz"), str(built_idx / "index_d.npz"),
        "-q", *fqs, "-o", str(out),
    ])
    blocks = parse_quant_output(str(out))
    assert len(blocks) == 2
    t0 = sorted(t for t, _, _ in blocks[0]["rows"])
    t1 = sorted(t for t, _, _ in blocks[1]["rows"])
    assert t0 == [1000, 1001]
    assert t1 == [1001, 1002]


def test_read_length_filter(toy_db, built_idx, tmp_path):
    root, db, map_file, entries = toy_db
    fq = tmp_path / "var.fq"
    simulate(str(map_file), str(db), str(fq), str(tmp_path / "tv.out"),
             num_reads=400, L=100, L_std=20.0, erate=0.0, seed=9)
    out = tmp_path / "var.out"
    cli_main([
        "--query", "--read_cnts",
        "-f", str(map_file),
        "-i", str(built_idx / "index_u.npz"), str(built_idx / "index_d.npz"),
        "-q", str(fq), "-o", str(out),
        "--read_length_filter", "90",
    ])
    lines = open(out).read().strip().split("\n")
    counts = [int(x) for x in lines[1].split("\t")[1:]]
    assert sum(counts) > 0
