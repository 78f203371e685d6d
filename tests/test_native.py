"""Native C++ kernels (SA-IS, Kasai, FASTQ parser) vs. numpy engines."""

import numpy as np
import pytest

from cammiq_tpu import native
from cammiq_tpu.ops.lcp import lcp_from_sa_numpy
from cammiq_tpu.ops.sa import suffix_array_numpy

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


@pytest.mark.parametrize("n,sigma", [(1, 2), (2, 2), (64, 2), (1000, 4), (5000, 3), (20000, 4)])
def test_native_sais(rng, n, sigma):
    s = rng.integers(0, sigma, size=n).astype(np.uint8) + 230
    np.testing.assert_array_equal(native.suffix_array(s), suffix_array_numpy(s))


def test_native_sais_repetitive(rng):
    s = np.frombuffer(b"abcabcabcabc" * 100 + b"xy", dtype=np.uint8)
    np.testing.assert_array_equal(native.suffix_array(s), suffix_array_numpy(s))


def test_native_sais_corpus_like(rng):
    # corpus-like: offset bases + low separator bytes + sentinels
    from cammiq_tpu.io.fasta import corpus_from_sequences

    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [[alpha[rng.integers(0, 4, 500)].tobytes()] for _ in range(3)]
    corpus = corpus_from_sequences(genomes)
    s = corpus.seq
    np.testing.assert_array_equal(native.suffix_array(s), suffix_array_numpy(s))


@pytest.mark.parametrize("n,sigma", [(2, 2), (1000, 2), (5000, 4)])
def test_native_kasai(rng, n, sigma):
    s = rng.integers(0, sigma, size=n).astype(np.uint8) + 230
    sa = native.suffix_array(s)
    np.testing.assert_array_equal(native.lcp_kasai(s, sa), lcp_from_sa_numpy(s, sa))


def test_native_fastq_parser(tmp_path, rng):
    import ctypes

    from cammiq_tpu.io.fastq import read_fastq

    lines = []
    reads = []
    for i in range(50):
        L = int(rng.integers(60, 120))
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        if i % 7 == 0:
            seq = seq[:10] + "N" + seq[11:]
        reads.append(seq)
        lines += [f"@r{i}", seq, "+", "I" * L]
    p = tmp_path / "t.fq"
    p.write_text("\n".join(lines) + "\n")

    lib = native._load()
    lib.cammiq_parse_fastq.restype = ctypes.c_int64
    buf = p.read_bytes()
    max_reads, max_len = 100, 128
    codes = np.zeros((max_reads, max_len), np.int8)
    lengths = np.zeros(max_reads, np.int32)
    r = lib.cammiq_parse_fastq(
        buf, ctypes.c_int64(len(buf)),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(max_reads), ctypes.c_int32(max_len),
        ctypes.c_int32(0), ctypes.c_uint64(7),
    )
    assert r == 50
    want = read_fastq(str(p), max_len=max_len, engine="python")
    np.testing.assert_array_equal(lengths[:50], want.lengths)
    # all non-N positions must agree
    for i, seq in enumerate(reads):
        for t, ch in enumerate(seq[:max_len]):
            if ch in "ACGT":
                assert codes[i, t] == "ACGT".index(ch)


def test_read_fastq_native_engine_parity(tmp_path, rng):
    """The bound native loader (engine='native', the read_fastq default
    when the library is built) must match the Python loader exactly on
    N-free input, including the min-length filter and truncation."""
    from cammiq_tpu.io.fastq import read_fastq

    lines = []
    for i in range(500):
        L = int(rng.integers(5, 300))
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        lines += [f"@r{i}", seq, "+", "I" * L]
    p = tmp_path / "t2.fq"
    p.write_text("\n".join(lines) + "\n")
    for min_len, max_len in ((0, 256), (60, 256), (0, 128)):
        a = read_fastq(str(p), min_len=min_len, max_len=max_len,
                       engine="native")
        b = read_fastq(str(p), min_len=min_len, max_len=max_len,
                       engine="python")
        assert a.num_reads == b.num_reads
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_array_equal(a.lengths, b.lengths)
        assert a.total_len == b.total_len
