"""Round-trip through the reference .bin1/.bin2 bit format."""

import numpy as np
import pytest

from cammiq_tpu.config import BuildConfig
from cammiq_tpu.index.builder import build_index
from cammiq_tpu.index.refcompat import (
    read_reference_index,
    reference_index_to_flat,
    write_reference_index,
)
from cammiq_tpu.io.fasta import corpus_from_sequences

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.fixture(scope="module")
def art(tmp_path_factory):
    rng = np.random.default_rng(11)
    shared = rng.integers(0, 4, 120)
    genomes = []
    for g in range(4):
        own = rng.integers(0, 4, 400)
        ins = int(rng.integers(0, 280))
        seq = np.concatenate([own[:ins], shared, own[ins:]])
        genomes.append([ALPHA[seq].tobytes()])
    corpus = corpus_from_sequences(genomes)
    return build_index(corpus, BuildConfig(k=12, L=60, Lmax=30, h=12, mode="both"),
                       engine="numpy")


@pytest.mark.parametrize("which", ["unique", "doubly"])
def test_roundtrip(art, tmp_path, which):
    idx = art.unique_index if which == "unique" else art.doubly_index
    p = str(tmp_path / f"index.{which}.bin")
    write_reference_index(p, idx)
    back = reference_index_to_flat(p, Lmax=30)
    assert back.h == idx.h
    assert back.is_doubly == idx.is_doubly
    assert back.num_entries == idx.num_entries

    def canon(ix):
        rows = []
        for e in range(ix.num_entries):
            rows.append((
                tuple(int(w) for w in ix.key_words[e]), int(ix.length[e]),
                int(ix.rid1[e]), int(ix.rid2[e]),
                int(ix.ucount1[e]), int(ix.ucount2[e]),
            ))
        return sorted(rows)

    assert canon(back) == canon(idx)


def test_raw_decode_fields(art, tmp_path):
    idx = art.unique_index
    p = str(tmp_path / "u.bin")
    write_reference_index(p, idx)
    entries, hash_len, doubly = read_reference_index(p)
    assert hash_len == idx.h
    assert not doubly
    assert len(entries["codes"]) == idx.num_entries
    lens = sorted(len(c) for c in entries["codes"])
    assert lens == sorted(int(x) for x in idx.length)
