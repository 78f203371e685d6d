"""FlatIndex construction invariants (index/table.py).

The reference aborts the build when one trie key is a proper prefix of
another (abortInsert, /root/reference/src/hashtrie.cpp:146-149); the flat
table must reject the same inputs.  The check sorts keys in SYMBOL
lexicographic order (bit-group-reversed packed words) so the adjacent-pair
scan is exhaustive; raw packed-word order is NOT symbol-lexicographic and
has false negatives (advisor round-2 finding: {AAT, AAAC, AATAC} passed
although AAT is a proper prefix of AATAC).
"""

import numpy as np
import pytest

from cammiq_tpu.index.sparsify import SelectedSubstrings
from cammiq_tpu.index.table import build_flat_index


def _make_selected(text: bytes, specs):
    """specs: list of (start, length) into text; rid=1, occ=1."""
    starts = np.array([s for s, _ in specs], np.int64)
    lens = np.array([l for _, l in specs], np.int64)
    n = len(specs)
    return SelectedSubstrings(
        start=starts, length=lens,
        rid=np.ones(n, np.int64), occ=np.ones(n, np.int64),
        rid2=np.zeros(n, np.int64), occ2=np.zeros(n, np.int64),
        ulm_count=np.ones(1, np.int64),
    )


def _build(keys, h=3):
    text = b"".join(keys)
    seq = np.frombuffer(text, np.uint8)
    pos = 0
    specs = []
    for k in keys:
        specs.append((pos, len(k)))
        pos += len(k)
    return build_flat_index(seq, _make_selected(text, specs), h, 32, False)


def test_prefix_pair_rejected():
    with pytest.raises(ValueError, match="same prefix"):
        _build([b"AAT", b"AATAC"])


def test_prefix_pair_rejected_with_decoy_between():
    # advisor repro: AAAC sorts between AAT and AATAC under raw packed-word
    # order (base 0 at the LOW bits), hiding the violation from an
    # adjacent-pair check; symbol-lex order keeps AATAC adjacent to AAT
    with pytest.raises(ValueError, match="same prefix"):
        _build([b"AAT", b"AAAC", b"AATAC"])


def test_prefix_pair_rejected_across_word_boundary():
    # prefix relation where the extension crosses the 16-base word boundary
    a = b"ACGTACGTACGTACG"          # 15 bases
    b = a + b"TACGT"                # 20 bases, extends into word 1
    decoy = a[:-1] + b"G" + b"AAAA"
    with pytest.raises(ValueError, match="same prefix"):
        _build([a, decoy, b], h=5)


def test_prefix_free_set_accepted():
    idx = _build([b"AATA", b"AATC", b"CGTA", b"AAC"])
    assert idx.num_entries == 4


def test_all_A_prefix_rejected():
    # extension by 'A' bases: packed words of the pair are EQUAL (padding
    # is 0 == A), only the length differs
    with pytest.raises(ValueError, match="same prefix"):
        _build([b"CAA", b"CAAAA"])
