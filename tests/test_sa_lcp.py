import numpy as np
import pytest

from cammiq_tpu.ops.lcp import lcp_from_sa_numpy, lcp_kasai_scalar
from cammiq_tpu.ops.sa import inverse_permutation, suffix_array_numpy

from oracle import oracle_lcp, oracle_suffix_array


def random_text(rng, n, sigma=4):
    return rng.integers(0, sigma, size=n).astype(np.uint8) + 230


@pytest.mark.parametrize("n,sigma", [(1, 2), (2, 2), (17, 2), (100, 4), (500, 2), (1000, 4)])
def test_sa_numpy_matches_oracle(rng, n, sigma):
    s = random_text(rng, n, sigma)
    sa = suffix_array_numpy(s)
    np.testing.assert_array_equal(sa, oracle_suffix_array(s))


def test_sa_repetitive(rng):
    s = np.frombuffer(b"abababababababab" * 8, dtype=np.uint8)
    sa = suffix_array_numpy(s)
    np.testing.assert_array_equal(sa, oracle_suffix_array(s))


def test_inverse_permutation(rng):
    s = random_text(rng, 64)
    sa = suffix_array_numpy(s)
    rev = inverse_permutation(sa)
    np.testing.assert_array_equal(sa[rev], np.arange(64))


@pytest.mark.parametrize("n,sigma", [(2, 2), (50, 2), (333, 3), (1000, 4)])
def test_lcp_numpy_matches_oracle(rng, n, sigma):
    s = random_text(rng, n, sigma)
    sa = suffix_array_numpy(s)
    got = lcp_from_sa_numpy(s, sa)
    np.testing.assert_array_equal(got, oracle_lcp(s, sa))


def test_lcp_scalar_kasai(rng):
    s = random_text(rng, 300, 2)
    sa = suffix_array_numpy(s)
    np.testing.assert_array_equal(lcp_kasai_scalar(s, sa), oracle_lcp(s, sa))


def test_sa_jax_matches_numpy(rng):
    from cammiq_tpu.ops.sa import suffix_array_jax

    for n, sigma in [(1, 2), (37, 2), (256, 4), (777, 2)]:
        s = random_text(rng, n, sigma)
        sa = np.asarray(suffix_array_jax(s))
        np.testing.assert_array_equal(sa, suffix_array_numpy(s))


def test_lcp_jax_matches_numpy(rng):
    from cammiq_tpu.ops.lcp import lcp_jax

    for n, sigma in [(2, 2), (128, 2), (555, 4)]:
        s = random_text(rng, n, sigma)
        sa = suffix_array_numpy(s)
        got = np.asarray(lcp_jax(s, sa.astype(np.int32)))
        np.testing.assert_array_equal(got, lcp_from_sa_numpy(s, sa))
