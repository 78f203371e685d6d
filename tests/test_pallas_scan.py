"""Pallas single-pass first-of-run scan vs. the associative-scan baseline
(interpret mode on CPU)."""

import numpy as np
import pytest


@pytest.mark.parametrize("n,seed", [(100, 0), (2048, 1), (5000, 2), (100000, 3)])
def test_pallas_scan_matches_baseline(n, seed):
    import jax.numpy as jnp

    from cammiq_tpu.ops.pallas_scan import first_of_run_scan_pallas
    from cammiq_tpu.query.sortjoin import _first_of_run_scan

    rng = np.random.default_rng(seed)
    is_start = rng.random(n) < 0.05
    is_start[0] = True
    vals = [rng.integers(0, 1000, n).astype(np.int32) for _ in range(3)]

    want = _first_of_run_scan(
        jnp.asarray(is_start), *[jnp.asarray(v) for v in vals]
    )
    got = first_of_run_scan_pallas(
        jnp.asarray(is_start), *[jnp.asarray(v) for v in vals]
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_no_leading_start():
    import jax.numpy as jnp

    from cammiq_tpu.ops.pallas_scan import first_of_run_scan_pallas

    n = 4096
    is_start = np.zeros(n, bool)
    is_start[3000] = True
    v = np.full(n, 7, np.int32)
    (out,) = [np.asarray(x) for x in first_of_run_scan_pallas(
        jnp.asarray(is_start), jnp.asarray(v), jnp.asarray(v), jnp.asarray(v)
    )][:1]
    assert (out[:3000] == 0).all()
    assert (out[3000:] == 7).all()
