"""Device (jnp) segmented-scan primitives - twins of ops/scans.py."""

from __future__ import annotations


def start_index_jax(starts):
    """Index of each segment's first element."""
    import jax
    import jax.numpy as jnp

    n = starts.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    return jax.lax.cummax(jnp.where(starts, idx, -1))


def segmented_cummin_jax(v, starts):
    """Inclusive forward segmented cumulative min (Hillis-Steele doubling
    with a boundary guard); int32/int64 values."""
    import jax.numpy as jnp

    n = v.shape[0]
    out = v
    first = start_index_jax(starts)
    idx = jnp.arange(n, dtype=jnp.int32)
    d = 1
    big = jnp.iinfo(out.dtype).max
    while d < n:
        ok = idx - d >= first
        cand = jnp.concatenate([jnp.full((d,), big, out.dtype), out[:-d]])
        out = jnp.where(ok, jnp.minimum(out, cand), out)
        d *= 2
    return out


def segmented_cummin_rev_jax(v, ends):
    import jax.numpy as jnp

    return segmented_cummin_jax(v[::-1], ends[::-1])[::-1]
