"""Chained microbenchmarks (each iteration depends on the previous output,
so no execution can be elided/cached).

Run:  python benchmarks/sort_micro2.py
"""

from __future__ import annotations

import os
import time

import numpy as np


def timeit_chain(fn, x0, iters=32):
    """fn: x -> x (same shape/dtype). Chains iterations."""
    import jax

    x = fn(x0)
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.time() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    n = 1_314_483
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    C = jnp.uint32(0x9E3779B1)

    @jax.jit
    def f1(x):
        s = jax.lax.sort([x], num_keys=1, is_stable=False)[0]
        return s * C + jnp.uint32(1)  # remix so next sort differs

    @jax.jit
    def f2(xy):
        x, y = xy
        sx, sy = jax.lax.sort([x, y], num_keys=2, is_stable=False)
        return (sx * C + jnp.uint32(1), sy ^ sx)

    @jax.jit
    def f1p(xy):
        x, y = xy
        sx, sy = jax.lax.sort([x, y], num_keys=1, is_stable=False)
        return (sx * C + jnp.uint32(1), sy ^ sx)

    @jax.jit
    def f4(xs):
        x, y, z, w = xs
        o = jax.lax.sort([x, y, z, w], num_keys=2, is_stable=False)
        return (o[0] * C + jnp.uint32(1), o[1] ^ o[0], o[2] ^ o[0], o[3] ^ o[0])

    print(f"n = {n} (chained, no caching possible)")
    print(f"1 key          : {timeit_chain(f1, a):7.3f} ms")
    print(f"1 key + payload: {timeit_chain(f1p, (a, b)):7.3f} ms")
    print(f"2 keys         : {timeit_chain(f2, (a, b)):7.3f} ms")
    print(f"2 keys + 2 pay : {timeit_chain(f4, (a, b, b, a)):7.3f} ms")

    # segmented
    for c in (4096, 8192, 16384):
        m = (n // c) * c

        @jax.jit
        def fseg(x):
            s = jax.lax.sort([x], dimension=1, num_keys=1, is_stable=False)[0]
            return s * C + jnp.uint32(1)

        a3 = a[:m].reshape(-1, c)
        print(f"segmented 1key c={c:5d}: {timeit_chain(fseg, a3):7.3f} ms")

    # elementwise pass over n for reference (HBM bandwidth probe)
    @jax.jit
    def fel(x):
        return x * C + jnp.uint32(7)

    ms = timeit_chain(fel, a, iters=64)
    print(f"elementwise 1-in-1-out pass: {ms:7.3f} ms "
          f"({n*8/ms*1e3/1e9:.0f} GB/s effective)")

    # scatter-add histogram, chained via bins
    k = 38400
    bins = 85685
    idx0 = jnp.asarray(rng.integers(0, bins, size=k, dtype=np.int32))

    @jax.jit
    def fsc(idx):
        h = jnp.zeros(bins + 1, jnp.int32).at[idx].add(1)
        return (idx + h[:k]) % bins

    print(f"scatter-add {k} -> {bins}: {timeit_chain(fsc, idx0):7.3f} ms")

    k2 = 4096
    idx2 = idx0[:k2]

    @jax.jit
    def fsc2(idx):
        h = jnp.zeros(bins + 1, jnp.int32).at[idx].add(1)
        return (idx + h[:k2]) % bins

    print(f"scatter-add {k2} -> {bins}: {timeit_chain(fsc2, idx2):7.3f} ms")

    # gathers, chained
    gidx0 = jnp.asarray(rng.integers(0, n, size=19200, dtype=np.int32))
    src = jnp.asarray(rng.integers(1, 2**31, size=n, dtype=np.int32))

    @jax.jit
    def fg(gi):
        v = src[gi]
        return (gi + v) % n

    print(f"gather 19200 from {n}: {timeit_chain(fg, gidx0):7.3f} ms")

    srcr = jnp.asarray(rng.integers(1, 2**31, size=(n // 4, 5), dtype=np.int32))
    gidx1 = jnp.asarray(rng.integers(0, n // 4, size=19200, dtype=np.int32))

    @jax.jit
    def fgr(gi):
        v = srcr[gi]
        return (gi + v[:, 0] + v[:, 4]) % (n // 4)

    print(f"row-gather 19200x5: {timeit_chain(fgr, gidx1):7.3f} ms")


if __name__ == "__main__":
    main()
