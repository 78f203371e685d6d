"""Microbenchmarks for the sort primitives used by the sort-join probe.

Run:  python benchmarks/sort_micro.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def timeit(fn, *args, iters=32):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    n = 1_314_483  # N + NB from the bench config
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

    f_1key = jax.jit(lambda x: jax.lax.sort([x], num_keys=1, is_stable=False)[0])
    f_1key_pay = jax.jit(
        lambda x, y: jax.lax.sort([x, y], num_keys=1, is_stable=False))
    f_2key = jax.jit(
        lambda x, y: jax.lax.sort([x, y], num_keys=2, is_stable=False))
    f_4op = jax.jit(
        lambda x, y: jax.lax.sort([x, y, y, y], num_keys=2, is_stable=False))

    print(f"n = {n}")
    print(f"1 key          : {timeit(f_1key, a):7.3f} ms")
    print(f"1 key + payload: {timeit(f_1key_pay, a, b):7.3f} ms")
    print(f"2 keys         : {timeit(f_2key, a, b):7.3f} ms")
    print(f"2 keys + 2 pay : {timeit(f_4op, a, b):7.3f} ms")

    # padded power-of-two vs odd length
    n2 = 1 << 21
    a2 = jnp.asarray(rng.integers(0, 2**32, size=n2, dtype=np.uint32))
    b2 = jnp.asarray(rng.integers(0, 2**32, size=n2, dtype=np.uint32))
    print(f"pow2 n={n2}: 1key {timeit(f_1key, a2):7.3f} ms   "
          f"2key {timeit(f_2key, a2, b2):7.3f} ms")

    # segmented sort: [n/c, c] along last axis
    for c in (2048, 4096, 8192):
        m = (n // c) * c
        a3 = a[:m].reshape(-1, c)
        f_seg = jax.jit(lambda x: jax.lax.sort(
            [x], dimension=1, num_keys=1, is_stable=False)[0])
        print(f"segmented 1key c={c:5d}: {timeit(f_seg, a3):7.3f} ms "
              f"({m} elems)")

    # scatter-add histogram cost at the part2 scale
    k = 38400
    bins = 85685
    idx = jnp.asarray(rng.integers(0, bins, size=k, dtype=np.int32))
    f_sc = jax.jit(lambda i: jnp.zeros(bins + 1, jnp.int32).at[i].add(1))
    print(f"scatter-add {k} -> {bins} bins: {timeit(f_sc, idx):7.3f} ms")
    k2 = 8192
    idx2 = idx[:k2]
    print(f"scatter-add {k2} -> {bins} bins: {timeit(f_sc, idx2):7.3f} ms")

    # gather cost at compaction scale
    src = jnp.asarray(rng.integers(0, 2**31, size=n, dtype=np.int32))
    gidx = jnp.asarray(rng.integers(0, n, size=19200, dtype=np.int32))
    f_g = jax.jit(lambda s, i: s[i])
    print(f"gather 19200 from {n}: {timeit(f_g, src, gidx):7.3f} ms")
    src2 = jnp.asarray(
        rng.integers(0, 2**31, size=(n // 4, 5), dtype=np.int32))
    gidx2 = jnp.asarray(rng.integers(0, n // 4, size=19200, dtype=np.int32))
    f_g2 = jax.jit(lambda s, i: s[i])
    print(f"row-gather 19200x5 from {n//4}: {timeit(f_g2, src2, gidx2):7.3f} ms")


if __name__ == "__main__":
    main()
