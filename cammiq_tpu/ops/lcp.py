"""LCP array construction.

Reference: Kasai-style Phi algorithm with a per-thread carried `len`
(src/gsa.cpp:145-167), LCP values clamped to uint16 (src/gsa.cpp:158).

Engines:
- `lcp_kasai_numpy`: vectorized Kasai.  The sequential carry is replaced by
  a batched "advance all unresolved pairs by blocks" loop: amortized the
  total comparison work is O(N + total_lcp) like scalar Kasai, done in
  full-array numpy steps.
- `lcp_jax`: on-device LCP via blockwise comparison between SA-adjacent
  suffixes, clamped at LCP_CLAMP.  Work is O(N * avg_lcp / block) vector
  ops; fine for metagenomic corpora whose adjacent-LCP distribution decays
  fast, and exact because values are clamped at 65535 anyway.
- native C++ Kasai in native/sais.cpp (production host engine).

Convention (matches reference): LCP[i] = lcp(suffix SA[i-1], suffix SA[i]),
LCP[0] = 0, plus a trailing LCP[n] = 0 slot.
"""

from __future__ import annotations

import numpy as np

LCP_CLAMP = 0xFFFF  # reference clamps LCP to uint16 (src/gsa.cpp:158)


def lcp_from_sa_numpy(s: np.ndarray, sa: np.ndarray, clamp: int = LCP_CLAMP) -> np.ndarray:
    """LCP array via vectorized pairwise extension.

    Returns int64 [n+1] with LCP[0] = LCP[n] = 0.
    """
    s = np.asarray(s)
    sa = np.asarray(sa, dtype=np.int64)
    n = s.shape[0]
    lcp = np.zeros(n + 1, dtype=np.int64)
    if n <= 1:
        return lcp
    a = sa[1:]      # suffix starts
    b = sa[:-1]     # preceding suffix starts
    # Batched extension: compare growing blocks until mismatch; pad the two
    # streams with distinct sentinels so out-of-range positions mismatch.
    cur = np.zeros(n - 1, dtype=np.int64)
    active = np.arange(n - 1)
    block = 32
    maxblock = 1 << 14
    sp_a = np.concatenate([s, np.full(maxblock, 255, dtype=np.uint8)])
    sp_b = np.concatenate([s, np.full(maxblock, 254, dtype=np.uint8)])
    while active.size:
        offs = np.arange(block)
        ia = a[active, None] + cur[active, None] + offs[None, :]
        ib = b[active, None] + cur[active, None] + offs[None, :]
        va = sp_a[np.minimum(ia, n + maxblock - 1)]
        vb = sp_b[np.minimum(ib, n + maxblock - 1)]
        # mark out-of-range as mismatching sentinels
        va = np.where(ia < n, va, 255)
        vb = np.where(ib < n, vb, 254)
        eq = va == vb
        run = np.cumprod(eq, axis=1).sum(axis=1)
        cur[active] += run
        keep = (run == block) & (cur[active] < clamp)
        active = active[keep]
        block = min(block * 4, maxblock)
    lcp[1:n] = np.minimum(cur, clamp)
    return lcp


def lcp_kasai_scalar(s: np.ndarray, sa: np.ndarray, clamp: int = LCP_CLAMP) -> np.ndarray:
    """Plain scalar Kasai (oracle for tests; O(n) but Python-slow)."""
    s = np.asarray(s)
    n = s.shape[0]
    rank = np.empty(n, dtype=np.int64)
    rank[np.asarray(sa, dtype=np.int64)] = np.arange(n)
    lcp = np.zeros(n + 1, dtype=np.int64)
    h = 0
    for i in range(n):
        k = rank[i]
        if k == 0:
            h = 0
            continue
        j = sa[k - 1]
        while i + h < n and j + h < n and s[i + h] == s[j + h]:
            h += 1
        lcp[k] = min(h, clamp)
        if h > 0:
            h -= 1
    return lcp


def lcp_jax(s, sa, max_lcp: int = 1 << 12, block: int = 64):
    """On-device adjacent-suffix LCP by blockwise comparison.

    s: uint8 [n]; sa: int32 [n].  Returns int32 [n+1].

    max_lcp caps the computed LCP (values saturate there).  For index
    construction correctness the cap must exceed every LCP0 value that can
    matter (ulmax + 2, i.e. the read length L + 2); pass a generous cap.
    Suffix pairs whose true LCP exceeds the cap saturate - identical
    clamping semantics to the reference's uint16 clamp when
    max_lcp = 65535.
    """
    import jax
    import jax.numpy as jnp

    s = jnp.asarray(s)
    sa = jnp.asarray(sa, dtype=jnp.int32)
    n = s.shape[0]
    if n <= 1:
        return jnp.zeros(n + 1, dtype=jnp.int32)
    a = sa[1:]
    b = sa[:-1]
    nn = jnp.int32(n)
    # pad text so gathers past the end read a sentinel that never matches
    pad = jnp.full((block,), 255, dtype=s.dtype)
    sp = jnp.concatenate([s, pad])
    sp2 = jnp.concatenate([s, jnp.full((block,), 254, dtype=s.dtype)])

    def body(carry):
        cur, alive, _ = carry
        offs = jnp.arange(block, dtype=jnp.int32)
        ia = jnp.minimum(a[:, None] + cur[:, None] + offs[None, :], nn + block - 1)
        ib = jnp.minimum(b[:, None] + cur[:, None] + offs[None, :], nn + block - 1)
        va = jnp.where(a[:, None] + cur[:, None] + offs[None, :] < nn, sp[ia], 255)
        vb = jnp.where(b[:, None] + cur[:, None] + offs[None, :] < nn, sp2[ib], 254)
        eq = va == vb
        # length of the all-equal prefix of this block
        run = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=1), axis=1)
        newcur = jnp.where(alive, cur + run, cur)
        newalive = alive & (run == block) & (newcur < max_lcp)
        return newcur, newalive, jnp.any(newalive)

    def cond(carry):
        return carry[2]

    cur0 = jnp.zeros(n - 1, dtype=jnp.int32)
    alive0 = jnp.ones(n - 1, dtype=bool)
    cur, _, _ = jax.lax.while_loop(cond, body, (cur0, alive0, jnp.bool_(True)))
    cur = jnp.minimum(cur, max_lcp)
    return jnp.concatenate([jnp.zeros(1, jnp.int32), cur, jnp.zeros(1, jnp.int32)])
