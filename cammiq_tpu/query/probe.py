"""Vectorized index probe (the hot loop).

Replaces the reference's per-offset rolling-hash + trie pointer walk
(src/query.cpp:480-528, src/hashtrie.cpp:350-369) with fixed-shape vector
ops over packed read windows:

  reads [B, Lp] 2-bit codes
    -> rolling 16-base packed words P16 [B, Lp]
    -> per-offset window words W_w[b, o] = P16[b, o + 16 w]
    -> prefix (lo, hi) -> hash -> bounded open-addressing probe
    -> bounded bucket scan with masked full-key compare
    -> matched entry id per (b, o) or -1.

Exactness: index keys are prefix-free (enforced at build), so at most one
entry can match at a given offset; a match requires the entry to lie fully
inside the read (length <= rl - o), identical to the trie-walk semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from ..index.table import FlatIndex

_HASH_C1 = 0x85EBCA6B
_HASH_C2 = 0xC2B2AE35
_GOLDEN = 0x9E3779B9


@dataclasses.dataclass
class DeviceIndex:
    """FlatIndex staged as device arrays (jnp, uint32/int32)."""

    h: int
    kw: int
    max_probes: int
    max_bucket: int
    num_entries: int          # real entry count (before padding)
    table_bits: int
    key_words: Any            # uint32 [E, kw]
    length: Any               # int32 [E]
    rid1: Any                 # int32 [E]
    rid2: Any                 # int32 [E]
    ucount1: Any              # int32 [E]
    ucount2: Any              # int32 [E]
    table_lo: Any             # uint32 [T]
    table_hi: Any             # uint32 [T]
    table_start: Any          # int32 [T]
    table_count: Any          # int32 [T]


def to_device_index(idx: FlatIndex) -> DeviceIndex:
    import jax.numpy as jnp

    E = idx.num_entries
    if E == 0:
        # single never-matching dummy entry keeps gather shapes valid
        key_words = np.zeros((1, idx.kw), np.uint32)
        length = np.full(1, 1 << 30, np.int32)
        rid1 = rid2 = uc1 = uc2 = np.zeros(1, np.int32)
    else:
        key_words, length = idx.key_words, idx.length
        rid1, rid2, uc1, uc2 = idx.rid1, idx.rid2, idx.ucount1, idx.ucount2
    t = idx.table_size
    return DeviceIndex(
        h=idx.h,
        kw=idx.kw,
        max_probes=max(1, idx.max_probes),
        max_bucket=max(1, idx.max_bucket),
        num_entries=E,
        table_bits=int(t).bit_length() - 1,
        key_words=jnp.asarray(key_words, jnp.uint32),
        length=jnp.asarray(length, jnp.int32),
        rid1=jnp.asarray(rid1, jnp.int32),
        rid2=jnp.asarray(rid2, jnp.int32),
        ucount1=jnp.asarray(uc1, jnp.int32),
        ucount2=jnp.asarray(uc2, jnp.int32),
        table_lo=jnp.asarray(idx.table_lo, jnp.uint32),
        table_hi=jnp.asarray(idx.table_hi, jnp.uint32),
        table_start=jnp.asarray(idx.table_start, jnp.int32),
        table_count=jnp.asarray(idx.table_count, jnp.int32),
    )


def _mix32_j(x):
    import jax.numpy as jnp

    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(_HASH_C1)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(_HASH_C2)
    x = x ^ (x >> 16)
    return x


def hash_prefix_j(lo, hi):
    import jax.numpy as jnp

    return _mix32_j(lo.astype(jnp.uint32) ^ _mix32_j(hi.astype(jnp.uint32) + jnp.uint32(_GOLDEN)))


def pack_rolling16(codes):
    """codes int8/int32 [B, Lp] -> P16 uint32 [B, Lp]:
    P16[b, t] = sum_{s<16} codes[b, t+s] << 2s (codes past Lp read as 0)."""
    import jax.numpy as jnp

    B, Lp = codes.shape
    c = codes.astype(jnp.uint32)
    pad = jnp.zeros((B, 16), jnp.uint32)
    cp = jnp.concatenate([c, pad], axis=1)
    out = jnp.zeros((B, Lp), jnp.uint32)
    for s in range(16):
        out = out | (cp[:, s : s + Lp] << (2 * s))
    return out


def _prefix_masks(h: int):
    nb0 = min(h, 16)
    m0 = 0xFFFFFFFF if nb0 >= 16 else (1 << (2 * nb0)) - 1
    nb1 = min(max(h - 16, 0), 16)
    m1 = 0xFFFFFFFF if nb1 >= 16 else (1 << (2 * nb1)) - 1
    return m0, m1


def probe_strand(didx: DeviceIndex, p16, lengths, offsets):
    """Match entries at every offset of one strand.

    p16: uint32 [B, Lp] rolling words; lengths: int32 [B]; offsets: int32
    [O] (static arange).  Returns int32 [B, O]: matched entry id or -1.
    """
    import jax
    import jax.numpy as jnp

    B, Lp = p16.shape
    O = offsets.shape[0]
    h, kw = didx.h, didx.kw
    tmask = jnp.uint32((1 << didx.table_bits) - 1)

    def window_word(w):
        # W_w[b, o] = p16[b, o + 16 w] (0 beyond Lp)
        start = 16 * w
        if start >= Lp:
            return jnp.zeros((B, O), jnp.uint32)
        sl = p16[:, start:]
        if sl.shape[1] < O:
            sl = jnp.concatenate(
                [sl, jnp.zeros((B, O - sl.shape[1]), jnp.uint32)], axis=1
            )
        return sl[:, :O]

    W = [window_word(w) for w in range(kw)]
    m0, m1 = _prefix_masks(h)
    plo = W[0] & jnp.uint32(m0)
    phi = (W[1] & jnp.uint32(m1)) if h > 16 else jnp.zeros_like(plo)

    slot0 = hash_prefix_j(plo, phi) & tmask
    bstart = jnp.full((B, O), -1, jnp.int32)
    bcount = jnp.zeros((B, O), jnp.int32)
    for p in range(didx.max_probes):
        slot = (slot0 + jnp.uint32(p)) & tmask
        tlo = didx.table_lo[slot]
        thi = didx.table_hi[slot]
        ts = didx.table_start[slot]
        tc = didx.table_count[slot]
        hit = (tlo == plo) & (thi == phi) & (ts >= 0) & (bstart < 0)
        bstart = jnp.where(hit, ts, bstart)
        bcount = jnp.where(hit, tc, bcount)

    # bucket scan with masked full-key compare
    avail = lengths[:, None] - offsets[None, :]      # usable bases at offset
    found = jnp.full((B, O), -1, jnp.int32)
    e_base = jnp.maximum(bstart, 0)
    for c in range(didx.max_bucket):
        e = e_base + c
        valid = (bstart >= 0) & (c < bcount)
        e = jnp.minimum(e, didx.length.shape[0] - 1)
        elen = didx.length[e]
        ok = valid & (elen <= avail) & (found < 0)
        match = ok
        for w in range(kw):
            nb = jnp.clip(elen - 16 * w, 0, 16)
            mask = jnp.where(
                nb >= 16,
                jnp.uint32(0xFFFFFFFF),
                (jnp.uint32(1) << (2 * nb.astype(jnp.uint32))) - jnp.uint32(1),
            )
            match = match & ((W[w] & mask) == didx.key_words[e, w])
        found = jnp.where(match, e.astype(jnp.int32), found)
    return found
