"""Read classification: the reference's case analysis as masked vector ops.

Reference: query64_p / query64mt_p / query64_sc (src/query.cpp:458-1080).
Per read, over both strands and both tables, the distinct matched entries
("pnodes") are split into unique ids (entries with refID2 == 0) and
genome pairs; the case analysis then assigns the read:

  P = #distinct pairs, U = #distinct unique ids, r* = the id when U == 1
  P==0: U==0 -> undetermined; U==1 -> cnts_u[r*]++ (+rcounts);
        U>1 -> conflict
  P>=1: U>1 -> conflict
        U==1 -> if every pair contains r*: cnts_u[r*]++ and cnts_d[r*]++
                (+rcounts) else conflict
        U==0, P==1 -> cnts_d[a]++, cnts_d[b]++ (+rcounts)
                      [+ pair count, sc mode]
        U==0, P>=2 -> I = intersection of all pairs (subset of the first
                      pair); |I|==1 -> cnts_d[i*]++ (+rcounts) else conflict

The classifier is split in two stages so the index-sharded distributed
path can all_gather stage-1 match slots across the 'model' mesh axis
before the per-read reductions:

  collect_matches: probe both tables on both strands -> per-read slot
                   arrays (global entry id, rid1, rid2)
  case_analysis:   per-read masked reductions -> counts + assign flags

All ops are fixed-shape, so the whole thing jits into one fused XLA
program and shard_maps over the read batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import numpy as np

from .probe import DeviceIndex, pack_rolling16, probe_strand

BIG = np.int32(2**31 - 1)


class MatchSlots(NamedTuple):
    """Per-read match slots.  slot id = global entry id or BIG (empty)."""

    slots: Any        # int32 [B, S] global entry ids, BIG = empty
    rid1: Any         # int32 [B, S]
    rid2: Any         # int32 [B, S]
    in_u: Any         # bool [B, S]: slot belongs to the unique table


class BatchCounts(NamedTuple):
    """Device pytree of per-batch classification results."""

    cnts_u: Any        # int32 [G] read_cnts_u per species id (index = id)
    cnts_d: Any        # int32 [G]
    rcount_u: Any      # int32 [Eu] per unique-index entry
    rcount_d: Any      # int32 [Ed]
    nundet: Any        # int32 []
    nconf: Any         # int32 []
    pair_lo: Any       # int32 [B] assigned pair (sc accounting) or -1
    pair_hi: Any       # int32 [B]


def revcomp_batch(codes, lengths):
    """Per-read reverse complement: rc[b, t] = 3 - codes[b, rl-1-t]."""
    import jax.numpy as jnp

    B, Lp = codes.shape
    t = jnp.arange(Lp, dtype=jnp.int32)
    src = lengths[:, None] - 1 - t[None, :]
    valid = src >= 0
    src = jnp.clip(src, 0, Lp - 1)
    g = jnp.take_along_axis(codes, src, axis=1)
    return jnp.where(valid, 3 - g, 0).astype(codes.dtype)


def collect_matches(
    didx_u: DeviceIndex,
    didx_d: DeviceIndex,
    codes,
    lengths,
    u_base: int = 0,
    d_base: int | None = None,
):
    """Probe both tables on both strands.

    Global entry ids: unique entries map to [u_base, u_base+Eu), doubly to
    [d_base, d_base+Ed); d_base defaults to Eu (single-device layout).
    Returns MatchSlots with S = 4 * (Lp - h + 1).
    """
    import jax.numpy as jnp

    B, Lp = codes.shape
    h = didx_u.h
    O = max(Lp - h + 1, 1)
    offsets = jnp.arange(O, dtype=jnp.int32)
    Eu = didx_u.length.shape[0]
    Ed = didx_d.length.shape[0]
    if d_base is None:
        d_base = u_base + Eu

    rc = revcomp_batch(codes, lengths)
    eids = []
    for strand_codes in (codes, rc):
        p16 = pack_rolling16(strand_codes)
        for didx in (didx_u, didx_d):
            eids.append(probe_strand(didx, p16, lengths, offsets))

    m_u = jnp.concatenate([eids[0], eids[2]], axis=1)
    m_d = jnp.concatenate([eids[1], eids[3]], axis=1)
    lu = jnp.clip(m_u, 0, Eu - 1)
    ld = jnp.clip(m_d, 0, Ed - 1)
    hit_u = m_u >= 0
    hit_d = m_d >= 0
    ub = jnp.asarray(u_base, jnp.int32)
    db = jnp.asarray(d_base, jnp.int32)
    slots = jnp.concatenate(
        [
            jnp.where(hit_u, m_u + ub, BIG),
            jnp.where(hit_d, m_d + db, BIG),
        ],
        axis=1,
    )
    rid1 = jnp.concatenate(
        [jnp.where(hit_u, didx_u.rid1[lu], 0), jnp.where(hit_d, didx_d.rid1[ld], 0)],
        axis=1,
    )
    rid2 = jnp.concatenate(
        [jnp.where(hit_u, didx_u.rid2[lu], 0), jnp.where(hit_d, didx_d.rid2[ld], 0)],
        axis=1,
    )
    in_u = jnp.concatenate(
        [hit_u, jnp.zeros_like(hit_d)], axis=1
    )
    return MatchSlots(slots=slots, rid1=rid1, rid2=rid2, in_u=in_u)


def _first_true_value(mask, values, fill):
    import jax.numpy as jnp

    idx = jnp.argmax(mask, axis=-1)
    got = jnp.take_along_axis(values, idx[..., None], axis=-1)[..., 0]
    any_ = jnp.any(mask, axis=-1)
    return jnp.where(any_, got, fill)


class CaseResult(NamedTuple):
    cnts_u: Any       # int32 [G]
    cnts_d: Any       # int32 [G]
    assigned: Any     # bool [B] (rcount += 1 for matched entries)
    dslot: Any        # bool [B, S] distinct-entry mask on sorted slots
    sslots: Any       # int32 [B, S] sorted global slot ids
    nundet: Any
    nconf: Any
    pair_lo: Any
    pair_hi: Any


def case_analysis(ms: MatchSlots, lengths, num_genome_slots: int,
                  sc_mode: bool = False) -> CaseResult:
    """The per-read case analysis over (possibly gathered) match slots."""
    import jax
    import jax.numpy as jnp

    slots, rid1_s, rid2_s = ms.slots, ms.rid1, ms.rid2
    B, S = slots.shape

    # sort by slot id; carry payloads
    # unstable: equal slot ids carry identical payloads
    sslots, rid1, rid2 = jax.lax.sort(
        [slots, rid1_s, rid2_s], dimension=1, num_keys=1, is_stable=False
    )
    valid = sslots < BIG
    firstocc = jnp.concatenate(
        [valid[:, :1], valid[:, 1:] & (sslots[:, 1:] != sslots[:, :-1])], axis=1
    )
    dslot = valid & firstocc

    is_single = dslot & (rid2 == 0)
    is_pair = dslot & (rid2 != 0)
    rid_vals = jnp.where(is_single, rid1, BIG)
    rid_sorted = jnp.sort(rid_vals, axis=1)
    rv_valid = rid_sorted < BIG
    rid_first = jnp.concatenate(
        [rv_valid[:, :1], rv_valid[:, 1:] & (rid_sorted[:, 1:] != rid_sorted[:, :-1])],
        axis=1,
    )
    U = jnp.sum(rid_first, axis=1).astype(jnp.int32)
    rstar = _first_true_value(rv_valid, rid_sorted, BIG)

    plo = jnp.where(is_pair, jnp.minimum(rid1, rid2), BIG)
    phi = jnp.where(is_pair, jnp.maximum(rid1, rid2), BIG)
    plo_s, phi_s = jax.lax.sort(
        [plo, phi], dimension=1, num_keys=2, is_stable=False
    )
    pv_valid = plo_s < BIG
    pair_first = jnp.concatenate(
        [
            pv_valid[:, :1],
            pv_valid[:, 1:]
            & ((plo_s[:, 1:] != plo_s[:, :-1]) | (phi_s[:, 1:] != phi_s[:, :-1])),
        ],
        axis=1,
    )
    P = jnp.sum(pair_first, axis=1).astype(jnp.int32)
    a1 = _first_true_value(pv_valid, plo_s, BIG)
    b1 = _first_true_value(pv_valid, phi_s, BIG)

    def all_pairs_contain(x):
        cond = (~is_pair) | (rid1 == x[:, None]) | (rid2 == x[:, None])
        return jnp.all(cond, axis=1)

    pairs_have_rstar = all_pairs_contain(rstar)
    in_all_a = all_pairs_contain(a1)
    in_all_b = all_pairs_contain(b1)

    undet = (P == 0) & (U == 0)
    case_u_only = (P == 0) & (U == 1)
    case_ud = (P >= 1) & (U == 1) & pairs_have_rstar
    case_pair = (P == 1) & (U == 0)
    isect_size = jnp.where(
        P >= 2, in_all_a.astype(jnp.int32) + in_all_b.astype(jnp.int32), 0
    )
    case_isect = (P >= 2) & (U == 0) & (isect_size == 1)
    istar = jnp.where(in_all_a, a1, b1)
    conf = (~undet) & ~(case_u_only | case_ud | case_pair | case_isect)
    assigned = case_u_only | case_ud | case_pair | case_isect

    G = num_genome_slots
    dump = jnp.int32(G)

    def scat(idx, flag):
        tgt = jnp.where(flag, idx, dump)
        return jnp.zeros(G + 1, jnp.int32).at[tgt].add(1)[:G]

    cnts_u = scat(rstar, case_u_only | case_ud)
    cnts_d = (
        scat(rstar, case_ud)
        + scat(a1, case_pair)
        + scat(b1, case_pair)
        + scat(istar, case_isect)
    )

    real = lengths > 0
    nundet = jnp.sum(undet & real).astype(jnp.int32)
    nconf = jnp.sum(conf & real).astype(jnp.int32)

    if sc_mode:
        pair_lo = jnp.where(case_pair & real, a1, -1).astype(jnp.int32)
        pair_hi = jnp.where(case_pair & real, b1, -1).astype(jnp.int32)
    else:
        pair_lo = jnp.full((B,), -1, jnp.int32)
        pair_hi = jnp.full((B,), -1, jnp.int32)

    return CaseResult(
        cnts_u=cnts_u, cnts_d=cnts_d, assigned=assigned,
        dslot=dslot, sslots=sslots,
        nundet=nundet, nconf=nconf, pair_lo=pair_lo, pair_hi=pair_hi,
    )


def rcounts_from_case(case: CaseResult, lo, size: int):
    """rcount[e] = #assigned reads whose distinct match set contains global
    entry id lo + e, for e in [0, size) (an index shard's id range).
    `size` must be static; `lo` may be traced (mesh-position dependent)."""
    import jax.numpy as jnp

    lo = jnp.asarray(lo, jnp.int32)
    rslots = jnp.where(case.dslot & case.assigned[:, None], case.sslots, BIG)
    flat = rslots.reshape(-1)
    inr = (flat >= lo) & (flat < lo + size)
    tgt = jnp.where(inr, flat - lo, size)
    return jnp.zeros(size + 1, jnp.int32).at[tgt].add(1)[:size]


def classify_batch(
    didx_u: DeviceIndex,
    didx_d: DeviceIndex,
    codes,
    lengths,
    num_genome_slots: int,
    with_rcounts: bool = True,
    sc_mode: bool = False,
) -> BatchCounts:
    """Single-device classification of one read batch."""
    import jax.numpy as jnp

    Eu = didx_u.length.shape[0]
    Ed = didx_d.length.shape[0]
    ms = collect_matches(didx_u, didx_d, codes, lengths)
    case = case_analysis(ms, lengths, num_genome_slots, sc_mode=sc_mode)
    if with_rcounts:
        rcount_u = rcounts_from_case(case, 0, Eu)
        rcount_d = rcounts_from_case(case, Eu, Ed)
    else:
        rcount_u = jnp.zeros(Eu, jnp.int32)
        rcount_d = jnp.zeros(Ed, jnp.int32)
    return BatchCounts(
        cnts_u=case.cnts_u, cnts_d=case.cnts_d,
        rcount_u=rcount_u, rcount_d=rcount_d,
        nundet=case.nundet, nconf=case.nconf,
        pair_lo=case.pair_lo, pair_hi=case.pair_hi,
    )
