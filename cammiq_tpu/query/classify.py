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

All reductions are per-read masked ops on fixed-size match-slot arrays, so
the whole classifier jits to one fused XLA program and shard_maps over the
read batch across the mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import numpy as np

from .probe import DeviceIndex, pack_rolling16, probe_strand

BIG = np.int32(2**31 - 1)


class BatchCounts(NamedTuple):
    """Device pytree of per-batch classification results."""

    cnts_u: Any        # int32 [G] read_cnts_u per species id (index = id)
    cnts_d: Any        # int32 [G]
    rcount_u: Any      # int32 [Eu] per unique-index entry
    rcount_d: Any      # int32 [Ed] per doubly-index entry
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


def _first_true_value(mask, values, fill):
    """values at the first True of mask along the last axis, else fill."""
    import jax.numpy as jnp

    idx = jnp.argmax(mask, axis=-1)
    got = jnp.take_along_axis(values, idx[..., None], axis=-1)[..., 0]
    any_ = jnp.any(mask, axis=-1)
    return jnp.where(any_, got, fill)


def classify_batch(
    didx_u: DeviceIndex,
    didx_d: DeviceIndex,
    codes,
    lengths,
    num_genome_slots: int,
    with_rcounts: bool = True,
    sc_mode: bool = False,
):
    """Classify one read batch.  codes int8 [B, Lp]; lengths int32 [B].

    num_genome_slots = max species id + 1 (counts indexed by species id).
    Returns BatchCounts.
    """
    import jax.numpy as jnp

    B, Lp = codes.shape
    h = didx_u.h
    O = max(Lp - h + 1, 1)
    offsets = jnp.arange(O, dtype=jnp.int32)

    rc = revcomp_batch(codes, lengths)
    eids = []
    for strand_codes in (codes, rc):
        p16 = pack_rolling16(strand_codes)
        for didx in (didx_u, didx_d):
            eids.append(probe_strand(didx, p16, lengths, offsets))
    # slots: [B, S] entry ids; table tag: unique -> [0, Eu), doubly -> [Eu, Eu+Ed)
    Eu = didx_u.length.shape[0]
    ed_off = jnp.int32(Eu)
    m_u = jnp.concatenate([eids[0], eids[2]], axis=1)          # [B, 2O]
    m_d = jnp.concatenate([eids[1], eids[3]], axis=1)
    slot_u = jnp.where(m_u >= 0, m_u, BIG)
    slot_d = jnp.where(m_d >= 0, m_d + ed_off, BIG)
    slots = jnp.concatenate([slot_u, slot_d], axis=1)          # [B, S]
    S = slots.shape[1]

    # ---- distinct matched entries (the pnode set) ----
    sslots = jnp.sort(slots, axis=1)
    valid = sslots < BIG
    firstocc = jnp.concatenate(
        [valid[:, :1], valid[:, 1:] & (sslots[:, 1:] != sslots[:, :-1])], axis=1
    )

    # payload per distinct slot
    e_local = jnp.where(sslots >= ed_off, sslots - ed_off, sslots)
    e_local = jnp.where(valid, e_local, 0)
    is_d = valid & (sslots >= ed_off)
    rid1 = jnp.where(
        is_d, didx_d.rid1[jnp.minimum(e_local, didx_d.rid1.shape[0] - 1)],
        didx_u.rid1[jnp.minimum(e_local, didx_u.rid1.shape[0] - 1)],
    )
    rid2 = jnp.where(
        is_d, didx_d.rid2[jnp.minimum(e_local, didx_d.rid2.shape[0] - 1)],
        didx_u.rid2[jnp.minimum(e_local, didx_u.rid2.shape[0] - 1)],
    )
    dslot = valid & firstocc

    # ---- unique-id set and pair set ----
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
    import jax

    plo_s, phi_s = jax.lax.sort([plo, phi], dimension=1, num_keys=2)
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
    a1 = _first_true_value(pv_valid, plo_s, BIG)     # first distinct pair
    b1 = _first_true_value(pv_valid, phi_s, BIG)

    # pair-membership reductions (over all pair slots == over distinct pairs)
    def all_pairs_contain(x):
        cond = (~is_pair) | (rid1 == x[:, None]) | (rid2 == x[:, None])
        return jnp.all(cond, axis=1)

    pairs_have_rstar = all_pairs_contain(rstar)
    in_all_a = all_pairs_contain(a1)
    in_all_b = all_pairs_contain(b1)

    # ---- case analysis ----
    undet = (P == 0) & (U == 0)
    case_u_only = (P == 0) & (U == 1)
    case_ud = (P >= 1) & (U == 1) & pairs_have_rstar
    case_pair = (P == 1) & (U == 0)
    isect_size = jnp.where(P >= 2, in_all_a.astype(jnp.int32) + in_all_b.astype(jnp.int32), 0)
    case_isect = (P >= 2) & (U == 0) & (isect_size == 1)
    istar = jnp.where(in_all_a, a1, b1)
    conf = (~undet) & ~(case_u_only | case_ud | case_pair | case_isect)
    assigned = case_u_only | case_ud | case_pair | case_isect

    G = num_genome_slots
    dump = jnp.int32(G)  # dropped-scatter slot

    def scat(idx, flag, size):
        tgt = jnp.where(flag, idx, dump)
        return jnp.zeros(size + 1, jnp.int32).at[tgt].add(1)[:size]

    cnts_u = scat(rstar, case_u_only | case_ud, G)
    cnts_d = (
        scat(rstar, case_ud, G)
        + scat(a1, case_pair, G)
        + scat(b1, case_pair, G)
        + scat(istar, case_isect, G)
    )

    if with_rcounts:
        # rcount += 1 for every distinct matched entry of assigned reads
        rslots = jnp.where(dslot & assigned[:, None], sslots, BIG)
        flat = rslots.reshape(-1)
        in_u = flat < ed_off
        tgt_u = jnp.where(in_u, flat, Eu)
        rcount_u = jnp.zeros(Eu + 1, jnp.int32).at[tgt_u].add(1)[:Eu]
        Ed = didx_d.length.shape[0]
        in_d = (flat >= ed_off) & (flat < BIG)
        tgt_d = jnp.where(in_d, flat - ed_off, Ed)
        rcount_d = jnp.zeros(Ed + 1, jnp.int32).at[tgt_d].add(1)[:Ed]
    else:
        rcount_u = jnp.zeros(Eu, jnp.int32)
        rcount_d = jnp.zeros(didx_d.length.shape[0], jnp.int32)

    real = lengths > 0  # padded rows have length 0 -> excluded everywhere
    nundet = jnp.sum(undet & real).astype(jnp.int32)
    nconf = jnp.sum(conf & real).astype(jnp.int32)

    if sc_mode:
        pair_lo = jnp.where(case_pair & real, a1, -1).astype(jnp.int32)
        pair_hi = jnp.where(case_pair & real, b1, -1).astype(jnp.int32)
    else:
        pair_lo = jnp.full((B,), -1, jnp.int32)
        pair_hi = jnp.full((B,), -1, jnp.int32)

    return BatchCounts(
        cnts_u=cnts_u, cnts_d=cnts_d,
        rcount_u=rcount_u, rcount_d=rcount_d,
        nundet=nundet, nconf=nconf,
        pair_lo=pair_lo, pair_hi=pair_hi,
    )
