"""Pallas TPU kernel: single-pass segmented first-of-run propagation.

The sort-join probe propagates each prefix-run's head values (bucket
id / table-flag) onto the run's probe rows.  XLA's associative_scan does
this in O(log n) full passes over HBM; this kernel does ONE pass: the
TPU grid executes sequentially per core, so a carry in SMEM scratch
flows across blocks; within a block, each of the 8 sublane rows does a
log2(width) doubling sweep and an 8-step cross-row carry chain stitches
them (elements are laid out row-major: block = 8 consecutive chunks of
WIDTH).

out[i] = values[j] at the last j <= i with is_start[j] = 1 (0 if none).

Supports any number of int32 value columns (kernel built per count).
Falls back to the associative-scan implementation off-TPU.
"""

from __future__ import annotations

import numpy as np

ROWS = 8
WIDTH = 2048
BLOCK = ROWS * WIDTH


def _make_kernel(nv: int):
    def _kernel(*refs):
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        flags_ref = refs[0]
        v_refs = refs[1 : 1 + nv]
        o_refs = refs[1 + nv : 1 + 2 * nv]
        carry_ref = refs[1 + 2 * nv]

        i = pl.program_id(0)

        f = flags_ref[...]          # [ROWS, WIDTH] int32 (1 = run start)
        vals = [r[...] for r in v_refs]

        # per-row propagate: doubling sweep along the width axis
        outs = [jnp.where(f > 0, v, 0) for v in vals]
        seen = f
        d = 1
        while d < WIDTH:
            pad = jnp.zeros((ROWS, d), jnp.int32)
            shifted_seen = jnp.concatenate([pad, seen[:, :-d]], axis=1)
            outs = [
                jnp.where(seen > 0, o,
                          jnp.concatenate([pad, o[:, :-d]], axis=1))
                for o in outs
            ]
            seen = jnp.maximum(seen, shifted_seen)
            d *= 2

        # cross-row carry chain (rows are consecutive chunks)
        @pl.when(i == 0)
        def _():
            for k in range(nv + 1):
                carry_ref[0, k] = 0

        c = [carry_ref[0, k] for k in range(nv)]
        cseen = carry_ref[0, nv]
        new_rows = [[] for _ in range(nv)]
        seen_rows = []
        for r in range(ROWS):
            row_seen = seen[r]
            for k in range(nv):
                new_rows[k].append(jnp.where(row_seen > 0, outs[k][r], c[k]))
            seen_rows.append(jnp.maximum(row_seen, cseen))
            c = [new_rows[k][r][WIDTH - 1] for k in range(nv)]
            cseen = seen_rows[r][WIDTH - 1]

        for k in range(nv):
            o_refs[k][...] = jnp.stack(new_rows[k])

        for k in range(nv):
            carry_ref[0, k] = c[k]
        carry_ref[0, nv] = cseen

    return _kernel


def first_of_run_scan_pallas(is_start, *values):
    """Single-pass propagation of values from run starts.

    is_start: bool [n]; values: int32 [n] each.  n padded internally to
    BLOCK.  Positions before the first start get 0 (callers guarantee
    is_start[0] = True, as the sorted join array does).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nv = len(values)
    n = is_start.shape[0]
    npad = (n + BLOCK - 1) // BLOCK * BLOCK
    grid = npad // BLOCK

    def pad(x, dt=jnp.int32):
        x = x.astype(dt)
        if npad != n:
            x = jnp.concatenate([x, jnp.zeros(npad - n, dt)])
        return x.reshape(grid * ROWS, WIDTH)

    flags = pad(is_start.astype(jnp.int32))
    vs = [pad(v) for v in values]

    interpret = jax.default_backend() == "cpu"
    outs = pl.pallas_call(
        _make_kernel(nv),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ROWS, WIDTH), lambda i: (i, 0))
            for _ in range(nv + 1)
        ],
        out_specs=[
            pl.BlockSpec((ROWS, WIDTH), lambda i: (i, 0)) for _ in range(nv)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid * ROWS, WIDTH), jnp.int32)
            for _ in range(nv)
        ],
        scratch_shapes=[pltpu.SMEM((1, nv + 1), jnp.int32)],
        interpret=interpret,
    )(flags, *vs)
    return tuple(o.reshape(npad)[:n] for o in outs)


def first_of_run_scan(is_start, *values, use_pallas: bool | None = None):
    """Dispatcher: XLA associative scan by default; the pallas kernel is
    opt-in (it runs standalone on the axon TPU tunnel but hangs when fused
    into the full classify program — see query/sortjoin.py)."""
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        try:
            return first_of_run_scan_pallas(is_start, *values)
        except Exception:
            pass
    from ..query.sortjoin import _first_of_run_scan

    return _first_of_run_scan(is_start, *values)
