"""Pallas TPU kernel: single-pass segmented first-of-run propagation.

The sort-join probe propagates each prefix-run's head values (bucket
start/count/table-flag) onto the run's probe rows.  XLA's
associative_scan does this in O(log n) full passes over HBM; this kernel
does ONE pass: the TPU grid executes sequentially per core, so a carry in
SMEM scratch flows across blocks; within a block, each of the 8 sublane
rows does a log2(width) doubling sweep and an 8-step cross-row carry
chain stitches them (elements are laid out row-major: block = 8
consecutive chunks of WIDTH).

out[i] = values[j] at the last j <= i with is_start[j] = 1 (0 if none).

Falls back to the associative-scan implementation off-TPU.
"""

from __future__ import annotations

import numpy as np

ROWS = 8
WIDTH = 2048
BLOCK = ROWS * WIDTH


def _kernel(flags_ref, v0_ref, v1_ref, v2_ref, o0_ref, o1_ref, o2_ref,
            carry_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    f = flags_ref[...]          # [ROWS, WIDTH] int32 (1 = run start)
    vals = [v0_ref[...], v1_ref[...], v2_ref[...]]

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
        carry_ref[0, 0] = 0
        carry_ref[0, 1] = 0
        carry_ref[0, 2] = 0
        carry_ref[0, 3] = 0

    c = [carry_ref[0, k] for k in range(3)]
    cseen = carry_ref[0, 3]
    new_rows = [[], [], []]
    seen_rows = []
    for r in range(ROWS):
        row_seen = seen[r]
        for k in range(3):
            new_rows[k].append(jnp.where(row_seen > 0, outs[k][r], c[k]))
        seen_rows.append(jnp.maximum(row_seen, cseen))
        c = [new_rows[k][r][WIDTH - 1] for k in range(3)]
        cseen = seen_rows[r][WIDTH - 1]

    o0_ref[...] = jnp.stack(new_rows[0])
    o1_ref[...] = jnp.stack(new_rows[1])
    o2_ref[...] = jnp.stack(new_rows[2])

    carry_ref[0, 0] = c[0]
    carry_ref[0, 1] = c[1]
    carry_ref[0, 2] = c[2]
    carry_ref[0, 3] = cseen


def first_of_run_scan_pallas(is_start, v0, v1, v2):
    """Single-pass propagation of (v0, v1, v2) from run starts.

    is_start: bool [n]; v*: int32 [n].  n padded internally to BLOCK.
    Positions before the first start get 0 (callers guarantee
    is_start[0] = True, as the sorted join array does).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = is_start.shape[0]
    npad = (n + BLOCK - 1) // BLOCK * BLOCK
    grid = npad // BLOCK

    def pad(x, dt=jnp.int32):
        x = x.astype(dt)
        if npad != n:
            x = jnp.concatenate([x, jnp.zeros(npad - n, dt)])
        return x.reshape(grid * ROWS, WIDTH)

    flags = pad(is_start.astype(jnp.int32))
    vs = [pad(v) for v in (v0, v1, v2)]

    interpret = jax.default_backend() == "cpu"
    outs = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ROWS, WIDTH), lambda i: (i, 0)) for _ in range(4)
        ],
        out_specs=[
            pl.BlockSpec((ROWS, WIDTH), lambda i: (i, 0)) for _ in range(3)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid * ROWS, WIDTH), jnp.int32)
            for _ in range(3)
        ],
        scratch_shapes=[pltpu.SMEM((1, 4), jnp.int32)],
        interpret=interpret,
    )(flags, *vs)
    return tuple(o.reshape(npad)[:n] for o in outs)


def first_of_run_scan(is_start, *values, use_pallas: bool | None = None):
    """Dispatcher: pallas single-pass on TPU, associative scan elsewhere."""
    import jax

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",) and len(values) == 3
    if use_pallas and len(values) == 3:
        try:
            return first_of_run_scan_pallas(is_start, *values)
        except Exception:
            pass
    from ..query.sortjoin import _first_of_run_scan

    return _first_of_run_scan(is_start, *values)
