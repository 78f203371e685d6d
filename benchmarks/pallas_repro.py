"""Minimal repro: pallas first-of-run scan standalone vs fused after a
lax.sort in one jit (the production shape that hangs on axon).

Self-contained: the kernel below is the one deleted from
cammiq_tpu/ops/pallas_scan.py in r4 (commit 594f41e) — inlined here so
the repro referenced by query/sortjoin.py's design note keeps running.
On the axon v5e-lite tunnel BOTH cases hang (never complete); on CPU
(interpret mode) both pass.  That measured behavior is why the
production path uses XLA associative scans only.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

ROWS = 8
WIDTH = 2048
BLOCK = ROWS * WIDTH


def _make_kernel(nv: int):
    def _kernel(*refs):
        from jax.experimental import pallas as pl

        flags_ref = refs[0]
        v_refs = refs[1:1 + nv]
        o_refs = refs[1 + nv:1 + 2 * nv]
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
    """out[i] = values[j] at the last j <= i with is_start[j] (0 if none)."""
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
        in_specs=[pl.BlockSpec((ROWS, WIDTH), lambda i: (i, 0))
                  for _ in range(nv + 1)],
        out_specs=[pl.BlockSpec((ROWS, WIDTH), lambda i: (i, 0))
                   for _ in range(nv)],
        out_shape=[jax.ShapeDtypeStruct((grid * ROWS, WIDTH), jnp.int32)
                   for _ in range(nv)],
        scratch_shapes=[pltpu.SMEM((1, nv + 1), jnp.int32)],
        interpret=interpret,
    )(flags, *vs)
    return tuple(o.reshape(npad)[:n] for o in outs)


def standalone(f, v):
    return first_of_run_scan_pallas(f, v)[0]


def fused(k, v):
    sk, sv = jax.lax.sort([k, v], num_keys=1, is_stable=False)
    f = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    out = first_of_run_scan_pallas(f, sv)[0]
    return out.sum()


if __name__ == "__main__":
    N = 1 << 20
    rng = np.random.default_rng(0)
    flags = jnp.asarray((rng.random(N) < 0.01))
    vals = jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))
    keys = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    for name, fn, args in [("standalone", standalone, (flags, vals)),
                           ("fused_after_sort", fused, (keys, vals))]:
        t0 = time.time()
        try:
            r = jax.jit(fn)(*args)
            np.asarray(r)
            print(f"{name}: OK in {time.time()-t0:.1f}s", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)
