"""Minimal repro: pallas first-of-run scan standalone vs fused after a
lax.sort in one jit (the production shape that hangs on axon)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from cammiq_tpu.ops.pallas_scan import first_of_run_scan_pallas

N = 1 << 20
rng = np.random.default_rng(0)
flags = jnp.asarray((rng.random(N) < 0.01))
vals = jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))
keys = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))

def standalone(f, v):
    return first_of_run_scan_pallas(f, v)[0]

def fused(k, v):
    sk, sv = jax.lax.sort([k, v], num_keys=1, is_stable=False)
    f = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    out = first_of_run_scan_pallas(f, sv)[0]
    return out.sum()

for name, fn, args in [("standalone", standalone, (flags, vals)),
                       ("fused_after_sort", fused, (keys, vals))]:
    t0 = time.time()
    try:
        r = jax.jit(fn)(*args)
        np.asarray(r)
        print(f"{name}: OK in {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)
