"""Persistent XLA compilation cache for CLI sessions.

A fresh query session on an already-seen index shape pays the full
remote compile (~40 s at the 1000-genome shape, minutes at 60M+
entries) unless the persistent cache is on; with it, the executable
reloads in seconds.  bench.py and benchmarks/ always enable it; the CLI
calls this at startup.

Env: CAMMIQ_JIT_CACHE=<dir> overrides the location, CAMMIQ_JIT_CACHE=0
disables.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> str | None:
    loc = os.environ.get("CAMMIQ_JIT_CACHE", "")
    if loc == "0":
        return None
    if not loc:
        loc = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.join(os.path.expanduser("~"), ".cache")),
            "cammiq_tpu", "jax")
    try:
        os.makedirs(loc, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        return None
    return loc
