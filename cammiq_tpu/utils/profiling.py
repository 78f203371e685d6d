"""jax.profiler integration (the reference's per-stage chrono timers plus
a real structured device profile, SURVEY.md section 5.1)."""

from __future__ import annotations

import contextlib
import os
from typing import Optional


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """Capture a jax.profiler trace (TensorBoard format) around a block;
    no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """TraceAnnotation for nested spans inside a device trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)
