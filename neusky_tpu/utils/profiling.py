"""Profiling: per-function timing table + XLA trace capture.

Equivalent of nerfstudio's ``profiler.time_function`` decorator used on
every reference pipeline entry point (``neusky_pipeline.py:240,293,315,392``)
plus a ``jax.profiler`` trace context for TPU timeline capture (TPU
equivalent listed in SURVEY §5).
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict

_TIMINGS: Dict[str, list] = defaultdict(list)


def time_function(fn):
    """Decorator: accumulate wall-clock timings per function name."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _TIMINGS[fn.__qualname__].append(time.perf_counter() - t0)
        return out

    return wrapper


def profiler_summary() -> Dict[str, Dict[str, float]]:
    """Per-function {calls, total_s, mean_s} table (ns-train style)."""
    out = {}
    for name, times in _TIMINGS.items():
        out[name] = {
            "calls": len(times),
            "total_s": sum(times),
            "mean_s": sum(times) / len(times),
        }
    return out


def reset_profiler():
    _TIMINGS.clear()


@contextlib.contextmanager
def trace_context(logdir: str = "/tmp/jax_trace"):
    """Capture an XLA/TPU profiler trace for the enclosed block
    (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
