"""Tracing / per-phase timing (the reference has none — SURVEY §5).

- ``phase_timer``: lightweight wall-clock accounting per named phase
  (GMM_opt / Reg_opt / Template_opt ...), aggregated in a global registry;
  PSR objects use it when ``psr.enable_timing = True``.
- ``trace``: context manager around ``jax.profiler`` for TPU traces
  (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_TIMINGS: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def phase_timer(name: str, sync=None):
    """Time a phase; ``sync`` may be a callable returning a host value to
    force device completion (e.g. ``lambda: float(psr.FE)``)."""
    t0 = time.time()
    yield
    if sync is not None:
        sync()
    _TIMINGS[name].append(time.time() - t0)


def timings_summary(reset: bool = False) -> dict:
    out = {
        k: {"n": len(v), "total_s": sum(v), "mean_s": sum(v) / len(v)}
        for k, v in _TIMINGS.items()
        if v
    }
    if reset:
        _TIMINGS.clear()
    return out


@contextlib.contextmanager
def trace(logdir: str = "/tmp/difficp_trace"):
    """jax.profiler trace around a code region (TPU timeline)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
