"""Observability: structured run records + profiler hooks.

The reference's observability is stdout bench lines + external sampling
profilers on infinite loops (SURVEY.md §5). swtpu's equivalents:
- :class:`RunLog`: JSON-lines run records (kernel, batch, dtype, wall ms,
  GCUPS, parity status) — machine-readable continuity with the reference's
  ``<name>: <ms> ms / <N>`` text logs;
- :func:`profile_trace`: a jax.profiler trace context for TensorBoard
  (replaces "attach VS2017 profiler to an infinite loop", README.md:6 —
  the infinite-loop mode still exists as ``bench_suite --forever``).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Optional


class RunLog:
    """JSON-lines structured logger."""

    def __init__(self, path: Optional[str] = None):
        self._fh = open(path, "a") if path else sys.stderr

    def emit(self, **record):
        record.setdefault("ts", round(time.time(), 3))
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    @contextlib.contextmanager
    def timed(self, event: str, **fields):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.emit(
                event=event,
                wall_ms=round((time.perf_counter() - t0) * 1e3, 2),
                **fields,
            )


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context; view with TensorBoard."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def gcups(cells: int, seconds: float) -> float:
    return cells / seconds / 1e9
