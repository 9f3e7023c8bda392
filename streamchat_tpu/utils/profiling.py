"""Tracing / profiling utilities.

The reference instruments with ad-hoc `time.time()` deltas printed per phase
and persists a per-answer `process_time` (SURVEY.md §5). This module gives
the same phase timing a real structure plus optional `jax.profiler` traces:

  timer = PhaseTimer()
  with timer.phase("ingest"): ...
  with timer.phase("answer"): ...
  timer.totals  # {"ingest": s, "answer": s}

Set STREAMCHAT_TRACE_DIR to capture a TensorBoard-loadable device trace of
everything inside `maybe_device_trace()`.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator


class PhaseTimer:
    def __init__(self, annotate: bool = False) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        # annotate=True additionally emits a jax.profiler.TraceAnnotation
        # named "phase=<name>" per window so device traces can be bucketed
        # per phase (utils.traceparse.device_seconds_by_phase; '=' because
        # TraceMe strips anything before a ':'). Off by default: importing
        # jax here would break import hermeticity for non-jax users.
        self.annotate = annotate

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        ctx = contextlib.nullcontext()
        if self.annotate:
            import jax

            ctx = jax.profiler.TraceAnnotation(f"phase={name}")
        t0 = time.perf_counter()
        try:
            with ctx:
                yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def mean(self, name: str) -> float:
        c = self.counts.get(name, 0)
        return self.totals[name] / c if c else 0.0

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def maybe_device_trace() -> Iterator[None]:
    """jax.profiler trace gated on STREAMCHAT_TRACE_DIR (no-op otherwise)."""
    trace_dir = os.environ.get("STREAMCHAT_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
