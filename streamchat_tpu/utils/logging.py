"""Structured logging + per-phase timing.

Replaces the reference's ad-hoc ANSI `print`s (utiles.py:31-39) and raw
`time.time()` deltas (inference_streaming_longva_v2.py:119-160) with the
stdlib logging module and a timer that still produces the per-question
`process_time` field persisted into StreamBench results JSON
(inference_streaming_longva_v2.py:657).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator

_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def get_logger(name: str = "streamchat_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logging.getLogger("streamchat_tpu").handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        root = logging.getLogger("streamchat_tpu")
        root.addHandler(handler)
        root.setLevel(logging.INFO)
        root.propagate = False
    return logger


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    `timer["retrieval"] + timer["prompt"]` reproduces the reference's
    `process_time`; `timer["generate"]` its generate time.
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def __getitem__(self, name: str) -> float:
        return self.totals.get(name, 0.0)

    def mean(self, name: str) -> float:
        n = self.counts.get(name, 0)
        return self.totals[name] / n if n else 0.0

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)
