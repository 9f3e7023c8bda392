"""Short-term visual memory: Ebbinghaus-weighted FIFO over recent frames.

Reference: the short-memory branch of `updating_memory_buffer`
(inference_streaming_longva_v2.py:319-337) — keep the last `short_window`
frame features, then sample `remember_window` of them without replacement
with retention probabilities exp(-t/tau) normalized over the window
(`calculate_forgetting_probabilities` / `select_data_without_replacement`,
utiles.py:251-262).
"""

from __future__ import annotations

from collections import deque
from typing import Deque, List

import jax
import jax.numpy as jnp

from streamchat_tpu.ops.forgetting import select_short_memory


class ShortTermMemory:
    """Fixed-capacity FIFO of per-frame features [P, D]."""

    def __init__(self, short_window: int, remember_window: int, tau: float) -> None:
        if remember_window > short_window:
            raise ValueError("remember_window cannot exceed short_window")
        self.short_window = short_window
        self.remember_window = remember_window
        self.tau = tau
        self._buf: Deque[jnp.ndarray] = deque(maxlen=short_window)

    def extend(self, frame_features: jnp.ndarray) -> None:
        """Append frames [N, P, D]; the deque drops the oldest beyond
        short_window (reference list tail-slice :319-323)."""
        for i in range(frame_features.shape[0]):
            self._buf.append(frame_features[i])

    def __len__(self) -> int:
        return len(self._buf)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        """Sample remember_window frames -> [R, P, D] in temporal order.

        When the buffer holds fewer than remember_window frames, everything
        is returned (reference takes the whole buffer in that case).
        """
        if not self._buf:
            raise ValueError("short-term memory is empty (reference asserts at "
                             "inference_streaming_longva_v2.py:371)")
        window = jnp.stack(list(self._buf))                  # [W, P, D]
        if window.shape[0] <= self.remember_window:
            return window
        return select_short_memory(key, window, self.remember_window, self.tau)

    def features(self) -> List[jnp.ndarray]:
        return list(self._buf)

    def clear(self) -> None:
        self._buf.clear()
