"""Live streaming session (on_line mode): concurrent ingest + memory update.

Rebuild of the reference's threaded live-demo choreography
(`previous_version/streaming_demo_llava_next_3.py:959-1000`, simulated at
`utiles.py:1776-1857`): a reader keeps pushing frame features while a worker
thread turns full chunks into captioned tree nodes; questions can arrive at
any moment and see a consistent snapshot.

Differences from the reference's Event/flag choreography (which blocks the
reader during every update and trips on shared-list indices —
`buffer[length:]  # out of index`): a bounded Queue feeds the worker whole
chunks, the tree is guarded by one lock, and `ask()` drains the queue before
answering — no shared mutable buffer, no lost updates.

Note: the simulation guards per-chunk k-means with `>= chunk_size`
(utiles.py:1820) — corroborating that the main path's `>` guard
(inference_streaming_longva_v2.py:347) is the bug our memory_update fixes.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from streamchat_tpu.config import MemoryConfig
from streamchat_tpu.memory.short_term import ShortTermMemory
from streamchat_tpu.memory.tree import VisualMemoryTree
from streamchat_tpu.ops.kmeans import weighted_kmeans_feature

CaptionFn = Callable[[jnp.ndarray], str]


class StreamingSession:
    """Incremental video QA session; thread-safe push / ask."""

    def __init__(
        self,
        tree: VisualMemoryTree,
        caption_fn: CaptionFn,
        cfg: MemoryConfig,
        key: jax.Array,
        cluster_full_chunks: bool = True,
    ) -> None:
        self.tree = tree
        self.cfg = cfg
        self._caption = caption_fn
        self._cluster = cluster_full_chunks
        self._key = key
        self.short_term = ShortTermMemory(
            cfg.short_window, cfg.remember_window, cfg.tau
        )
        self._pending: List[jnp.ndarray] = []    # frames awaiting a full chunk
        self._chunks: queue.Queue = queue.Queue(maxsize=8)
        self._tree_lock = threading.Lock()
        # Guards the short-term deque: snapshotting it in ask() races with
        # concurrent extend() (deque iteration during mutation raises).
        self._short_lock = threading.Lock()
        self._key_lock = threading.Lock()
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _next_key(self) -> jax.Array:
        # Called from both the worker and ask(); an unguarded read-modify-
        # write could hand out the same key twice.
        with self._key_lock:
            self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    # Producer side
    # ------------------------------------------------------------------

    def push(self, features: jnp.ndarray) -> None:
        """Feed encoded frame features [N, P, D] as they stream in."""
        with self._short_lock:
            self.short_term.extend(features)
        for i in range(features.shape[0]):
            self._pending.append(features[i])
            if len(self._pending) >= self.cfg.chunk_size:
                chunk = jnp.stack(self._pending[: self.cfg.chunk_size])
                del self._pending[: self.cfg.chunk_size]
                self._chunks.put(chunk)          # blocks if worker is behind

    def flush(self) -> None:
        """Enqueue the partial tail chunk (end of stream / pre-question)."""
        if self._pending:
            self._chunks.put(jnp.stack(self._pending))
            self._pending.clear()

    # ------------------------------------------------------------------
    # Worker
    # ------------------------------------------------------------------

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                chunk = self._chunks.get(timeout=0.05)
            except queue.Empty:
                continue
            try:
                node_feats = chunk
                if (
                    self._cluster
                    and chunk.shape[0] >= self.cfg.chunk_size
                    and chunk.shape[0] > self.cfg.num_clusters
                ):
                    node_feats, _ = weighted_kmeans_feature(
                        chunk, self.cfg.num_clusters, self._next_key()
                    )
                caption = self._caption(chunk)
                with self._tree_lock:
                    self.tree.add_chunks([node_feats], [caption])
            except BaseException as e:  # surfaced on the next ask()/close()
                self._error = e
            finally:
                self._chunks.task_done()

    # ------------------------------------------------------------------
    # Consumer side
    # ------------------------------------------------------------------

    def sync(self) -> None:
        """Block until every queued chunk is in the tree."""
        self._chunks.join()
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def ask(self, answer_fn: Callable[[jnp.ndarray, VisualMemoryTree], str]) -> str:
        """Answer with a consistent memory snapshot.

        answer_fn(short_memory [R, P, D], tree) -> str; typically a closure
        over pipeline.answer.answer_question.
        """
        self.sync()
        with self._short_lock:
            short = self.short_term.sample(self._next_key())
        with self._tree_lock:
            return answer_fn(short, self.tree)

    def close(self) -> None:
        self.sync()
        self._stop.set()
        self._worker.join(timeout=5)
