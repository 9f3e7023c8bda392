"""Streaming-session concurrency test: port of the reference's mocked-
summarizer simulation (utiles.py simulate_memory_construct:1656-2230, which
stubs the captioner with "test only hahahahaha")."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.config import MemoryConfig
from streamchat_tpu.memory.tree import VisualMemoryTree
from streamchat_tpu.ops.kmeans import weighted_kmeans_feature
from streamchat_tpu.pipeline.streaming import StreamingSession


def hash_embed(texts):
    out = np.zeros((len(texts), 16), np.float32)
    for i, t in enumerate(texts):
        for a, b in zip(t, t[1:]):
            out[i, (ord(a) * 31 + ord(b)) % 16] += 1.0
        if not t:
            out[i, 0] = 1.0
    return out


def make_session(chunk_size=4, num_clusters=2, interval=2, caption=None):
    key = jax.random.key(0)

    def merge(x, k):
        return weighted_kmeans_feature(x, k, key)[0]

    tree = VisualMemoryTree(
        num_clusters, interval, hash_embed,
        lambda caps: "summary: " + "|".join(caps), merge,
    )
    cfg = MemoryConfig(
        chunk_size=chunk_size, num_clusters=num_clusters, interval=interval,
        short_window=6, remember_window=3, tau=5.0,
    )
    return StreamingSession(
        tree, caption or (lambda c: f"mock caption {c.shape[0]}"), cfg,
        jax.random.key(1),
    )


def test_incremental_tree_growth_under_streaming():
    sess = make_session(chunk_size=4, interval=2)
    feats = jax.random.normal(jax.random.key(2), (20, 4, 8))
    # Stream in small irregular pushes (reader cadence).
    for i in range(0, 20, 3):
        sess.push(feats[i : i + 3])
        time.sleep(0.002)
    sess.sync()
    # 20 frames / chunk 4 = 5 full chunks; interval 2 -> merges happened.
    counts = sess.tree.counts_by_depth()
    assert sum(counts.values()) >= 2
    assert max(counts) >= 1  # at least one summarize-splice occurred
    sess.close()


def test_ask_sees_all_pushed_chunks():
    captured = {}

    def answer(short, tree):
        captured["short"] = short
        captured["nodes"] = len(tree.all_nodes())
        return "answer"

    sess = make_session(chunk_size=4, interval=3)
    sess.push(jax.random.normal(jax.random.key(3), (8, 4, 8)))
    out = sess.ask(answer)
    assert out == "answer"
    assert captured["short"].shape == (3, 4, 8)
    assert captured["nodes"] == 2        # two full chunks -> two leaves
    sess.close()


def test_flush_handles_partial_tail():
    sess = make_session(chunk_size=4, interval=3)
    sess.push(jax.random.normal(jax.random.key(4), (6, 4, 8)))
    sess.flush()
    sess.sync()
    # One full chunk + one 2-frame tail.
    assert sum(sess.tree.counts_by_depth().values()) == 2
    sess.close()


def test_worker_error_surfaces_on_sync():
    def bad_caption(chunk):
        raise RuntimeError("captioner exploded")

    sess = make_session(caption=bad_caption)
    sess.push(jax.random.normal(jax.random.key(5), (4, 4, 8)))
    with pytest.raises(RuntimeError, match="captioner exploded"):
        sess.sync()
    sess.close()


def test_concurrent_push_and_ask_race():
    """Hammer push from one thread and ask from another; the tree must stay
    consistent (the reference's Event choreography loses updates here)."""
    sess = make_session(chunk_size=2, interval=4)
    feats = jax.random.normal(jax.random.key(6), (40, 2, 4))
    errors = []
    # Seed a first batch before the question thread starts: asking before any
    # frame arrived raises by design (reference assert at :371).
    sess.push(feats[:2])

    def producer():
        try:
            for i in range(2, 40, 2):
                sess.push(feats[i : i + 2])
        except BaseException as e:
            errors.append(e)

    answers = []

    def consumer():
        try:
            for _ in range(5):
                answers.append(sess.ask(lambda s, t: len(t.all_nodes())))
        except BaseException as e:
            errors.append(e)

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start(); tp.join(); tc.join()
    sess.sync()
    assert not errors
    # Node count seen by asks is monotone non-decreasing.
    assert answers == sorted(answers)
    assert len(sess.tree.all_nodes()) >= 20 // 2
    sess.close()
