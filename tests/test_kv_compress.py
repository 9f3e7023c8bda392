"""H2O KV-compression tests (reference modeling_kv_cache.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.ops.kv_compress import (
    attention_mass,
    compress_kv,
    update_hh_score,
)


def make_cache(h=2, l=16, d=4, seed=0):
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    return jax.random.normal(k1, (h, l, d)), jax.random.normal(k2, (h, l, d))


def test_update_hh_score_accumulates():
    probs = jnp.ones((2, 3, 8)) / 8
    s = update_hh_score(None, probs)
    assert s.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(s), 3 / 8, atol=1e-6)
    s2 = update_hh_score(s, probs)
    np.testing.assert_allclose(np.asarray(s2), 6 / 8, atol=1e-6)


def test_attention_mass_sums_to_queries():
    k, _ = make_cache()
    q = jax.random.normal(jax.random.key(1), (2, 4, 4))
    mass = attention_mass(q, k, jnp.asarray(10))
    # Each query distributes mass 1 over valid slots.
    np.testing.assert_allclose(np.asarray(mass).sum(axis=1), 4.0, rtol=1e-5)
    assert np.all(np.asarray(mass)[:, 10:] < 1e-6)


def test_h2o_keeps_heavy_hitters_and_recents():
    k, v = make_cache(h=1, l=16)
    score = jnp.zeros((1, 16)).at[0, 3].set(100.0).at[0, 7].set(50.0)
    length = jnp.asarray(16)
    k2, v2, s2, kept = compress_kv(
        k, v, score, length, hh_size=2, recent_size=4
    )
    assert k2.shape == (1, 6, 4)
    assert int(kept) == 6
    # Heavy hitters 3 and 7 survive in order, then recents 12..15.
    np.testing.assert_allclose(np.asarray(k2[0, 0]), np.asarray(k[0, 3]))
    np.testing.assert_allclose(np.asarray(k2[0, 1]), np.asarray(k[0, 7]))
    np.testing.assert_allclose(np.asarray(k2[0, 2:]), np.asarray(k[0, 12:16]))
    assert float(s2[0, 0]) == 100.0


def test_sinks_always_pinned():
    k, v = make_cache(h=1, l=16)
    score = jnp.zeros((1, 16)).at[0, 8].set(10.0)
    k2, _, _, _ = compress_kv(
        k, v, score, jnp.asarray(16), hh_size=1, recent_size=4, sink_size=2
    )
    # slots 0,1 (sinks) + slot 8 (hh) + 12..15 (recent).
    np.testing.assert_allclose(np.asarray(k2[0, :2]), np.asarray(k[0, :2]))
    np.testing.assert_allclose(np.asarray(k2[0, 2]), np.asarray(k[0, 8]))


def test_short_cache_identity():
    k, v = make_cache(h=1, l=8)
    score = jnp.ones((1, 8))
    k2, v2, _, kept = compress_kv(
        k, v, score, jnp.asarray(5), hh_size=4, recent_size=8
    )
    assert int(kept) == 5
    np.testing.assert_allclose(np.asarray(k2[:, :5]), np.asarray(k[:, :5]))


def test_avg_merge_changes_kept_keys():
    k, v = make_cache(h=1, l=16)
    score = jnp.zeros((1, 16)).at[0, 3].set(100.0).at[0, 7].set(50.0)
    k_plain, _, _, _ = compress_kv(
        k, v, score, jnp.asarray(16), hh_size=2, recent_size=4
    )
    k_merged, _, _, _ = compress_kv(
        k, v, score, jnp.asarray(16), hh_size=2, recent_size=4, merge="avg"
    )
    # Merging folds pruned tokens into the heavy hitters -> keys differ.
    assert not np.allclose(np.asarray(k_plain[0, :2]), np.asarray(k_merged[0, :2]))
    # Recent slots are untouched by the merge.
    np.testing.assert_allclose(
        np.asarray(k_plain[0, 2:]), np.asarray(k_merged[0, 2:])
    )


def test_runtime_length_below_capacity_identity():
    """length < C with a LARGER static L: identity slots, no duplicates
    (review finding: keep_recent clipping used to emit garbage rows)."""
    k, v = make_cache(h=1, l=64)
    score = jnp.ones((1, 64))
    k2, v2, _, kept = compress_kv(
        k, v, score, jnp.asarray(10),
        hh_size=8, recent_size=16, sink_size=4,
    )
    assert int(kept) == 10
    np.testing.assert_allclose(np.asarray(k2[:, :10]), np.asarray(k[:, :10]))


def test_compress_cache_then_decode_continues():
    """End-to-end recipe: prefill -> compress the whole KVCache -> keep
    decoding against the compacted (shape-stable) cache."""
    from streamchat_tpu.config import DecoderConfig
    from streamchat_tpu.models import decoder
    from streamchat_tpu.models.decoder import KVCache
    from streamchat_tpu.ops.kv_compress import compress_cache

    cfg = DecoderConfig.tiny()
    params = decoder.init(jax.random.key(0), cfg, jnp.float32)
    s, extra = 64, 8
    ids = jax.random.randint(jax.random.key(1), (1, s), 0, cfg.vocab_size)
    embeds = decoder.embed_tokens(params, ids)
    cache = KVCache.create(cfg, 1, s + extra, dtype=jnp.float32)
    logits, cache = decoder.prefill(
        params, cfg, embeds, cache, jnp.array([s], jnp.int32)
    )
    assert int(cache.length[0]) == s

    probe = jax.random.normal(
        jax.random.key(2), (cfg.num_layers, cfg.num_heads, 4, cfg.head_dim)
    )
    small = compress_cache(cache, probe, hh_size=8, recent_size=16, sink_size=4)
    assert small.k.shape == cache.k.shape            # shape-stable
    assert int(small.length[0]) == 28                # sink+hh+recent

    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(3):
        logits2, small = decoder.decode_step(params, cfg, tok, small)
        tok = jnp.argmax(logits2, -1).astype(jnp.int32)
    assert int(small.length[0]) == 31
    assert np.all(np.isfinite(np.asarray(logits2)))
