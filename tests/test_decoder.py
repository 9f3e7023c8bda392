"""Decoder core: prefill/decode cache consistency, generation loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.config import DecoderConfig
from streamchat_tpu.models import decoder
from streamchat_tpu.models.decoder import KVCache
from streamchat_tpu.models.generate import generate, pad_to_bucket

CFG = DecoderConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return decoder.init(jax.random.key(0), CFG, dtype=jnp.float32)


def _embeds(params, ids):
    return decoder.embed_tokens(params, ids)


def test_prefill_shapes(params):
    ids = jnp.arange(10, dtype=jnp.int32)[None]
    cache = KVCache.create(CFG, 1, 64, jnp.float32)
    logits, cache = decoder.prefill(
        params, CFG, _embeds(params, ids), cache, jnp.array([10], jnp.int32)
    )
    assert logits.shape == (1, CFG.vocab_size)
    assert int(cache.length[0]) == 10


def test_decode_matches_prefill(params):
    """Incremental decode must reproduce full-prefill logits."""
    ids = jax.random.randint(jax.random.key(1), (1, 12), 0, CFG.vocab_size)

    # Full prefill over all 12 tokens -> logits at position 11.
    cache_a = KVCache.create(CFG, 1, 64, jnp.float32)
    full_logits, _ = decoder.prefill(
        params, CFG, _embeds(params, ids), cache_a, jnp.array([12], jnp.int32)
    )

    # Prefill 8, then decode tokens 8..11 one at a time.
    cache_b = KVCache.create(CFG, 1, 64, jnp.float32)
    _, cache_b = decoder.prefill(
        params, CFG, _embeds(params, ids[:, :8]), cache_b, jnp.array([8], jnp.int32)
    )
    logits = None
    for t in range(8, 12):
        logits, cache_b = decoder.decode_step(params, CFG, ids[:, t], cache_b)
    assert int(cache_b.length[0]) == 12
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits), rtol=2e-4, atol=2e-4
    )


def test_prefill_ignores_padding(params):
    """Padded prompt positions must not affect logits at the last valid token."""
    ids = jax.random.randint(jax.random.key(2), (1, 6), 0, CFG.vocab_size)
    padded = jnp.concatenate(
        [ids, jnp.full((1, 10), 7, jnp.int32)], axis=1
    )
    cache_a = KVCache.create(CFG, 1, 64, jnp.float32)
    la, _ = decoder.prefill(
        params, CFG, _embeds(params, ids), cache_a, jnp.array([6], jnp.int32)
    )
    cache_b = KVCache.create(CFG, 1, 64, jnp.float32)
    lb, _ = decoder.prefill(
        params, CFG, _embeds(params, padded), cache_b, jnp.array([6], jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=2e-4, atol=2e-4)


def test_generate_greedy_deterministic(params):
    ids = jnp.arange(5, dtype=jnp.int32)[None]
    outs = []
    for seed in (0, 1):
        toks, count = generate(
            params, CFG, _embeds(params, ids), jnp.array([5], jnp.int32),
            jax.random.key(seed), max_new_tokens=8, temperature=0.0, max_len=64,
        )
        outs.append(np.asarray(toks))
        assert toks.shape == (1, 8)
        assert 0 <= int(count[0]) <= 8
    # Greedy: key must not matter.
    np.testing.assert_array_equal(outs[0], outs[1])


def test_generate_matches_stepwise_greedy(params):
    """The fused loop must agree with manual prefill + argmax decode."""
    ids = jnp.arange(4, dtype=jnp.int32)[None]
    toks, _ = generate(
        params, CFG, _embeds(params, ids), jnp.array([4], jnp.int32),
        jax.random.key(0), max_new_tokens=4, temperature=0.0, max_len=64,
    )
    cache2 = KVCache.create(CFG, 1, 64, jnp.float32)
    logits, cache2 = decoder.prefill(
        params, CFG, _embeds(params, ids), cache2, jnp.array([4], jnp.int32)
    )
    manual = []
    for _ in range(4):
        t = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        manual.append(int(t[0]))
        logits, cache2 = decoder.decode_step(params, CFG, t, cache2)
    assert np.asarray(toks)[0].tolist() == manual


def test_pad_to_bucket():
    assert pad_to_bucket(1) == 128
    assert pad_to_bucket(128) == 128
    assert pad_to_bucket(129) == 256
    assert pad_to_bucket(700, 256) == 768


def test_ragged_batch_decode_matches_single(key):
    """Batched generation with different prompt lengths must match per-row
    single generation (per-row KV write offsets)."""
    from streamchat_tpu.config import DecoderConfig
    from streamchat_tpu.models.textlm import TextLM

    cfg = DecoderConfig.tiny()
    lm = TextLM.init_random(key, cfg, dtype=jnp.float32)
    prompts = ["short", "a considerably longer prompt with more bytes"]
    batch = lm.generate_batch(prompts, max_new_tokens=6, temperature=0.0)
    singles = [
        lm.generate(p, max_new_tokens=6, temperature=0.0) for p in prompts
    ]
    assert batch == singles


def test_generate_batch_rejects_bare_string(key):
    """A bare str iterates as characters — one KV row PER CHAR (a 1.3k-char
    judge prompt once compiled a 22 GB pool on-chip). Must fail loudly."""
    from streamchat_tpu.config import DecoderConfig
    from streamchat_tpu.models.textlm import TextLM

    lm = TextLM.init_random(key, DecoderConfig.tiny(), dtype=jnp.float32)
    with pytest.raises(TypeError, match="list of prompts"):
        lm.generate_batch("a bare prompt string", max_new_tokens=2)


class TestChunkedPrefill:
    """decoder.prefill_chunked: bounded-activation long-prompt prefill."""

    def test_matches_one_shot(self, params, key):
        """Chunked prefill reproduces the one-shot cache and logits, and the
        subsequent greedy decode is token-identical (ragged batch whose rows
        share the final chunk)."""
        b, s, chunk = 2, 96, 32
        lengths = jnp.asarray([90, 70], jnp.int32)
        ids = jax.random.randint(key, (b, s), 0, CFG.vocab_size)
        embeds = _embeds(params, ids)
        # Zero the padding rows like real padded prompts.
        mask = (jnp.arange(s)[None] < lengths[:, None])[..., None]
        embeds = jnp.where(mask, embeds, 0.0)

        cache_a = KVCache.create(CFG, b, 128, jnp.float32)
        la, cache_a = decoder.prefill(params, CFG, embeds, cache_a, lengths)
        cache_b = KVCache.create(CFG, b, 128, jnp.float32)
        lb, cache_b = decoder.prefill_chunked(
            params, CFG, embeds, cache_b, lengths, chunk=chunk
        )
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=2e-4)
        # Valid cache slots agree.
        for row, n in enumerate([90, 70]):
            np.testing.assert_allclose(
                np.asarray(cache_a.k)[:, row, :, :n],
                np.asarray(cache_b.k)[:, row, :, :n], atol=2e-5,
            )
        # Greedy continuation identical.
        ta = jnp.argmax(la, -1).astype(jnp.int32)
        tb = jnp.argmax(lb, -1).astype(jnp.int32)
        for _ in range(4):
            la, cache_a = decoder.decode_step(params, CFG, ta, cache_a)
            lb, cache_b = decoder.decode_step(params, CFG, tb, cache_b)
            ta = jnp.argmax(la, -1).astype(jnp.int32)
            tb = jnp.argmax(lb, -1).astype(jnp.int32)
            np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))

    def test_short_prompt_falls_through(self, params, key):
        ids = jax.random.randint(key, (1, 16), 0, CFG.vocab_size)
        embeds = _embeds(params, ids)
        cache = KVCache.create(CFG, 1, 32, jnp.float32)
        l1, _ = decoder.prefill_chunked(
            params, CFG, embeds, cache, jnp.array([16], jnp.int32), chunk=64
        )
        cache2 = KVCache.create(CFG, 1, 32, jnp.float32)
        l2, _ = decoder.prefill(
            params, CFG, embeds, cache2, jnp.array([16], jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)

    def test_non_chunk_multiple_tight_cache(self, params, key):
        """Regression (ADVICE r2 high): a prompt that is NOT a chunk multiple
        with a cache Lmax BELOW the chunk-rounded length. Round 2 padded the
        prompt to a chunk multiple and the final chunk's clamped
        dynamic_update_slice overwrote valid early-prompt KV (chunk-rounded
        80->96 > Lmax=80). The partial-tail-chunk rewrite must match one-shot
        prefill exactly."""
        b, s, chunk, lmax = 1, 80, 32, 80   # chunk-rounded s = 96 > lmax
        lengths = jnp.asarray([77], jnp.int32)
        ids = jax.random.randint(key, (b, s), 0, CFG.vocab_size)
        embeds = _embeds(params, ids)
        mask = (jnp.arange(s)[None] < lengths[:, None])[..., None]
        embeds = jnp.where(mask, embeds, 0.0)

        cache_a = KVCache.create(CFG, b, lmax, jnp.float32)
        la, cache_a = decoder.prefill(params, CFG, embeds, cache_a, lengths)
        cache_b = KVCache.create(CFG, b, lmax, jnp.float32)
        lb, cache_b = decoder.prefill_chunked(
            params, CFG, embeds, cache_b, lengths, chunk=chunk
        )
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=2e-4)
        n = int(lengths[0])
        np.testing.assert_allclose(
            np.asarray(cache_a.k)[:, 0, :, :n],
            np.asarray(cache_b.k)[:, 0, :, :n], atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(cache_a.v)[:, 0, :, :n],
            np.asarray(cache_b.v)[:, 0, :, :n], atol=2e-5,
        )

    def test_int8_cache_prefill_close_to_bf16(self, params, key):
        """prefill_chunked into an Int8KVCache (quantize-on-write, per-layer
        dequant reads — the long kv_int8 path that avoids the ~2.7 GB bf16
        dense transient at 7B/23k): logits and the dequantized cache match
        the f32-cache path within int8 quantization error, and greedy
        next-token choice agrees."""
        b, s, chunk = 1, 96, 32
        lengths = jnp.asarray([90], jnp.int32)
        ids = jax.random.randint(key, (b, s), 0, CFG.vocab_size)
        embeds = _embeds(params, ids)
        mask = (jnp.arange(s)[None] < lengths[:, None])[..., None]
        embeds = jnp.where(mask, embeds, 0.0)

        cache_a = KVCache.create(CFG, b, 128, jnp.float32)
        la, cache_a = decoder.prefill_chunked(
            params, CFG, embeds, cache_a, lengths, chunk=chunk
        )
        cache_q = decoder.Int8KVCache.create(CFG, b, 128)
        lq, cache_q = decoder.prefill_chunked(
            params, CFG, embeds, cache_q, lengths, chunk=chunk
        )
        assert cache_q.k.dtype == jnp.int8
        assert int(jnp.argmax(la[0])) == int(jnp.argmax(lq[0]))
        n = int(lengths[0])
        kd = np.asarray(cache_q.k, np.float32) * np.asarray(cache_q.k_s)[..., None]
        ka = np.asarray(cache_a.k)
        denom = np.maximum(np.abs(ka[:, 0, :, :n]).max(), 1e-6)
        rel = np.abs(kd[:, 0, :, :n] - ka[:, 0, :, :n]).max() / denom
        assert rel < 0.02, f"dequantized cache off by {rel:.3f} relative"

    def test_cache_too_small_raises(self, params, key):
        """A cache smaller than the prompt is a hard error, not silent
        clamped-scatter corruption."""
        ids = jax.random.randint(key, (1, 64), 0, CFG.vocab_size)
        embeds = _embeds(params, ids)
        cache = KVCache.create(CFG, 1, 48, jnp.float32)
        with pytest.raises(ValueError, match="Lmax"):
            decoder.prefill_chunked(
                params, CFG, embeds, cache, jnp.array([60], jnp.int32), chunk=16
            )
