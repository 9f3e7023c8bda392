"""Speculative decoding (models/spec_decode): drafting, exactness, stats.

The invariant under test is the whole feature: greedy speculative output is
TOKEN-IDENTICAL to the vanilla paged loop (models/generate_paged) for every
pool variant — verification must make drafting invisible except for speed.
The reference has no speculative decoding (its generate runs use_cache=False,
inference_streaming_longva_v2.py:150,257); this is a beyond-reference
serving feature.
"""

import jax
import jax.numpy as jnp
import pytest

from streamchat_tpu.config import DecoderConfig
from streamchat_tpu.models import decoder
from streamchat_tpu.models.generate_paged import generate_paged
from streamchat_tpu.models.spec_decode import ngram_propose


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig.tiny()
    params = decoder.init(jax.random.key(0), cfg, jnp.float32)
    return cfg, params


def _embeds(cfg, b, s, seed=1):
    return (
        jax.random.normal(jax.random.key(seed), (b, s, cfg.hidden_size)) * 0.02
    ).astype(jnp.float32)


class TestNgramPropose:
    def test_copies_continuation_of_last_match(self):
        # history: ... [5 6] 7 8 ... [5 6] -> propose 7 8
        hist = jnp.array([[1, 5, 6, 7, 8, 2, 5, 6, 0, 0]], jnp.int32)
        out = ngram_propose(
            hist, jnp.array([8]), ngram=2, num_draft=2
        )
        assert out.tolist() == [[7, 8]]

    def test_most_recent_match_wins(self):
        # two matches of [5 6]: continuations 7.. and 9..; the later wins
        hist = jnp.array([[5, 6, 7, 5, 6, 9, 4, 5, 6, 0]], jnp.int32)
        out = ngram_propose(hist, jnp.array([9]), ngram=2, num_draft=1)
        assert out.tolist() == [[9]]

    def test_no_match_repeats_last_token(self):
        hist = jnp.array([[1, 2, 3, 4, 0, 0]], jnp.int32)
        out = ngram_propose(hist, jnp.array([4]), ngram=2, num_draft=3)
        assert out.tolist() == [[4, 4, 4]]

    def test_continuation_clamped_to_valid_region(self):
        # match continuation runs off the valid end: pad with last token
        hist = jnp.array([[5, 6, 7, 5, 6, 0, 0, 0]], jnp.int32)
        out = ngram_propose(hist, jnp.array([5]), ngram=2, num_draft=3)
        # only hist[4]=6... the match at i=0 has continuation [7, 5, 6];
        # position 5,6 are past hist_len=5 -> last token (6) fills
        assert out.tolist() == [[7, 5, 6]] or out.tolist() == [[7, 6, 6]]

    def test_short_history_falls_back(self):
        hist = jnp.array([[9, 0, 0]], jnp.int32)
        out = ngram_propose(hist, jnp.array([1]), ngram=3, num_draft=2)
        assert out.tolist() == [[9, 9]]


class TestGreedyExactness:
    """Spec output must equal vanilla token-for-token under greedy."""

    @pytest.mark.parametrize("kv_int8", [False, True])
    @pytest.mark.parametrize("spec_tokens", [1, 4])
    def test_single_row(self, tiny, kv_int8, spec_tokens):
        cfg, params = tiny
        embeds = _embeds(cfg, 1, 24)
        seq_len = jnp.array([21], jnp.int32)
        key = jax.random.key(2)
        kw = dict(max_new_tokens=16, temperature=0.0, eos_ids=(-1,),
                  kv_int8=kv_int8)
        t0, c0 = generate_paged(params, cfg, embeds, seq_len, key, **kw)
        t1, c1 = generate_paged(
            params, cfg, embeds, seq_len, key, spec_tokens=spec_tokens, **kw
        )
        assert t0.tolist() == t1.tolist()
        assert c0.tolist() == c1.tolist()

    def test_lookup_corpus_exactness(self, tiny):
        cfg, params = tiny
        embeds = _embeds(cfg, 1, 24)
        seq_len = jnp.array([21], jnp.int32)
        key = jax.random.key(2)
        kw = dict(max_new_tokens=16, temperature=0.0, eos_ids=(-1,))
        t0, _ = generate_paged(params, cfg, embeds, seq_len, key, **kw)
        # even a perfect-oracle corpus must not change the output
        t1, _ = generate_paged(
            params, cfg, embeds, seq_len, key,
            spec_tokens=4, lookup_tokens=t0, **kw
        )
        assert t0.tolist() == t1.tolist()

    def test_batched_split_path(self, tiny):
        cfg, params = tiny
        embeds = _embeds(cfg, 2, 24)
        seq_len = jnp.array([21, 17], jnp.int32)
        key = jax.random.key(2)
        kw = dict(max_new_tokens=12, temperature=0.0, eos_ids=(-1,))
        t0, c0 = generate_paged(params, cfg, embeds, seq_len, key, **kw)
        t1, c1 = generate_paged(
            params, cfg, embeds, seq_len, key, spec_tokens=3, **kw
        )
        assert t0.tolist() == t1.tolist()
        assert c0.tolist() == c1.tolist()

    def test_eos_truncation_matches(self, tiny):
        cfg, params = tiny
        embeds = _embeds(cfg, 2, 24)
        seq_len = jnp.array([21, 17], jnp.int32)
        key = jax.random.key(2)
        base, _ = generate_paged(
            params, cfg, embeds, seq_len, key,
            max_new_tokens=12, temperature=0.0, eos_ids=(-1,),
        )
        eos = int(base[0, 4])      # an id the stream actually emits
        kw = dict(max_new_tokens=12, temperature=0.0, eos_ids=(eos,))
        t0, c0 = generate_paged(params, cfg, embeds, seq_len, key, **kw)
        t1, c1 = generate_paged(
            params, cfg, embeds, seq_len, key, spec_tokens=3, **kw
        )
        assert c0.tolist() == c1.tolist()
        for r in range(2):
            n = min(int(c0[r]) + 1, 12)   # incl. the EOS token
            assert t0[r, :n].tolist() == t1[r, :n].tolist()


class TestSamplingAndGuards:
    def test_temperature_runs_full_length(self, tiny):
        cfg, params = tiny
        embeds = _embeds(cfg, 1, 24)
        t, c = generate_paged(
            params, cfg, embeds, jnp.array([21], jnp.int32), jax.random.key(3),
            max_new_tokens=10, temperature=0.8, eos_ids=(-1,), spec_tokens=3,
        )
        assert c.tolist() == [10]
        assert int(jnp.min(t)) >= 0

    def test_top_p_rejected(self, tiny):
        cfg, params = tiny
        embeds = _embeds(cfg, 1, 24)
        with pytest.raises(ValueError, match="top_p"):
            generate_paged(
                params, cfg, embeds, jnp.array([21], jnp.int32),
                jax.random.key(3), max_new_tokens=4, temperature=0.8,
                top_p=0.9, eos_ids=(-1,), spec_tokens=2,
            )

    def test_h2o_rejected(self, tiny):
        cfg, params = tiny
        embeds = _embeds(cfg, 1, 24)
        with pytest.raises(ValueError, match="H2O"):
            generate_paged(
                params, cfg, embeds, jnp.array([21], jnp.int32),
                jax.random.key(3), max_new_tokens=4, temperature=0.0,
                eos_ids=(-1,), spec_tokens=2, hh_size=4, recent_size=4,
            )


class TestLongVAPlumbing:
    def test_spec_matches_vanilla_through_longva(self):
        """--spec_tokens end-to-end: spliced multimodal prompt, paged
        backend, text-prompt lookup corpus — greedy output unchanged."""
        import dataclasses

        from streamchat_tpu.config import ViTConfig
        from streamchat_tpu.models import LongVA

        tiny_vit = ViTConfig(
            image_size=28, patch_size=14, hidden_size=32,
            intermediate_size=64, num_layers=2, num_heads=4,
            projection_dim=128,
        )
        model = LongVA.init_random(
            jax.random.key(0), tiny_vit, DecoderConfig.tiny(),
            dtype=jnp.float32,
        )
        pixels = jax.random.normal(jax.random.key(1), (1, 3, 28, 28))
        feats = model.encode_images(pixels)
        prompt = "describe the scene <image> in the video please"
        kw = dict(max_new_tokens=12, temperature=0.0, key=jax.random.key(5))
        base = model.generate_with_image_embedding(prompt, [feats], **kw)
        spec = dataclasses.replace(model, spec_tokens=3)
        out = spec.generate_with_image_embedding(prompt, [feats], **kw)
        assert out == base


class TestTextLMPlumbing:
    def test_judge_spec_matches_vanilla(self):
        """--spec_tokens on the judge LM: greedy verdicts unchanged, and the
        rolling output corpus accumulates across calls."""
        from streamchat_tpu.models.textlm import TextLM

        lm = TextLM.init_random(
            jax.random.key(0), DecoderConfig.tiny(), dtype=jnp.float32
        )
        prompts = ["judge this answer: yes or no?", "judge that: score it"]
        base = lm.generate_batch(list(prompts), max_new_tokens=10)
        lm.spec_tokens = 3
        lm.keys = type(lm.keys)(0)      # reset the key stream
        out1 = lm.generate_batch(list(prompts), max_new_tokens=10)
        assert out1 == base
        assert len(lm._spec_corpus) > 0
        out2 = lm.generate_batch(list(prompts), max_new_tokens=10)
        assert out2 == base             # corpus must not change greedy output


class TestSeqPartialKernel:
    """The multi-query partial seq-pool kernel (interpret mode) must match
    the XLA einsum oracle that _spec_attention uses on CPU."""

    @pytest.mark.parametrize("int8", [False, True])
    def test_partial_kernel_matches_einsum(self, int8):
        import numpy as np

        from streamchat_tpu.models.paged_kv import _quantize_kv
        from streamchat_tpu.models.spec_decode import _spec_attention
        from streamchat_tpu.ops.paged_attention import (
            paged_seq_attention_partial,
            paged_seq_attention_partial_int8,
        )

        b, hq, hkv, t, d, ps, maxp = 1, 8, 2, 4, 32, 16, 4
        g = hq // hkv
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(0), 5)
        q = jax.random.normal(k1, (b, hq, t, d), jnp.float32)
        kd = jax.random.normal(k2, (b * maxp, hkv, ps, d), jnp.float32)
        vd = jax.random.normal(k3, (b * maxp, hkv, ps, d), jnp.float32)
        fresh_k = jax.random.normal(k4, (b, hkv, t, d), jnp.float32)
        fresh_v = jax.random.normal(k5, (b, hkv, t, d), jnp.float32)
        length = jnp.array([37], jnp.int32)   # ragged: mid-page boundary
        sm = d ** -0.5

        if int8:
            ki, ks = _quantize_kv(kd)
            vi, vs = _quantize_kv(vd)
            oracle = _spec_attention(
                q, ki, vi, ks, vs, length, fresh_k, fresh_v, sm
            )
            acc, m, l = paged_seq_attention_partial_int8(
                q, ki, vi, ks, vs, length,
                sm_scale=sm, pages_per_block=2, interpret=True,
            )
        else:
            oracle = _spec_attention(
                q, kd, vd, None, None, length, fresh_k, fresh_v, sm
            )
            acc, m, l = paged_seq_attention_partial(
                q, kd, vd, length,
                sm_scale=sm, pages_per_block=2, interpret=True,
            )
        # Merge the kernel's pool partial with the fresh block the same way
        # _spec_attention does and compare end to end.
        qg = q.reshape(b, hkv, g, t, d)
        s_f = jnp.einsum("bhgtd,bhud->bhgtu", qg, fresh_k) * sm
        tri = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
        s_f = jnp.where(tri[None, None, None], s_f, -1e30)
        m_f = jnp.max(s_f, axis=-1)
        p_f = jnp.exp(s_f - m_f[..., None])
        l_f = jnp.sum(p_f, axis=-1)
        acc_f = jnp.einsum("bhgtu,bhud->bhgtd", p_f, fresh_v)
        m_p = m.reshape(b, hkv, g, t)
        l_p = l.reshape(b, hkv, g, t)
        acc_p = acc.reshape(b, hkv, g, t, d)
        m_tot = jnp.maximum(m_p, m_f)
        a_p = jnp.exp(m_p - m_tot)[..., None]
        a_f = jnp.exp(m_f - m_tot)[..., None]
        out = (acc_p * a_p + acc_f * a_f) / (
            l_p[..., None] * a_p + l_f[..., None] * a_f
        )
        out = out.reshape(b, hq, t, d)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(oracle), rtol=2e-3, atol=2e-3
        )


class TestAcceptanceStats:
    def test_oracle_corpus_cuts_steps(self, tiny):
        """With the true continuation in the lookup corpus, 16 tokens must
        take far fewer than 16 verify steps (measures the whole accept path:
        propose -> verify -> multi-commit -> rewind)."""
        from streamchat_tpu.models.decoder import KVCache
        from streamchat_tpu.models.generate import _prefill_inline
        from streamchat_tpu.models.paged_kv import from_contiguous
        from streamchat_tpu.models.spec_decode import run_spec_decode_loop

        cfg, params = tiny
        embeds = _embeds(cfg, 1, 24)
        seq_len = jnp.array([21], jnp.int32)
        key = jax.random.key(2)
        t0, _ = generate_paged(
            params, cfg, embeds, seq_len, key,
            max_new_tokens=16, temperature=0.0, eos_ids=(-1,),
        )
        s_pad = 128
        pe = jnp.pad(embeds, ((0, 0), (0, s_pad - 24), (0, 0)))
        dense = KVCache.create(cfg, 1, s_pad, dtype=pe.dtype)
        fl, dense = _prefill_inline(params, cfg, pe, dense, seq_len)
        maxp = -(-(s_pad + 20) // 128)
        cache = from_contiguous(dense, maxp, maxp, 128)
        toks, count, over, steps = run_spec_decode_loop(
            params, cfg, cache, fl, seq_len, key,
            max_new_tokens=16, temperature=0.0, eos_ids=(-1,),
            spec_tokens=4, spec_ngram=2, lookup_tokens=t0,
            lookup_len=jnp.array([16], jnp.int32),
            init_over=jnp.zeros((), bool), return_stats=True,
        )
        assert toks.tolist() == t0.tolist()
        assert int(steps) <= 8, f"expected <=8 verify steps, got {int(steps)}"
