"""Paged KV cache: allocation, append, attention parity vs contiguous."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.config import DecoderConfig
from streamchat_tpu.models.paged_kv import (
    PagedKVCache,
    advance,
    allocate_pages,
    append_token_kv,
    paged_decode_attention,
)
from streamchat_tpu.ops.attention import decode_attention


@pytest.fixture
def cfg():
    return DecoderConfig.tiny()  # 2 layers, 2 kv heads, dh 32


def test_allocate_sequential(cfg):
    cache = PagedKVCache.create(cfg, batch=2, num_pages=16,
                                max_pages_per_seq=4, page_size=4)
    cache = allocate_pages(cache, jnp.array([6, 3]))
    t = np.asarray(cache.page_table)
    # Row 0 needs 2 pages (0,1), row 1 needs 1 page (2).
    assert list(t[0][:2]) == [0, 1] and t[0][2] == -1
    assert t[1][0] == 2 and t[1][1] == -1
    assert int(cache.next_free) == 3
    # Growing row 1 by 3 tokens after storing 3 claims one more page.
    cache = advance(cache, jnp.array([6, 3]))
    cache = allocate_pages(cache, jnp.array([0, 3]))
    t = np.asarray(cache.page_table)
    assert t[1][1] == 3
    assert int(cache.next_free) == 4


def test_paged_attention_matches_contiguous(cfg, key):
    b, hkv, dh = 2, cfg.num_kv_heads, cfg.head_dim
    hq = cfg.num_heads
    steps = 7
    page_size = 4

    cache = PagedKVCache.create(cfg, batch=b, num_pages=8,
                                max_pages_per_seq=4, page_size=page_size,
                                dtype=jnp.float32)
    contig_k = jnp.zeros((b, hkv, 16, dh))
    contig_v = jnp.zeros((b, hkv, 16, dh))

    keys = jax.random.split(key, steps * 2)
    for t in range(steps):
        k_tok = jax.random.normal(keys[2 * t], (b, hkv, dh))
        v_tok = jax.random.normal(keys[2 * t + 1], (b, hkv, dh))
        cache = allocate_pages(cache, jnp.ones((b,), jnp.int32))
        cache = append_token_kv(cache, jnp.asarray(0), k_tok, v_tok)
        cache = advance(cache, jnp.ones((b,), jnp.int32))
        contig_k = contig_k.at[:, :, t].set(k_tok)
        contig_v = contig_v.at[:, :, t].set(v_tok)

    q = jax.random.normal(jax.random.key(99), (b, hq, 1, dh))
    length = jnp.full((b,), steps, jnp.int32)
    paged = paged_decode_attention(
        q, cache.k_pages[0], cache.v_pages[0], cache.page_table, length
    )
    ref = decode_attention(q, contig_k, contig_v, length)
    np.testing.assert_allclose(np.asarray(paged), np.asarray(ref), atol=1e-5)


def test_b1_append_avoids_hlo_gather_update(cfg, key):
    """b=1 appends must lower to dynamic-update-slice, not an HLO scatter
    op — 56 of them per decode step cost ~1.6 ms/tok at 7B geometry (the
    round-3 answer-p50 regression, root-caused round 4). Matches the op
    syntax `scatter(` so names in embedded metadata can't false-positive."""
    from streamchat_tpu.models.paged_kv import (
        PagedKVCacheInt8, append_token_kv_int8,
    )

    cache = PagedKVCache.create(cfg, batch=1, num_pages=8,
                                max_pages_per_seq=8, page_size=4,
                                dtype=jnp.float32)
    cache = allocate_pages(cache, jnp.ones((1,), jnp.int32))
    k_tok = jax.random.normal(key, (1, cfg.num_kv_heads, cfg.head_dim))
    hlo = jax.jit(lambda c, k, v: append_token_kv(c, 2, k, v)).lower(
        cache, k_tok, k_tok
    ).compile().as_text()
    assert "scatter(" not in hlo

    L, hkv, dh, ps = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, 4
    cache8 = PagedKVCacheInt8(
        k_pages=jnp.zeros((L, 8, hkv, ps, dh), jnp.int8),
        v_pages=jnp.zeros((L, 8, hkv, ps, dh), jnp.int8),
        k_scale=jnp.zeros((L, 8, hkv, ps), jnp.float32),
        v_scale=jnp.zeros((L, 8, hkv, ps), jnp.float32),
        page_table=jnp.full((1, 8), -1, jnp.int32).at[0, 0].set(0),
        length=jnp.zeros((1,), jnp.int32),
        next_free=jnp.ones((), jnp.int32),
    )
    hlo8 = jax.jit(lambda c, k, v: append_token_kv_int8(c, 2, k, v)).lower(
        cache8, k_tok, k_tok
    ).compile().as_text()
    assert "scatter(" not in hlo8


def test_ragged_lengths(cfg, key):
    """Rows at different lengths mask correctly."""
    b, hkv, dh, hq = 2, cfg.num_kv_heads, cfg.head_dim, cfg.num_heads
    cache = PagedKVCache.create(cfg, batch=b, num_pages=8,
                                max_pages_per_seq=4, page_size=4,
                                dtype=jnp.float32)
    lengths = [5, 2]
    contig_k = jnp.zeros((b, hkv, 8, dh))
    contig_v = jnp.zeros((b, hkv, 8, dh))
    for t in range(max(lengths)):
        grow = jnp.asarray([1 if t < l else 0 for l in lengths], jnp.int32)
        k_tok = jax.random.normal(jax.random.key(10 + t), (b, hkv, dh))
        v_tok = jax.random.normal(jax.random.key(50 + t), (b, hkv, dh))
        cache = allocate_pages(cache, grow)
        cache = append_token_kv(cache, jnp.asarray(0), k_tok, v_tok)
        # Rows that did not grow get overwritten next step at the same slot;
        # emulate by only advancing growing rows.
        cache = advance(cache, grow)
        for rb, l in enumerate(lengths):
            if t < l:
                contig_k = contig_k.at[rb, :, t].set(k_tok[rb])
                contig_v = contig_v.at[rb, :, t].set(v_tok[rb])

    q = jax.random.normal(jax.random.key(99), (b, hq, 1, dh))
    length = jnp.asarray(lengths, jnp.int32)
    paged = paged_decode_attention(
        q, cache.k_pages[0], cache.v_pages[0], cache.page_table, length
    )
    ref = decode_attention(q, contig_k, contig_v, length)
    np.testing.assert_allclose(np.asarray(paged), np.asarray(ref), atol=1e-5)


def test_allocate_overflow_raises(cfg):
    cache = PagedKVCache.create(cfg, batch=1, num_pages=2,
                                max_pages_per_seq=2, page_size=4)
    with pytest.raises(ValueError, match="overflow"):
        allocate_pages(cache, jnp.array([100]))


def test_paged_generation_matches_contiguous(cfg, key):
    """Prefill contiguous -> import to pages -> paged greedy decode must
    reproduce the contiguous decode_step token stream exactly."""
    from streamchat_tpu.models import decoder
    from streamchat_tpu.models.decoder import KVCache
    from streamchat_tpu.models.paged_kv import (
        allocate_pages,
        decode_step_paged,
        from_contiguous,
    )

    params = decoder.init(key, cfg, jnp.float32)
    s, extra = 32, 6
    lmax = 64  # multiple of page_size 16 covering s + extra
    ids = jax.random.randint(jax.random.key(1), (1, s), 0, cfg.vocab_size)
    embeds = decoder.embed_tokens(params, ids)

    cache = KVCache.create(cfg, 1, lmax, dtype=jnp.float32)
    logits, cache = decoder.prefill(
        params, cfg, embeds, cache, jnp.array([s], jnp.int32)
    )
    paged = from_contiguous(cache, num_pages=12, max_pages_per_seq=6,
                            page_size=16)
    assert int(paged.length[0]) == s

    tok_c = jnp.argmax(logits, -1).astype(jnp.int32)
    tok_p = tok_c
    contig_toks, paged_toks = [], []
    for _ in range(extra):
        lc, cache = decoder.decode_step(params, cfg, tok_c, cache)
        tok_c = jnp.argmax(lc, -1).astype(jnp.int32)
        contig_toks.append(int(tok_c[0]))

        paged = allocate_pages(paged, jnp.ones((1,), jnp.int32))
        lp, paged = decode_step_paged(params, cfg, tok_p, paged)
        tok_p = jnp.argmax(lp, -1).astype(jnp.int32)
        paged_toks.append(int(tok_p[0]))

    assert contig_toks == paged_toks


class TestGeneratePaged:
    """The fused paged generate loop (models/generate_paged.py)."""

    def _setup(self, cfg, key, s=20):
        from streamchat_tpu.models import decoder

        params = decoder.init(key, cfg, jnp.float32)
        ids = jax.random.randint(jax.random.key(7), (1, s), 0, cfg.vocab_size)
        embeds = decoder.embed_tokens(params, ids)
        return params, embeds, jnp.array([s], jnp.int32)

    def test_token_exact_vs_contiguous(self, cfg, key):
        from streamchat_tpu.models.generate import generate
        from streamchat_tpu.models.generate_paged import generate_paged

        params, embeds, length = self._setup(cfg, key)
        kw = dict(max_new_tokens=8, temperature=0.0)
        toks_c, count_c = generate(
            params, cfg, embeds, length, jax.random.key(0), **kw
        )
        toks_p, count_p = generate_paged(
            params, cfg, embeds, length, jax.random.key(0),
            page_size=16, **kw
        )
        np.testing.assert_array_equal(np.asarray(toks_c), np.asarray(toks_p))
        assert int(count_c[0]) == int(count_p[0])

    def test_inloop_compression_runs(self, cfg, key):
        """Decode far past the page pool: the in-loop H2O branch must fire
        (cache length stays <= compressed size + room) and the loop keeps
        producing tokens."""
        from streamchat_tpu.models.generate_paged import generate_paged

        params, embeds, length = self._setup(cfg, key, s=20)
        ps = 16
        pages = 3                               # cap = 48 tokens
        toks, count = generate_paged(
            params, cfg, embeds, length, jax.random.key(0),
            max_new_tokens=40,                  # 20 + 40 > 48 -> must compress
            page_size=ps, num_pages=pages, max_pages_per_seq=pages,
            hh_size=12, recent_size=16, sink_size=4,
        )
        assert toks.shape == (1, 40)
        # All steps produced a token (pad only after EOS, which random
        # weights may or may not emit; at minimum the loop did not wedge).
        assert int(count[0]) >= 1

    def test_inloop_compression_prefix_exact(self, cfg, key):
        """Tokens generated BEFORE the first compression must match the
        uncompressed stream exactly (eviction only perturbs steps after it
        fires)."""
        from streamchat_tpu.models.generate import generate
        from streamchat_tpu.models.generate_paged import generate_paged

        params, embeds, length = self._setup(cfg, key, s=20)
        ps, pages = 16, 3                       # cap 48; 20 prompt -> 28 free
        kw = dict(max_new_tokens=36, temperature=0.0)
        toks_ref, _ = generate(
            params, cfg, embeds, length, jax.random.key(0), **kw
        )
        toks_p, _ = generate_paged(
            params, cfg, embeds, length, jax.random.key(0),
            page_size=ps, num_pages=pages, max_pages_per_seq=pages,
            hh_size=12, recent_size=16, sink_size=4, **kw
        )
        # Pool fills at token 28 of decode (48 - 20); the first 25+ steps are
        # untouched by compression and must agree bit-exactly.
        np.testing.assert_array_equal(
            np.asarray(toks_ref)[:, :24], np.asarray(toks_p)[:, :24]
        )

    def test_prompt_exceeds_budget(self, cfg, key):
        """A prompt longer than the pool is H2O-compressed post-prefill and
        decoding proceeds."""
        from streamchat_tpu.models.generate_paged import generate_paged

        params, embeds, length = self._setup(cfg, key, s=60)
        toks, count = generate_paged(
            params, cfg, embeds, length, jax.random.key(0),
            max_new_tokens=8,
            page_size=16, num_pages=3, max_pages_per_seq=3,  # cap 48 < 60
            hh_size=12, recent_size=16, sink_size=4,
        )
        assert toks.shape == (1, 8)

    def test_longva_paged_backend_matches_contiguous(self, cfg, key):
        """LongVA's default (paged) backend returns the same greedy text as
        the contiguous backend."""
        from streamchat_tpu.config import ViTConfig
        from streamchat_tpu.models.longva import LongVA

        model = LongVA.init_random(
            key, ViTConfig.tiny(projection_dim=cfg.hidden_size), cfg,
            dtype=jnp.float32,
        )
        feats = jax.random.normal(jax.random.key(3), (8, cfg.hidden_size))
        prompt = "describe <image> please"
        assert model.decode_backend == "paged"
        out_paged = model.generate_with_image_embedding(
            prompt, [feats], max_new_tokens=6, temperature=0.0
        )
        model.decode_backend = "contiguous"
        out_contig = model.generate_with_image_embedding(
            prompt, [feats], max_new_tokens=6, temperature=0.0
        )
        assert out_paged == out_contig


class TestInt8KV:
    """Int8-quantized paged cache (PagedKVCacheInt8)."""

    def test_int8_attention_close_to_bf16(self, cfg, key):
        """Quantized paged attention tracks the full-precision result."""
        from streamchat_tpu.models import decoder
        from streamchat_tpu.models.decoder import KVCache
        from streamchat_tpu.models.paged_kv import (
            from_contiguous,
            from_contiguous_int8,
            paged_decode_attention,
            paged_decode_attention_int8,
        )

        params = decoder.init(key, cfg, jnp.float32)
        s, lmax, ps = 24, 32, 16
        ids = jax.random.randint(jax.random.key(1), (1, s), 0, cfg.vocab_size)
        embeds = decoder.embed_tokens(params, ids)
        cache = KVCache.create(cfg, 1, lmax, dtype=jnp.float32)
        _, cache = decoder.prefill(params, cfg, embeds, cache,
                                   jnp.array([s], jnp.int32))
        full = from_contiguous(cache, 4, 2, ps)
        quant = from_contiguous_int8(cache, 4, 2, ps)

        q = jax.random.normal(jax.random.key(2),
                              (1, cfg.num_heads, 1, cfg.head_dim))
        length = jnp.array([s], jnp.int32)
        o_full = paged_decode_attention(
            q, full.k_pages[0], full.v_pages[0], full.page_table, length
        )
        o_q = paged_decode_attention_int8(
            q, quant.k_pages[0], quant.v_pages[0],
            quant.k_scale[0], quant.v_scale[0], quant.page_table, length
        )
        err = np.max(np.abs(np.asarray(o_full) - np.asarray(o_q)))
        scale = np.max(np.abs(np.asarray(o_full))) + 1e-6
        assert err / scale < 0.03, f"relative error {err/scale:.3f}"

    def test_generate_paged_kv_int8_runs_and_tracks(self, cfg, key):
        """kv_int8 generation runs in the fused loop; greedy tokens match
        the bf16 cache path on a tiny model (quantization noise is far below
        the logit gaps of random weights)."""
        from streamchat_tpu.models import decoder
        from streamchat_tpu.models.generate_paged import generate_paged

        params = decoder.init(key, cfg, jnp.float32)
        ids = jax.random.randint(jax.random.key(7), (1, 20), 0, cfg.vocab_size)
        embeds = decoder.embed_tokens(params, ids)
        length = jnp.array([20], jnp.int32)
        kw = dict(max_new_tokens=8, temperature=0.0, page_size=16)
        t_full, _ = generate_paged(params, cfg, embeds, length,
                                   jax.random.key(0), **kw)
        t_q, _ = generate_paged(params, cfg, embeds, length,
                                jax.random.key(0), kv_int8=True, **kw)
        assert t_q.shape == (1, 8)
        match = np.mean(np.asarray(t_full) == np.asarray(t_q))
        assert match >= 0.75, f"only {match:.0%} tokens match bf16 cache"

    def test_int8_rejects_compression_combo(self, cfg, key):
        from streamchat_tpu.models import decoder
        from streamchat_tpu.models.generate_paged import generate_paged

        params = decoder.init(key, cfg, jnp.float32)
        embeds = jnp.zeros((1, 16, cfg.hidden_size))
        with pytest.raises(ValueError, match="exclusive"):
            generate_paged(params, cfg, embeds, jnp.array([16], jnp.int32),
                           jax.random.key(0), max_new_tokens=4,
                           page_size=16, kv_int8=True, hh_size=4,
                           recent_size=4)


class TestPallasPagedAttention:
    """ops/paged_attention: page-table-indexed decode kernel (interpret
    mode on CPU; the compiled path is validated by scripts/chip_checks.py)."""

    def _build(self, cfg, key, lengths, ps=16):
        b = len(lengths)
        maxp = 4
        cache = PagedKVCache.create(cfg, batch=b, num_pages=b * maxp,
                                    max_pages_per_seq=maxp, page_size=ps,
                                    dtype=jnp.float32)
        for t in range(max(lengths)):
            grow = jnp.asarray([1 if t < l else 0 for l in lengths], jnp.int32)
            k_tok = jax.random.normal(jax.random.key(100 + t),
                                      (b, cfg.num_kv_heads, cfg.head_dim))
            v_tok = jax.random.normal(jax.random.key(200 + t),
                                      (b, cfg.num_kv_heads, cfg.head_dim))
            cache = allocate_pages(cache, grow)
            cache = append_token_kv(cache, jnp.asarray(0), k_tok, v_tok)
            cache = advance(cache, grow)
        return cache

    def test_matches_xla_gather_path(self, cfg, key):
        from streamchat_tpu.ops.paged_attention import (
            paged_decode_attention_pallas,
        )

        lengths = [37, 12]
        cache = self._build(cfg, key, lengths)
        b = len(lengths)
        q = jax.random.normal(key, (b, cfg.num_heads, 1, cfg.head_dim))
        length = jnp.asarray(lengths, jnp.int32)
        ref = paged_decode_attention(
            q, cache.k_pages[0], cache.v_pages[0], cache.page_table, length
        )
        out = paged_decode_attention_pallas(
            q, cache.k_pages[0], cache.v_pages[0], cache.page_table, length,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_unmapped_pages_skipped(self, cfg, key):
        from streamchat_tpu.ops.paged_attention import (
            paged_decode_attention_pallas,
        )

        # One row only fills a single page; its table has -1 entries.
        cache = self._build(cfg, key, [9, 60])
        assert int(np.asarray(cache.page_table)[0, 1]) == -1
        q = jax.random.normal(key, (2, cfg.num_heads, 1, cfg.head_dim))
        length = jnp.asarray([9, 60], jnp.int32)
        ref = paged_decode_attention(
            q, cache.k_pages[0], cache.v_pages[0], cache.page_table, length
        )
        out = paged_decode_attention_pallas(
            q, cache.k_pages[0], cache.v_pages[0], cache.page_table, length,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_int8_kernel_matches_xla_int8(self, cfg, key):
        from streamchat_tpu.models.paged_kv import (
            allocate_pages_int8,
            append_token_kv_int8,
            paged_decode_attention_int8,
        )
        from streamchat_tpu.models.paged_kv import PagedKVCacheInt8
        from streamchat_tpu.ops.paged_attention import (
            paged_decode_attention_pallas_int8,
        )

        b, maxp, ps = 2, 4, 16
        hkv, dh = cfg.num_kv_heads, cfg.head_dim
        shape = (cfg.num_layers, b * maxp, hkv, ps, dh)
        cache = PagedKVCacheInt8(
            k_pages=jnp.zeros(shape, jnp.int8),
            v_pages=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.ones(shape[:4], jnp.float32),
            v_scale=jnp.ones(shape[:4], jnp.float32),
            page_table=jnp.full((b, maxp), -1, jnp.int32),
            length=jnp.zeros((b,), jnp.int32),
            next_free=jnp.zeros((), jnp.int32),
        )
        lengths = [23, 9]
        for t in range(max(lengths)):
            grow = jnp.asarray([1 if t < l else 0 for l in lengths], jnp.int32)
            k_tok = jax.random.normal(jax.random.key(300 + t), (b, hkv, dh))
            v_tok = jax.random.normal(jax.random.key(400 + t), (b, hkv, dh))
            cache = allocate_pages_int8(cache, grow)
            cache = append_token_kv_int8(cache, jnp.asarray(0), k_tok, v_tok)
            cache = cache._replace(length=cache.length + grow)

        q = jax.random.normal(key, (b, cfg.num_heads, 1, dh))
        length = jnp.asarray(lengths, jnp.int32)
        ref = paged_decode_attention_int8(
            q, cache.k_pages[0], cache.v_pages[0],
            cache.k_scale[0], cache.v_scale[0], cache.page_table, length,
        )
        out = paged_decode_attention_pallas_int8(
            q, cache.k_pages[0], cache.v_pages[0],
            cache.k_scale[0], cache.v_scale[0], cache.page_table, length,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_seq_kernel_matches_xla(self, cfg, key):
        """Sequential-pool (identity-table) kernel == XLA gather path for a
        single-row cache whose pages are in pool order — including a pool
        that is not a pages_per_block multiple and a non-page-aligned
        length."""
        from streamchat_tpu.ops.paged_attention import (
            paged_decode_attention_pallas_seq,
        )

        cache = self._build(cfg, key, [37])      # b=1: identity table
        assert list(np.asarray(cache.page_table)[0][:3]) == [0, 1, 2]
        q = jax.random.normal(key, (1, cfg.num_heads, 1, cfg.head_dim))
        length = jnp.asarray([37], jnp.int32)
        ref = paged_decode_attention(
            q, cache.k_pages[0], cache.v_pages[0], cache.page_table, length
        )
        out = paged_decode_attention_pallas_seq(
            q, cache.k_pages[0], cache.v_pages[0], length,
            pages_per_block=2, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_seq_int8_kernel_matches_xla(self, cfg, key):
        from streamchat_tpu.models.paged_kv import (
            PagedKVCacheInt8,
            allocate_pages_int8,
            append_token_kv_int8,
            paged_decode_attention_int8,
        )
        from streamchat_tpu.ops.paged_attention import (
            paged_decode_attention_pallas_seq_int8,
        )

        b, maxp, ps = 1, 4, 16
        hkv, dh = cfg.num_kv_heads, cfg.head_dim
        shape = (cfg.num_layers, b * maxp, hkv, ps, dh)
        cache = PagedKVCacheInt8(
            k_pages=jnp.zeros(shape, jnp.int8),
            v_pages=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.ones(shape[:4], jnp.float32),
            v_scale=jnp.ones(shape[:4], jnp.float32),
            page_table=jnp.full((b, maxp), -1, jnp.int32),
            length=jnp.zeros((b,), jnp.int32),
            next_free=jnp.zeros((), jnp.int32),
        )
        n = 41
        for t in range(n):
            k_tok = jax.random.normal(jax.random.key(500 + t), (b, hkv, dh))
            v_tok = jax.random.normal(jax.random.key(600 + t), (b, hkv, dh))
            cache = allocate_pages_int8(cache, jnp.ones((b,), jnp.int32))
            cache = append_token_kv_int8(cache, jnp.asarray(0), k_tok, v_tok)
            cache = cache._replace(length=cache.length + 1)
        q = jax.random.normal(key, (1, cfg.num_heads, 1, dh))
        length = jnp.asarray([n], jnp.int32)
        ref = paged_decode_attention_int8(
            q, cache.k_pages[0], cache.v_pages[0],
            cache.k_scale[0], cache.v_scale[0], cache.page_table, length,
        )
        out = paged_decode_attention_pallas_seq_int8(
            q, cache.k_pages[0], cache.v_pages[0],
            cache.k_scale[0], cache.v_scale[0], length,
            pages_per_block=2, interpret=True,
        )
        # The seq kernel dequantizes to the q dtype before the dot (f32 in
        # this test -> exact); keep a loose bound for bf16 production runs.
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_generate_paged_seq_kernel_token_exact(self, cfg, key):
        """End-to-end: single-row paged decode (which now dispatches the
        sequential-pool kernel on TPU; XLA path on CPU) stays token-exact vs
        the contiguous backend. Guards the identity-table invariant the
        dispatch relies on."""
        from streamchat_tpu.models import decoder as dec
        from streamchat_tpu.models.generate import generate
        from streamchat_tpu.models.generate_paged import generate_paged

        params = dec.init(jax.random.key(0), cfg, dtype=jnp.float32)
        ids = jax.random.randint(key, (1, 24), 0, cfg.vocab_size)
        embeds = dec.embed_tokens(params, ids)
        lengths = jnp.array([21], jnp.int32)
        tp, cp = generate_paged(
            params, cfg, embeds, lengths, jax.random.key(2),
            max_new_tokens=12, temperature=0.0, page_size=8,
        )
        tc, cc = generate(
            params, cfg, embeds, lengths, jax.random.key(2),
            max_new_tokens=12, temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(tp), np.asarray(tc))


class TestAllocatorOverflowDetection:
    """Regression (VERDICT r2 weak #4): allocator overflow under jit must be
    detected, not silently corrupt another row's KV via clamped scatters."""

    def test_checked_flag_under_jit(self, cfg):
        cache = PagedKVCache.create(cfg, batch=1, num_pages=2,
                                    max_pages_per_seq=2, page_size=4)

        @jax.jit
        def alloc(cache, n):
            from streamchat_tpu.models.paged_kv import allocate_pages_checked

            return allocate_pages_checked(cache, n)

        ok_cache, over = alloc(cache, jnp.array([8]))   # exactly 2 pages: fits
        assert not bool(over)
        _, over = alloc(ok_cache._replace(length=jnp.array([8])),
                        jnp.array([4]))                 # 3rd page: overflow
        assert bool(over)

    def test_generate_paged_raises_on_traced_overflow(self, cfg, key):
        """A decode loop whose pool runs dry (H2O disabled) raises instead of
        emitting tokens computed from another sequence's KV."""
        from streamchat_tpu.models.generate_paged import generate_paged

        from streamchat_tpu.models import decoder as dec

        params = dec.init(jax.random.key(0), cfg, dtype=jnp.float32)
        ids = jax.random.randint(key, (1, 8), 0, cfg.vocab_size)
        embeds = dec.embed_tokens(params, ids)
        with pytest.raises(RuntimeError, match="overflow"):
            generate_paged(
                params, cfg, embeds, jnp.array([8], jnp.int32),
                jax.random.key(1), max_new_tokens=8, page_size=8,
                num_pages=1, max_pages_per_seq=1,
            )

    def test_concrete_overflow_still_raises_eagerly(self, cfg):
        cache = PagedKVCache.create(cfg, batch=1, num_pages=1,
                                    max_pages_per_seq=1, page_size=4)
        with pytest.raises(ValueError, match="overflow"):
            allocate_pages(cache, jnp.array([8]))


class TestInt8DensePrefill:
    """Long kv_int8 prompts prefill straight into decoder.Int8KVCache and
    repage without requantizing (the bf16 dense transient never exists)."""

    def test_repage_prequantized_matches_quantizing_path(self, cfg):
        """from_contiguous_int8(Int8KVCache built by _quantize_kv) must equal
        from_contiguous_int8(bf16 KVCache) bit-for-bit — same quantizer."""
        from streamchat_tpu.models import decoder
        from streamchat_tpu.models.paged_kv import _quantize_kv, from_contiguous_int8

        l, b, hkv, lmax, dh = cfg.num_layers, 1, cfg.num_kv_heads, 16, cfg.head_dim
        k = jax.random.normal(jax.random.key(0), (l, b, hkv, lmax, dh), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(1), (l, b, hkv, lmax, dh), jnp.bfloat16)
        length = jnp.array([13], jnp.int32)
        dense = decoder.KVCache(k=k, v=v, length=length)
        k_i8, k_s = _quantize_kv(k)
        v_i8, v_s = _quantize_kv(v)
        pre = decoder.Int8KVCache(k=k_i8, v=v_i8, k_s=k_s, v_s=v_s, length=length)

        a = from_contiguous_int8(dense, 4, 4, page_size=4)
        q = from_contiguous_int8(pre, 4, 4, page_size=4)
        np.testing.assert_array_equal(np.asarray(a.k_pages), np.asarray(q.k_pages))
        np.testing.assert_array_equal(np.asarray(a.v_pages), np.asarray(q.v_pages))
        np.testing.assert_array_equal(np.asarray(a.k_scale), np.asarray(q.k_scale))
        np.testing.assert_array_equal(np.asarray(a.page_table), np.asarray(q.page_table))

    def test_long_prompt_kv_int8_generation(self, cfg, monkeypatch):
        """With the chunked-prefill threshold lowered, a kv_int8 prompt takes
        the Int8KVCache prefill route end-to-end and still greedy-matches the
        bf16-cache path on a tiny model."""
        from streamchat_tpu.models import decoder, generate
        from streamchat_tpu.models.generate_paged import generate_paged

        # Unique shapes so the patched-threshold trace can't collide with a
        # cached _generate_paged_jit trace from other tests.
        monkeypatch.setattr(generate, "CHUNKED_PREFILL_THRESHOLD", 24)
        used = []
        orig_create = decoder.Int8KVCache.create.__func__
        monkeypatch.setattr(
            decoder.Int8KVCache, "create",
            classmethod(lambda c, *a, **k: used.append(1) or orig_create(c, *a, **k)),
        )
        params = decoder.init(jax.random.key(3), cfg, jnp.float32)
        ids = jax.random.randint(jax.random.key(5), (1, 37), 0, cfg.vocab_size)
        embeds = decoder.embed_tokens(params, ids)
        length = jnp.array([37], jnp.int32)
        kw = dict(max_new_tokens=7, temperature=0.0, page_size=8)
        t_full, _ = generate_paged(params, cfg, embeds, length,
                                   jax.random.key(0), **kw)
        t_q, _ = generate_paged(params, cfg, embeds, length,
                                jax.random.key(0), kv_int8=True, **kw)
        match = np.mean(np.asarray(t_full) == np.asarray(t_q))
        assert match >= 0.7, f"only {match:.0%} tokens match bf16 cache"
        assert used, "kv_int8 long prompt did not take the Int8KVCache prefill route"


class TestBatchedPartitionedPool:
    """Statically partitioned batched pools — the batched-captioning serving
    path (models/generate_paged.py static_partition): row r owns pool slice
    [r*maxp, (r+1)*maxp) with a fully-mapped table, no allocator in the
    decode loop, and the batched sequential-pool kernels
    (ops/paged_attention.paged_decode_attention_pallas_seq[_int8])."""

    def _dense(self, cfg, lengths, lmax, seed=0):
        """Random prefilled dense cache [L, B, Hkv, Lmax, Dh] (f32)."""
        from streamchat_tpu.models.decoder import KVCache

        b = len(lengths)
        l, hkv, dh = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
        k = jax.random.normal(jax.random.key(seed), (l, b, hkv, lmax, dh))
        v = jax.random.normal(jax.random.key(seed + 1), (l, b, hkv, lmax, dh))
        # Zero slots past each row's length (prefill would leave zeros too).
        pos = jnp.arange(lmax)[None, None, None, :, None]
        mask = pos < jnp.asarray(lengths)[None, :, None, None, None]
        return KVCache(k=k * mask, v=v * mask,
                       length=jnp.asarray(lengths, jnp.int32))

    def test_from_contiguous_partitioned_layout(self, cfg):
        from streamchat_tpu.models.paged_kv import from_contiguous

        lengths, lmax, ps, maxp = [32, 17], 32, 16, 4
        dense = self._dense(cfg, lengths, lmax)
        paged = from_contiguous(dense, num_pages=2 * maxp,
                                max_pages_per_seq=maxp, page_size=ps,
                                partitioned=True)
        t = np.asarray(paged.page_table)
        np.testing.assert_array_equal(t[0], [0, 1, 2, 3])
        np.testing.assert_array_equal(t[1], [4, 5, 6, 7])
        assert int(paged.next_free) == 8
        # Row 1's first page sits at pool slot maxp and holds its tokens.
        np.testing.assert_array_equal(
            np.asarray(paged.k_pages[:, maxp]),
            np.asarray(dense.k[:, 1, :, :ps]),
        )
        # Unused tail pages of a partitioned row are zero.
        assert float(jnp.abs(paged.k_pages[:, maxp + 2:2 * maxp]).max()) == 0.0

    def test_partitioned_gather_matches_contiguous(self, cfg, key):
        from streamchat_tpu.models.paged_kv import from_contiguous

        lengths, lmax, ps, maxp = [37, 12], 64, 16, 4
        dense = self._dense(cfg, lengths, lmax, seed=10)
        paged = from_contiguous(dense, num_pages=2 * maxp,
                                max_pages_per_seq=maxp, page_size=ps,
                                partitioned=True)
        q = jax.random.normal(key, (2, cfg.num_heads, 1, cfg.head_dim))
        length = jnp.asarray(lengths, jnp.int32)
        out = paged_decode_attention(
            q, paged.k_pages[0], paged.v_pages[0], paged.page_table, length
        )
        ref = decode_attention(q, dense.k[0], dense.v[0], length)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_seq_kernel_batched_matches_xla(self, cfg, key):
        """Batched (b=2) partitioned-pool seq kernel == XLA gather path,
        ragged lengths (one row page-aligned, one mid-page)."""
        from streamchat_tpu.models.paged_kv import from_contiguous
        from streamchat_tpu.ops.paged_attention import (
            paged_decode_attention_pallas_seq,
        )

        lengths, lmax, ps, maxp = [37, 12], 64, 16, 4
        dense = self._dense(cfg, lengths, lmax, seed=20)
        paged = from_contiguous(dense, num_pages=2 * maxp,
                                max_pages_per_seq=maxp, page_size=ps,
                                partitioned=True)
        q = jax.random.normal(key, (2, cfg.num_heads, 1, cfg.head_dim))
        length = jnp.asarray(lengths, jnp.int32)
        ref = paged_decode_attention(
            q, paged.k_pages[0], paged.v_pages[0], paged.page_table, length
        )
        out = paged_decode_attention_pallas_seq(
            q, paged.k_pages[0], paged.v_pages[0], length,
            pages_per_block=2, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_seq_kernel_batched_rejects_ragged_partition(self, cfg, key):
        """b>1 requires each row slice to hold whole kernel blocks."""
        from streamchat_tpu.ops.paged_attention import (
            paged_decode_attention_pallas_seq,
        )

        hkv, dh, ps = cfg.num_kv_heads, cfg.head_dim, 16
        q = jax.random.normal(key, (2, cfg.num_heads, 1, dh))
        pages = jnp.zeros((6, hkv, ps, dh))          # 3 pages/row, pb=2
        with pytest.raises(ValueError, match="multiple"):
            paged_decode_attention_pallas_seq(
                q, pages, pages, jnp.asarray([3, 3], jnp.int32),
                pages_per_block=2, interpret=True,
            )

    def test_seq_int8_kernel_batched_matches_xla(self, cfg, key):
        from streamchat_tpu.models.paged_kv import (
            from_contiguous_int8,
            paged_decode_attention_int8,
        )
        from streamchat_tpu.ops.paged_attention import (
            paged_decode_attention_pallas_seq_int8,
        )

        lengths, lmax, ps, maxp = [37, 12], 64, 16, 4
        dense = self._dense(cfg, lengths, lmax, seed=30)
        paged = from_contiguous_int8(dense, num_pages=2 * maxp,
                                     max_pages_per_seq=maxp, page_size=ps,
                                     partitioned=True)
        q = jax.random.normal(key, (2, cfg.num_heads, 1, cfg.head_dim))
        length = jnp.asarray(lengths, jnp.int32)
        ref = paged_decode_attention_int8(
            q, paged.k_pages[0], paged.v_pages[0],
            paged.k_scale[0], paged.v_scale[0], paged.page_table, length,
        )
        out = paged_decode_attention_pallas_seq_int8(
            q, paged.k_pages[0], paged.v_pages[0],
            paged.k_scale[0], paged.v_scale[0], length,
            pages_per_block=2, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_batched_generate_token_exact_vs_contiguous(self, cfg, key):
        """b=3 ragged greedy batch through the static-partitioned paged path
        == the contiguous batched generate, token-exact."""
        from streamchat_tpu.models import decoder
        from streamchat_tpu.models.generate import generate
        from streamchat_tpu.models.generate_paged import generate_paged

        params = decoder.init(key, cfg, jnp.float32)
        s = 24
        ids = jax.random.randint(jax.random.key(7), (3, s), 0, cfg.vocab_size)
        embeds = decoder.embed_tokens(params, ids)
        lengths = jnp.asarray([21, 13, 24], jnp.int32)
        kw = dict(max_new_tokens=8, temperature=0.0)
        toks_c, count_c = generate(
            params, cfg, embeds, lengths, jax.random.key(0), **kw
        )
        toks_p, count_p = generate_paged(
            params, cfg, embeds, lengths, jax.random.key(0),
            page_size=8, **kw
        )
        np.testing.assert_array_equal(np.asarray(toks_c), np.asarray(toks_p))
        np.testing.assert_array_equal(np.asarray(count_c), np.asarray(count_p))

    def test_batched_generate_kv_int8_tracks_per_row(self, cfg, key):
        """Batched kv_int8 partitioned decode ~matches independent per-row
        kv_int8 runs (identical quantization; batching changes only XLA
        tiling)."""
        from streamchat_tpu.models import decoder
        from streamchat_tpu.models.generate_paged import generate_paged

        params = decoder.init(key, cfg, jnp.float32)
        s = 24
        ids = jax.random.randint(jax.random.key(9), (2, s), 0, cfg.vocab_size)
        embeds = decoder.embed_tokens(params, ids)
        lengths = jnp.asarray([21, 24], jnp.int32)
        kw = dict(max_new_tokens=8, temperature=0.0, page_size=8,
                  kv_int8=True)
        toks_b, _ = generate_paged(
            params, cfg, embeds, lengths, jax.random.key(0), **kw
        )
        rows = []
        for r in range(2):
            t, _ = generate_paged(
                params, cfg, embeds[r:r + 1], lengths[r:r + 1],
                jax.random.key(0), **kw
            )
            rows.append(np.asarray(t)[0])
        match = np.mean(np.asarray(toks_b) == np.stack(rows))
        assert match >= 0.75, f"only {match:.0%} tokens match per-row runs"
