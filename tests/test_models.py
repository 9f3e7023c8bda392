"""ViT encoder, embedder, and LongVA assembly (tiny configs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.config import BertConfig, DecoderConfig, ViTConfig
from streamchat_tpu.models import TextEmbedder, LongVA, vit
from streamchat_tpu.models.tokenizer import (
    IMAGE_TOKEN_INDEX,
    ByteTokenizer,
    tokenize_with_image_token,
)
from streamchat_tpu.pipeline import prompts

TINY_VIT = ViTConfig(
    image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
    num_layers=3, num_heads=4, projection_dim=128,
)
TINY_DEC = DecoderConfig.tiny()


@pytest.fixture(scope="module")
def model():
    return LongVA.init_random(
        jax.random.key(0), TINY_VIT, TINY_DEC, dtype=jnp.float32
    )


class TestViT:
    def test_encode_shapes(self, model):
        pixels = jax.random.normal(jax.random.key(1), (3, 3, 28, 28))
        feats = vit.encode(model.vit_params, pixels, TINY_VIT)
        assert feats.shape == (3, 4, 32)  # 2x2 patch grid

    def test_select_layer_skips_last_block(self, model):
        pixels = jax.random.normal(jax.random.key(1), (1, 3, 28, 28))
        h_m2 = vit.hidden_states(model.vit_params, pixels, TINY_VIT, select_layer=-2)
        h_m1 = vit.hidden_states(model.vit_params, pixels, TINY_VIT, select_layer=-1)
        assert not np.allclose(np.asarray(h_m2), np.asarray(h_m1))

    def test_projection_to_lm_space(self, model):
        pixels = jax.random.normal(jax.random.key(1), (2, 3, 28, 28))
        out = model.encode_images(pixels)
        assert out.shape == (2, 4, TINY_DEC.hidden_size)


class TestTokenizer:
    def test_image_token_split(self):
        tok = ByteTokenizer()
        ids = tokenize_with_image_token("ab<image>cd", tok)
        assert ids == [ord("a"), ord("b"), IMAGE_TOKEN_INDEX, ord("c"), ord("d")]

    def test_multiple_images(self):
        tok = ByteTokenizer()
        ids = tokenize_with_image_token("<image>x<image>", tok)
        assert ids == [IMAGE_TOKEN_INDEX, ord("x"), IMAGE_TOKEN_INDEX]


class TestPrompts:
    def test_chatml_format(self):
        p = prompts.wrap_user_turn("qwen_1_5", "hello")
        assert p == (
            "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
            "<|im_start|>user\nhello<|im_end|>\n<|im_start|>assistant\n"
        )

    def test_answer_prompt_variants(self):
        full = prompts.build_answer_prompt("Q?", "HIST.", "a caption")
        assert full.startswith("HIST.")
        assert "a caption" in full and "<image>" in full
        assert full.endswith("Q?" + prompts.ANSWER_NOTION)
        no_hist = prompts.build_answer_prompt("Q?", None, None)
        assert no_hist == "<image>\nQ?" + prompts.ANSWER_NOTION
        hist_no_cap = prompts.build_answer_prompt("Q?", "H", None)
        assert hist_no_cap == "H\nQ?" + prompts.ANSWER_NOTION

    def test_summary_prompt_ordinals(self):
        p = prompts.build_summary_prompt(["cap A", "cap B"])
        assert "first video clip is:cap A" in p
        assert "second video clip is:cap B" in p


class TestLongVA:
    def test_splice_counts_tokens(self, model):
        feats = jnp.ones((1, 6, TINY_DEC.hidden_size))
        embeds, length = model.splice_prompt("ab<image>cd", [feats])
        assert length == 2 + 6 + 2
        assert embeds.shape[1] % 128 == 0
        # Image features land between the text embeddings.
        np.testing.assert_allclose(np.asarray(embeds[0, 2:8]), np.ones((6, 128)), atol=1e-6)

    def test_splice_missing_embedding_raises(self, model):
        with pytest.raises(ValueError):
            model.splice_prompt("a<image>b<image>c", [jnp.ones((1, 4, 128))])

    def test_generate_with_image_embedding(self, model):
        feats = jnp.ones((4, TINY_DEC.hidden_size)) * 0.1
        out = model.generate_with_image_embedding(
            "describe <image> now", [feats], max_new_tokens=4, temperature=0.0
        )
        assert isinstance(out, str)

    def test_text_only_generation(self, model):
        out = model.generate_with_image_embedding(
            "hello world", None, max_new_tokens=4, temperature=0.0
        )
        assert isinstance(out, str)

    def test_batch_honors_kv_budget(self, model, monkeypatch):
        """Regression (ADVICE r2 medium): batched generation with
        kv_budget_tokens set must route through the budgeted per-row paged
        path, never the dense prompt+max_new cache (which silently blew the
        configured HBM budget). The dense path is trapped; outputs must
        match the sequential budgeted calls."""
        import dataclasses

        from streamchat_tpu.models import longva as longva_mod

        budgeted = dataclasses.replace(model, kv_budget_tokens=256)
        prompts = ["describe <image> now", "count <image> items"]
        feats = [[jnp.ones((4, TINY_DEC.hidden_size)) * 0.1]] * 2
        want = [
            budgeted.generate_with_image_embedding(
                p, f, max_new_tokens=4, temperature=0.0
            )
            for p, f in zip(prompts, feats)
        ]

        def trap(*a, **kw):
            raise AssertionError("dense generate used despite kv_budget_tokens")

        monkeypatch.setattr(longva_mod.genlib, "generate", trap)
        got = budgeted.generate_with_image_embedding_batch(
            prompts, feats, max_new_tokens=4, temperature=0.0
        )
        assert got == want


class TestEmbedder:
    def test_embed_batch(self):
        emb = TextEmbedder.init_random(jax.random.key(0))
        vecs = emb.embed(["hello world", "a much longer sentence about videos"])
        assert vecs.shape == (2, emb.cfg.hidden_size)
        assert not np.allclose(np.asarray(vecs[0]), np.asarray(vecs[1]))

    def test_identical_texts_identical_embeddings(self):
        emb = TextEmbedder.init_random(jax.random.key(0))
        vecs = emb.embed(["same text", "same text"])
        np.testing.assert_allclose(np.asarray(vecs[0]), np.asarray(vecs[1]), atol=1e-5)

    def test_mean_pooling_ignores_padding(self):
        cfg = BertConfig.tiny()
        cfg = BertConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, max_position_embeddings=cfg.max_position_embeddings,
            pooling="mean",
        )
        emb = TextEmbedder.init_random(jax.random.key(0), cfg)
        # Same text alone vs padded next to a longer neighbor must embed the same.
        a = emb.embed(["short"])
        b = emb.embed(["short", "a considerably longer text that forces padding"])
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-4)

    def test_empty(self):
        emb = TextEmbedder.init_random(jax.random.key(0))
        assert emb.embed([]).shape[0] == 0
