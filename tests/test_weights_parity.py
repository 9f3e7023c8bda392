"""Checkpoint-loader parity vs HuggingFace reference implementations.

Creates tiny random HF models (Qwen2, CLIP vision, BERT), saves them as real
checkpoints, loads them through streamchat_tpu.models.weights, and compares
forward numerics. This is the proof that `from_pretrained` on the real
LongVA / LLaMA-3 / mxbai / MiniLM checkpoints reproduces the reference
models (SURVEY.md §2.2).

transformers/torch imports are slow (~15 s); everything HF is kept inside
one module so the cost is paid once.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def qwen2_ckpt(tmp_path_factory):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("qwen2")
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


class TestDecoderParity:
    def test_qwen2_logits_match(self, qwen2_ckpt):
        path, hf_model = qwen2_ckpt
        from streamchat_tpu.models import decoder, weights
        from streamchat_tpu.models.decoder import KVCache

        cfg, params = weights.load_decoder(path, dtype=jnp.float32)
        assert cfg.qkv_bias is True
        assert cfg.num_kv_heads == 2

        ids = np.array([[3, 17, 42, 99, 7, 23]], np.int32)
        with torch.no_grad():
            ref = hf_model(torch.tensor(ids, dtype=torch.long)).logits.numpy()

        s = ids.shape[1]
        embeds = decoder.embed_tokens(params, jnp.asarray(ids))
        positions = jnp.arange(s, dtype=jnp.int32)[None]
        cache = KVCache.create(cfg, 1, s, dtype=jnp.float32)
        hidden, _ = decoder.forward(
            params, cfg, embeds, positions, cache,
            jnp.array([s], jnp.int32), decode=False,
        )
        ours = np.asarray(decoder.logits_from_hidden(params, cfg, hidden))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)

    def test_decode_matches_prefill(self, qwen2_ckpt):
        """KV-cached decode of token t must equal prefill logits at t."""
        path, _ = qwen2_ckpt
        from streamchat_tpu.models import decoder, weights
        from streamchat_tpu.models.decoder import KVCache

        cfg, params = weights.load_decoder(path, dtype=jnp.float32)
        ids = np.array([[5, 9, 33, 77]], np.int32)
        s = ids.shape[1]

        embeds = decoder.embed_tokens(params, jnp.asarray(ids))
        positions = jnp.arange(s, dtype=jnp.int32)[None]
        cache = KVCache.create(cfg, 1, s + 1, dtype=jnp.float32)
        hidden, _ = decoder.forward(
            params, cfg, embeds, positions, cache,
            jnp.array([s], jnp.int32), decode=False,
        )
        full = np.asarray(decoder.logits_from_hidden(params, cfg, hidden))

        cache2 = KVCache.create(cfg, 1, s + 1, dtype=jnp.float32)
        hidden_p, cache2 = decoder.forward(
            params, cfg, embeds[:, :-1], positions[:, :-1], cache2,
            jnp.array([s - 1], jnp.int32), decode=False,
        )
        logits_step, _ = decoder.decode_step(
            params, cfg, jnp.asarray(ids[:, -1]), cache2
        )
        np.testing.assert_allclose(
            np.asarray(logits_step), full[:, -1], atol=2e-4, rtol=2e-3
        )


class TestGenerateParity:
    """End-to-end greedy decode parity vs HF transformers (VERDICT r2 #4).

    The same tiny random Qwen2 checkpoint drives both stacks through the
    full multimodal path — `<image>` splice into input embeddings, prefill,
    KV-cached greedy decode — mirroring the reference's
    `generate_with_image_embedding`
    (longva/model/language_model/llava_qwen.py:138-189 +
    llava_arch.py:208-343, where spliced embeds feed HF `generate`).
    Token ids must match HF exactly, for BOTH decode backends."""

    @pytest.fixture(scope="class")
    def setup(self, qwen2_ckpt):
        import dataclasses

        import jax

        from streamchat_tpu.config import ViTConfig
        from streamchat_tpu.models import weights
        from streamchat_tpu.models.longva import LongVA
        from streamchat_tpu.models.tokenizer import ByteTokenizer
        from streamchat_tpu.utils.prng import KeySeq

        path, hf_model = qwen2_ckpt
        cfg, params = weights.load_decoder(path, dtype=jnp.float32)
        tok = ByteTokenizer()
        model = LongVA(
            vit_params={}, proj_params={}, dec_params=params,
            vit_cfg=ViTConfig.tiny(projection_dim=cfg.hidden_size),
            dec_cfg=cfg, tokenizer=tok, keys=KeySeq(jax.random.key(0)),
        )
        prompt = "user: describe <image> now\nassistant:"
        feats = np.random.default_rng(7).normal(
            size=(3, cfg.hidden_size)
        ).astype(np.float32) * 0.1

        # HF twin of the splice: text-embed prefix/suffix, insert the image
        # features verbatim (they are already in LM space), greedy-generate
        # from inputs_embeds.
        pre_s, suf_s = prompt.split("<image>")
        pre = torch.tensor([tok.encode(pre_s)], dtype=torch.long)
        suf = torch.tensor([tok.encode(suf_s)], dtype=torch.long)
        emb = hf_model.get_input_embeddings()
        with torch.no_grad():
            inputs_embeds = torch.cat(
                [emb(pre), torch.tensor(feats)[None], emb(suf)], dim=1
            )
            hf_out = hf_model.generate(
                inputs_embeds=inputs_embeds,
                attention_mask=torch.ones(inputs_embeds.shape[:2],
                                          dtype=torch.long),
                max_new_tokens=12, do_sample=False,
            )
        hf_tokens = hf_out[0].tolist()   # only the new tokens (inputs_embeds)
        return model, prompt, feats, hf_tokens

    def _our_tokens(self, model, prompt, feats, backend):
        import dataclasses

        m = dataclasses.replace(model, decode_backend=backend)
        embeds, length = m.splice_prompt(prompt, [jnp.asarray(feats)])
        if backend == "paged":
            from streamchat_tpu.models.generate_paged import generate_paged as gen
        else:
            from streamchat_tpu.models.generate import generate as gen
        import jax

        toks, count = gen(
            m.dec_params, m.dec_cfg, embeds,
            jnp.array([length], jnp.int32), jax.random.key(0),
            max_new_tokens=12, temperature=0.0,
            eos_ids=tuple(m.tokenizer.eos_ids),
        )
        return [int(t) for t in np.asarray(toks[0])]

    def test_contiguous_matches_hf(self, setup):
        model, prompt, feats, hf_tokens = setup
        ours = self._our_tokens(model, prompt, feats, "contiguous")
        assert ours[:len(hf_tokens)] == hf_tokens

    def test_paged_matches_hf(self, setup):
        model, prompt, feats, hf_tokens = setup
        ours = self._our_tokens(model, prompt, feats, "paged")
        assert ours[:len(hf_tokens)] == hf_tokens

    def test_full_api_string_matches_hf_bytes(self, setup):
        """The public generate_with_image_embedding string equals the HF
        token stream byte-decoded (ByteTokenizer is invertible here)."""
        from streamchat_tpu.models.tokenizer import ByteTokenizer

        model, prompt, feats, hf_tokens = setup
        out = model.generate_with_image_embedding(
            prompt, [jnp.asarray(feats)], max_new_tokens=12, temperature=0.0
        )
        assert out == ByteTokenizer().decode(hf_tokens).strip()


class TestViTParity:
    def test_clip_tower_matches_hf(self, tmp_path):
        from transformers import CLIPVisionConfig, CLIPVisionModel

        hf_cfg = CLIPVisionConfig(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=3,
            num_attention_heads=4,
            image_size=28,
            patch_size=14,
            hidden_act="quick_gelu",
        )
        torch.manual_seed(1)
        hf_model = CLIPVisionModel(hf_cfg).eval()
        hf_model.save_pretrained(tmp_path, safe_serialization=True)

        from streamchat_tpu.config import ViTConfig
        from streamchat_tpu.models import vit, weights

        cfg = ViTConfig(
            image_size=28, patch_size=14, hidden_size=32,
            intermediate_size=64, num_layers=3, num_heads=4,
        )
        tensors = weights._open_shards(str(tmp_path))
        params = weights.map_vit(tensors, cfg, jnp.float32, prefix="vision_model.")

        pixels = np.random.default_rng(0).normal(size=(2, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            hs = hf_model(
                torch.tensor(pixels), output_hidden_states=True
            ).hidden_states
        ref = hs[-2][:, 1:].numpy()   # select_layer=-2, drop CLS

        ours = np.asarray(vit.encode(params, jnp.asarray(pixels), cfg))
        np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=2e-3)


class TestBertParity:
    def test_bert_encoder_matches_hf(self, tmp_path):
        from transformers import BertConfig as HFBertConfig, BertModel

        hf_cfg = HFBertConfig(
            vocab_size=100,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=64,
        )
        torch.manual_seed(2)
        hf_model = BertModel(hf_cfg, add_pooling_layer=False).eval()
        hf_model.save_pretrained(tmp_path, safe_serialization=True)

        from streamchat_tpu.models import embedder, weights

        cfg, params = weights.load_bert(str(tmp_path), "cls", dtype=jnp.float32)
        ids = np.array([[2, 5, 9, 14, 3, 0, 0, 0]], np.int32)
        mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0]], np.int32)
        with torch.no_grad():
            ref = hf_model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state.numpy()
        ours = np.asarray(
            embedder.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
        )
        # Padded positions attend to garbage in both; compare valid prefix.
        np.testing.assert_allclose(ours[:, :5], ref[:, :5], atol=3e-4, rtol=2e-3)
