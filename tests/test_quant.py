"""Weight-only int8 quantization (ops/quant.py) and its decoder integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.config import DecoderConfig
from streamchat_tpu.models import decoder
from streamchat_tpu.ops.quant import (
    dequantize_weight,
    matmul_any,
    qmatmul,
    quantize_decoder_params,
    quantize_weight,
)

CFG = DecoderConfig.tiny()


def test_quantize_roundtrip_error(key):
    w = jax.random.normal(key, (64, 32)) * 0.1
    q = quantize_weight(w)
    assert q["w_i8"].dtype == jnp.int8
    deq = dequantize_weight(q, jnp.float32)
    # Per-channel symmetric int8: error bounded by scale/2 per element.
    bound = np.asarray(q["scale"]) / 2 + 1e-7
    err = np.max(np.abs(np.asarray(deq) - np.asarray(w)), axis=0)
    assert np.all(err <= bound)


def test_qmatmul_matches_dequantized(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (4, 64), jnp.float32)
    w = jax.random.normal(k2, (64, 32)) * 0.1
    q = quantize_weight(w)
    got = qmatmul(x, q)
    want = x @ dequantize_weight(q, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    # matmul_any dispatches both forms.
    np.testing.assert_allclose(
        np.asarray(matmul_any(x, q)), np.asarray(got), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(matmul_any(x, w)), np.asarray(x @ w), atol=0
    )


def test_zero_column_safe():
    w = jnp.zeros((8, 4))
    q = quantize_weight(w)
    assert np.all(np.asarray(dequantize_weight(q)) == 0)


@pytest.fixture
def params(key):
    return decoder.init(key, CFG, jnp.float32)


def test_quantized_prefill_close(params, key):
    """Full vs int8 prefill logits agree to quantization tolerance."""
    qparams = quantize_decoder_params(params)
    assert qparams["layers"][0]["attn"]["q"]["w_i8"].dtype == jnp.int8
    assert "b" in qparams["layers"][0]["attn"]["q"]  # qkv bias preserved
    ids = jax.random.randint(key, (1, 16), 0, CFG.vocab_size)
    embeds = decoder.embed_tokens(params, ids)
    from streamchat_tpu.models.decoder import KVCache

    lf, _ = decoder.prefill(
        params, CFG, embeds, KVCache.create(CFG, 1, 32, dtype=jnp.float32),
        jnp.array([16], jnp.int32),
    )
    lq, _ = decoder.prefill(
        qparams, CFG, embeds, KVCache.create(CFG, 1, 32, dtype=jnp.float32),
        jnp.array([16], jnp.int32),
    )
    # int8 per-channel on a 2-layer tiny model: logits stay well correlated.
    a, b = np.asarray(lf[0]), np.asarray(lq[0])
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99


def test_quantized_generate_runs(params, key):
    """Both decode paths (contiguous fused loop + paged) run on int8."""
    from streamchat_tpu.models.generate import generate
    from streamchat_tpu.models.generate_paged import generate_paged

    qparams = quantize_decoder_params(params)
    ids = jax.random.randint(key, (1, 12), 0, CFG.vocab_size)
    embeds = decoder.embed_tokens(qparams, ids)
    length = jnp.array([12], jnp.int32)
    kw = dict(max_new_tokens=6, temperature=0.0)
    t1, c1 = generate(qparams, CFG, embeds, length, jax.random.key(0), **kw)
    t2, c2 = generate_paged(
        qparams, CFG, embeds, length, jax.random.key(0), page_size=16, **kw
    )
    assert t1.shape == (1, 6)
    # Paged and contiguous must stay token-exact under quantization too.
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_longva_quantize_facade(key):
    from streamchat_tpu.config import ViTConfig
    from streamchat_tpu.models.longva import LongVA

    model = LongVA.init_random(
        key, ViTConfig.tiny(projection_dim=CFG.hidden_size), CFG,
        dtype=jnp.float32,
    ).quantize()
    feats = jax.random.normal(jax.random.key(1), (4, CFG.hidden_size))
    out = model.generate_with_image_embedding(
        "what is <image>?", [feats], max_new_tokens=4, temperature=0.0
    )
    assert isinstance(out, str)


def test_quantized_tp_sharding(key):
    """Int8 decoder params shard over the (data, model) mesh and generate
    identically to the unsharded quantized model (greedy)."""
    from streamchat_tpu.config import ViTConfig
    from streamchat_tpu.models.longva import LongVA
    from streamchat_tpu.parallel import make_mesh

    model = LongVA.init_random(
        key, ViTConfig.tiny(projection_dim=CFG.hidden_size), CFG,
        dtype=jnp.float32,
    ).quantize()
    feats = jax.random.normal(jax.random.key(3), (4, CFG.hidden_size))
    prompt = "tell me about <image> now"
    ref = model.generate_with_image_embedding(
        prompt, [feats], max_new_tokens=5, temperature=0.0
    )
    mesh = make_mesh(4, 2)   # tp=2 matches the tiny config's 2 KV heads
    model.shard(mesh)
    q0 = model.dec_params["layers"][0]["attn"]["q"]
    assert "model" in str(q0["w_i8"].sharding.spec)
    assert "model" in str(q0["scale"].sharding.spec)
    out = model.generate_with_image_embedding(
        prompt, [feats], max_new_tokens=5, temperature=0.0
    )
    assert out == ref


def test_quantized_checkpoint_roundtrip(params, key, tmp_path):
    """save_quantized/load_quantized reproduce the exact pytree and the
    loaded model generates identical greedy tokens."""
    from streamchat_tpu.models.generate import generate
    from streamchat_tpu.models.weights import load_quantized, save_quantized

    qparams = quantize_decoder_params(params)
    path = str(tmp_path / "ckpt_int8.npz")
    save_quantized(qparams, path)
    loaded = load_quantized(path, dtype=jnp.float32)

    assert loaded["layers"][0]["attn"]["q"]["w_i8"].dtype == jnp.int8
    assert len(loaded["layers"]) == CFG.num_layers
    ids = jax.random.randint(key, (1, 10), 0, CFG.vocab_size)
    embeds = decoder.embed_tokens(qparams, ids)
    length = jnp.array([10], jnp.int32)
    kw = dict(max_new_tokens=5, temperature=0.0)
    t1, _ = generate(qparams, CFG, embeds, length, jax.random.key(0), **kw)
    t2, _ = generate(loaded, CFG, embeds, length, jax.random.key(0), **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_quantized_embedding_lookup(params, key):
    """Int8 embedding rows dequantize at gather; generation still runs."""
    from streamchat_tpu.models.generate import generate
    from streamchat_tpu.ops.quant import embed_dim, embed_dtype, quantize_embedding

    qparams = quantize_decoder_params(params, quantize_embed=True)
    assert qparams["embed"]["w_i8"].dtype == jnp.int8
    assert embed_dim(qparams) == CFG.hidden_size
    assert embed_dtype(qparams) == jnp.bfloat16
    ids = jax.random.randint(key, (1, 10), 0, CFG.vocab_size)
    e_full = decoder.embed_tokens(params, ids)
    e_q = decoder.embed_tokens(qparams, ids)
    # Per-row int8: relative error ~< 1/127 per element.
    err = np.max(np.abs(np.asarray(e_q, np.float32) - np.asarray(e_full)))
    amax = np.max(np.abs(np.asarray(e_full)))
    assert err <= amax / 100
    toks, _ = generate(
        qparams, CFG, e_q, jnp.array([10], jnp.int32), jax.random.key(0),
        max_new_tokens=4, temperature=0.0,
    )
    assert toks.shape == (1, 4)


# ---------------------------------------------------------------------------
# int4 (group-128 RTN weight-only)
# ---------------------------------------------------------------------------


def test_int4_roundtrip_error(key):
    from streamchat_tpu.ops.quant import (
        dequantize_weight_int4, quantize_weight_int4,
    )

    w = jax.random.normal(key, (256, 32)) * 0.1
    q = quantize_weight_int4(w, group_size=128)
    assert q["w_i4p"].dtype == jnp.int8
    assert q["scale"].shape == (2, 2, 16)
    deq = np.asarray(dequantize_weight_int4(q, jnp.float32))
    # Symmetric RTN at 4 bits: per-element error <= scale/2 of its group.
    bound = np.repeat(np.asarray(q["scale"]).reshape(2, 32), 128, axis=0) / 2 + 1e-7
    assert np.all(np.abs(deq - np.asarray(w)) <= bound)


def test_int4_matmul_both_regimes(key):
    """The grouped decode path (few rows) and the materialized prefill path
    (many rows) both match the dequantized matmul exactly."""
    from streamchat_tpu.ops.quant import (
        dequantize_weight_int4, qmatmul_int4, quantize_weight_int4,
    )

    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k2, (256, 48)) * 0.1
    q = quantize_weight_int4(w, group_size=64)
    deq = dequantize_weight_int4(q, jnp.float32)
    for rows in (1, 4, 33):          # 1/4 -> grouped; 33 -> materialized
        x = jax.random.normal(k1, (rows, 256), jnp.float32)
        got = np.asarray(qmatmul_int4(x, q))
        want = np.asarray(x @ deq)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    # 3-d activations (the decoder's [B, S, D]) dispatch on total rows.
    x3 = jax.random.normal(k1, (2, 3, 256), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(qmatmul_int4(x3, q)),
        np.asarray(x3 @ deq), atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(matmul_any(x3, q)), np.asarray(qmatmul_int4(x3, q)), atol=0
    )


def test_int4_decoder_tree_and_prefill(params, key):
    """bits=4 quantizes layer matmuls to int4 (lm_head stays int8), and the
    int4 tree's prefill equals prefill over an explicitly DEQUANTIZED tree —
    the exactness invariant of qmatmul_int4 (quality on RANDOM tiny weights
    is not meaningful; correctness of the quantized compute is)."""
    from streamchat_tpu.ops.quant import dequantize_weight_int4

    q4 = quantize_decoder_params(params, bits=4)
    q0 = q4["layers"][0]["attn"]["q"]
    assert q0["w_i4p"].dtype == jnp.int8
    assert "b" in q0
    assert q4["lm_head"]["w_i8"].dtype == jnp.int8

    deq = jax.tree.map(
        lambda x: x,
        {
            **q4,
            "layers": [
                {
                    "input_norm": lp["input_norm"],
                    "post_norm": lp["post_norm"],
                    "attn": {
                        n: {
                            "w": dequantize_weight_int4(lp["attn"][n], jnp.float32),
                            **({"b": lp["attn"][n]["b"]} if "b" in lp["attn"][n] else {}),
                        }
                        for n in ("q", "k", "v", "o")
                    },
                    "mlp": {
                        n: dequantize_weight_int4(lp["mlp"][n], jnp.float32)
                        for n in ("gate", "up", "down")
                    },
                }
                for lp in q4["layers"]
            ],
        },
    )
    ids = jax.random.randint(key, (1, 16), 0, CFG.vocab_size)
    embeds = decoder.embed_tokens(params, ids)
    from streamchat_tpu.models.decoder import KVCache

    l4, _ = decoder.prefill(
        q4, CFG, embeds, KVCache.create(CFG, 1, 32, dtype=jnp.float32),
        jnp.array([16], jnp.int32),
    )
    ld, _ = decoder.prefill(
        deq, CFG, embeds, KVCache.create(CFG, 1, 32, dtype=jnp.float32),
        jnp.array([16], jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(l4[0]), np.asarray(ld[0]), atol=2e-3, rtol=1e-3
    )


def test_int4_generate_paths_token_exact(params, key):
    """Contiguous and paged decode agree token-for-token on an int4 tree
    (prefill materializes the dequant, decode runs the grouped path — both
    must compute the same numbers)."""
    from streamchat_tpu.models.generate import generate
    from streamchat_tpu.models.generate_paged import generate_paged

    q4 = quantize_decoder_params(params, bits=4)
    ids = jax.random.randint(key, (1, 12), 0, CFG.vocab_size)
    embeds = decoder.embed_tokens(q4, ids)
    length = jnp.array([12], jnp.int32)
    kw = dict(max_new_tokens=6, temperature=0.0)
    t1, _ = generate(q4, CFG, embeds, length, jax.random.key(0), **kw)
    t2, _ = generate_paged(
        q4, CFG, embeds, length, jax.random.key(0), page_size=16, **kw
    )
    assert t1.shape == (1, 6)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_int4_checkpoint_roundtrip(params, key, tmp_path):
    from streamchat_tpu.models.generate import generate
    from streamchat_tpu.models.weights import load_quantized, save_quantized

    q4 = quantize_decoder_params(params, bits=4)
    path = str(tmp_path / "ckpt_int4.npz")
    save_quantized(q4, path)
    loaded = load_quantized(path, dtype=jnp.float32)
    assert loaded["layers"][0]["attn"]["q"]["w_i4p"].dtype == jnp.int8
    ids = jax.random.randint(key, (1, 10), 0, CFG.vocab_size)
    embeds = decoder.embed_tokens(q4, ids)
    length = jnp.array([10], jnp.int32)
    kw = dict(max_new_tokens=5, temperature=0.0)
    t1, _ = generate(q4, CFG, embeds, length, jax.random.key(0), **kw)
    t2, _ = generate(loaded, CFG, embeds, length, jax.random.key(0), **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_int4_tp_sharding(key):
    """Int4 decoder params shard over the mesh (weight AND [g, out] scale)
    and generate identically to the unsharded int4 model."""
    from streamchat_tpu.config import ViTConfig
    from streamchat_tpu.models.longva import LongVA
    from streamchat_tpu.parallel import make_mesh

    model = LongVA.init_random(
        key, ViTConfig.tiny(projection_dim=CFG.hidden_size), CFG,
        dtype=jnp.float32,
    ).quantize(bits=4)
    feats = jax.random.normal(jax.random.key(3), (4, CFG.hidden_size))
    prompt = "tell me about <image> now"
    ref = model.generate_with_image_embedding(
        prompt, [feats], max_new_tokens=5, temperature=0.0
    )
    mesh = make_mesh(4, 2)
    model.shard(mesh)
    q0 = model.dec_params["layers"][0]["attn"]["q"]
    assert "model" in str(q0["w_i4p"].sharding.spec)
    assert "model" in str(q0["scale"].sharding.spec)
    out = model.generate_with_image_embedding(
        prompt, [feats], max_new_tokens=5, temperature=0.0
    )
    assert out == ref


def test_int4_pallas_kernel_interpret(key):
    """qmatvec_int4 (interpret mode) matches the dequantized matmul,
    including ragged j/k edges (oh and g not divisible by the blocks)."""
    from streamchat_tpu.ops.int4_matmul import qmatvec_int4
    from streamchat_tpu.ops.quant import (
        dequantize_weight_int4, quantize_weight_int4,
    )

    k1, k2 = jax.random.split(key)
    for kin, out, bo, gpb in (
        (256, 256, 128, 1),      # exact blocks
        (384, 512, 128, 2),      # k edge (3 groups, gpb 2)
        (256, 768, 256, 2),      # j edge (oh=384, bo=256)
    ):
        w = jax.random.normal(k2, (kin, out)) * 0.1
        q = quantize_weight_int4(w, group_size=128)
        x = (jax.random.normal(k1, (3, kin)) * 0.5).astype(jnp.bfloat16)
        got = qmatvec_int4(x, q["w_i4p"], q["scale"],
                           block_out=bo, groups_per_block=gpb,
                           interpret=True)
        want = (x @ dequantize_weight_int4(q, jnp.bfloat16)).astype(jnp.float32)
        assert got.shape == (3, out)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=0.25, rtol=0.05
        )


def test_int4_fused_kernel_interpret(key):
    """qmatvec_int4_fused (interpret mode) matches per-part single calls,
    including a part narrower than block_out (GQA k/v edge block) and
    uneven part widths."""
    from streamchat_tpu.ops.int4_matmul import qmatvec_int4_fused
    from streamchat_tpu.ops.quant import (
        dequantize_weight_int4, quantize_weight_int4,
    )

    k1, k2 = jax.random.split(key)
    kin = 384                                 # 3 groups, gpb 2 -> k edge
    widths = (512, 128, 128)                  # q/k/v-like: kv < block_out
    qs, wants = [], []
    x = (jax.random.normal(k1, (2, kin)) * 0.5).astype(jnp.bfloat16)
    for i, out in enumerate(widths):
        w = jax.random.normal(jax.random.fold_in(k2, i), (kin, out)) * 0.1
        q = quantize_weight_int4(w, group_size=128)
        qs.append(q)
        wants.append(
            (x @ dequantize_weight_int4(q, jnp.bfloat16)).astype(jnp.float32)
        )
    flat = []
    for q in qs:
        flat.extend([q["w_i4p"], q["scale"]])
    got = qmatvec_int4_fused(x, *flat, block_out=128, groups_per_block=2,
                             interpret=True)
    assert len(got) == len(widths)
    for g, want, out in zip(got, wants, widths):
        assert g.shape == (2, out)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(want), atol=0.25, rtol=0.05
        )


def test_int4_multi_fallback_matches_single(key):
    """qmatmul_int4_multi's fallback (CPU path) equals per-part calls and
    the int4 decoder still generates token-exactly vs the same weights
    through the single-call path (the fused gate never fires on CPU)."""
    from streamchat_tpu.ops.quant import (
        qmatmul_int4, qmatmul_int4_multi, quantize_weight_int4,
    )

    k1, k2 = jax.random.split(key)
    kin = 256
    x = (jax.random.normal(k1, (4, kin)) * 0.5).astype(jnp.bfloat16)
    qs = [
        quantize_weight_int4(
            jax.random.normal(jax.random.fold_in(k2, i), (kin, out)) * 0.1
        )
        for i, out in enumerate((384, 128, 128))
    ]
    multi = qmatmul_int4_multi(x, qs)
    for got, q in zip(multi, qs):
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(qmatmul_int4(x, q))
        )


def test_int4_scale_layout_roundtrip(key):
    """scale [g, 2, oh] reshapes to the flat per-column layout."""
    from streamchat_tpu.ops.quant import (
        dequantize_weight_int4, quantize_weight_int4, unpack_int4,
    )

    w = jax.random.normal(key, (128, 64)) * 0.1
    q = quantize_weight_int4(w, group_size=128)
    assert q["scale"].shape == (1, 2, 32)
    vals = np.asarray(unpack_int4(q["w_i4p"]))
    assert vals.min() >= -7 and vals.max() <= 7
    deq = np.asarray(dequantize_weight_int4(q, jnp.float32))
    bound = np.repeat(
        np.asarray(q["scale"]).reshape(1, 64), 128, axis=0
    ) / 2 + 1e-7
    assert np.all(np.abs(deq - np.asarray(w)) <= bound)
