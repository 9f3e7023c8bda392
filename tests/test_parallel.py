"""Mesh/sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4e)."""

import jax
import jax.numpy as jnp
import pytest

from streamchat_tpu.config import DecoderConfig, ViTConfig
from streamchat_tpu.models import decoder
from streamchat_tpu.models.decoder import KVCache
from streamchat_tpu.parallel import (
    best_mesh_shape,
    decoder_pspecs,
    make_mesh,
    shard_pytree,
)


def test_best_mesh_shape():
    assert best_mesh_shape(8, kv_heads=4) == (2, 4)
    assert best_mesh_shape(8, kv_heads=2) == (4, 2)
    assert best_mesh_shape(1, kv_heads=4) == (1, 1)
    assert best_mesh_shape(4, kv_heads=8) == (1, 4)


def test_make_mesh_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data", "model")


def test_decoder_pspecs_match_param_tree(key):
    cfg = DecoderConfig.tiny()
    params = decoder.init(key, cfg, jnp.float32)
    specs = decoder_pspecs(cfg)
    # Same tree structure: tree.map across both must not raise.
    jax.tree.map(lambda p, s: None, params, specs)


def test_tp_sharded_prefill_matches_single_device(key):
    """Prefill under a dp×tp mesh must reproduce single-device logits."""
    cfg = DecoderConfig.tiny()
    params = decoder.init(key, cfg, jnp.float32)

    b, s = 2, 16
    ids = jax.random.randint(jax.random.key(1), (b, s), 0, cfg.vocab_size)
    embeds = decoder.embed_tokens(params, ids)
    lengths = jnp.array([s, s - 4], jnp.int32)

    cache = KVCache.create(cfg, b, s, dtype=jnp.float32)
    ref_logits, _ = decoder.prefill(params, cfg, embeds, cache, lengths)

    mesh = make_mesh(*best_mesh_shape(8, kv_heads=cfg.num_kv_heads))
    sharded = shard_pytree(params, decoder_pspecs(cfg), mesh)
    cache2 = KVCache.create(cfg, b, s, dtype=jnp.float32)
    tp_logits, _ = decoder.prefill(sharded, cfg, embeds, cache2, lengths)

    assert jnp.allclose(ref_logits, tp_logits, atol=1e-4), (
        jnp.max(jnp.abs(ref_logits - tp_logits))
    )


def test_graft_dryrun_multichip():
    import __graft_entry__ as graft

    graft.dryrun_multichip(len(jax.devices()))


def test_longva_shard_generate(key):
    """Sharded LongVA produces identical greedy output to unsharded."""
    import jax.numpy as jnp

    from streamchat_tpu.config import ViTConfig
    from streamchat_tpu.models.longva import LongVA

    dec_cfg = DecoderConfig.tiny()
    model = LongVA.init_random(
        key, ViTConfig.tiny(projection_dim=dec_cfg.hidden_size), dec_cfg,
        dtype=jnp.float32,
    )
    feats = jax.random.normal(jax.random.key(1), (4, dec_cfg.hidden_size))
    prompt = "<image>\nwhat?"
    ref = model.generate_with_image_embedding(
        prompt, [feats], max_new_tokens=4, temperature=0.0
    )
    model.shard()
    out = model.generate_with_image_embedding(
        prompt, [feats], max_new_tokens=4, temperature=0.0
    )
    assert out == ref


def test_longva_shard_generate_batch(key):
    """tp-sharded BATCHED captioning matches the unsharded sequential path.

    This is the multi-chip serving knob for the one-chip gap recorded in
    PARITY.md: caption_batch=2 at chunk_size=40 RESOURCE_EXHAUSTEDs a single
    16 GB v5e (2-row partitioned KV pool + prefill transients) even with
    resident offload, so batched captioning at the canonical v0.3 config is
    served sharded — `LongVA.shard()` over a (data, model) mesh, the TPU
    answer to the reference's two dedicated 80 GB replicas
    (inference_streaming_longva_v2.py:697-700). Asserts the batched
    partitioned-pool paged decode reproduces the unsharded per-row greedy
    outputs token-for-token under the 8-device CPU mesh.
    """
    import jax.numpy as jnp

    from streamchat_tpu.config import ViTConfig
    from streamchat_tpu.models.longva import LongVA

    dec_cfg = DecoderConfig.tiny()
    model = LongVA.init_random(
        key, ViTConfig.tiny(projection_dim=dec_cfg.hidden_size), dec_cfg,
        dtype=jnp.float32,
    )
    prompts = ["caption <image> one.", "caption <image> two, longer prompt."]
    feats = [
        [jax.random.normal(jax.random.key(10 + i), (6, dec_cfg.hidden_size)) * 0.2]
        for i in range(len(prompts))
    ]
    want = [
        model.generate_with_image_embedding(p, f, max_new_tokens=6, temperature=0.0)
        for p, f in zip(prompts, feats)
    ]
    model.shard()
    got = model.generate_with_image_embedding_batch(
        prompts, feats, max_new_tokens=6, temperature=0.0
    )
    assert got == want
