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
