"""Reproduce / bisect the 23k-token caption OOM at 7B geometry.

Loads the same static set as scripts/e2e_7b_geometry stage 1 (int8 Qwen2-7B
with int8 embed, ViT-L, bert-large + MiniLM embedders), parks a dummy
segment-chunks tensor, then runs ONE caption-shaped generate under each
backend variant, reporting which fit. Run on the idle chip.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def free_gib(tag, max_try=16):
    """Measure free HBM by materializing 1 GiB buffers until failure."""
    f = jax.jit(lambda k: jax.random.normal(k, (512, 1024, 1024), jnp.bfloat16))
    g = jax.jit(lambda x: jnp.sum(x[:1, :1, :8].astype(jnp.float32)))
    bufs = []
    try:
        for i in range(max_try):
            bufs.append(f(jax.random.key(1000 + i)))
            float(g(bufs[-1]))
    except Exception:
        pass
    n = len(bufs)
    del bufs
    gc.collect()
    log(f"free[{tag}]: ~{n} GiB materializable")
    return n


def main():
    import dataclasses

    from streamchat_tpu.config import BertConfig, DecoderConfig, ViTConfig
    from streamchat_tpu.models import decoder as dec_mod
    from streamchat_tpu.models import projector, vit
    from streamchat_tpu.models.embedder import TextEmbedder
    from streamchat_tpu.models.generate import generate
    from streamchat_tpu.models.generate_paged import generate_paged
    from streamchat_tpu.ops.quant import quantize_decoder_params

    key = jax.random.key(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    dec_cfg = DecoderConfig.qwen2_7b()
    log("init + quantize 7B ...")
    dec_params = dec_mod.init(k1, dec_cfg, jnp.bfloat16)
    jax.block_until_ready(dec_params["embed"])
    dec_params = quantize_decoder_params(dec_params, destructive=True,
                                         quantize_embed=True)
    jax.block_until_ready(dec_params["layers"][0]["attn"]["q"]["w_i8"])
    gc.collect()
    free_gib("after int8 7B")

    vit_cfg = ViTConfig()
    vit_params = vit.init(k2, vit_cfg, jnp.bfloat16)
    proj_params = projector.init(k3, vit_cfg.hidden_size,
                                 dec_cfg.hidden_size, jnp.bfloat16)
    colbert = TextEmbedder.init_random(k4, BertConfig(), dtype=jnp.bfloat16)
    minilm = TextEmbedder.init_random(
        k5, dataclasses.replace(BertConfig(), hidden_size=384,
                                intermediate_size=1536, num_layers=6,
                                num_heads=12, pooling="mean"),
        dtype=jnp.bfloat16,
    )
    if os.environ.get("REPRO_INGEST", "1") == "1":
        # Mirror the e2e's ingest phase: real frames -> preprocess -> fused
        # ViT encode in 128-batches -> chunk/cluster/short-memory, leaving
        # the same residents (and the same allocator churn) behind.
        import numpy as np

        from streamchat_tpu.config import MemoryConfig
        from streamchat_tpu.pipeline.memory_update import (
            build_short_memory, chunk_and_cluster,
        )
        from streamchat_tpu.pipeline.preprocess import preprocess_frames

        log("ingest: 240 frames through preprocess + fused ViT ...")
        mem_cfg = MemoryConfig(chunk_size=40, num_clusters=5, interval=10,
                               short_window=20, remember_window=5, tau=5.0)
        feats = []
        for i in range(2):
            frames = np.random.randint(
                0, 255, (128 if i == 0 else 112, 336, 336, 3), np.uint8
            )
            if frames.shape[0] < 128:
                frames = np.concatenate(
                    [frames, np.zeros((128 - frames.shape[0],) + frames.shape[1:],
                                      np.uint8)], 0)
            pixels = preprocess_frames(jnp.asarray(frames), 336)
            f = vit.encode(vit_params, pixels, vit_cfg)
            f = projector.apply(proj_params, f)
            feats.append(f[:128 if i == 0 else 112])
        features = jnp.concatenate(feats, axis=0)
        del feats
        jax.block_until_ready(features)
        short = build_short_memory(features, mem_cfg, jax.random.key(3))
        raw_chunks, node_feats = chunk_and_cluster(
            features, mem_cfg, jax.random.key(4), True
        )
        del features
        gc.collect()
        chunks = raw_chunks  # keep alive like the caption loop's worst case
        log(f"ingest done: {len(raw_chunks)} chunks resident")
        free_gib("after ingest")
    else:
        # Park the stage-1 residents: raw chunks (~0.95 GB) + short memory.
        chunks = jax.device_put(jnp.zeros((240, 576, dec_cfg.hidden_size),
                                          jnp.bfloat16))
        jax.block_until_ready(chunks)
    free_gib("before captions")
    log("static set resident; trying caption-shaped generates ...")

    s = 23168  # 40*576 visual + prompt, padded to 128
    embeds = (jax.random.normal(jax.random.key(9), (1, s, dec_cfg.hidden_size))
              * 0.02).astype(jnp.bfloat16)
    length = jnp.array([s - 60], jnp.int32)

    def attempt(name, fn):
        t0 = time.time()
        try:
            toks, count = fn()
            n = int(count[0])
            log(f"OK   {name}: {time.time()-t0:.1f}s (count={n})")
            return True
        except Exception as e:  # noqa: BLE001
            log(f"FAIL {name}: {type(e).__name__} after {time.time()-t0:.1f}s")
            return False

    kw = dict(max_new_tokens=128, temperature=0.1)
    variants = [
        ("paged_int8kv", lambda: generate_paged(
            dec_params, dec_cfg, embeds, length, jax.random.key(1),
            kv_int8=True, **kw)),
        ("paged_bf16kv", lambda: generate_paged(
            dec_params, dec_cfg, embeds, length, jax.random.key(1), **kw)),
        ("contiguous", lambda: generate(
            dec_params, dec_cfg, embeds, length, jax.random.key(1), **kw)),
    ]
    results = {}
    for name, fn in variants:
        gc.collect()
        results[name] = attempt(name, fn)
    print(results)


if __name__ == "__main__":
    main()
