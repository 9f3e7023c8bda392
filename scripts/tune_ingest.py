"""Sweep fused-ViT kernel configurations on the real chip.

Times the full ingest program (encode + project + dedup descriptors) at the
production batch with different `frame_tile` values and reports frames/s,
plus a straight fused_vit_layer microbench. Run when the chip is idle:

    python scripts/tune_ingest.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_call(fn, *args, iters=8, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            # scalar fetch forces completion through the async relay
            float(jnp.sum(out[0] if isinstance(out, tuple) else out[:1, :1, :1].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    if jax.default_backend() != "tpu":
        print("requires the TPU chip")
        return
    from streamchat_tpu.config import ViTConfig
    from streamchat_tpu.models import vit
    from streamchat_tpu.ops.fused_vit import fused_vit_layer

    cfg = ViTConfig()
    n, s, d = 128, 577, cfg.hidden_size
    key = jax.random.key(0)
    params = vit.init(key, cfg, jnp.bfloat16)
    p0 = params["layers"][0]
    x = jax.random.normal(jax.random.key(1), (n, s, d), jnp.bfloat16)

    wqkv = jnp.concatenate(
        [p0["attn"][k]["w"] for k in ("q", "k", "v")], axis=1
    )
    bqkv = jnp.concatenate(
        [p0["attn"][k]["b"] for k in ("q", "k", "v")], axis=0
    )

    print("== fused_vit_layer microbench (one layer, batch 128) ==")
    for ft in (1, 2, 4, 8):
        try:
            fn = jax.jit(lambda x, ft=ft: fused_vit_layer(
                x, p0["ln1"]["scale"], p0["ln1"]["bias"],
                wqkv, bqkv, p0["attn"]["o"]["w"], p0["attn"]["o"]["b"],
                p0["ln2"]["scale"], p0["ln2"]["bias"],
                p0["mlp"]["fc1"]["w"], p0["mlp"]["fc1"]["b"],
                p0["mlp"]["fc2"]["w"], p0["mlp"]["fc2"]["b"],
                num_heads=cfg.num_heads, frame_tile=ft,
            ))
            dt = time_call(fn, x)
            # 24 layers -> projected encoder ms/frame and f/s
            per_frame_ms = dt / n * 1000 * cfg.num_layers
            print(f"frame_tile={ft}: {dt*1000:.2f} ms/layer-call "
                  f"-> ~{per_frame_ms:.2f} ms/frame encoder "
                  f"(~{1000/per_frame_ms:.0f} f/s encoder-only)")
        except Exception as e:  # noqa: BLE001
            print(f"frame_tile={ft}: FAILED {type(e).__name__}: {str(e)[:120]}")

    print("== full ingest (encode+project fused auto) ==")
    t0 = time.time()
    feats = vit.encode(params, jax.random.normal(
        jax.random.key(2), (n, 3, cfg.image_size, cfg.image_size), jnp.bfloat16
    ), cfg)
    jax.block_until_ready(feats)
    print(f"first call (compile): {time.time()-t0:.1f}s; feats {feats.shape}")


if __name__ == "__main__":
    main()
