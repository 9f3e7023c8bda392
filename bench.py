"""Headline benchmark: ViT frame-ingest throughput (frames/sec/chip).

This is the BASELINE.json primary metric — the rate at which the pipeline
turns decoded frames into LM-ready visual features (CLIP ViT-L/14-336 encode
+ mm-projection + selective-stacking descriptor pass). The reference repo
publishes no throughput tables (BASELINE.md), so `vs_baseline` is computed
against an analytic estimate of the reference's encoder stage on its own
hardware: ViT-L/14-336 is ~0.42 TFLOPs/frame (24 layers, 577 tokens, d=1024,
plus the mm MLP); an A100 at 312 TFLOPs fp16 and a generous 45% MFU gives
~330 frames/sec/GPU. The reference's *achieved* ingest is far lower (serial
cv2 frame seeks + per-frame preprocessing on host), so this baseline is the
hard version to beat.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from streamchat_tpu.config import DecoderConfig, ViTConfig
from streamchat_tpu.models import projector, vit
from streamchat_tpu.ops.dedup import frame_descriptors, select_changed_frames

BASELINE_FPS = 330.0  # analytic A100 estimate, see module docstring


def main() -> None:
    small = os.environ.get("SC_BENCH_SMALL", "") == "1" or jax.default_backend() == "cpu"
    vit_cfg = ViTConfig.tiny() if small else ViTConfig()
    dec_hidden = 128 if small else DecoderConfig.qwen2_7b().hidden_size
    batch = 8 if small else 128
    iters = 3 if small else 10
    dtype = jnp.float32 if small else jnp.bfloat16

    k1, k2 = jax.random.split(jax.random.key(0))
    vit_p = vit.init(k1, vit_cfg, dtype)
    proj_p = projector.init(k2, vit_cfg.hidden_size, dec_hidden, dtype)

    # Params are explicit args: closure-captured arrays become compile-time
    # constants, and constant-folding a 0.6 GB ViT through the compiler stalls
    # compilation (observed >9 min over the remote-TPU tunnel vs ~15 s here).
    # The jit returns scalars only — fetching them to host each iteration
    # forces real completion (block_until_ready alone has produced bogus
    # sub-millisecond timings through the async remote-TPU relay).
    @jax.jit
    def ingest(vit_p, proj_p, pixels):
        feats = vit.encode(vit_p, pixels, vit_cfg)        # [N, P, Dv]
        proj = projector.apply(proj_p, feats)             # [N, P, D]
        keep = select_changed_frames(frame_descriptors(feats), threshold=0.18)
        return jnp.sum(proj.astype(jnp.float32)), jnp.sum(keep)

    pixels = jax.random.normal(
        jax.random.key(1), (batch, 3, vit_cfg.image_size, vit_cfg.image_size), dtype
    )

    float(ingest(vit_p, proj_p, pixels)[0])               # compile + warmup
    float(ingest(vit_p, proj_p, pixels)[0])

    # Two timing passes, best wins: the remote-TPU relay adds occasional
    # multi-hundred-ms stalls that would misreport steady-state throughput.
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            checksum, _ = ingest(vit_p, proj_p, pixels)
            float(checksum)
        best_dt = min(best_dt, time.perf_counter() - t0)

    fps = batch * iters / best_dt
    print(json.dumps({
        "metric": "vit_ingest_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
