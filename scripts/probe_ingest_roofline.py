"""Per-op device-time attribution of the ingest hot path (VERDICT r3 #8).

The round-1 roofline said only quantized activations or better hardware
move ingest past the fused path's 347 f/s; the arithmetic says otherwise —
at 2.88 ms/frame the residual stream's HBM traffic is only ~0.24 ms, so
int8 activations cannot reach 400 f/s and the remaining ~0.9 ms/frame must
be VPU work (LN/softmax/gelu), sub-peak MXU shapes (dh=64 attention dots),
or pipeline bubbles. This probe replaces that arithmetic with a measured
per-op table: trace ONE warm ingest batch, tabulate device-lane ops, and
print where the non-MXU time actually goes.

Run on the real chip:  python scripts/probe_ingest_roofline.py
Prints the measured f/s, total device-busy vs wall, and the top ops.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--trace_dir", default="/tmp/ingest_trace")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    from streamchat_tpu.config import DecoderConfig, ViTConfig
    from streamchat_tpu.models import projector, vit
    from streamchat_tpu.ops.dedup import frame_descriptors, select_changed_frames
    from streamchat_tpu.utils.traceparse import (
        device_op_table,
        device_seconds_by_phase,
    )

    vit_cfg = ViTConfig()
    dec_hidden = DecoderConfig.qwen2_7b().hidden_size
    k1, k2 = jax.random.split(jax.random.key(0))
    vit_p = vit.init(k1, vit_cfg, jnp.bfloat16)
    proj_p = projector.init(k2, vit_cfg.hidden_size, dec_hidden, jnp.bfloat16)
    vit_p = vit.fold_params(vit_p, vit_cfg)   # production fused-path fold

    @jax.jit
    def ingest(vit_p, proj_p, pixels):
        feats = vit.encode(vit_p, pixels, vit_cfg)
        proj = projector.apply(proj_p, feats)
        keep = select_changed_frames(frame_descriptors(feats), threshold=0.18)
        # MXU-matvec checksum, mirroring bench.py (the f32 convert+reduce
        # form cost a measured 9.8 ms of VPU time at 54 GB/s)
        ones = jnp.ones((proj.shape[-1], 1), proj.dtype)
        checksum = jnp.sum(
            jnp.dot(proj.reshape(-1, proj.shape[-1]), ones,
                    preferred_element_type=jnp.float32))
        return checksum, jnp.sum(keep)

    pixels = jax.random.normal(
        jax.random.key(1), (args.batch, 3, vit_cfg.image_size,
                            vit_cfg.image_size), jnp.bfloat16)

    for _ in range(4):                                   # compile + warm
        float(ingest(vit_p, proj_p, pixels)[0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(ingest(vit_p, proj_p, pixels)[0])
    dt = time.perf_counter() - t0
    fps = args.batch * args.iters / dt

    jax.profiler.start_trace(args.trace_dir)
    with jax.profiler.TraceAnnotation("phase=ingest"):
        float(ingest(vit_p, proj_p, pixels)[0])
    jax.profiler.stop_trace()

    phases = device_seconds_by_phase(args.trace_dir)
    table = device_op_table(args.trace_dir, top=args.top)
    dev = phases.get("ingest", {})
    print(json.dumps({
        "frames_per_s": round(fps, 1),
        "ms_per_frame": round(1000 * dt / (args.batch * args.iters), 3),
        "traced_wall_s": dev.get("wall_s"),
        "traced_device_s": dev.get("device_s"),
        "traced_host_gap_s": dev.get("host_gap_s"),
    }))
    for row in table:
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
