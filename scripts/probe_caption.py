"""Caption-latency attribution probe at 7B geometry (one v5e chip).

The e2e driver measures ~8.6 s per caption (chunk_size=20: ~11.6k-token
prefill + 128 decoded tokens) — far above the naive roofline (~2 s prefill
+ ~1.3 s decode). This probe splits the caption cost into:

  prefill      generate_paged(max_new=1) on the caption shape
  decode       full(max_new=128) - prefill
  batch-3      the batched-captioning variant (per-caption amortization)

Run:  python scripts/probe_caption.py [--seq 11648] [--batch 3]
Prints one JSON line per measurement.
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


def timed(fn, *a, **kw):
    t0 = time.time()
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    return time.time() - t0, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=11648,
                   help="caption prompt length (chunk 20 ~= 11648; 40 ~= 23168)")
    p.add_argument("--batch", type=int, default=3)
    p.add_argument("--max_new", type=int, default=128)
    p.add_argument("--kv_int8", action="store_true",
                   help="int8 KV pages (default bf16 — the chunk-20 e2e path)")
    p.add_argument("--trace", action="store_true",
                   help="profile ONE warm prefill and print the per-op "
                        "device-time table (where the 23k-token prefill's "
                        "~31%% MXU-roofline gap actually goes)")
    p.add_argument("--skip_batch_and_decode", action="store_true",
                   help="prefill-only run (fast A/B of prefill changes)")
    p.add_argument("--spec", type=int, default=0,
                   help="speculative draft tokens for the decode phase "
                        "(greedy; models/spec_decode — measures the verify "
                        "step's pool-einsum cost at THIS context length)")
    args = p.parse_args()
    if args.skip_batch_and_decode:
        args.batch = 1

    assert jax.default_backend() == "tpu", "requires the real chip"
    from streamchat_tpu.config import DecoderConfig
    from streamchat_tpu.models import decoder as dec_mod
    from streamchat_tpu.models.generate_paged import generate_paged
    from streamchat_tpu.ops.quant import quantize_decoder_params

    cfg = DecoderConfig.qwen2_7b()
    t0 = time.time()
    params = dec_mod.init(jax.random.key(0), cfg, jnp.bfloat16)
    jax.block_until_ready(params["embed"])
    params = quantize_decoder_params(params, destructive=True,
                                     quantize_embed=True)
    jax.block_until_ready(params["layers"][0]["attn"]["q"]["w_i8"])
    print(json.dumps({"phase": "init+quant", "s": round(time.time() - t0, 1)}),
          flush=True)

    d = cfg.hidden_size
    s = args.seq

    def run(b, max_new, tag, repeats=2):
        embeds = (jax.random.normal(jax.random.key(1), (b, s, d), jnp.bfloat16)
                  * 0.02)
        lengths = jnp.full((b,), s, jnp.int32)
        spec_kw = (
            {"spec_tokens": args.spec} if args.spec and max_new > 1 else {}
        )
        times = []
        for i in range(repeats + 1):   # first call compiles
            t, _ = timed(
                generate_paged, params, cfg, embeds, lengths,
                jax.random.key(2 + i), max_new_tokens=max_new,
                page_size=128, kv_int8=args.kv_int8, temperature=0.0,
                **spec_kw,
            )
            times.append(t)
        warm = times[1:]
        print(json.dumps({
            "phase": tag, "b": b, "seq": s, "max_new": max_new,
            "compile+first_s": round(times[0], 2),
            "warm_s": [round(t, 2) for t in warm],
            "warm_mean_s": round(sum(warm) / len(warm), 2),
        }), flush=True)
        return sum(warm) / len(warm)

    t_prefill = run(1, 1, "prefill(+1tok)")
    if args.trace:
        from streamchat_tpu.utils.traceparse import device_op_table

        trace_dir = "/tmp/caption_prefill_trace"
        embeds = (jax.random.normal(jax.random.key(1), (1, s, d), jnp.bfloat16)
                  * 0.02)
        lengths = jnp.ones((1,), jnp.int32) * s
        jax.profiler.start_trace(trace_dir)
        timed(generate_paged, params, cfg, embeds, lengths, jax.random.key(9),
              max_new_tokens=1, page_size=128, kv_int8=args.kv_int8,
              temperature=0.0)
        jax.profiler.stop_trace()
        for row in device_op_table(trace_dir, top=20):
            print(json.dumps(row), flush=True)
    if args.skip_batch_and_decode:
        return 0
    t_full = run(1, args.max_new, "full")
    print(json.dumps({
        "phase": "decode_attrib",
        "decode_s": round(t_full - t_prefill, 2),
        "per_tok_ms": round((t_full - t_prefill) / (args.max_new - 1) * 1e3, 2),
    }), flush=True)
    if args.batch > 1:
        t_b = run(args.batch, args.max_new, f"batch{args.batch}")
        print(json.dumps({
            "phase": "batch_amortization",
            "per_caption_s": round(t_b / args.batch, 2),
            "sequential_s": round(t_full, 2),
            "speedup": round(t_full * args.batch / t_b, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
