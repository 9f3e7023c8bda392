"""Bisect probe for the answer-p50 bench path (VERDICT r3 next #3).

Measures the bench's exact answer round (4k-token spliced prefill + 256-token
paged decode, int8 weights, b=1) and additionally a max_new=1 round so the
regression can be attributed to prefill vs decode:

    decode ms/tok ~= (t_256 - t_1) / 255

Run on the real chip with an otherwise-idle host (relay dispatch shares the
single core):  python scripts/probe_p50.py [--layers 28] [--rounds 3]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import dataclasses
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=28)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--ctx", type=int, default=4096)
    p.add_argument("--skip_one", action="store_true",
                   help="skip the max_new=1 attribution round")
    p.add_argument("--pool_block", type=int, default=None,
                   help="force pages per sequential-pool grid step (A/B the "
                        "8/16/32 DMA-tail vs grid-overhead trade at this ctx)")
    p.add_argument("--table_kernel", action="store_true",
                   help="force the page-table-indexed decode kernel (A/B the "
                        "kernel CHOICE vs the sequential-pool kernel)")
    p.add_argument("--int4", action="store_true",
                   help="group-128 int4 weights instead of int8 (the fused "
                        "Pallas matvec decode path)")
    args = p.parse_args()

    if args.pool_block is not None or args.table_kernel:
        from streamchat_tpu.ops import paged_attention as pa

        if args.pool_block is not None:
            pa.SEQ_POOL_BLOCK_OVERRIDE = args.pool_block
        if args.table_kernel:
            pa.SEQ_KERNEL_OVERRIDE = False

    from streamchat_tpu.config import DecoderConfig
    from streamchat_tpu.models import decoder
    from streamchat_tpu.models.generate_paged import generate_paged
    from streamchat_tpu.ops.paged_attention import seq_pool_block
    from streamchat_tpu.ops.quant import quantize_decoder_params

    cfg = dataclasses.replace(DecoderConfig.qwen2_7b(), num_layers=args.layers)
    params = decoder.init(jax.random.key(0), cfg, jnp.bfloat16)
    params = quantize_decoder_params(params, destructive=True,
                                     bits=4 if args.int4 else 8)
    gc.collect()
    embeds = (jax.random.normal(jax.random.key(1), (1, args.ctx, cfg.hidden_size))
              * 0.02).astype(jnp.bfloat16)
    seq_len = jnp.array([args.ctx - 7], jnp.int32)

    def run(max_new, tag):
        def one(key):
            toks, count = generate_paged(
                params, cfg, embeds, seq_len, key,
                max_new_tokens=max_new, temperature=0.2, eos_ids=(-1,),
            )
            return float(count[0])

        one(jax.random.key(2))
        times = []
        for i in range(args.rounds):
            t0 = time.perf_counter()
            one(jax.random.key(3 + i))
            times.append(time.perf_counter() - t0)
        print(json.dumps({
            "tag": tag, "ctx": args.ctx, "max_new": max_new,
            # effective pages/grid-step at this probe's pool size (page 128)
            "seq_pool_block": (None if args.table_kernel else
                               seq_pool_block(-(-(args.ctx + max_new) // 128))),
            "p50_s": round(median(times), 4),
            "rounds_s": [round(t, 4) for t in times],
        }), flush=True)
        return median(times)

    t256 = run(256, "prefill+decode256")
    if not args.skip_one:
        t1 = run(1, "prefill+decode1")
        print(json.dumps({
            "tag": "attribution",
            "decode_ms_per_tok": round((t256 - t1) / 255 * 1000, 3),
            "prefill_plus_overhead_s": round(t1, 4),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
