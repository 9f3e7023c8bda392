"""Isolate the int8-KV decode cost at 7B geometry (one v5e chip).

bench.py measures 10.5 ms/tok with int8 weights + bf16 KV pages (ctx 4096);
the caption probe measured 19.1 ms/tok with int8 weights + int8 KV pages
(ctx 11648). This probe grids {kv_int8} x {ctx} to attribute the 2x gap.

Run:  python scripts/probe_kvint8.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    assert jax.default_backend() == "tpu"
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

    def run(s, kv_int8, max_new):
        embeds = (jax.random.normal(jax.random.key(1), (1, s, d), jnp.bfloat16)
                  * 0.02)
        lengths = jnp.full((1,), s, jnp.int32)
        times = []
        for i in range(3):
            t0 = time.time()
            toks, count = generate_paged(
                params, cfg, embeds, lengths, jax.random.key(2 + i),
                max_new_tokens=max_new, page_size=128, kv_int8=kv_int8,
                temperature=0.0,
            )
            jax.block_until_ready(toks)
            times.append(time.time() - t0)
        return times

    for s in (4096, 11648):
        base = {}
        for kv_int8 in (False, True):
            t1 = run(s, kv_int8, 1)
            tf = run(s, kv_int8, 128)
            per_tok = (min(tf[1:]) - min(t1[1:])) / 127 * 1e3
            base[kv_int8] = per_tok
            print(json.dumps({
                "ctx": s, "kv_int8": kv_int8,
                "prefill_s": round(min(t1[1:]), 2),
                "full_s": round(min(tf[1:]), 2),
                "decode_per_tok_ms": round(per_tok, 2),
            }), flush=True)
        print(json.dumps({
            "ctx": s,
            "kv_int8_slowdown": round(base[True] / base[False], 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
