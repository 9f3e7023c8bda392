"""Validate the int4 weight-only decode path at 7B geometry (one v5e chip).

Two questions only the hardware can answer:
  1. Does XLA actually stream s4 PACKED from HBM (matmul time ~halves vs
     int8), or does it materialize an unpacked copy (time matches/exceeds
     int8)?  -> microbench: grouped int4 vs int8 matmul over the 7B MLP
     shapes, scan-amortized (per-call timing is relay-dispatch noise).
  2. What is the end-to-end decode ms/tok with a bits=4 tree vs int8?
     Expected from the roofline: ~9.7 ms/tok (int8 weights) -> ~5.5 ms/tok
     (int4 layers + int8 lm_head) at ctx 4096.

Run:  python scripts/probe_int4.py          (needs the chip to itself)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def micro(reps: int = 50):
    """Scan-amortized grouped-int4 vs int8 matvec over the 7B MLP shape."""
    from streamchat_tpu.ops.quant import (
        qmatmul, qmatmul_int4, quantize_weight, quantize_weight_int4,
    )

    din, dout = 3584, 18944
    w = jax.random.normal(jax.random.key(0), (din, dout), jnp.float32) * 0.02
    q8 = quantize_weight(w)
    q4 = quantize_weight_int4(w)
    del w
    x = jax.random.normal(jax.random.key(1), (1, din), jnp.bfloat16)

    def bench(fn, q):
        # q rides as an ARGUMENT: closure-captured weights constant-fold
        # into the program (CLAUDE.md), and an s4 closure constant crashes
        # device_put with a jit recursion on this backend.
        @jax.jit
        def loop(x, q):
            def body(c, _):
                y = fn(c, q)
                # fold back to input width so the scan carries a fixed shape
                c = (y[:, :din] * 1e-3 + c).astype(c.dtype)
                return c, ()
            c, _ = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(c.astype(jnp.float32))

        float(loop(x, q))                    # compile
        t0 = time.time()
        float(loop(x, q))
        return (time.time() - t0) / reps * 1e3

    ms8 = bench(qmatmul, q8)
    ms4 = bench(qmatmul_int4, q4)
    gb8 = din * dout / 1e9
    gb4 = din * dout / 2 / 1e9
    print(json.dumps({
        "micro": "mlp up 3584x18944 matvec",
        "int8_ms": round(ms8, 3), "int4_ms": round(ms4, 3),
        "int8_gbps": round(gb8 / ms8 * 1e3, 1),
        "int4_gbps_effective": round(gb4 / ms4 * 1e3, 1),
        "speedup": round(ms8 / ms4, 2),
    }), flush=True)
    return ms8 / ms4


def full_decode():
    from streamchat_tpu.config import DecoderConfig
    from streamchat_tpu.models import decoder as dec_mod
    from streamchat_tpu.models.generate_paged import generate_paged
    from streamchat_tpu.ops.quant import quantize_decoder_params

    cfg = DecoderConfig.qwen2_7b()
    d = cfg.hidden_size

    def run(params, s, max_new):
        embeds = (jax.random.normal(jax.random.key(1), (1, s, d), jnp.bfloat16)
                  * 0.02)
        lengths = jnp.full((1,), s, jnp.int32)
        times = []
        for i in range(3):
            t0 = time.time()
            toks, _ = generate_paged(
                params, cfg, embeds, lengths, jax.random.key(2 + i),
                max_new_tokens=max_new, page_size=128, temperature=0.0,
            )
            jax.block_until_ready(toks)
            times.append(time.time() - t0)
        return times

    for bits in (8, 4):
        t0 = time.time()
        params = dec_mod.init(jax.random.key(0), cfg, jnp.bfloat16)
        jax.block_until_ready(params["embed"])
        params = quantize_decoder_params(params, destructive=True,
                                         quantize_embed=True, bits=bits)
        jax.block_until_ready(params["layers"][0]["attn"]["q"])
        print(json.dumps({"phase": f"init int{bits}",
                          "s": round(time.time() - t0, 1)}), flush=True)
        s = 4096
        t1 = run(params, s, 1)
        tf = run(params, s, 128)
        per_tok = (min(tf[1:]) - min(t1[1:])) / 127 * 1e3
        print(json.dumps({
            "bits": bits, "ctx": s,
            "prefill_s": round(min(t1[1:]), 2),
            "full_s": round(min(tf[1:]), 2),
            "decode_per_tok_ms": round(per_tok, 2),
        }), flush=True)
        del params


def main():
    assert jax.default_backend() == "tpu"
    speedup = micro()
    if speedup < 1.2:
        print(json.dumps({
            "verdict": "int4 NOT streaming packed — grouped dot gains "
                       "nothing; skip full decode probe"
        }), flush=True)
        return 1
    full_decode()
    return 0


if __name__ == "__main__":
    sys.exit(main())
