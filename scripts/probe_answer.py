"""Answer-latency attribution probe at 7B geometry (one v5e chip).

The e2e driver measures ~13.4 s per warm answer.generate (short memory
20x576 + finest tree level spliced at `<image>`, ~14.5k-token prefill +
256 decoded tokens at temperature 0.2) — well above the expected
~1.6 s prefill + ~3 s decode. This probe splits the answer cost into:

  splice       splice_prompt alone (tokenize + text-embed + concat + pad)
  prefill      generate_paged(max_new=1) at the spliced shape
  decode       full(max_new=256) - prefill
  facade       LongVA.generate_with_image_embedding wall (includes splice,
               detokenize and per-call dispatch)

Mirrors the answer path of pipeline/answer.py:77-83 against the decoder
floor the same way scripts/probe_caption.py does for captions.

Run:  python scripts/probe_answer.py [--visual 14400] [--max_new 256]
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
    p.add_argument("--visual", type=int, default=14400,
                   help="spliced visual tokens (short 20x576 + finest "
                        "level 5x576 at v0.3 chunk-20 settings)")
    p.add_argument("--max_new", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--kv_int8", action="store_true")
    args = p.parse_args()

    assert jax.default_backend() == "tpu", "requires the real chip"
    from streamchat_tpu.config import DecoderConfig, ViTConfig
    from streamchat_tpu.models.longva import LongVA
    from streamchat_tpu.models.generate_paged import generate_paged
    from streamchat_tpu.ops.quant import quantize_decoder_params

    # Tiny ViT: the probe never encodes pixels; only the decoder matters.
    vit_cfg = ViTConfig(num_layers=1, hidden_size=64, num_heads=2,
                        intermediate_size=128)
    t0 = time.time()
    model = LongVA.init_random(jax.random.key(0), vit_cfg=vit_cfg,
                               dec_cfg=DecoderConfig.qwen2_7b())
    jax.block_until_ready(model.dec_params["embed"])
    model.dec_params = quantize_decoder_params(model.dec_params,
                                               destructive=True,
                                               quantize_embed=True)
    model.kv_int8 = args.kv_int8
    jax.block_until_ready(model.dec_params["layers"][0]["attn"]["q"]["w_i8"])
    print(json.dumps({"phase": "init+quant", "s": round(time.time() - t0, 1)}),
          flush=True)

    d = model.dec_cfg.hidden_size
    visual = (jax.random.normal(jax.random.key(1), (args.visual, d),
                                jnp.bfloat16) * 0.02)
    # ~the answer prompt's text size (question + caption text + template).
    prompt = ("<|im_start|>user\n<image>\n" + "What changed in the video "
              "since the beginning of the recording session? " * 4 +
              "<|im_end|>\n<|im_start|>assistant\n")

    def run(tag, fn, repeats=2):
        times = []
        for _ in range(repeats + 1):   # first call may compile
            t, out = timed(fn)
            times.append(t)
        warm = times[1:]
        print(json.dumps({
            "phase": tag,
            "compile+first_s": round(times[0], 2),
            "warm_s": [round(t, 2) for t in warm],
            "warm_mean_s": round(sum(warm) / len(warm), 2),
        }), flush=True)
        return sum(warm) / len(warm), out

    t_splice, (embeds, length) = run(
        "splice", lambda: model.splice_prompt(prompt, [visual]))
    print(json.dumps({"spliced_len": int(length),
                      "padded_len": int(embeds.shape[1])}), flush=True)

    lengths = jnp.array([length], jnp.int32)

    def dec(max_new):
        return generate_paged(
            model.dec_params, model.dec_cfg, embeds, lengths,
            jax.random.key(2), max_new_tokens=max_new, page_size=128,
            kv_int8=args.kv_int8, temperature=args.temperature,
            eos_ids=tuple(model.tokenizer.eos_ids),
        )

    t_prefill, _ = run("prefill(+1tok)", lambda: dec(1))
    t_full, _ = run("full_decode", lambda: dec(args.max_new))
    print(json.dumps({
        "phase": "decode_attrib",
        "decode_s": round(t_full - t_prefill, 2),
        "per_tok_ms": round((t_full - t_prefill) / (args.max_new - 1) * 1e3, 2),
    }), flush=True)

    t_facade, _ = run(
        "facade", lambda: model.generate_with_image_embedding(
            prompt, [visual], max_new_tokens=args.max_new,
            temperature=args.temperature))
    print(json.dumps({
        "phase": "facade_overhead",
        "facade_s": round(t_facade, 2),
        "decoder_floor_s": round(t_splice + t_full, 2),
        "overhead_s": round(t_facade - t_splice - t_full, 2),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
