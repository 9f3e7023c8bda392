"""Headline benchmarks: ViT frame-ingest throughput + p50 answer latency.

BASELINE.json names two primary metrics; both are emitted on ONE JSON line.

1. `vit_ingest_frames_per_sec_per_chip` — the rate at which the pipeline
   turns decoded frames into LM-ready visual features (CLIP ViT-L/14-336
   encode + mm-projection + selective-stacking descriptor pass). The
   reference publishes no throughput tables (BASELINE.md), so `vs_baseline`
   is an analytic estimate of the reference's encoder stage on its own
   hardware: ViT-L/14-336 is ~0.42 TFLOPs/frame; an A100 at 312 TFLOPs fp16
   and a generous 45% MFU gives ~330 frames/sec/GPU. The reference's
   *achieved* ingest is far lower (serial cv2 seeks + per-frame host
   preprocessing), so this baseline is the hard version to beat. The encode
   runs the fused Pallas transformer-layer kernels (ops/fused_vit) on TPU.

2. `answer_p50_s` — p50 per-round answer latency at Qwen2-7B geometry:
   spliced ~4k-token prefill + 256-token KV-cached decode through the
   PRODUCTION paged decode path (models/generate_paged), one fused XLA
   program per round. Reference instrumentation being rebuilt:
   inference_streaming_longva_v2.py:160,657 (its decode runs
   use_cache=False — every token re-prefills the full context, putting its
   true per-answer latency at minutes scale on A100). `answer_vs_baseline`
   is computed against a CHARITABLE baseline instead: a hypothetical
   KV-cached HF decode on one A100 (prefill 2*7e9*4096 FLOPs at 45% MFU
   ~0.41 s + 256 tokens * 14 GB / 1.55 TB/s HBM + ~5 ms/step framework
   overhead ~ 4.0 s total), i.e. we compare against a reference that had
   fixed its own worst bug. Ratio > 1 means we beat that.

   The full 28-layer 7B in bf16 (~15.2 GB + KV) may not fit the 16 GB v5e
   chip; on allocation failure the bench re-measures at 14 layers and
   doubles prefill/decode time (linear in layers; `answer_extrapolated`
   marks this — same method as README's round-1 numbers).

Timing discipline (CLAUDE.md): scalars are float()-fetched per iteration
(block_until_ready alone returns bogus timings through the async relay),
params are passed as arguments (closure capture constant-folds 15 GB into
the program), and two passes are taken with best-wins (the relay adds
occasional multi-hundred-ms stalls).
"""

from __future__ import annotations

import gc
import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 330.0        # analytic A100 estimate, see module docstring
BASELINE_ANSWER_P50 = 4.0   # charitable KV-cached A100 reference, see above


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def bench_ingest(small: bool) -> float:
    from streamchat_tpu.config import DecoderConfig, ViTConfig
    from streamchat_tpu.models import projector, vit
    from streamchat_tpu.ops.dedup import frame_descriptors, select_changed_frames

    vit_cfg = ViTConfig.tiny() if small else ViTConfig()
    dec_hidden = 128 if small else DecoderConfig.qwen2_7b().hidden_size
    batch = 8 if small else 128
    iters = 3 if small else 10
    dtype = jnp.float32 if small else jnp.bfloat16

    k1, k2 = jax.random.split(jax.random.key(0))
    vit_p = vit.init(k1, vit_cfg, dtype)
    proj_p = projector.init(k2, vit_cfg.hidden_size, dec_hidden, dtype)
    if not small:
        vit_p = vit.fold_params(vit_p, vit_cfg)  # fused-path pre-fold

    @jax.jit
    def ingest(vit_p, proj_p, pixels):
        feats = vit.encode(vit_p, pixels, vit_cfg)        # [N, P, Dv]
        proj = projector.apply(proj_p, feats)             # [N, P, D]
        keep = select_changed_frames(frame_descriptors(feats), threshold=0.18)
        # Checksum consumes EVERY proj element (no XLA dead-code elimination
        # of the projector) via an MXU matvec: the former
        # sum(proj.astype(f32)) lowered to a convert+reduce VPU fusion that
        # cost a measured 9.8 ms/call at 54 GB/s (round-5 ingest trace) —
        # pure harness tax, not pipeline work.
        ones = jnp.ones((proj.shape[-1], 1), proj.dtype)
        checksum = jnp.sum(
            jnp.dot(proj.reshape(-1, proj.shape[-1]), ones,
                    preferred_element_type=jnp.float32))
        return checksum, jnp.sum(keep)

    pixels = jax.random.normal(
        jax.random.key(1), (batch, 3, vit_cfg.image_size, vit_cfg.image_size), dtype
    )

    # Compile + reach steady state: the first couple of post-compile calls
    # through the remote relay run ~7% slow (page-faults + relay warmup);
    # measured steady state is ~370 f/s vs ~347 on pass one.
    for _ in range(4):
        float(ingest(vit_p, proj_p, pixels)[0])

    # Lag-1 pipelined readback: every checksum is still float()ed (CLAUDE.md
    # timing discipline — the async relay lies under block_until_ready), but
    # one batch behind, so the device never idles through the ~40 ms host
    # round trip (round-5 trace: 41 ms host gap per 339 ms call, 12% of
    # wall). The final float() fences the round, so the wall still bounds
    # ALL dispatched work. This matches the production ingest loop
    # (pipeline/ingest.encode_segment dispatches batch slices back-to-back
    # with no readbacks between them).
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        pending = None
        for _ in range(iters):
            checksum, _ = ingest(vit_p, proj_p, pixels)
            if pending is not None:
                float(pending)
            pending = checksum
        float(pending)
        rates.append(batch * iters / (time.perf_counter() - t0))
    # best-of-N with the spread recorded (VERDICT r4 weak #6: the driver's
    # run moved +2.8% vs the builder's with no variance bar anywhere)
    return max(rates), rates


def bench_answer_latency(
    small: bool, num_layers: int, int8: bool = False, spec: bool = False,
    int4: bool = False,
):
    """One round = fused (4k-prefill + 256-token paged decode) program.

    Returns (p50 seconds, rounds list). Raises on allocation failure so the
    caller can retry at fewer layers. int8=True serves the weight-only
    quantized decoder (ops/quant.py) — decode is weight-bandwidth bound, so
    this is the production serving mode's number. int4=True serves the
    group-128 int4 latency-floor mode instead.
    """
    import dataclasses

    from streamchat_tpu.config import DecoderConfig
    from streamchat_tpu.models import decoder
    from streamchat_tpu.models.generate_paged import generate_paged

    if small:
        cfg = DecoderConfig.tiny()
        ctx, max_new, rounds = 64, 8, 2
    else:
        cfg = dataclasses.replace(DecoderConfig.qwen2_7b(), num_layers=num_layers)
        ctx, max_new, rounds = 4096, 256, 3

    params = decoder.init(jax.random.key(0), cfg, jnp.float32 if small else jnp.bfloat16)
    if int8 or int4:
        from streamchat_tpu.ops.quant import quantize_decoder_params

        params = quantize_decoder_params(
            params, destructive=True, bits=4 if int4 else 8)
        gc.collect()
    # A spliced multimodal prompt is embeddings, not token ids — synthesize
    # the post-splice [1, ctx, D] directly (visual memory + question layout).
    embeds = (jax.random.normal(jax.random.key(1), (1, ctx, cfg.hidden_size))
              * 0.02).astype(params["embed"].dtype)
    seq_len = jnp.array([ctx - 7], jnp.int32)   # ragged valid length

    spec_kw = (
        {"spec_tokens": 7, "temperature": 0.0} if spec else {"temperature": 0.2}
    )

    def one_round(key):
        toks, count = generate_paged(
            params, cfg, embeds, seq_len, key,
            max_new_tokens=max_new,
            eos_ids=(-1,),                       # never fires: full decode
            **spec_kw,
        )
        return float(count[0])

    one_round(jax.random.key(2))                 # compile + warmup
    times = []
    for i in range(rounds):
        t0 = time.perf_counter()
        one_round(jax.random.key(3 + i))
        times.append(time.perf_counter() - t0)
    del params, embeds
    gc.collect()
    return _median(times), times


def main() -> None:
    small = os.environ.get("SC_BENCH_SMALL", "") == "1" or jax.default_backend() == "cpu"

    fps, fps_rounds = bench_ingest(small)
    gc.collect()

    out = {
        "metric": "vit_ingest_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "ingest_rounds_fps": [round(r, 2) for r in fps_rounds],
    }

    if os.environ.get("SC_BENCH_SKIP_ANSWER", "") != "1":
        full_layers = 2 if small else 28
        # The answer metric is the PRODUCTION serving mode: int8 weight-only
        # decoder through the paged Pallas decode kernel. (bf16 measured
        # 5.50 s at the same shape — set SC_BENCH_BF16=1 to re-measure; it
        # and the int8 pass together exceed the 10-minute relay budget now
        # that the paged kernel's compile is in the program.)
        try:
            p50, times = bench_answer_latency(small, full_layers, int8=True)
            extrapolated = False
        except Exception:
            gc.collect()
            p50, times = bench_answer_latency(small, full_layers // 2, int8=True)
            p50, times = 2 * p50, [2 * t for t in times]
            extrapolated = True
        out.update({
            "answer_p50_s": round(p50, 3),
            "answer_vs_baseline": round(BASELINE_ANSWER_P50 / p50, 3),
            "answer_rounds_s": [round(t, 3) for t in times],
            "answer_dtype": "int8 weight-only (production serving mode)",
            "answer_extrapolated": extrapolated,
        })
        if os.environ.get("SC_BENCH_BF16", "") == "1":
            gc.collect()
            try:
                p50_f, _ = bench_answer_latency(small, full_layers)
                out["answer_p50_bf16_s"] = round(p50_f, 3)
            except Exception:
                pass
        if os.environ.get("SC_BENCH_INT4", "") == "1":
            # The documented latency-floor mode (ops/quant.py bits=4;
            # QUANT_AGREE.json records why int8 stays the default). Gated
            # like bf16 to keep the unattended driver bench inside the
            # relay budget; measured 2.644 s at this shape (probe_p50).
            gc.collect()
            try:
                p50_4, rounds_4 = bench_answer_latency(
                    small, full_layers, int4=True)
                out["answer_p50_int4_s"] = round(p50_4, 3)
                out["answer_int4_rounds_s"] = [
                    round(t, 3) for t in rounds_4]
            except Exception:
                pass
        if os.environ.get("SC_BENCH_SPEC", "") == "1":
            # Optional: greedy + speculative decoding (models/spec_decode,
            # --spec_tokens 7). Off by default to keep the driver's bench
            # inside the relay budget; measured 1.86 s at this shape
            # (scripts/probe_spec.py). Greedy only — the headline stays the
            # temperature-0.2 production sampling mode.
            gc.collect()
            try:
                p50_s, _ = bench_answer_latency(
                    small, full_layers, int8=True, spec=True
                )
                out["answer_p50_spec_greedy_s"] = round(p50_s, 3)
            except Exception:
                pass

    print(json.dumps(out))


if __name__ == "__main__":
    main()
