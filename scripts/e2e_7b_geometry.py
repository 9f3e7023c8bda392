"""Full 3-stage driver at REAL model geometry on one v5e chip.

VERDICT r1 item 6: real LongVA-7B / LLaMA-3-8B checkpoints are not fetchable
in this environment (zero egress), so the accuracy gap is burned down as far
as hardware allows — the complete pipeline -> judge -> scoring chain runs at
FULL 7B/8B geometry with random weights, on one 16 GB v5e chip, and records
wall-clock per phase plus a full-eval projection. Output text is gibberish
by construction; every tensor shape, program, cache and prompt is the
production one.

Memory plan (16 GB chip):
  stage 1: Qwen2-7B decoder int8 (7.7 GB) + ViT-L bf16 (0.6 GB) +
           colbert-large-geometry + MiniLM-geometry embedders (~0.8 GB)
  stage 2: LLaMA-3-8B judge built DIRECTLY in int8 (8.1 GB; bf16 would be
           16.1 GB and not fit even transiently)

Writes E2E_7B_GEOMETRY.json at the repo root (committed artifact).

Run:  python scripts/e2e_7b_geometry.py          (~20-40 min, mostly compiles)
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# v0.3 canonical hyperparameters (inference_streamchat_v0.3.sh:10-27).
# chunk_size is a CLI flag: 20 (the reference's argparse default,
# inference_streaming_longva_v2.py:60) is the proven one-chip regime;
# --chunk_size 40 is the v0.3 shell's canonical setting (~23k-token caption
# prefills), feasible on one chip only with int8 KV pages + chunked prefill.
V03 = dict(sample_rate=0.2, num_clusters=5, interval=10,
           short_window=20, remember_window=5, tau=5.0, compress_rate=1,
           temperature=0.2, memory_search_top_k=1)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--chunk_size", type=int, default=20)
    p.add_argument("--caption_batch", type=int, default=1,
                   help="chunks captioned per batched generate (1 = the "
                        "reference's strictly sequential captioning; >1 "
                        "measured no win at chunk-20's 11.6k-token prompts "
                        "— prefill dominates — and its ~4 GB transient "
                        "OOMs segment 2 alongside the resident programs)")
    p.add_argument("--int4", action="store_true",
                   help="group-128 int4 decoder weights (lm_head int8): "
                        "~half int8's per-token decode cost and ~3.9 GB "
                        "freed HBM at 7B (ops/quant.py bits=4)")
    p.add_argument("--kv_int8", action="store_true",
                   help="int8 KV pages. Needed for chunk_size=40's 23k "
                        "contexts; at chunk 20 bf16 KV fits and decodes "
                        "~30%% faster (11.0 vs 15.7 ms/tok, probe_kvint8)")
    p.add_argument("--offload_chunks", action="store_true",
                   help="park raw caption chunks in host RAM. Run-B2 data: "
                        "made chunk-40 fit before int8 dense prefill existed "
                        "but taxes every caption with a ~165 MB relay H2D; "
                        "with Int8KVCache prefill chunk-40 fits without it")
    p.add_argument("--offload_residents", action="store_true",
                   help="park the idle ViT/projector/embedder trees in host "
                        "RAM during each segment's caption loop "
                        "(utils/offload.py): buys the ~1.3 GB margin "
                        "caption_batch=2 at chunk_size=40 needs on one chip")
    p.add_argument("--out", default=os.path.join(REPO, "E2E_7B_GEOMETRY.json"))
    p.add_argument("--segments", type=int, default=2,
                   help="breakpoints per video (2 = the proven axon "
                        "workspace budget)")
    p.add_argument("--segment_plan", default=None, metavar="PLAN",
                   help="warm-pass video plan: ';'-separated videos, each a "
                        "','-separated list of segment lengths in seconds "
                        "(e.g. '40,40;20,20;80,80'). The cold pass runs the "
                        "FIRST video; every video then runs warm with "
                        "compiled programs reused. Lengths should keep "
                        "6*secs a multiple of chunk_size so caption prompts "
                        "stay one compiled shape (VERDICT r3 next #1: a "
                        "representative multi-video sample with materially "
                        "different captions/question). Default: one video "
                        "of --segments x 40 s (the round-3 behavior).")
    p.add_argument("--profile", action="store_true",
                   help="capture jax.profiler traces of ONE warm caption "
                        "and ONE warm answer, parse device-lane seconds "
                        "(utils/traceparse), and persist the measured "
                        "device/host split into the artifact (VERDICT r3 "
                        "next #2: replace assumed projection factors)")
    p.add_argument("--judge_warm_rows", type=int, default=4,
                   help="timed warm single-row judge calls after the compile "
                        "row (stage-2 warm s/row for the projection)")
    p.add_argument("--project_from", default=None, metavar="JSON",
                   help="skip all stages: recompute the projection block of "
                        "an existing artifact in place from its recorded "
                        "warm phase totals (pure arithmetic, no TPU). Used "
                        "to refresh artifacts written before a projection-"
                        "model change.")
    p.add_argument("--stage23_from", default=None, metavar="JSON",
                   help="run ONLY stages 2+3 against an existing stage-1 "
                        "checkpoint artifact and rewrite it in place. main() "
                        "invokes this in a fresh process automatically — an "
                        "axon OOM in stage 1 poisons its process for good.")
    return p.parse_args(argv)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def log_hbm(tag):
    try:
        st = jax.devices()[0].memory_stats() or {}
        used = st.get("bytes_in_use", 0) / 2**30
        peak = st.get("peak_bytes_in_use", 0) / 2**30
        limit = st.get("bytes_limit", 0) / 2**30
        log(f"HBM[{tag}]: in_use={used:.2f}G peak={peak:.2f}G limit={limit:.2f}G")
    except Exception as e:  # noqa: BLE001
        log(f"HBM[{tag}]: unavailable ({type(e).__name__})")


def init_quantized_decoder(key, cfg):
    """Random decoder params born int8 (per ops/quant.py layout).

    LLaMA-3-8B bf16 is 16.1 GB — it cannot exist on this chip even as a
    quantization source, so the judge's weights are sampled directly in the
    quantized representation.
    """
    d, dh = cfg.hidden_size, cfg.head_dim
    hq, hkv, f = cfg.num_heads, cfg.num_kv_heads, cfg.intermediate_size
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))

    def qmat(kin, kout):
        w = jax.random.randint(next(keys), (kin, kout), -127, 128, jnp.int8)
        scale = jnp.full((kout,), kin ** -0.5 / 64.0, jnp.float32)
        return {"w_i8": w, "scale": scale}

    layers = []
    for _ in range(cfg.num_layers):
        layer = {
            "input_norm": jnp.ones((d,), jnp.bfloat16),
            "attn": {"q": qmat(d, hq * dh), "k": qmat(d, hkv * dh),
                     "v": qmat(d, hkv * dh), "o": qmat(hq * dh, d)},
            "post_norm": jnp.ones((d,), jnp.bfloat16),
            "mlp": {"gate": qmat(d, f), "up": qmat(d, f), "down": qmat(f, d)},
        }
        if cfg.qkv_bias:
            for n in ("q", "k", "v"):
                layer["attn"][n]["b"] = jnp.zeros((dh * (hq if n == "q" else hkv),),
                                                  jnp.bfloat16)
        layers.append(layer)
    params = {
        # Token table born int8 rows too (ops/quant.quantize_embedding
        # layout): LLaMA-3's bf16 table alone is 1.05 GB.
        "embed": {
            "w_i8": jax.random.randint(
                next(keys), (cfg.vocab_size, d), -127, 128, jnp.int8
            ),
            "scale": jnp.full((cfg.vocab_size,), 0.02 / 64.0, jnp.float32),
        },
        "layers": layers,
        "final_norm": jnp.ones((d,), jnp.bfloat16),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = qmat(d, cfg.vocab_size)
    return params


def stage1_pipeline(report, args):
    from streamchat_tpu.config import (
        BertConfig, DecoderConfig, MemoryConfig, PipelineConfig,
        SamplingConfig, VideoConfig, ViTConfig,
    )
    from streamchat_tpu.memory.bank import MemoryBank
    from streamchat_tpu.models import decoder as dec_mod
    from streamchat_tpu.models import projector, vit
    from streamchat_tpu.models.embedder import TextEmbedder
    from streamchat_tpu.models.longva import LongVA
    from streamchat_tpu.models.tokenizer import ByteTokenizer
    from streamchat_tpu.ops.quant import quantize_decoder_params
    from streamchat_tpu.pipeline.runner import StreamChatPipeline
    from streamchat_tpu.utils.prng import KeySeq
    from streamchat_tpu.video.reader import SyntheticVideoReader

    key = jax.random.key(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    log("init Qwen2-7B decoder (bf16) ...")
    t0 = time.time()
    dec_cfg = DecoderConfig.qwen2_7b()
    dec_params = dec_mod.init(k1, dec_cfg, jnp.bfloat16)
    jax.block_until_ready(dec_params["embed"])
    bits = 4 if args.int4 else 8
    log(f"  init {time.time()-t0:.1f}s; quantizing to int{bits} (destructive) ...")
    t0 = time.time()
    dec_params = quantize_decoder_params(dec_params, destructive=True,
                                         quantize_embed=True, bits=bits)
    jax.block_until_ready(dec_params["layers"][0]["attn"]["q"])
    gc.collect()
    report["quantize_7b_s"] = round(time.time() - t0, 1)
    log_hbm("after int8 7B")

    log("init ViT-L/14-336 + projector + embedders ...")
    vit_cfg = ViTConfig()  # real CLIP ViT-L geometry
    vit_params = vit.init(k2, vit_cfg, jnp.bfloat16)
    proj_params = projector.init(k3, vit_cfg.hidden_size, dec_cfg.hidden_size,
                                 jnp.bfloat16)
    # Real retrieval-model geometry: mxbai-colbert-large == BERT-large (CLS),
    # all-MiniLM-L6-v2 == 6-layer 384-wide mean pooling.
    colbert_cfg = BertConfig()  # bert-large defaults
    minilm_cfg = dataclasses.replace(
        BertConfig(), hidden_size=384, intermediate_size=1536, num_layers=6,
        num_heads=12, pooling="mean",
    )
    # bf16 embedders: f32 bert-large alone is 1.34 GB and the 23k-token
    # caption prefill needs the headroom (the chip OOMed with f32 here).
    tree_emb = TextEmbedder.init_random(k4, colbert_cfg, dtype=jnp.bfloat16)
    bank_emb = TextEmbedder.init_random(k5, minilm_cfg, dtype=jnp.bfloat16)

    model = LongVA(
        vit_params=vit_params, proj_params=proj_params, dec_params=dec_params,
        vit_cfg=vit_cfg, dec_cfg=dec_cfg, tokenizer=ByteTokenizer(),
        keys=KeySeq(7),
        # Production decode path: paged with int8 KV pages. ONE constant
        # answer/summary shape for the whole session: each axon executable
        # permanently reserves its workspace, and the per-segment answer
        # growth (tree deepens -> longer retrieval) was compiling a new 7B
        # program each segment until the caption program no longer fit
        # (observed twice, both at segment 3's first caption). 12288 covers
        # short memory + 3 retrieval levels + text at these settings, so the
        # session uses exactly TWO decoder programs: caption(11648,128) and
        # answer/summary(12288,256).
        kv_int8=args.kv_int8,
        prompt_bucket=12288,
    )
    # LongVA owns the trees now. These locals live for the whole run: any
    # stray reference PINS the device buffers, so --offload_residents'
    # attribute swap would free nothing (bisected: batch-2 chunk-40 still
    # OOMed with ViT+projector pinned here).
    del vit_params, proj_params, dec_params
    report["kv_cache"] = (
        ("paged int8 (per-token-head scales)" if args.kv_int8
         else "paged bf16 (sequential-pool kernel)") + ", chunked prefill"
    )
    report["chunk_size"] = args.chunk_size
    report["offload_chunks"] = args.offload_chunks
    report["offload_residents"] = args.offload_residents
    report["caption_batch"] = args.caption_batch

    cfg = PipelineConfig(
        memory=MemoryConfig(
            chunk_size=args.chunk_size, num_clusters=V03["num_clusters"],
            interval=V03["interval"], short_window=V03["short_window"],
            remember_window=V03["remember_window"], tau=V03["tau"],
            compress_rate=V03["compress_rate"],
            offload_chunks=args.offload_chunks,
            offload_residents=args.offload_residents,
        ),
        # Visual-token budget keeps the answer prompt inside ONE 12288
        # bucket as the tree deepens (unbounded retrieval compiled a third
        # 7B program at segment 2's answer and evicted the caption program).
        sampling=SamplingConfig(temperature=V03["temperature"],
                                max_visual_tokens=8640,
                                caption_batch=args.caption_batch),
        # ingest_batch 64: the encode program's workspace shares the chip
        # with the 7B decoder here; 128 is the solo-throughput optimum.
        video=VideoConfig(sample_rate=V03["sample_rate"], ingest_batch=64),
        multi_modal_memory=True,
    )
    pipe = StreamChatPipeline(model, tree_emb, bank_emb, cfg)

    # Per-call progress: which caption/answer dies (and how long each takes).
    # Preserves the .batch/.batch_size captioner protocol so caption_batch>1
    # actually batches (pipeline/memory_update.py:113-124).
    orig_caption = pipe._caption
    state = {"n": 0, "durations": [], "batch_durations": [],
             "splice": 0.0, "generate": 0.0, "fetch": 0.0}

    def logged_caption(chunk):
        state["n"] += 1
        t0 = time.time()
        log(f"caption #{state['n']} (chunk {tuple(chunk.shape)}) ...")
        out = orig_caption(chunk)
        dt = time.time() - t0
        state["durations"].append(dt)
        tm = getattr(model, "last_timing", None) or {}
        for k_src, k_dst in (("splice_s", "splice"), ("generate_s", "generate"),
                             ("fetch_s", "fetch")):
            state[k_dst] += tm.get(k_src) or 0.0
        log(f"caption #{state['n']} done in {dt:.1f}s"
            + (f" (splice {tm.get('splice_s')}s generate {tm.get('generate_s')}s"
               f" fetch {tm.get('fetch_s')}s)" if tm else ""))
        return out

    def logged_batch(chunks):
        n0 = state["n"] + 1
        state["n"] += len(chunks)
        t0 = time.time()
        log(f"caption batch #{n0}-#{state['n']} "
            f"({len(chunks)} x {tuple(chunks[0].shape)}) ...")
        out = orig_caption.batch(chunks)
        dt = time.time() - t0
        state["batch_durations"].append((len(chunks), dt))
        log(f"caption batch done in {dt:.1f}s "
            f"({dt/len(chunks):.1f}s/caption)")
        return out

    logged_caption.batch = logged_batch
    logged_caption.batch_size = orig_caption.batch_size
    pipe._caption = logged_caption

    # Video plan: segment lengths in seconds per video. 40 s at 30 fps ->
    # 240 sampled frames at rate 0.2 -> 6 full 40-frame chunks per segment.
    # TWO breakpoints per video: the axon backend permanently reserves every
    # compiled executable's workspace, and the inter-segment tree MERGE
    # (whose combined-centroid count varies per merge event) plus any other
    # newly-shaped program keeps nudging the reserved set upward; at these
    # settings the budget holds two full segments per video (24 captions +
    # 2 answers at full 7B geometry) and reuses everything for subsequent
    # videos. Segment-3 OOMs were bisected across 8 runs (see git log).
    if args.segment_plan:
        plan = [[int(x) for x in v.split(",") if x]
                for v in args.segment_plan.split(";") if v]
    else:
        plan = [[40] * args.segments]
    report["segment_plan_s"] = plan

    _QA = [
        ("What is happening in the video?", "things", "OCP"),
        ("What changed since the beginning?", "stuff", "CT"),
        ("What happened at the end?", "more things", "OCP"),
    ]

    def make_breakpoints(seg_secs):
        out, t = [], 0
        for i, secs in enumerate(seg_secs):
            t += secs
            q, a, c = _QA[i % len(_QA)]
            out.append({"question": q, "answer": a, "class": c, "time": t})
        return out

    def make_reader(seg_secs):
        return SyntheticVideoReader(total_frames=sum(seg_secs) * 30,
                                    frame_rate=30.0, height=336, width=336)

    breakpoints = make_breakpoints(plan[0])
    reader = make_reader(plan[0])
    # Start from EMPTY dialogue banks: the JSONs persist across runs, and a
    # stale bank makes the loop-entry enter_name() embed last run's docs —
    # at a batch-bucket size the cold pass never compiled, which cost a
    # hidden ~30 s embedder compile at warm-pass start (the "unattributed"
    # 32 s gap in E2E run A4's warm wall).
    for stale in ("/tmp/e2e7b_memory.json", "/tmp/e2e7b_memory2.json"):
        if os.path.exists(stale):
            os.remove(stale)
    bank = MemoryBank("/tmp/e2e7b_memory.json",
                      lambda t: bank_emb.embed(t))
    save_file = "/tmp/e2e7b_results.json"
    if os.path.exists(save_file):
        os.remove(save_file)

    log_hbm("all models loaded")
    log(f"stage 1 (cold): streaming pipeline over {len(breakpoints)} "
        "breakpoints ...")
    t0 = time.time()
    results = pipe.process_video(reader, breakpoints, bank,
                                 user_name="User", save_file=save_file)
    wall = time.time() - t0

    report["stage1_wall_s"] = round(wall, 1)
    report["stage1_questions"] = len(results)
    report["stage1_per_question_s"] = round(wall / max(1, len(results)), 1)
    report["stage1_process_times_s"] = [round(r["process_time"], 2) for r in results]
    report["stage1_phase_totals_s"] = pipe.last_phase_totals
    report["stage1_phase_counts"] = pipe.last_phase_counts
    log(f"stage 1 cold done: {wall:.1f}s for {len(results)} questions; "
        f"phases {pipe.last_phase_totals}")

    # Steady state: a second identical video through the SAME pipeline —
    # every program is already compiled, so this is the number a 2.5k-question
    # benchmark run actually amortizes to (compiles through the remote-TPU
    # tunnel dominate a 3-question cold run).
    # Free the cold video's pinned device state before the warm pass.
    pipe.last_tree = None
    del bank
    gc.collect()

    # --profile: trace ONE warm caption and ONE warm answer and parse
    # device-lane seconds. The traced pass runs AFTER the timed warm loop
    # on an extra untimed video: start/stop_trace plus writing the dump
    # measurably contaminated the in-loop timings (run r4-A: +30 s on the
    # caption phase, +35 s on answer — the trace dump lands inside the
    # phase windows). Tracing a whole warm video would record ~10^6
    # per-op device events; one caption + one answer stay parseable and
    # cover the two dominant phases (~85% of warm wall).
    profile_state = {"caption_pending": args.profile,
                     "answer_pending": args.profile}

    def profiled_caption(chunk):
        if profile_state["caption_pending"]:
            profile_state["caption_pending"] = False
            jax.profiler.start_trace("/tmp/e2e7b_trace_caption")
            try:
                with jax.profiler.TraceAnnotation("phase=caption_call"):
                    return logged_caption(chunk)
            finally:
                jax.profiler.stop_trace()
        return logged_caption(chunk)

    profiled_caption.batch = logged_batch
    profiled_caption.batch_size = orig_caption.batch_size

    orig_answer = pipe._answer

    def profiled_answer(q, short_memory, tree, history_prompt):
        if profile_state["answer_pending"]:
            profile_state["answer_pending"] = False
            jax.profiler.start_trace("/tmp/e2e7b_trace_answer")
            try:
                with jax.profiler.TraceAnnotation("phase=answer_call"):
                    return orig_answer(q, short_memory, tree, history_prompt)
            finally:
                jax.profiler.stop_trace()
        return orig_answer(q, short_memory, tree, history_prompt)

    # Warm passes: every plan video through the SAME pipeline object —
    # compiled programs reused. Per-video records give the per-question
    # spread across materially different segment lengths (captions/question
    # varies with chunks/segment) — VERDICT r3 next #1. A geometry's FIRST
    # encounter still compiles a few new tree-merge shapes (run r4-A: ~28 s
    # inside warm video 1), so plans should list each geometry twice and the
    # summary below keeps the LAST occurrence of each.
    warm_videos = []
    warm_wall_total, warm_q_total = 0.0, 0
    agg_totals, agg_counts = {}, {}
    from streamchat_tpu.pipeline import memory_update as mu

    for vi, seg_secs in enumerate(plan):
        log(f"stage 1 (warm {vi}): video with {seg_secs}s segments ...")
        cap_lo = len(state["durations"])
        bank_path = f"/tmp/e2e7b_memory_warm{vi}.json"
        if os.path.exists(bank_path):
            os.remove(bank_path)
        try:
            mu.reset_offload_stats()
            bank_w = MemoryBank(bank_path, lambda t: bank_emb.embed(t))
            t0 = time.time()
            results_w = pipe.process_video(
                make_reader(seg_secs), make_breakpoints(seg_secs), bank_w,
                user_name="User",
            )
            wall_w = time.time() - t0
        except Exception as e:  # noqa: BLE001 - one OOM poisons the process
            log(f"stage 1 warm video {vi} FAILED ({type(e).__name__}); "
                "keeping earlier warm results")
            report["stage1_warm_failed"] = (
                f"video {vi} ({seg_secs}): {type(e).__name__}"
            )
            break
        pipe.last_tree = None
        del bank_w
        gc.collect()
        rec = {
            "segments_s": seg_secs,
            "wall_s": round(wall_w, 1),
            "questions": len(results_w),
            "per_question_s": round(wall_w / max(1, len(results_w)), 1),
            "phase_totals_s": pipe.last_phase_totals,
            "phase_counts": pipe.last_phase_counts,
            "caption_durations_s": [
                round(d, 2) for d in state["durations"][cap_lo:]
            ],
        }
        # Measured chunk-offload transport (heavy segments only): the
        # seconds these relay transfers cost, and the bytes moved — the
        # host-attached projections substitute PCIe-rate transport for
        # exactly these measured seconds (see compute_projections).
        ostats = mu.reset_offload_stats()
        if ostats["chunks"]:
            rec["offload"] = {
                "chunks": ostats["chunks"],
                "h2d_s": round(ostats["h2d_s"], 2),
                "d2h_s": round(ostats["d2h_s"], 2),
                "bytes": int(ostats["bytes"]),
            }
        warm_videos.append(rec)
        warm_wall_total += wall_w
        warm_q_total += len(results_w)
        log(f"stage 1 warm {vi} done: {wall_w:.1f}s for "
            f"{len(results_w)} questions; phases {pipe.last_phase_totals}")

    if warm_videos:
        # Steady state = the LAST occurrence of each distinct geometry
        # (the first occurrence pays its tree-merge-shape compiles).
        last_by_geom = {tuple(v["segments_s"]): v for v in warm_videos}
        steady = list(last_by_geom.values())
        steady_wall = sum(v["wall_s"] for v in steady)
        steady_q = sum(v["questions"] for v in steady)
        for v in steady:
            for k, x in v["phase_totals_s"].items():
                agg_totals[k] = round(agg_totals.get(k, 0.0) + x, 3)
            for k, x in v["phase_counts"].items():
                agg_counts[k] = agg_counts.get(k, 0) + x
        report["stage1_warm_wall_s"] = round(steady_wall, 1)
        report["stage1_warm_questions"] = steady_q
        report["stage1_warm_per_question_s"] = round(
            steady_wall / max(1, steady_q), 1
        )
        report["stage1_warm_per_question_spread_s"] = [
            v["per_question_s"] for v in steady
        ]
        report["stage1_warm_all_wall_s"] = round(warm_wall_total, 1)
        report["stage1_warm_all_questions"] = warm_q_total
        report["stage1_warm_videos"] = warm_videos
        report["stage1_warm_phase_totals_s"] = agg_totals
        report["stage1_warm_phase_counts"] = agg_counts
        report["caption_durations_s"] = [round(d, 2) for d in state["durations"]]
        report["caption_batch_durations_s"] = [
            (n, round(d, 2)) for n, d in state["batch_durations"]
        ]
        report["caption_splice_generate_fetch_s"] = [
            round(state["splice"], 2), round(state["generate"], 2),
            round(state["fetch"], 2),
        ]
        if pipe.residents is not None:
            report["offload_residents_s"] = {
                "d2h_total": round(pipe.residents.offload_s, 2),
                "h2d_dispatch_total": round(pipe.residents.restore_s, 2),
                "host_bytes_mb": round(pipe.residents.host_bytes() / 1e6, 1),
            }
    else:
        # Steady state from measured cold per-call costs: captions dominate
        # (logged per call); ingest + answer from the cold phase residue.
        times = state.get("durations", [])
        cap = sum(times[-12:]) / max(1, len(times[-12:])) if times else 8.6
        per_q = cap * 12 + 20.0   # 12 captions + ingest/answer/overheads
        report["stage1_warm_per_question_s"] = round(per_q, 1)
        report["stage1_warm_derivation"] = (
            f"12 captions x {cap:.1f}s (measured steady per-call) + ~20s "
            "ingest/answer/overhead; warm pass hit the axon allocator"
        )

    if args.profile and warm_videos:
        # Untimed profile pass: ONE single-segment video; the wrappers trace
        # its first (fully warm) caption and its answer. Kept outside every
        # timed record — trace start/stop + dump writing cost tens of
        # seconds through this host.
        log("profile pass (untimed): tracing one warm caption + answer ...")
        seg_p = plan[0][:1]
        prof_bank = "/tmp/e2e7b_memory_prof.json"
        if os.path.exists(prof_bank):
            os.remove(prof_bank)
        pipe._caption = profiled_caption
        pipe._answer = profiled_answer
        try:
            bank_p = MemoryBank(prof_bank, lambda t: bank_emb.embed(t))
            pipe.process_video(make_reader(seg_p), make_breakpoints(seg_p),
                               bank_p, user_name="User")
            del bank_p
        except Exception as e:  # noqa: BLE001 - attribution is optional
            log(f"profile pass FAILED ({type(e).__name__}); continuing")
            report["profile_pass_failed"] = type(e).__name__
        pipe._caption = logged_caption
        pipe._answer = orig_answer
        pipe.last_tree = None
        gc.collect()

    if args.profile and not profile_state["caption_pending"]:
        from streamchat_tpu.utils.traceparse import (
            device_seconds_by_phase,
            host_events_in_phase,
        )

        # Steady-state walls for the device-fraction denominators: the
        # traced call's own wall carries trace overhead, which would
        # understate the device fraction and flatter the host-shrink term
        # in the measured projection. Both come from the last-occurrence
        # (compile-free) warm records aggregated above.
        warm_caps = sorted(
            d for v in last_by_geom.values() for d in v["caption_durations_s"]
        )
        steady_cap = (warm_caps[len(warm_caps) // 2] if warm_caps else None)
        nq_steady = max(1, report.get("stage1_warm_questions", 0))
        steady_ans = (
            report["stage1_warm_phase_totals_s"].get("answer", 0.0) / nq_steady
            if report.get("stage1_warm_phase_totals_s") else None
        )

        dev = {}
        for tag, tdir, steady_w in (
            ("caption", "/tmp/e2e7b_trace_caption", steady_cap),
            ("answer", "/tmp/e2e7b_trace_answer", steady_ans),
        ):
            try:
                phases = device_seconds_by_phase(tdir)
                rec = phases.get(f"{tag}_call")
                if rec:
                    rec["top_host_events"] = host_events_in_phase(
                        tdir, f"{tag}_call", top=12
                    )
                    if steady_w:
                        rec["steady_wall_s"] = round(steady_w, 3)
                    dev[tag] = rec
            except Exception as e:  # noqa: BLE001
                dev[tag] = {"error": f"{type(e).__name__}: {e}"}
        report["device_seconds"] = dev
        brief = {k: {x: v.get(x)
                     for x in ("wall_s", "device_s", "host_gap_s",
                               "steady_wall_s")}
                 for k, v in dev.items()}
        log(f"device-time attribution: {brief}")

    del pipe, model, tree_emb, bank_emb   # param locals already dropped
    gc.collect()
    return save_file


def stage2_judge(save_file, report, args=None):
    from streamchat_tpu.config import DecoderConfig
    from streamchat_tpu.eval import judge as judge_mod
    from streamchat_tpu.models.textlm import TextLM
    from streamchat_tpu.models.tokenizer import ByteTokenizer
    from streamchat_tpu.utils.prng import KeySeq

    log("init LLaMA-3-8B judge directly in int8 ...")
    cfg = DecoderConfig.llama3_8b()
    params = init_quantized_decoder(jax.random.key(11), cfg)
    jax.block_until_ready(params["embed"])
    lm = TextLM(params, cfg, ByteTokenizer(), KeySeq(3))

    predictions = json.load(open(save_file, encoding="utf-8"))
    log("stage 2: batched judge ...")
    t0 = time.time()
    judged = judge_mod.judge_predictions(
        predictions,
        lambda prompts: lm.generate_batch(prompts, max_new_tokens=64),
        output_path="/tmp/e2e7b_judged.jsonl",
        batch_size=len(predictions),
    )
    wall = time.time() - t0
    report["stage2_wall_s"] = round(wall, 1)
    report["stage2_rows"] = len(judged)
    log(f"stage 2 done: {wall:.1f}s for {len(judged)} rows")

    # Forced-parse rows (VERDICT r2 next #7): random 8B weights emit
    # gibberish, so the parse->scoring path at geometry otherwise only ever
    # exercises the unparseable branch. The generate fn below still runs the
    # REAL on-chip 8B judge program, then appends a canonical verdict to its
    # output — proving judged-row flow (llama_pred/score -> accuracy) through
    # the same stage-2/3 code on the same chip. Rows are marked.
    def forced_generate(prompts):
        # judge_predictions(batch_size=1) passes a BARE STRING (the
        # reference's one-at-a-time granularity); batch_size>1 passes a
        # list. Normalize — iterating a string hands generate_batch one
        # row PER CHARACTER (run r4-B: a 1329-char prompt became a
        # batch-1329 KV pool, a 22 GB pad, and a poisoned allocator).
        single = isinstance(prompts, str)
        plist = [prompts] if single else prompts
        raw = lm.generate_batch(plist, max_new_tokens=64)
        verdicts = ["{'llama_pred': 'yes', 'score': 4}",
                    "{'llama_pred': 'no', 'score': 1}"]
        out = [r + " " + verdicts[i % 2] for i, r in enumerate(raw)]
        return out[0] if single else out

    forced = [dict(p, forced_parse=True) for p in predictions]
    judged_forced = judge_mod.judge_predictions(
        forced,
        forced_generate,
        output_path="/tmp/e2e7b_judged_forced.jsonl",
        batch_size=len(forced),
    )
    with open("/tmp/e2e7b_judged.jsonl", "a", encoding="utf-8") as f:
        for rec in judged_forced:
            f.write(json.dumps(rec) + "\n")
    report["stage2_forced_rows"] = len(judged_forced)

    # Warm judge s/row (VERDICT r3 next #1): the batched stage-2 wall above
    # is compile-dominated; projections need the steady per-row cost of the
    # second-largest model in the system. One batch-1 compile row, then
    # >= N timed batch-1 rows of the SAME prediction (same prompt shape ->
    # same compiled program; generation cost is shape-bound, not
    # content-bound). Batch-1 is the reference's own judging granularity
    # (eval_video_qa_with_llama3_ours.py:111-154) and is CONSERVATIVE for
    # the projection — the batched path only amortizes further.
    n_rows = getattr(args, "judge_warm_rows", 4) if args else 4
    row = [dict(predictions[0], forced_parse=True)]

    def one_row():
        judge_mod.judge_predictions(
            row, forced_generate,
            output_path="/tmp/e2e7b_judge_warm.jsonl", batch_size=1,
        )

    t0 = time.time()
    one_row()
    report["stage2_row_compile_s"] = round(time.time() - t0, 2)
    times = []
    for _ in range(n_rows):
        t0 = time.time()
        one_row()
        times.append(time.time() - t0)
    times_sorted = sorted(times)
    mid = len(times_sorted) // 2
    warm_row = (times_sorted[mid] if len(times_sorted) % 2
                else 0.5 * (times_sorted[mid - 1] + times_sorted[mid]))
    report["stage2_warm_rows_s"] = [round(t, 3) for t in times]
    report["stage2_warm_row_s"] = round(warm_row, 3)
    log(f"stage 2 warm row: {warm_row:.2f}s/row "
        f"(compile row {report['stage2_row_compile_s']}s)")

    # Warm BATCHED judge s/row: the projection deliberately uses the
    # conservative batch-1 figure above; this records how much the batched
    # path (one weight read per decode step for the whole batch) amortizes
    # it. Same prompts -> the batch-N program compiled by the stage-2 run
    # above is reused; first call warms, second is timed.
    if predictions:
        # Batch curve (VERDICT r4 #7): per-row cost at batch 2/4/8 — the
        # batched path reads the 8B weights once per decode step for the
        # whole batch, so rows amortize. The conservative batch-1 figure
        # stays the main projection term; compute_projections adds a
        # v5p8_hours_dp4_batched_judge variant from the best point here.
        curve = {}
        for nb in (2, 4, 8):
            batch_rows = [
                dict(predictions[i % len(predictions)], forced_parse=True)
                for i in range(nb)
            ]

            def batch_pass(rows=batch_rows, n=nb):
                judge_mod.judge_predictions(
                    rows, forced_generate,
                    output_path="/tmp/e2e7b_judge_warm_batch.jsonl",
                    batch_size=n,
                )

            batch_pass()                       # compile + warm
            t0 = time.time()
            batch_pass()
            per_row_b = (time.time() - t0) / nb
            curve[str(nb)] = round(per_row_b, 3)
            log(f"stage 2 warm batched row: {per_row_b:.2f}s/row at "
                f"batch {nb} (batch-1 projection figure stays "
                f"{warm_row:.2f})")
        report["stage2_warm_batch_curve"] = curve
        # kept for older readers: the batch-2 point
        report["stage2_warm_batch_rows"] = 2
        report["stage2_warm_batch_row_s"] = curve.get("2")
        report["stage2_warm_batch_row_best_s"] = min(curve.values())
    del lm, params
    gc.collect()


def stage3_scoring(report):
    from streamchat_tpu.eval.scoring import (
        aggregate_scores, per_class_breakdown, read_jsonl,
    )

    t0 = time.time()
    rows = read_jsonl("/tmp/e2e7b_judged.jsonl")
    stats = aggregate_scores(rows)
    breakdown = per_class_breakdown(rows)
    report["stage3_wall_s"] = round(time.time() - t0, 3)
    report["stage3_stats"] = stats
    report["stage3_classes"] = sorted(
        c for c in breakdown["classes"] if c is not None
    )


def _write_artifact(path, report):
    # Write-then-rename so a crash mid-dump can't truncate the artifact.
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    os.replace(tmp, path)


def main():
    args = parse_args()
    if args.project_from:
        try:
            with open(args.project_from, encoding="utf-8") as f:
                report = json.load(f)
            compute_projections(report)
        except (OSError, json.JSONDecodeError, KeyError) as e:
            print(f"--project_from {args.project_from}: cannot recompute "
                  f"projections ({type(e).__name__}: {e}); artifact left "
                  "untouched", file=sys.stderr)
            return 1
        _write_artifact(args.project_from, report)
        print(json.dumps(report["projection"], indent=2))
        return 0
    if jax.default_backend() != "tpu":
        print("requires the real TPU chip"); return 1

    if args.stage23_from:
        # Fresh-process stages 2+3 (see below): read the stage-1 checkpoint
        # artifact, judge + score, refresh projections, rewrite in place.
        with open(args.stage23_from, encoding="utf-8") as f:
            report = json.load(f)
        try:
            stage2_judge(report["stage1_save_file"], report, args)
            stage3_scoring(report)
            # A successful rerun supersedes a prior failed attempt's marker.
            report.pop("stage23_failed_rc", None)
        finally:
            compute_projections(report)
            _write_artifact(args.stage23_from, report)
            log(f"rewrote {args.stage23_from}")
        return 0

    report = {
        "description": "full 3-stage driver at real model geometry "
                       "(random weights), one v5e chip",
        "geometry": {
            "longva_decoder": "Qwen2-7B (28L, d3584, "
                              + ("int4 group-128" if args.int4 else "int8")
                              + " weight-only)",
            "vision_tower": "CLIP ViT-L/14-336 (bf16, fused Pallas layers)",
            "judge": "LLaMA-3-8B (32L, d4096, int8 weight-only)",
            "tree_embedder": "BERT-large geometry (colbert CLS)",
            "bank_embedder": "MiniLM-L6 geometry (mean pooling)",
        },
        "v03_config": dict(V03, chunk_size=args.chunk_size),
    }
    t0 = time.time()
    save_file = stage1_pipeline(report, args)
    report["stage1_save_file"] = save_file
    report["stage1_total_wall_s"] = round(time.time() - t0, 1)
    # Checkpoint the artifact NOW, then run stages 2+3 in a FRESH process:
    # one axon OOM anywhere in stage 1 (e.g. an over-budget warm video)
    # poisons every later allocation in this process — run r4-A lost its
    # whole artifact when the judge init hit the poisoned allocator.
    compute_projections(report)
    _write_artifact(args.out, report)
    log(f"checkpointed stage-1 artifact to {args.out}")

    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__),
           "--stage23_from", args.out,
           "--judge_warm_rows", str(args.judge_warm_rows)]
    log(f"stages 2+3 in a fresh process: {' '.join(cmd)}")
    rc = subprocess.run(cmd).returncode
    with open(args.out, encoding="utf-8") as f:
        report = json.load(f)
    report["total_wall_s"] = round(time.time() - t0, 1)
    if rc != 0:
        report["stage23_failed_rc"] = rc
    _write_artifact(args.out, report)
    log(f"wrote {args.out}")
    print(json.dumps(report.get("projection", {}), indent=2))
    return 0 if rc == 0 else 1


def compute_projections(report):
    """Fill report["projection"] from the recorded warm phase totals.

    Pure arithmetic over fields stage-1 already measured; callable
    standalone (--project_from) to refresh artifacts written before a
    projection-model change.
    """
    # Full-eval projection from the measured WARM per-question cost (one-time
    # compiles amortize to nothing over a 2.5k-question run). StreamBench
    # v0.3 is ~2.5k questions (BASELINE.md; paper-scale).
    per_q = report.get("stage1_warm_per_question_s",
                       report["stage1_per_question_s"])
    # Stage 2+3 per-question cost (VERDICT r3 next #1): the reference's
    # ~28 h covers pipeline + LLaMA-3 judge + scoring
    # (inference_streamchat_v0.3.sh:29-62), so every projection variant now
    # folds them in — one judge row per question (the reference's own
    # granularity) at the measured warm batch-1 s/row, plus stage-3 scoring
    # (pure host arithmetic) at its measured per-row cost.
    judge_row = report.get("stage2_warm_row_s")
    s3_rows = max(1, report.get("stage2_rows", 0)
                  + report.get("stage2_forced_rows", 0))
    stage3_row = report.get("stage3_wall_s", 0.0) / s3_rows
    stages = [1, 2, 3] if judge_row is not None else [1]
    if judge_row is None:
        judge_row = 0.0     # pre-round-4 artifact: stage-1-only, marked below
    # Preserve keys a newer writer may have added that this recompute does
    # not produce (ADVICE r3): recomputed keys overwrite, unknown ones stay.
    prior = report.get("projection") or {}
    full_q = per_q + judge_row + stage3_row
    report["projection"] = {
        "questions": 2500,
        "stages_included": stages,
        "stage2_s_per_question": round(judge_row, 3),
        "stage3_s_per_question": round(stage3_row, 4),
        "one_v5e_hours": round(full_q * 2500 / 3600, 1),
        "v5p8_hours_flat5x": round(full_q * 2500 / 3600 / 5, 1),
        "note": "flat5x: conservative ~5x one-v5e throughput; "
                "reference: ~28 h on 2xA100 (README.md:71)",
    }
    report["projection"] = {**prior, **report["projection"]}
    # Per-phase roofline projection for v5p-8 (4 chips, tp=4 over ICI).
    # Chip ratios vs v5e: bf16 FLOPs 459/197 = 2.33x, HBM BW 2765/819 =
    # 3.38x. Phase speedups (derated for collective/launch overhead):
    #   MXU-bound prefill:   4 x 2.33 x 0.85 ~ 8x
    #   BW-bound decode:     4 x 3.38 x 0.8  ~ 10.8x
    #   caption/answer/summarize mix to ~7x at their measured
    #   prefill:decode:overhead ratios (probe_caption40: 2.9s prefill,
    #   1.7s decode, ~0.4s host overhead per chunk-40 caption);
    #   ingest (activation-BW ViT): ~10x; kmeans/tree: dp ~4x;
    #   host-side retrieval/history/store: 1x (and the relay's 50-90 ms
    #   dispatch tax, folded into the measured numbers here, disappears
    #   on a host-attached deployment — NOT credited below).
    warm = report.get("stage1_warm_phase_totals_s")
    if warm:
        # Warm totals span ALL warm videos when a --segment_plan sample ran.
        nq = max(1, report.get("stage1_warm_questions",
                               report.get("stage1_questions", 1)))
        factors = {
            "ingest": 10.0, "dedup": 4.0, "caption": 7.0, "summarize": 7.0,
            "history": 1.0, "store": 1.0, "qembed": 1.0,
            "answer.retrieval": 1.0, "answer.generate": 7.0,
        }
        top_level = ["ingest", "dedup", "caption", "summarize", "history",
                     "store", "qembed", "answer.retrieval", "answer.generate"]

        # ---- measured chunk-offload transport (heavy segments) ----------
        # Near-clamp segments (>512 sampled frames) park raw caption chunks
        # in host RAM; through this tunneled relay that transport is
        # MEASURED at ~6.4 s H2D + ~8-10 s D2H per 165 MB chunk (~25/2
        # MB/s) and dominates heavy-video wall. A host-attached v5p moves
        # the same bytes over PCIe/DMA at >= 8 GB/s. Host-attached variants
        # therefore substitute byte-accurate PCIe seconds for exactly the
        # measured relay seconds (per-video `offload` records) — the
        # one_v5e/flat5x numbers keep the full relay cost.
        videos = report.get("stage1_warm_videos") or []
        steady_videos = list(
            {tuple(v["segments_s"]): v for v in videos}.values())
        PCIE_BPS = 8e9
        off_h2d = sum(v["offload"]["h2d_s"] for v in steady_videos
                      if v.get("offload"))
        off_d2h = sum(v["offload"]["d2h_s"] for v in steady_videos
                      if v.get("offload"))
        off_bytes = sum(v["offload"]["bytes"] for v in steady_videos
                        if v.get("offload"))
        pcie_s = off_bytes / PCIE_BPS
        if off_bytes:
            report["projection"]["offload_transport"] = {
                "relay_h2d_s": round(off_h2d, 1),
                "relay_d2h_s": round(off_d2h, 1),
                "bytes": int(off_bytes),
                "hostattached_s_at_8GBps": round(pcie_s, 2),
            }

        def _sums(w, h2d=0.0, d2h=0.0):
            """(phases, mem_other, ans_other) with transport stripped.

            Both offload transfers happen inside update_memory (the D2H in
            chunk cutting, the blocked H2D just before each caption_fn
            call, OUTSIDE the captioner's own timed window — warm-video
            records confirm: heavy captions time 4.0 s each while the
            memory_update phase carries the transport), so the whole
            h2d + d2h strip comes off memory_update / mem_other and the
            caption phase is untouched."""
            a = dict(w)
            a["memory_update"] = max(
                0.0, a.get("memory_update", 0.0) - h2d - d2h)
            mo = max(0.0, a.get("memory_update", 0.0)
                     - a.get("caption", 0.0) - a.get("summarize", 0.0))
            ao = max(0.0, a.get("answer", 0.0)
                     - a.get("answer.retrieval", 0.0)
                     - a.get("answer.generate", 0.0))
            return a, mo, ao

        _, mem_other, ans_other = _sums(warm)
        warm_adj, mem_other_adj, ans_other_adj = _sums(warm, off_h2d, off_d2h)

        proj = sum(warm.get(p, 0.0) / factors[p] for p in top_level)
        proj += mem_other / 4.0 + ans_other / 1.0
        wall = report.get("stage1_warm_wall_s", 0.0)
        attributed = (
            sum(warm.get(p, 0.0) for p in top_level) + mem_other + ans_other
        )
        proj += max(0.0, wall - attributed)          # unattributed: 1x
        # Stage 2: the judge is a decode-bound 8B generate — same phase
        # class as answer.generate (factor 7 on tp=4). Stage 3: host, 1x.
        proj += nq * (judge_row / 7.0 + stage3_row)
        report["projection"]["v5p8_hours_roofline"] = round(
            proj / nq * 2500 / 3600, 1
        )
        report["projection"]["roofline_factors"] = factors
        # Host-attached variant: every number above is measured THROUGH the
        # axon relay, where each eager dispatch/readback costs 50-90 ms; a
        # host-attached v5p-8 pays ~1-5 ms. Host-bound phases (retrieval,
        # history, store, per-call splice/fetch overhead inside caption/
        # answer) shrink ~10x there. Modeled by re-running the sum with the
        # 1x phases at 10x and the caption/answer host slice (measured
        # ~0.5 s/call of their totals) moved from 2x to 10x.
        host_phases = ["history", "store", "qembed", "answer.retrieval"]
        proj_host = sum(
            warm_adj.get(p, 0.0) / (10.0 if p in host_phases else factors[p])
            for p in top_level
        )
        proj_host += mem_other_adj / 4.0 + ans_other_adj / 10.0
        proj_host += max(0.0, wall - attributed) / 10.0 + pcie_s
        proj_host += nq * (judge_row / 7.0 + stage3_row / 10.0)
        report["projection"]["v5p8_hours_hostattached"] = round(
            proj_host / nq * 2500 / 3600, 1
        )
        # dp=4 variant — the deployment a v5p-8 user would actually pick.
        # Each v5p chip has 95 GB HBM: the ENTIRE resident set (int4/int8
        # 7B ~4.4 GB + int8 LLaMA-3-8B judge ~8 GB + ViT + embedders +
        # executable workspaces, ~15 GB total, measured: it fits one 16 GB
        # v5e) fits per chip with 6x headroom, so the right parallelism is
        # four independent pipeline replicas sharding ANNOTATIONS — the
        # runner's built-in --num_chunks/--chunk_idx DP (the reference
        # itself shards its eval this way). Zero collectives, no tp derate;
        # host-attached (the relay's 50-90 ms dispatch tax is an artifact
        # of this tunneled setup). Per-chip ratios vs v5e: MXU 2.33x
        # (x0.95 derate), HBM BW 3.38x (x0.9). Phase mixes from the
        # measured caption split (prefill 2.9 s MXU / decode 1.7 s BW /
        # ~0.4 s host per chunk-40 caption -> per-chip ~2.6x with the host
        # slice at 10x) give:
        #   caption/summarize/answer.generate: ~2.6 x 4 ~ 10.4x
        #   ingest (activation-BW ViT):        3.0 x 4 ~ 12x
        #   kmeans/tree/dedup:                 2 x 4   ~ 8x
        #   host-side phases:                  10x (host-attached)
        factors_dp4 = {
            "ingest": 12.0, "dedup": 8.0, "caption": 10.4,
            "summarize": 10.4, "history": 10.0, "store": 10.0,
            "qembed": 10.0, "answer.retrieval": 10.0,
            "answer.generate": 10.4,
        }
        def _dp4_hours(w, n_q, v_wall, v_attr, h2d=0.0, d2h=0.0):
            """dp4 hours for a phase-total dict (transport-substituted)."""
            a, mo, ao = _sums(w, h2d, d2h)
            p4 = sum(a.get(p, 0.0) / factors_dp4[p] for p in top_level)
            p4 += mo / 8.0 + ao / 10.0
            p4 += max(0.0, v_wall - v_attr) / 10.0
            p4 += n_q * (judge_row / 10.4 + stage3_row / 10.0)
            return p4

        proj_dp4 = _dp4_hours(warm, nq, wall, attributed,
                              off_h2d, off_d2h) + pcie_s
        report["projection"]["v5p8_hours_dp4_hostattached"] = round(
            proj_dp4 / nq * 2500 / 3600, 2
        )
        report["projection"]["dp4_note"] = (
            "dp=4 pipeline replicas over annotations (runner --num_chunks), "
            "full resident set per 95 GB chip, host-attached; the "
            "north-star <4 h configuration (BASELINE.md)"
            + ("; includes one judge row + scoring per question"
               if stages == [1, 2, 3] else
               "; STAGE-1 ONLY (pre-round-4 artifact without a measured "
               "judge s/row)")
            + ("; the warm sample DELIBERATELY over-weights near-clamp "
               "heavy segments (VERDICT r4 #1) — see "
               "v5p8_hours_dp4_typical_mix for the representative-mix "
               "headline and the spread for per-geometry points"
               if off_bytes else "")
        )
        def _video_dp4(v):
            """dp4 seconds for one video from its OWN phase record, its
            offload transport swapped for PCIe seconds."""
            o = v.get("offload") or {}
            vw = v["phase_totals_s"]
            _, vmo, vao = _sums(vw)
            v_attr = sum(vw.get(p, 0.0) for p in top_level) + vmo + vao
            return _dp4_hours(
                vw, max(1, v["questions"]), v["wall_s"], v_attr,
                o.get("h2d_s", 0.0), o.get("d2h_s", 0.0),
            ) + o.get("bytes", 0) / PCIE_BPS

        # Typical-mix headline: per-video dp4 (same formula as the spread
        # points — no cross-video unattributed-time cancellation) summed
        # over only the videos WITHOUT heavy (offloaded) segments — the
        # representative StreamBench geometries the pre-round-5 sample
        # measured. The heavy points stay in the spread and bound the tail.
        typical = [v for v in steady_videos if not v.get("offload")]
        if off_bytes and typical:
            t_q = max(1, sum(v["questions"] for v in typical))
            report["projection"]["v5p8_hours_dp4_typical_mix"] = round(
                sum(_video_dp4(v) for v in typical) / t_q * 2500 / 3600, 2
            )
        # Per-question spread across the segment-length sample: each point
        # is the dp4 formula applied to THAT video's own recorded phase
        # totals (no mix-stability assumption), with its measured offload
        # transport swapped for PCIe seconds — every spread point is a
        # host-attached number for its geometry.
        if steady_videos:
            report["projection"]["v5p8_hours_dp4_spread"] = [
                round(_video_dp4(v) / max(1, v["questions"])
                      * 2500 / 3600, 2)
                for v in steady_videos
            ]
        # Batched-judge variant (VERDICT r4 #7): same dp4 sum with stage 2
        # at the measured BEST warm batched s/row instead of the
        # conservative batch-1 figure (which stays the headline term).
        batched_row = report.get("stage2_warm_batch_row_best_s") \
            or report.get("stage2_warm_batch_row_s")
        if batched_row:
            pb = proj_dp4 + nq * ((batched_row - judge_row) / 10.4)
            report["projection"]["v5p8_hours_dp4_batched_judge"] = round(
                pb / nq * 2500 / 3600, 2
            )

        # Measured-device variant (VERDICT r3 next #2): when --profile ran,
        # replace the blended per-phase factors with the TRACED device/host
        # split. Device time scales by the v5p-8 dp4 device ratio
        # (caption-mix blended per-chip 2.46x [prefill 2.21x MXU, decode
        # 3.04x BW at the measured 2.76:1.65 mix] x 4 replicas = 9.85x);
        # the measured HOST slice — which through this relay is ~50-90 ms
        # per dispatch vs ~1-5 ms host-attached — shrinks 10x, now applied
        # only to the traced host gap instead of an assumed whole-phase
        # blend.
        dev = report.get("device_seconds") or {}
        cap_rec, ans_rec = dev.get("caption"), dev.get("answer")
        if (cap_rec and ans_rec and cap_rec.get("wall_s")
                and ans_rec.get("wall_s")):
            # Denominator: min(own wall, steady wall). The traced call's
            # own wall includes trace overhead (captions: traced 5.2 s vs
            # 4.01 steady at an identical shape — steady is right); but
            # the steady answer wall is a MEAN over heterogeneous answers
            # (multi- and uni-modal generations differ 2x), so when the
            # traced call is FASTER than that mean, its own wall is the
            # honest denominator (round-5: traced answer 4.31 s at 98%
            # device vs a 5.36 s mean would have read as 79%).
            cap_wall = min(cap_rec["wall_s"],
                           cap_rec.get("steady_wall_s") or cap_rec["wall_s"])
            ans_wall = min(ans_rec["wall_s"],
                           ans_rec.get("steady_wall_s") or ans_rec["wall_s"])
            frac_cap = min(1.0, cap_rec["device_s"] / cap_wall)
            frac_ans = min(1.0, ans_rec["device_s"] / ans_wall)
            DEV, HOST = 2.46 * 4, 10.0

            def split(total, frac):
                return total * (frac / DEV + (1.0 - frac) / HOST)

            answer_tot = (warm_adj.get("answer.retrieval", 0.0)
                          + warm_adj.get("answer.generate", 0.0)
                          + ans_other_adj)
            pm = split(warm_adj.get("caption", 0.0), frac_cap)
            pm += split(warm_adj.get("summarize", 0.0), frac_cap)
            pm += split(answer_tot, frac_ans)
            pm += warm_adj.get("ingest", 0.0) / 12.0
            pm += warm_adj.get("dedup", 0.0) / 8.0 + mem_other_adj / 8.0
            pm += (warm_adj.get("history", 0.0) + warm_adj.get("store", 0.0)
                   + warm_adj.get("qembed", 0.0)) / HOST
            pm += max(0.0, wall - attributed) / HOST + pcie_s
            pm += nq * (split(judge_row, frac_ans) + stage3_row / HOST)
            report["projection"]["v5p8_hours_dp4_measured"] = round(
                pm / nq * 2500 / 3600, 2
            )
            report["projection"]["measured_split"] = {
                "caption_device_frac": round(frac_cap, 3),
                "answer_device_frac": round(frac_ans, 3),
                "device_ratio": DEV, "host_ratio": HOST,
            }


if __name__ == "__main__":
    sys.exit(main())
