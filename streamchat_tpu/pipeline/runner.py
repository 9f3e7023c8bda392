"""Benchmark orchestrator: the `run_inference` loop and CLI.

Rebuilds `inference_streaming_longva_v2.py:48-87 (flags), 680-934 (loop)`:
iterate StreamBench annotations; per video, reset the visual memory tree and
open a per-video dialogue memory store; per breakpoint segment: ingest ->
memory update -> dialogue retrieval -> answer -> result sink append ->
memory write-back + re-index.

Differences by design (SURVEY.md §7):
  * ONE model serves answering and captioning (the reference loads the same
    checkpoint onto two 80 GB GPUs, :697-700).
  * Annotation-level data-parallel sharding via --num_chunks/--chunk_idx is
    built into the runner itself (the reference only shards the judge stage
    through the driver shell).
  * The results file is appended and rewritten per question exactly like the
    reference (:637-675) so crash-resume semantics match (--start skips
    already-processed annotations, :740-757).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax

from streamchat_tpu.config import MemoryConfig, PipelineConfig, SamplingConfig, VideoConfig
from streamchat_tpu.memory.bank import MemoryBank
from streamchat_tpu.memory.tree import VisualMemoryTree
from streamchat_tpu.ops.kmeans import weighted_kmeans_feature
from streamchat_tpu.pipeline import prompts
from streamchat_tpu.pipeline.answer import (
    answer_question,
    answer_question_unimodal,
    make_captioner,
    make_summarizer,
)
from streamchat_tpu.pipeline.ingest import dedup_segment, encode_segment
from streamchat_tpu.pipeline.memory_update import update_memory
from streamchat_tpu.utils.logging import get_logger
from streamchat_tpu.video.reader import open_video

log = get_logger("runner")


class StreamChatPipeline:
    """Wires models + memory + prompts into the per-video streaming loop."""

    def __init__(
        self,
        model,                    # LongVA facade (answerer AND captioner)
        tree_embedder,            # TextEmbedder (colbert CLS) for tree search
        bank_embedder,            # TextEmbedder (MiniLM mean) for dialogue
        cfg: PipelineConfig,
    ):
        self.model = model
        self.tree_embedder = tree_embedder
        self.bank_embedder = bank_embedder
        # The vision tower's input size is authoritative — a config mismatch
        # would feed wrongly-shaped pixel batches into the patch embedding.
        if cfg.video.image_size != model.vit_cfg.image_size:
            import dataclasses as _dc

            cfg = cfg.replace(
                video=_dc.replace(cfg.video, image_size=model.vit_cfg.image_size)
            )
        self.cfg = cfg
        self._caption = make_captioner(model, cfg.sampling)
        self._summarize = make_summarizer(model, cfg.sampling)
        # Caption-phase resident offload (utils/offload.py): park the
        # ViT/projector/embedder trees host-side while the decoder runs the
        # long caption prefills. Opt-in — it buys the ~1.3 GB margin that
        # caption_batch>1 at chunk_size=40 needs on one 16 GB chip.
        self.residents = None
        if cfg.memory.offload_residents:
            from streamchat_tpu.utils.offload import WeightOffloader

            self.residents = (
                WeightOffloader()
                .register("vit", model, "vit_params")
                .register("projector", model, "proj_params")
                .register("tree_embedder", tree_embedder, "params")
                .register("bank_embedder", bank_embedder, "params")
            )
        self._key = jax.random.key(cfg.seed)
        # False reproduces the reference's literal dead k-means guard
        # (see pipeline/memory_update.py docstring).
        self.cluster_full_chunks = True
        # question -> colbert embedding, warmed per video in ONE batched
        # embed (round-5 dispatch diet: embed_query used to cost one relay
        # round trip inside every answer's retrieval).
        self._q_emb_cache = {}

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def new_tree(self) -> VisualMemoryTree:
        def merge(combined, k):
            c, _ = weighted_kmeans_feature(combined, k, self._next_key())
            return c

        return VisualMemoryTree(
            num_clusters=self.cfg.memory.num_clusters,
            interval=self.cfg.memory.interval,
            embed_fn=lambda texts: self.tree_embedder.embed(texts),
            summarize_fn=self._summarize,
            merge_fn=merge,
        )

    def embed_query(self, question: str):
        emb = self._q_emb_cache.get(question)
        if emb is None:
            emb = self.tree_embedder.embed([question])[0]
            if len(self._q_emb_cache) >= 4096:
                self._q_emb_cache.pop(next(iter(self._q_emb_cache)))
            self._q_emb_cache[question] = emb
        return emb

    def _prewarm_question_embeddings(self, breakpoints, bank: MemoryBank):
        """Batch-embed a video's questions for BOTH embedders up front: one
        colbert call (tree retrieval) + one MiniLM call (dialogue history)
        instead of two relay round trips inside every answer."""
        questions = [q["question"] for q in breakpoints if q.get("question")]
        missing = [t for t in dict.fromkeys(questions)
                   if t not in self._q_emb_cache]
        if missing and self.cfg.multi_modal_memory:
            rows = self.tree_embedder.embed(missing)
            for t, r in zip(missing, rows):
                if len(self._q_emb_cache) >= 4096:
                    self._q_emb_cache.pop(next(iter(self._q_emb_cache)))
                self._q_emb_cache[t] = r
        bank.precompute_embeddings(questions)

    def process_video(
        self,
        reader,
        breakpoints,              # [{question, answer, class, time}]
        bank: MemoryBank,
        user_name: str,
        save_file: Optional[str] = None,
    ):
        """Stream one video through its breakpoints. Returns result dicts."""
        from streamchat_tpu.pipeline.ingest import segment_indices
        from streamchat_tpu.utils.profiling import PhaseTimer
        from streamchat_tpu.video.reader import PrefetchReader

        # Time LLM summarization separately (a subset of "memory_update",
        # like "caption"): the tree calls self._summarize during add/merge.
        orig_summarize = self._summarize

        def timed_summarize(captions):
            with timer.phase("summarize"):
                return orig_summarize(captions)

        self._summarize = timed_summarize
        tree = self.new_tree()
        self._summarize = orig_summarize
        results = []
        # Annotated phases: if a jax.profiler trace is active (e2e --profile),
        # each phase window lands in the trace for per-phase device-time
        # attribution (utils.traceparse). Annotations cost ~µs when no trace
        # is running; jax is always imported by the time a video processes.
        timer = PhaseTimer(annotate=True)
        # The loop-entry index build embeds any docs already in the bank; on
        # a pre-populated bank this can compile a fresh embedder batch bucket
        # (~30 s through the relay), so attribute it like the in-loop
        # re-index instead of leaving it outside every phase.
        with timer.phase("store"):
            memory_index = bank.enter_name(user_name)
        with timer.phase("qembed"):
            self._prewarm_question_embeddings(breakpoints, bank)
        time_line = [int(q["time"]) for q in breakpoints]
        frame_line = [0] + time_line
        segments = list(zip(breakpoints, frame_line[:-1], frame_line[1:]))

        # Decode-ahead: segment i+1 reads on a host thread while segment i
        # runs memory update + answering on the device. Shut the worker down
        # at the end (one thread per video would otherwise accumulate), but
        # leave closing the underlying reader to the caller.
        prefetch = PrefetchReader(reader)
        reader = prefetch
        short_memory = None

        # Split captioning/summarization time out of memory_update (the
        # "caption" phase is a subset of "memory_update"): at 7B geometry
        # captions dominate the per-question cost, and the e2e artifact needs
        # the attribution (VERDICT r2 missing #2).
        orig_caption = self._caption

        def timed_caption(chunk):
            with timer.phase("caption"):
                return orig_caption(chunk)

        batch_fn = getattr(orig_caption, "batch", None)
        if batch_fn is not None:
            def timed_batch(chunks):
                with timer.phase("caption"):
                    return batch_fn(chunks)

            timed_caption.batch = timed_batch
            timed_caption.batch_size = getattr(orig_caption, "batch_size", 1)

        for i, (q, start_s, end_s) in enumerate(segments):
            with timer.phase("ingest"):
                features = encode_segment(
                    self.model, reader, start_s, end_s,
                    self.cfg.video, self.cfg.memory.chunk_size,
                )
            if i + 1 < len(segments):
                _, ns, ne = segments[i + 1]
                reader.schedule(segment_indices(
                    reader, ns, ne, self.cfg.video, self.cfg.memory.chunk_size
                ))
            with timer.phase("dedup"):
                features = dedup_segment(features, self.cfg.video.dedup_threshold)

            if features.shape[0] > 0:
                with timer.phase("memory_update"):
                    # Box-pass moves ownership of the segment's feature stack
                    # (~1 GB at v0.3 settings, 7B geometry) into
                    # update_memory: its internal `del features` after
                    # chunking only frees HBM if no caller frame still
                    # references the stack, and each long caption prefill
                    # needs that room.
                    box = [features]
                    features = None
                    tree, short_memory = update_memory(
                        box, tree, timed_caption, self.cfg.memory,
                        self._next_key(),
                        cluster_full_chunks=self.cluster_full_chunks,
                        residents=self.residents,
                    )
            # An empty segment (e.g. two breakpoints inside the same second)
            # still gets answered from the PREVIOUS short memory + tree,
            # like the reference, which only refreshes the buffers when the
            # bank is non-empty (:876-891). Only a video that starts with an
            # empty first segment has nothing to answer from.
            if short_memory is None:
                log.warning("segment [%s, %s) empty with no prior memory: "
                            "skipping question", start_s, end_s)
                continue

            with timer.phase("history"):
                history_prompt = self._history_prompt(memory_index, q["question"])

            with timer.phase("answer"):
                res = self._answer(q, short_memory, tree, history_prompt)
            # Attribute the answer's two halves (AnswerResult already splits
            # retrieval/prompt-assembly from the generate call) so artifacts
            # can see which side of the 7B answer dominates.
            timer.totals["answer.retrieval"] += res.process_time
            timer.totals["answer.generate"] += res.generate_time
            timer.counts["answer.retrieval"] += 1
            timer.counts["answer.generate"] += 1
            for k, v in (res.timings or {}).items():
                timer.totals[f"answer.{k}"] += v
                timer.counts[f"answer.{k}"] += 1
            with timer.phase("store"):
                memory_index = self._record_and_store(
                    results, q, end_s, res, bank, user_name, save_file
                )
        prefetch.stop()
        log.info("phase totals (s): %s", {
            k: round(v, 2) for k, v in timer.summary().items()
        })
        self.last_tree = tree   # exposed for persistence / inspection
        # Per-video phase attribution for callers/artifacts ("caption" is a
        # subset of "memory_update"; the rest of memory_update is k-means +
        # tree splicing; "answer" includes retrieval + generate).
        self.last_phase_totals = {
            k: round(v, 3) for k, v in timer.summary().items()
        }
        self.last_phase_counts = dict(timer.counts)
        return results

    def _answer(self, q, short_memory, tree, history_prompt):
        """Dispatch multi-modal vs uni-modal answering and optional label
        scoring, mirroring the reference's `args.multi_modal_memory` /
        `args.ppl` threading (inference_streaming_longva_v2.py:881,908-910 —
        where the unimodal branch and the ppl flag are parsed but the ppl
        bookkeeping is dead; here both produce live results)."""
        ppl_target = q.get("answer") if self.cfg.ppl else None
        if self.cfg.multi_modal_memory:
            return answer_question(
                q["question"], self.model, self.embed_query,
                short_memory, tree, history_prompt,
                self.cfg.sampling, self.cfg.conv_mode, ppl_target=ppl_target,
            )
        return answer_question_unimodal(
            q["question"], self.model, short_memory, tree, history_prompt,
            self.cfg.sampling, self.cfg.conv_mode, ppl_target=ppl_target,
        )

    def _history_prompt(self, memory_index, question: str):
        """Retrieved-dialogue meta prompt (reference :647 + utiles.py:1057)."""
        if memory_index is None:
            return None
        date_docs, _ = memory_index.search_memory(
            question, self.cfg.retrieval.language
        )
        if not date_docs:
            return None
        related = "\n" + "\n".join(date_docs).strip() + "\n"
        return prompts.build_history_prompt(related, self.cfg.retrieval.language)

    def _record_and_store(
        self, results, q, end_s, res, bank, user_name, save_file
    ):
        """Result-sink append + dialogue write-back/re-index (reference
        :637-675, :913-924). Returns the refreshed memory index."""
        record = {
            "time": end_s,
            "question": q["question"],
            "label": q.get("answer"),
            "predict": res.output,
            "class": q.get("class"),
            "process_time": res.process_time,
        }
        if res.nll is not None:
            record["nll"] = res.nll
            record["ppl"] = res.ppl
        results.append(record)
        if save_file:
            _append_result(save_file, record)
        bank.save_local_memory(user_name, q["question"], res.output)
        return bank.enter_name(user_name)


    def process_video_online(
        self,
        reader,
        breakpoints,
        bank: MemoryBank,
        user_name: str,
        save_file: Optional[str] = None,
    ):
        """on_line mode: memory updates run CONCURRENTLY with ingest via
        StreamingSession (the reference's live-demo thread choreography,
        previous_version/streaming_demo_llava_next_3.py:959-1000). Short
        memory is a persistent FIFO across the stream here — true streaming
        semantics — while off_line resets it per segment like the v0.3
        benchmark path."""
        from streamchat_tpu.pipeline.streaming import StreamingSession

        session = StreamingSession(
            self.new_tree(), self._caption, self.cfg.memory,
            self._next_key(), self.cluster_full_chunks,
        )
        memory_index = bank.enter_name(user_name)
        self._prewarm_question_embeddings(breakpoints, bank)
        results = []
        time_line = [int(q["time"]) for q in breakpoints]
        frame_line = [0] + time_line
        try:
            for q, start_s, end_s in zip(breakpoints, frame_line[:-1], frame_line[1:]):
                features = encode_segment(
                    self.model, reader, start_s, end_s,
                    self.cfg.video, self.cfg.memory.chunk_size,
                )
                features = dedup_segment(features, self.cfg.video.dedup_threshold)
                if features.shape[0] > 0:
                    session.push(features)
                session.flush()

                history_prompt = self._history_prompt(memory_index, q["question"])

                def answer(short, tree, q=q, history_prompt=history_prompt):
                    return self._answer(q, short, tree, history_prompt)

                # Only the genuinely-empty-stream case skips; worker errors
                # must surface (a bare except here once swallowed captioner
                # failures as "no frames").
                if len(session.short_term) == 0:
                    session.sync()   # re-raise any pending worker error
                    log.warning("no frames before breakpoint %s: skipping", end_s)
                    continue
                res = session.ask(answer)
                memory_index = self._record_and_store(
                    results, q, end_s, res, bank, user_name, save_file
                )
        finally:
            session.close()
        self.last_tree = session.tree
        return results


def _append_result(save_file: str, record: dict) -> None:
    """Read-append-rewrite, matching the reference sink (:637, 674-675)."""
    data = []
    if os.path.exists(save_file):
        with open(save_file, "r", encoding="utf-8") as f:
            data = json.load(f)
    data.append(record)
    with open(save_file, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=4)


def run_inference(pipeline: StreamChatPipeline, args) -> None:
    """Annotation loop (reference :754-934)."""
    with open(args.annotations, "r", encoding="utf-8") as f:
        all_annotations = json.load(f)

    os.makedirs(args.memory_basic_dir, exist_ok=True)
    if not os.path.exists(args.save_file):
        json.dump([], open(args.save_file, "w", encoding="utf-8"))

    for count, anno in enumerate(all_annotations):
        if count < args.start:
            continue
        # Interleaved (not contiguous) annotation sharding: per-video cost
        # varies wildly, so round-robin balances hosts better than the
        # judge's ceil-split (which we keep there for reference parity —
        # eval_video_qa_with_llama3_ours.py:69-75).
        if args.num_chunks > 1 and count % args.num_chunks != args.chunk_idx:
            continue
        memory_path = os.path.join(
            args.memory_basic_dir, f"memory_{count}.json"
        )
        bank = MemoryBank(
            memory_path,
            lambda texts: pipeline.bank_embedder.embed(texts),
            language=args.language,
            top_k=args.memory_search_top_k,
        )
        video_name = anno["info"]["video_path"]
        class_1 = anno["info"]["class_1"]
        video_path = os.path.join(args.video_dir, class_1, video_name)
        if not os.path.exists(video_path):
            log.error("video missing: %s", video_path)
            continue
        reader = open_video(video_path)
        t0 = time.time()
        process = (
            pipeline.process_video_online
            if args.mode == "on_line" else pipeline.process_video
        )
        process(
            reader, anno["breakpoint"], bank, user_name="User",
            save_file=args.save_file,
        )
        reader.close()
        if getattr(args, "save_tree_dir", None):
            # Optional visual-memory persistence — the reference keeps the
            # tree in-memory only and loses it per video (SURVEY.md §5).
            import pickle

            os.makedirs(args.save_tree_dir, exist_ok=True)
            with open(os.path.join(args.save_tree_dir, f"tree_{count}.pkl"), "wb") as f:
                pickle.dump(pipeline.last_tree.to_state(), f)
        log.info(
            "[%d/%d] %s: %d questions in %.1fs",
            count + 1, len(all_annotations), video_name,
            len(anno["breakpoint"]), time.time() - t0,
        )


def build_pipeline(cfg: PipelineConfig) -> StreamChatPipeline:
    """Construct models from cfg.paths (random tiny models when unset)."""
    from streamchat_tpu.config import BertConfig
    from streamchat_tpu.models.embedder import TextEmbedder
    from streamchat_tpu.models.longva import LongVA

    key = jax.random.key(cfg.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.paths.longva:
        model = LongVA.from_pretrained(cfg.paths.longva)
    else:
        # Random-weights mode is for plumbing tests/benches only: tiny
        # geometry keeps it fast; outputs are gibberish by construction.
        from streamchat_tpu.config import DecoderConfig, ViTConfig

        log.warning("no LongVA checkpoint: using random tiny weights")
        dec_cfg = DecoderConfig.tiny()
        model = LongVA.init_random(
            k1, ViTConfig.tiny(projection_dim=dec_cfg.hidden_size), dec_cfg
        )
    if cfg.paths.colbert:
        tree_emb = TextEmbedder.from_pretrained(cfg.paths.colbert, "cls")
    else:
        tree_emb = TextEmbedder.init_random(k2, BertConfig.tiny())
    if cfg.paths.minilm:
        bank_emb = TextEmbedder.from_pretrained(cfg.paths.minilm, "mean")
    else:
        import dataclasses as _dc

        bank_emb = TextEmbedder.init_random(
            k3, _dc.replace(BertConfig.tiny(), pooling="mean")
        )
    return StreamChatPipeline(model, tree_emb, bank_emb, cfg)


def parse_args(argv=None):
    """Reference flag surface (inference_streaming_longva_v2.py:48-87)."""
    p = argparse.ArgumentParser(description="StreamChat-TPU streaming video QA")
    p.add_argument("--video_dir", required=True)
    p.add_argument("--model_name", type=str, default=None,
                   help="LongVA checkpoint path (random tiny weights if unset)")
    p.add_argument("--conv-mode", dest="conv_mode", type=str, default="qwen_1_5")
    p.add_argument("--mode", type=str, default="off_line")
    p.add_argument("--chunk_size", type=int, default=20)
    p.add_argument("--num_clusters", type=int, default=5)
    p.add_argument("--interval", type=int, default=10)
    p.add_argument("--short_window", type=int, default=20)
    p.add_argument("--remember_window", type=int, default=5)
    p.add_argument("--tau", type=float, default=5)
    p.add_argument("--compress_rate", type=int, default=1)
    p.add_argument("--num_chunks", type=int, default=1)
    p.add_argument("--chunk_idx", type=int, default=0)
    p.add_argument("--num_frames", type=int, default=4,
                   help="accepted for reference CLI compatibility; the "
                        "streaming path derives its frame counts from "
                        "sample_rate/chunk_size exactly like the reference, "
                        "which threads this value into its inference fns "
                        "and never reads it "
                        "(inference_streaming_longva_v2.py:89,652). The "
                        "uniform-sampling baseline (pipeline/baseline.py) "
                        "is where a frame count is real.")
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--sample_rate", type=float, default=0.5)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--memory_basic_dir", type=str, required=True)
    p.add_argument("--save_file", type=str, required=True)
    p.add_argument("--annotations", type=str, required=True)
    p.add_argument("--language", type=str, default="en")
    p.add_argument("--memory_search_top_k", type=int, default=1)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--embedding_model", type=str, default=None,
                   help="mxbai-colbert checkpoint path")
    p.add_argument("--minilm_model", type=str, default=None)
    p.add_argument("--ppl", action="store_true")
    p.add_argument("--multi_modal_memory", action="store_true")
    p.add_argument("--shard", action="store_true",
                   help="tensor-parallel the model over all visible devices")
    # Int8 weight-only decode is the DEFAULT serving mode: it is what
    # bench.py reports as production (10.5 vs 19.5 ms/tok at 7B) and what
    # fits the full pipeline on one 16 GB chip. --bf16 opts out.
    p.add_argument("--int8", dest="int8", action="store_true", default=True,
                   help="int8 weight-only decoder (ops/quant.py): ~2x decode "
                        "throughput and ~half the HBM; the full pipeline at "
                        "7B geometry fits ONE 16 GB v5e chip this way "
                        "(default; see --bf16)")
    p.add_argument("--bf16", dest="int8", action="store_false",
                   help="full bf16 decoder weights (opt out of int8 serving)")
    p.add_argument("--int4", action="store_true",
                   help="group-128 int4 weight-only decoder (lm_head stays "
                        "int8): ~2x int8's decode throughput at an RTN "
                        "accuracy trade; opt-in")
    p.add_argument("--save_tree_dir", type=str, default=None,
                   help="persist each video's visual memory tree here")
    p.add_argument("--offload_chunks", action="store_true",
                   help="park raw caption chunks in host RAM until each "
                        "caption runs (frees ~1 GB of HBM for the long "
                        "caption prefills at chunk_size=40 / 7B geometry)")
    p.add_argument("--offload_residents", action="store_true",
                   help="park the idle ViT/projector/embedder weights in "
                        "host RAM during each segment's caption loop "
                        "(utils/offload.py) — buys the HBM margin that "
                        "--caption_batch 2 at chunk_size=40 needs on one "
                        "16 GB chip")
    p.add_argument("--literal_kmeans", action="store_true",
                   help="reproduce the reference's dead per-chunk k-means "
                        "guard (raw chunk features in tree nodes)")
    p.add_argument("--spec_tokens", type=int, default=0,
                   help="speculative decoding: draft tokens per verify step "
                        "(prompt-lookup drafting over the text prompt; exact "
                        "greedy / rejection-sampled verification — "
                        "models/spec_decode). 0 = off. Requires the paged "
                        "backend without a KV budget and top_p unset.")
    p.add_argument("--spec_ngram", type=int, default=3)
    return p.parse_args(argv)


def config_from_args(args) -> PipelineConfig:
    from streamchat_tpu.config import ModelPaths, RetrievalConfig

    return PipelineConfig(
        memory=MemoryConfig(
            chunk_size=args.chunk_size,
            num_clusters=args.num_clusters,
            interval=args.interval,
            short_window=args.short_window,
            remember_window=args.remember_window,
            tau=float(args.tau),
            compress_rate=args.compress_rate,
            offload_chunks=args.offload_chunks,
            offload_residents=args.offload_residents,
        ),
        sampling=SamplingConfig(
            temperature=args.temperature,
            top_p=args.top_p,
            num_beams=args.num_beams,
        ),
        video=VideoConfig(sample_rate=args.sample_rate),
        retrieval=RetrievalConfig(
            top_k=args.memory_search_top_k, language=args.language
        ),
        paths=ModelPaths(
            longva=args.model_name,
            colbert=args.embedding_model,
            minilm=args.minilm_model,
        ),
        conv_mode=args.conv_mode,
        mode=args.mode,
        multi_modal_memory=args.multi_modal_memory,
        ppl=args.ppl,
    )


def main(argv=None) -> None:
    args = parse_args(argv)
    cfg = config_from_args(args)
    pipeline = build_pipeline(cfg)
    if args.int4:
        pipeline.model.quantize(bits=4)
    elif args.int8:
        pipeline.model.quantize()
    if args.shard:
        pipeline.model.shard()
    if args.spec_tokens:
        pipeline.model.spec_tokens = args.spec_tokens
        pipeline.model.spec_ngram = args.spec_ngram
    if args.literal_kmeans:
        pipeline.cluster_full_chunks = False
    run_inference(pipeline, args)


if __name__ == "__main__":
    main()
