"""Question answering at a breakpoint.

Rebuilds `longva_inference_with_embedding_multi_modal`
(inference_streaming_longva_v2.py:164-264): tree retrieval, prompt assembly
with the retrieved-dialogue history and the "most fine-grained" caption,
embedding splice of [short | long] visual memory at `<image>`, and a
KV-cached generate (the reference runs `use_cache=False`).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Tuple

import jax.numpy as jnp

from streamchat_tpu.config import SamplingConfig
from streamchat_tpu.memory.tree import VisualMemoryTree
from streamchat_tpu.pipeline import prompts


@dataclasses.dataclass
class AnswerResult:
    output: str
    process_time: float          # retrieval + prompt assembly (reference :160)
    generate_time: float
    # Teacher-forced label scoring (--ppl): mean NLL and perplexity of the
    # ground-truth answer under the same spliced prompt. The reference parses
    # args.ppl into its inference call (inference_streaming_longva_v2.py:
    # 908-910) but its bookkeeping is commented out; here the numbers are
    # actually produced and persisted.
    nll: Optional[float] = None
    ppl: Optional[float] = None
    # Host-side sub-step attribution of the retrieval half (round-5 answer
    # dispatch diet): embed_query / tree.search / budget+assembly seconds.
    timings: Optional[dict] = None


def answer_question(
    question: str,
    model,                        # LongVA facade
    embed_query,                  # Callable[[str], [E] array] (colbert CLS)
    short_memory: jnp.ndarray,    # [R, P, D]
    tree: Optional[VisualMemoryTree],
    history_prompt: Optional[str],
    sampling: SamplingConfig,
    conv_mode: str = "qwen_1_5",
    ppl_target: Optional[str] = None,
) -> AnswerResult:
    t0 = time.time()
    short_flat = short_memory.reshape(-1, short_memory.shape[-1])

    most_fine_grad_text: Optional[str] = None
    # Visual blocks ride UNCONCATENATED into splice_prompt, which fuses
    # them into its single concatenate — the former eager
    # long-levels-then-[short|long] concats cost two ~50-90 ms relay
    # dispatches per answer (round-5 dispatch diet; the budget logic below
    # needs only shapes, no device ops).
    blocks: List[jnp.ndarray] = [short_flat]
    t_embed = t_search = 0.0
    if tree is not None and len(tree) > 0:
        te = time.time()
        q_emb = embed_query(question)
        t_search = time.time()
        t_embed = t_search - te
        feats, texts = tree.search(q_emb)
        t_search = time.time() - t_search
        if feats:
            flat_levels = [f.reshape(-1, f.shape[-1]) for f in feats]
            budget = sampling.max_visual_tokens
            if budget is not None:
                # Drop the COARSEST levels first (search returns coarse ->
                # fine); short memory and the finest level always survive.
                keep: List[jnp.ndarray] = []
                used = short_flat.shape[0]
                for f in reversed(flat_levels):        # fine -> coarse
                    if keep and used + f.shape[0] > budget:
                        break
                    keep.append(f)
                    used += f.shape[0]
                flat_levels = list(reversed(keep))
            most_fine_grad_text = texts[-1]
            blocks = [short_flat] + flat_levels

    qs = prompts.build_answer_prompt(question, history_prompt, most_fine_grad_text)
    prompt = prompts.wrap_user_turn(conv_mode, qs)
    t1 = time.time()

    output = model.generate_with_image_embedding(
        prompt,
        image_embeddings=[blocks],
        max_new_tokens=sampling.max_answer_tokens,
        temperature=sampling.temperature,
        top_p=sampling.top_p,
    )
    t2 = time.time()
    nll, ppl = _maybe_score(model, prompt, [blocks], ppl_target)
    return AnswerResult(
        output, t1 - t0, t2 - t1, nll=nll, ppl=ppl,
        timings={"embed_query_s": round(t_embed, 4),
                 "tree_search_s": round(t_search, 4),
                 "assemble_s": round(t1 - t0 - t_embed - t_search, 4)},
    )


def _maybe_score(model, prompt, image_embeddings, ppl_target):
    if ppl_target is None:
        return None, None
    return model.score_with_image_embedding(prompt, ppl_target, image_embeddings)


def answer_question_unimodal(
    question: str,
    model,
    short_memory: jnp.ndarray,
    tree: Optional[VisualMemoryTree],
    history_prompt: Optional[str],
    sampling: SamplingConfig,
    conv_mode: str = "qwen_1_5",
    ppl_target: Optional[str] = None,
) -> AnswerResult:
    """Uni-modal variant (`longva_inference_with_embedding`, reference
    :89-162): no caption text in the prompt, feature-space tree search with
    query = [question embeddings | short memory], 512-token budget."""
    t0 = time.time()
    short_flat = short_memory.reshape(-1, short_memory.shape[-1])
    q_emb = model.embed_text(question)

    blocks: List[jnp.ndarray] = [short_flat]
    if tree is not None and len(tree) > 0:
        feats = tree.search_features(
            jnp.concatenate([q_emb.astype(short_flat.dtype), short_flat], axis=0)
        )
        if feats:
            blocks = [short_flat] + [f.reshape(-1, f.shape[-1]) for f in feats]

    qs = prompts.build_answer_prompt_unimodal(question, history_prompt)
    prompt = prompts.wrap_user_turn(conv_mode, qs)
    t1 = time.time()
    output = model.generate_with_image_embedding(
        prompt,
        image_embeddings=[blocks],
        max_new_tokens=sampling.max_answer_tokens_unimodal,
        temperature=sampling.temperature,
        top_p=sampling.top_p,
    )
    t2 = time.time()
    nll, ppl = _maybe_score(model, prompt, [blocks], ppl_target)
    return AnswerResult(output, t1 - t0, t2 - t1, nll=nll, ppl=ppl)


def make_captioner(model, sampling: SamplingConfig):
    """Chunk features [T, P, D] -> caption text (updating_memory_buffer's
    captioning generate, utiles.py:539-556; conv qwen_1_5_ego, 128 tokens,
    temperature 0.1)."""
    prompt = prompts.build_caption_prompt()

    def caption(chunk_features: jnp.ndarray) -> str:
        flat = chunk_features.reshape(-1, chunk_features.shape[-1])
        return model.generate_with_image_embedding(
            prompt,
            image_embeddings=[flat],
            max_new_tokens=sampling.max_caption_tokens,
            temperature=sampling.caption_temperature,
            # Captions are fixed-size (whole chunks of chunk_size frames):
            # fine 128-token buckets give ONE stable shape regardless of the
            # model's coarse prompt_bucket (which serves the answers' varying
            # retrieval sizes).
            bucket=128,
        )

    def caption_batch(chunks: List[jnp.ndarray]) -> List[str]:
        """Caption several chunks in ONE batched generate (sampling.
        caption_batch > 1): one prefill + one fused decode loop; decode
        weight reads amortize across the batch."""
        flats = [c.reshape(-1, c.shape[-1]) for c in chunks]
        return model.generate_with_image_embedding_batch(
            [prompt] * len(flats),
            [[f] for f in flats],
            max_new_tokens=sampling.max_caption_tokens,
            temperature=sampling.caption_temperature,
            bucket=128,
        )

    caption.batch = caption_batch
    caption.batch_size = max(1, sampling.caption_batch)
    return caption


def make_summarizer(model, sampling: SamplingConfig):
    """Caption list -> merged summary (text-only generate with the ordinal
    prompt, utiles.py:505-523, 256 tokens)."""

    def summarize(captions: List[str]) -> str:
        prompt = prompts.build_summary_prompt(captions)
        return model.generate_with_image_embedding(
            prompt,
            image_embeddings=None,
            max_new_tokens=sampling.max_summary_tokens,
            temperature=sampling.caption_temperature,
        )

    return summarize
