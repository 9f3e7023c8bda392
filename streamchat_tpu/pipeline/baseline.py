"""Memory-free LongVA baseline on StreamBench.

Two modes, both no-memory uniform-sampling LongVA answers per breakpoint:

* ``prefix`` (default): sample `num_frame` frames from the video's [0, t)
  prefix — the causally-fair streaming variant; records use the StreamChat
  result schema so `eval/judge.py --format ours` consumes them directly.
* ``ego``: the reference ego-streaming baseline VERBATIM semantics
  (`test_other_models/streambench/inference_ego_streaming_longva.py:33-39,
  186-215`): frames sampled uniformly over the WHOLE video regardless of
  the breakpoint time (the reference's `load_video(video_path, num_frm)`
  ignores `time`; it is only recorded as `id`), records written as JSONL
  rows {id, question, answer, class, pred}, annotations sharded by
  CONTIGUOUS ceil-split (`get_chunk`, :23-31) rather than interleaved,
  and the reference's sampling params (temperature 0.1, do_sample,
  max_new_tokens 256, :92-99). This is the comparison row the StreamChat
  paper is defined against.

No selective stacking, no memory tree, no dialogue memory in either mode.
This is SURVEY.md §7's "minimum end-to-end slice" and the ablation floor
that the memory pipeline must beat.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import List

import jax.numpy as jnp
import numpy as np

from streamchat_tpu.models.tokenizer import DEFAULT_IMAGE_TOKEN
from streamchat_tpu.pipeline import prompts
from streamchat_tpu.pipeline.preprocess import preprocess_frames
from streamchat_tpu.utils.logging import get_logger
from streamchat_tpu.video.reader import open_video

log = get_logger("baseline")


def uniform_indices(total_frames: int, num_frame: int, end_frame: int | None = None) -> List[int]:
    """np.linspace uniform sampling (reference load_video_longva, :33-39)."""
    hi = (end_frame if end_frame is not None else total_frames) - 1
    hi = max(hi, 0)
    return np.linspace(0, hi, num_frame, dtype=int).tolist()


def answer_baseline(
    model, reader, question: str, end_s: float | None, num_frame: int,
    *, conv_mode: str = "qwen_1_5", temperature: float = 0.2,
    max_new_tokens: int = 256,
) -> str:
    """One uniform-sampling answer. end_s=None samples the whole video
    (reference ego semantics); otherwise the [0, end_s) prefix."""
    if end_s is None:
        end_frame = reader.total_frames
    else:
        end_frame = min(reader.total_frames, int(end_s * reader.frame_rate))
    idx = uniform_indices(reader.total_frames, num_frame, end_frame)
    frames = reader.read_frames(idx)
    pixels = preprocess_frames(jnp.asarray(frames), model.vit_cfg.image_size)
    feats = model.encode_images(pixels)              # [N, P, D]
    flat = feats.reshape(-1, feats.shape[-1])
    qs = DEFAULT_IMAGE_TOKEN + "\n" + question       # reference :68
    prompt = prompts.wrap_user_turn(conv_mode, qs)
    return model.generate_with_image_embedding(
        prompt, [flat], max_new_tokens=max_new_tokens, temperature=temperature
    )


def run_baseline(model, args) -> None:
    ego = getattr(args, "ego", False)
    with open(args.annotations, encoding="utf-8") as f:
        annotations = json.load(f)
    if ego:
        # Reference get_chunk: contiguous ceil-split (:23-31).
        import math

        size = math.ceil(len(annotations) / args.num_chunks)
        annotations = annotations[
            args.chunk_idx * size : (args.chunk_idx + 1) * size
        ]
        ego_file = open(args.save_file, "w", encoding="utf-8")
    elif not os.path.exists(args.save_file):
        json.dump([], open(args.save_file, "w", encoding="utf-8"))
    for count, anno in enumerate(annotations):
        if (not ego and args.num_chunks > 1
                and count % args.num_chunks != args.chunk_idx):
            continue
        video_path = os.path.join(
            args.video_dir, anno["info"]["class_1"], anno["info"]["video_path"]
        )
        if not os.path.exists(video_path):
            log.error("missing video: %s", video_path)
            continue
        reader = open_video(video_path)
        for q in anno["breakpoint"]:
            t0 = time.time()
            output = answer_baseline(
                model, reader, q["question"],
                None if ego else int(q["time"]), args.num_frame,
                conv_mode=args.conv_mode, temperature=args.temperature,
                max_new_tokens=getattr(args, "max_new_tokens", 256),
            )
            if ego:
                # Reference sample_set schema + JSONL sink (:200,215).
                ego_file.write(json.dumps({
                    "id": q["time"],
                    "question": q["question"],
                    "answer": q.get("answer"),
                    "class": q.get("class"),
                    "pred": output,
                }) + "\n")
                ego_file.flush()
                continue
            record = {
                "time": int(q["time"]),
                "question": q["question"],
                "label": q.get("answer"),
                "predict": output,
                "class": q.get("class"),
                "process_time": time.time() - t0,
            }
            data = json.load(open(args.save_file, encoding="utf-8"))
            data.append(record)
            json.dump(data, open(args.save_file, "w", encoding="utf-8"),
                      ensure_ascii=False, indent=4)
        reader.close()
    if ego:
        ego_file.close()


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Memory-free LongVA baseline")
    p.add_argument("--video_dir", required=True)
    p.add_argument("--annotations", required=True)
    p.add_argument("--save_file", required=True)
    p.add_argument("--model_name", default=None)
    p.add_argument("--num_frame", type=int, default=8)
    p.add_argument("--conv-mode", dest="conv_mode", default="qwen_1_5")
    p.add_argument("--temperature", type=float, default=None,
                   help="default 0.2 (prefix mode) / 0.1 (ego mode, "
                        "reference :97)")
    p.add_argument("--num_chunks", type=int, default=1)
    p.add_argument("--chunk_idx", type=int, default=0)
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--ego", action="store_true",
                   help="reference ego-streaming semantics: whole-video "
                        "uniform sampling, JSONL {id,question,answer,class,"
                        "pred} records, contiguous annotation split")
    args = p.parse_args(argv)
    if args.temperature is None:
        args.temperature = 0.1 if args.ego else 0.2

    import jax

    from streamchat_tpu.config import DecoderConfig, ViTConfig
    from streamchat_tpu.models.longva import LongVA

    if args.model_name:
        model = LongVA.from_pretrained(args.model_name)
    else:
        log.warning("no checkpoint: tiny random weights")
        dec = DecoderConfig.tiny()
        model = LongVA.init_random(
            jax.random.key(0), ViTConfig.tiny(projection_dim=dec.hidden_size), dec
        )
    run_baseline(model, args)


if __name__ == "__main__":
    main()
