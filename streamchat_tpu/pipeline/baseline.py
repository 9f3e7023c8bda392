"""Memory-free LongVA baseline on StreamBench.

Port of the reference's baseline runner
(`test_other_models/streambench/inference_ego_streaming_longva.py`): per
breakpoint, uniformly sample `num_frame` frames from the video's [0, t)
prefix, encode them all, and answer in one multimodal generate — no
selective stacking, no memory tree, no dialogue memory. This is SURVEY.md
§7's "minimum end-to-end slice" and the ablation floor that the memory
pipeline must beat.
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
    model, reader, question: str, end_s: float, num_frame: int,
    *, conv_mode: str = "qwen_1_5", temperature: float = 0.2,
    max_new_tokens: int = 256,
) -> str:
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
    with open(args.annotations, encoding="utf-8") as f:
        annotations = json.load(f)
    if not os.path.exists(args.save_file):
        json.dump([], open(args.save_file, "w", encoding="utf-8"))
    for count, anno in enumerate(annotations):
        if args.num_chunks > 1 and count % args.num_chunks != args.chunk_idx:
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
                model, reader, q["question"], int(q["time"]), args.num_frame,
                conv_mode=args.conv_mode, temperature=args.temperature,
            )
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


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Memory-free LongVA baseline")
    p.add_argument("--video_dir", required=True)
    p.add_argument("--annotations", required=True)
    p.add_argument("--save_file", required=True)
    p.add_argument("--model_name", default=None)
    p.add_argument("--num_frame", type=int, default=8)
    p.add_argument("--conv-mode", dest="conv_mode", default="qwen_1_5")
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--num_chunks", type=int, default=1)
    p.add_argument("--chunk_idx", type=int, default=0)
    args = p.parse_args(argv)

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
