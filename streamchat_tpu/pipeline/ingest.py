"""Frame ingest: decode -> preprocess -> batched ViT encode.

Device half of `video_reader_thread_with_embedding`
(inference_streaming_longva_v2.py:454-531): the whole segment is encoded in
one batched `encode_images` call (the reference already batches this; we
additionally preprocess on device and optionally run the selective-stacking
dedup kernel over the resulting features).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from streamchat_tpu.config import VideoConfig
from streamchat_tpu.ops.dedup import frame_descriptors, select_changed_frames
from streamchat_tpu.pipeline.preprocess import preprocess_frames
from streamchat_tpu.video.reader import sample_frame_indices


def segment_indices(reader, start_s, end_s, cfg: VideoConfig, chunk_size: int):
    """Frame indices for a [start_s, end_s) segment (for prefetch scheduling)."""
    return sample_frame_indices(
        start_s,
        end_s,
        reader.frame_rate,
        reader.total_frames,
        cfg.sample_rate,
        chunk_size,
        cfg.frame_cap,
        cfg.frame_cap_trigger,
    )


def encode_segment(
    model,
    reader,
    start_s: float,
    end_s: float,
    cfg: VideoConfig,
    chunk_size: int,
    max_batch: int | None = None,
) -> jnp.ndarray:
    """Encode a [start_s, end_s) segment -> features [N, P, D] (bf16).

    `model` provides `encode_images(pixels[N,3,S,S]) -> [N, P, D]`
    (LongVA.encode_images). Batched in `max_batch` slices to bound HBM for
    long segments; XLA reuses one compiled program per slice shape.
    max_batch defaults to cfg.ingest_batch (128 is the measured v5e
    throughput optimum — bench.py; larger batches are SLOWER, CLAUDE.md).
    """
    if max_batch is None:
        max_batch = cfg.ingest_batch
    indices = segment_indices(reader, start_s, end_s, cfg, chunk_size)
    if not indices:
        return jnp.zeros((0, 1, 1), jnp.bfloat16)
    frames = reader.read_frames(indices)                   # [N, H, W, 3] u8
    if frames.shape[0] == 0:
        return jnp.zeros((0, 1, 1), jnp.bfloat16)

    feats = []
    for i in range(0, frames.shape[0], max_batch):
        batch = frames[i : i + max_batch]
        # Pad every batch up to a 16-multiple (tail batches to max_batch when
        # the segment spans several) so segment lengths that vary per
        # breakpoint reuse a handful of compiled ViT programs instead of
        # compiling one per distinct N (ViT-L compiles are minutes-scale
        # through the remote-compile tunnel).
        valid = batch.shape[0]
        target = max_batch if frames.shape[0] > max_batch else min(
            max_batch, max(16, ((valid + 15) // 16) * 16)
        )
        if valid < target:
            pad = np.zeros((target - valid,) + batch.shape[1:], batch.dtype)
            batch = np.concatenate([batch, pad], axis=0)
        pixels = preprocess_frames(jnp.asarray(batch), cfg.image_size)
        feats.append(model.encode_images(pixels)[:valid])
    return jnp.concatenate(feats, axis=0)


def dedup_segment(
    features: jnp.ndarray, threshold: float
) -> jnp.ndarray:
    """Selective frame stacking: keep scene-change frames.

    Feature-space replacement for the reference's optical-flow test
    (utiles.py:89-248); threshold 0 disables (the v0.3 benchmark path uses
    plain uniform sampling).
    """
    if threshold <= 0.0 or features.shape[0] == 0:
        return features
    keep = select_changed_frames(
        frame_descriptors(features), threshold=threshold
    )
    idx = np.flatnonzero(np.asarray(keep))
    return jnp.take(features, jnp.asarray(idx), axis=0)
