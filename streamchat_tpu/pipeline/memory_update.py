"""Per-segment memory update: short-term sampling + long-term tree growth.

Rebuilds `updating_memory_buffer` (inference_streaming_longva_v2.py:267-378):
  1. Short memory: the segment's last `short_window` frames, sampled down to
     `remember_window` via the Ebbinghaus curve (:319-337). Note the
     reference samples from the CURRENT segment's bank, not a persistent
     FIFO — short memory resets every breakpoint; reproduced here.
  2. Long memory: the segment's features chunked by `chunk_size`; each chunk
     captioned by the LLM; chunks entered as depth-0 tree nodes with a
     summarize-splice when due (memory/tree.py).

Deviation (documented): the reference guards per-chunk k-means with
`len(chunk) > chunk_size` (inference_streaming_longva_v2.py:347), which is
never true for slices of size <= chunk_size — so v0.3 effectively stores RAW
chunk features (up to [40, 576, 4096] per node) and only clusters at merge
time. That is an evident off-by-intent bug (the inline comment says "the
last one doesn't need clustering") and costs ~8x memory and prompt length.
We implement the stated intent: full chunks are clustered to `num_clusters`
centroids, the partial tail chunk is kept raw. Set
`cluster_full_chunks=False` to reproduce the literal reference behavior.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from streamchat_tpu.config import MemoryConfig
from streamchat_tpu.memory.tree import VisualMemoryTree
from streamchat_tpu.ops.forgetting import select_short_memory
from streamchat_tpu.ops.kmeans import weighted_kmeans_feature
from streamchat_tpu.ops.pooling import compress_spatial_features

# Caption a chunk of frame features [T, P, D] -> text.
CaptionFn = Callable[[jnp.ndarray], str]

# Measured host<->device transport spent on chunk offloading, accumulated
# per process and resettable by drivers (scripts/e2e_7b_geometry.py reads
# this per warm video). Through the axon relay these transfers are the
# dominant heavy-segment cost (measured: ~6.4 s device_put + ~8-10 s
# device_get per 165 MB chunk-40 slab ~ 25/2 MB/s); on a host-attached
# deployment the same bytes ride PCIe at >=8 GB/s (~0.04 s round trip), so
# projections substitute byte-accurate PCIe costs for these measured
# seconds. Keeping the totals measured (not inferred) is what makes that
# substitution defensible.
OFFLOAD_STATS = {"h2d_s": 0.0, "d2h_s": 0.0, "chunks": 0, "bytes": 0}


def reset_offload_stats() -> dict:
    """Return a copy of the accumulated stats and zero the accumulator."""
    out = dict(OFFLOAD_STATS)
    for k in OFFLOAD_STATS:
        OFFLOAD_STATS[k] = 0
    return out


def build_short_memory(
    features: jnp.ndarray, cfg: MemoryConfig, key: jax.Array
) -> jnp.ndarray:
    """[N, P, D] segment features -> [R, P, D] short memory."""
    n = features.shape[0]
    if n == 0:
        raise ValueError("empty segment: no short memory "
                         "(reference asserts at :371)")
    window = features[-cfg.short_window :] if n > cfg.short_window else features
    r = min(cfg.remember_window, window.shape[0])
    if window.shape[0] <= r:
        return window
    return select_short_memory(key, window, r, cfg.tau)


def chunk_and_cluster(
    features: jnp.ndarray,
    cfg: MemoryConfig,
    key: jax.Array,
    cluster_full_chunks: bool = True,
    offload: bool = False,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Split [N, P, D] into chunk_size chunks.

    Returns (raw_chunks, node_features): captions are generated from the RAW
    chunk (reference passes chunked_feature_list to the captioner,
    utiles.py:539-556) while the tree node stores the clustered centroids
    (see module docstring for the reference discrepancy).

    `offload=True` parks each raw chunk in host RAM AS IT IS CUT — the
    device never holds the feature stack and its chunk copies at once
    (near-clamp ~840-frame segments: the stack alone is ~3.5 GB at 7B
    geometry, and doubling it OOMs the chip)."""
    n = features.shape[0]
    raw: List[jnp.ndarray] = []
    node: List[jnp.ndarray] = []
    keys = jax.random.split(key, max(1, (n + cfg.chunk_size - 1) // cfg.chunk_size))
    for j, i in enumerate(range(0, n, cfg.chunk_size)):
        chunk = features[i : i + cfg.chunk_size]
        if offload:
            t0 = time.perf_counter()
            host_chunk = jax.device_get(chunk)
            OFFLOAD_STATS["d2h_s"] += time.perf_counter() - t0
            OFFLOAD_STATS["chunks"] += 1
            OFFLOAD_STATS["bytes"] += host_chunk.nbytes
            raw.append(host_chunk)
        else:
            raw.append(chunk)
        if (
            cluster_full_chunks
            and chunk.shape[0] >= cfg.chunk_size
            and chunk.shape[0] > cfg.num_clusters
        ):
            centroids, _ = weighted_kmeans_feature(chunk, cfg.num_clusters, keys[j])
            node.append(centroids)
        else:
            node.append(chunk)
    return raw, node


def update_memory(
    features,                     # [N, P, D] array, or a 1-element list box
    tree: Optional[VisualMemoryTree],
    caption_fn: CaptionFn,
    cfg: MemoryConfig,
    key: jax.Array,
    cluster_full_chunks: bool = True,
    residents=None,               # utils/offload.WeightOffloader or None
) -> Tuple[VisualMemoryTree, jnp.ndarray]:
    """One segment's memory update. Returns (tree, short_memory [R, P, D]).

    `tree` must already be constructed (the runner owns embed/summarize/merge
    wiring); passing the same tree across segments accumulates long memory
    within a video, as the reference does (long_memory_tree spans segments,
    reset per video at :835).

    `features` may be passed as a 1-element list; it is popped, making this
    frame the stack's only owner so `del` after chunking actually frees the
    ~1 GB of HBM the long caption prefills need (a caller-held reference
    would pin it).

    `residents` (a WeightOffloader over the ViT/projector/embedder trees)
    is offloaded to host RAM for the duration of the caption loop — none of
    those weights are touched until `tree.add_chunks` re-embeds the new
    captions — and restored just before that call. This is what lets
    caption_batch=2 at chunk_size=40 fit one 16 GB chip (see
    utils/offload.py).
    """
    if isinstance(features, list):
        features = features.pop()
    if cfg.compress_rate > 1:
        features = compress_spatial_features(features, cfg.compress_rate)
    k1, k2 = jax.random.split(key)
    short = build_short_memory(features, cfg, k1)
    # Raw chunks park in host RAM until each one's caption runs when
    # offload_chunks is set (at chunk_size=40 / 7B geometry the chunk
    # copies alone are ~1 GB of HBM, needed simultaneously with the
    # 23k-token caption prefill), or automatically when the segment exceeds
    # offload_chunks_over sampled frames (near-clamp heavy tails: the
    # ~3.5 GB stack + its chunk copies cannot coexist on-chip). The offload
    # happens chunk-by-chunk DURING cutting so stack + copies never
    # coexist; each chunk rides back inside its caption's splice.
    offload = cfg.offload_chunks or (
        cfg.offload_chunks_over is not None
        and features.shape[0] > cfg.offload_chunks_over
    )
    raw_chunks, node_feats = chunk_and_cluster(
        features, cfg, k2, cluster_full_chunks, offload=offload)
    del features  # chunk copies + short memory carry everything needed
    # Caption group-by-group and release each raw chunk as soon as its
    # caption exists — at v0.3 settings the raw chunks total ~1 GB of HBM
    # at 7B geometry, and each long caption prefill needs that room.
    # Captioners may expose a `.batch` method (answer.make_captioner) with a
    # `.batch_size`; group size 1 reproduces the reference's strictly
    # sequential captioning.
    batch_fn = getattr(caption_fn, "batch", None)
    group_size = getattr(caption_fn, "batch_size", 1)
    if batch_fn is None:
        group_size = 1
    if residents is not None:
        # The caption loop is decoder-only; every other weight tree idles.
        residents.offload()
    groups: List[List] = [
        raw_chunks[i : i + group_size]
        for i in range(0, len(raw_chunks), group_size)
    ]
    del raw_chunks
    captions: List[str] = []
    # Offloaded chunks ride host->device just-in-time, on the MAIN thread,
    # with the device otherwise idle. Measured on the relay
    # (scripts/probe_put.py): a 165 MB device_put costs only ~0.11 s when the
    # device is idle, but ~3.5 s when overlapped with in-flight compute — and
    # it stalls that compute too (overlapped total 3.8 s vs 0.57 s serial).
    # A double-buffering worker thread (tried in run B3) therefore made every
    # caption SLOWER (warm caption total 162 s -> 262 s): on this 1-core host
    # the staging thread contends for the GIL with the decode dispatch loop,
    # and the relay serializes the transfer against the caption's programs.
    # Strictly serialize H2D with compute; one group device-resident at once.
    for gi in range(len(groups)):
        offloaded_group = groups[gi] and not isinstance(
            groups[gi][0], jnp.ndarray)
        t0 = time.perf_counter()
        cur = [jax.device_put(c) for c in groups[gi]]
        if offloaded_group:
            # Block the H2D before dispatching the caption: an async put
            # left in flight overlaps the caption's prefill dispatch, and
            # the relay serializes transfers against in-flight compute
            # (probe_put.py: overlapped 3.8 s vs 0.57 s serial) — the
            # round-5 heavy-tail run measured captions at 10-20 s vs their
            # 4.01 s steady cost from exactly this. Blocking also makes
            # the OFFLOAD_STATS h2d timing true. Non-offloaded chunks are
            # already device-resident — blocking there only serializes
            # host dispatch against the cutting compute for nothing
            # (measured ~+10 s/video on the regular geometries).
            jax.block_until_ready(cur)
            OFFLOAD_STATS["h2d_s"] += time.perf_counter() - t0
            OFFLOAD_STATS["bytes"] += sum(c.nbytes for c in cur)
        groups[gi] = None   # drop the host copy
        if len(cur) == 1:
            captions.append(caption_fn(cur[0]))
        else:
            captions.extend(batch_fn(cur))
        del cur
    if residents is not None:
        # add_chunks embeds the captions (tree_embedder) and the next
        # ingest needs the ViT back; the device is quiet right now, which
        # is the cheap moment to issue the H2D puts (probe_put.py: puts
        # overlapped with in-flight compute serialize badly on the relay).
        residents.restore()
    tree.add_chunks(node_feats, captions)
    return tree, short
