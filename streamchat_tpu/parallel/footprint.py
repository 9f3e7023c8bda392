"""Per-shard HBM footprint planning for TP serving deployments.

Everything here is computed from ABSTRACT shapes (`jax.eval_shape`) —
nothing is materialized, so a 7B plan costs milliseconds on any backend.
It certifies deployment claims that exceed the one attached chip (PARITY.md
known gap: batch-2 chunk-40 captioning needs tp=2 or a 95 GB v5p) with the
real parameter pytrees and the real TP PartitionSpecs instead of hand
arithmetic.

The reference hand-places its two GPU replicas by module name
(inference_streaming_longva_v2.py:91-108, device_map) and trusts the
placement; here the budget is computed over the same trees the sharded
runtime actually uses (parallel/sharding.py), so the plan cannot drift
from the code.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from streamchat_tpu.config import BertConfig, DecoderConfig, ViTConfig
from streamchat_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _leaf_shard_bytes(leaf, spec, axis_sizes: Dict[str, int]) -> int:
    """Bytes of one leaf's largest shard under `spec`.

    `spec` is a PartitionSpec (or None = replicated); each entry may be an
    axis name, a tuple of axis names, or None. Uneven divisions take the
    ceiling — that IS the largest shard XLA places.
    """
    if leaf is None:
        return 0
    dims = list(leaf.shape)
    entries = tuple(spec) if spec is not None else ()
    for i, entry in enumerate(entries):
        if entry is None:
            continue
        axes = entry if isinstance(entry, tuple) else (entry,)
        div = math.prod(axis_sizes.get(a, 1) for a in axes)
        dims[i] = -(-dims[i] // div)
    return math.prod(dims) * jnp.dtype(leaf.dtype).itemsize


def tree_shard_bytes(shapes: Any, specs: Any, axis_sizes: Dict[str, int]) -> int:
    """Sum per-shard bytes over a ShapeDtypeStruct tree + matching spec tree.

    `specs=None` means fully replicated (every leaf pays full size).
    """
    if specs is None:
        leaves = jax.tree.leaves(shapes)
        return sum(_leaf_shard_bytes(l, None, axis_sizes) for l in leaves)
    total = [0]

    def acc(leaf, spec):
        total[0] += _leaf_shard_bytes(leaf, spec, axis_sizes)

    jax.tree.map(acc, shapes, specs, is_leaf=lambda x: x is None)
    return total[0]


def paged_pool_plan(
    cfg: DecoderConfig,
    batch: int,
    ctx: int,
    max_new: int,
    *,
    page_size: int = 128,
    kv_int8: bool = True,
    tp: int = 1,
) -> Dict[str, int]:
    """Per-shard bytes of the partitioned paged-KV pool generate_paged sizes.

    Mirrors `models/generate_paged._generate_paged_split` exactly: pad the
    prompt to the chunked-prefill alignment, round each row's pages to whole
    sequential-pool kernel blocks (ops/paged_attention.seq_pool_block), and
    partition the pool statically across rows. KV heads shard over the model
    axis (parallel/sharding.kv_cache_pspecs), so tp divides the head dim.
    """
    from streamchat_tpu.models.generate import CHUNKED_PREFILL_THRESHOLD
    from streamchat_tpu.ops.paged_attention import seq_pool_block

    align = (
        math.lcm(page_size, 128) if ctx > CHUNKED_PREFILL_THRESHOLD
        else page_size
    )
    s_pad = -(-ctx // align) * align
    maxp = -(-(s_pad + max_new) // page_size)
    blk = seq_pool_block(maxp)
    maxp = -(-maxp // blk) * blk
    pool_pages = batch * maxp
    hkv_shard = -(-cfg.num_kv_heads // tp)
    cell = pool_pages * hkv_shard * page_size
    if kv_int8:
        kv_bytes = 2 * cfg.num_layers * cell * cfg.head_dim        # int8 k+v
        kv_bytes += 2 * cfg.num_layers * cell * 4                  # f32 scales
    else:
        kv_bytes = 2 * cfg.num_layers * cell * cfg.head_dim * 2    # bf16 k+v
    return {
        "pages_per_row": maxp,
        "pool_pages": pool_pages,
        "bytes_per_shard": kv_bytes,
    }


def plan_caption_serving(
    *,
    tp: int = 2,
    batch: int = 2,
    ctx: int = 23296,
    max_new: int = 128,
    quantized: str = "int8",
    kv_int8: bool = True,
    with_residents: bool = True,
    hbm_gib: float = 15.0,
) -> Dict[str, Any]:
    """Per-shard HBM budget for TP batched captioning at full 7B geometry.

    ctx=23296 is the measured chunk-40 caption prompt length (2x the 11648
    chunk-20 prompt; E2E_7B_CHUNK40.json). Residents are the models the
    pipeline keeps device-side between captions: ViT-L bf16 (TP-sharded via
    vit_pspecs), the mm projector, and the two retrieval embedders
    (replicated — they are small and their batches are latency-bound).
    """
    from streamchat_tpu.models import decoder, embedder, projector, vit
    from streamchat_tpu.ops.quant import quantize_decoder_params
    from streamchat_tpu.parallel.sharding import (
        decoder_pspecs,
        projector_pspecs,
        vit_pspecs,
    )

    axis_sizes = {MODEL_AXIS: tp, DATA_AXIS: 1}
    cfg = DecoderConfig.qwen2_7b()

    def dec_shapes():
        params = decoder.init(jax.random.key(0), cfg, jnp.bfloat16)
        if quantized == "bf16":
            return params
        return quantize_decoder_params(params, bits=4 if quantized == "int4"
                                       else 8)

    dec = jax.eval_shape(dec_shapes)
    dec_specs = decoder_pspecs(
        cfg, quantized={"int8": True, "int4": "int4", "bf16": False}[quantized]
    )
    sections = {
        "decoder": tree_shard_bytes(dec, dec_specs, axis_sizes),
        "kv_pool": paged_pool_plan(
            cfg, batch, ctx, max_new, kv_int8=kv_int8, tp=tp
        )["bytes_per_shard"],
    }
    if with_residents:
        vcfg = ViTConfig()
        vshapes = jax.eval_shape(
            lambda: vit.init(jax.random.key(0), vcfg, jnp.bfloat16)
        )
        sections["vit"] = tree_shard_bytes(
            vshapes, vit_pspecs(vcfg.num_layers), axis_sizes
        )
        pshapes = jax.eval_shape(
            lambda: projector.init(
                jax.random.key(0), vcfg.hidden_size, cfg.hidden_size,
                jnp.bfloat16,
            )
        )
        sections["projector"] = tree_shard_bytes(
            pshapes, projector_pspecs(), axis_sizes
        )
        for name, bcfg in (
            ("embedder_colbert", BertConfig.mxbai_colbert_large()),
            ("embedder_minilm", BertConfig.minilm_l6()),
        ):
            eshapes = jax.eval_shape(
                lambda c=bcfg: embedder.init(jax.random.key(0), c, jnp.bfloat16)
            )
            sections[name] = tree_shard_bytes(eshapes, None, axis_sizes)

    total = sum(sections.values())
    budget = int(hbm_gib * 2**30)
    return {
        "config": {
            "tp": tp, "batch": batch, "ctx": ctx, "max_new": max_new,
            "weights": quantized, "kv_int8": kv_int8,
            "residents_on_chip": with_residents,
        },
        "per_shard_bytes": dict(sections),
        "per_shard_total_bytes": total,
        "per_shard_total_gib": round(total / 2**30, 3),
        "hbm_budget_gib": hbm_gib,
        "headroom_gib": round((budget - total) / 2**30, 3),
        "fits": total < budget,
    }
