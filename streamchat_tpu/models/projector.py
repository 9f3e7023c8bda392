"""Multimodal projector: ViT patch features -> LM embedding space.

LongVA uses `mlp2x_gelu` (Linear 1024->4096, GELU, Linear 4096->4096);
reference registry at `longva/model/multimodal_projector/builder.py:65` and
call site `llava_arch.py:179-183` (vision_resampler is identity for LongVA).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@functools.partial(jax.jit, static_argnames=("in_dim", "out_dim", "dtype"))
def init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.bfloat16) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": {
            "w": (jax.random.normal(k1, (in_dim, out_dim)) * in_dim**-0.5).astype(dtype),
            "b": jnp.zeros((out_dim,), dtype),
        },
        "fc2": {
            "w": (jax.random.normal(k2, (out_dim, out_dim)) * out_dim**-0.5).astype(dtype),
            "b": jnp.zeros((out_dim,), dtype),
        },
    }


def apply(params: Params, features: jnp.ndarray) -> jnp.ndarray:
    """fc2(gelu(fc1(features))), fused on single-device TPU.

    The XLA path materializes the GELU's f32 intermediate
    ([128, 576, 3584] f32 = 1.06 GB per ingest batch — seen as
    convert_element_type in the round-5 ingest HLO); the Pallas
    `fused_ln_mlp` (layernorm off, erf-GELU in registers, exact to ~1e-6)
    keeps the intermediate in VMEM. Same auto-gating as the fused ViT
    path: single-device TPU only (multi-device meshes keep the per-op XLA
    form for pjit partitioning; CPU tests opt in via interpret)."""
    from streamchat_tpu.models.vit import _use_fused

    if _use_fused(None) and features.ndim >= 2:
        from streamchat_tpu.ops.fused_vit import fused_ln_mlp

        din = features.shape[-1]
        flat = features.reshape(-1, din)
        out = fused_ln_mlp(
            flat, jnp.ones((din,), features.dtype),
            jnp.zeros((din,), features.dtype),
            params["fc1"]["w"], params["fc1"]["b"],
            params["fc2"]["w"], params["fc2"]["b"],
            activation="gelu", layernorm=False, residual=False,
        )
        return out.reshape(features.shape[:-1] + (out.shape[-1],))
    h = features @ params["fc1"]["w"] + params["fc1"]["b"]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(features.dtype)
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


# ---------------------------------------------------------------------------
# Registry (reference build_vision_projector,
# longva/model/multimodal_projector/builder.py:65): LongVA ships mlp2x_gelu;
# linear and identity cover the other shipped checkpoints. "pooler" (LDPNet)
# belongs to vendored baselines and is intentionally absent.
# ---------------------------------------------------------------------------


def init_linear(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.bfloat16) -> Params:
    return {
        "fc1": {
            "w": (jax.random.normal(key, (in_dim, out_dim)) * in_dim**-0.5).astype(dtype),
            "b": jnp.zeros((out_dim,), dtype),
        }
    }


def apply_linear(params: Params, features: jnp.ndarray) -> jnp.ndarray:
    return features @ params["fc1"]["w"] + params["fc1"]["b"]


def build(projector_type: str):
    """(init_fn, apply_fn) for a projector type string from the HF config."""
    if projector_type == "mlp2x_gelu":
        return init, apply
    if projector_type == "linear":
        return init_linear, apply_linear
    if projector_type == "identity":
        return (lambda key, i, o, dtype=jnp.bfloat16: {}), (lambda p, x: x)
    raise ValueError(f"unknown projector type: {projector_type}")
