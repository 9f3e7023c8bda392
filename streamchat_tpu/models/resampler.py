"""Vision resampler registry.

Reference `build_vision_resampler` (longva/model/multimodal_resampler/) —
LongVA uses the identity; `spatial_pool` and `masked_drop` are the variants
exercised by shipped checkpoints. Perceiver/QFormer resamplers belong to the
vendored baseline trees (SURVEY.md §2.5) and are intentionally absent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from streamchat_tpu.ops.pooling import pool_patch_grid


def identity(features: jnp.ndarray, **_) -> jnp.ndarray:
    return features


def spatial_pool(features: jnp.ndarray, *, stride: int = 2, mode: str = "average", **_) -> jnp.ndarray:
    """Pool the patch grid by `stride` (resampler spatial_pool variant)."""
    return pool_patch_grid(features, stride, mode=mode)


def masked_drop(
    features: jnp.ndarray, key: jax.Array, *, ratio: float = 0.5, **_
) -> jnp.ndarray:
    """Keep a random (1-ratio) subset of patch tokens per frame.

    Mirrors the masked_drop resampler's 'random' mode: one shared mask per
    batch so shapes stay static.
    """
    n, p, d = features.shape
    keep = max(1, int(round(p * (1.0 - ratio))))
    idx = jnp.sort(jax.random.permutation(key, p)[:keep])
    return jnp.take(features, idx, axis=1)


REGISTRY = {
    "identity": identity,
    "spatial_pool": spatial_pool,
    "masked_drop": masked_drop,
}


def build(name: str | None):
    return REGISTRY[name or "identity"]
