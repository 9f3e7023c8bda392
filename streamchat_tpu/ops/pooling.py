"""Spatial pooling over ViT patch grids.

Covers the reference's `compress_spatial_features` (utiles.py:264-289) and the
meta-arch `get_2dPool` (llava_arch.py:163-178). Both are average pools over the
24x24 (or 12x12) patch grid; on TPU a reshape+mean lowers to a single fused
reduction, no conv needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("rate", "mode"))
def pool_patch_grid(features: jnp.ndarray, rate: int, mode: str = "average") -> jnp.ndarray:
    """Pool [N, P, D] patch-token features by `rate` along each grid side.

    P must be a perfect square (576 for ViT-L/14-336). rate=1 is identity.
    """
    if rate == 1:
        return features
    n, p, d = features.shape
    side = int(round(p ** 0.5))
    if side * side != p:
        raise ValueError(f"patch count {p} is not a perfect square")
    if side % rate != 0:
        raise ValueError(f"grid side {side} not divisible by pool rate {rate}")
    out = side // rate
    grid = features.reshape(n, out, rate, out, rate, d)
    if mode == "average":
        pooled = grid.mean(axis=(2, 4))
    elif mode == "max":
        pooled = grid.max(axis=(2, 4))
    else:
        raise ValueError(f"unknown pool mode: {mode}")
    return pooled.reshape(n, out * out, d)


def compress_spatial_features(features: jnp.ndarray, compress_rate: int) -> jnp.ndarray:
    """Reference-compatible name; [N, P, D] -> [N, (side/rate)^2, D]."""
    return pool_patch_grid(features, compress_rate, mode="average")
