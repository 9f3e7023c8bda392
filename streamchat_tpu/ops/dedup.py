"""Selective frame stacking: scene-change dedup over frame features.

The paper's "selective frame stacking" is implemented in the reference as
Lucas-Kanade optical flow over Sobel gradients between *consecutive* frames
(`utiles.py:89-248`; the comparison anchor advances every frame —
`last_frame = current_frame` regardless of keep). That per-pair pixel solve is
a poor fit for TPU (tiny unfused convs + per-window linalg.solve). The
TPU-native replacement scores scene change in *feature space*: frame i is kept
iff 1 - cos(x_i, x_{i-1}) > threshold over pooled ViT descriptors. Consecutive
-pair comparison is embarrassingly parallel, so the whole thing is one fused
Pallas program: normalize on the VPU, multiply against the row-shifted matrix,
reduce — one HBM read of [N, D], one [N] write, no host round-trips.

A pixel-space SSIM fallback (`ssim_pairs`) covers callers that want the
reference's pixel metric; it's pure XLA (conv + elementwise fuse fine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dedup_kernel(feat_ref, sim_ref):
    x = feat_ref[...].astype(jnp.float32)                          # [N, D]
    norm = jax.lax.rsqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-8)
    xn = x * norm
    # Row-shifted product: prev[i] = xn[i-1]; row 0 compares with itself,
    # caller forces keep[0] = True anyway.
    prev = pltpu.roll(xn, shift=1, axis=0)
    sim_ref[...] = jnp.sum(xn * prev, axis=1, keepdims=True)       # [N, 1]


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def select_changed_frames(
    features: jnp.ndarray, *, threshold: float = 0.18, interpret: bool = False
) -> jnp.ndarray:
    """Keep mask [N] for frame descriptors [N, D].

    threshold plays the role of the reference's optical-flow magnitude
    threshold (0.18-0.4, utiles.py call sites): larger => fewer kept frames.
    Frame 0 is always kept.
    """
    n, d = features.shape
    sim = pl.pallas_call(
        _dedup_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret or jax.default_backend() != "tpu",
    )(features)
    changed = (1.0 - sim[:, 0]) > threshold
    return changed.at[0].set(True)


def frame_descriptors(patch_features: jnp.ndarray) -> jnp.ndarray:
    """[N, P, D] ViT patch features -> [N, D] pooled per-frame descriptors."""
    return jnp.mean(patch_features.astype(jnp.float32), axis=1)


def ssim_pairs(frames_a: jnp.ndarray, frames_b: jnp.ndarray) -> jnp.ndarray:
    """Global-statistics SSIM between grayscale frame batches [N, H, W].

    Pixel-space fallback mirroring the intent of the reference's SSIM check
    (utiles.py:182-248) with global means/variances instead of an 11x11
    Gaussian window — the downstream use is a scalar keep/drop score.
    """
    a = frames_a.astype(jnp.float32)
    b = frames_b.astype(jnp.float32)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu_a = jnp.mean(a, axis=(1, 2))
    mu_b = jnp.mean(b, axis=(1, 2))
    var_a = jnp.var(a, axis=(1, 2))
    var_b = jnp.var(b, axis=(1, 2))
    cov = jnp.mean(
        (a - mu_a[:, None, None]) * (b - mu_b[:, None, None]), axis=(1, 2)
    )
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
