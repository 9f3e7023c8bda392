"""Lucas-Kanade optical flow scene-change test (selective frame stacking).

Port of the reference's pixel-space keep/drop test (`compute_gradients` /
`Optical_flow`, utiles.py:89-180): Sobel gradients of the previous frame,
temporal difference, per-window 2x2 least-squares flow solve, keep the frame
iff the mean flow magnitude exceeds a threshold (0.18-0.4 at the call sites).

TPU-first formulation:
  * Sobel + unfold become one `conv_general_dilated` + patch extraction that
    XLA fuses; the 2x2 normal equations are solved in closed form (adjugate /
    determinant) instead of `torch.linalg.solve` over 110k tiny systems.
  * Batched over frame PAIRS: score a whole segment in one call instead of
    the reference's per-frame python loop.

Note: the reference computes `mag = sqrt(u^2 + u^2)` (utiles.py:168) — the
v-component is dropped, an evident typo. We compute sqrt(u^2 + v^2); set
`u_only=True` to reproduce the reference value exactly.

The feature-space dedup in ops/dedup.py remains the recommended path (one
ViT descriptor pass instead of a pixel solve); this op exists for parity and
for callers that dedup BEFORE encoding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Plain numpy at module scope: importing this module must not dispatch on any
# jax backend (a module-level jnp.array() eagerly initializes the default
# platform, which crashed the driver's multichip dryrun in rounds 1-2 when the
# default backend was the broken axon tunnel). jnp ops convert these on trace.
SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)
RGB_WEIGHTS = np.array([0.2989, 0.5870, 0.1140], np.float32)


def grayscale(frames: jnp.ndarray) -> jnp.ndarray:
    """[N, 3, H, W] -> [N, H, W] (reference luma weights, utiles.py:110)."""
    return jnp.einsum("nchw,c->nhw", frames.astype(jnp.float32), RGB_WEIGHTS)


def _conv2d_same(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W] (x) [3, 3] -> [N, H, W], zero-padded."""
    return jax.lax.conv_general_dilated(
        img[:, None],
        kernel[None, None],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]


def compute_gradients(img: jnp.ndarray):
    """Sobel Ix, Iy of [N, H, W] (reference compute_gradients, utiles.py:89-97)."""
    return _conv2d_same(img, SOBEL_X), _conv2d_same(img, SOBEL_Y)


def _windows(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[N, H, W] -> [N, H-w+1, W-w+1, w*w] sliding windows (F.unfold)."""
    n, h, wd = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x[:, None], (w, w), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [N, w*w, H-w+1, W-w+1]
    return patches.transpose(0, 2, 3, 1)


@functools.partial(jax.jit, static_argnames=("window_size", "u_only"))
def flow_magnitude(
    last: jnp.ndarray,
    current: jnp.ndarray,
    *,
    window_size: int = 5,
    u_only: bool = False,
) -> jnp.ndarray:
    """Mean LK flow magnitude per pair: grayscale [N, H, W] x2 -> [N].

    Solves the per-window normal equations  (A^T A + eps I) nu = A^T b  with
    A = [Ix | Iy], b = -It, in closed form for the 2x2 system.
    """
    eps = 1e-6
    ix, iy = compute_gradients(last)
    it = current - last

    ixw = _windows(ix, window_size)          # [N, oh, ow, w*w]
    iyw = _windows(iy, window_size)
    itw = _windows(it, window_size)

    # Normal equations entries.
    a = jnp.sum(ixw * ixw, axis=-1) + eps    # [N, oh, ow]
    b = jnp.sum(ixw * iyw, axis=-1)
    c = jnp.sum(iyw * iyw, axis=-1) + eps
    r1 = -jnp.sum(ixw * itw, axis=-1)
    r2 = -jnp.sum(iyw * itw, axis=-1)

    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    u = (c * r1 - b * r2) / det
    v = (a * r2 - b * r1) / det

    mag = jnp.sqrt(u * u + (u * u if u_only else v * v))
    return jnp.mean(mag, axis=(1, 2))


def keep_frames_optical_flow(
    frames_gray: jnp.ndarray, threshold: float, window_size: int = 5
) -> jnp.ndarray:
    """Keep mask [N] over a grayscale frame sequence [N, H, W].

    Pairwise against the previous frame (the reference advances the anchor
    every frame regardless of keep; reproduced). Frame 0 is always kept.
    """
    mags = flow_magnitude(
        frames_gray[:-1], frames_gray[1:], window_size=window_size
    )
    keep = jnp.concatenate([jnp.array([True]), mags > threshold])
    return keep
