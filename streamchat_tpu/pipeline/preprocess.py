"""CLIP image preprocessing as jitted device ops.

Reference: `utiles.process_images` / `process_images_ours` (utiles.py:71-87)
-> HF CLIPImageProcessor for ViT-L/14-336: resize shortest edge to 336
(bicubic), center-crop 336x336, scale 1/255, normalize with the OpenAI CLIP
mean/std. The reference does this per frame on host via PIL; here the whole
frame batch is one jitted resize+normalize program on device — the host only
ships uint8 RGB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# CLIPImageProcessor constants (OPENAI_CLIP_MEAN/STD).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@functools.partial(jax.jit, static_argnames=("image_size",))
def preprocess_frames(frames: jnp.ndarray, image_size: int = 336) -> jnp.ndarray:
    """uint8 RGB [N, H, W, 3] -> normalized [N, 3, S, S] float32.

    Matches CLIPImageProcessor semantics: shortest-edge resize (bicubic,
    antialiased like PIL), center crop, rescale, normalize.
    """
    n, h, w, _ = frames.shape
    x = frames.astype(jnp.float32) / 255.0

    # Shortest-edge resize preserving aspect ratio. Shapes must be static:
    # compute the python-int output size from the static input shape.
    if h <= w:
        nh, nw = image_size, max(image_size, int(round(w * image_size / h)))
    else:
        nh, nw = max(image_size, int(round(h * image_size / w))), image_size
    x = jax.image.resize(x, (n, nh, nw, 3), method="bicubic", antialias=True)

    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (n, image_size, image_size, 3)
    )

    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    x = (x - mean) / std
    x = jnp.clip(x, -10.0, 10.0)
    return x.transpose(0, 3, 1, 2)
