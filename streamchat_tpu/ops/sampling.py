"""Token sampling: greedy / temperature / top-p, jit-friendly.

Mirrors the reference generate kwargs (do_sample = temperature > 0,
temperature, top_p; inference_streaming_longva_v2.py:145-148) as one pure
function of (logits, key).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("temperature", "top_p"))
def sample_token(
    logits: jnp.ndarray,
    key: jax.Array,
    *,
    temperature: float = 0.0,
    top_p: float | None = None,
) -> jnp.ndarray:
    """Sample next-token ids [B] from logits [B, V].

    temperature <= 0 means greedy (reference: do_sample=False).
    top_p, when set, zeroes the tail of the sorted distribution.
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits.astype(jnp.float32) / temperature
    if top_p is not None and top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest prefix with cumulative mass >= top_p (the first
        # token is always kept).
        cutoff_mask = cum - probs < top_p
        threshold = jnp.min(
            jnp.where(cutoff_mask, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits >= threshold, logits, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
