"""Ebbinghaus forgetting-curve sampling for the short-term memory FIFO.

Replaces `calculate_forgetting_probabilities` / `select_data_without_replacement`
(utiles.py:251-262). The curve is identical: R(t) = exp(-t / tau), normalized.
Sampling without replacement uses the Gumbel-top-k trick so it stays a pure
jittable function of a PRNG key, instead of `np.random.choice` on the host.

Note the reference indexes t=0 at the *oldest* end of the window (probability
mass on the oldest frames); we reproduce that exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def forgetting_probabilities(length: int, tau: float = 10.0) -> jnp.ndarray:
    """Normalized retention probabilities over window positions [0, length)."""
    t = jnp.arange(length, dtype=jnp.float32)
    r = jnp.exp(-t / tau)
    return r / jnp.sum(r)


@functools.partial(jax.jit, static_argnames=("num_select",))
def sample_without_replacement(
    key: jax.Array, probs: jnp.ndarray, num_select: int
) -> jnp.ndarray:
    """Draw `num_select` distinct indices ~ probs via Gumbel-top-k.

    Equivalent in distribution to np.random.choice(replace=False, p=probs)
    (utiles.py:256-262) but on-device and reproducible.
    """
    gumbel = jax.random.gumbel(key, probs.shape)
    scores = jnp.log(jnp.maximum(probs, 1e-30)) + gumbel
    _, idx = jax.lax.top_k(scores, num_select)
    return idx.astype(jnp.int32)


def select_short_memory(
    key: jax.Array,
    features: jnp.ndarray,
    num_select: int,
    tau: float,
) -> jnp.ndarray:
    """Sample `num_select` of the window's [W, ...] features by retention prob.

    Reference call site: inference_streaming_longva_v2.py:319-337. Indices are
    sorted ascending so the selected frames stay in temporal order (the
    reference keeps np.random.choice's draw order; temporal order is strictly
    more informative for the downstream splice and changes nothing else).
    """
    w = features.shape[0]
    probs = forgetting_probabilities(w, tau)
    idx = jnp.sort(sample_without_replacement(key, probs, num_select))
    return jnp.take(features, idx, axis=0)
