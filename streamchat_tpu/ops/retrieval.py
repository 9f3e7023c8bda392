"""On-device similarity search primitives for both retrieval subsystems.

Replaces (a) the per-node embedder forwards + host cos_sim of the reference's
tree search (utiles.py:704-777 — one HF forward per tree node per question)
and (b) the FAISS index of the dialogue MemoryBank (local_doc_qa.py) with
batched matmul scoring: embed all candidates once, score with a single [Q, N]
product on the MXU, top-k on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


@jax.jit
def cosine_scores(query: jnp.ndarray, candidates: jnp.ndarray) -> jnp.ndarray:
    """[Q, D] x [N, D] -> [Q, N] cosine similarities (f32)."""
    q = l2_normalize(query.astype(jnp.float32))
    c = l2_normalize(candidates.astype(jnp.float32))
    return q @ c.T


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk(query: jnp.ndarray, candidates: jnp.ndarray, k: int):
    """Top-k most-similar candidates: returns (scores [Q,k], indices [Q,k])."""
    s = cosine_scores(query, candidates)
    return jax.lax.top_k(s, k)


@jax.jit
def maxsim_score(query_tokens: jnp.ndarray, doc_tokens: jnp.ndarray) -> jnp.ndarray:
    """ColBERT MaxSim: [Tq, D] query tokens vs [N, Td, D] doc tokens -> [N].

    The reference collapses mxbai-colbert to CLS pooling (utiles.py:689-697);
    MaxSim is the model's native late-interaction scoring and is exposed as an
    upgrade path (sum over query tokens of max doc-token similarity).
    """
    q = l2_normalize(query_tokens.astype(jnp.float32))          # [Tq, D]
    d = l2_normalize(doc_tokens.astype(jnp.float32))            # [N, Td, D]
    sim = jnp.einsum("qd,ntd->nqt", q, d)
    return jnp.sum(jnp.max(sim, axis=2), axis=1)
