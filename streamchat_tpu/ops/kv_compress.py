"""KV-cache compression: H2O heavy-hitter eviction + merge variants.

TPU-native rebuild of the reference's dormant KV-compression zoo
(`llavanext/model/kv_cache/modeling_kv_cache.py:237-935` — PivotKVCache,
AVGMerge, WeightedMerge, H2OKVCache `*_LayerWise`; zero importers in the
reference but its only long-context KV management design, SURVEY.md §2.2).

Semantics preserved:
  * `hh_score` accumulates per-(head, slot) attention mass over decoded
    queries (`_update_hh_score`).
  * Compression keeps the `hh_size` highest-scoring slots among the
    non-recent region PLUS the `recent_size` most recent slots
    (H2OKVCache.__call__:874-930). The reference additionally pins the
    first 4 slots in the merge variants (attention sinks) — reproduced via
    `sink_size`.
  * Merge variants fold each pruned slot's K/V into its nearest kept
    heavy-hitter (by key similarity): "avg" = running mean, "weighted" =
    hh_score-weighted mean (AVGMerge/WeightedMerge :439-650).

TPU-first differences: static output size (hh + recent + sink), per-head
gather via take_along_axis instead of boolean masked_select, everything
jittable.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def update_hh_score(
    hh_score: Optional[jnp.ndarray], attn_probs: jnp.ndarray
) -> jnp.ndarray:
    """Accumulate attention mass. attn_probs [H, Q, L] -> hh_score [H, L]."""
    add = jnp.sum(attn_probs.astype(jnp.float32), axis=1)
    return add if hh_score is None else hh_score + add


def attention_mass(
    q: jnp.ndarray, k: jnp.ndarray, length: jnp.ndarray, sm_scale: float | None = None
) -> jnp.ndarray:
    """Score a cache against recent queries: q [H, Q, D], k [H, L, D] -> [H, L].

    Helper for callers that do not keep probs around: recomputes softmax
    attention of the probe queries over the cache and sums the mass.
    """
    h, _, d = q.shape
    if sm_scale is None:
        sm_scale = d ** -0.5
    s = jnp.einsum("hqd,hld->hql", q.astype(jnp.float32), k.astype(jnp.float32))
    s *= sm_scale
    l = k.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, l), 2)
    s = jnp.where(col < length, s, -1e30)
    return jnp.sum(jax.nn.softmax(s, axis=-1), axis=1)


@functools.partial(
    jax.jit, static_argnames=("hh_size", "recent_size", "sink_size", "merge")
)
def compress_kv(
    k: jnp.ndarray,                 # [H, L, D]
    v: jnp.ndarray,                 # [H, L, D]
    hh_score: jnp.ndarray,          # [H, L]
    length: jnp.ndarray,            # [] valid slots (<= L)
    *,
    hh_size: int,
    recent_size: int,
    sink_size: int = 0,
    merge: Optional[str] = None,    # None | "avg" | "weighted"
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evict to `sink_size + hh_size + recent_size` slots per head.

    Returns (k', v', hh_score', kept_length). Output arrays have static
    length C = sink + hh + recent; when `length` <= C the original order is
    preserved (identity slots).
    """
    h, l, d = k.shape
    c = sink_size + hh_size + recent_size
    if c >= l:
        return k[:, :c], v[:, :c], hh_score[:, :c], jnp.minimum(length, c)

    pos = jnp.arange(l)
    recent_start = length - recent_size
    # Candidate region: [sink_size, recent_start). Exclude recent/invalid
    # with -inf FIRST, then pin sinks with +inf (the other order lets the
    # recent mask erase a sink pin when length < c).
    score = hh_score.astype(jnp.float32)
    in_recent_or_pad = pos[None] >= recent_start
    score = jnp.where(in_recent_or_pad, -jnp.inf, score)
    score = jnp.where(pos[None] < sink_size, jnp.inf, score)
    _, keep_hh = jax.lax.top_k(score, sink_size + hh_size)   # [H, sink+hh]
    keep_hh = jnp.sort(keep_hh, axis=1)
    keep_recent = jnp.clip(
        recent_start + jnp.arange(recent_size)[None], 0, l - 1
    )
    keep_recent = jnp.broadcast_to(keep_recent, (h, recent_size))
    keep = jnp.concatenate([keep_hh, keep_recent], axis=1)   # [H, C]
    # When the runtime length fits in C, selection above would emit
    # duplicates/garbage; fall back to the identity layout so the first
    # `length` slots are exactly the original cache.
    identity = jnp.broadcast_to(jnp.arange(c)[None], (h, c))
    keep = jnp.where(length <= c, identity, keep)

    k_kept = jnp.take_along_axis(k, keep[:, :, None], axis=1)
    v_kept = jnp.take_along_axis(v, keep[:, :, None], axis=1)
    s_kept = jnp.take_along_axis(hh_score, keep, axis=1)

    if merge is not None:
        # Fold pruned slots into their nearest kept heavy-hitter.
        kept_mask = jnp.zeros((h, l), bool)
        kept_mask = jnp.put_along_axis(
            kept_mask, keep, jnp.ones_like(keep, bool), axis=1,
            inplace=False,
        )
        valid = pos[None] < length
        pruned_mask = (~kept_mask) & valid                    # [H, L]
        hh_slots = keep[:, : sink_size + hh_size]             # merge targets
        k_hh = jnp.take_along_axis(k, hh_slots[:, :, None], axis=1)
        sim = jnp.einsum(
            "hld,hcd->hlc", k.astype(jnp.float32), k_hh.astype(jnp.float32)
        )
        nearest = jnp.argmax(sim, axis=2)                     # [H, L]
        if merge == "weighted":
            w = jnp.where(pruned_mask, hh_score.astype(jnp.float32), 0.0)
        else:
            w = pruned_mask.astype(jnp.float32)
        onehot = jax.nn.one_hot(nearest, sim.shape[2], dtype=jnp.float32)
        onehot = onehot * w[:, :, None]                       # [H, L, C_hh]
        merged_k = jnp.einsum("hlc,hld->hcd", onehot, k.astype(jnp.float32))
        merged_v = jnp.einsum("hlc,hld->hcd", onehot, v.astype(jnp.float32))
        counts = jnp.sum(onehot, axis=1)                      # [H, C_hh]
        denom = counts + 1.0                                  # + the kept slot
        n_hh = sink_size + hh_size
        k_upd = (
            k_kept[:, :n_hh].astype(jnp.float32) + merged_k
        ) / denom[:, :, None]
        v_upd = (
            v_kept[:, :n_hh].astype(jnp.float32) + merged_v
        ) / denom[:, :, None]
        k_kept = jnp.concatenate(
            [k_upd.astype(k.dtype), k_kept[:, n_hh:]], axis=1
        )
        v_kept = jnp.concatenate(
            [v_upd.astype(v.dtype), v_kept[:, n_hh:]], axis=1
        )

    return k_kept, v_kept, s_kept, jnp.minimum(length, c).astype(jnp.int32)


def compress_cache(
    cache,
    probe_queries: jnp.ndarray,
    *,
    hh_size: int,
    recent_size: int,
    sink_size: int = 0,
    merge: Optional[str] = None,
):
    """Compress a whole decoder KVCache between generation rounds.

    cache: models/decoder.KVCache (k/v [L, B, Hkv, Lmax, Dh]); only B=1 is
    supported (the streaming pipeline decodes one conversation at a time).
    probe_queries: [L, Hkv*G, Q, Dh] recent per-layer query activations used
    to score slots (attention_mass); when the caller has no saved queries,
    passing the last decoded K works as a proxy.

    Returns a KVCache of the same Lmax whose first kept_length slots are the
    surviving KV (compacted in place) — shape-stable, so a jitted decode
    loop continues against it unchanged.
    """
    from streamchat_tpu.models.decoder import KVCache

    L, b, hkv, lmax, dh = cache.k.shape
    if b != 1:
        raise ValueError("compress_cache supports batch 1")
    g = probe_queries.shape[1] // hkv
    new_k = []
    new_v = []
    kept_len = None
    for layer in range(L):
        k_l = cache.k[layer, 0]                        # [Hkv, Lmax, Dh]
        v_l = cache.v[layer, 0]
        q_l = probe_queries[layer]                     # [Hq, Q, Dh]
        # Score per KV head: sum the mass of its query group.
        mass = attention_mass(q_l, jnp.repeat(k_l, g, axis=0), cache.length[0])
        mass = mass.reshape(hkv, g, lmax).sum(axis=1)  # [Hkv, Lmax]
        k2, v2, _, kept = compress_kv(
            k_l, v_l, mass, cache.length[0],
            hh_size=hh_size, recent_size=recent_size,
            sink_size=sink_size, merge=merge,
        )
        c = k2.shape[1]
        k_out = jnp.zeros_like(k_l).at[:, :c].set(k2)
        v_out = jnp.zeros_like(v_l).at[:, :c].set(v2)
        new_k.append(k_out[None])
        new_v.append(v_out[None])
        kept_len = kept
    return KVCache(
        k=jnp.stack(new_k), v=jnp.stack(new_v),
        length=kept_len[None].astype(jnp.int32),
    )
