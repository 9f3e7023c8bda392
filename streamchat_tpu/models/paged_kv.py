"""Paged KV cache: block-granular KV storage with a page table.

The contiguous per-sequence cache (models/decoder.KVCache) preallocates
max_len slots per row — fine for the benchmark's one-question-at-a-time
decode, wasteful for serving many concurrent streams of wildly different
lengths (SURVEY.md §5 calls for "a paged cache + Pallas flash attention" on
the long-context path). This module provides the vLLM-style alternative:

  * one global page pool per layer: [num_pages, Hkv, page_size, Dh];
  * a per-sequence page table [B, max_pages] of pool indices;
  * a sequential device allocator (next_free scalar) — pages are recycled
    by resetting the allocator between batches (streaming QA frees whole
    conversations at once, so a free-list adds nothing here).

`append` writes one token per sequence into its current tail page;
`paged_decode_attention` gathers the table's pages and runs masked decode
attention. All static shapes; jit/scan safe.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from streamchat_tpu.config import DecoderConfig
from streamchat_tpu.ops.attention import DEFAULT_MASK_VALUE


def _use_seq_kernel(sequential_pages: bool) -> bool:
    """Kernel-choice dispatch, deferred so the probe override is honored."""
    from streamchat_tpu.ops.paged_attention import use_seq_kernel

    return use_seq_kernel(sequential_pages)


class PagedKVCache(NamedTuple):
    k_pages: jnp.ndarray      # [L, num_pages, Hkv, page_size, Dh]
    v_pages: jnp.ndarray      # [L, num_pages, Hkv, page_size, Dh]
    page_table: jnp.ndarray   # [B, max_pages] int32 pool indices (-1 = unmapped)
    length: jnp.ndarray       # [B] tokens stored per sequence
    next_free: jnp.ndarray    # [] next unallocated pool page

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @classmethod
    def create(
        cls,
        cfg: DecoderConfig,
        batch: int,
        num_pages: int,
        max_pages_per_seq: int,
        page_size: int = 128,
        dtype=jnp.bfloat16,
    ) -> "PagedKVCache":
        shape = (cfg.num_layers, num_pages, cfg.num_kv_heads, page_size, cfg.head_dim)
        return cls(
            k_pages=jnp.zeros(shape, dtype),
            v_pages=jnp.zeros(shape, dtype),
            page_table=jnp.full((batch, max_pages_per_seq), -1, jnp.int32),
            length=jnp.zeros((batch,), jnp.int32),
            next_free=jnp.zeros((), jnp.int32),
        )


def allocate_pages_checked(
    cache: PagedKVCache, tokens_per_seq: jnp.ndarray
) -> Tuple[PagedKVCache, jnp.ndarray]:
    """Map pool pages for `length + tokens` per row -> (cache, overflowed).

    Sequential allocation: rows claim page ranges in batch order. Intended
    call pattern: once before prefill with the prompt lengths, then the
    decode loop calls it with ones (a no-op until a page boundary).

    `overflowed` is a traced bool scalar: True when the pool or a row's page
    table was exhausted. On overflow the written table entries are clamped
    scatters/gathers — decode would silently read another sequence's KV — so
    TRACED callers MUST thread the flag out and assert on the host
    (models/generate_paged.py does; VERDICT r2 weak #4).
    """
    b, max_pages = cache.page_table.shape
    ps = cache.page_size
    have = (cache.length + ps - 1) // ps            # pages currently mapped
    need = (cache.length + tokens_per_seq + ps - 1) // ps
    extra = need - have                              # [B]
    starts = cache.next_free + jnp.cumsum(extra) - extra
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, max_pages), 1)
    new_idx = starts[:, None] + (slot - have[:, None])
    grow = (slot >= have[:, None]) & (slot < need[:, None])
    table = jnp.where(grow, new_idx, cache.page_table)
    new_cache = cache._replace(
        page_table=table, next_free=cache.next_free + jnp.sum(extra)
    )
    over = jnp.logical_or(
        new_cache.next_free > cache.k_pages.shape[1],
        jnp.any(need > max_pages),
    )
    return new_cache, over


def allocate_pages(cache: PagedKVCache, tokens_per_seq: jnp.ndarray) -> PagedKVCache:
    """allocate_pages_checked that raises on overflow with concrete inputs.

    Under a trace the flag cannot raise — use allocate_pages_checked there.
    """
    new_cache, over = allocate_pages_checked(cache, tokens_per_seq)
    if not isinstance(over, jax.core.Tracer) and bool(over):
        raise ValueError(
            f"paged KV overflow: pool used {int(new_cache.next_free)}"
            f"/{cache.k_pages.shape[1]} pages "
            f"(max {cache.page_table.shape[1]} pages/seq)"
        )
    return new_cache


def has_overflowed(cache: PagedKVCache, need: Optional[jnp.ndarray] = None):
    """True when the pool or a sequence's page table has been exhausted."""
    num_pages = cache.k_pages.shape[1]
    max_pages = cache.page_table.shape[1]
    over = cache.next_free > num_pages
    if need is not None:
        over = over | jnp.any(need > max_pages)
    else:
        ps = cache.page_size
        over = over | jnp.any((cache.length + ps - 1) // ps > max_pages)
    return bool(over) if not isinstance(over, jax.core.Tracer) else over


def append_token_kv(
    cache: PagedKVCache,
    layer,                   # layer index — a PYTHON int from the unrolled
                             # layer loop keeps the scatter start static
                             # (no @jax.jit here: a jit boundary would
                             # re-trace it into a dynamic index)
    k: jnp.ndarray,          # [B, Hkv, Dh] the new token's K
    v: jnp.ndarray,
) -> PagedKVCache:
    """Write one token per sequence into its tail page (single layer)."""
    ps = cache.page_size
    page_slot = cache.length // ps                  # [B] index into table
    page_idx = jnp.take_along_axis(
        cache.page_table, page_slot[:, None], axis=1
    )[:, 0]                                         # [B] pool page
    offset = cache.length % ps

    # ONE batched scatter per tensor, straight into the [L, P, H, ps, D]
    # pool (advanced indexing: [layer, page_idx[B], :, offset[B]] indexes a
    # [B, H, D] window; distinct rows own distinct pages by construction).
    # Two prior forms both re-materialized pool-sized buffers per call and
    # made decode-step cost scale with POOL size — measured 219 ms/step at
    # a 3x23k partitioned pool, and the long-unexplained 22 ms/tok (vs 9.9
    # roofline) at 11.6k ctx:
    #   * slice-out/write-back (`pages[layer]` -> `.at[layer].set`) with a
    #     TRACED layer index (dynamic-start DUS defeats in-place analysis;
    #     the contiguous path's static-index chain aliases fine);
    #   * a per-row lax.scan whose carry was the full pool.
    def write(pages, val):
        val = val.astype(pages.dtype)
        if val.shape[0] == 1:
            # Single row: one in-place dynamic-update-slice (scalar starts).
            # The batched advanced-indexing form below lowers to an HLO
            # scatter, which costs ~0.4 ms/decode-step more at 7B geometry
            # (56 scatters/step; round-4 A/B via scripts/probe_p50.py) —
            # the round-3 answer-p50 regression.
            upd = val[0][None, None, :, None, :]        # [1,1,H,1,D]
            return jax.lax.dynamic_update_slice(
                pages, upd, (layer, page_idx[0], 0, offset[0], 0)
            )
        return pages.at[layer, page_idx, :, offset].set(val)

    return cache._replace(
        k_pages=write(cache.k_pages, k), v_pages=write(cache.v_pages, v)
    )


def advance(cache: PagedKVCache, tokens: jnp.ndarray) -> PagedKVCache:
    """Bump per-sequence lengths after all layers appended."""
    return cache._replace(length=cache.length + tokens)


def from_contiguous(
    cache,
    num_pages: int,
    max_pages_per_seq: int,
    page_size: int = 128,
    partitioned: bool = False,
) -> "PagedKVCache":
    """Import a prefilled contiguous decoder KVCache into pages.

    Prefill runs on the contiguous cache (dense writes are cheapest there);
    serving then continues page-granular. Lmax must be a multiple of
    page_size; each row's pages are claimed sequentially.

    partitioned=True statically assigns row r the pool slice
    [r*max_pages_per_seq, (r+1)*max_pages_per_seq) with the table FULLY
    mapped up front (num_pages must equal B*max_pages_per_seq): decode then
    needs no allocator calls, and the batched sequential-pool kernel can
    compute page offsets from grid indices alone
    (ops/paged_attention.paged_decode_attention_pallas_seq).
    """
    l, b, hkv, lmax, dh = cache.k.shape
    if lmax % page_size:
        raise ValueError(f"Lmax={lmax} not a multiple of page_size={page_size}")
    pages_per_row = lmax // page_size
    if pages_per_row > max_pages_per_seq:
        raise ValueError("max_pages_per_seq too small for the source cache")
    if partitioned and num_pages != b * max_pages_per_seq:
        raise ValueError(
            f"partitioned pool needs num_pages == B*max_pages_per_seq "
            f"({b}*{max_pages_per_seq}), got {num_pages}")
    if b * pages_per_row > num_pages:
        raise ValueError("page pool too small for the source cache")
    if partitioned:
        # [L, B, Hkv, Lmax, Dh] -> rows at stride max_pages_per_seq.
        def repage(x):
            x = x.reshape(l, b, hkv, pages_per_row, page_size, dh)
            x = x.transpose(0, 1, 3, 2, 4, 5)
            out = jnp.zeros((l, b, max_pages_per_seq, hkv, page_size, dh),
                            x.dtype)
            out = out.at[:, :, :pages_per_row].set(x)
            return out.reshape(l, num_pages, hkv, page_size, dh)

        k_pages = repage(cache.k)
        v_pages = repage(cache.v)
        table = (jnp.arange(b)[:, None] * max_pages_per_seq
                 + jnp.arange(max_pages_per_seq)[None]).astype(jnp.int32)
        return PagedKVCache(
            k_pages=k_pages, v_pages=v_pages, page_table=table,
            length=cache.length + 0,
            next_free=jnp.asarray(num_pages, jnp.int32),
        )
    # [L, B, Hkv, Lmax, Dh] -> [L, B*pages_per_row, Hkv, page_size, Dh]
    def repage(x):
        x = x.reshape(l, b, hkv, pages_per_row, page_size, dh)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(l, b * pages_per_row, hkv, page_size, dh)

    k_pages = jnp.zeros((l, num_pages, hkv, page_size, dh), cache.k.dtype)
    v_pages = jnp.zeros_like(k_pages)
    k_pages = k_pages.at[:, : b * pages_per_row].set(repage(cache.k))
    v_pages = v_pages.at[:, : b * pages_per_row].set(repage(cache.v))
    table = jnp.full((b, max_pages_per_seq), -1, jnp.int32)
    row_pages = (
        jnp.arange(b)[:, None] * pages_per_row + jnp.arange(pages_per_row)[None]
    )
    table = table.at[:, :pages_per_row].set(row_pages)
    return PagedKVCache(
        k_pages=k_pages,
        v_pages=v_pages,
        page_table=table,
        # Fresh buffer: the source cache's arrays may be donated to a later
        # decode_step, which would invalidate a shared `length` reference.
        length=cache.length + 0,
        next_free=jnp.asarray(b * pages_per_row, jnp.int32),
    )


def decode_step_paged(
    params,
    cfg,
    token_ids: jnp.ndarray,
    cache: "PagedKVCache",
    positions: Optional[jnp.ndarray] = None,
    collect_mass: bool = False,
    sequential_pages: bool = False,
):
    """One decode step against a paged cache -> (logits [B, V], cache[, mass]).

    The paged twin of models/decoder.decode_step: per layer, the new token's
    K/V append into the tail page and attention gathers through the page
    table. Pages for the new token must already be mapped
    (allocate_pages(cache, ones) before calling).

    positions: [B] RoPE position of the new token; defaults to cache.length.
    After in-loop H2O eviction (generate_paged) the cache holds FEWER slots
    than tokens seen, so the caller must pass the true global position —
    keys keep their original rotary phase, like the reference's H2OKVCache
    which evicts post-RoPE keys (modeling_kv_cache.py:874-930).
    collect_mass: additionally return per-layer attention mass
    [L, B, Hkv, cap] for H2O heavy-hitter scoring.
    """
    from streamchat_tpu.models import decoder

    b = token_ids.shape[0]
    x = decoder.embed_tokens(params, token_ids)[:, None, :]
    if positions is None:
        positions = cache.length
    positions = positions[:, None]
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    masses = []

    for i, p in enumerate(params["layers"]):
        h = decoder.rmsnorm(x, p["input_norm"], cfg.rms_eps)
        q, k, v = decoder.qkv_proj(h, p["attn"], b, 1, hq, hkv, dh)
        q = decoder.rope(q, positions, cfg.rope_theta)
        k = decoder.rope(k, positions, cfg.rope_theta)
        cache = append_token_kv(cache, i, k[:, :, 0], v[:, :, 0])
        if collect_mass or jax.default_backend() != "tpu":
            # XLA gather path: also the only one that can return the H2O
            # attention-mass statistic (the kernel never materializes probs).
            o = paged_decode_attention(
                q, cache.k_pages[i], cache.v_pages[i],
                cache.page_table, cache.length + 1,
                return_mass=collect_mass,
            )
            if collect_mass:
                o, mass = o
                masses.append(mass)
        elif _use_seq_kernel(sequential_pages):
            # TPU, pool in row order: single rows are identity-mapped by
            # construction (from_contiguous / sequential allocs /
            # compress_paged); batched rows must be statically partitioned
            # (from_contiguous(partitioned=True) — the caller asserts this).
            # The table is dropped and pages stream in seq_pool_block-page
            # all-head blocks. The per-(page, head) grid cost ~2/3 of
            # decode-attention time at 11.6k ctx (probe_kvint8.py).
            from streamchat_tpu.ops.paged_attention import (
                paged_decode_attention_pallas_seq,
                seq_pool_block,
            )

            o = paged_decode_attention_pallas_seq(
                q, cache.k_pages[i], cache.v_pages[i], cache.length + 1,
                pages_per_block=seq_pool_block(cache.k_pages.shape[1] // b),
            )
        else:
            # TPU: page-table-indexed Pallas kernel — no gather copy, cache
            # bytes read exactly once per step (ops/paged_attention).
            from streamchat_tpu.ops.paged_attention import (
                paged_decode_attention_pallas,
            )

            o = paged_decode_attention_pallas(
                q, cache.k_pages[i], cache.v_pages[i],
                cache.page_table, cache.length + 1,
            )
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, hq * dh)
        x = x + decoder._proj(o, p["attn"]["o"])
        hmid = decoder.rmsnorm(x, p["post_norm"], cfg.rms_eps)
        x = x + decoder.mlp_block(hmid, p["mlp"])

    x = decoder.rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = decoder.logits_from_hidden(params, cfg, x)[:, 0]
    cache = advance(cache, jnp.ones((b,), jnp.int32))
    if collect_mass:
        return logits, cache, jnp.stack(masses)
    return logits, cache


@functools.partial(jax.jit, static_argnames=("sm_scale", "return_mass"))
def paged_decode_attention(
    q: jnp.ndarray,           # [B, H, 1, Dh]
    k_pages: jnp.ndarray,     # [num_pages, Hkv, page_size, Dh] (one layer)
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,  # [B, max_pages]
    length: jnp.ndarray,      # [B]
    sm_scale: float | None = None,
    return_mass: bool = False,
):
    """Single-token attention against a paged cache -> [B, H, 1, Dh].

    With return_mass=True also returns the per-KV-head attention mass
    [B, Hkv, max_pages*page_size] (query groups summed) — the H2O
    heavy-hitter statistic (`_update_hh_score`, reference
    modeling_kv_cache.py:839-852) accumulated by generate_paged.
    """
    b, hq, _, d = q.shape
    hkv, ps = k_pages.shape[1], k_pages.shape[2]
    if sm_scale is None:
        sm_scale = d ** -0.5
    safe_table = jnp.maximum(page_table, 0)
    k = k_pages[safe_table]                         # [B, maxp, Hkv, ps, Dh]
    v = v_pages[safe_table]
    maxp = page_table.shape[1]
    k = k.transpose(0, 2, 1, 3, 4).reshape(b, hkv, maxp * ps, d)
    v = v.transpose(0, 2, 1, 3, 4).reshape(b, hkv, maxp * ps, d)

    g = hq // hkv
    qg = q.reshape(b, hkv, g, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhld->bhgl", qg, k.astype(jnp.float32)) * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, maxp * ps), 3)
    s = jnp.where(col < length[:, None, None, None], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgl,bhld->bhgd", p, v.astype(jnp.float32))
    o = o.reshape(b, hq, 1, d).astype(q.dtype)
    if return_mass:
        return o, jnp.sum(p, axis=2)                # [B, Hkv, maxp*ps]
    return o


def compress_paged(
    cache: "PagedKVCache",
    hh_score: jnp.ndarray,        # [L, Hkv, max_pages*page_size] f32
    *,
    hh_size: int,
    recent_size: int,
    sink_size: int = 4,
    merge: Optional[str] = None,
) -> Tuple["PagedKVCache", jnp.ndarray]:
    """H2O-compress a (batch-1) paged cache in place -> (cache', hh_score').

    Gathers the page table into token order, runs `ops.kv_compress.compress_kv`
    per layer on the accumulated heavy-hitter scores, and re-pages the
    surviving sink+hh+recent slots into pages [0, ceil(C/ps)). The allocator
    resets to just past the compressed region, so decoding continues with
    `cap - C` free slots before the next compression. Shape-stable and
    jit/cond-safe (reference semantics: H2OKVCache.__call__,
    modeling_kv_cache.py:874-930, made static-shape for XLA).

    Evicted keys keep their original RoPE phase; callers must track the
    global decode position separately (see decode_step_paged `positions`).
    """
    from streamchat_tpu.ops.kv_compress import compress_kv

    l, num_pages, hkv, ps, dh = cache.k_pages.shape
    b, maxp = cache.page_table.shape
    if b != 1:
        raise ValueError("compress_paged supports batch 1")
    cap = maxp * ps
    c = sink_size + hh_size + recent_size
    if c >= cap:
        raise ValueError(f"compressed size {c} must be < capacity {cap}")

    table = jnp.maximum(cache.page_table[0], 0)               # [maxp]
    # [L, maxp, Hkv, ps, Dh] -> token order [L, Hkv, cap, Dh]
    def gather(pages):
        g = pages[:, table]
        return g.transpose(0, 2, 1, 3, 4).reshape(l, hkv, cap, dh)

    k = gather(cache.k_pages)
    v = gather(cache.v_pages)
    length = cache.length[0]

    comp = jax.vmap(
        lambda kl, vl, sl: compress_kv(
            kl, vl, sl, length,
            hh_size=hh_size, recent_size=recent_size,
            sink_size=sink_size, merge=merge,
        )
    )
    k2, v2, s2, kept = comp(k, v, hh_score)                   # [L, Hkv, C, Dh]
    kept = kept[0]                                             # all layers equal

    c_pages = -(-c // ps)
    c_pad = c_pages * ps
    def repage(x):
        out = jnp.zeros((l, hkv, c_pad, dh), x.dtype).at[:, :, :c].set(x)
        out = out.reshape(l, hkv, c_pages, ps, dh).transpose(0, 2, 1, 3, 4)
        return out                                             # [L, c_pages, Hkv, ps, Dh]

    k_pages = cache.k_pages.at[:, :c_pages].set(repage(k2).astype(cache.k_pages.dtype))
    v_pages = cache.v_pages.at[:, :c_pages].set(repage(v2).astype(cache.v_pages.dtype))
    new_table = jnp.where(
        jnp.arange(maxp) < c_pages, jnp.arange(maxp), -1
    )[None].astype(jnp.int32)
    new_hh = jnp.zeros((l, hkv, cap), hh_score.dtype).at[:, :, :c].set(s2)
    new_cache = PagedKVCache(
        k_pages=k_pages,
        v_pages=v_pages,
        page_table=new_table,
        length=kept[None].astype(jnp.int32),
        next_free=jnp.asarray(c_pages, jnp.int32),
    )
    return new_cache, new_hh


# ---------------------------------------------------------------------------
# Int8-quantized paged cache (per-token-per-head scales)
# ---------------------------------------------------------------------------


class PagedKVCacheInt8(NamedTuple):
    """Paged KV with int8 values + per-(token, head) f32 scales.

    Halves KV HBM (the binding constraint for 23k-token caption prefills on
    a 16 GB chip) and halves decode's cache traffic. The scales commute out
    of both attention contractions — `q . (k_i8 * s) = (q . k_i8) * s` per
    slot and `sum_l p_l * (v_i8_l * s_l) = sum_l (p_l s_l) v_i8_l` — so
    nothing is ever dequantized into HBM. The reference's KV zoo
    (modeling_kv_cache.py) has no quantization at all.
    """

    k_pages: jnp.ndarray      # [L, num_pages, Hkv, page_size, Dh] int8
    v_pages: jnp.ndarray
    k_scale: jnp.ndarray      # [L, num_pages, Hkv, page_size] f32
    v_scale: jnp.ndarray
    page_table: jnp.ndarray   # [B, max_pages] int32
    length: jnp.ndarray       # [B]
    next_free: jnp.ndarray    # []

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]


def _quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., Dh] -> (int8 values, f32 scale over the trailing dim)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    vals = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127).astype(jnp.int8)
    return vals, scale


def from_contiguous_int8(
    cache,
    num_pages: int,
    max_pages_per_seq: int,
    page_size: int = 128,
    partitioned: bool = False,
) -> "PagedKVCacheInt8":
    """Quantizing twin of from_contiguous (dense bf16 prefill -> int8 pages).

    Quantize-and-repage runs PER LAYER via lax.map: the earlier
    materialize-bf16-pages-then-quantize form transiently held the dense
    cache + a bf16 pool + the int8 pool (~3.5 GB at 7B/23k tokens); here the
    extra live set is one layer's worth (~50 MB).

    `cache` may also be a decoder.Int8KVCache (already-quantized dense cache
    from a long kv_int8 chunked prefill): then this is a pure layout
    shuffle — the values were quantized with the same _quantize_kv on write.

    partitioned=True: see from_contiguous — static row slices, fully mapped
    table, no allocator during decode."""
    l, b, hkv, lmax, dh = cache.k.shape
    if lmax % page_size:
        raise ValueError(f"Lmax={lmax} not a multiple of page_size={page_size}")
    pages_per_row = lmax // page_size
    if pages_per_row > max_pages_per_seq:
        raise ValueError("max_pages_per_seq too small for the source cache")
    if partitioned and num_pages != b * max_pages_per_seq:
        raise ValueError(
            f"partitioned pool needs num_pages == B*max_pages_per_seq "
            f"({b}*{max_pages_per_seq}), got {num_pages}")
    if b * pages_per_row > num_pages:
        raise ValueError("page pool too small for the source cache")

    pre_quantized = hasattr(cache, "k_s")

    if partitioned:
        def pg(t, tail):
            t = t.reshape((b, hkv, pages_per_row, page_size) + tail)
            t = jnp.moveaxis(t, 2, 1)           # [B, ppr, Hkv, ps, ...]
            out = jnp.zeros(
                (b, max_pages_per_seq, hkv, page_size) + tail, t.dtype)
            out = out.at[:, :pages_per_row].set(t)
            return out.reshape((num_pages, hkv, page_size) + tail)
    else:
        def pg(t, tail):
            t = t.reshape((b, hkv, pages_per_row, page_size) + tail)
            t = jnp.moveaxis(t, 2, 1)               # [B, ppr, Hkv, ps, ...]
            out_shape = (num_pages, hkv, page_size) + tail
            out = jnp.zeros(out_shape, t.dtype)
            return out.at[: b * pages_per_row].set(
                t.reshape((b * pages_per_row, hkv, page_size) + tail)
            )

    def one_layer(kv_layer):
        if pre_quantized:
            k_i8, k_sc, v_i8, v_sc = kv_layer   # int8 [B,Hkv,Lmax,Dh] + f32
        else:
            k_l, v_l = kv_layer                 # [B, Hkv, Lmax, Dh] bf16
            k_i8, k_sc = _quantize_kv(k_l)
            v_i8, v_sc = _quantize_kv(v_l)
        return (pg(k_i8, (dh,)), pg(k_sc, ()),
                pg(v_i8, (dh,)), pg(v_sc, ()))

    src = (
        (cache.k, cache.k_s, cache.v, cache.v_s) if pre_quantized
        else (cache.k, cache.v)
    )
    k_i8, k_s, v_i8, v_s = jax.lax.map(one_layer, src)
    if partitioned:
        table = (jnp.arange(b)[:, None] * max_pages_per_seq
                 + jnp.arange(max_pages_per_seq)[None]).astype(jnp.int32)
        next_free = jnp.asarray(num_pages, jnp.int32)
    else:
        table = jnp.full((b, max_pages_per_seq), -1, jnp.int32)
        row_pages = (
            jnp.arange(b)[:, None] * pages_per_row
            + jnp.arange(pages_per_row)[None]
        )
        table = table.at[:, :pages_per_row].set(row_pages)
        next_free = jnp.asarray(b * pages_per_row, jnp.int32)
    return PagedKVCacheInt8(
        k_pages=k_i8, v_pages=v_i8, k_scale=k_s, v_scale=v_s,
        page_table=table, length=cache.length + 0,
        next_free=next_free,
    )


def allocate_pages_int8(cache: PagedKVCacheInt8, tokens: jnp.ndarray):
    """Same sequential allocator, operating on the int8 table fields."""
    cache, over = allocate_pages_int8_checked(cache, tokens)
    if not isinstance(over, jax.core.Tracer) and bool(over):
        raise ValueError(
            f"paged KV overflow: pool used {int(cache.next_free)}"
            f"/{cache.k_pages.shape[1]} pages "
            f"(max {cache.page_table.shape[1]} pages/seq)"
        )
    return cache


def allocate_pages_int8_checked(cache: PagedKVCacheInt8, tokens: jnp.ndarray):
    """Checked int8 twin -> (cache, overflowed traced bool)."""
    proxy = PagedKVCache(
        k_pages=cache.k_pages, v_pages=cache.v_pages,
        page_table=cache.page_table, length=cache.length,
        next_free=cache.next_free,
    )
    proxy, over = allocate_pages_checked(proxy, tokens)
    return (
        cache._replace(page_table=proxy.page_table, next_free=proxy.next_free),
        over,
    )


def append_token_kv_int8(
    cache: PagedKVCacheInt8,
    layer: jnp.ndarray,
    k: jnp.ndarray,          # [B, Hkv, Dh] new token K (bf16/f32)
    v: jnp.ndarray,
) -> PagedKVCacheInt8:
    ps = cache.page_size
    page_slot = cache.length // ps
    page_idx = jnp.take_along_axis(
        cache.page_table, page_slot[:, None], axis=1
    )[:, 0]
    offset = cache.length % ps

    # ONE batched scatter per tensor — see append_token_kv: both the
    # slice-out/write-back and the per-row scan forms re-materialized
    # pool-sized buffers per call.
    def write(pages, scales, val):
        vals, s = _quantize_kv(val)
        if vals.shape[0] == 1:
            # Single row: scalar-start DUS instead of an HLO scatter — see
            # append_token_kv (the round-3 answer-p50 regression).
            pages = jax.lax.dynamic_update_slice(
                pages, vals[0][None, None, :, None, :],
                (layer, page_idx[0], 0, offset[0], 0),
            )
            scales = jax.lax.dynamic_update_slice(
                scales, s[0][None, None, :, None],
                (layer, page_idx[0], 0, offset[0]),
            )
            return pages, scales
        pages = pages.at[layer, page_idx, :, offset].set(vals)
        scales = scales.at[layer, page_idx, :, offset].set(s)
        return pages, scales

    kp, ks = write(cache.k_pages, cache.k_scale, k)
    vp, vs = write(cache.v_pages, cache.v_scale, v)
    return cache._replace(k_pages=kp, k_scale=ks, v_pages=vp, v_scale=vs)


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def paged_decode_attention_int8(
    q: jnp.ndarray,            # [B, H, 1, Dh]
    k_pages: jnp.ndarray,      # [num_pages, Hkv, ps, Dh] int8 (one layer)
    v_pages: jnp.ndarray,
    k_scale: jnp.ndarray,      # [num_pages, Hkv, ps] f32
    v_scale: jnp.ndarray,
    page_table: jnp.ndarray,
    length: jnp.ndarray,
    sm_scale: float | None = None,
) -> jnp.ndarray:
    b, hq, _, d = q.shape
    hkv, ps = k_pages.shape[1], k_pages.shape[2]
    if sm_scale is None:
        sm_scale = d ** -0.5
    safe = jnp.maximum(page_table, 0)
    maxp = page_table.shape[1]

    def tokord(pages):                        # [B, maxp, Hkv, ps, ...] -> token order
        g = pages[safe]
        g = jnp.moveaxis(g, 2, 1)             # [B, Hkv, maxp, ps, ...]
        return g.reshape((b, hkv, maxp * ps) + g.shape[4:])

    k = tokord(k_pages).astype(jnp.float32)   # int8 -> f32 values (in-reg)
    v = tokord(v_pages).astype(jnp.float32)
    ks = tokord(k_scale)                      # [B, Hkv, L]
    vs = tokord(v_scale)

    g = hq // hkv
    qg = q.reshape(b, hkv, g, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhld->bhgl", qg, k) * ks[:, :, None, :] * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, maxp * ps), 3)
    s = jnp.where(col < length[:, None, None, None], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgl,bhld->bhgd", p * vs[:, :, None, :], v)
    return o.reshape(b, hq, 1, d).astype(q.dtype)


def decode_step_paged_int8(
    params, cfg, token_ids: jnp.ndarray, cache: "PagedKVCacheInt8",
    positions: Optional[jnp.ndarray] = None,
    sequential_pages: bool = False,
):
    """Int8-cache twin of decode_step_paged -> (logits [B, V], cache)."""
    from streamchat_tpu.models import decoder

    b = token_ids.shape[0]
    x = decoder.embed_tokens(params, token_ids)[:, None, :]
    if positions is None:
        positions = cache.length
    positions = positions[:, None]
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    for i, p in enumerate(params["layers"]):
        h = decoder.rmsnorm(x, p["input_norm"], cfg.rms_eps)
        q, k, v = decoder.qkv_proj(h, p["attn"], b, 1, hq, hkv, dh)
        q = decoder.rope(q, positions, cfg.rope_theta)
        k = decoder.rope(k, positions, cfg.rope_theta)
        cache = append_token_kv_int8(cache, i, k[:, :, 0], v[:, :, 0])
        if jax.default_backend() == "tpu" and _use_seq_kernel(sequential_pages):
            # Identity/partitioned row-order pool: seq_pool_block-page
            # all-head blocks, static per-head scale slices (no one-hot) —
            # see decode_step_paged.
            from streamchat_tpu.ops.paged_attention import (
                paged_decode_attention_pallas_seq_int8,
                seq_pool_block,
            )

            o = paged_decode_attention_pallas_seq_int8(
                q, cache.k_pages[i], cache.v_pages[i],
                cache.k_scale[i], cache.v_scale[i], cache.length + 1,
                pages_per_block=seq_pool_block(cache.k_pages.shape[1] // b),
            )
        elif jax.default_backend() == "tpu":
            from streamchat_tpu.ops.paged_attention import (
                paged_decode_attention_pallas_int8,
            )

            o = paged_decode_attention_pallas_int8(
                q, cache.k_pages[i], cache.v_pages[i],
                cache.k_scale[i], cache.v_scale[i],
                cache.page_table, cache.length + 1,
            )
        else:
            o = paged_decode_attention_int8(
                q, cache.k_pages[i], cache.v_pages[i],
                cache.k_scale[i], cache.v_scale[i],
                cache.page_table, cache.length + 1,
            )
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, hq * dh)
        x = x + decoder._proj(o, p["attn"]["o"])
        hmid = decoder.rmsnorm(x, p["post_norm"], cfg.rms_eps)
        x = x + decoder.mlp_block(hmid, p["mlp"])

    x = decoder.rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = decoder.logits_from_hidden(params, cfg, x)[:, 0]
    return logits, cache._replace(length=cache.length + 1)
