"""Causal decoder core shared by LongVA's Qwen2-7B backbone and the LLaMA-3-8B
judge.

The reference vendors two full HF model trees for these
(`longva/model/language_model/llava_qwen.py`, judge via HF LlamaForCausalLM)
and runs every generate call with `use_cache=False` — re-prefilling the whole
prompt per decoded token (inference_streaming_longva_v2.py:150,257). Here one
functional decoder covers both architectures (config-driven: qkv bias, GQA
ratio, rope theta, vocab) and decode always runs against a preallocated KV
cache.

TPU-first choices:
* Prefill attention = the Pallas flash kernel (ops/attention.py); decode =
  one [H, L] matvec vs the cache (bandwidth-bound; XLA-optimal).
* KV cache is a static-shape ring of [L, B, Hkv, Lmax, Dh] updated with
  dynamic_update_slice — no retracing as length grows; `length` is a traced
  scalar per batch row.
* RoPE cos/sin computed on the fly from positions (fuses into the rotation;
  no host-side cache tables).
* bf16 weights/activations, f32 for RMSNorm / RoPE / softmax / logits.
* Weights stored as separate q/k/v/o and gate/up/down matrices so tensor
  parallelism can shard heads / ffn without re-layout.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from streamchat_tpu.config import DecoderConfig
from streamchat_tpu.ops.attention import decode_attention, prefill_attention

Params = Dict[str, Any]


class KVCache(NamedTuple):
    """Preallocated per-layer key/value store.

    k, v: [num_layers, B, Hkv, Lmax, Dh]; length: [B] valid entries.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray

    @classmethod
    def create(cls, cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((batch,), jnp.int32),
        )


class Int8KVCache(NamedTuple):
    """Dense KV cache stored int8 with per-(token, head) f32 scales.

    Same [L, B, Hkv, Lmax, Dh] layout as KVCache but HALF the HBM: a 23k-token
    Qwen2-7B cache is ~1.35 GB instead of ~2.7. Used for long kv_int8 chunked
    prefills so the dense prefill transient never exists in bf16 — the values
    are quantized exactly like paged_kv._quantize_kv, so repaging to
    PagedKVCacheInt8 afterwards is a pure layout shuffle. Later chunks attend
    to a per-layer dequantized view (~50 MB transient), which matches the
    precision decode would see from the int8 pages anyway.
    """

    k: jnp.ndarray            # int8 [L, B, Hkv, Lmax, Dh]
    v: jnp.ndarray
    k_s: jnp.ndarray          # f32 [L, B, Hkv, Lmax]
    v_s: jnp.ndarray
    length: jnp.ndarray       # [B]

    @classmethod
    def create(cls, cfg: DecoderConfig, batch: int, max_len: int):
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
        return cls(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_s=jnp.ones(shape[:-1], jnp.float32),
            v_s=jnp.ones(shape[:-1], jnp.float32),
            length=jnp.zeros((batch,), jnp.int32),
        )


def rmsnorm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(x.dtype)


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, HF rotate-half convention. x: [B, H, S, Dh]."""
    dh = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    ang = positions[:, None, :, None].astype(jnp.float32) * inv_freq  # [B,1,S,Dh/2]
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., :dh // 2], x32[..., dh // 2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def init(key: jax.Array, cfg: DecoderConfig, dtype=jnp.bfloat16) -> Params:
    d, dh = cfg.hidden_size, cfg.head_dim
    hq, hkv, f = cfg.num_heads, cfg.num_kv_heads, cfg.intermediate_size
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))

    def mat(kin, kout):
        return (jax.random.normal(next(keys), (kin, kout)) * kin**-0.5).astype(dtype)

    layers = []
    for _ in range(cfg.num_layers):
        layer = {
            "input_norm": jnp.ones((d,), dtype),
            "attn": {
                "q": {"w": mat(d, hq * dh)},
                "k": {"w": mat(d, hkv * dh)},
                "v": {"w": mat(d, hkv * dh)},
                "o": {"w": mat(hq * dh, d)},
            },
            "post_norm": jnp.ones((d,), dtype),
            "mlp": {
                "gate": mat(d, f),
                "up": mat(d, f),
                "down": mat(f, d),
            },
        }
        if cfg.qkv_bias:
            layer["attn"]["q"]["b"] = jnp.zeros((hq * dh,), dtype)
            layer["attn"]["k"]["b"] = jnp.zeros((hkv * dh,), dtype)
            layer["attn"]["v"]["b"] = jnp.zeros((hkv * dh,), dtype)
        layers.append(layer)

    params = {
        "embed": (jax.random.normal(next(keys), (cfg.vocab_size, d)) * 0.02).astype(dtype),
        "layers": layers,
        "final_norm": jnp.ones((d,), dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = mat(d, cfg.vocab_size)
    return params


def _proj(x, p):
    from streamchat_tpu.ops.quant import qmatmul, qmatmul_int4

    # p is {"w": [in,out](, "b")}, the int8 weight-only form
    # {"w_i8": int8, "scale": f32(, "b")}, or the group-128 int4 form
    # {"w_i4p": int4, "scale": f32[g,out](, "b")} (ops/quant.py) — decode
    # reads the full parameter set per token, so narrower weight storage
    # directly divides the HBM-roofline latency.
    if "w_i4p" in p:
        y = qmatmul_int4(x, p)
    elif "w_i8" in p:
        y = qmatmul(x, p)
    else:
        y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _mm(x, w):
    """x @ w where w may be a plain array or a quantized dict."""
    from streamchat_tpu.ops.quant import matmul_any

    return matmul_any(x, w)


def qkv_proj(h, attn, b, s, hq, hkv, dh):
    """q/k/v projections -> ([B,Hq,S,Dh], [B,Hkv,S,Dh], [B,Hkv,S,Dh]).

    With an int4 tree the three share ONE fused kernel launch (they read the
    same normed hidden state): a 7B decode step otherwise issues 196 matvec
    kernels and per-launch overhead is a measurable slice of the step
    (ops/quant.qmatmul_int4_multi; the fused call also shares the 8-row pad).
    """
    pq, pk, pv = attn["q"], attn["k"], attn["v"]
    if all(isinstance(pp, dict) and "w_i4p" in pp for pp in (pq, pk, pv)):
        from streamchat_tpu.ops.quant import qmatmul_int4_multi

        qy, ky, vy = qmatmul_int4_multi(h, (pq, pk, pv))
        if "b" in pq:
            qy, ky, vy = qy + pq["b"], ky + pk["b"], vy + pv["b"]
    else:
        qy, ky, vy = _proj(h, pq), _proj(h, pk), _proj(h, pv)
    return (
        qy.reshape(b, s, hq, dh).transpose(0, 2, 1, 3),
        ky.reshape(b, s, hkv, dh).transpose(0, 2, 1, 3),
        vy.reshape(b, s, hkv, dh).transpose(0, 2, 1, 3),
    )


def mlp_block(h, mlp):
    """SwiGLU MLP: silu(h @ gate) * (h @ up) @ down, gate/up fused for int4
    trees (one kernel launch instead of two — see qkv_proj)."""
    pg, pu = mlp["gate"], mlp["up"]
    if (
        isinstance(pg, dict) and "w_i4p" in pg
        and isinstance(pu, dict) and "w_i4p" in pu
    ):
        from streamchat_tpu.ops.quant import qmatmul_int4_multi

        gy, uy = qmatmul_int4_multi(h, (pg, pu))
    else:
        gy, uy = _mm(h, pg), _mm(h, pu)
    gated = jax.nn.silu(gy.astype(jnp.float32)).astype(h.dtype)
    return _mm(gated * uy, mlp["down"])


def _chunk_cache_attention(
    q: jnp.ndarray,          # [B, Hq, C, Dh] this chunk's queries
    k_cache: jnp.ndarray,    # [B, Hkv, Lmax, Dh] cache incl. this chunk
    v_cache: jnp.ndarray,
    q_offset: jnp.ndarray,   # [] global position of the chunk's first query
    kv_length: jnp.ndarray,  # [B] valid cache tokens (incl. this chunk)
) -> jnp.ndarray:
    """Causal attention of a mid-prompt chunk against the whole cache.

    The chunked-prefill primitive: global causal mask col <= q_offset + row,
    keys masked past kv_length. Pallas partial kernel on TPU (normalized
    here), XLA reference elsewhere.
    """
    b, hq, c, d = q.shape
    sm_scale = d ** -0.5
    lmax = k_cache.shape[2]
    if (jax.default_backend() == "tpu" and c % 128 == 0 and lmax % 128 == 0):
        from streamchat_tpu.ops.attention import flash_attention_partial

        acc, _, l = flash_attention_partial(
            q, k_cache, v_cache, q_offset, jnp.asarray(0), kv_length,
            causal=True, sm_scale=sm_scale,
        )
        l_safe = jnp.where(l == 0.0, 1.0, l)
        return (acc / l_safe[..., None]).astype(q.dtype)
    hkv = k_cache.shape[1]
    k = jnp.repeat(k_cache, hq // hkv, axis=1).astype(jnp.float32)
    v = jnp.repeat(v_cache, hq // hkv, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k) * sm_scale
    rows = q_offset + jax.lax.broadcasted_iota(jnp.int32, (c, lmax), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, lmax), 1)
    s = jnp.where((cols <= rows)[None, None], s, -1e30)
    s = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, lmax), 3)
        < kv_length[:, None, None, None], s, -1e30,
    )
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v).astype(q.dtype)


def _layer(
    x: jnp.ndarray,
    p: Params,
    cfg: DecoderConfig,
    positions: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    start: jnp.ndarray,
    kv_length: jnp.ndarray,
    decode: bool,
    chunked: bool = False,
    cache_ks: jnp.ndarray | None = None,
    cache_vs: jnp.ndarray | None = None,
    kv_view: int | None = None,
):
    """One transformer block. Returns (x, new_k, new_v, new_ks, new_vs);
    the scale entries are None unless the cache is int8.

    cache_k/v: [B, Hkv, Lmax, Dh]; start: [B] write offset (== cache length
    before this call); kv_length: [B] valid KV length *after* writing.
    chunked: mid-prompt prefill chunk — attend causally against the WHOLE
    cache (previous chunks included) instead of just the fresh block.
    cache_ks/vs: [B, Hkv, Lmax] f32 scales — present iff the cache stores
    int8 values (Int8KVCache); fresh K/V are then quantized on write and
    attention reads a per-layer dequantized view.
    """
    b, s, d = x.shape
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = rmsnorm(x, p["input_norm"], cfg.rms_eps)
    q, k, v = qkv_proj(h, p["attn"], b, s, hq, hkv, dh)
    q = rope(q, positions, cfg.rope_theta)
    k = rope(k, positions, cfg.rope_theta)

    # Write new K/V into the cache at each row's own offset (rows may hold
    # different prompt lengths in a batch; a shared start[0] offset would
    # misplace every other row's decode token).
    def write_row(cache_row, kv_row, idx):
        return jax.lax.dynamic_update_slice(cache_row, kv_row, (0, idx, 0))

    int8_cache = cache_ks is not None
    if int8_cache:
        from streamchat_tpu.models.paged_kv import _quantize_kv

        k_i8, k_sc = _quantize_kv(k)            # int8 [B,Hkv,S,Dh], f32 [B,Hkv,S]
        v_i8, v_sc = _quantize_kv(v)
        new_k = jax.vmap(write_row)(cache_k, k_i8, start)
        new_v = jax.vmap(write_row)(cache_v, v_i8, start)

        def write_scale(row, sc, idx):
            return jax.lax.dynamic_update_slice(row, sc, (0, idx))

        new_ks = jax.vmap(write_scale)(cache_ks, k_sc, start)
        new_vs = jax.vmap(write_scale)(cache_vs, v_sc, start)
    else:
        new_k = jax.vmap(write_row)(cache_k, k.astype(cache_k.dtype), start)
        new_v = jax.vmap(write_row)(cache_v, v.astype(cache_v.dtype), start)
        new_ks = new_vs = None

    # Attention view. Chunked prefill passes a STATIC kv_view bound — the
    # chunk's causal horizon off+width, 128-aligned (the chunk loop is
    # unrolled, so each chunk's bound is a Python int): the flash grid and
    # the int8 dequant then cover only LIVE keys instead of the full Lmax.
    # Without it, chunk 0 of a 23k-token prompt streams ~95% dead kv blocks
    # and every chunk re-dequantizes the whole cache.
    if kv_view is not None and not decode:
        sel_k = jax.lax.slice_in_dim(new_k, 0, kv_view, axis=2)
        sel_v = jax.lax.slice_in_dim(new_v, 0, kv_view, axis=2)
        sel_ks = (jax.lax.slice_in_dim(new_ks, 0, kv_view, axis=2)
                  if int8_cache else None)
        sel_vs = (jax.lax.slice_in_dim(new_vs, 0, kv_view, axis=2)
                  if int8_cache else None)
    else:
        sel_k, sel_v, sel_ks, sel_vs = new_k, new_v, new_ks, new_vs
    if int8_cache:
        # Dequantized per-layer view for attention (~50 MB at 7B/23k — the
        # whole point is never materializing the full bf16 cache).
        kd = (sel_k.astype(jnp.float32) * sel_ks[..., None]).astype(k.dtype)
        vd = (sel_v.astype(jnp.float32) * sel_vs[..., None]).astype(v.dtype)
    else:
        kd, vd = sel_k, sel_v

    if decode:
        o = decode_attention(q, kd, vd, kv_length)
    elif chunked:
        o = _chunk_cache_attention(q, kd, vd, start[0], kv_length)
    else:
        # Prefill: attend within the freshly written window (start == 0 for a
        # fresh cache; kv_length masks padding).
        o = prefill_attention(q, k, v, kv_length, causal=True)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, hq * dh)
    x = x + _proj(o, p["attn"]["o"])

    h = rmsnorm(x, p["post_norm"], cfg.rms_eps)
    x = x + mlp_block(h, p["mlp"])
    return x, new_k, new_v, new_ks, new_vs


def forward(
    params: Params,
    cfg: DecoderConfig,
    embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    seq_length: jnp.ndarray,
    *,
    decode: bool,
    chunked: bool = False,
    kv_view: int | None = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Run the stack over input embeddings.

    embeds: [B, S, D]; positions: [B, S]; seq_length: [B] — number of valid
    tokens in `embeds` (rest is padding). Returns (hidden [B, S, D], cache).
    kv_view: static upper bound on live cache tokens for THIS call's
    attention (chunked prefill's causal horizon; see _layer).
    """
    start = cache.length
    kv_length = cache.length + seq_length
    x = embeds
    # Update the stacked cache in place per layer (XLA aliases the
    # .at[i].set chain) instead of accumulating a list and stacking at the
    # end — the list+stack form transiently held BOTH the input cache and a
    # full copy (~2.7 GB extra at 7B/23k ctx, enough to OOM the 16 GB chip
    # during long caption prefills).
    int8_cache = isinstance(cache, Int8KVCache)
    ck, cv = cache.k, cache.v
    cks, cvs = (cache.k_s, cache.v_s) if int8_cache else (None, None)
    for i, p in enumerate(params["layers"]):
        x, nk, nv, nks, nvs = _layer(
            x, p, cfg, positions, ck[i], cv[i], start, kv_length, decode,
            chunked,
            cache_ks=cks[i] if int8_cache else None,
            cache_vs=cvs[i] if int8_cache else None,
            kv_view=kv_view,
        )
        ck = jax.lax.dynamic_update_index_in_dim(ck, nk.astype(ck.dtype), i, 0)
        cv = jax.lax.dynamic_update_index_in_dim(cv, nv.astype(cv.dtype), i, 0)
        if int8_cache:
            cks = jax.lax.dynamic_update_index_in_dim(cks, nks, i, 0)
            cvs = jax.lax.dynamic_update_index_in_dim(cvs, nvs, i, 0)
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    if int8_cache:
        return x, Int8KVCache(k=ck, v=cv, k_s=cks, v_s=cvs, length=kv_length)
    return x, KVCache(k=ck, v=cv, length=kv_length)


def logits_from_hidden(params: Params, cfg: DecoderConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    from streamchat_tpu.ops.quant import is_quantized

    if cfg.tie_embeddings and is_quantized(params["embed"]):
        raise NotImplementedError(
            "tied embeddings with an int8 table would double quantization "
            "error through the logits; quantize_embed is for untied models"
        )
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    if isinstance(head, dict) and "w_i4p" in head:
        from streamchat_tpu.ops.quant import qmatmul_int4

        return qmatmul_int4(hidden.astype(jnp.float32), head)
    if is_quantized(head):
        y = jax.lax.dot_general(
            hidden.astype(jnp.float32),
            head["w_i8"].astype(jnp.float32),
            (((hidden.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y * head["scale"]
    return (hidden.astype(jnp.float32) @ head.astype(jnp.float32))


def embed_tokens(params: Params, token_ids: jnp.ndarray) -> jnp.ndarray:
    """Reference `model.get_model().embed_tokens` equivalent.

    Supports the int8-row table from ops/quant.quantize_embedding: rows are
    gathered in int8 and dequantized per row (one scale gather), emitted
    bf16 — halves the 1.09 GB Qwen2 table's residency."""
    emb = params["embed"]
    if isinstance(emb, dict):
        rows = jnp.take(emb["w_i8"], token_ids, axis=0).astype(jnp.float32)
        scale = jnp.take(emb["scale"], token_ids, axis=0)
        return (rows * scale[..., None]).astype(jnp.bfloat16)
    return jnp.take(emb, token_ids, axis=0)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def prefill(
    params: Params,
    cfg: DecoderConfig,
    embeds: jnp.ndarray,
    cache: KVCache,
    seq_length: jnp.ndarray,
) -> Tuple[jnp.ndarray, KVCache]:
    """Prefill a (padded) prompt of embeddings; returns (last-token logits, cache)."""
    b, s, _ = embeds.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    hidden, cache = forward(
        params, cfg, embeds, positions, cache, seq_length, decode=False
    )
    last = jnp.take_along_axis(
        hidden, (seq_length - 1)[:, None, None].astype(jnp.int32), axis=1
    )  # [B, 1, D]
    return logits_from_hidden(params, cfg, last)[:, 0], cache


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def decode_step(
    params: Params,
    cfg: DecoderConfig,
    token_ids: jnp.ndarray,
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step for token_ids [B]; returns (logits [B, V], cache)."""
    b = token_ids.shape[0]
    embeds = embed_tokens(params, token_ids)[:, None, :]
    positions = cache.length[:, None]
    hidden, cache = forward(
        params, cfg, embeds, positions, cache,
        jnp.ones((b,), jnp.int32), decode=True,
    )
    return logits_from_hidden(params, cfg, hidden)[:, 0], cache


def prefill_chunked(
    params: Params,
    cfg: DecoderConfig,
    embeds: jnp.ndarray,        # [B, S, D] padded prompt
    cache: KVCache,
    seq_length: jnp.ndarray,    # [B] valid tokens
    *,
    chunk: int = 4096,
) -> Tuple[jnp.ndarray, KVCache]:
    """Long-prompt prefill in bounded-activation chunks -> (logits, cache).

    A 23k-token prompt's MLP intermediates alone are ~2.6 GB at 7B geometry;
    processing `chunk` tokens at a time against the growing cache caps the
    activation peak at chunk/S of that while producing the same cache and
    next-token logits (chunk attention is causal against the WHOLE cache via
    _chunk_cache_attention). Requires a fresh cache (length 0); batch rows
    must share the chunk containing their last token (B=1 — the streaming
    pipeline's case — always qualifies). Standard chunked-prefill serving
    semantics.
    """
    b, s, _ = embeds.shape
    if s <= chunk:
        return prefill(params, cfg, embeds, cache, seq_length)
    # Pad only to the 128 flash-block multiple and process the remainder as a
    # PARTIAL final chunk. (Padding the prompt to a full `chunk` multiple —
    # the round-2 behavior — wrote up to chunk-1 extra KV rows past the
    # caller's 128-aligned Lmax; the clamped dynamic_update_slice then
    # silently overwrote valid early-prompt KV for any >threshold prompt that
    # wasn't a chunk multiple, e.g. the ~23k-token v0.3 caption contexts.)
    lmax = cache.k.shape[3]
    if lmax < s:
        raise ValueError(
            f"prefill_chunked: cache Lmax={lmax} < prompt length {s}; "
            "size the cache to at least the (128-rounded) prompt length"
        )
    s128 = -(-s // 128) * 128
    if s128 > s and lmax >= s128:
        # Best-effort 128 alignment keeps every chunk (tail included) on the
        # Pallas partial-flash path on TPU; production caches are 128-aligned
        # so this always fires there. A smaller cache still computes
        # correctly via the XLA fallback in _chunk_cache_attention.
        embeds = jnp.pad(embeds, ((0, 0), (0, s128 - s), (0, 0)))
        s = s128
    offsets = list(range(0, s, chunk))
    final_off = offsets[-1]
    final_width = s - final_off
    hidden_last = None
    for off in offsets:
        width = min(chunk, s - off)          # final chunk may be partial
        blk = jax.lax.slice_in_dim(embeds, off, off + width, axis=1)
        positions = jnp.broadcast_to(
            off + jnp.arange(width, dtype=jnp.int32)[None], (b, width)
        )
        # Every chunk writes at its uniform offset; rows shorter than the
        # running offset write garbage that causal masking keeps invisible
        # (a valid query at p < seq_length only sees cols <= p).
        cache = cache._replace(length=jnp.full((b,), off, jnp.int32))
        hidden, cache = forward(
            params, cfg, blk, positions, cache,
            jnp.full((b,), width, jnp.int32),
            decode=False, chunked=off > 0,
            # Static causal horizon: this chunk sees exactly off+width live
            # keys (128-aligned by construction) — the flash grid and int8
            # dequant shrink to it instead of covering the full Lmax.
            kv_view=off + width if off > 0 else None,
        )
        if off == final_off:
            hidden_last = hidden             # [B, final_width, D], post-norm
    # kv_length must reflect the true ragged lengths for decoding. Garbage
    # K/V written past each row's seq_length were never visible in-loop
    # (causal: valid queries sit strictly before them) and are masked for
    # decode by the length reset here.
    cache = cache._replace(length=seq_length.astype(jnp.int32))
    last_pos = (seq_length - 1).astype(jnp.int32)
    # Next-token logits. Fast path: every row's last token sits in the FINAL
    # chunk (always true for B=1 prompts bucketed to <= chunk, i.e. the
    # production caption/answer paths) — reuse that chunk's hidden states.
    # Fallback: re-run a chunk-sized window over the completed cache (a
    # clamped window still contains the row's last token and recomputes
    # identical K/V for the overlap it rewrites into the scratch copy). The
    # fallback forward costs a full extra chunk (~30% of a bucketed-prompt
    # prefill), which is why it sits behind the cond.
    in_final = jnp.all(last_pos >= final_off)

    def reuse(_):
        idx = jnp.clip(last_pos - final_off, 0, final_width - 1)
        return jnp.take_along_axis(hidden_last, idx[:, None, None], axis=1)

    def rerun(_):
        win = jnp.minimum((last_pos // chunk) * chunk, s - chunk)
        blk = jax.vmap(
            lambda e, o: jax.lax.dynamic_slice_in_dim(e, o, chunk, axis=0)
        )(embeds, win)
        positions = win[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None]
        scratch = cache._replace(length=win)
        hid, _ = forward(
            params, cfg, blk, positions, scratch,
            jnp.full((b,), chunk, jnp.int32), decode=False, chunked=True,
        )
        return jnp.take_along_axis(hid, (last_pos - win)[:, None, None], axis=1)

    last = jax.lax.cond(in_final, reuse, rerun, None)
    return logits_from_hidden(params, cfg, last)[:, 0], cache
