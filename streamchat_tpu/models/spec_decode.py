"""Speculative decoding over the paged KV cache (prompt-lookup drafting).

Decode at 7B is weight-bandwidth bound (~10.5 ms/token int8 on one v5e:
every step reads all 7.6 GB of weights to produce ONE token). A verify step
that feeds T tokens through the same matmuls costs nearly the same HBM
traffic as a single-token step, so any accepted draft tokens are almost
free. This module adds self-contained speculative decoding to
models/generate_paged:

* **Drafting** is prompt-lookup (n-gram) — no draft model: the last `ngram`
  emitted tokens are matched against a history (an optional caller-supplied
  lookup corpus, e.g. the question + retrieved captions the answer will
  quote, plus everything generated so far) and the continuation of the most
  recent match is proposed. Runs entirely on device with static shapes.
* **Verification** is exact. Greedy (temperature==0) output is
  token-identical to the vanilla loop: a draft survives only while it equals
  the model's own argmax. Temperature sampling uses the standard
  rejection-sampling acceptance for a deterministic proposal q = delta(d):
  accept d_j with probability P_j(d_j); on rejection the next token is drawn
  from the residual distribution (P with d zeroed, renormalized) — realized
  by masking d out of the logits the outer loop samples from next. The
  emitted distribution equals vanilla sampling exactly (Leviathan et al.'s
  argument specialized to a point-mass draft).
* **KV handling** is TPU-native: the T tokens' K/V are STAGED per layer
  (a [L, B, Hkv, T, Dh] stack — ~230 KB at 7B/T=8) and attention runs in
  two parts — the paged pool read directly in its page layout via einsum
  (no gather, no transpose copy) merged with the staged block under one
  softmax — then ALL T tokens are committed with one dynamic-update-slice
  per token spanning every layer at once (the pool layout [L, P, H, ps, D]
  makes a token's slot contiguous across layers). Rejected tokens' KV is
  written too: slots past `length` are masked out of every read and are
  overwritten before `length` ever reaches them, so no rollback is needed.

The reference has no speculative decoding of any kind — its generate calls
run with use_cache=False (inference_streaming_longva_v2.py:150,257), i.e.
every token re-prefills the context. This is a beyond-reference serving
feature; `scripts/probe_spec.py` measures the verify-step cost and the
accepted-tokens/step -> speedup curve on the real chip.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from streamchat_tpu.models.paged_kv import (
    PagedKVCache,
    PagedKVCacheInt8,
    _quantize_kv,
)
from streamchat_tpu.ops.attention import DEFAULT_MASK_VALUE


# ---------------------------------------------------------------------------
# Prompt-lookup (n-gram) drafting
# ---------------------------------------------------------------------------


def ngram_propose(
    hist: jnp.ndarray,        # [B, H] int32 token history (junk past hist_len)
    hist_len: jnp.ndarray,    # [B] valid tokens per row
    *,
    ngram: int,
    num_draft: int,
    min_ngram: int = 2,
) -> jnp.ndarray:
    """Propose `num_draft` tokens per row from the most recent n-gram match.

    Multi-scale: n runs from `ngram` (longest, most reliable) down to
    `min_ngram`; the first scale with a match wins, and within a scale the
    LAST match wins (most recent context). A match at position i means
    hist[i:i+n] == the last n valid tokens, with at least one continuation
    token strictly inside the valid region (the trivial self-match is
    excluded by the same bound). Rows with no match at any scale — or
    proposal slots past the valid region — fall back to repeating the final
    token (a cheap guess that is free when wrong: verification pays one
    masked lane, not a step).
    """
    b, h = hist.shape
    last_tok = jnp.take_along_axis(
        hist, jnp.maximum(hist_len - 1, 0)[:, None], axis=1
    )  # [B, 1]

    max_n = max(ngram, 1)
    min_n = max(min(min_ngram, max_n), 1)
    padded = jnp.pad(hist, ((0, 0), (0, max_n + num_draft)), constant_values=-1)
    pos = jnp.arange(h, dtype=jnp.int32)[None]                  # [1, H]

    found = jnp.zeros((b,), bool)
    start = jnp.zeros((b,), jnp.int32)
    for n in range(max_n, min_n - 1, -1):
        # suffix[:, j] = hist[hist_len - n + j]
        suf_idx = hist_len[:, None] - n + jnp.arange(n)[None]
        suffix = jnp.take_along_axis(hist, jnp.maximum(suf_idx, 0), axis=1)
        match = pos + n < hist_len[:, None]                     # room to copy
        for j in range(n):
            match = jnp.logical_and(
                match, padded[:, j:j + h] == suffix[:, j:j + 1]
            )
        match = jnp.logical_and(match, (hist_len >= n + 1)[:, None])
        last_i = jnp.max(jnp.where(match, pos, -1), axis=1)     # [B]
        hit = last_i >= 0
        take = jnp.logical_and(hit, ~found)                     # longest wins
        start = jnp.where(take, last_i + n, start)
        found = jnp.logical_or(found, hit)

    draft = jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s,), (num_draft,))
    )(padded, start)                                            # [B, num_draft]
    # Slots outside the valid region (or no match at all) repeat last_tok.
    valid = jnp.logical_and(
        found[:, None],
        start[:, None] + jnp.arange(num_draft)[None] < hist_len[:, None],
    )
    return jnp.where(valid, draft, last_tok).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Multi-token verify step against the paged pool
# ---------------------------------------------------------------------------


def _spec_attention(
    q: jnp.ndarray,           # [B, Hq, T, Dh]
    pool_k,                   # [P, Hkv, ps, Dh] (one layer; int8 or bf16)
    pool_v,
    scale_k,                  # [P, Hkv, ps] f32 or None
    scale_v,
    length: jnp.ndarray,      # [B] valid pool tokens per row
    fresh_k: jnp.ndarray,     # [B, Hkv, T, Dh] this block's keys (post-RoPE)
    fresh_v: jnp.ndarray,
    sm_scale: float,
) -> jnp.ndarray:
    """Two-part attention: paged pool + the staged T-token block, merged
    with the online-softmax rescale.

    Requires a row-ordered pool (row r owns the contiguous page slice
    [r*maxp, (r+1)*maxp)) — true for every mode generate_paged admits into
    the spec loop (single-row sequential pools and statically partitioned
    batched pools).

    On TPU the pool part runs the sequential-pool Pallas kernel in
    multi-query partial mode (ops/paged_attention.paged_seq_attention_
    partial*): fused in-register dequant, pool bytes read once. The XLA
    einsum path (CPU/tests oracle) materializes a dequantized f32 pool
    copy per call — measured ~5 GB/step of extra HBM traffic at 7B/23k
    int8, which erased the speculative speedup at long context (round 4).
    """
    b, hq, t, d = q.shape
    p_total, hkv, ps, _ = pool_k.shape
    maxp = p_total // b
    g = hq // hkv
    qg32 = q.reshape(b, hkv, g, t, d).astype(jnp.float32)

    # --- pool part -> UNNORMALIZED (acc, m, l) per (head, block token) ---
    if jax.default_backend() == "tpu":
        from streamchat_tpu.ops.paged_attention import (
            paged_seq_attention_partial,
            paged_seq_attention_partial_int8,
            seq_pool_block,
        )

        pb = seq_pool_block(maxp)
        if scale_k is not None:
            acc_p, m_p, l_p = paged_seq_attention_partial_int8(
                q, pool_k, pool_v, scale_k, scale_v, length,
                sm_scale=sm_scale, pages_per_block=pb,
            )
        else:
            acc_p, m_p, l_p = paged_seq_attention_partial(
                q, pool_k, pool_v, length,
                sm_scale=sm_scale, pages_per_block=pb,
            )
        acc_p = acc_p.reshape(b, hkv, g, t, d)
        m_p = m_p.reshape(b, hkv, g, t)
        l_p = l_p.reshape(b, hkv, g, t)
    else:
        kp = pool_k.reshape(b, maxp, hkv, ps, d)
        # [B,Hkv,g,T,maxp,ps]: batch dims (b, hkv); page layout, no gather.
        s_pool = jnp.einsum("bhgtd,bphsd->bhgtps", qg32, kp.astype(jnp.float32))
        if scale_k is not None:
            ks = scale_k.reshape(b, maxp, hkv, ps)
            s_pool = s_pool * ks.transpose(0, 2, 1, 3)[:, :, None, None]
        s_pool = (s_pool * sm_scale).reshape(b, hkv, g, t, maxp * ps)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, maxp * ps), 4)
        s_pool = jnp.where(
            col < length[:, None, None, None, None], s_pool, DEFAULT_MASK_VALUE
        )
        m_p = jnp.max(s_pool, axis=-1)                       # [B,Hkv,g,T]
        m_p = jnp.maximum(m_p, -1e30)
        p_pool = jnp.exp(s_pool - m_p[..., None])
        l_p = jnp.sum(p_pool, axis=-1)
        if scale_v is not None:
            vs = scale_v.reshape(b, maxp, hkv, ps).transpose(0, 2, 1, 3)
            p_pool = (
                p_pool.reshape(b, hkv, g, t, maxp, ps) * vs[:, :, None, None]
            ).reshape(b, hkv, g, t, maxp * ps)
        acc_p = jnp.einsum(
            "bhgtps,bphsd->bhgtd",
            p_pool.reshape(b, hkv, g, t, maxp, ps),
            pool_v.reshape(b, maxp, hkv, ps, d).astype(jnp.float32),
        )

    # --- staged block part (tiny [T, T]) ---
    s_fresh = jnp.einsum(
        "bhgtd,bhud->bhgtu", qg32, fresh_k.astype(jnp.float32)
    ) * sm_scale                                             # [B,Hkv,g,T,T]
    tri = (jnp.arange(t)[None, :] <= jnp.arange(t)[:, None])  # u <= t
    s_fresh = jnp.where(tri[None, None, None], s_fresh, DEFAULT_MASK_VALUE)
    m_f = jnp.max(s_fresh, axis=-1)                          # [B,Hkv,g,T]
    p_f = jnp.exp(s_fresh - m_f[..., None])
    l_f = jnp.sum(p_f, axis=-1)
    acc_f = jnp.einsum("bhgtu,bhud->bhgtd", p_f, fresh_v.astype(jnp.float32))

    # --- online-softmax merge ---
    m_tot = jnp.maximum(m_p, m_f)
    a_p = jnp.exp(m_p - m_tot)[..., None]
    a_f = jnp.exp(m_f - m_tot)[..., None]
    l_tot = l_p[..., None] * a_p + l_f[..., None] * a_f
    o = (acc_p * a_p + acc_f * a_f) / l_tot
    return o.reshape(b, hq, t, d).astype(q.dtype)


def _commit_staged(cache, staged_k, staged_v, kv_int8: bool):
    """Write all T staged tokens into the pool: one DUS per token spanning
    every layer (single row), or one batched scatter per token (b > 1).

    staged_k/staged_v: [L, B, Hkv, T, Dh] post-RoPE values. Tokens past the
    accepted count are written too — their slots sit beyond `length`, are
    masked out of every read, and are overwritten before `length` reaches
    them (the caller advances `length` by the accepted count only).
    """
    L, b, hkv, t, dh = staged_k.shape
    ps = cache.page_size

    if kv_int8:
        k_i8, k_sc = _quantize_kv(staged_k)   # [L,B,Hkv,T,Dh], [L,B,Hkv,T]
        v_i8, v_sc = _quantize_kv(staged_v)
    kp, vp = cache.k_pages, cache.v_pages
    ksc = cache.k_scale if kv_int8 else None
    vsc = cache.v_scale if kv_int8 else None

    for tok in range(t):
        slot = cache.length + tok
        page_slot = slot // ps
        page_idx = jnp.take_along_axis(
            cache.page_table, page_slot[:, None], axis=1
        )[:, 0]
        offset = slot % ps
        if b == 1:
            # [L,1,Hkv,1,Dh] dynamic-update-slice with scalar starts — the
            # fast b=1 append form (models/paged_kv.append_token_kv), here
            # amortized across all layers in one op.
            def dus(pages, val):
                upd = val[:, 0, :, tok][:, None, :, None].astype(pages.dtype)
                return jax.lax.dynamic_update_slice(
                    pages, upd, (0, page_idx[0], 0, offset[0], 0)
                )

            def dus_s(scales, val):
                upd = val[:, 0, :, tok][:, None, :, None]
                return jax.lax.dynamic_update_slice(
                    scales, upd, (0, page_idx[0], 0, offset[0])
                )

            if kv_int8:
                kp, vp = dus(kp, k_i8), dus(vp, v_i8)
                ksc, vsc = dus_s(ksc, k_sc), dus_s(vsc, v_sc)
            else:
                kp, vp = dus(kp, staged_k), dus(vp, staged_v)
        else:
            # Batched rows own distinct pages: advanced-indexing scatter,
            # amortized over b (the b=1 DUS ruling targeted single rows).
            def sc(pages, val):
                return pages.at[:, page_idx, :, offset].set(
                    val[:, :, :, tok].transpose(1, 0, 2, 3).astype(pages.dtype)
                )

            def sc_s(scales, val):
                return scales.at[:, page_idx, :, offset].set(
                    val[:, :, :, tok].transpose(1, 0, 2)
                )

            if kv_int8:
                kp, vp = sc(kp, k_i8), sc(vp, v_i8)
                ksc, vsc = sc_s(ksc, k_sc), sc_s(vsc, v_sc)
            else:
                kp, vp = sc(kp, staged_k), sc(vp, staged_v)

    if kv_int8:
        return cache._replace(k_pages=kp, v_pages=vp, k_scale=ksc, v_scale=vsc)
    return cache._replace(k_pages=kp, v_pages=vp)


def decode_step_spec(
    params,
    cfg,
    token_ids: jnp.ndarray,     # [B, T]
    cache,                      # PagedKVCache | PagedKVCacheInt8 (row-ordered)
    positions: jnp.ndarray,     # [B, T] global RoPE positions
) -> Tuple[jnp.ndarray, object]:
    """Verify step: T tokens through the decoder against the paged pool
    -> (logits [B, T, V], cache with all T tokens' KV committed).

    `cache.length` is NOT advanced — the caller advances it by the accepted
    count after verification.
    """
    from streamchat_tpu.models import decoder

    kv_int8 = isinstance(cache, PagedKVCacheInt8)
    b, t = token_ids.shape
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    sm_scale = dh ** -0.5

    x = decoder.embed_tokens(params, token_ids)                 # [B, T, D]
    staged_k, staged_v = [], []

    for i, p in enumerate(params["layers"]):
        h = decoder.rmsnorm(x, p["input_norm"], cfg.rms_eps)
        q, k, v = decoder.qkv_proj(h, p["attn"], b, t, hq, hkv, dh)
        q = decoder.rope(q, positions, cfg.rope_theta)
        k = decoder.rope(k, positions, cfg.rope_theta)
        staged_k.append(k)
        staged_v.append(v)
        if kv_int8:
            # Vanilla int8 decode reads the CURRENT token's K/V back
            # quantized (append then attend); round-trip the staged block
            # so greedy outputs stay token-identical to the vanilla loop.
            ki, ks = _quantize_kv(k)
            k_att = ki.astype(jnp.float32) * ks[..., None]
            vi, vs = _quantize_kv(v)
            v_att = vi.astype(jnp.float32) * vs[..., None]
            o = _spec_attention(
                q, cache.k_pages[i], cache.v_pages[i],
                cache.k_scale[i], cache.v_scale[i],
                cache.length, k_att, v_att, sm_scale,
            )
        else:
            o = _spec_attention(
                q, cache.k_pages[i], cache.v_pages[i], None, None,
                cache.length, k, v, sm_scale,
            )
        o = o.transpose(0, 2, 1, 3).reshape(b, t, hq * dh)
        x = x + decoder._proj(o, p["attn"]["o"])
        hmid = decoder.rmsnorm(x, p["post_norm"], cfg.rms_eps)
        x = x + decoder.mlp_block(hmid, p["mlp"])

    x = decoder.rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = decoder.logits_from_hidden(params, cfg, x)         # [B, T, V]

    cache = _commit_staged(
        cache, jnp.stack(staged_k), jnp.stack(staged_v), kv_int8
    )
    return logits, cache


# ---------------------------------------------------------------------------
# The speculative decode loop
# ---------------------------------------------------------------------------


class SpecGenState(NamedTuple):
    cache: object
    pos: jnp.ndarray             # [B] next token's global position
    logits: jnp.ndarray          # [B, V] for the next token
    out_tokens: jnp.ndarray      # [B, max_new + T] (tail slots are scratch)
    written: jnp.ndarray         # [B] emitted tokens so far
    hist: jnp.ndarray            # [B, Hlk + max_new + T] lookup + emitted
    hist_len: jnp.ndarray        # [B]
    done: jnp.ndarray            # [B]
    key: jax.Array
    steps: jnp.ndarray           # [] verify steps taken (for stats)


def run_spec_decode_loop(
    params, cfg, cache, first_logits, seq_length, key, *,
    max_new_tokens: int, temperature: float, eos_ids: Tuple[int, ...],
    spec_tokens: int, spec_ngram: int,
    lookup_tokens: Optional[jnp.ndarray], lookup_len: Optional[jnp.ndarray],
    init_over, return_stats: bool = False, return_cache: bool = False,
):
    """Greedy/temperature speculative decode -> (tokens [B, max_new], count,
    over[, cache][, steps]). Token-identical (greedy) / distribution-
    identical (temperature) to models/generate_paged._run_decode_loop.

    The pool must already be sized for length + max_new + spec_tokens: every
    verify step writes its full T-token block before acceptance is known.
    """
    t_block = spec_tokens + 1
    b = seq_length.shape[0]

    def is_eos(tok):
        hit = jnp.zeros(tok.shape, bool)
        for e in eos_ids:
            hit = jnp.logical_or(hit, tok == e)
        return hit

    hlk = 0 if lookup_tokens is None else lookup_tokens.shape[1]
    hist = jnp.full((b, hlk + max_new_tokens + t_block), -1, jnp.int32)
    if lookup_tokens is not None:
        hist = hist.at[:, :hlk].set(lookup_tokens.astype(jnp.int32))
        hist_len0 = lookup_len.astype(jnp.int32)
    else:
        hist_len0 = jnp.zeros((b,), jnp.int32)

    trash_out = max_new_tokens + t_block - 1      # scratch slot, sliced off
    trash_hist = hist.shape[1] - 1
    rows = jnp.arange(b)

    def cond(st: SpecGenState):
        return jnp.any(
            jnp.logical_and(~st.done, st.written < max_new_tokens)
        )

    def body(st: SpecGenState) -> SpecGenState:
        key, k_t0, k_acc = jax.random.split(st.key, 3)
        t0 = _sample(st.logits, k_t0, temperature)
        t0 = jnp.where(st.done, cfg.pad_token_id, t0)

        # Propose drafts from history + t0.
        hist2 = st.hist.at[rows, jnp.minimum(st.hist_len, trash_hist)].set(t0)
        draft = ngram_propose(
            hist2, st.hist_len + 1, ngram=spec_ngram, num_draft=spec_tokens
        )
        tokens = jnp.concatenate([t0[:, None], draft], axis=1)   # [B, T]
        positions = st.pos[:, None] + jnp.arange(t_block)[None]

        logits_all, cache = decode_step_spec(
            params, cfg, tokens, st.cache, positions
        )                                                        # [B, T, V]

        # Acceptance: draft_j (j=1..T-1) judged against logits_all[:, j-1].
        if spec_tokens:
            judge = logits_all[:, :-1]                           # [B, T-1, V]
            if temperature <= 0.0:
                ok = draft == jnp.argmax(judge, axis=-1)
            else:
                prob = jax.nn.softmax(
                    judge.astype(jnp.float32) / temperature, axis=-1
                )
                p_d = jnp.take_along_axis(
                    prob, draft[:, :, None], axis=2
                )[:, :, 0]                                       # [B, T-1]
                u = jax.random.uniform(k_acc, p_d.shape)
                ok = u < p_d
            acc_prefix = jnp.cumprod(ok.astype(jnp.int32), axis=1)
            m = jnp.sum(acc_prefix, axis=1)                      # [B]
        else:
            m = jnp.zeros((b,), jnp.int32)
        n_acc = 1 + m

        # Truncate at the first accepted EOS (inclusive) and at max_new.
        idx_t = jnp.arange(t_block)[None]
        eos_hit = jnp.logical_and(is_eos(tokens), idx_t < n_acc[:, None])
        any_eos = jnp.any(eos_hit, axis=1)
        first_eos = jnp.argmax(eos_hit.astype(jnp.int32), axis=1)
        n_acc = jnp.where(any_eos, first_eos + 1, n_acc)
        n_acc = jnp.minimum(n_acc, max_new_tokens - st.written)
        n_acc = jnp.where(st.done, 0, n_acc)

        # Next-round logits: row selects L_m; on a rejection the rejected
        # draft is masked out — for greedy a no-op (argmax already differs),
        # for sampling exactly the residual distribution of the standard
        # rejection-sampling scheme (deterministic proposal).
        sel = jnp.minimum(n_acc - 1, t_block - 1)
        sel = jnp.maximum(sel, 0)
        nxt = jnp.take_along_axis(
            logits_all, sel[:, None, None], axis=1
        )[:, 0]                                                  # [B, V]
        if spec_tokens:
            rej = jnp.logical_and(m < spec_tokens, ~any_eos)     # a draft failed
            rej_tok = jnp.take_along_axis(
                draft, jnp.minimum(m, spec_tokens - 1)[:, None], axis=1
            )[:, 0]
            mask_rej = jnp.logical_and(
                jnp.logical_and(rej, ~st.done)[:, None],
                jax.nn.one_hot(rej_tok, nxt.shape[1], dtype=bool),
            )
            nxt = jnp.where(mask_rej, DEFAULT_MASK_VALUE, nxt)
        logits_next = jnp.where((n_acc > 0)[:, None], nxt, st.logits)

        # Emit accepted tokens into out and hist (masked scatter; rejected
        # lanes land in a scratch slot that is sliced off at the end).
        out = st.out_tokens
        hist_new = st.hist
        for j in range(t_block):
            live = j < n_acc
            oi = jnp.where(live, st.written + j, trash_out)
            out = out.at[rows, oi].set(tokens[:, j])
            hi = jnp.where(
                live, jnp.minimum(st.hist_len + j, trash_hist), trash_hist
            )
            hist_new = hist_new.at[rows, hi].set(tokens[:, j])

        done = jnp.logical_or(st.done, any_eos)
        done = jnp.logical_or(done, st.written + n_acc >= max_new_tokens)
        cache = cache._replace(length=cache.length + n_acc)
        return SpecGenState(
            cache=cache, pos=st.pos + n_acc, logits=logits_next,
            out_tokens=out, written=st.written + n_acc,
            hist=hist_new, hist_len=st.hist_len + n_acc,
            done=done, key=key, steps=st.steps + 1,
        )

    init = SpecGenState(
        cache=cache,
        pos=seq_length.astype(jnp.int32),
        logits=first_logits,
        out_tokens=jnp.full(
            (b, max_new_tokens + t_block), cfg.pad_token_id, jnp.int32
        ),
        written=jnp.zeros((b,), jnp.int32),
        hist=hist,
        hist_len=hist_len0,
        done=jnp.zeros((b,), bool),
        key=key,
        steps=jnp.zeros((), jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)

    toks = final.out_tokens[:, :max_new_tokens]
    eos_mask = jnp.zeros(toks.shape, bool)
    for e in eos_ids:
        eos_mask = jnp.logical_or(eos_mask, toks == e)
    before_eos = jnp.cumsum(eos_mask.astype(jnp.int32), axis=1) == 0
    count = jnp.sum(before_eos.astype(jnp.int32), axis=1)
    count = jnp.minimum(count, final.written)
    out = (toks, count, init_over)
    if return_cache:
        out = out + (final.cache,)
    if return_stats:
        out = out + (final.steps,)
    return out


def _sample(logits, key, temperature):
    from streamchat_tpu.ops.sampling import sample_token

    return sample_token(logits, key, temperature=temperature, top_p=None)


def build_lookup_arrays(
    rows, *, bucket: int = 256, cap: int = 4096
) -> dict:
    """Pack host-side token-id lists into bucketed lookup arrays.

    The single source of the compiled-shape policy for lookup corpora
    (LongVA prompts, TextLM rolling verdict corpus): pad to a `bucket`
    multiple (bounding distinct compiled shapes — axon executables
    permanently reserve their workspace), cap at `cap` tokens, fill with
    -1 (never a real token id, so no spurious n-gram matches).
    Returns generate_paged's {lookup_tokens, lookup_len} kwargs.
    """
    import numpy as np

    from streamchat_tpu.models.generate import pad_to_bucket

    n = max(1, max((len(r) for r in rows), default=1))
    pad = pad_to_bucket(min(n, cap), bucket, minimum=bucket)
    arr = np.full((len(rows), pad), -1, np.int32)
    lens = np.zeros((len(rows),), np.int32)
    for i, r in enumerate(rows):
        m = min(len(r), pad)
        arr[i, :m] = r[:m]
        lens[i] = m
    return {
        "lookup_tokens": jnp.asarray(arr),
        "lookup_len": jnp.asarray(lens),
    }
