"""Autoregressive generation: prefill + fused decode loop.

Replaces HF `.generate(..., use_cache=False)` — the reference's single worst
performance decision (O(L^2) decode; inference_streaming_longva_v2.py:150,257)
— with a jitted `lax.while_loop` over KV-cache decode steps. The whole
generation (sampling included) is one XLA program: no host round-trip per
token.

Token budgets and sampling semantics mirror the reference call sites:
do_sample = temperature > 0, optional top_p, per-role max_new_tokens.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from streamchat_tpu.config import DecoderConfig
from streamchat_tpu.models import decoder
from streamchat_tpu.models.decoder import KVCache
from streamchat_tpu.ops.sampling import sample_token


class GenState(NamedTuple):
    cache: KVCache
    logits: jnp.ndarray          # [B, V] for the next sample
    out_tokens: jnp.ndarray      # [B, max_new]
    step: jnp.ndarray            # scalar int32
    done: jnp.ndarray            # [B] bool
    key: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "temperature", "top_p", "eos_ids", "max_len"
    ),
)
def generate(
    params,
    cfg: DecoderConfig,
    prompt_embeds: jnp.ndarray,
    seq_length: jnp.ndarray,
    key: jax.Array,
    *,
    max_new_tokens: int,
    max_len: int | None = None,
    temperature: float = 0.0,
    top_p: float | None = None,
    eos_ids: Tuple[int, ...] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate up to max_new_tokens. Returns (tokens [B, max_new], count [B]).

    prompt_embeds [B, S, D] padded to S; seq_length [B] = valid prompt length.
    Finished rows emit pad_token_id. count = tokens generated before EOS
    (EOS itself excluded, matching tokenizer.batch_decode(skip_special_tokens)).

    The KV cache (max_len slots, default S + max_new_tokens) is allocated
    INSIDE the jit: passing a host-built zero cache in would either be copied
    (no donation) or trip XLA's "donated buffers were not usable" path — the
    cache never appears in the outputs, so there is nothing to alias it to.
    """
    if eos_ids is None:
        eos_ids = (cfg.eos_token_id,)
    b = prompt_embeds.shape[0]
    if max_len is None:
        max_len = prompt_embeds.shape[1] + max_new_tokens
    # Align cache Lmax to the flash block (128): chunked prefill's Pallas
    # chunk-vs-cache kernel requires a 128-multiple Lmax, and the ~<=127
    # extra KV slots (~33 MB at 7B geometry) are masked by kv_length anyway.
    max_len = -(-max_len // 128) * 128
    cache = KVCache.create(cfg, b, max_len, dtype=prompt_embeds.dtype)

    first_logits, cache = _prefill_inline(params, cfg, prompt_embeds, cache, seq_length)

    def is_eos(tok):
        hit = jnp.zeros(tok.shape, bool)
        for e in eos_ids:
            hit = jnp.logical_or(hit, tok == e)
        return hit

    def cond(st: GenState):
        return jnp.logical_and(st.step < max_new_tokens, ~jnp.all(st.done))

    def body(st: GenState) -> GenState:
        key, sub = jax.random.split(st.key)
        tok = sample_token(st.logits, sub, temperature=temperature, top_p=top_p)
        tok = jnp.where(st.done, cfg.pad_token_id, tok)
        done = jnp.logical_or(st.done, is_eos(tok))
        out = jax.lax.dynamic_update_slice(st.out_tokens, tok[:, None], (0, st.step))
        logits, cache = _decode_inline(params, cfg, tok, st.cache)
        return GenState(cache, logits, out, st.step + 1, done, key)

    init = GenState(
        cache=cache,
        logits=first_logits,
        out_tokens=jnp.full((b, max_new_tokens), cfg.pad_token_id, jnp.int32),
        step=jnp.zeros((), jnp.int32),
        done=jnp.zeros((b,), bool),
        key=key,
    )
    final = jax.lax.while_loop(cond, body, init)

    toks = final.out_tokens
    eos_mask = is_eos(toks)
    # Count tokens before the first EOS (or all max_new if none).
    before_eos = jnp.cumsum(eos_mask.astype(jnp.int32), axis=1) == 0
    count = jnp.sum(before_eos.astype(jnp.int32), axis=1)
    count = jnp.minimum(count, final.step)
    return toks, count


CHUNKED_PREFILL_THRESHOLD = 8192


def _prefill_inline(params, cfg, embeds, cache, seq_length):
    b, s, _ = embeds.shape
    if s > CHUNKED_PREFILL_THRESHOLD:
        # Long prompts (23k-token caption contexts at v0.3 settings) prefill
        # in bounded-activation chunks — the one-shot MLP intermediates
        # alone are ~2.6 GB at 7B geometry (decoder.prefill_chunked).
        return decoder.prefill_chunked(
            params, cfg, embeds, cache, seq_length,
            chunk=CHUNKED_PREFILL_THRESHOLD // 2,
        )
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    hidden, cache = decoder.forward(
        params, cfg, embeds, positions, cache, seq_length, decode=False
    )
    last = jnp.take_along_axis(
        hidden, (seq_length - 1)[:, None, None].astype(jnp.int32), axis=1
    )
    return decoder.logits_from_hidden(params, cfg, last)[:, 0], cache


def _decode_inline(params, cfg, token_ids, cache):
    b = token_ids.shape[0]
    embeds = decoder.embed_tokens(params, token_ids)[:, None, :]
    positions = cache.length[:, None]
    hidden, cache = decoder.forward(
        params, cfg, embeds, positions, cache,
        jnp.ones((b,), jnp.int32), decode=True,
    )
    return decoder.logits_from_hidden(params, cfg, hidden)[:, 0], cache


def pad_to_bucket(length: int, bucket: int = 128, minimum: int = 128) -> int:
    """Round a prompt length up to a bucket to bound recompilation."""
    return max(minimum, ((length + bucket - 1) // bucket) * bucket)
