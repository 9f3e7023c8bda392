"""Teacher-forced sequence scoring (PPL / fluency metrics).

Rebuilds what the reference gets from `forward_with_fix_embedding`
(llavanext/model/language_model/llava_llama.py:99, driven by the --ppl flag
and the metric probes at utiles.py:1375-1561): the mean negative
log-likelihood of an answer continuation given a (spliced) prompt, in one
jitted prefill-style forward — no HF loss plumbing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from streamchat_tpu.config import DecoderConfig
from streamchat_tpu.models import decoder
from streamchat_tpu.models.decoder import KVCache
from streamchat_tpu.models.generate import pad_to_bucket


@functools.partial(jax.jit, static_argnames=("cfg",))
def _nll_impl(
    params,
    cfg: DecoderConfig,
    embeds: jnp.ndarray,        # [1, S_pad, D] prompt + target embeddings
    total_length: jnp.ndarray,  # [] prompt_len + target_len
    target_mask: jnp.ndarray,   # [S_pad] 1.0 where the NEXT token is a target
    target_next: jnp.ndarray,   # [S_pad] next-token ids (0 outside targets)
) -> jnp.ndarray:
    b, s, _ = embeds.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    cache = KVCache.create(cfg, b, s, dtype=embeds.dtype)
    hidden, _ = decoder.forward(
        params, cfg, embeds, positions, cache,
        total_length[None], decode=False,
    )
    logits = decoder.logits_from_hidden(params, cfg, hidden)   # [1, S, V] f32
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(
        logp[0], target_next[:, None], axis=-1
    )[:, 0]                                                    # [S]
    return -jnp.sum(tok_logp * target_mask) / jnp.maximum(
        jnp.sum(target_mask), 1.0
    )


def sequence_nll(
    params,
    cfg: DecoderConfig,
    prompt_embeds: jnp.ndarray,   # [1, S_pad, D], valid prefix = prompt_len
    prompt_len: int,
    target_ids: jnp.ndarray,      # [T] answer token ids
) -> jnp.ndarray:
    """Mean NLL of target_ids as the continuation of the prompt."""
    t = int(target_ids.shape[0])
    if t == 0:
        return jnp.zeros(())
    d = prompt_embeds.shape[-1]
    tgt_embeds = decoder.embed_tokens(params, target_ids)[None].astype(
        prompt_embeds.dtype
    )
    total = prompt_len + t
    s_pad = pad_to_bucket(total)
    full = jnp.zeros((1, s_pad, d), prompt_embeds.dtype)
    full = full.at[:, :prompt_len].set(prompt_embeds[:, :prompt_len])
    full = full.at[:, prompt_len : prompt_len + t].set(tgt_embeds)

    # Position i predicts token i+1: targets are predicted from positions
    # [prompt_len - 1, prompt_len + t - 2].
    idx = jnp.arange(s_pad)
    mask = ((idx >= prompt_len - 1) & (idx < prompt_len + t - 1)).astype(jnp.float32)
    nxt = jnp.zeros((s_pad,), jnp.int32)
    nxt = nxt.at[prompt_len - 1 : prompt_len + t - 1].set(target_ids)
    return _nll_impl(
        params, cfg, full, jnp.asarray(total, jnp.int32), mask, nxt
    )
