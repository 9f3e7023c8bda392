"""Weight-only int8 quantization for the decoder's matmuls.

Single-stream decode is weight-bandwidth bound: every token reads the full
parameter set (~15.2 GB bf16 for Qwen2-7B), and the measured v5e decode sits
at ~780 GB/s effective — the HBM roofline. Halving the bytes with int8
weights halves per-token latency; nothing else moves the number on this
hardware. (The reference has no quantization at all; its decode instead runs
use_cache=False, re-prefilling the whole context per token —
inference_streaming_longva_v2.py:150,257.)

Scheme: symmetric per-output-channel int8. A matrix W [in, out] is stored as
(W_i8 [in, out], scale [out] f32) with W ≈ W_i8 * scale. The matmul computes
(x @ W_i8.astype(bf16)) * scale — the int8->bf16 convert fuses into the
dot's operand load on TPU, so the dequantized matrix never exists in HBM,
and the per-column scale commutes out of the contraction exactly.

Compute stays bf16 on the MXU: v5e int8 matmul is NOT faster than bf16
(measured round 1, CLAUDE.md) — the win here is purely memory traffic.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """W [in, out] -> {"w_i8": int8 [in, out], "scale": f32 [out]}."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)                 # [out]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_i8 = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"w_i8": w_i8, "scale": scale}


def dequantize_weight(q: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize W ≈ W_i8 * scale (tests / debugging only)."""
    return (q["w_i8"].astype(jnp.float32) * q["scale"]).astype(dtype)


def is_quantized(p: Any) -> bool:
    return isinstance(p, dict) and "w_i8" in p


def qmatmul(x: jnp.ndarray, q: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x [..., in] @ W -> [..., out] with int8-stored W.

    The convert rides the dot's operand load; the per-column scale applies
    to the f32 product and the result returns in x.dtype.
    """
    y = jax.lax.dot_general(
        x,
        q["w_i8"].astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y * q["scale"]).astype(x.dtype)


def matmul_any(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x @ w for a plain array OR a quantized {"w_i8","scale"} dict."""
    if is_quantized(w):
        return qmatmul(x, w)
    return x @ w


def quantize_decoder_params(
    params: Dict, quantize_lm_head: bool = True, destructive: bool = False,
    quantize_embed: bool = False,
) -> Dict:
    """Quantize every decoder matmul weight (returns a new pytree).

    Per-layer q/k/v/o (weights only; biases stay bf16), gate/up/down, and
    optionally lm_head. quantize_embed additionally stores the token table
    as int8 rows + per-row scales (quantize_embedding) — a pure HBM saving
    (the gather reads one row per token); default off because tied-embedding
    logits would double quantization error (Qwen2/LLaMA-3 are untied).

    destructive=True drops each source weight as soon as its int8 twin
    exists, so peak HBM stays ~one weight above the bf16 tree instead of
    bf16 + int8 together (15.2 + 7.7 GB would not fit the 16 GB chip).
    """
    out = dict(params)
    layers = []
    for p in params["layers"]:
        lp = {
            "input_norm": p["input_norm"],
            "post_norm": p["post_norm"],
            "attn": {},
            "mlp": {},
        }
        for name in ("q", "k", "v", "o"):
            src = p["attn"][name]
            dst = quantize_weight(src["w"])
            if destructive:
                del src["w"]
            if "b" in src:
                dst["b"] = src["b"]
            lp["attn"][name] = dst
        for name in ("gate", "up", "down"):
            lp["mlp"][name] = quantize_weight(p["mlp"][name])
            if destructive:
                del p["mlp"][name]
        layers.append(lp)
    out["layers"] = layers
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_weight(params["lm_head"])
        if destructive:
            del params["lm_head"]
    if quantize_embed:
        out["embed"] = quantize_embedding(params["embed"])
        if destructive:
            del params["embed"]
    return out


def quantize_embedding(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Embedding table [V, D] -> int8 rows + per-ROW scales.

    Lookup-oriented layout (vs quantize_weight's per-output-column): each
    vocab row dequantizes independently at gather time. The 152k x 3584
    Qwen2 table is 1.09 GB bf16 — halving it matters on a 15 GB-usable chip
    serving the whole pipeline.
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_i8 = jnp.clip(jnp.round(w32 / scale[:, None]), -127, 127).astype(jnp.int8)
    return {"w_i8": w_i8, "scale": scale}


def embed_dtype(params: Dict):
    """Activation dtype of the embedding output (bf16 for int8 tables)."""
    emb = params["embed"]
    return jnp.bfloat16 if is_quantized(emb) else emb.dtype


def embed_dim(params: Dict) -> int:
    emb = params["embed"]
    return (emb["w_i8"] if is_quantized(emb) else emb).shape[1]
