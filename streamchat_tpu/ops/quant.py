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
    return isinstance(p, dict) and ("w_i8" in p or "w_i4p" in p)


def quantize_weight_int4(
    w: jnp.ndarray, group_size: int = 128
) -> Dict[str, jnp.ndarray]:
    """W [in, out] -> {"w_i4p": int8 [in, out/2], "scale": f32 [in/gs, 2, out/2]}.

    Symmetric round-to-nearest int4 with per-(input-group, output-channel)
    scales: group g of 128 input rows shares scale[g, out]. Per-channel int4
    (the int8 scheme) is too coarse at 4 bits; 128-groups are the standard
    weight-only granularity.

    Storage is two nibbles per int8 byte with COLUMN-HALF packing — byte
    (i, j) holds w[i, j] in the low nibble and w[i, j + out/2] in the high
    nibble, so the unpacked matrix is concat(lo_half, hi_half) along the
    output dim: no interleave, no sub-byte dtype. Native jnp.int4 arrays
    are deliberately NOT used at rest: an s4 array crossing a jit boundary
    crashes device_put with a relayout recursion on the axon TPU backend
    (sub-byte layout bug, reproduced minimally this round), and XLA does
    not fuse a bitcast-unpack into the dot operand load anyway (measured:
    2.2x SLOWER than int8) — the decode-speed win lives in the Pallas
    kernel (ops/int4_matmul.py), which unpacks nibbles in-VMEM.

    The group scale is stored as [g, 2, out/2] — dim 1 indexes the
    (low, high) column halves, so `scale.reshape(g, out)` recovers the
    flat per-column layout and the Pallas kernel block-slices each half
    directly.
    """
    kin, out = w.shape
    if kin % group_size:
        raise ValueError(f"in-dim {kin} not divisible by group {group_size}")
    if out % 2:
        raise ValueError(f"out-dim {out} must be even for nibble packing")
    g = kin // group_size
    w32 = w.astype(jnp.float32).reshape(g, group_size, out)
    amax = jnp.max(jnp.abs(w32), axis=1)                 # [g, out]
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    w_i4 = jnp.clip(
        jnp.round(w32 / scale[:, None, :]), -7, 7
    ).astype(jnp.int8).reshape(kin, out)
    oh = out // 2
    lo = w_i4[:, :oh] & 0xF
    hi = (w_i4[:, oh:] & 0xF) << 4
    return {"w_i4p": (lo | hi).astype(jnp.int8),
            "scale": scale.reshape(g, 2, oh)}


def unpack_int4(p: jnp.ndarray) -> jnp.ndarray:
    """Packed bytes [in, out/2] -> int8 values [in, out] (in-program).

    Pure int8 bit ops (no s4 dtype): signed low nibble via the xor-sub
    trick, signed high nibble via arithmetic shift. Column order is
    [low-half | high-half], matching quantize_weight_int4's packing.
    """
    lo = ((p & 0xF) ^ 8) - 8
    hi = jax.lax.shift_right_arithmetic(p, jnp.int8(4))
    return jnp.concatenate([lo, hi], axis=-1)


def dequantize_weight_int4(
    q: Dict[str, jnp.ndarray], dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Materialize W ≈ W_i4 * scale[group] -> [in, out]."""
    w_i4 = unpack_int4(q["w_i4p"])
    kin, out = w_i4.shape
    g = q["scale"].shape[0]
    scale = q["scale"].reshape(g, out)
    w = w_i4.astype(jnp.float32).reshape(g, kin // g, out) * scale[:, None, :]
    return w.reshape(kin, out).astype(dtype)


def qmatmul_int4(x: jnp.ndarray, q: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x [..., in] @ W -> [..., out] with packed-int4-stored W.

    Two regimes, picked statically from x's token count (each jitted
    program has one shape, so this compiles to exactly one path):

    - decode (few bf16 rows on TPU): the Pallas matvec kernel
      (ops/int4_matmul.qmatvec_int4) streams the PACKED bytes and unpacks
      nibbles in VMEM — per-step weight traffic is in*out/2 bytes, half
      of int8's. XLA cannot express this (a shift-unpack never fuses into
      a dot operand load; measured 2.2x slower than int8).
    - anything else (prefill, CPU, f32): materialize the bf16 dequant per
      matmul and run one large dot — prefill is MXU-bound, so the
      transient HBM round trip is noise.
    """
    lead = x.shape[:-1]
    n = 1
    for s in lead:
        n *= s
    kin = q["w_i4p"].shape[0]
    out = q["w_i4p"].shape[1] * 2
    gs = kin // q["scale"].shape[0]
    oh = out // 2
    if (
        n <= 8
        and x.dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and jax.device_count() == 1
        and kin % gs == 0
        and gs % 128 == 0
        and oh % 128 == 0
    ):
        # device_count gate: a pallas_call inside a pjit over a >1-device
        # mesh won't auto-partition the sharded weight operand; multi-chip
        # TP serves int4 via the XLA dequant path (each chip's shard is
        # halved anyway). Revisit with shard_map when real multi-chip
        # hardware is available.
        from streamchat_tpu.ops.int4_matmul import qmatvec_int4

        y = qmatvec_int4(x.reshape(n, kin), q["w_i4p"], q["scale"])
        return y.astype(x.dtype).reshape(*lead, out)
    return x @ dequantize_weight_int4(q, x.dtype)


def qmatmul_int4_multi(x: jnp.ndarray, qs) -> list:
    """x @ W_p for several packed-int4 weights sharing x's last dim.

    Decode path: ONE fused Pallas call (ops/int4_matmul.qmatvec_int4_fused)
    replaces len(qs) separate kernel launches — a 7B decode step issues 196
    matvecs and per-launch overhead is a measurable slice of the 9.9 ms/tok
    step. Falls back to independent qmatmul_int4 calls whenever the fused
    kernel's gate doesn't hold (prefill shapes, CPU, multi-chip TP).
    """
    qs = list(qs)
    lead = x.shape[:-1]
    n = 1
    for s in lead:
        n *= s
    kin = qs[0]["w_i4p"].shape[0]
    gs = kin // qs[0]["scale"].shape[0]
    if (
        len(qs) > 1
        and n <= 8
        and x.dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and jax.device_count() == 1
        and gs % 128 == 0
        and all(
            q["w_i4p"].shape[0] == kin
            and kin // q["scale"].shape[0] == gs
            and q["w_i4p"].shape[1] % 128 == 0
            for q in qs
        )
    ):
        from streamchat_tpu.ops.int4_matmul import qmatvec_int4_fused

        flat = []
        for q in qs:
            flat.extend([q["w_i4p"], q["scale"]])
        ys = qmatvec_int4_fused(x.reshape(n, kin), *flat)
        return [
            y.astype(x.dtype).reshape(*lead, q["w_i4p"].shape[1] * 2)
            for y, q in zip(ys, qs)
        ]
    return [qmatmul_int4(x, q) for q in qs]


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
    """x @ w for a plain array OR a quantized int8/int4 dict."""
    if isinstance(w, dict) and "w_i4p" in w:
        return qmatmul_int4(x, w)
    if is_quantized(w):
        return qmatmul(x, w)
    return x @ w


def quantize_decoder_params(
    params: Dict, quantize_lm_head: bool = True, destructive: bool = False,
    quantize_embed: bool = False, bits: int = 8,
) -> Dict:
    """Quantize every decoder matmul weight (returns a new pytree).

    Per-layer q/k/v/o (weights only; biases stay bf16), gate/up/down, and
    optionally lm_head. quantize_embed additionally stores the token table
    as int8 rows + per-row scales (quantize_embedding) — a pure HBM saving
    (the gather reads one row per token); default off because tied-embedding
    logits would double quantization error (Qwen2/LLaMA-3 are untied).

    bits=4 stores layer matmuls as group-128 int4 (quantize_weight_int4);
    the lm_head (and embed) stay int8 — logits are the most
    quantization-sensitive projection and the head is ~8%% of step traffic.
    Round-to-nearest int4 is an accuracy trade the caller opts into for
    ~2.6x lower weight bandwidth than int8.

    destructive=True drops each source weight as soon as its int8 twin
    exists, so peak HBM stays ~one weight above the bf16 tree instead of
    bf16 + int8 together (15.2 + 7.7 GB would not fit the 16 GB chip).
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    qfn = quantize_weight_int4 if bits == 4 else quantize_weight
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
            dst = qfn(src["w"])
            if destructive:
                del src["w"]
            if "b" in src:
                dst["b"] = src["b"]
            lp["attn"][name] = dst
        for name in ("gate", "up", "down"):
            lp["mlp"][name] = qfn(p["mlp"][name])
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
