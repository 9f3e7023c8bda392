"""Vision resampler registry.

Reference `build_vision_resampler` (longva/model/multimodal_resampler/
builder.py:20-34) — LongVA's shipped config uses the identity;
`spatial_pool` and `masked_drop` are the stateless variants. The two
PARAMETRIC variants are also provided:

* Perceiver (`perceiver.py:73-145`, the flamingo-pytorch design): learned
  latents cross-attend to [media | latents] for `depth` rounds, pre-LN,
  GELU FFN, final LN. `init_perceiver` / `apply_perceiver`.
* Q-Former (`qformer.py:1102-1147`, BLIP-2's bert-base): learned query
  tokens through 12 post-LN BERT blocks; cross-attention to the
  LayerNormed vision features is inserted every `cross_freq` blocks, and
  only the query FFN branch survives (the reference nulls layer.output/
  intermediate). Reference quirk reproduced in `build_parametric`:
  `mm_qformer_depth` is actually wired into BertConfig's
  cross_attention_freq (qformer.py:1110,1117) — it never changes depth.

No pretrained resampler checkpoints ship with LongVA, so weights are
random-initialized (the reference loads `mm_*_pretrained` when given; our
pytrees use the same matrix shapes so a converter is mechanical).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from streamchat_tpu.ops.pooling import pool_patch_grid


def identity(features: jnp.ndarray, **_) -> jnp.ndarray:
    return features


def spatial_pool(features: jnp.ndarray, *, stride: int = 2, mode: str = "average", **_) -> jnp.ndarray:
    """Pool the patch grid by `stride` (resampler spatial_pool variant)."""
    return pool_patch_grid(features, stride, mode=mode)


def masked_drop(
    features: jnp.ndarray, key: jax.Array, *, ratio: float = 0.5, **_
) -> jnp.ndarray:
    """Keep a random (1-ratio) subset of patch tokens per frame.

    Mirrors the masked_drop resampler's 'random' mode: one shared mask per
    batch so shapes stay static.
    """
    n, p, d = features.shape
    keep = max(1, int(round(p * (1.0 - ratio))))
    idx = jnp.sort(jax.random.permutation(key, p)[:keep])
    return jnp.take(features, idx, axis=1)


REGISTRY = {
    "identity": identity,
    "spatial_pool": spatial_pool,
    "masked_drop": masked_drop,
}


def build(name: str | None):
    return REGISTRY[name or "identity"]


# ---------------------------------------------------------------------------
# Perceiver resampler (flamingo-pytorch design; reference perceiver.py)
# ---------------------------------------------------------------------------


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(x.dtype)


def init_perceiver(
    key: jax.Array,
    dim: int,
    *,
    depth: int = 6,
    dim_head: int = 64,
    heads: int = 8,
    num_latents: int = 64,
    ff_mult: int = 4,
    dtype=jnp.float32,
) -> dict:
    inner = dim_head * heads
    keys = iter(jax.random.split(key, 1 + depth * 5))

    def mat(kin, kout):
        return (jax.random.normal(next(keys), (kin, kout)) * kin**-0.5).astype(dtype)

    def ln():
        return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}

    layers = []
    for _ in range(depth):
        layers.append({
            "norm_media": ln(),
            "norm_latents": ln(),
            "to_q": mat(dim, inner),
            "to_kv": mat(dim, inner * 2),
            "to_out": mat(inner, dim),
            "ff_norm": ln(),
            "ff_in": mat(dim, dim * ff_mult),
            "ff_out": mat(dim * ff_mult, dim),
        })
    return {
        "latents": jax.random.normal(next(keys), (num_latents, dim)).astype(dtype),
        "layers": layers,
        "final_norm": ln(),
        "heads": heads,
        "dim_head": dim_head,
    }


def apply_perceiver(params: dict, features: jnp.ndarray) -> jnp.ndarray:
    """[N, P, D] image features -> [N, num_latents, D].

    Reference PerceiverResampler.forward (perceiver.py:144-145) wraps the
    module over [N, 1, 1, P, D]; the T/F axes are singleton on this path so
    frame/time embeddings never apply.
    """
    h, dh = params["heads"], params["dim_head"]
    n = features.shape[0]
    lat = jnp.broadcast_to(
        params["latents"][None], (n,) + params["latents"].shape
    ).astype(features.dtype)

    def attn(p, x, latents):
        xn = _ln(x, p["norm_media"])
        ln_lat = _ln(latents, p["norm_latents"])
        q = (ln_lat @ p["to_q"]) * (dh ** -0.5)
        kv_in = jnp.concatenate([xn, ln_lat], axis=1)        # media + latents
        kv = kv_in @ p["to_kv"]
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], h, dh).transpose(0, 2, 1, 3)

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
        sim = jnp.einsum("bhid,bhjd->bhij", qh.astype(jnp.float32),
                         kh.astype(jnp.float32))
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        a = jax.nn.softmax(sim, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", a, vh.astype(jnp.float32))
        o = o.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], h * dh)
        return (o.astype(latents.dtype)) @ p["to_out"]

    for p in params["layers"]:
        lat = attn(p, features, lat) + lat
        ff = _ln(lat, p["ff_norm"]) @ p["ff_in"]
        ff = jax.nn.gelu(ff.astype(jnp.float32), approximate=False).astype(lat.dtype)
        lat = ff @ p["ff_out"] + lat
    return _ln(lat, params["final_norm"])


# ---------------------------------------------------------------------------
# Q-Former resampler (BLIP-2 bert-base; reference qformer.py)
# ---------------------------------------------------------------------------


def init_qformer(
    key: jax.Array,
    vision_dim: int,
    *,
    hidden: int = 768,
    num_layers: int = 12,
    heads: int = 12,
    intermediate: int = 3072,
    num_queries: int = 32,
    cross_freq: int = 2,
    dtype=jnp.float32,
) -> dict:
    keys = iter(jax.random.split(key, 2 + num_layers * 12))

    def mat(kin, kout):
        return (jax.random.normal(next(keys), (kin, kout)) * 0.02).astype(dtype)

    def lin(kin, kout):
        return {"w": mat(kin, kout), "b": jnp.zeros((kout,), dtype)}

    def ln(d=hidden):
        return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}

    layers = []
    for i in range(num_layers):
        layer = {
            "self": {"q": lin(hidden, hidden), "k": lin(hidden, hidden),
                     "v": lin(hidden, hidden), "o": lin(hidden, hidden),
                     "ln": ln()},
            "ff_in": lin(hidden, intermediate),
            "ff_out": lin(intermediate, hidden),
            "ff_ln": ln(),
        }
        if i % cross_freq == 0:
            # Cross-attention K/V project from encoder_width (the vision
            # hidden size), qformer.py:118-121.
            layer["cross"] = {"q": lin(hidden, hidden),
                              "k": lin(vision_dim, hidden),
                              "v": lin(vision_dim, hidden),
                              "o": lin(hidden, hidden), "ln": ln()}
        layers.append(layer)
    return {
        "query_tokens": (jax.random.normal(next(keys), (num_queries, hidden))
                         * 0.02).astype(dtype),
        "ln_vision": ln(vision_dim),
        "layers": layers,
        "heads": heads,
    }


def _bert_attn(q_in, kv_in, p, heads):
    def lin(x, w):
        return x @ w["w"] + w["b"]

    b, nq, _ = q_in.shape
    q = lin(q_in, p["q"])
    k = lin(kv_in, p["k"])
    v = lin(kv_in, p["v"])
    dh = q.shape[-1] // heads

    def split(t):
        return t.reshape(t.shape[0], t.shape[1], heads, dh).transpose(0, 2, 1, 3)

    s = jnp.einsum("bhid,bhjd->bhij", split(q).astype(jnp.float32),
                   split(k).astype(jnp.float32)) * (dh ** -0.5)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bhjd->bhid", a, split(v).astype(jnp.float32))
    o = o.transpose(0, 2, 1, 3).reshape(b, nq, heads * dh).astype(q_in.dtype)
    # Post-LN (BERT): LN(residual + proj(attn)).
    return _ln(q_in + lin(o, p["o"]), p["ln"], eps=1e-12)


def apply_qformer(params: dict, features: jnp.ndarray) -> jnp.ndarray:
    """[N, P, Dv] image features -> [N, num_queries, 768].

    Query tokens run the BERT stack (self-attention over queries only —
    there is no text on this path); blocks with a `cross` branch attend to
    the LayerNormed vision features (Qformer.forward, qformer.py:1135-1147).
    """
    heads = params["heads"]
    x = _ln(features, params["ln_vision"], eps=1e-12)
    n = features.shape[0]
    qtok = jnp.broadcast_to(
        params["query_tokens"][None], (n,) + params["query_tokens"].shape
    ).astype(features.dtype)

    h = qtok
    for p in params["layers"]:
        h = _bert_attn(h, h, p["self"], heads)
        if "cross" in p:
            h = _bert_attn(h, x, p["cross"], heads)
        ff = h @ p["ff_in"]["w"] + p["ff_in"]["b"]
        ff = jax.nn.gelu(ff.astype(jnp.float32), approximate=False).astype(h.dtype)
        ff = ff @ p["ff_out"]["w"] + p["ff_out"]["b"]
        h = _ln(h + ff, p["ff_ln"], eps=1e-12)
    return h


def build_parametric(
    name: str,
    key: jax.Array,
    vision_dim: int,
    **kw,
) -> Tuple[dict, callable]:
    """(params, apply) for the parametric resamplers.

    Mirrors builder.py's model_args plumbing, including the reference quirk
    that `mm_qformer_depth` feeds BertConfig.cross_attention_freq — NOT the
    layer count (qformer.py:1110 passes self.depth as the
    cross_attention_freq positional; depth stays bert-base's 12).
    """
    if name == "perceiver":
        params = init_perceiver(
            key, vision_dim,
            depth=kw.pop("mm_perceiver_depth", 6),
            num_latents=kw.pop("mm_perceiver_latents", 64),
            ff_mult=kw.pop("mm_perceiver_ff_mult", 4),
            **kw,
        )
        return params, apply_perceiver
    if name == "qformer":
        params = init_qformer(
            key, vision_dim,
            cross_freq=kw.pop("mm_qformer_depth", 2),
            num_queries=kw.pop("mm_qformer_latents", 32),
            **kw,
        )
        return params, apply_qformer
    raise KeyError(f"unknown parametric resampler: {name}")
