"""CLIP vision tower in pure JAX.

Rebuilds what the reference gets from HF `CLIPVisionModel`
(`longva/model/multimodal_encoder/clip_encoder.py:68-79`): ViT-L/14-336,
hidden_states[select_layer] (default -2, i.e. features entering the last
block), CLS dropped -> [N, 576, 1024] patch tokens.

TPU-first choices:
* Patch embedding as an unfold + one [N*576, 588]x[588, 1024] matmul on the
  MXU instead of a conv (they're identical for stride == kernel).
* `select_layer=-2` means the last transformer block is never computed — we
  simply run num_layers-1 blocks rather than materializing all hidden states
  the way HF's output_hidden_states does.
* Whole encoder is one jit region; XLA fuses LN/GELU/residuals into the
  matmuls. Attention over 577 tokens is tiny — plain dot-product attention
  (flash tiling would only add padding waste at this length).
* Params kept in bf16, layernorm/softmax accumulate in f32.

Functional style: `init(key, cfg)` builds a param pytree, `encode(params,
cfg, pixels)` is pure and jittable.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from streamchat_tpu.config import ViTConfig

Params = Dict[str, Any]


def _layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x.astype(jnp.float32)).astype(x.dtype)


def _attention(x: jnp.ndarray, p: Params, num_heads: int) -> jnp.ndarray:
    n, s, d = x.shape
    dh = d // num_heads
    q = (x @ p["q"]["w"] + p["q"]["b"]).reshape(n, s, num_heads, dh)
    k = (x @ p["k"]["w"] + p["k"]["b"]).reshape(n, s, num_heads, dh)
    v = (x @ p["v"]["w"] + p["v"]["b"]).reshape(n, s, num_heads, dh)
    # Plain batched attention: measured FASTER than the Pallas flash kernel
    # here (227 vs 212 f/s at N=128 on v5e) — at S=577 XLA's fusion handles
    # the score tensor fine and the encoder is MXU-bound on the projections,
    # so flash tiling only adds per-tile overhead. Flash remains the decoder
    # prefill path where S reaches thousands.
    s_qk = jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32)
    s_qk *= dh ** -0.5
    a = jax.nn.softmax(s_qk, axis=-1).astype(x.dtype)
    o = jnp.einsum("nhqk,nkhd->nqhd", a, v).reshape(n, s, d)
    return o @ p["o"]["w"] + p["o"]["b"]


def _block(x: jnp.ndarray, p: Params, cfg: ViTConfig) -> jnp.ndarray:
    h = _layernorm(x, p["ln1"]["scale"], p["ln1"]["bias"], cfg.layernorm_eps)
    x = x + _attention(h, p["attn"], cfg.num_heads)
    h = _layernorm(x, p["ln2"]["scale"], p["ln2"]["bias"], cfg.layernorm_eps)
    h = _quick_gelu(h @ p["mlp"]["fc1"]["w"] + p["mlp"]["fc1"]["b"])
    return x + (h @ p["mlp"]["fc2"]["w"] + p["mlp"]["fc2"]["b"])


def _fold_layer(p: Params, cfg: ViTConfig):
    """QKV concat + LN/q-scale fold for one layer (fused kernel operands)."""
    from streamchat_tpu.ops.fused_vit import fold_vit_layer_params

    wqkv = jnp.concatenate(
        [p["attn"]["q"]["w"], p["attn"]["k"]["w"], p["attn"]["v"]["w"]], axis=1
    )
    bqkv = jnp.concatenate(
        [p["attn"]["q"]["b"], p["attn"]["k"]["b"], p["attn"]["v"]["b"]]
    )
    return fold_vit_layer_params(
        p["ln1"]["scale"], p["ln1"]["bias"], wqkv, bqkv,
        p["ln2"]["scale"], p["ln2"]["bias"],
        p["mlp"]["fc1"]["w"], p["mlp"]["fc1"]["b"],
        num_heads=cfg.num_heads,
    )


def fold_params(params: Params, cfg: ViTConfig) -> Params:
    """Attach pre-folded fused-kernel projections to every layer.

    The fused path needs the QKV concat + LN-affine/q-scale fold of each
    layer's projections (`ops.fused_vit.fold_vit_layer_params`); tracing
    that fold into every forward call costs ~24 ms at ViT-L batch 128
    (~6% ingest). This does it ONCE, storing the result under a per-layer
    "fused" key (~350 MB bf16 at ViT-L). The original HF-layout leaves are
    kept: weights save/load, sharding pspecs, the unfused path, and
    `attention_logit_bounds` are unaffected, and `_block_fused` falls back
    to the in-trace fold whenever the key is absent. Idempotent.

    Runs as one jitted program — eager per-layer folds would pay the
    ~50-90 ms relay dispatch per op (CLAUDE.md environment notes).
    """
    if all("fused" in p for p in params["layers"]):
        return params
    folded = _fold_all_layers(params, cfg)
    layers = []
    for p, f in zip(params["layers"], folded):
        q = dict(p)
        q.setdefault("fused", f)
        layers.append(q)
    out = dict(params)
    out["layers"] = layers
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def _fold_all_layers(params: Params, cfg: ViTConfig):
    return [
        dict(zip(("wqkv", "bqkv", "w1", "b1"), _fold_layer(p, cfg)))
        for p in params["layers"]
    ]


def _block_fused(x: jnp.ndarray, p: Params, cfg: ViTConfig, interpret: bool,
                 softmax_mode: str = "clamp") -> jnp.ndarray:
    """The same block via the fused Pallas layer-half kernels (ops/fused_vit).

    Round-2 profiling: XLA runs each LayerNorm as a standalone 3.5 ms
    convert_reduce fusion at batch 128 (~164 ms of the 535 ms encoder call)
    and materializes head-transpose copies around attention. The fused
    kernels absorb LN/softmax/transposes into VMEM-resident passes:
    attention half 18.1 -> 10.8 ms/layer measured on the v5e chip.

    The per-layer QKV concat + LN fold is traced once per call (23 x 6.3 MB
    copies + two [D, ...] row scalings, ~0.05 ms/frame at batch 128) — kept
    here so the param tree stays identical to the HF layout for weights
    loading and sharding.

    Round-5 variant sweep (scripts/probe_vit_variants.py): the layer runs
    FOLDED — LN affines + q scale absorbed into wqkv/fc1, one-pass LN
    statistics, frame_tile=4 via an in-kernel fori_loop — 12.57 ms/layer vs
    13.9 for the round-4 kernel (the unfolded form remains reachable via
    fused_vit_layer directly; numerics of both are pinned against the XLA
    block in tests/test_fused_vit.py).
    """
    from streamchat_tpu.ops.fused_vit import fused_vit_layer

    n = x.shape[0]
    fused = p.get("fused")
    if fused is not None:
        # Pre-folded once at load time (`fold_params`) — the in-trace fold
        # below costs ~24 ms per batch-128 forward (392 vs ~414 f/s).
        wqkv, bqkv = fused["wqkv"], fused["bqkv"]
        w1, b1 = fused["w1"], fused["b1"]
    else:
        wqkv, bqkv, w1, b1 = _fold_layer(p, cfg)
    if n % 4 == 0:
        frame_tile = 4
    elif n % 2 == 0:
        frame_tile = 2
    else:
        frame_tile = 1
    return fused_vit_layer(
        x, p["ln1"]["scale"], p["ln1"]["bias"], wqkv, bqkv,
        p["attn"]["o"]["w"], p["attn"]["o"]["b"],
        p["ln2"]["scale"], p["ln2"]["bias"],
        w1, b1,
        p["mlp"]["fc2"]["w"], p["mlp"]["fc2"]["b"],
        num_heads=cfg.num_heads, eps=cfg.layernorm_eps,
        activation="quick_gelu",
        frame_tile=frame_tile, softmax_mode=softmax_mode,
        folded=True, ln_onepass=True,
        interpret=interpret,
    )


def _use_fused(fused: bool | None) -> bool:
    """Resolve the tri-state `fused` flag.

    None (auto) enables the Pallas path on a single-device TPU backend — the
    bench/ingest configuration. Multi-device meshes keep the XLA path: the
    per-op encoder partitions under pjit without shard_map plumbing, and the
    encoder is data-parallel there (each shard is small). CPU keeps XLA ops
    (the Mosaic kernels only run interpreted on CPU — tests opt in
    explicitly with fused=True + interpret).
    """
    if fused is not None:
        return fused
    return jax.default_backend() == "tpu" and jax.device_count() == 1


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def init(key: jax.Array, cfg: ViTConfig, dtype=jnp.bfloat16) -> Params:
    """Random-init parameter tree with the exact CLIP-L/336 geometry.

    Jitted as ONE program: eager per-tensor init costs a compile per
    distinct shape (~500 s for ViT-L over the remote-TPU tunnel)."""
    keys = iter(jax.random.split(key, 16 + 16 * cfg.num_layers))

    def dense(kin, kout, scale=None):
        scale = scale if scale is not None else (1.0 / kin) ** 0.5
        return {
            "w": (jax.random.normal(next(keys), (kin, kout)) * scale).astype(dtype),
            "b": jnp.zeros((kout,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((cfg.hidden_size,), dtype),
                "bias": jnp.zeros((cfg.hidden_size,), dtype)}

    d = cfg.hidden_size
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ln1": ln(),
            "attn": {
                "q": dense(d, d), "k": dense(d, d),
                "v": dense(d, d), "o": dense(d, d),
            },
            "ln2": ln(),
            "mlp": {
                "fc1": dense(d, cfg.intermediate_size),
                "fc2": dense(cfg.intermediate_size, d),
            },
        })
    return {
        "patch_embed": {
            "w": (jax.random.normal(next(keys), (patch_dim, d)) * patch_dim**-0.5).astype(dtype)
        },
        "class_embed": (jax.random.normal(next(keys), (d,)) * 0.02).astype(dtype),
        "pos_embed": (
            jax.random.normal(next(keys), (cfg.num_patches + 1, d)) * 0.02
        ).astype(dtype),
        "pre_ln": ln(),
        "layers": layers,
    }


def _embed_patches(pixels: jnp.ndarray, w: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """[N, 3, H, W] -> [N, P, hidden] via unfold + matmul (stride == kernel)."""
    n = pixels.shape[0]
    ps = cfg.patch_size
    g = cfg.num_patches_per_side
    x = pixels.reshape(n, 3, g, ps, g, ps)
    # -> [N, g, g, 3, ps, ps]: channel-major inside the patch matches the HF
    # conv kernel layout (out, in, kh, kw) once that is flattened to 2D.
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, g * g, 3 * ps * ps)
    return x.astype(w.dtype) @ w


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "select_layer", "fused", "softmax_mode",
                     "interpret"),
)
def hidden_states(
    params: Params,
    pixels: jnp.ndarray,
    cfg: ViTConfig,
    select_layer: int | None = None,
    fused: bool | None = None,
    softmax_mode: str = "clamp",
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the tower up to `select_layer`, returning [N, 1+P, hidden].

    `softmax_mode` (fused path only): "clamp" is the benched 1-pass
    softmax, exact for attention logits in (-87, 80] — validate a real
    checkpoint once with `attention_logit_bounds`; "exact" is the
    always-correct max-subtract form (~2.6% slower ingest).
    """
    if select_layer is None:
        select_layer = cfg.select_layer
    num_blocks = cfg.num_layers + 1 + select_layer if select_layer < 0 else select_layer
    use_fused = _use_fused(fused)
    x = _embed_patches(pixels, params["patch_embed"]["w"], cfg)
    cls = jnp.broadcast_to(
        params["class_embed"][None, None, :], (x.shape[0], 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"][None]
    x = _layernorm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"], cfg.layernorm_eps)
    for p in params["layers"][:num_blocks]:
        x = (_block_fused(x, p, cfg, interpret, softmax_mode)
             if use_fused else _block(x, p, cfg))
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "select_layer"))
def attention_logit_bounds(
    params: Params,
    pixels: jnp.ndarray,
    cfg: ViTConfig,
    select_layer: int | None = None,
) -> jnp.ndarray:
    """Per-layer [min, max] attention logits over a sample batch: [L, 2] f32.

    One-time validation probe for the fused kernels' "clamp" softmax
    (ops/fused_vit.py): run this on a REAL checkpoint with a batch of
    representative frames before enabling the fused path. The clamp mode is
    exact while every row's max logit stays in (-87, 80]; a per-layer max
    near 80 or a min suggesting whole rows below -87 means the encoder
    should run with softmax_mode="exact" instead. Uses the unfused path
    (independent math) in f32 score precision, same as the kernel.
    """
    if select_layer is None:
        select_layer = cfg.select_layer
    num_blocks = cfg.num_layers + 1 + select_layer if select_layer < 0 else select_layer
    x = _embed_patches(pixels, params["patch_embed"]["w"], cfg)
    cls = jnp.broadcast_to(
        params["class_embed"][None, None, :], (x.shape[0], 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"][None]
    x = _layernorm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                   cfg.layernorm_eps)
    bounds = []
    for p in params["layers"][:num_blocks]:
        h = _layernorm(x, p["ln1"]["scale"], p["ln1"]["bias"], cfg.layernorm_eps)
        n, s, d = h.shape
        dh = d // cfg.num_heads
        q = (h @ p["attn"]["q"]["w"] + p["attn"]["q"]["b"]).reshape(
            n, s, cfg.num_heads, dh)
        k = (h @ p["attn"]["k"]["w"] + p["attn"]["k"]["b"]).reshape(
            n, s, cfg.num_heads, dh)
        s_qk = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                          preferred_element_type=jnp.float32) * dh ** -0.5
        bounds.append(jnp.stack([jnp.min(s_qk), jnp.max(s_qk)]))
        x = _block(x, p, cfg)
    return jnp.stack(bounds)


def encode(
    params: Params,
    pixels: jnp.ndarray,
    cfg: ViTConfig,
    fused: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Patch features [N, P, hidden]: hidden_states[select_layer] minus CLS.

    Reference: CLIPVisionTower.forward + feature_select
    (clip_encoder.py:57-79, mm_vision_select_feature="patch").
    """
    h = hidden_states(params, pixels, cfg, fused=fused, interpret=interpret)
    return h[:, 1:, :]


def encode_s2(
    params: Params,
    pixels: jnp.ndarray,
    cfg: ViTConfig,
    scales: tuple = (336, 672),
) -> jnp.ndarray:
    """S2 multiscale features: [N, P, hidden * len(scales)].

    Rebuild of `CLIPVisionTowerS2` (clip_encoder.py:125-175) + the external
    s2wrapper `multiscale_forward`: per scale s, resize to s x s, split into
    (s/base)^2 base-size tiles, encode each tile, reassemble the tile grids,
    average-pool back to the base patch grid, and concatenate channel-wise
    (hidden_size * num_scales, :173-175). `pixels` are base-preprocessed
    [N, 3, base, base]; upscaling to the larger scales happens here so one
    preprocessing path serves both towers.
    """
    base = cfg.image_size
    side = cfg.num_patches_per_side
    n = pixels.shape[0]
    outs = []
    for s in sorted(scales):
        ns = s // base
        if ns * base != s:
            raise ValueError(f"scale {s} not a multiple of base {base}")
        if ns == 1:
            outs.append(encode(params, pixels, cfg))
            continue
        big = jax.image.resize(
            pixels, (n, 3, s, s), method="bicubic", antialias=False
        )
        # Split into ns x ns tiles of base size: [N*ns^2, 3, base, base].
        tiles = big.reshape(n, 3, ns, base, ns, base)
        tiles = tiles.transpose(0, 2, 4, 1, 3, 5).reshape(n * ns * ns, 3, base, base)
        feats = encode(params, tiles, cfg)                   # [N*ns^2, P, D]
        d = feats.shape[-1]
        # Reassemble the full (ns*side)^2 grid, then avg-pool ns x ns back
        # to the base grid (merge_chessboard + interpolate in s2wrapper).
        grid = feats.reshape(n, ns, ns, side, side, d)
        grid = grid.transpose(0, 1, 3, 2, 4, 5)              # [N, ns, side, ns, side, D]
        grid = grid.reshape(n, ns * side, ns * side, d)
        pooled = grid.reshape(n, side, ns, side, ns, d).mean(axis=(2, 4))
        outs.append(pooled.reshape(n, side * side, d))
    return jnp.concatenate(outs, axis=-1)
