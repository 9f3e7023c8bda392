"""HF checkpoint -> JAX pytree converters.

Replaces the reference's `load_pretrained_model` (longva/model/builder.py:27)
for TPU: reads safetensors shards directly into numpy (no torch graph), maps
HF parameter names onto our functional param trees, transposing Linear
weights from HF's [out, in] to our [in, out] matmul layout.

Supported checkpoints:
* LongVA / llava_qwen (Qwen2 LM + CLIP tower + mm_projector)
* Plain Qwen2 / LLaMA-3 causal LMs (the judge)
* BERT-family encoders (mxbai-colbert, MiniLM) — see `load_bert`.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from streamchat_tpu.config import BertConfig, DecoderConfig, ViTConfig


def _open_shards(path: str) -> Dict[str, np.ndarray]:
    """Load all safetensors (or torch .bin) weights under `path` into a dict."""
    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    index_file = os.path.join(path, "model.safetensors.index.json")
    files = []
    if os.path.exists(index_file):
        with open(index_file) as f:
            index = json.load(f)
        files = sorted({v for v in index["weight_map"].values()})
    else:
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".safetensors")
        )
    if files:
        for fname in files:
            with safe_open(os.path.join(path, fname), framework="numpy") as f:
                for k in f.keys():
                    tensors[k] = f.get_tensor(k)
        return tensors
    # torch .bin fallback
    import torch

    for fname in sorted(f for f in os.listdir(path) if f.endswith(".bin")):
        sd = torch.load(
            os.path.join(path, fname), map_location="cpu", weights_only=True
        )
        for k, v in sd.items():
            tensors[k] = v.to(torch.float32).numpy()
    if not tensors:
        raise FileNotFoundError(f"no safetensors/bin weights under {path}")
    return tensors


def _read_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


def _linear(t: Dict[str, np.ndarray], name: str, dtype, bias: bool = False):
    w = jnp.asarray(t[f"{name}.weight"], dtype).T
    out = {"w": w}
    if bias:
        out["b"] = jnp.asarray(t[f"{name}.bias"], dtype)
    return out


# ---------------------------------------------------------------------------
# Decoder (Qwen2 / LLaMA-3)
# ---------------------------------------------------------------------------


def decoder_config_from_hf(cfg: dict) -> DecoderConfig:
    head_dim = cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"]
    eos = cfg.get("eos_token_id", 0)
    if isinstance(eos, list):
        eos = eos[0]
    return DecoderConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        num_kv_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
        head_dim=head_dim,
        rope_theta=cfg.get("rope_theta", 1e4),
        rms_eps=cfg.get("rms_norm_eps", 1e-6),
        qkv_bias=cfg.get("model_type", "") == "qwen2"
        or "qwen" in cfg.get("model_type", ""),
        tie_embeddings=cfg.get("tie_word_embeddings", False),
        max_position_embeddings=cfg.get(
            "tokenizer_model_max_length", cfg.get("max_position_embeddings", 32768)
        ),
        eos_token_id=eos,
        pad_token_id=cfg.get("pad_token_id") or 0,
    )


def map_decoder(
    t: Dict[str, np.ndarray], cfg: DecoderConfig, dtype, prefix: str = "model."
) -> dict:
    layers = []
    for i in range(cfg.num_layers):
        p = f"{prefix}layers.{i}."
        layer = {
            "input_norm": jnp.asarray(t[p + "input_layernorm.weight"], dtype),
            "attn": {
                "q": _linear(t, p + "self_attn.q_proj", dtype, cfg.qkv_bias),
                "k": _linear(t, p + "self_attn.k_proj", dtype, cfg.qkv_bias),
                "v": _linear(t, p + "self_attn.v_proj", dtype, cfg.qkv_bias),
                "o": _linear(t, p + "self_attn.o_proj", dtype),
            },
            "post_norm": jnp.asarray(t[p + "post_attention_layernorm.weight"], dtype),
            "mlp": {
                "gate": jnp.asarray(t[p + "mlp.gate_proj.weight"], dtype).T,
                "up": jnp.asarray(t[p + "mlp.up_proj.weight"], dtype).T,
                "down": jnp.asarray(t[p + "mlp.down_proj.weight"], dtype).T,
            },
        }
        layers.append(layer)
    params = {
        "embed": jnp.asarray(t[prefix + "embed_tokens.weight"], dtype),
        "layers": layers,
        "final_norm": jnp.asarray(t[prefix + "norm.weight"], dtype),
    }
    if not cfg.tie_embeddings and "lm_head.weight" in t:
        params["lm_head"] = jnp.asarray(t["lm_head.weight"], dtype).T
    return params


def load_decoder(path: str, dtype=jnp.bfloat16) -> Tuple[DecoderConfig, dict]:
    """Plain causal LM checkpoint (e.g. the LLaMA-3 judge)."""
    cfg = decoder_config_from_hf(_read_config(path))
    t = _open_shards(path)
    return cfg, map_decoder(t, cfg, dtype)


# ---------------------------------------------------------------------------
# CLIP vision tower + projector (LongVA multimodal checkpoint)
# ---------------------------------------------------------------------------

_VIT_PREFIX = "model.vision_tower.vision_tower.vision_model."


def map_vit(t: Dict[str, np.ndarray], cfg: ViTConfig, dtype, prefix=_VIT_PREFIX) -> dict:
    def ln(name):
        return {
            "scale": jnp.asarray(t[prefix + name + ".weight"], dtype),
            "bias": jnp.asarray(t[prefix + name + ".bias"], dtype),
        }

    conv = t[prefix + "embeddings.patch_embedding.weight"]  # [D, 3, ps, ps]
    patch_w = jnp.asarray(conv.reshape(conv.shape[0], -1).T, dtype)  # [3*ps*ps, D]
    layers = []
    for i in range(cfg.num_layers):
        p = prefix + f"encoder.layers.{i}."

        def lin(n):
            return {
                "w": jnp.asarray(t[p + n + ".weight"], dtype).T,
                "b": jnp.asarray(t[p + n + ".bias"], dtype),
            }

        layers.append({
            "ln1": {
                "scale": jnp.asarray(t[p + "layer_norm1.weight"], dtype),
                "bias": jnp.asarray(t[p + "layer_norm1.bias"], dtype),
            },
            "attn": {
                "q": lin("self_attn.q_proj"),
                "k": lin("self_attn.k_proj"),
                "v": lin("self_attn.v_proj"),
                "o": lin("self_attn.out_proj"),
            },
            "ln2": {
                "scale": jnp.asarray(t[p + "layer_norm2.weight"], dtype),
                "bias": jnp.asarray(t[p + "layer_norm2.bias"], dtype),
            },
            "mlp": {"fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2")},
        })
    return {
        "patch_embed": {"w": patch_w},
        "class_embed": jnp.asarray(t[prefix + "embeddings.class_embedding"], dtype),
        "pos_embed": jnp.asarray(
            t[prefix + "embeddings.position_embedding.weight"], dtype
        ),
        # HF ships the typo'd name "pre_layrnorm".
        "pre_ln": ln("pre_layrnorm"),
        "layers": layers,
    }


def map_projector(t: Dict[str, np.ndarray], dtype, prefix="model.mm_projector.") -> dict:
    return {
        "fc1": {
            "w": jnp.asarray(t[prefix + "0.weight"], dtype).T,
            "b": jnp.asarray(t[prefix + "0.bias"], dtype),
        },
        "fc2": {
            "w": jnp.asarray(t[prefix + "2.weight"], dtype).T,
            "b": jnp.asarray(t[prefix + "2.bias"], dtype),
        },
    }


def load_longva(path: str, dtype=jnp.bfloat16):
    """LongVA llava_qwen checkpoint -> (vit_cfg, dec_cfg, vit_p, proj_p, dec_p)."""
    hf = _read_config(path)
    dec_cfg = decoder_config_from_hf(hf)
    vit_cfg = ViTConfig(projection_dim=hf["hidden_size"])
    t = _open_shards(path)
    return (
        vit_cfg,
        dec_cfg,
        map_vit(t, vit_cfg, dtype),
        map_projector(t, dtype),
        map_decoder(t, dec_cfg, dtype),
    )


# ---------------------------------------------------------------------------
# BERT encoders (mxbai-colbert, MiniLM)
# ---------------------------------------------------------------------------


def bert_config_from_hf(cfg: dict, pooling: str) -> BertConfig:
    return BertConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        max_position_embeddings=cfg["max_position_embeddings"],
        type_vocab_size=cfg.get("type_vocab_size", 2),
        layernorm_eps=cfg.get("layer_norm_eps", 1e-12),
        pooling=pooling,
    )


def map_bert(t: Dict[str, np.ndarray], cfg: BertConfig, dtype) -> dict:
    # Strip an optional "bert." prefix.
    if any(k.startswith("bert.") for k in t):
        t = {k[len("bert."):] if k.startswith("bert.") else k: v for k, v in t.items()}

    def lin(name):
        return {
            "w": jnp.asarray(t[name + ".weight"], dtype).T,
            "b": jnp.asarray(t[name + ".bias"], dtype),
        }

    def ln(name):
        return {
            "scale": jnp.asarray(t[name + ".weight"], dtype),
            "bias": jnp.asarray(t[name + ".bias"], dtype),
        }

    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        layers.append({
            "attn": {
                "q": lin(p + "attention.self.query"),
                "k": lin(p + "attention.self.key"),
                "v": lin(p + "attention.self.value"),
                "o": lin(p + "attention.output.dense"),
            },
            "attn_ln": ln(p + "attention.output.LayerNorm"),
            "mlp": {
                "fc1": lin(p + "intermediate.dense"),
                "fc2": lin(p + "output.dense"),
            },
            "mlp_ln": ln(p + "output.LayerNorm"),
        })
    return {
        "word_embed": jnp.asarray(t["embeddings.word_embeddings.weight"], dtype),
        "pos_embed": jnp.asarray(t["embeddings.position_embeddings.weight"], dtype),
        "type_embed": jnp.asarray(t["embeddings.token_type_embeddings.weight"], dtype),
        "embed_ln": ln("embeddings.LayerNorm"),
        "layers": layers,
    }


def load_bert(path: str, pooling: str, dtype=jnp.bfloat16) -> Tuple[BertConfig, dict]:
    cfg = bert_config_from_hf(_read_config(path), pooling)
    return cfg, map_bert(_open_shards(path), cfg, dtype)


# ---------------------------------------------------------------------------
# Quantized checkpoint save / load (int8 weight-only serving format)
# ---------------------------------------------------------------------------


def save_quantized(params: dict, path: str) -> None:
    """Persist an int8-quantized decoder pytree (ops/quant layout) to disk.

    One .npz of flat leaves — loading this is ~half the IO of the bf16
    checkpoint and skips the on-device quantization pass (and its transient
    bf16-tree HBM peak) at serving startup. No HF equivalent exists: the
    reference has no quantization at all.
    """
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(f"{prefix}.{i}", v)
        else:
            # int4 trees store packed nibbles as plain int8 (w_i4p), so
            # every quantized leaf is already an npz-native dtype.
            flat[prefix] = np.asarray(node)

    walk("", params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_quantized(path: str, dtype=jnp.bfloat16) -> dict:
    """Load a save_quantized checkpoint back into the nested pytree."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    root: dict = {}
    for key in data.files:
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[key]
        if arr.dtype == np.int8:
            val = jnp.asarray(arr)
        elif arr.dtype == np.float32 and parts[-1] == "scale":
            val = jnp.asarray(arr)
        else:
            val = jnp.asarray(arr).astype(dtype)
        node[parts[-1]] = val

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [listify(node[str(i)]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)
