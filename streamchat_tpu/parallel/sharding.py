"""Parameter / activation sharding rules (Megatron-style TP over the mesh).

The rules return PartitionSpec pytrees shaped exactly like the param trees
from `models/decoder.init`, `models/vit.init`, `models/projector.init`.
Applying them with `shard_pytree` + running under `jax.jit` lets XLA's
sharding propagation place one all-reduce after the attention o-projection
and one after the MLP down-projection — the textbook TP schedule — without
any hand-written collectives.

Layout choices:
  * q/k/v and gate/up: shard the *output* dim over `model` (head- and
    column-parallel).
  * o and down: shard the *input* dim (row-parallel) so the matmul's partial
    sums trigger the psum.
  * embed / lm_head: shard the vocab dim; logits gather rides the same axis.
  * KV cache: heads over `model`, batch over `data` — decode attention then
    needs no cross-device traffic at all.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from streamchat_tpu.config import DecoderConfig
from streamchat_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def decoder_pspecs(
    cfg: DecoderConfig,
    model_axis: str = MODEL_AXIS,
    quantized: bool | str = False,
) -> Dict[str, Any]:
    """PartitionSpec tree matching `models/decoder.init(cfg)`.

    quantized=True matches the int8 weight-only tree from
    `ops/quant.quantize_decoder_params`: every {"w": P(a, b)} becomes
    {"w_i8": P(a, b), "scale": P(<output-dim axis>)} — the per-output-channel
    scale shards with whatever axis the weight's OUTPUT dim carries (the
    model axis for column-parallel q/k/v/gate/up/lm_head, replicated for
    row-parallel o/down whose output dim is unsharded).

    quantized="int4" matches the bits=4 tree: layer matmuls are
    {"w_i4p": P(a, b), "scale": P(None, b)} — the [g, out] group scale
    shards only on the output dim (the group dim may not divide the mesh:
    g=28 at Qwen2-7B, or g=1 on tiny test models; a replicated group dim
    costs ~0.2% of the weight bytes and XLA slices it locally inside the
    grouped dot). lm_head stays in the int8 form (quantize_decoder_params
    keeps the head at 8 bits).
    """
    m = model_axis
    int4 = quantized == "int4"

    def w(spec_in, spec_out):
        if int4:
            return {"w_i4p": P(spec_in, spec_out), "scale": P(None, spec_out)}
        if quantized:
            return {"w_i8": P(spec_in, spec_out), "scale": P(spec_out)}
        return {"w": P(spec_in, spec_out)}

    def attn():
        spec = {
            "q": dict(w(None, m)),
            "k": dict(w(None, m)),
            "v": dict(w(None, m)),
            "o": dict(w(m, None)),
        }
        if cfg.qkv_bias:
            spec["q"]["b"] = P(m)
            spec["k"]["b"] = P(m)
            spec["v"]["b"] = P(m)
        return spec

    def mlp_mat(spec_in, spec_out):
        # Plain decoder params store mlp matrices as bare arrays (no "w"
        # wrapper); the quantized tree wraps them like attention does.
        return w(spec_in, spec_out) if quantized else P(spec_in, spec_out)

    layer = {
        "input_norm": P(None),
        "attn": attn(),
        "post_norm": P(None),
        "mlp": {"gate": mlp_mat(None, m), "up": mlp_mat(None, m),
                "down": mlp_mat(m, None)},
    }
    specs: Dict[str, Any] = {
        "embed": P(m, None),
        "layers": [layer for _ in range(cfg.num_layers)],
        "final_norm": P(None),
    }
    if not cfg.tie_embeddings:
        if int4:
            # bits=4 trees keep the logits head int8 (quantize_decoder_params).
            specs["lm_head"] = {"w_i8": P(None, m), "scale": P(m)}
        elif quantized:
            specs["lm_head"] = w(None, m)
        else:
            specs["lm_head"] = P(None, m)
    return specs


def vit_pspecs(num_layers: int, model_axis: str = MODEL_AXIS) -> Dict[str, Any]:
    """PartitionSpec tree matching `models/vit.init`."""
    m = model_axis

    def dense_col():
        return {"w": P(None, m), "b": P(m)}

    def dense_row():
        return {"w": P(m, None), "b": P(None)}

    def ln():
        return {"scale": P(None), "bias": P(None)}

    layer = {
        "ln1": ln(),
        "attn": {"q": dense_col(), "k": dense_col(), "v": dense_col(), "o": dense_row()},
        "ln2": ln(),
        "mlp": {"fc1": dense_col(), "fc2": dense_row()},
    }
    return {
        "patch_embed": {"w": P(None, None)},
        "class_embed": P(None),
        "pos_embed": P(None, None),
        "pre_ln": ln(),
        "layers": [layer for _ in range(num_layers)],
    }


def projector_pspecs(model_axis: str = MODEL_AXIS) -> Dict[str, Any]:
    """PartitionSpec tree matching `models/projector.init` (2-layer MLP)."""
    m = model_axis
    return {
        "fc1": {"w": P(None, m), "b": P(m)},
        "fc2": {"w": P(m, None), "b": P(None)},
    }


def kv_cache_pspecs(data_axis: str = DATA_AXIS, model_axis: str = MODEL_AXIS):
    """Specs for decoder.KVCache: [layers, B, Hkv, Lmax, Dh] ×2 + length [B]."""
    from streamchat_tpu.models.decoder import KVCache

    return KVCache(
        k=P(None, data_axis, model_axis, None, None),
        v=P(None, data_axis, model_axis, None, None),
        length=P(data_axis),
    )


def shard_pytree(tree: Any, specs: Any, mesh: Mesh) -> Any:
    """device_put every leaf with its NamedSharding."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: x is None,
    )
