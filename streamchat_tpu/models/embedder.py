"""BERT-family text encoders for retrieval.

Serves both retrieval subsystems:
* mxbai-colbert-large-v1 with CLS pooling — the tree-search embedder
  (utiles.py:688-708). The reference runs ONE HF forward PER TREE NODE per
  question; here all node captions are batched into a single padded forward.
* all-MiniLM-L6-v2 with mean pooling + L2 norm — the dialogue MemoryBank
  embedder (HuggingFaceEmbeddings, local_doc_qa.py:191).

Pure functional BERT; attention over padded batches uses an additive mask.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamchat_tpu.config import BertConfig

Params = dict


def _layernorm(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _lin(x, p):
    return x @ p["w"] + p["b"]


def init(key: jax.Array, cfg: BertConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 8 + 12 * cfg.num_layers))
    d = cfg.hidden_size

    def dense(kin, kout):
        return {
            "w": (jax.random.normal(next(keys), (kin, kout)) * kin**-0.5).astype(dtype),
            "b": jnp.zeros((kout,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "attn": {"q": dense(d, d), "k": dense(d, d), "v": dense(d, d), "o": dense(d, d)},
            "attn_ln": ln(),
            "mlp": {"fc1": dense(d, cfg.intermediate_size),
                    "fc2": dense(cfg.intermediate_size, d)},
            "mlp_ln": ln(),
        })
    return {
        "word_embed": (jax.random.normal(next(keys), (cfg.vocab_size, d)) * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(next(keys), (cfg.max_position_embeddings, d)) * 0.02).astype(dtype),
        "type_embed": jnp.zeros((cfg.type_vocab_size, d), dtype),
        "embed_ln": ln(),
        "layers": layers,
    }


def forward(
    params: Params, cfg: BertConfig, token_ids: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """token_ids, mask: [B, S] -> last hidden state [B, S, D]."""
    b, s = token_ids.shape
    x = (
        jnp.take(params["word_embed"], token_ids, axis=0)
        + params["pos_embed"][None, :s]
        + params["type_embed"][0][None, None]
    )
    x = _layernorm(x, params["embed_ln"], cfg.layernorm_eps)
    neg = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)  # [B,1,1,S]
    h = cfg.num_heads
    dh = cfg.hidden_size // h
    for p in params["layers"]:
        q = _lin(x, p["attn"]["q"]).reshape(b, s, h, dh)
        k = _lin(x, p["attn"]["k"]).reshape(b, s, h, dh)
        v = _lin(x, p["attn"]["v"]).reshape(b, s, h, dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * dh**-0.5 + neg
        a = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, s, cfg.hidden_size)
        x = _layernorm(x + _lin(o, p["attn"]["o"]), p["attn_ln"], cfg.layernorm_eps)
        hmid = jax.nn.gelu(
            _lin(x, p["mlp"]["fc1"]).astype(jnp.float32), approximate=False
        ).astype(x.dtype)
        x = _layernorm(x + _lin(hmid, p["mlp"]["fc2"]), p["mlp_ln"], cfg.layernorm_eps)
    return x


def pool(hidden: jnp.ndarray, mask: jnp.ndarray, strategy: str) -> jnp.ndarray:
    """[B, S, D] -> [B, D]. 'cls' (colbert, utiles.py:689-697) or 'mean'
    (sentence-transformers MiniLM)."""
    if strategy == "cls":
        return hidden[:, 0]
    if strategy == "mean":
        m = mask[:, :, None].astype(jnp.float32)
        return jnp.sum(hidden.astype(jnp.float32) * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1e-9
        )
    raise ValueError(f"unknown pooling: {strategy}")


@dataclasses.dataclass
class TextEmbedder:
    """Batched sentence embedder with a host-side tokenizer."""

    params: Params
    cfg: BertConfig
    tokenizer: object  # HF tokenizer or ByteTokenizer
    max_length: int = 256

    @classmethod
    def init_random(cls, key: jax.Array, cfg: BertConfig | None = None,
                    tokenizer=None, dtype=jnp.float32):
        from streamchat_tpu.models.tokenizer import ByteTokenizer

        cfg = cfg or BertConfig.tiny()
        return cls(init(key, cfg, dtype), cfg, tokenizer or ByteTokenizer(),
                   max_length=128)

    @classmethod
    def from_pretrained(cls, path: str, pooling: str, dtype=jnp.float32):
        from streamchat_tpu.models import weights
        from streamchat_tpu.models.tokenizer import load_tokenizer

        cfg, params = weights.load_bert(path, pooling, dtype)
        return cls(params, cfg, load_tokenizer(path))

    def _batch_ids(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        encoded: List[List[int]] = [
            self.tokenizer.encode(t)[: self.max_length] for t in texts
        ]
        # Pad the sequence to a 16-multiple AND the batch to a power of two:
        # the dialogue bank re-indexes after every answer with one more
        # document, so an exact batch dimension compiles a brand-new BERT
        # program per question (~tens of seconds each through the remote-TPU
        # relay — measured as the e2e "store" phase). Padding rows are
        # all-masked; callers slice the result back to len(texts).
        s = max(16, max((len(e) for e in encoded), default=1))
        s = ((s + 15) // 16) * 16
        n = 1 << (len(texts) - 1).bit_length() if texts else 1
        ids = np.zeros((n, s), np.int32)
        mask = np.zeros((n, s), np.int32)
        for i, e in enumerate(encoded):
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        return ids, mask

    def embed(self, texts: Sequence[str]) -> jnp.ndarray:
        """Texts -> [N, D] pooled embeddings (one batched forward)."""
        if not texts:
            return jnp.zeros((0, self.cfg.hidden_size), jnp.float32)
        ids, mask = self._batch_ids(texts)
        hidden = forward(self.params, self.cfg, jnp.asarray(ids), jnp.asarray(mask))
        return pool(hidden, jnp.asarray(mask), self.cfg.pooling)[: len(texts)]

    def embed_tokens(self, texts: Sequence[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Texts -> ([N, S, D] token embeddings, [N, S] mask) for MaxSim."""
        ids, mask = self._batch_ids(texts)
        hidden = forward(self.params, self.cfg, jnp.asarray(ids), jnp.asarray(mask))
        return hidden[: len(texts)], jnp.asarray(mask)[: len(texts)]
