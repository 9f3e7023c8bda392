"""Text-only causal LM facade (LLaMA-3 judge / memory summarizer).

The reference loads a second HF stack (LlamaForCausalLM, device_map=auto)
just to run the judge (eval_video_qa_with_llama3_ours.py:88-90). Here the
same functional decoder that powers LongVA's Qwen2 backbone runs LLaMA-3
weights — one decode path for the whole framework.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from streamchat_tpu.config import DecoderConfig
from streamchat_tpu.models import decoder, generate as genlib
from streamchat_tpu.models.tokenizer import ByteTokenizer, load_tokenizer
from streamchat_tpu.utils.prng import KeySeq


@dataclasses.dataclass
class TextLM:
    params: dict
    cfg: DecoderConfig
    tokenizer: object
    keys: KeySeq
    # Speculative decoding (models/spec_decode), 0 = off. The judge is
    # GREEDY (the reference's judge runs do_sample commented out at
    # temperature 0.0, eval_video_qa_with_llama3_ours.py:145-150) and its
    # verdicts are formulaic ("{'llama_pred': 'yes', 'score': 4}"), so a
    # rolling corpus of recent outputs drafts most of each verdict; decode
    # at 8B is weight-bandwidth bound, so accepted drafts are nearly free.
    spec_tokens: int = 0
    spec_ngram: int = 3
    # Rolling lookup corpus: token ids of recent generations (bounded).
    _spec_corpus: list = dataclasses.field(default_factory=list, repr=False)

    @classmethod
    def init_random(cls, key: jax.Array, cfg: DecoderConfig | None = None,
                    tokenizer=None, dtype=jnp.bfloat16) -> "TextLM":
        cfg = cfg or DecoderConfig.llama3_8b()
        k1, k2 = jax.random.split(key)
        return cls(decoder.init(k1, cfg, dtype), cfg,
                   tokenizer or ByteTokenizer(), KeySeq(k2))

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16) -> "TextLM":
        from streamchat_tpu.models import weights

        cfg, params = weights.load_decoder(path, dtype)
        return cls(params, cfg, load_tokenizer(path), KeySeq(0))

    def shard(self, mesh=None) -> "TextLM":
        """Tensor-parallel placement over a mesh (see LongVA.shard)."""
        from streamchat_tpu.parallel import decoder_pspecs, make_mesh, shard_pytree
        from streamchat_tpu.parallel.mesh import best_mesh_shape

        if mesh is None:
            n = len(jax.devices())
            mesh = make_mesh(*best_mesh_shape(n, kv_heads=self.cfg.num_kv_heads))
        q0 = self.params["layers"][0]["attn"]["q"]
        quantized = "int4" if "w_i4p" in q0 else "w_i8" in q0
        self.params = shard_pytree(
            self.params, decoder_pspecs(self.cfg, quantized=quantized), mesh
        )
        return self

    def quantize(self, bits: int = 8) -> "TextLM":
        """Int8/int4 weight-only decoder storage (see LongVA.quantize)."""
        from streamchat_tpu.ops.quant import quantize_decoder_params

        self.params = quantize_decoder_params(self.params, bits=bits)
        return self

    def generate(
        self,
        prompt: str,
        *,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float | None = None,
    ) -> str:
        return self.generate_batch(
            [prompt], max_new_tokens=max_new_tokens,
            temperature=temperature, top_p=top_p,
        )[0]

    def generate_batch(
        self,
        prompts: list,
        *,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float | None = None,
    ) -> list:
        """Batched generation: prompts pad to one 128-token bucket, one
        prefill + one fused decode loop serve the whole batch (the judge's
        per-prediction HF generate, one prompt at a time, is the reference's
        eval bottleneck — inference_streamchat_v0.3.sh works around it with
        per-GPU process fan-out)."""
        if isinstance(prompts, str):
            # A bare string iterates as characters -> one batch ROW per
            # char (a 1.3k-char judge prompt once compiled a 22 GB KV
            # pool). Fail loudly instead.
            raise TypeError("generate_batch expects a list of prompts; "
                            "got a bare str — use generate() instead")
        if not prompts:
            return []
        from streamchat_tpu.ops.quant import embed_dim, embed_dtype

        dtype = embed_dtype(self.params)
        # Judge/chat prompts carry explicit special tokens (the hand-built
        # <|begin_of_text|> header) — never let the tokenizer add a 2nd BOS.
        ids = [self.tokenizer.encode(p, add_special_tokens=False) for p in prompts]
        lengths = [len(i) for i in ids]
        padded = genlib.pad_to_bucket(max(lengths))
        b = len(prompts)
        d = embed_dim(self.params)
        embeds = jnp.zeros((b, padded, d), dtype)
        for row, seq in enumerate(ids):
            e = decoder.embed_tokens(self.params, jnp.asarray(seq, jnp.int32))
            embeds = jax.lax.dynamic_update_slice(
                embeds, e[None].astype(dtype), (row, 0, 0)
            )
        if self.spec_tokens > 0 and top_p is None:
            from streamchat_tpu.models.generate_paged import generate_paged

            toks, count = generate_paged(
                self.params, self.cfg, embeds,
                jnp.asarray(lengths, jnp.int32), self.keys(),
                max_new_tokens=max_new_tokens,
                temperature=temperature, top_p=top_p,
                eos_ids=tuple(self.tokenizer.eos_ids),
                spec_tokens=self.spec_tokens, spec_ngram=self.spec_ngram,
                **self._spec_lookup(ids),
            )
        else:
            toks, count = genlib.generate(
                self.params, self.cfg, embeds,
                jnp.asarray(lengths, jnp.int32), self.keys(),
                max_new_tokens=max_new_tokens,
                temperature=temperature, top_p=top_p,
                eos_ids=tuple(self.tokenizer.eos_ids),
            )
        # Bulk device->host transfer; per-token int() readbacks pay a relay
        # round trip each (see longva.generate_with_image_embedding).
        toks_np, count_np = jax.device_get((toks, count))
        outs = [
            toks_np[row][: int(count_np[row])].tolist() for row in range(b)
        ]
        if self.spec_tokens > 0:
            # Feed the rolling corpus: future verdicts share these n-grams.
            self._spec_corpus.extend(o for o in outs if o)
            del self._spec_corpus[:-8]
        return [self.tokenizer.decode(o).strip() for o in outs]

    def _spec_lookup(self, ids) -> dict:
        """Lookup corpus rows: each prompt's own tokens + the rolling
        recent-output corpus (shared bucket/cap policy:
        spec_decode.build_lookup_arrays)."""
        from streamchat_tpu.models.spec_decode import build_lookup_arrays

        recent = [t for o in self._spec_corpus for t in o][-1024:]
        return build_lookup_arrays([list(r) + recent for r in ids])
