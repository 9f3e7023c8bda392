"""LongVA assembly: vision tower + projector + Qwen2 decoder + splice.

One TPU-resident model serves both the answerer and captioner roles — the
reference loads the *same* checkpoint twice onto two 80GB GPUs purely for
memory reasons (inference_streaming_longva_v2.py:697-700); here the roles are
just different prompts.

Key public methods mirror the reference surface:
* `encode_images` (llava_arch.py:179-184): pixels -> [N, 576, 4096].
* `generate_with_image_embedding` (llava_qwen.py:138-189): prompt text with
  `<image>` markers + precomputed visual embeddings -> generated text, with
  the embedding-splice semantics of
  `prepare_inputs_embeddings_for_multimodal` (llava_arch.py:208-343).

Prompt embeddings are assembled eagerly (host-orchestrated concat — the
ragged part), padded to a 128 bucket, then a single jitted
prefill+decode-loop program runs per (bucket, max_new_tokens) signature.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from streamchat_tpu.config import DecoderConfig, ViTConfig
from streamchat_tpu.models import decoder, generate as genlib, projector, vit
from streamchat_tpu.models.tokenizer import (
    IMAGE_TOKEN_INDEX,
    ByteTokenizer,
    load_tokenizer,
    tokenize_with_image_token,
)
from streamchat_tpu.utils.prng import KeySeq


@dataclasses.dataclass
class LongVA:
    vit_params: dict
    proj_params: dict
    dec_params: dict
    vit_cfg: ViTConfig
    dec_cfg: DecoderConfig
    tokenizer: object
    keys: KeySeq
    # Production decode path (VERDICT r1 item 4): "paged" routes generation
    # through the PagedKVCache (page-granular storage; with kv_budget_tokens
    # set, in-loop H2O compression keeps multi-round sessions inside the
    # budget — the working version of the reference's dormant zoo at
    # llavanext/model/kv_cache/modeling_kv_cache.py:237-852).
    # "contiguous" keeps the dense preallocated cache (token-exact twin).
    decode_backend: str = "paged"
    # KV budget in tokens (page-aligned). None = size the pool so it never
    # overflows (no compression). When set, the decode loop H2O-compresses
    # to 3/4 budget (sink=4, recent=budget/4) whenever the pool runs out.
    kv_budget_tokens: Optional[int] = None
    # Store KV pages as int8 + per-(token, head) scales (half the cache HBM;
    # long caption prefills at 7B need this to fit one 16 GB chip).
    # Exclusive with kv_budget_tokens for now.
    kv_int8: bool = False
    # Prompt padding bucket. 128 minimizes wasted prefill; COARSER buckets
    # (e.g. 2048) collapse varying prompt lengths into a handful of compiled
    # programs — on the axon backend every executable permanently reserves
    # its workspace, so unbounded shape variety eventually OOMs a long
    # session (observed: per-segment answer shapes evicting the caption
    # program's headroom at 7B geometry).
    prompt_bucket: int = 128
    # Speculative decoding (models/spec_decode): draft tokens per verify
    # step, 0 = off. Greedy output stays token-identical; the prompt's TEXT
    # tokens serve as the lookup corpus (answers quote retrieved captions,
    # so n-gram drafting hits). Applied on the paged backend when H2O and
    # top_p are off; decode at 7B is weight-bandwidth bound, so accepted
    # drafts are nearly free tokens.
    spec_tokens: int = 0
    spec_ngram: int = 3
    # Bounded cache of text-run embeddings keyed by token-id tuple: the
    # caption/summary prompts are CONSTANT text, and each eager embed_tokens
    # dispatch costs 50-90 ms through the remote-TPU relay.
    _text_cache: dict = dataclasses.field(default_factory=dict, repr=False)
    # Cached zero pad blocks keyed by (rows, dim, dtype): the splice pads
    # every prompt to its bucket, and building the pad eagerly per call was
    # two extra relay dispatches (zeros + second concatenate).
    _pad_cache: dict = dataclasses.field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @classmethod
    def init_random(
        cls,
        key: jax.Array,
        vit_cfg: ViTConfig | None = None,
        dec_cfg: DecoderConfig | None = None,
        tokenizer=None,
        dtype=jnp.bfloat16,
    ) -> "LongVA":
        vit_cfg = vit_cfg or ViTConfig()
        dec_cfg = dec_cfg or DecoderConfig.qwen2_7b()
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return cls(
            vit_params=vit.init(k1, vit_cfg, dtype),
            proj_params=projector.init(
                k2, vit_cfg.hidden_size, dec_cfg.hidden_size, dtype
            ),
            dec_params=decoder.init(k3, dec_cfg, dtype),
            vit_cfg=vit_cfg,
            dec_cfg=dec_cfg,
            tokenizer=tokenizer or ByteTokenizer(),
            keys=KeySeq(k4),
        )

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16) -> "LongVA":
        """Load a LongVA HF checkpoint (builder.py:27 equivalent)."""
        from streamchat_tpu.models import weights

        vit_cfg, dec_cfg, vit_p, proj_p, dec_p = weights.load_longva(path, dtype)
        return cls(
            vit_params=vit_p,
            proj_params=proj_p,
            dec_params=dec_p,
            vit_cfg=vit_cfg,
            dec_cfg=dec_cfg,
            tokenizer=load_tokenizer(path),
            keys=KeySeq(0),
        )

    def shard(self, mesh=None) -> "LongVA":
        """Shard parameters over a (data, model) mesh in place.

        One tensor-parallel copy serves both the answerer and captioner —
        the TPU answer to the reference's two 80 GB replicas
        (inference_streaming_longva_v2.py:697-700). With mesh=None, builds
        the best mesh over all visible devices; a single-device mesh is a
        no-op placement.
        """
        from streamchat_tpu.parallel import (
            decoder_pspecs,
            make_mesh,
            projector_pspecs,
            shard_pytree,
            vit_pspecs,
        )
        from streamchat_tpu.parallel.mesh import best_mesh_shape

        if mesh is None:
            import jax as _jax

            n = len(_jax.devices())
            mesh = make_mesh(*best_mesh_shape(n, kv_heads=self.dec_cfg.num_kv_heads))
        # Drop any lazily-attached fused-path folds before sharding: the
        # pspec tree matches the HF layout, and jax.tree.map requires
        # identical structures. They re-fold lazily on the next
        # encode_images if the placement stays single-device.
        if any("fused" in p for p in self.vit_params["layers"]):
            self.vit_params = dict(
                self.vit_params,
                layers=[{k: v for k, v in p.items() if k != "fused"}
                        for p in self.vit_params["layers"]],
            )
        self.vit_params = shard_pytree(
            self.vit_params, vit_pspecs(self.vit_cfg.num_layers), mesh
        )
        self.proj_params = shard_pytree(self.proj_params, projector_pspecs(), mesh)
        q0 = self.dec_params["layers"][0]["attn"]["q"]
        quantized = "int4" if "w_i4p" in q0 else "w_i8" in q0
        self.dec_params = shard_pytree(
            self.dec_params, decoder_pspecs(self.dec_cfg, quantized=quantized), mesh
        )
        self._text_cache.clear()    # cached embeds hold pre-shard placement
        self._pad_cache.clear()
        return self

    def quantize(self, quantize_embed: bool = False, bits: int = 8) -> "LongVA":
        """Switch the decoder to int8/int4 weight-only storage (ops/quant.py).

        Decode is weight-bandwidth bound on this hardware, so narrower
        storage directly divides single-stream decode latency: int8 halves
        the bf16 cost; bits=4 (group-128 RTN, lm_head kept int8) roughly
        halves it again at an accuracy trade the caller opts into.
        The ViT/projector stay bf16 (ingest is activation-bound, CLAUDE.md).
        quantize_embed also stores the token table as int8 rows (pure HBM
        saving; Qwen2's table alone is 1.09 GB bf16)."""
        from streamchat_tpu.ops.quant import quantize_decoder_params

        self.dec_params = quantize_decoder_params(
            self.dec_params, quantize_embed=quantize_embed, bits=bits
        )
        self._text_cache.clear()    # embedding table may have changed
        self._pad_cache.clear()
        return self

    # ------------------------------------------------------------------
    # Vision path
    # ------------------------------------------------------------------

    def encode_images(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """[N, 3, H, W] -> [N, P, lm_hidden] (tower -> projector; resampler
        is identity for LongVA)."""
        if (vit._use_fused(None)
                and not os.environ.get("SC_NO_VIT_FOLD")
                and "fused" not in self.vit_params["layers"][0]):
            # One-time fold for the fused Pallas path (vit.fold_params) —
            # the in-trace per-call fold costs ~6% ingest. Lazy so CPU /
            # multi-device constructions never pay the ~350 MB HBM;
            # SC_NO_VIT_FOLD=1 opts memory-tight servings out (the fused
            # path then folds in-trace — correct either way).
            self.vit_params = vit.fold_params(self.vit_params, self.vit_cfg)
        feats = vit.encode(self.vit_params, pixels, self.vit_cfg)
        return projector.apply(self.proj_params, feats)

    def embed_text(self, text: str) -> jnp.ndarray:
        """Token embeddings [T, D] (reference model.get_model().embed_tokens
        over tokenizer output, inference_streaming_longva_v2.py:122-123)."""
        ids = self.tokenizer.encode(text)
        return decoder.embed_tokens(self.dec_params, jnp.asarray(ids, jnp.int32))

    # ------------------------------------------------------------------
    # Embedding splice
    # ------------------------------------------------------------------

    def splice_prompt(
        self,
        prompt: str,
        image_embeddings: Optional[Sequence[jnp.ndarray]],
        bucket: Optional[int] = None,
        max_len: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, int]:
        """Prompt text -> (padded embeds [1, S_pad, D], valid length).

        Each `<image>` marker consumes the next entry of image_embeddings —
        a [T, D] feature block, or a LIST of such blocks, which join the
        single fused concatenate here (answer retrieval passes
        [short | level_0 | ... | level_k] this way: pre-concatenating them
        eagerly costs extra 50-90 ms relay dispatches per answer).
        Truncates to dec_cfg.max_position_embeddings like the reference's
        tokenizer_model_max_length clamp (llava_arch.py:288-291).
        """
        from streamchat_tpu.ops.quant import embed_dtype

        ids = tokenize_with_image_token(prompt, self.tokenizer)
        dtype = embed_dtype(self.dec_params)
        segments: List[jnp.ndarray] = []
        img_idx = 0
        text_run: List[int] = []

        def flush_text():
            nonlocal text_run
            if text_run:
                key = tuple(text_run)
                emb = self._text_cache.get(key)
                if emb is None:
                    emb = decoder.embed_tokens(
                        self.dec_params, jnp.asarray(text_run, jnp.int32)
                    )
                    if len(self._text_cache) >= 64:   # bound device residency
                        self._text_cache.pop(next(iter(self._text_cache)))
                    self._text_cache[key] = emb
                segments.append(emb)
                text_run = []

        for tid in ids:
            if tid == IMAGE_TOKEN_INDEX:
                flush_text()
                if image_embeddings is None or img_idx >= len(image_embeddings):
                    raise ValueError("prompt has more <image> tokens than embeddings")
                feats = image_embeddings[img_idx]
                img_idx += 1
                blocks = feats if isinstance(feats, (list, tuple)) else [feats]
                segments.extend(
                    b.reshape(-1, b.shape[-1]).astype(dtype) for b in blocks
                )
            else:
                text_run.append(tid)
        flush_text()

        limit = max_len or self.dec_cfg.max_position_embeddings
        length = sum(s.shape[0] for s in segments)
        if length > limit:
            embeds = jnp.concatenate(segments, axis=0)[:limit]
            segments = [embeds]
            length = limit
        if bucket is None:
            bucket = self.prompt_bucket
        padded = genlib.pad_to_bucket(length, bucket, minimum=bucket)
        if padded > length:
            # The pad block joins the SAME concatenate below (one device op
            # instead of concat -> zeros -> concat: each eager dispatch costs
            # 50-90 ms through the relay) and is cached per (rows, dtype) —
            # bucketing bounds the distinct shapes.
            pkey = (padded - length, segments[0].shape[1], str(dtype))
            pad = self._pad_cache.get(pkey)
            if pad is None:
                pad = jnp.zeros((padded - length, segments[0].shape[1]), dtype)
                if len(self._pad_cache) >= 32:
                    self._pad_cache.pop(next(iter(self._pad_cache)))
                self._pad_cache[pkey] = pad
            segments = list(segments) + [pad]
        embeds = (
            segments[0] if len(segments) == 1
            else jnp.concatenate(segments, axis=0)
        )
        return embeds[None], length

    def _splice_length(
        self,
        prompt: str,
        image_embeddings: Optional[Sequence[jnp.ndarray]],
        bucket: Optional[int] = None,
        max_len: Optional[int] = None,
    ) -> Tuple[int, int]:
        """(padded, valid) lengths splice_prompt would produce — computed
        ENTIRELY on the host (tokenize + arithmetic, no device ops), so
        batched callers can size pools and defer each row's actual splice
        until its prefill turn (generate_paged's lazy rows)."""
        ids = tokenize_with_image_token(prompt, self.tokenizer)
        total = 0
        img_idx = 0
        for tid in ids:
            if tid == IMAGE_TOKEN_INDEX:
                if image_embeddings is None or img_idx >= len(image_embeddings):
                    raise ValueError(
                        "prompt has more <image> tokens than embeddings"
                    )
                feats = image_embeddings[img_idx]
                img_idx += 1
                blocks = feats if isinstance(feats, (list, tuple)) else [feats]
                for b in blocks:
                    n = 1
                    for s in b.shape[:-1]:
                        n *= s
                    total += n
            else:
                total += 1
        limit = max_len or self.dec_cfg.max_position_embeddings
        length = min(total, limit)
        if bucket is None:
            bucket = self.prompt_bucket
        return genlib.pad_to_bucket(length, bucket, minimum=bucket), length

    # ------------------------------------------------------------------
    # Generation
    # ------------------------------------------------------------------

    def generate_with_image_embedding(
        self,
        prompt: str,
        image_embeddings: Optional[Sequence[jnp.ndarray]] = None,
        *,
        max_new_tokens: int = 256,
        temperature: float = 0.0,
        top_p: float | None = None,
        key: jax.Array | None = None,
        bucket: Optional[int] = None,
    ) -> str:
        import time as _time

        t0 = _time.time()
        embeds, length = self.splice_prompt(prompt, image_embeddings,
                                            bucket=bucket)
        t1 = _time.time()
        common = dict(
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_p=top_p,
            eos_ids=tuple(self.tokenizer.eos_ids),
        )
        if self.decode_backend == "paged":
            from streamchat_tpu.models.generate_paged import generate_paged_fetch

            # Fetch variant: the overflow flag rides the same device->host
            # transfer as the tokens (a separate bool(over) readback costs
            # an extra ~50-90 ms relay round trip per generate).
            toks_np, count_np = generate_paged_fetch(
                self.dec_params,
                self.dec_cfg,
                embeds,
                jnp.array([length], jnp.int32),
                key if key is not None else self.keys(),
                **common,
                **self._paged_budget(embeds.shape[1], max_new_tokens),
                **self._spec_kwargs([prompt], top_p),
            )
            t2 = t3 = _time.time()
        else:
            toks, count = genlib.generate(
                self.dec_params,
                self.dec_cfg,
                embeds,
                jnp.array([length], jnp.int32),
                key if key is not None else self.keys(),
                **common,
            )
            # ONE bulk device->host transfer: `int(t) for t in toks[0][:n]`
            # on a device array issues a slice dispatch + readback PER
            # TOKEN, which on the ~50-90 ms/call relayed backend costs
            # seconds per generation.
            t2 = _time.time()
            toks_np, count_np = jax.device_get((toks, count))
            t3 = _time.time()
        # Wall-clock attribution of the last generate call (splice includes
        # any host->device ride of offloaded image embeddings; generate is
        # the prefill+decode program; fetch is the token readback). Read by
        # perf probes/drivers; overwritten every call.
        self.last_timing = {"splice_s": round(t1 - t0, 2),
                            "generate_s": round(t2 - t1, 2),
                            "fetch_s": round(t3 - t2, 2)}
        return self.tokenizer.decode(toks_np[0][: int(count_np[0])].tolist()).strip()

    def _spec_kwargs(self, prompts, top_p) -> dict:
        """Speculative-decode kwargs for generate_paged, or {} when off.

        The lookup corpus is the prompts' text tokens (image sentinels
        dropped), padded to a 256 bucket so the corpus length does not mint
        new compiled shapes (axon executables permanently reserve their
        workspace — CLAUDE.md)."""
        if (
            self.spec_tokens <= 0
            or self.decode_backend != "paged"
            or self.kv_budget_tokens is not None   # spec excludes in-loop H2O
            or top_p is not None
        ):
            return {}
        from streamchat_tpu.models.spec_decode import build_lookup_arrays

        rows = [
            [t for t in tokenize_with_image_token(p, self.tokenizer) if t >= 0]
            for p in prompts
        ]
        return {
            "spec_tokens": self.spec_tokens,
            "spec_ngram": self.spec_ngram,
            **build_lookup_arrays(rows),
        }

    def _paged_budget(self, prompt_len: int, max_new_tokens: int) -> dict:
        """Paged-decode pool sizing. With kv_budget_tokens set, the pool is
        capped at the budget and in-loop H2O eviction (sink=4, recent=1/4,
        compressed size=3/4 budget) keeps long sessions inside it."""
        ps = 128
        if self.kv_budget_tokens is None:
            if self.kv_int8:
                return {"page_size": ps, "kv_int8": True}
            return {"page_size": ps}
        if self.kv_int8:
            raise ValueError("kv_int8 and kv_budget_tokens are exclusive")
        cap = max(-(-self.kv_budget_tokens // ps), 2) * ps
        recent = max(ps, cap // 4)
        sink = 4
        hh = (3 * cap) // 4 - sink - recent
        if hh <= 0:
            raise ValueError(f"kv_budget_tokens={self.kv_budget_tokens} too small")
        pages = cap // ps
        return {
            "page_size": ps,
            "num_pages": pages,
            "max_pages_per_seq": pages,
            "hh_size": hh,
            "recent_size": recent,
            "sink_size": sink,
        }

    def generate_with_image_embedding_batch(
        self,
        prompts: Sequence[str],
        image_embeddings: Sequence[Optional[Sequence[jnp.ndarray]]],
        *,
        max_new_tokens: int = 256,
        temperature: float = 0.0,
        top_p: float | None = None,
        key: jax.Array | None = None,
        bucket: Optional[int] = None,
    ) -> List[str]:
        """Batched multimodal generation: one prefill + one fused decode
        loop serve all rows (ragged lengths; rows pad to the longest row's
        bucket). The reference captions chunks strictly sequentially
        (utiles.py:539-556) — batching amortizes per-call host/dispatch
        overhead and reads the decode weights once per step for the whole
        batch instead of once per caption.

        With kv_budget_tokens set on the paged backend, rows generate
        SEQUENTIALLY through the budgeted per-row path instead: in-loop H2O
        eviction is batch-1-only, and falling back to one dense
        prompt+max_new cache per row (the round-2 behavior) silently blew
        the configured HBM budget — on this backend one OOM poisons the
        whole process."""
        if not prompts:
            return []
        if self.decode_backend == "paged" and self.kv_budget_tokens is not None:
            keys = (
                list(jax.random.split(key, len(prompts)))
                if key is not None else [None] * len(prompts)
            )
            return [
                self.generate_with_image_embedding(
                    p, embs, max_new_tokens=max_new_tokens,
                    temperature=temperature, top_p=top_p, key=k,
                    bucket=bucket,
                )
                for p, embs, k in zip(prompts, image_embeddings, keys)
            ]
        # Build equal-length rows WITHOUT a [B, S, D] concatenation: at
        # caption geometry (3 x 23k x 3584 bf16) the spliced rows, their
        # padded copies, and the concat together held ~1.4 GB of duplicate
        # prompt embeddings across the whole generate call — enough to OOM
        # the 15 GiB chip next to the page pool (round 3). Rows after the
        # first are LAZY (generate_paged materializes each at its prefill
        # turn — row sizes come from the host-only _splice_length), so at
        # most one ~160 MB spliced row exists before its pages land.
        sizes = [
            self._splice_length(p, embs, bucket=bucket)
            for p, embs in zip(prompts, image_embeddings)
        ]
        max_pad = max(padded for padded, _ in sizes)
        lengths = jnp.asarray([n for _, n in sizes], jnp.int32)

        def make_row(p, embs):
            e, _ = self.splice_prompt(p, embs, bucket=bucket)
            if e.shape[1] < max_pad:
                e = jnp.pad(e, ((0, 0), (0, max_pad - e.shape[1]), (0, 0)))
            return e

        rows = [make_row(prompts[0], image_embeddings[0])] + [
            (lambda p=p, embs=embs: make_row(p, embs))
            for p, embs in zip(prompts[1:], image_embeddings[1:])
        ]
        common = dict(
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_p=top_p,
            eos_ids=tuple(self.tokenizer.eos_ids),
        )
        k = key if key is not None else self.keys()
        if self.decode_backend == "paged" and self.kv_budget_tokens is None:
            from streamchat_tpu.models.generate_paged import generate_paged_fetch

            toks_np, count_np = generate_paged_fetch(
                self.dec_params, self.dec_cfg, rows, lengths, k,
                **common, **self._paged_budget(max_pad, max_new_tokens),
                **self._spec_kwargs(prompts, top_p),
            )
        else:
            toks, count = genlib.generate(
                self.dec_params, self.dec_cfg,
                jnp.concatenate(
                    [r() if callable(r) else r for r in rows], axis=0
                ),
                lengths, k, **common
            )
            # Bulk transfer (see generate_with_image_embedding: per-token
            # int() readbacks cost a relay round trip each).
            toks_np, count_np = jax.device_get((toks, count))
        return [
            self.tokenizer.decode(toks_np[row][: int(count_np[row])].tolist()).strip()
            for row in range(len(prompts))
        ]

    def score_with_image_embedding(
        self,
        prompt: str,
        target: str,
        image_embeddings: Optional[Sequence[jnp.ndarray]] = None,
    ) -> Tuple[float, float]:
        """Teacher-forced (mean NLL, PPL) of `target` given the spliced
        prompt — the `--ppl` metric path (reference
        `forward_with_fix_embedding`, llavanext/model/language_model/
        llava_llama.py:99; probed by utiles.py:1375-1561)."""
        from streamchat_tpu.models.scoring import sequence_nll

        # The target is a mid-sequence continuation: no BOS/specials.
        target_ids = self.tokenizer.encode(target, add_special_tokens=False)
        embeds, length = self.splice_prompt(prompt, image_embeddings)
        nll = sequence_nll(
            self.dec_params, self.dec_cfg, embeds, length,
            jnp.asarray(target_ids, jnp.int32),
        )
        return float(nll), float(jnp.exp(nll))
