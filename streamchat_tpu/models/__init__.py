from streamchat_tpu.models import (
    decoder,
    embedder,
    generate,
    generate_paged,
    paged_kv,
    projector,
    resampler,
    tokenizer,
    vit,
)
from streamchat_tpu.models.decoder import KVCache
from streamchat_tpu.models.embedder import TextEmbedder
from streamchat_tpu.models.longva import LongVA

__all__ = [
    "decoder",
    "embedder",
    "generate",
    "generate_paged",
    "paged_kv",
    "resampler",
    "projector",
    "tokenizer",
    "vit",
    "KVCache",
    "TextEmbedder",
    "LongVA",
]
