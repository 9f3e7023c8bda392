from streamchat_tpu.ops.attention import (
    decode_attention,
    flash_attention,
    prefill_attention,
)
from streamchat_tpu.ops.dedup import frame_descriptors, select_changed_frames, ssim_pairs
from streamchat_tpu.ops.forgetting import (
    forgetting_probabilities,
    sample_without_replacement,
    select_short_memory,
)
from streamchat_tpu.ops.kmeans import weighted_kmeans, weighted_kmeans_feature
from streamchat_tpu.ops.pooling import compress_spatial_features, pool_patch_grid
from streamchat_tpu.ops.retrieval import (
    cosine_scores,
    cosine_topk,
    l2_normalize,
    maxsim_score,
)
from streamchat_tpu.ops.sampling import sample_token

__all__ = [
    "decode_attention",
    "flash_attention",
    "prefill_attention",
    "frame_descriptors",
    "select_changed_frames",
    "ssim_pairs",
    "forgetting_probabilities",
    "sample_without_replacement",
    "select_short_memory",
    "weighted_kmeans",
    "weighted_kmeans_feature",
    "compress_spatial_features",
    "pool_patch_grid",
    "cosine_scores",
    "cosine_topk",
    "l2_normalize",
    "maxsim_score",
    "sample_token",
]
