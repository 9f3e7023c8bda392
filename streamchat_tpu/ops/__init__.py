from streamchat_tpu.ops.attention import (
    decode_attention,
    flash_attention,
    prefill_attention,
)
from streamchat_tpu.ops.clustering import kmeans, knn, pairwise_distances, soft_kmeans
from streamchat_tpu.ops.dedup import frame_descriptors, select_changed_frames, ssim_pairs
from streamchat_tpu.ops.forgetting import (
    forgetting_probabilities,
    sample_without_replacement,
    select_short_memory,
)
from streamchat_tpu.ops.kmeans import weighted_kmeans, weighted_kmeans_feature
from streamchat_tpu.ops.kv_compress import attention_mass, compress_kv, update_hh_score
from streamchat_tpu.ops.optical_flow import (
    compute_gradients,
    flow_magnitude,
    grayscale,
    keep_frames_optical_flow,
)
from streamchat_tpu.ops.paged_attention import (
    paged_decode_attention_pallas,
    paged_decode_attention_pallas_int8,
    paged_decode_attention_pallas_seq,
    paged_decode_attention_pallas_seq_int8,
)
from streamchat_tpu.ops.pooling import compress_spatial_features, pool_patch_grid
from streamchat_tpu.ops.quant import (
    matmul_any,
    qmatmul,
    qmatmul_int4,
    quantize_decoder_params,
    quantize_weight,
    quantize_weight_int4,
)
from streamchat_tpu.ops.ring_attention import (
    ring_attention,
    stripe_ring_attention,
    zigzag_ring_attention,
)
from streamchat_tpu.ops.ulysses import ulysses_attention, usp_attention
from streamchat_tpu.ops.vit_attention import vit_attention
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
    "kmeans",
    "knn",
    "pairwise_distances",
    "soft_kmeans",
    "attention_mass",
    "compress_kv",
    "update_hh_score",
    "compute_gradients",
    "flow_magnitude",
    "grayscale",
    "keep_frames_optical_flow",
    "paged_decode_attention_pallas",
    "paged_decode_attention_pallas_int8",
    "paged_decode_attention_pallas_seq",
    "paged_decode_attention_pallas_seq_int8",
    "matmul_any",
    "qmatmul",
    "qmatmul_int4",
    "quantize_decoder_params",
    "quantize_weight",
    "quantize_weight_int4",
    "ring_attention",
    "stripe_ring_attention",
    "zigzag_ring_attention",
    "ulysses_attention",
    "usp_attention",
    "vit_attention",
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
