"""StreamChat-TPU: a TPU-native streaming video-understanding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hmxiong/StreamChat (ICLR 2025): training-free streaming video QA with
hierarchical long/short visual memory and textual dialogue memory, evaluated
on StreamBench v0.3. See SURVEY.md for the reference analysis.
"""

__version__ = "0.1.0"

from streamchat_tpu.config import (
    BertConfig,
    DecoderConfig,
    MemoryConfig,
    ModelPaths,
    ParallelConfig,
    PipelineConfig,
    RetrievalConfig,
    SamplingConfig,
    VideoConfig,
    ViTConfig,
)

__all__ = [
    "BertConfig",
    "DecoderConfig",
    "MemoryConfig",
    "ModelPaths",
    "ParallelConfig",
    "PipelineConfig",
    "RetrievalConfig",
    "SamplingConfig",
    "VideoConfig",
    "ViTConfig",
]
