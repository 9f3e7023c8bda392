"""Host-side video decode (L0).

The TPU never touches codecs: frames are decoded and preprocessed on host
and fed to the device as batched arrays (SURVEY.md §1 L0).
"""

from streamchat_tpu.video.reader import (
    SyntheticVideoReader,
    VideoReader,
    sample_frame_indices,
)

__all__ = ["SyntheticVideoReader", "VideoReader", "sample_frame_indices"]
