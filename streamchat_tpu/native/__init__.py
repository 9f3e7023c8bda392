"""Native (C++) host-side components, loaded via ctypes.

Build happens lazily on first use (g++ is in the image; no pybind11) and the
result is cached next to the source. Every entry point has a pure-numpy
fallback so the framework never hard-depends on the toolchain.
"""

from streamchat_tpu.native.frameproc import (
    native_available,
    preprocess_frames_host,
)

__all__ = ["native_available", "preprocess_frames_host"]
