"""ctypes wrapper + lazy build for native/frameproc.cpp.

`preprocess_frames_host(frames)` mirrors `pipeline/preprocess.preprocess_frames`
on the host: uint8 RGB [N, H, W, 3] -> CLIP-normalized float32 [N, 3, S, S].
The numpy fallback keeps behavior identical (bilinear-free: it delegates to
the jitted device op on arrays) when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "frameproc.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "build", "libframeproc.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            stale = not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            )
        except OSError:
            stale = not os.path.exists(_SO)
        if stale and not _build():
            return None
        if not os.path.exists(_SO):
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.preprocess_frames.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int,
        ]
        lib.preprocess_frames.restype = None
        lib.frameproc_abi_version.restype = ctypes.c_int
        if lib.frameproc_abi_version() != 1:
            return None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def preprocess_frames_host(
    frames: np.ndarray, image_size: int = 336, num_threads: int = 0
) -> np.ndarray:
    """uint8 RGB [N, H, W, 3] -> normalized float32 [N, 3, S, S] on host."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError("expected RGB frames [N, H, W, 3]")
    lib = _load()
    out = np.empty((n, 3, image_size, image_size), np.float32)
    if n == 0:
        return out
    if lib is not None:
        lib.preprocess_frames(
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            image_size, num_threads,
        )
        return out
    # Fallback: run the jitted device/CPU op and pull back to host.
    import jax.numpy as jnp

    from streamchat_tpu.pipeline.preprocess import preprocess_frames

    return np.asarray(preprocess_frames(jnp.asarray(frames), image_size))
