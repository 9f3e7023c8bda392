"""Native frameproc tests: build, numerics vs the jitted device op, threading."""

import numpy as np
import pytest

from streamchat_tpu.native.frameproc import native_available, preprocess_frames_host


def test_native_builds():
    assert native_available(), "g++ build of native/frameproc.cpp failed"


def test_matches_device_preprocess():
    import jax.numpy as jnp

    from streamchat_tpu.pipeline.preprocess import preprocess_frames

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (3, 100, 140, 3), np.uint8)
    host = preprocess_frames_host(frames, image_size=56)
    dev = np.asarray(preprocess_frames(jnp.asarray(frames), 56))
    assert host.shape == dev.shape == (3, 3, 56, 56)
    # Bicubic implementations differ in tap weighting at edges; interior
    # agreement should be tight in normalized units.
    diff = np.abs(host - dev)[:, :, 2:-2, 2:-2]
    assert float(np.mean(diff)) < 0.08, float(np.mean(diff))


def test_square_input_identity_scale():
    """S x S input: resize is identity, so only normalize applies."""
    from streamchat_tpu.pipeline.preprocess import CLIP_MEAN, CLIP_STD

    frames = np.full((1, 56, 56, 3), 128, np.uint8)
    out = preprocess_frames_host(frames, image_size=56)
    expected = (128 / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    assert np.allclose(out[0, :, 10, 10], expected, atol=1e-3)


def test_thread_counts_agree():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (8, 90, 120, 3), np.uint8)
    a = preprocess_frames_host(frames, 56, num_threads=1)
    b = preprocess_frames_host(frames, 56, num_threads=4)
    assert np.array_equal(a, b)


def test_empty_batch():
    out = preprocess_frames_host(np.zeros((0, 10, 10, 3), np.uint8), 56)
    assert out.shape == (0, 3, 56, 56)
