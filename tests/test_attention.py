"""Flash-attention kernel numerics vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.ops.attention import (
    _attention_reference,
    decode_attention,
    flash_attention,
)


def _rand_qkv(key, b, hq, hkv, sq, sk, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, sq, d), dtype)
    k = jax.random.normal(kk, (b, hkv, sk, d), dtype)
    v = jax.random.normal(kv, (b, hkv, sk, d), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_flash_matches_reference(key, causal):
    q, k, v = _rand_qkv(key, 1, 4, 4, 256, 256, 64)
    out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128, interpret=True)
    ref = _attention_reference(q, k, v, causal=causal, sm_scale=64**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_gqa(key):
    q, k, v = _rand_qkv(key, 1, 8, 2, 128, 128, 64)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    ref = _attention_reference(q, k, v, causal=True, sm_scale=64**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_kv_length_mask(key):
    q, k, v = _rand_qkv(key, 2, 4, 4, 128, 256, 64)
    length = jnp.array([100, 256], dtype=jnp.int32)
    out = flash_attention(
        q, k, v, length, causal=False, block_q=128, block_k=128, interpret=True
    )
    ref = _attention_reference(q, k, v, causal=False, sm_scale=64**-0.5, kv_length=length)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_matches_full_attention(key):
    # Decoding position L-1 must equal row L-1 of full causal attention.
    b, hq, hkv, lmax, d = 1, 8, 2, 64, 32
    q, k, v = _rand_qkv(key, b, hq, hkv, lmax, lmax, d)
    length = jnp.array([40], dtype=jnp.int32)
    ref = _attention_reference(
        q[:, :, :40], k[:, :, :40], v[:, :, :40], causal=True, sm_scale=d**-0.5
    )
    out = decode_attention(q[:, :, 39:40], k, v, length)
    np.testing.assert_allclose(
        np.asarray(out[:, :, 0]), np.asarray(ref[:, :, 39]), atol=2e-5
    )


def test_flash_autopad_ragged_lengths(key):
    """577-token (ViT-like) sequences pad to the 128 tile and mask correctly."""
    from streamchat_tpu.ops.attention import _attention_reference, flash_attention

    b, h, s, d = 2, 2, 577, 64
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d))
    k = jax.random.normal(kk, (b, h, s, d))
    v = jax.random.normal(kv, (b, h, s, d))
    out = flash_attention(q, k, v, causal=False, interpret=True)
    ref = _attention_reference(q, k, v, causal=False, sm_scale=d**-0.5)
    assert out.shape == (b, h, s, d)
    assert jnp.max(jnp.abs(out - ref)) < 2e-3


@pytest.mark.parametrize("causal", [True, False])
def test_flash_ragged_grid(key, causal):
    """Seq lens that are 128-multiples but NOT block multiples (e.g. the
    11648-token caption cache = 128*91) run with a ceil grid whose edge
    blocks are masked — not by shrinking blocks to divisors (round-3 perf
    fix). 384 with 256-blocks gives a 128-row edge block on both axes."""
    q, k, v = _rand_qkv(key, 2, 4, 2, 384, 384, 64)
    out = flash_attention(q, k, v, causal=causal, block_q=256, block_k=256, interpret=True)
    ref = _attention_reference(q, k, v, causal=causal, sm_scale=64**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_ragged_grid_kv_length(key):
    q, k, v = _rand_qkv(key, 2, 4, 4, 256, 384, 64)
    length = jnp.array([200, 384], dtype=jnp.int32)
    out = flash_attention(
        q, k, v, length, causal=False, block_q=256, block_k=256, interpret=True
    )
    ref = _attention_reference(q, k, v, causal=False, sm_scale=64**-0.5, kv_length=length)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_partial_ragged_grid(key):
    """Partial (ring) kernel with a ragged grid merges to the same result."""
    from streamchat_tpu.ops.attention import flash_attention_partial

    b, h, s, d = 1, 4, 384, 64
    q, k, v = _rand_qkv(key, b, h, h, s, s, d)
    acc, m, l = flash_attention_partial(
        q, k, v, jnp.int32(0), jnp.int32(0),
        causal=True, block_q=256, block_k=256, interpret=True,
    )
    out = (acc / l[..., None]).astype(q.dtype)
    ref = _attention_reference(q, k, v, causal=True, sm_scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vit_attention_matches_reference(key):
    from streamchat_tpu.ops.attention import _attention_reference
    from streamchat_tpu.ops.vit_attention import vit_attention

    n, h, s, d = 6, 4, 77, 32    # unaligned S and N exercise the padding
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (n, h, s, d))
    k = jax.random.normal(kk, (n, h, s, d))
    v = jax.random.normal(kv, (n, h, s, d))
    out = vit_attention(q, k, v, block_n=4, interpret=True)
    ref = _attention_reference(q, k, v, causal=False, sm_scale=d**-0.5)
    assert out.shape == (n, h, s, d)
    assert jnp.max(jnp.abs(out - ref)) < 2e-3
