"""Ring attention vs single-device reference on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.ops.attention import _attention_reference
from streamchat_tpu.ops.ring_attention import ring_attention
from streamchat_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(2, 4)  # (data=2, model=4); ring over 'model'


@pytest.mark.parametrize("causal", [True, False])
def test_matches_reference(mesh, causal, key):
    b, h, s, d = 2, 4, 64, 16
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d))
    k = jax.random.normal(kk, (b, h, s, d))
    v = jax.random.normal(kv, (b, h, s, d))
    out = ring_attention(q, k, v, mesh, "model", causal=causal)
    ref = _attention_reference(q, k, v, causal=causal, sm_scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gqa(mesh, key):
    b, hq, hkv, s, d = 1, 8, 2, 32, 16
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, s, d))
    k = jax.random.normal(kk, (b, hkv, s, d))
    v = jax.random.normal(kv, (b, hkv, s, d))
    out = ring_attention(q, k, v, mesh, "model", causal=True)
    ref = _attention_reference(q, k, v, causal=True, sm_scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_rejects_indivisible(mesh, key):
    q = jnp.zeros((1, 2, 30, 8))
    with pytest.raises(ValueError):
        ring_attention(q, q, q, mesh, "model")


class TestFlashBlockPath:
    """The Pallas partial kernel slotted into _block_attn (interpret mode on
    CPU; on TPU the backend check enables it automatically)."""

    def test_partial_kernel_matches_xla_block(self, key):
        """flash_attention_partial's (acc, m, l) vs the XLA _block_attn."""
        from streamchat_tpu.ops.attention import flash_attention_partial
        from streamchat_tpu.ops.ring_attention import NEG_INF, _block_attn

        b, h, sq, sk, d = 1, 2, 128, 128, 16
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, sq, d))
        k = jax.random.normal(kk, (b, h, sk, d))
        v = jax.random.normal(kv, (b, h, sk, d))
        for q_off, k_off in [(0, 0), (128, 0), (0, 128)]:
            a_ref, m_ref, l_ref = _block_attn(
                q, k, v, jnp.asarray(q_off), jnp.asarray(k_off),
                d**-0.5, True, use_flash=False,
            )
            a, m, l = flash_attention_partial(
                q, k, v, jnp.asarray(q_off), jnp.asarray(k_off),
                causal=True, sm_scale=d**-0.5, interpret=True, neg_inf=NEG_INF,
            )
            # acc values are only defined up to the per-row max subtraction;
            # compare the normalized output and the denominators' ratio.
            l_safe = np.where(np.asarray(l_ref) == 0, 1, np.asarray(l_ref))
            l_safe2 = np.where(np.asarray(l) == 0, 1, np.asarray(l))
            np.testing.assert_allclose(
                np.asarray(a) / l_safe2[..., None],
                np.asarray(a_ref) / l_safe[..., None],
                atol=2e-5,
            )
            # Fully-masked rows report zero mass on both paths.
            np.testing.assert_array_equal(
                np.asarray(l) == 0, np.asarray(l_ref) == 0
            )

    @pytest.mark.parametrize("causal", [True, False])
    def test_ring_with_flash_matches_reference(self, mesh, causal, key):
        """Full ring with the Pallas per-step kernel (interpret) is exact."""
        b, h, s, d = 1, 2, 512, 16      # 128 tokens per device on model=4
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, s, d))
        k = jax.random.normal(kk, (b, h, s, d))
        v = jax.random.normal(kv, (b, h, s, d))
        out = ring_attention(q, k, v, mesh, "model", causal=causal,
                             use_flash=True, interpret=True)
        ref = _attention_reference(q, k, v, causal=causal, sm_scale=d**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_ring_flash_gqa(self, mesh, key):
        b, hq, hkv, s, d = 1, 8, 2, 512, 16
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, hq, s, d))
        k = jax.random.normal(kk, (b, hkv, s, d))
        v = jax.random.normal(kv, (b, hkv, s, d))
        out = ring_attention(q, k, v, mesh, "model", causal=True,
                             use_flash=True, interpret=True)
        ref = _attention_reference(q, k, v, causal=True, sm_scale=d**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestZigzag:
    """Load-balanced zigzag ring (same contract as ring_attention)."""

    def test_indices_roundtrip(self):
        from streamchat_tpu.ops.ring_attention import (
            _inverse_permutation, zigzag_indices,
        )

        idx = zigzag_indices(32, 4)
        assert sorted(np.asarray(idx).tolist()) == list(range(32))
        inv = _inverse_permutation(idx)
        np.testing.assert_array_equal(
            np.asarray(idx)[np.asarray(inv)], np.arange(32)
        )
        # Device 0 holds chunks 0 and 7 (lowest + highest).
        assert np.asarray(idx)[:8].tolist() == list(range(4)) + list(range(28, 32))

    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_reference(self, mesh, causal, key):
        from streamchat_tpu.ops.ring_attention import zigzag_ring_attention

        b, h, s, d = 2, 4, 64, 16
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, s, d))
        k = jax.random.normal(kk, (b, h, s, d))
        v = jax.random.normal(kv, (b, h, s, d))
        out = zigzag_ring_attention(q, k, v, mesh, "model", causal=causal)
        ref = _attention_reference(q, k, v, causal=causal, sm_scale=d**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gqa_with_flash_interpret(self, mesh, key):
        from streamchat_tpu.ops.ring_attention import zigzag_ring_attention

        b, hq, hkv, s, d = 1, 8, 2, 2048, 16   # 256/device -> 128 per chunk
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, hq, s, d))
        k = jax.random.normal(kk, (b, hkv, s, d))
        v = jax.random.normal(kv, (b, hkv, s, d))
        out = zigzag_ring_attention(q, k, v, mesh, "model", causal=True,
                                    use_flash=True, interpret=True)
        ref = _attention_reference(q, k, v, causal=True, sm_scale=d**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_rejects_odd_split(self, mesh, key):
        from streamchat_tpu.ops.ring_attention import zigzag_ring_attention

        q = jnp.zeros((1, 2, 36, 8))
        with pytest.raises(ValueError):
            zigzag_ring_attention(q, q, q, mesh, "model")


class TestStripe:
    """Token-interleaved stripe ring (reference's stripe variant)."""

    def test_indices_roundtrip(self):
        from streamchat_tpu.ops.ring_attention import (
            _inverse_permutation, stripe_indices,
        )

        idx = stripe_indices(16, 4)
        assert np.asarray(idx)[:4].tolist() == [0, 4, 8, 12]
        inv = _inverse_permutation(idx)
        np.testing.assert_array_equal(
            np.asarray(idx)[np.asarray(inv)], np.arange(16)
        )

    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_reference(self, mesh, causal, key):
        from streamchat_tpu.ops.ring_attention import stripe_ring_attention

        b, h, s, d = 2, 4, 64, 16
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, s, d))
        k = jax.random.normal(kk, (b, h, s, d))
        v = jax.random.normal(kv, (b, h, s, d))
        out = stripe_ring_attention(q, k, v, mesh, "model", causal=causal)
        ref = _attention_reference(q, k, v, causal=causal, sm_scale=d**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gqa_with_flash_interpret(self, mesh, key):
        from streamchat_tpu.ops.ring_attention import stripe_ring_attention

        b, hq, hkv, s, d = 1, 4, 2, 512, 16   # 128 tokens per device
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, hq, s, d))
        k = jax.random.normal(kk, (b, hkv, s, d))
        v = jax.random.normal(kv, (b, hkv, s, d))
        out = stripe_ring_attention(q, k, v, mesh, "model", causal=True,
                                    use_flash=True, interpret=True)
        ref = _attention_reference(q, k, v, causal=True, sm_scale=d**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestVarlen:
    """Ring-varlen: per-row kv_length masking (reference
    ring_flash_attn_varlen_*)."""

    @pytest.mark.parametrize("use_flash", [False, True])
    def test_ragged_rows_match_reference(self, mesh, use_flash, key):
        b, h, s, d = 2, 4, 512, 16
        lengths = jnp.asarray([300, 512], jnp.int32)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, s, d))
        k = jax.random.normal(kk, (b, h, s, d))
        v = jax.random.normal(kv, (b, h, s, d))
        out = ring_attention(q, k, v, mesh, "model", causal=True,
                             kv_length=lengths,
                             use_flash=use_flash, interpret=use_flash)
        ref = _attention_reference(q, k, v, causal=True, sm_scale=d**-0.5,
                                   kv_length=lengths)
        # Compare only valid query rows (padded rows are garbage on both
        # paths by design).
        for row, n in enumerate([300, 512]):
            np.testing.assert_allclose(
                np.asarray(out)[row, :, :n], np.asarray(ref)[row, :, :n],
                atol=2e-5,
            )
