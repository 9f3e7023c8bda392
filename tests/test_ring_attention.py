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
