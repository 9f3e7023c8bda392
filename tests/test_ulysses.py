"""Ulysses all-to-all attention + USP hybrid (ring x ulysses) composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.ops.attention import _attention_reference
from streamchat_tpu.ops.ring_attention import ring_attention
from streamchat_tpu.ops.ulysses import ulysses_attention
from streamchat_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(2, 4)


@pytest.mark.parametrize("causal", [True, False])
def test_ulysses_matches_reference(mesh, causal, key):
    b, h, s, d = 2, 8, 64, 16
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d))
    k = jax.random.normal(kk, (b, h, s, d))
    v = jax.random.normal(kv, (b, h, s, d))
    out = ulysses_attention(q, k, v, mesh, "model", causal=causal)
    ref = _attention_reference(q, k, v, causal=causal, sm_scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_rejects_indivisible(mesh):
    q = jnp.zeros((1, 6, 64, 8))   # 6 heads not divisible by 4
    with pytest.raises(ValueError):
        ulysses_attention(q, q, q, mesh, "model")


def test_sp_flavors_coexist_on_two_axis_mesh(key):
    """Both SP flavors validated independently on one 2x2 (data, model)
    mesh. A NESTED ring-inside-ulysses (USP) composition is tracked as a
    known gap in PARITY.md."""
    import numpy as _np
    from jax.sharding import Mesh

    devices = _np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("data", "model"))

    b, h, s, d = 1, 4, 64, 16
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d))
    k = jax.random.normal(kk, (b, h, s, d))
    v = jax.random.normal(kv, (b, h, s, d))

    # Inner ulysses handles the 'model' shard of each ring block; the outer
    # ring rotates K/V 'data'-blocks. Equivalent exact attention:
    inner = lambda q_, k_, v_: ulysses_attention(
        q_, k_, v_, mesh, "model", causal=False
    )
    # Ring over data axis of the ulysses result requires non-causal here
    # (full attention), so compose as: ring over data of full attention is
    # just attention; we validate each axis independently instead:
    out_u = inner(q, k, v)
    out_r = ring_attention(q, k, v, mesh, "data", causal=False)
    ref = _attention_reference(q, k, v, causal=False, sm_scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_usp_nested_matches_reference(causal, key):
    """TRUE nested composition: ring attention inside a ulysses head
    scatter on a 2x2 (ring=data, ulysses=model) mesh."""
    import numpy as _np
    from jax.sharding import Mesh

    from streamchat_tpu.ops.ulysses import usp_attention

    devices = _np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("data", "model"))
    b, h, s, d = 2, 4, 64, 16
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d))
    k = jax.random.normal(kk, (b, h, s, d))
    v = jax.random.normal(kv, (b, h, s, d))
    out = usp_attention(q, k, v, mesh, "model", "data", causal=causal)
    ref = _attention_reference(q, k, v, causal=causal, sm_scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_usp_eight_devices(key):
    """4-way ring x 2-way ulysses over all 8 CPU-mesh devices."""
    import numpy as _np
    from jax.sharding import Mesh

    from streamchat_tpu.ops.ulysses import usp_attention

    devices = _np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("ring", "uly"))
    b, h, s, d = 1, 4, 128, 8
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d))
    k = jax.random.normal(kk, (b, h, s, d))
    v = jax.random.normal(kv, (b, h, s, d))
    out = usp_attention(q, k, v, mesh, "uly", "ring", causal=True)
    ref = _attention_reference(q, k, v, causal=True, sm_scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestFlashInUlysses:
    """Pallas flash slotted into ulysses' head-slice attention and USP's
    ring steps (interpret mode on the CPU mesh)."""

    def test_ulysses_flash_matches_reference(self, mesh, key):
        from streamchat_tpu.ops.attention import _attention_reference
        from streamchat_tpu.ops.ulysses import ulysses_attention

        b, h, s, d = 1, 4, 512, 16
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, s, d))
        k = jax.random.normal(kk, (b, h, s, d))
        v = jax.random.normal(kv, (b, h, s, d))
        out = ulysses_attention(q, k, v, mesh, "model", causal=True,
                                use_flash=True, interpret=True)
        ref = _attention_reference(q, k, v, causal=True, sm_scale=d**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_usp_flash_matches_reference(self, mesh, key):
        from streamchat_tpu.ops.attention import _attention_reference
        from streamchat_tpu.ops.ulysses import usp_attention

        b, h, s, d = 1, 4, 1024, 16   # ring=2 x ulysses=4 -> 128/dev blocks
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, s, d))
        k = jax.random.normal(kk, (b, h, s, d))
        v = jax.random.normal(kv, (b, h, s, d))
        out = usp_attention(q, k, v, mesh, ulysses_axis="model",
                            ring_axis="data", causal=True,
                            use_flash=True, interpret=True)
        ref = _attention_reference(q, k, v, causal=True, sm_scale=d**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
