"""WeightOffloader: host round-trips of idle param trees (utils/offload.py).

What fits where is the production concern (PARITY.md known gaps: batched
chunk-40 captioning needs ~1.3 GB the resident set occupies); these tests
pin the semantics the caption loop relies on — exact round-trip, sharding
preservation, correct compute while offloaded, and identical pipeline
results with the offloader engaged.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.utils.offload import WeightOffloader


class _Holder:
    def __init__(self, tree):
        self.params = tree


def _tree(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w_bf16": jax.random.normal(k1, (16, 8)).astype(jnp.bfloat16),
        "b_f32": jax.random.normal(k2, (8,)),
        "q": {"w_i8": jax.random.randint(k3, (8, 8), -127, 127, jnp.int8),
              "scale": jnp.ones((8,), jnp.float32)},
    }


class TestRoundTrip:
    def test_exact_values_and_dtypes(self):
        h = _Holder(_tree(jax.random.key(0)))
        ref = jax.tree_util.tree_map(np.asarray, h.params)
        off = WeightOffloader().register("p", h, "params")

        off.offload()
        # While offloaded the attribute holds HOST leaves (numpy), not
        # device arrays — that is what frees the HBM.
        assert all(
            isinstance(l, np.ndarray)
            for l in jax.tree_util.tree_leaves(h.params)
        )
        assert "p" in off.offloaded

        off.restore(block=True)
        assert off.offloaded == set()
        leaves = jax.tree_util.tree_leaves(h.params)
        assert all(isinstance(l, jax.Array) for l in leaves)
        for got, want in zip(
            leaves, jax.tree_util.tree_leaves(ref)
        ):
            assert got.dtype == want.dtype
            np.testing.assert_array_equal(np.asarray(got), want)

    def test_host_copy_cached_and_reused(self):
        h = _Holder(_tree(jax.random.key(1)))
        off = WeightOffloader().register("p", h, "params")
        off.offload()
        first = off._host["p"][0]
        off.restore()
        off.offload()
        # Second offload reuses the cached host leaves (no fresh D2H).
        assert off._host["p"][0] is first
        off.restore(block=True)

    def test_idempotent_and_partial_names(self):
        a, b = _Holder(_tree(jax.random.key(2))), _Holder(_tree(jax.random.key(3)))
        off = (WeightOffloader()
               .register("a", a, "params").register("b", b, "params"))
        off.offload(["a"])
        assert off.offloaded == {"a"}
        assert isinstance(jax.tree_util.tree_leaves(b.params)[0], jax.Array)
        off.offload()            # now both; re-offloading "a" is a no-op
        assert off.offloaded == {"a", "b"}
        off.restore(["b"])
        assert off.offloaded == {"a"}
        off.restore(block=True)
        assert off.host_bytes() > 0

    def test_compute_while_offloaded_still_correct(self):
        """Accidental use while offloaded computes through jit's implicit
        device_put (numpy operands), rather than crashing on a sentinel."""
        h = _Holder(_tree(jax.random.key(4)))
        x = jnp.ones((4, 16), jnp.bfloat16)
        want = np.asarray((x @ h.params["w_bf16"]).astype(jnp.float32))
        off = WeightOffloader().register("p", h, "params")
        off.offload()
        got = np.asarray((x @ h.params["w_bf16"]).astype(jnp.float32))
        np.testing.assert_array_equal(got, want)
        off.restore()


class TestSharding:
    def test_restore_preserves_named_sharding(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("data", "model"))
        sh = NamedSharding(mesh, P(None, "model"))
        h = _Holder({
            "w": jax.device_put(jnp.arange(64, dtype=jnp.float32).reshape(8, 8), sh),
            "b": jnp.zeros((8,)),   # unsharded leaf rides along
        })
        off = WeightOffloader().register("p", h, "params")
        off.offload()
        off.restore(block=True)
        assert h.params["w"].sharding == sh
        np.testing.assert_array_equal(
            np.asarray(h.params["w"]), np.arange(64, dtype=np.float32).reshape(8, 8)
        )


class TestPipelineIntegration:
    def test_update_memory_with_residents_matches(self):
        """offload_residents engages the offloader across the caption loop:
        the ViT/embedder trees are host-side exactly while captions run,
        restored before add_chunks, and the tree/captions are identical."""
        from tests.test_pipeline_e2e import _fresh_pipeline
        from streamchat_tpu.pipeline.memory_update import update_memory

        plain = _fresh_pipeline()
        pipe = _fresh_pipeline(memory_kw={"offload_residents": True})
        assert pipe.residents is not None and plain.residents is None

        feats = jax.random.normal(
            jax.random.key(5), (20, 4, pipe.model.dec_cfg.hidden_size)
        )
        tree_a = plain.new_tree()
        tree_a, short_a = update_memory(
            feats, tree_a, plain._caption, plain.cfg.memory, jax.random.key(9),
        )

        states = []

        def spy_caption(chunk):
            states.append(
                isinstance(
                    jax.tree_util.tree_leaves(pipe.model.vit_params)[0],
                    np.ndarray,
                )
                and isinstance(
                    jax.tree_util.tree_leaves(pipe.tree_embedder.params)[0],
                    np.ndarray,
                )
            )
            return pipe._caption(chunk)

        tree_b = pipe.new_tree()
        tree_b, short_b = update_memory(
            feats, tree_b, spy_caption, pipe.cfg.memory, jax.random.key(9),
            residents=pipe.residents,
        )
        assert states and all(states), (
            "residents must be host-side during every caption call")
        # Restored (device arrays again) before add_chunks/answering.
        assert isinstance(
            jax.tree_util.tree_leaves(pipe.model.vit_params)[0], jax.Array
        )
        assert isinstance(
            jax.tree_util.tree_leaves(pipe.tree_embedder.params)[0], jax.Array
        )
        assert [n.text for n in tree_a.roots] == [n.text for n in tree_b.roots]
        np.testing.assert_allclose(np.asarray(short_a), np.asarray(short_b))
        # Second segment re-offloads from the cached host copy.
        tree_b, _ = update_memory(
            feats, tree_b, spy_caption, pipe.cfg.memory, jax.random.key(11),
            residents=pipe.residents,
        )
        assert all(states)
        assert pipe.residents.offloaded == set()
