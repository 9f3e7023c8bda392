"""Tests for clustering extras, projector/resampler registries, judge formats,
MC scoring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.ops.clustering import kmeans, knn, pairwise_distances, soft_kmeans


class TestClusteringExtras:
    def test_kmeans_separates_blobs(self, key):
        a = jax.random.normal(key, (20, 8)) * 0.1
        b = jax.random.normal(jax.random.key(1), (20, 8)) * 0.1 + 10.0
        x = jnp.concatenate([a, b])
        c, labels = kmeans(x, jax.random.key(2), num_clusters=2)
        l = np.asarray(labels)
        assert len(set(l[:20])) == 1 and len(set(l[20:])) == 1
        assert l[0] != l[20]

    def test_cosine_metric(self, key):
        x = jax.random.normal(key, (4, 8))
        d = pairwise_distances(x, x, "cosine")
        assert np.allclose(np.diag(np.asarray(d)), 0.0, atol=1e-5)

    def test_soft_kmeans_assignments_sum_to_one(self, key):
        x = jax.random.normal(key, (12, 4))
        _, w = soft_kmeans(x, key, num_clusters=3)
        assert np.allclose(np.asarray(w).sum(axis=1), 1.0, atol=1e-5)

    def test_knn(self, key):
        pts = jnp.eye(5, 4)
        q = jnp.eye(2, 4)
        d, idx = knn(q, pts, k=1)
        assert list(np.asarray(idx)[:, 0]) == [0, 1]
        assert np.allclose(np.asarray(d)[:, 0], 0.0, atol=1e-6)


class TestRegistries:
    def test_projector_registry(self, key):
        from streamchat_tpu.models import projector

        for name in ("mlp2x_gelu", "linear", "identity"):
            init_fn, apply_fn = projector.build(name)
            p = init_fn(key, 8, 16, jnp.float32)
            x = jnp.ones((2, 3, 8))
            out = apply_fn(p, x)
            assert out.shape[-1] == (8 if name == "identity" else 16)
        with pytest.raises(ValueError):
            projector.build("pooler")

    def test_resampler_registry(self, key):
        from streamchat_tpu.models import resampler

        x = jax.random.normal(key, (2, 16, 8))
        assert resampler.build(None)(x).shape == (2, 16, 8)
        assert resampler.build("spatial_pool")(x, stride=2).shape == (2, 4, 8)
        dropped = resampler.build("masked_drop")(x, key, ratio=0.5)
        assert dropped.shape == (2, 8, 8)


class TestJudgeFormats:
    def test_generic_format(self):
        from streamchat_tpu.eval.judge import judge_predictions

        preds = [{"question": "Q", "answer": "A", "pred": "A!"}]
        out = judge_predictions(
            preds, lambda p: "{'llama_pred': 'yes', 'score': 5}", fmt="generic"
        )
        assert out[0]["llama_pred"] == "yes"
        assert out[0]["pred"] == "A!"


class TestMCScoring:
    def test_mc_accuracy(self):
        from streamchat_tpu.eval.scoring import mc_accuracy

        rows = [
            {"truth": 1, "correct_answer": 1},
            {"truth": 2, "correct_answer": 0},
            {"truth": 3, "correct_answer": -1},
        ]
        s = mc_accuracy(rows)
        assert s["num_total"] == 3
        assert s["num_valids"] == 2
        assert s["num_corrects"] == 1
        assert s["acc"] == pytest.approx(1 / 3)


class TestNextQA:
    def test_grouped_accuracy(self, tmp_path):
        from streamchat_tpu.eval.scoring import nextqa_grouped_accuracy

        csv_path = tmp_path / "val.csv"
        csv_path.write_text(
            "video,qid,type\n"
            "v1,0,CW\n"
            "v1,1,TP\n"
            "v2,0,DO\n"
        )
        rows = [
            {"id": "v1_0", "truth": 2, "correct_answer": 2},
            {"id": "v1_1", "truth": 1, "correct_answer": 0},
            {"id": "v2_0", "truth": 3, "correct_answer": 3},
        ]
        out = nextqa_grouped_accuracy(rows, str(csv_path))
        assert out["per_type"]["CW"] == {"acc": 1.0, "count": 1}
        # TP folds into TN.
        assert out["per_type"]["TN"] == {"acc": 0.0, "count": 1}
        assert out["per_group"]["C"] == 1.0
        assert out["per_group"]["T"] == 0.0
        assert out["overall_acc"] == pytest.approx(2 / 3)


class TestMultihost:
    def test_host_shard(self):
        from streamchat_tpu.parallel.multihost import host_shard, initialize

        pid, n = initialize()
        assert (pid, n) == (0, 1)
        items = list(range(10))
        assert host_shard(items, 0, 3) == [0, 1, 2, 3]
        assert host_shard(items, 2, 3) == [8, 9]
        got = [x for i in range(3) for x in host_shard(items, i, 3)]
        assert got == items


class TestParametricResamplers:
    """Perceiver / Q-Former resamplers (reference
    longva/model/multimodal_resampler/{perceiver,qformer}.py)."""

    def test_perceiver_shapes_and_determinism(self, key):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from streamchat_tpu.models.resampler import build_parametric

        params, apply = build_parametric(
            "perceiver", key, 64,
            mm_perceiver_depth=2, mm_perceiver_latents=8,
            dim_head=16, heads=4,
        )
        feats = jax.random.normal(jax.random.key(1), (3, 20, 64))
        out = apply(params, feats)
        assert out.shape == (3, 8, 64)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(apply(params, feats))
        )
        assert np.all(np.isfinite(np.asarray(out)))
        # Latents attend to media: different features -> different output.
        out2 = apply(params, feats * 2.0)
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_qformer_shapes_and_cross_freq_quirk(self, key):
        import jax
        import numpy as np

        from streamchat_tpu.models.resampler import build_parametric

        # mm_qformer_depth feeds cross_attention_freq (reference
        # qformer.py:1110), NOT the layer count.
        params, apply = build_parametric(
            "qformer", key, 48,
            mm_qformer_depth=3, mm_qformer_latents=5,
            hidden=32, num_layers=6, heads=4, intermediate=64,
        )
        assert len(params["layers"]) == 6
        cross_layers = [i for i, p in enumerate(params["layers"]) if "cross" in p]
        assert cross_layers == [0, 3]          # every 3rd block
        # Cross K/V project from the VISION width (encoder_width).
        assert params["layers"][0]["cross"]["k"]["w"].shape == (48, 32)

        feats = jax.random.normal(jax.random.key(1), (2, 30, 48))
        out = apply(params, feats)
        assert out.shape == (2, 5, 32)
        assert np.all(np.isfinite(np.asarray(out)))
        out2 = apply(params, feats * 3.0)
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_unknown_parametric_rejected(self, key):
        import pytest as _pytest

        from streamchat_tpu.models.resampler import build_parametric

        with _pytest.raises(KeyError):
            build_parametric("pooler", key, 8)


class TestSoftDTW:
    """ops/clustering.soft_dtw: TPU port of the reference's numba-CUDA
    soft-DTW (kmeans_pytorch/soft_dtw_cuda.py)."""

    @staticmethod
    def _ref(x, y, gamma):
        import numpy as np

        n, m = len(x), len(y)
        D = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
        R = np.full((n + 1, m + 1), np.inf)
        R[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                cands = np.array([R[i - 1, j], R[i, j - 1], R[i - 1, j - 1]])
                zmax = np.max(-cands / gamma)
                softmin = -gamma * (np.log(np.sum(np.exp(-cands / gamma - zmax)))
                                    + zmax)
                R[i, j] = D[i - 1, j - 1] + softmin
        return R[n, m]

    def test_matches_reference_dp(self, key):
        import numpy as np

        from streamchat_tpu.ops.clustering import soft_dtw

        rng = np.random.default_rng(0)
        x = rng.normal(size=(7, 3)).astype(np.float32)
        y = rng.normal(size=(5, 3)).astype(np.float32)
        for gamma in (0.1, 1.0):
            got = float(soft_dtw(jnp.asarray(x), jnp.asarray(y), gamma=gamma))
            want = self._ref(x, y, gamma)
            np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_identical_sequences_near_zero(self):
        import numpy as np

        from streamchat_tpu.ops.clustering import soft_dtw

        x = np.random.default_rng(1).normal(size=(6, 4)).astype(np.float32)
        # gamma->0 approaches classic DTW; identical sequences align on the
        # diagonal with zero cost (soft-min makes it slightly negative).
        got = float(soft_dtw(jnp.asarray(x), jnp.asarray(x), gamma=0.01))
        assert got <= 1e-3

    def test_pairwise_shape(self, key):
        import numpy as np

        from streamchat_tpu.ops.clustering import pairwise_soft_dtw, soft_dtw

        rng = np.random.default_rng(2)
        xs = jnp.asarray(rng.normal(size=(3, 5, 2)).astype(np.float32))
        ys = jnp.asarray(rng.normal(size=(4, 6, 2)).astype(np.float32))
        d = pairwise_soft_dtw(xs, ys)
        assert d.shape == (3, 4)
        np.testing.assert_allclose(
            float(d[1, 2]), float(soft_dtw(xs[1], ys[2])), rtol=1e-5
        )


class TestOneShotTreeBuilders:
    """memory/tree one-shot builders (reference utiles.py:346-486)."""

    def _merge(self, combined, k):
        from streamchat_tpu.ops.kmeans import weighted_kmeans_feature

        c, _ = weighted_kmeans_feature(combined, k, jax.random.key(0))
        return c

    def test_bottom_up_single_root(self):
        from streamchat_tpu.memory.tree import VisualMemoryTree

        chunks = [jnp.ones((4, 2, 8)) * i for i in range(9)]
        tree = VisualMemoryTree.build_bottom_up(
            chunks, num_clusters=3, interval=3, merge_fn=self._merge
        )
        assert len(tree.roots) == 1
        root = tree.roots[0]
        assert root.depth == 2 and len(root.children) == 3
        assert all(len(c.children) == 3 for c in root.children)
        # Feature-space search works on the feature-only tree.
        path = tree.search_features(jnp.ones((2, 8)))
        assert path

    def test_bottom_up_with_summaries(self):
        from streamchat_tpu.memory.tree import VisualMemoryTree

        chunks = [jnp.ones((4, 2, 8)) * i for i in range(4)]
        caps = [f"cap{i}" for i in range(4)]
        calls = []

        def summarize(texts):
            calls.append(list(texts))
            return "+".join(texts)

        def embed(texts):
            import numpy as np

            return np.ones((len(texts), 6), np.float32)

        tree = VisualMemoryTree.build_bottom_up(
            chunks, num_clusters=3, interval=2, merge_fn=self._merge,
            captions=caps, summarize_fn=summarize, embed_fn=embed,
        )
        assert len(tree.roots) == 1
        # Level 1 summarizes the CURRENT level's texts (reference bug fixed:
        # it re-sliced the base captions at every level, utiles.py:455).
        assert calls[-1] == ["cap0+cap1", "cap2+cap3"]
        feats, texts = tree.search(jnp.ones((6,)))
        assert feats and texts

    def test_top_down_flat_chunks(self):
        from streamchat_tpu.memory.tree import VisualMemoryTree

        feats = jnp.ones((25, 2, 8))
        tree = VisualMemoryTree.build_top_down(
            feats, chunk_size=10, num_clusters=3, merge_fn=self._merge
        )
        # 3 chunks (10/10/5), each clustered to num_clusters (the reference
        # clusters every chunk unconditionally, utiles.py:359-364).
        assert [r.centroids.shape[0] for r in tree.roots] == [3, 3, 3]
        assert all(r.depth == 0 for r in tree.roots)
