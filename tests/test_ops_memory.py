"""Unit tests for memory-formation ops: k-means, forgetting curve, pooling,
dedup, retrieval. TPU port of the reference's synthetic-tensor harnesses
(utiles.py test_2/test_3, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.ops import (
    compress_spatial_features,
    cosine_topk,
    forgetting_probabilities,
    frame_descriptors,
    maxsim_score,
    pool_patch_grid,
    sample_token,
    sample_without_replacement,
    select_changed_frames,
    select_short_memory,
    weighted_kmeans,
    weighted_kmeans_feature,
)


class TestKMeans:
    def test_recovers_separated_clusters(self, key):
        k1, k2 = jax.random.split(key)
        # 3 well-separated blobs
        centers = jnp.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 5.0]])
        pts = jnp.repeat(centers, 20, axis=0) + 0.1 * jax.random.normal(k1, (60, 2))
        w = jnp.ones((60,))
        centroids, labels, cw = weighted_kmeans(pts, w, k2, num_clusters=3)
        # Every found centroid is within 0.5 of a true center
        d = jnp.linalg.norm(centroids[:, None] - centers[None], axis=-1)
        assert float(jnp.max(jnp.min(d, axis=1))) < 0.5
        # Cluster weights sum to T
        assert float(jnp.sum(cw)) == pytest.approx(60.0)
        assert labels.shape == (60,)

    def test_weights_shift_centroid(self, key):
        k2 = jax.random.fold_in(key, 1)
        pts = jnp.array([[0.0, 0.0], [1.0, 0.0], [100.0, 0.0], [101.0, 0.0]])
        w = jnp.array([1.0, 100.0, 1.0, 1.0])
        centroids, _, _ = weighted_kmeans(pts, w, k2, num_clusters=2)
        left = centroids[jnp.argmin(centroids[:, 0])]
        # Heavily weighted point (1,0) dominates the left centroid
        assert abs(float(left[0]) - 1.0) < 0.05

    def test_feature_wrapper_shapes(self, key):
        feats = jax.random.normal(key, (17, 16, 32))
        out, labels = weighted_kmeans_feature(feats, 5, key)
        assert out.shape == (5, 16, 32)
        assert labels.shape == (17,)

    def test_feature_wrapper_small_t_passthrough(self, key):
        feats = jax.random.normal(key, (3, 16, 32))
        out, _ = weighted_kmeans_feature(feats, 5, key)
        assert out.shape == (3, 16, 32)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))

    def test_empty_cluster_repair(self, key):
        # K > distinct points forces empty clusters; must not produce NaN.
        pts = jnp.zeros((8, 4)).at[0].set(1.0)
        centroids, _, _ = weighted_kmeans(pts, jnp.ones((8,)), key, num_clusters=4)
        assert not bool(jnp.any(jnp.isnan(centroids)))


class TestForgetting:
    def test_curve_matches_reference_formula(self):
        # exp(-t/tau) normalized (utiles.py:251-255)
        probs = np.asarray(forgetting_probabilities(20, tau=5.0))
        t = np.arange(20)
        expected = np.exp(-t / 5.0)
        expected /= expected.sum()
        np.testing.assert_allclose(probs, expected, rtol=1e-6)

    def test_sample_without_replacement_distinct(self, key):
        probs = forgetting_probabilities(20, tau=5.0)
        idx = np.asarray(sample_without_replacement(key, probs, 5))
        assert len(set(idx.tolist())) == 5
        assert idx.min() >= 0 and idx.max() < 20

    def test_sampling_distribution_biased_to_recent(self, key):
        # Position 0 (highest prob) should be selected far more often than 19.
        probs = forgetting_probabilities(20, tau=5.0)
        counts = np.zeros(20)
        for i in range(200):
            k = jax.random.fold_in(key, i)
            idx = np.asarray(sample_without_replacement(k, probs, 5))
            counts[idx] += 1
        assert counts[0] > counts[19] * 2

    def test_select_short_memory(self, key):
        feats = jnp.arange(20.0)[:, None, None] * jnp.ones((20, 4, 8))
        out = select_short_memory(key, feats, 5, tau=5.0)
        assert out.shape == (5, 4, 8)
        # temporal order preserved
        firsts = np.asarray(out[:, 0, 0])
        assert list(firsts) == sorted(firsts)


class TestPooling:
    def test_identity_rate_1(self, key):
        x = jax.random.normal(key, (3, 576, 8))
        np.testing.assert_array_equal(
            np.asarray(pool_patch_grid(x, 1)), np.asarray(x)
        )

    def test_average_pool_matches_manual(self, key):
        x = jax.random.normal(key, (2, 16, 4))  # 4x4 grid
        out = compress_spatial_features(x, 2)
        assert out.shape == (2, 4, 4)
        grid = np.asarray(x).reshape(2, 4, 4, 4)
        manual = grid.reshape(2, 2, 2, 2, 2, 4).mean(axis=(2, 4)).reshape(2, 4, 4)
        np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-6)

    def test_nonsquare_raises(self, key):
        with pytest.raises(ValueError):
            pool_patch_grid(jax.random.normal(key, (1, 10, 4)), 2)


class TestDedup:
    def test_keeps_scene_changes_only(self):
        # Frames: AAAABBBB -> keep frame 0 and frame 4
        a = jnp.ones((128,))
        b = jnp.concatenate([jnp.ones((64,)) * -1, jnp.ones((64,))])
        feats = jnp.stack([a, a, a, a, b, b, b, b])
        keep = np.asarray(select_changed_frames(feats, threshold=0.2, interpret=True))
        assert keep[0] and keep[4]
        assert not keep[1] and not keep[5]

    def test_descriptor_pooling(self, key):
        x = jax.random.normal(key, (4, 9, 16))
        d = frame_descriptors(x)
        assert d.shape == (4, 16)
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(x).mean(1), rtol=1e-5
        )


class TestRetrieval:
    def test_cosine_topk_finds_identical(self, key):
        cands = jax.random.normal(key, (10, 32))
        q = cands[7:8] * 3.0  # scaled copy: cosine == 1
        scores, idx = cosine_topk(q, cands, 3)
        assert int(idx[0, 0]) == 7
        assert float(scores[0, 0]) == pytest.approx(1.0, abs=1e-5)

    def test_maxsim_prefers_matching_doc(self, key):
        k1, k2 = jax.random.split(key)
        q = jax.random.normal(k1, (4, 16))
        other = jax.random.normal(k2, (3, 8, 16))
        match = other.at[1, :4].set(q)  # doc 1 contains the query tokens
        scores = maxsim_score(q, match)
        assert int(jnp.argmax(scores)) == 1


class TestSampling:
    def test_greedy(self):
        logits = jnp.array([[0.1, 5.0, 0.2], [3.0, 0.0, 0.1]])
        tok = sample_token(logits, jax.random.key(0), temperature=0.0)
        assert tok.tolist() == [1, 0]

    def test_temperature_respects_distribution(self, key):
        logits = jnp.array([[10.0, 0.0, 0.0, 0.0]])
        counts = {}
        for i in range(50):
            t = int(sample_token(logits, jax.random.fold_in(key, i), temperature=0.5)[0])
            counts[t] = counts.get(t, 0) + 1
        assert counts.get(0, 0) >= 48  # overwhelming mass on token 0

    def test_top_p_masks_tail(self, key):
        logits = jnp.array([[5.0, 4.9, -10.0, -10.0]])
        for i in range(20):
            t = int(
                sample_token(
                    logits, jax.random.fold_in(key, i), temperature=1.0, top_p=0.9
                )[0]
            )
            assert t in (0, 1)


def test_forgetting_sampler_distribution(key):
    """Empirical inclusion frequency tracks the Ebbinghaus weights (the
    seeded-mode distributional equivalence SURVEY.md §7(e) calls for —
    np.random.choice(replace=False) and Gumbel-top-k share marginals only
    approximately, so we check ordering + correlation, not exact equality)."""
    import numpy as np

    from streamchat_tpu.ops.forgetting import (
        forgetting_probabilities,
        sample_without_replacement,
    )

    w, r, tau = 12, 4, 5.0
    probs = forgetting_probabilities(w, tau)
    counts = np.zeros(w)
    trials = 400
    keys = jax.random.split(key, trials)
    for k in keys:
        idx = np.asarray(sample_without_replacement(k, probs, r))
        assert len(set(idx.tolist())) == r          # without replacement
        counts[idx] += 1
    freq = counts / trials
    p = np.asarray(probs)
    # Oldest (highest-retention) position sampled most; newest least.
    assert freq[0] == freq.max()
    assert freq[0] > freq[-1] * 1.5
    # Monotone trend matches the weight ordering (rank correlation > 0.9).
    rank_corr = np.corrcoef(np.argsort(np.argsort(freq)),
                            np.argsort(np.argsort(p)))[0, 1]
    assert rank_corr > 0.9
