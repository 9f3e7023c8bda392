"""Weighted k-means as a fixed-iteration XLA program.

TPU-native replacement for the reference's hand-rolled GPU k-means
(`utiles.py:291-343`, `weighted_kmeans_feature` / `k_means_clustering`):

* Distances via the ||x||^2 - 2 x.c + ||c||^2 expansion — one [T, K] matmul on
  the MXU instead of materializing the [T, K, P*D] difference tensor the
  reference builds with broadcasting (P*D is ~590k floats for 576x1024-patch
  features, so the reference allocates gigabytes per iteration).
* Lloyd iterations under `lax.scan` with a fixed trip count (the reference also
  caps at 10; data-dependent early exit would force re-tracing).
* Empty-cluster repair ("NaN centroid" repair at utiles.py:309-312) replaces a
  dead centroid with a deterministic pseudo-random data point drawn from the
  PRNG key instead of Python `random.randint`.
* Cluster means via one-hot matmul (segment-sum) — again MXU work, not a
  Python loop over clusters.

Everything is jittable with static (T, K, D) shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _pairwise_sq_dists(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances [T, K] between rows of x [T, D] and c [K, D]."""
    # Compute in f32 regardless of input dtype: the subtraction of large
    # norms is catastrophic in bf16.
    x32 = x.astype(jnp.float32)
    c32 = c.astype(jnp.float32)
    x_sq = jnp.sum(x32 * x32, axis=-1, keepdims=True)            # [T, 1]
    c_sq = jnp.sum(c32 * c32, axis=-1)[None, :]                  # [1, K]
    cross = x32 @ c32.T                                          # [T, K] (MXU)
    return jnp.maximum(x_sq - 2.0 * cross + c_sq, 0.0)


def _kmeans_plus_plus_init(
    x: jnp.ndarray, w: jnp.ndarray, key: jax.Array, k: int
) -> jnp.ndarray:
    """k-means++ seeding (weighted): next centroid ~ w * D^2.

    Upgrade over the reference's random permutation init (utiles.py:293),
    which frequently drops a blob and never recovers within 10 Lloyd steps.
    Sequential over K only (K is 5 in the v0.3 config); each step is one
    [T, K] distance block on the MXU.
    """
    t = x.shape[0]
    keys = jax.random.split(key, k)
    first = jax.random.randint(keys[0], (), 0, t)
    centroids = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def step(i, centroids):
        d = _pairwise_sq_dists(x, centroids)                     # [T, K]
        # Distance to the nearest *chosen* centroid only.
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d = jnp.where(col < i, d, jnp.inf)
        d_min = jnp.min(d, axis=1)
        logits = jnp.log(jnp.maximum(w * d_min, 1e-30))
        nxt = jax.random.categorical(keys[i], logits)
        return centroids.at[i].set(x[nxt])

    return jax.lax.fori_loop(1, k, step, centroids, unroll=False)


@functools.partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def weighted_kmeans(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    key: jax.Array,
    *,
    num_clusters: int,
    num_iters: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted Lloyd's algorithm.

    Args:
      x: [T, D] points.
      weights: [T] nonnegative point weights.
      key: PRNG key for init + empty-cluster repair.
      num_clusters: K.
      num_iters: fixed Lloyd iterations (reference max_iter=10, utiles.py:296).

    Returns:
      (centroids [K, D] float32, labels [T] int32, cluster_weight [K] float32)
    """
    t = x.shape[0]
    k = num_clusters
    x32 = x.astype(jnp.float32)
    w32 = weights.astype(jnp.float32)

    init_key, repair_key = jax.random.split(key)
    centroids0 = _kmeans_plus_plus_init(x32, w32, init_key, k)

    # Pre-draw one repair index per (iteration, cluster): deterministic stand-in
    # for the reference's random.randint fallback when a cluster goes empty.
    repair_idx = jax.random.randint(repair_key, (num_iters, k), 0, t)

    def step(centroids, it):
        d = _pairwise_sq_dists(x32, centroids)                   # [T, K]
        labels = jnp.argmin(d, axis=1)                           # [T]
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)    # [T, K]
        wo = onehot * w32[:, None]
        cluster_w = jnp.sum(wo, axis=0)                          # [K]
        sums = wo.T @ x32                                        # [K, D] (MXU)
        alive = cluster_w > 0.0
        means = sums / jnp.where(alive, cluster_w, 1.0)[:, None]
        repair = x32[repair_idx[it]]                             # [K, D]
        new_centroids = jnp.where(alive[:, None], means, repair)
        return new_centroids, (labels, cluster_w)

    centroids, (labels_hist, cw_hist) = jax.lax.scan(
        step, centroids0, jnp.arange(num_iters)
    )
    return centroids, labels_hist[-1].astype(jnp.int32), cw_hist[-1]


def weighted_kmeans_feature(
    img_feature: jnp.ndarray,
    num_clusters: int,
    key: jax.Array,
    weights: jnp.ndarray | None = None,
    num_iters: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster T frame features [T, P, D] down to [K, P, D].

    Mirrors `weighted_kmeans_feature` (utiles.py:291-330): flattens the patch
    grid, clusters frames, reshapes centroids back. If T <= K the input is
    returned unchanged (reference `T <= T0` early-out).
    """
    t, p, d = img_feature.shape
    if t <= num_clusters:
        labels = jnp.arange(t, dtype=jnp.int32)
        return img_feature, labels
    if weights is None:
        weights = jnp.ones((t,), dtype=jnp.float32)
    flat = img_feature.reshape(t, p * d)
    centroids, labels, _ = weighted_kmeans(
        flat, weights, key, num_clusters=num_clusters, num_iters=num_iters
    )
    return centroids.reshape(num_clusters, p, d).astype(img_feature.dtype), labels
