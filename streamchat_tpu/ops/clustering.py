"""Batched clustering extras: kmeans distance variants, soft-kmeans, kNN.

Covers the reference's vendored clustering libraries (`torch_kmeans/` —
batched KMeans/SoftKMeans/KNN with Lp/dot/cosine distances, `SURVEY.md
§2.3`; imported by utiles.py:7 but unused on the hot path, which uses
ops/kmeans.weighted_kmeans instead). Provided as first-class jittable ops so
framework users migrating from the reference find the same toolbox.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from streamchat_tpu.ops.kmeans import _pairwise_sq_dists
from streamchat_tpu.ops.retrieval import l2_normalize


def pairwise_distances(x: jnp.ndarray, c: jnp.ndarray, metric: str = "euclidean") -> jnp.ndarray:
    """[T, D] x [K, D] -> [T, K] distances (torch_kmeans utils/distances.py)."""
    if metric == "euclidean":
        return jnp.sqrt(_pairwise_sq_dists(x, c))
    if metric == "sq_euclidean":
        return _pairwise_sq_dists(x, c)
    if metric == "dot":
        # Negative inner product: larger similarity -> smaller distance.
        return -(x.astype(jnp.float32) @ c.astype(jnp.float32).T)
    if metric == "cosine":
        return 1.0 - l2_normalize(x) @ l2_normalize(c).T
    raise ValueError(f"unknown metric: {metric}")


@functools.partial(jax.jit, static_argnames=("num_clusters", "num_iters", "metric"))
def kmeans(
    x: jnp.ndarray,
    key: jax.Array,
    *,
    num_clusters: int,
    num_iters: int = 10,
    metric: str = "sq_euclidean",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd's with a selectable metric -> (centroids [K, D], labels [T])."""
    t = x.shape[0]
    x32 = x.astype(jnp.float32)
    init_idx = jax.random.permutation(key, t)[:num_clusters]
    centroids0 = x32[init_idx]

    def step(centroids, _):
        d = pairwise_distances(x32, centroids, metric)
        labels = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(labels, num_clusters, dtype=jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ x32
        means = sums / jnp.where(counts > 0, counts, 1.0)[:, None]
        centroids = jnp.where((counts > 0)[:, None], means, centroids)
        return centroids, labels

    centroids, labels_hist = jax.lax.scan(step, centroids0, None, length=num_iters)
    return centroids, labels_hist[-1].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_clusters", "num_iters", "temperature"))
def soft_kmeans(
    x: jnp.ndarray,
    key: jax.Array,
    *,
    num_clusters: int,
    num_iters: int = 10,
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Soft assignments via softmax(-d^2 / T) (torch_kmeans soft_kmeans.py).

    Returns (centroids [K, D], soft assignment [T, K]).
    """
    t = x.shape[0]
    x32 = x.astype(jnp.float32)
    centroids0 = x32[jax.random.permutation(key, t)[:num_clusters]]

    def step(centroids, _):
        d = _pairwise_sq_dists(x32, centroids)
        w = jax.nn.softmax(-d / temperature, axis=1)          # [T, K]
        denom = jnp.maximum(jnp.sum(w, axis=0), 1e-9)
        centroids = (w.T @ x32) / denom[:, None]
        return centroids, w

    centroids, w_hist = jax.lax.scan(step, centroids0, None, length=num_iters)
    return centroids, w_hist[-1]


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def knn(
    queries: jnp.ndarray, points: jnp.ndarray, k: int, metric: str = "sq_euclidean"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest points per query -> (distances [Q, k], indices [Q, k])."""
    d = pairwise_distances(queries, points, metric)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx


@functools.partial(jax.jit, static_argnames=("gamma",))
def soft_dtw(x: jnp.ndarray, y: jnp.ndarray, gamma: float = 1.0) -> jnp.ndarray:
    """Soft-DTW distance between sequences x [n, d] and y [m, d] -> scalar.

    TPU port of the reference's numba-CUDA soft-DTW
    (`kmeans_pytorch/soft_dtw_cuda.py:36-81`, unused by the pipeline but part
    of its vendored clustering toolbox): R[i,j] = D[i,j] +
    softmin_gamma(R[i-1,j], R[i,j-1], R[i-1,j-1]) with
    softmin_gamma(a,b,c) = -gamma*logsumexp(-[a,b,c]/gamma).

    The 2-D DP runs as a `lax.scan` over anti-diagonals (the same wavefront
    the CUDA kernel parallelizes over threads), carrying the two previous
    diagonals as length-n vectors — no data-dependent Python control flow.
    """
    n, m = x.shape[0], y.shape[0]
    x32 = x.astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    dmat = (
        jnp.sum(x32 * x32, axis=1)[:, None]
        - 2.0 * x32 @ y32.T
        + jnp.sum(y32 * y32, axis=1)[None, :]
    )                                                   # [n, m] sq-euclidean
    inf = jnp.float32(jnp.inf)
    rows = jnp.arange(n)

    def softmin(a, b, c):
        z = -jnp.stack([a, b, c]) / gamma
        zmax = jnp.max(z, axis=0)
        safe = jnp.where(jnp.isinf(zmax), 0.0, zmax)
        s = jnp.sum(jnp.exp(z - safe[None]), axis=0)
        out = -gamma * (jnp.log(s) + safe)
        # All-inf inputs (out-of-range neighborhood) stay +inf.
        return jnp.where(jnp.isinf(zmax), inf, out)

    def diag_step(carry, k):
        r_prev2, r_prev = carry                          # diagonals k-2, k-1
        j = k - rows                                     # column per row i
        valid = (j >= 0) & (j < m)
        d_k = jnp.where(
            valid, dmat[rows, jnp.clip(j, 0, m - 1)], inf
        )
        up = jnp.where(rows > 0, jnp.roll(r_prev, 1), inf)      # R[i-1, j]
        left = r_prev                                           # R[i, j-1]
        diag = jnp.where(rows > 0, jnp.roll(r_prev2, 1), inf)   # R[i-1, j-1]
        base = jnp.where((rows == 0) & (j == 0), 0.0,
                         softmin(up, left, diag))
        r_k = jnp.where(valid, d_k + base, inf)
        return (r_prev, r_k), r_k

    init = (jnp.full((n,), inf), jnp.full((n,), inf))
    (_, last), _ = jax.lax.scan(diag_step, init, jnp.arange(n + m - 1))
    return last[n - 1]


def pairwise_soft_dtw(
    xs: jnp.ndarray, ys: jnp.ndarray, gamma: float = 1.0
) -> jnp.ndarray:
    """All-pairs soft-DTW: xs [A, n, d] x ys [B, m, d] -> [A, B]."""
    per_x = jax.vmap(lambda x, y: soft_dtw(x, y, gamma), in_axes=(None, 0))
    return jax.vmap(lambda x: per_x(x, ys))(xs)
