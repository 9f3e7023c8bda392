"""Memory-feature visualization (PCA scatter).

Parity for the reference's `visualize_memory_feature_with_PCA`
(utiles.py, called from the uni-modal answer path while debugging): project
frame-bank features and the retrieved memory centroids to 2D with PCA and
plot which frames the memory kept. Pure numpy SVD; matplotlib only at save
time.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def pca_project(x: np.ndarray, dims: int = 2) -> np.ndarray:
    """[N, D] -> [N, dims] principal-component projection."""
    x = np.asarray(x, np.float64)
    x = x - x.mean(axis=0, keepdims=True)
    # SVD of the (N, D) matrix; columns of V are principal axes.
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return (x @ vt[:dims].T).astype(np.float32)


def visualize_memory_features(
    feature_bank: Sequence,                 # [T] of [P, D] frame features
    memory_features: Optional[Sequence] = None,   # [K] of [Kc, P, D] centroids
    save_path: str = "memory_pca.png",
) -> np.ndarray:
    """PCA scatter of per-frame descriptors with retrieved memory overlaid.

    Returns the projected frame coordinates; writes a PNG when matplotlib is
    importable (headless-safe no-op otherwise).
    """
    frames = np.stack([np.asarray(f).mean(axis=0).reshape(-1) for f in feature_bank])
    mems = None
    if memory_features:
        mems = np.stack([
            np.asarray(m).reshape(-1, frames.shape[-1]).mean(axis=0)
            for m in memory_features
        ])
        allpts = np.concatenate([frames, mems], axis=0)
    else:
        allpts = frames
    proj = pca_project(allpts)
    frame_xy = proj[: len(frames)]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        # Plotting is optional; the projection is still returned. Real save
        # errors (bad path, disk full) below DO propagate.
        return frame_xy
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.scatter(frame_xy[:, 0], frame_xy[:, 1],
               c=np.arange(len(frames)), cmap="viridis", s=12,
               label="frames (time-colored)")
    if mems is not None:
        mem_xy = proj[len(frames):]
        ax.scatter(mem_xy[:, 0], mem_xy[:, 1], marker="x", c="red",
                   s=60, label="memory centroids")
    ax.legend()
    ax.set_title("memory features (PCA)")
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return frame_xy
