"""Mesh construction over a TPU slice.

Axes:
  data  — data parallelism: frame batches during ingest, annotation shards
          during benchmark eval (replaces the reference's per-GPU process
          fan-out in `inference_streamchat_v0.3.sh:38-56`).
  model — tensor parallelism: attention heads / FFN columns of the decoder
          and vision tower (replaces the reference's need for two 80 GB GPUs,
          `README.md:31`).

`jax.make_mesh` orders devices so the innermost (model) axis rides ICI
neighbors; collectives from TP (psum after o/down projections) stay on the
fastest links.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def best_mesh_shape(
    n_devices: int, max_model: int = 8, kv_heads: int = 4
) -> Tuple[int, int]:
    """Pick (dp, tp) for `n_devices`.

    TP is capped by the decoder's KV-head count (Qwen2-7B has 4 KV heads;
    sharding beyond that would replicate KV compute) and by `max_model`;
    remaining devices become the data axis.
    """
    tp = 1
    limit = min(max_model, kv_heads)
    while tp * 2 <= limit and n_devices % (tp * 2) == 0:
        tp *= 2
    return n_devices // tp, tp


def make_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a (data, model) mesh. With no arguments, uses every visible
    device with the `best_mesh_shape` split."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = best_mesh_shape(n)
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"mesh {dp}x{tp} != {n} devices")
    import numpy as np

    return Mesh(np.asarray(devices).reshape(dp, tp), axis_names)
