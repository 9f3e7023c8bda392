"""Device-mesh parallelism for StreamChat-TPU.

Replaces the reference's distribution story — two full model replicas pinned
to cuda:0/cuda:1 (`inference_streaming_longva_v2.py:697-700`) plus shell-level
data-parallel eval fan-out (`inference_streamchat_v0.3.sh:38-56`) — with one
SPMD program over a `jax.sharding.Mesh`: tensor parallelism over the `model`
axis for the 7B decoder, data parallelism over the `data` axis for frame
batches and benchmark sharding. XLA inserts the collectives.
"""

from streamchat_tpu.parallel.mesh import best_mesh_shape, make_mesh
from streamchat_tpu.parallel.sharding import (
    decoder_pspecs,
    kv_cache_pspecs,
    projector_pspecs,
    shard_pytree,
    vit_pspecs,
)

__all__ = [
    "best_mesh_shape",
    "make_mesh",
    "decoder_pspecs",
    "kv_cache_pspecs",
    "projector_pspecs",
    "shard_pytree",
    "vit_pspecs",
]
