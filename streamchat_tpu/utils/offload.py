"""Park idle parameter trees in host RAM around HBM-hungry phases.

Motivation (PARITY.md "Known gaps"): the chunk_size=40 batched-captioning
path (`caption_batch=2`, two 23k-token prefills + a partitioned paged pool)
needs ~1 GB more HBM than one 16 GB v5e chip has left once the full
resident set is up — int4/int8 7B decoder, bf16 ViT-L, BERT-large +
MiniLM embedders, plus the ingest executables' permanently reserved
workspaces. During the caption loop the vision tower, projector and both
text embedders are never touched, so a `WeightOffloader` parks exactly
those trees on the host and puts them back before the tree re-embeds its
captions.

The reference never needs this: it holds two full 80 GB GPU replicas
(inference_streaming_longva_v2.py:697-700). On a 16 GB chip it is the
difference between batched captioning fitting or OOMing; on larger chips
(v5p: 95 GB) the offload is a no-op policy choice.

Cost model (scripts/probe_put.py, measured through the axon relay): the
host copy is cached on FIRST offload — serving weights are immutable — so
steady state pays zero D2H and one async `device_put` per restored tree
(~0.2 s/165 MB when the device is idle). Restores are issued while the
device is otherwise quiet (right after the caption loop drains), because
transfers overlapped with in-flight compute serialize badly on the relay.

While offloaded, the attribute holds the HOST (numpy) tree: an accidental
use still computes correctly — jit converts operands — it just rides an
implicit transfer instead of crashing on a sentinel.
"""

from __future__ import annotations

import gc
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax


class WeightOffloader:
    """Round-trips registered `(obj, attr)` param trees HBM <-> host RAM."""

    def __init__(self):
        self._entries: Dict[str, Tuple[object, str]] = {}
        # name -> (host leaves, treedef, shardings) cached at first offload.
        self._host: Dict[str, Tuple[List, object, List]] = {}
        self.offloaded: set = set()
        self.offload_s = 0.0      # cumulative D2H time (first offloads only)
        self.restore_s = 0.0      # cumulative H2D dispatch time

    def register(self, name: str, obj: object, attr: str) -> "WeightOffloader":
        """Track `getattr(obj, attr)` (a pytree of arrays) under `name`."""
        self._entries[name] = (obj, attr)
        return self

    @property
    def names(self) -> List[str]:
        return list(self._entries)

    def host_bytes(self) -> int:
        return sum(
            leaf.nbytes for leaves, _, _ in self._host.values() for leaf in leaves
        )

    def offload(self, names: Optional[Sequence[str]] = None) -> None:
        """Replace device trees with cached host copies; free the HBM."""
        t0 = time.time()
        for name in names if names is not None else list(self._entries):
            if name in self.offloaded:
                continue
            obj, attr = self._entries[name]
            tree = getattr(obj, attr)
            if name not in self._host:
                leaves, treedef = jax.tree_util.tree_flatten(tree)
                shardings = [getattr(l, "sharding", None) for l in leaves]
                self._host[name] = (jax.device_get(leaves), treedef, shardings)
            host_leaves, treedef, _ = self._host[name]
            setattr(obj, attr, jax.tree_util.tree_unflatten(treedef, host_leaves))
            self.offloaded.add(name)
        # Device buffers free when the last Python reference drops; collect
        # now so the HBM is back before the caller's next big allocation.
        gc.collect()
        self.offload_s += time.time() - t0

    def restore(self, names: Optional[Sequence[str]] = None,
                block: bool = False) -> None:
        """Put host copies back on device, preserving original shardings."""
        t0 = time.time()
        put = []
        for name in names if names is not None else list(self._entries):
            if name not in self.offloaded:
                continue
            obj, attr = self._entries[name]
            host_leaves, treedef, shardings = self._host[name]
            dev_leaves = [
                jax.device_put(h) if s is None else jax.device_put(h, s)
                for h, s in zip(host_leaves, shardings)
            ]
            setattr(obj, attr, jax.tree_util.tree_unflatten(treedef, dev_leaves))
            self.offloaded.discard(name)
            put.extend(dev_leaves)
        if block and put:
            jax.block_until_ready(put)
        self.restore_s += time.time() - t0
