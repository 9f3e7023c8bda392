"""Multi-host helpers: process init + benchmark sharding.

The reference fans out across GPUs with shell background jobs
(`inference_streamchat_v0.3.sh:38-56`). On TPU pods the equivalent is one
JAX process per host over DCN: `initialize()` wraps
`jax.distributed.initialize` (no-op single-host), and `host_shard` gives
each process its contiguous slice of the annotation list — combined with
the runner's `--num_chunks/--chunk_idx` this reproduces the reference's
judge sharding contract across hosts.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-process JAX when requested; returns (pid, nprocs).

    With no arguments this is a safe no-op on a single host (TPU pod
    environments auto-discover via the TPU runtime when
    jax.distributed.initialize() is called with no args there).
    """
    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def host_shard(items: Sequence, process_id: Optional[int] = None,
               process_count: Optional[int] = None) -> List:
    """This process's contiguous ceil-split shard of `items`."""
    import math

    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    size = math.ceil(len(items) / n)
    return list(items[pid * size : (pid + 1) * size])
