"""Ulysses sequence parallelism: all-to-all head-scatter attention.

The second SP flavor the reference vendors (`UlyssesAttention`,
vila/train/sequence_parallel/ulysses_attn.py:97, with SeqAllToAll4D over
NCCL): inputs arrive sequence-sharded [B, H, S/n, D]; an all-to-all
re-shards them head-wise [B, H/n, S, D] so each device runs ordinary FULL
attention over its head slice; a second all-to-all restores sequence
sharding. Exact, two collectives, no online-softmax bookkeeping — the
trade-off vs ring attention is memory (full S per device) against ring's
n-step pipeline.

TPU-native: `shard_map` + `jax.lax.all_to_all` over ICI. `usp_attention`
below nests ring attention inside the ulysses head scatter — the
reference's USP hybrid (hybrid_attn.py:60-282) with sp = ring x ulysses.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from streamchat_tpu.ops.attention import _attention_reference


def _local_attention(q, k, v, sm_scale, causal,
                     use_flash=None, interpret=False):
    from streamchat_tpu.ops.ring_attention import _use_flash

    if _use_flash(use_flash, q.shape[2], k.shape[2]):
        from streamchat_tpu.ops.attention import flash_attention

        return flash_attention(q, k, v, causal=causal, sm_scale=sm_scale,
                               interpret=interpret)
    return _attention_reference(q, k, v, causal=causal, sm_scale=sm_scale)


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "model",
    *,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact attention with sequence sharded over `axis_name`.

    q [B, H, S, D], k/v [B, Hkv, S, D]; S and H (and Hkv) must be divisible
    by the axis size. Each device exchanges its sequence shard for a head
    shard, attends over the full sequence, and exchanges back.

    use_flash: None = auto (Pallas flash per head slice on TPU, XLA on CPU).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis_name]
    b, h, s, d = q.shape
    hkv = k.shape[1]
    if s % n or h % n or hkv % n:
        raise ValueError(
            f"S={s}, H={h}, Hkv={hkv} must each be divisible by axis "
            f"{axis_name}={n}"
        )

    seq_spec = P(None, None, axis_name, None)

    def body(q_l, k_l, v_l):
        # [B, H, S/n, D] -> all-to-all -> [B, H/n, S, D]: scatter heads
        # (axis 1), gather sequence (axis 2).
        def scatter(x):
            return jax.lax.all_to_all(
                x, axis_name, split_axis=1, concat_axis=2, tiled=True
            )

        def gather(x):
            return jax.lax.all_to_all(
                x, axis_name, split_axis=2, concat_axis=1, tiled=True
            )

        o = _local_attention(
            scatter(q_l), scatter(k_l), scatter(v_l), sm_scale, causal,
            use_flash, interpret,
        )
        return gather(o)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec),
        out_specs=seq_spec,
        check_vma=not interpret,
    )
    return fn(q, k, v)


def usp_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    ulysses_axis: str = "model",
    ring_axis: str = "data",
    *,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """USP hybrid: ring attention nested inside Ulysses (sp = ring x ulysses).

    Rebuild of the reference's `HybridAttention`
    (vila/train/sequence_parallel/hybrid_attn.py:60-282; degrees configured
    as sp_degree = ring_size x ulysses_size, globals.py:40-130). The global
    sequence is sharded over BOTH axes — primarily into ring blocks, each
    ring block sub-sharded over the ulysses axis. The body first all-to-alls
    heads<->sequence over the ulysses axis (each device then holds its full
    ring block for H/nu heads), then runs the ppermute ring over the ring
    axis with global causal offsets.
    """
    from streamchat_tpu.ops.ring_attention import _ring_body

    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    nu = mesh.shape[ulysses_axis]
    nr = mesh.shape[ring_axis]
    b, h, s, d = q.shape
    hkv = k.shape[1]
    if s % (nu * nr) or h % nu or hkv % nu:
        raise ValueError(
            f"S={s} must be divisible by ring*ulysses={nr * nu}; H={h}, "
            f"Hkv={hkv} by ulysses={nu}"
        )
    ring_block = s // nr

    # Sequence sharded ring-major then ulysses-minor: (ring, ulysses) both
    # partition axis 2.
    seq_spec = P(None, None, (ring_axis, ulysses_axis), None)

    def body(q_l, k_l, v_l):
        def scatter(x):   # heads <-> sequence within the ring block
            return jax.lax.all_to_all(
                x, ulysses_axis, split_axis=1, concat_axis=2, tiled=True
            )

        def gather(x):
            return jax.lax.all_to_all(
                x, ulysses_axis, split_axis=2, concat_axis=1, tiled=True
            )

        qs, ks, vs = scatter(q_l), scatter(k_l), scatter(v_l)
        my_ring = jax.lax.axis_index(ring_axis)
        q_offset = my_ring * ring_block
        o = _ring_body(
            ring_axis, causal, sm_scale, qs, ks, vs, q_offset, ring_block,
            use_flash, interpret,
        )
        return gather(o)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec),
        out_specs=seq_spec,
        check_vma=not interpret,
    )
    return fn(q, k, v)
