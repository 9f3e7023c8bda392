"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference vendors a CUDA/NCCL sequence-parallel stack (ring / zigzag /
stripe flash attention with Triton rescale kernels plus Ulysses all-to-all,
`vila/train/sequence_parallel/`, SURVEY.md §2.6) — used when one GPU cannot
hold a full sequence. The TPU-native equivalent is this: shard the sequence
over a mesh axis with `shard_map`, rotate K/V blocks around the ring with
`lax.ppermute` over ICI, and merge per-block partial attention with the
online-softmax (running max + logsumexp) rescaling that the reference
implements as separate Triton kernels (`ring/triton_utils.py`).

Causal masking works on GLOBAL positions: each device owns a contiguous
sequence shard and masks by absolute query/key indices, so the result is
bitwise-equivalent in structure to single-device causal attention.

The per-step block attention dispatches to the Pallas flash kernel on TPU
(`ops.attention.flash_attention_partial` — global-position causal masking
via scalar prefetch, unnormalized (acc, m, l) out so the ring merge below
rescales across devices exactly like the single-kernel online softmax);
CPU meshes and ragged shard lengths keep the plain-XLA block attention,
which also serves as the exactness oracle in tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _use_flash(use_flash: Optional[bool], sq: int, sk: int) -> bool:
    """Resolve the tri-state flash flag: None = auto (TPU backend and
    128-aligned shard lengths, which the Pallas tiles require)."""
    aligned = sq % 128 == 0 and sk % 128 == 0
    if use_flash is None:
        return jax.default_backend() == "tpu" and aligned
    return use_flash and aligned


def _block_attn(
    q: jnp.ndarray,          # [B, H, Sq, D] (local queries)
    k: jnp.ndarray,          # [B, Hkv, Sk, D] (one ring block of keys)
    v: jnp.ndarray,
    q_offset: jnp.ndarray,   # [] global index of this device's first query
    k_offset: jnp.ndarray,   # [] global index of the block's first key
    sm_scale: float,
    causal: bool,
    use_flash: Optional[bool] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Partial attention vs one KV block: (acc [B,H,Sq,D] f32, m, l)."""
    if _use_flash(use_flash, q.shape[2], k.shape[2]):
        from streamchat_tpu.ops.attention import flash_attention_partial

        return flash_attention_partial(
            q, k, v, q_offset, k_offset,
            causal=causal, sm_scale=sm_scale,
            interpret=interpret, neg_inf=NEG_INF,
        )
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    if hq != hkv:
        k = jnp.repeat(k, hq // hkv, axis=1)
        v = jnp.repeat(v, hq // hkv, axis=1)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * sm_scale
    if causal:
        rows = q_offset + jax.lax.broadcasted_iota(jnp.int32, (sq, k.shape[2]), 0)
        cols = k_offset + jax.lax.broadcasted_iota(jnp.int32, (sq, k.shape[2]), 1)
        s = jnp.where((cols <= rows)[None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1)                                   # [B,H,Sq]
    p = jnp.exp(s - m[..., None])
    # Fully-masked rows: exp(NEG_INF - NEG_INF) = 1 would poison l; zero them.
    p = jnp.where((m > NEG_INF / 2)[..., None], p, 0.0)
    l = jnp.sum(p, axis=-1)                                   # [B,H,Sq]
    acc = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return acc, m, l


def _ring_body(axis_name: str, causal: bool, sm_scale: float,
               q, k, v, q_offset, shard_len,
               use_flash: Optional[bool] = None, interpret: bool = False):
    """shard_map body: everything is a per-device block here."""
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step_fn(carry, _):
        k_blk, v_blk, k_idx, acc, m, l = carry
        k_off = k_idx * shard_len
        a, bm, bl = _block_attn(q, k_blk, v_blk, q_offset, k_off, sm_scale,
                                causal, use_flash, interpret)
        new_m = jnp.maximum(m, bm)
        # NEG_INF is finite, so these rescales are well-defined even for
        # rows that have seen no unmasked key yet (the reference does this
        # rescale in dedicated Triton kernels, ring/triton_utils.py).
        alpha = jnp.exp(m - new_m)
        beta = jnp.exp(bm - new_m)
        acc = acc * alpha[..., None] + a * beta[..., None]
        l = l * alpha + bl * beta
        # Rotate: receive the previous device's block (ppermute over ICI).
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        k_idx = jax.lax.ppermute(k_idx, axis_name, perm)
        return (k_blk, v_blk, k_idx, acc, new_m, l), None

    b, h, sq, d = q.shape
    # Derive the fresh accumulators from q so they inherit ALL of q's
    # device-varying axes (ring alone, or ring x ulysses under USP) — the
    # scan carry type must match the varying outputs under shard_map's
    # per-axis type system.
    acc0 = (q * 0).astype(jnp.float32)
    m0 = (q[..., 0] * 0).astype(jnp.float32) + NEG_INF
    l0 = (q[..., 0] * 0).astype(jnp.float32)
    carry = (k, v, my_idx, acc0, m0, l0)
    carry, _ = jax.lax.scan(step_fn, carry, None, length=n_dev)
    _, _, _, acc, m, l = carry
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (acc / l_safe[..., None]).astype(q.dtype)


def ring_attention(
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
    """Exact attention with the sequence sharded over `axis_name`.

    q [B, H, S, D], k/v [B, Hkv, S, D] with S divisible by the axis size.
    Each device holds S/n contiguous tokens; K/V travel the ring once.

    use_flash: None = auto (Pallas kernel per ring step on TPU, XLA on CPU);
    interpret runs the kernel in interpreter mode (CPU numerics tests).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis_name]
    s = q.shape[2]
    if s % n:
        raise ValueError(f"sequence {s} not divisible by {axis_name}={n}")
    shard_len = s // n

    seq_spec = P(None, None, axis_name, None)

    def body(q_l, k_l, v_l):
        my_idx = jax.lax.axis_index(axis_name)
        q_offset = my_idx * shard_len
        return _ring_body(axis_name, causal, sm_scale, q_l, k_l, v_l,
                          q_offset, shard_len, use_flash, interpret)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec),
        out_specs=seq_spec,
        # Pallas's interpret-mode jaxpr evaluator trips shard_map's per-axis
        # type checks on kernel-internal constants (JAX's own message says
        # to pass check_vma=False); the compiled TPU path keeps full checks.
        check_vma=not interpret,
    )
    return fn(q, k, v)
