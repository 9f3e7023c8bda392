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
    kv_length: Optional[jnp.ndarray] = None,  # [B] valid GLOBAL tokens
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Partial attention vs one KV block: (acc [B,H,Sq,D] f32, m, l)."""
    sk = k.shape[2]
    if _use_flash(use_flash, q.shape[2], sk):
        from streamchat_tpu.ops.attention import flash_attention_partial

        block_len = None
        if kv_length is not None:
            # The kernel masks LOCAL columns; valid globals are < kv_length,
            # so this block's effective length is kv_length - k_offset.
            block_len = jnp.clip(kv_length - k_offset, 0, sk).astype(jnp.int32)
        return flash_attention_partial(
            q, k, v, q_offset, k_offset, block_len,
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
    if kv_length is not None:
        cols = k_offset + jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, sk), 3)
        s = jnp.where(cols < kv_length[:, None, None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1)                                   # [B,H,Sq]
    p = jnp.exp(s - m[..., None])
    # Fully-masked rows: exp(NEG_INF - NEG_INF) = 1 would poison l; zero them.
    p = jnp.where((m > NEG_INF / 2)[..., None], p, 0.0)
    l = jnp.sum(p, axis=-1)                                   # [B,H,Sq]
    acc = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return acc, m, l


def _ring_body(axis_name: str, causal: bool, sm_scale: float,
               q, k, v, q_offset, shard_len,
               use_flash: Optional[bool] = None, interpret: bool = False,
               kv_length: Optional[jnp.ndarray] = None):
    """shard_map body: everything is a per-device block here."""
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step_fn(carry, _):
        k_blk, v_blk, k_idx, acc, m, l = carry
        k_off = k_idx * shard_len
        # Issue the rotation BEFORE the block compute: the next block's ICI
        # transfer then overlaps this block's attention (XLA latency-hiding
        # scheduler splits the collective into start/done around independent
        # work) — the effect the reference gets from explicit async p2p
        # (ring/utils.py batch_isend_irecv).
        nk = jax.lax.ppermute(k_blk, axis_name, perm)
        nv = jax.lax.ppermute(v_blk, axis_name, perm)
        nidx = jax.lax.ppermute(k_idx, axis_name, perm)
        a, bm, bl = _block_attn(q, k_blk, v_blk, q_offset, k_off, sm_scale,
                                causal, use_flash, interpret, kv_length)
        new_m = jnp.maximum(m, bm)
        # NEG_INF is finite, so these rescales are well-defined even for
        # rows that have seen no unmasked key yet (the reference does this
        # rescale in dedicated Triton kernels, ring/triton_utils.py).
        alpha = jnp.exp(m - new_m)
        beta = jnp.exp(bm - new_m)
        acc = acc * alpha[..., None] + a * beta[..., None]
        l = l * alpha + bl * beta
        return (nk, nv, nidx, acc, new_m, l), None

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
    kv_length: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Exact attention with the sequence sharded over `axis_name`.

    q [B, H, S, D], k/v [B, Hkv, S, D] with S divisible by the axis size.
    Each device holds S/n contiguous tokens; K/V travel the ring once.

    use_flash: None = auto (Pallas kernel per ring step on TPU, XLA on CPU);
    interpret runs the kernel in interpreter mode (CPU numerics tests).
    kv_length ([B] int32) masks each row's keys past its true length — the
    ring-varlen variant (reference ring_flash_attn_varlen_*); rows pad to
    the common S, padded-key columns never contribute, and outputs at
    padded query rows are garbage the caller slices away, matching the
    reference's unpad semantics.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis_name]
    s = q.shape[2]
    if s % n:
        raise ValueError(f"sequence {s} not divisible by {axis_name}={n}")
    shard_len = s // n

    seq_spec = P(None, None, axis_name, None)
    if kv_length is None:
        kv_length = jnp.full((q.shape[0],), s, jnp.int32)

    def body(q_l, k_l, v_l, len_l):
        my_idx = jax.lax.axis_index(axis_name)
        q_offset = my_idx * shard_len
        return _ring_body(axis_name, causal, sm_scale, q_l, k_l, v_l,
                          q_offset, shard_len, use_flash, interpret,
                          kv_length=len_l)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P(None)),
        out_specs=seq_spec,
        # Pallas's interpret-mode jaxpr evaluator trips shard_map's per-axis
        # type checks on kernel-internal constants (JAX's own message says
        # to pass check_vma=False); the compiled TPU path keeps full checks.
        check_vma=not interpret,
    )
    return fn(q, k, v, kv_length.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Zigzag ring attention (load-balanced causal ring)
# ---------------------------------------------------------------------------


def zigzag_indices(s: int, n: int) -> jnp.ndarray:
    """Global permutation for zigzag sharding: device i holds chunks
    (i, 2n-1-i) of 2n equal chunks. Plain causal ring leaves device i with
    only i+1 live steps of n (a 2x tail imbalance); pairing the i-th-lowest
    with the i-th-highest chunk equalizes masked work across devices — the
    reference's zigzag variant (vila/train/sequence_parallel/ring/, vendored
    CUDA; SURVEY.md §2.6) rebuilt on the ppermute ring."""
    c = s // (2 * n)
    order = []
    for i in range(n):
        order.extend(range(i * c, (i + 1) * c))
        order.extend(range((2 * n - 1 - i) * c, (2 * n - i) * c))
    return jnp.asarray(order, jnp.int32)


def _inverse_permutation(idx: jnp.ndarray) -> jnp.ndarray:
    inv = jnp.zeros_like(idx)
    return inv.at[idx].set(jnp.arange(idx.shape[0], dtype=idx.dtype))


def _zigzag_body(axis_name: str, causal: bool, sm_scale: float,
                 q, k, v, chunk_len, n_dev,
                 use_flash: Optional[bool], interpret: bool):
    """shard_map body. Local q/k/v hold TWO global chunks: (i, 2n-1-i)."""
    my_idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    my_offs = jnp.stack([my_idx * chunk_len,
                         (2 * n_dev - 1 - my_idx) * chunk_len])

    def halves(x):
        return x[:, :, :chunk_len], x[:, :, chunk_len:]

    q0, q1 = halves(q)

    def step_fn(carry, _):
        k_blk, v_blk, k_offs, accs, ms, ls = carry
        # Rotation first: next block's ICI transfer overlaps this compute.
        nk = jax.lax.ppermute(k_blk, axis_name, perm)
        nv = jax.lax.ppermute(v_blk, axis_name, perm)
        noffs = jax.lax.ppermute(k_offs, axis_name, perm)
        k0, k1 = halves(k_blk)
        v0, v1 = halves(v_blk)
        new_accs, new_ms, new_ls = [], [], []
        for qi, (q_half, q_off) in enumerate([(q0, my_offs[0]), (q1, my_offs[1])]):
            acc, m, l = accs[qi], ms[qi], ls[qi]
            for k_half, v_half, k_off in ((k0, v0, k_offs[0]), (k1, v1, k_offs[1])):
                a, bm, bl = _block_attn(q_half, k_half, v_half, q_off, k_off,
                                        sm_scale, causal, use_flash, interpret)
                new_m = jnp.maximum(m, bm)
                alpha = jnp.exp(m - new_m)
                beta = jnp.exp(bm - new_m)
                acc = acc * alpha[..., None] + a * beta[..., None]
                l = l * alpha + bl * beta
                m = new_m
            new_accs.append(acc)
            new_ms.append(m)
            new_ls.append(l)
        return (nk, nv, noffs, tuple(new_accs), tuple(new_ms),
                tuple(new_ls)), None

    def zero_state(q_half):
        acc0 = (q_half * 0).astype(jnp.float32)
        m0 = (q_half[..., 0] * 0).astype(jnp.float32) + NEG_INF
        l0 = (q_half[..., 0] * 0).astype(jnp.float32)
        return acc0, m0, l0

    a0, m0, l0 = zero_state(q0)
    a1, m1, l1 = zero_state(q1)
    carry = (k, v, my_offs, (a0, a1), (m0, m1), (l0, l1))
    carry, _ = jax.lax.scan(step_fn, carry, None, length=n_dev)
    _, _, _, accs, ms, ls = carry
    outs = []
    for acc, l in zip(accs, ls):
        l_safe = jnp.where(l == 0.0, 1.0, l)
        outs.append((acc / l_safe[..., None]).astype(q.dtype))
    return jnp.concatenate(outs, axis=2)


def zigzag_ring_attention(
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
    """Exact attention, zigzag-balanced over `axis_name`.

    Same contract as `ring_attention` (inputs/outputs in natural global
    order; S divisible by 2*axis size); internally the sequence is
    re-sharded so every device carries one low and one high chunk, making
    causal masking skip the same amount of work on every device.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis_name]
    s = q.shape[2]
    if s % (2 * n):
        raise ValueError(f"sequence {s} not divisible by 2*{axis_name}={2*n}")
    chunk_len = s // (2 * n)

    idx = zigzag_indices(s, n)
    inv = _inverse_permutation(idx)
    qz = jnp.take(q, idx, axis=2)
    kz = jnp.take(k, idx, axis=2)
    vz = jnp.take(v, idx, axis=2)

    seq_spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(_zigzag_body, axis_name, causal, sm_scale,
                          chunk_len=chunk_len, n_dev=n,
                          use_flash=use_flash, interpret=interpret),
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec),
        out_specs=seq_spec,
        check_vma=not interpret,
    )
    out = fn(qz, kz, vz)
    return jnp.take(out, inv, axis=2)


# ---------------------------------------------------------------------------
# Stripe ring attention (token-interleaved balanced causal ring)
# ---------------------------------------------------------------------------


def stripe_indices(s: int, n: int) -> jnp.ndarray:
    """Global permutation for stripe sharding: device i holds tokens
    i, i+n, i+2n, ... (the reference's stripe variant,
    vila/train/sequence_parallel/ring/ring_flash_attn.py stripe_*;
    SURVEY.md §2.6). Causal masking between any device pair collapses to a
    plain local triangle with a 0/1 diagonal shift, so every ring step does
    identical work — no 2-chunk bookkeeping like zigzag."""
    c = s // n
    order = []
    for i in range(n):
        order.extend(range(i, s, n))
    assert len(order) == n * c
    return jnp.asarray(order, jnp.int32)


def _stripe_body(axis_name: str, causal: bool, sm_scale: float,
                 q, k, v, n_dev,
                 use_flash: Optional[bool], interpret: bool):
    """shard_map body. Local token t is global my_idx + t*n_dev, so a KV
    block from origin j masks as: s <= t (j <= my_idx) or s <= t-1 (j >
    my_idx) — expressed through _block_attn's global offsets as
    (q_offset=0, k_offset=shift)."""
    my_idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step_fn(carry, _):
        k_blk, v_blk, k_origin, acc, m, l = carry
        # Rotation first: next block's ICI transfer overlaps this compute.
        nk = jax.lax.ppermute(k_blk, axis_name, perm)
        nv = jax.lax.ppermute(v_blk, axis_name, perm)
        norigin = jax.lax.ppermute(k_origin, axis_name, perm)
        shift = (k_origin > my_idx).astype(jnp.int32)
        a, bm, bl = _block_attn(q, k_blk, v_blk, jnp.asarray(0), shift,
                                sm_scale, causal, use_flash, interpret)
        new_m = jnp.maximum(m, bm)
        alpha = jnp.exp(m - new_m)
        beta = jnp.exp(bm - new_m)
        acc = acc * alpha[..., None] + a * beta[..., None]
        l = l * alpha + bl * beta
        return (nk, nv, norigin, acc, new_m, l), None

    acc0 = (q * 0).astype(jnp.float32)
    m0 = (q[..., 0] * 0).astype(jnp.float32) + NEG_INF
    l0 = (q[..., 0] * 0).astype(jnp.float32)
    carry = (k, v, my_idx, acc0, m0, l0)
    carry, _ = jax.lax.scan(step_fn, carry, None, length=n_dev)
    _, _, _, acc, m, l = carry
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (acc / l_safe[..., None]).astype(q.dtype)


def stripe_ring_attention(
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
    """Exact attention, stripe-balanced over `axis_name`.

    Same contract as `ring_attention` (natural-order inputs/outputs; S
    divisible by the axis size). Internally tokens interleave round-robin
    across devices so causal work is identical per device and per step.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis_name]
    s = q.shape[2]
    if s % n:
        raise ValueError(f"sequence {s} not divisible by {axis_name}={n}")

    idx = stripe_indices(s, n)
    inv = _inverse_permutation(idx)
    qz = jnp.take(q, idx, axis=2)
    kz = jnp.take(k, idx, axis=2)
    vz = jnp.take(v, idx, axis=2)

    seq_spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(_stripe_body, axis_name, causal, sm_scale,
                          n_dev=n, use_flash=use_flash, interpret=interpret),
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec),
        out_specs=seq_spec,
        check_vma=not interpret,
    )
    out = fn(qz, kz, vz)
    return jnp.take(out, inv, axis=2)
