"""Attention kernels.

The reference relies on flash-attention-2 CUDA binaries
(`longva/model/builder.py:27`, attn_implementation="flash_attention_2") and —
critically — disables the KV cache on every generate call
(`inference_streaming_longva_v2.py:150,257`), making decode O(L^2). Here:

* `flash_attention` — a Pallas TPU kernel (online-softmax, tiled over KV) used
  for prefill. Never materializes the [S, S] score matrix; accumulators live
  in VMEM scratch in f32 while Q/K/V stream through in bf16.
* `decode_attention` — single-token attention against a contiguous KV cache.
  One [H, L] matvec per step: bandwidth-bound, XLA lowers it optimally, so no
  hand kernel is needed (a paged Pallas variant can slot in behind the same
  signature when batch decode arrives).

GQA is handled inside the kernel's BlockSpec index maps (query head h reads
kv head h // q_per_kv) so K/V are never repeated in HBM.

Layouts: q [B, H, S, D], k/v [B, Hkv, S, D].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# -0.7 * f32 max instead of -inf: exp(-inf - -inf) would be NaN in the
# online-softmax correction.
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool,
    sm_scale: float,
    kv_length: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """XLA attention used on CPU and as the numerics oracle in tests."""
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    if hq != hkv:
        k = jnp.repeat(k, hq // hkv, axis=1)
        v = jnp.repeat(v, hq // hkv, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s *= sm_scale
    sk = k.shape[2]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        s = jnp.where((col <= row)[None, None], s, DEFAULT_MASK_VALUE)
    if kv_length is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, sk), 3)
        s = jnp.where(col < kv_length[:, None, None, None], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _flash_kernel(
    length_ref,            # [B] int32, scalar prefetch
    q_ref,                 # [1, 1, bq, d]
    k_ref,                 # [1, 1, bk, d]
    v_ref,                 # [1, 1, bk, d]
    o_ref,                 # [1, 1, bq, d]
    m_scratch,             # [bq, 128] f32
    l_scratch,             # [bq, 128] f32
    acc_scratch,           # [bq, d]  f32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    ragged_k: bool,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    kj = pl.program_id(3)

    @pl.when(kj == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_len = length_ref[b]

    # Skip KV tiles fully above the causal diagonal and fully past kv_len.
    diag_ok = ((qi + 1) * block_q - 1) >= (kj * block_k) if causal else True
    live = jnp.logical_and(diag_ok, kj * block_k < kv_len)
    # Interior tiles (see _flash_partial_kernel): no per-element masking —
    # the iota/compare/select VPU passes between the two MXU dots were the
    # bulk of the kernel's ~43% roofline gap on long prefills.
    fully_live = (kj + 1) * block_k <= kv_len
    if causal:
        interior = jnp.logical_and(
            fully_live, qi * block_q >= (kj + 1) * block_k - 1
        )
    else:
        interior = fully_live

    def _tile(masked: bool):
        # Keep Q/K in their storage dtype for the dot (bf16 runs the MXU at
        # full rate; upcasting to f32 first quarters it) and accumulate f32.
        q = q_ref[0, 0]                                         # [bq, d]
        k = k_ref[0, 0]                                         # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                       # [bq, bk]
        # sm_scale is FOLDED into the reduce (tiny) and the exp expression
        # (mul+sub+exp fuse into one elementwise pass) instead of a
        # standalone `s *= scale` pass over the [bq, bk] f32 tile — the VPU
        # passes between the two MXU dots are this kernel's roofline gap.

        if masked:
            row = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                   + qi * block_q)
            col = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                   + kj * block_k)
            mask = col < kv_len
            if causal:
                mask = jnp.logical_and(mask, col <= row)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]                                 # [bq, 128]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True) * sm_scale   # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)                    # broadcast -> [bq, 128]
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s * sm_scale - m_next[:, :1])               # [bq, bk]
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, 0]                                         # [bk, d]
        if masked and ragged_k:
            # Edge KV blocks read Pallas-padded garbage whose bit patterns
            # can decode as NaN; p==0 does NOT neutralize NaN in the dot
            # (0*NaN=NaN), so zero the garbage rows of v explicitly.
            vrow = (jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
                    + kj * block_k)
            v = jnp.where(vrow < kv_len, v, jnp.zeros_like(v))
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(jnp.logical_and(live, interior))
    def _run_interior():
        _tile(masked=False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(interior)))
    def _run_boundary():
        _tile(masked=True)

    @pl.when(kj == num_kv_blocks - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_length: jnp.ndarray | None = None,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Tiled flash attention. q [B,H,Sq,D], k/v [B,Hkv,Sk,D] -> [B,H,Sq,D].

    kv_length ([B] int32) masks padded KV positions; defaults to full Sk.
    Any sequence length works: non-128-multiples are padded (below), and
    lengths that aren't block multiples run on a ceil grid with masked edge
    blocks.

    Block default: 1024x1024 measured 2.5x faster than 256x256 at the
    decoder's prefill shape (S=4096, D=128: 2.5 vs 6.3 ms on v5e); 2048
    overflows VMEM (16 MB f32 score tile).
    """
    b, hq, sq, d = q.shape
    _, hkv, sk, _ = k.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if kv_length is None:
        kv_length = jnp.full((b,), sk, dtype=jnp.int32)

    # Auto-pad ragged sequence lengths (e.g. the ViT's 577 tokens) to the
    # 128-lane tile; padded KV is masked via kv_length, padded Q rows are
    # sliced off below.
    sq_pad = -sq % 128
    sk_pad = -sk % 128
    if sq_pad or sk_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad), (0, 0)))
        kv_length = jnp.minimum(kv_length, sk)
        out = flash_attention(
            q, k, v, kv_length, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_k=block_k, interpret=interpret,
        )
        return out[:, :, :sq]

    # Keep the requested (large) blocks and let the GRID be ragged: edge
    # blocks read Pallas-padded garbage that the kv_len / row masks kill.
    # (The old divisor-shrinking fallback collapsed block_k to 128 for any
    # length with an odd 128-multiple — e.g. 11648 = 128*91, the chunk-20
    # caption cache — exploding the grid to ~20k tiny steps and costing
    # ~2 s of a 7B prefill; profiled round 3.)
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    nq = -(-sq // block_q)
    nkv = -(-sk // block_k)
    grid = (b, hq, nq, nkv)
    q_per_kv = hq // hkv

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=nkv,
        ragged_k=bool(sk % block_k),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        # Index maps receive the scalar-prefetch ref as a trailing arg.
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j, *_: (b, h // q_per_kv, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j, *_: (b, h // q_per_kv, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j, *_: (b, h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    # vma handling for shard_map callers (e.g. ulysses' per-head-slice full
    # attention): outputs declare the union of input varying axes and all
    # operands are pvaried up to it. No-ops outside shard_map.
    vma = frozenset()
    for x in (q, k, v, kv_length):
        vma = vma | getattr(jax.typeof(x), "vma", frozenset())

    def _pv(x):
        missing = tuple(vma - getattr(jax.typeof(x), "vma", frozenset()))
        return jax.lax.pvary(x, missing) if missing else x

    q, k, v, kv_length = map(_pv, (q, k, v, kv_length))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype, vma=vma),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_length.astype(jnp.int32), q, k, v)


def prefill_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_length: jnp.ndarray | None = None,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
) -> jnp.ndarray:
    """Backend dispatch: Pallas kernel on TPU, XLA reference elsewhere."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if jax.default_backend() == "tpu":
        return flash_attention(q, k, v, kv_length, causal=causal, sm_scale=sm_scale)
    return _attention_reference(
        q, k, v, causal=causal, sm_scale=sm_scale, kv_length=kv_length
    )


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    length: jnp.ndarray,
    *,
    sm_scale: float | None = None,
) -> jnp.ndarray:
    """One-token attention against the KV cache.

    q [B, H, 1, D]; k_cache/v_cache [B, Hkv, Lmax, D]; length [B] = number of
    valid cache entries (the new token's K/V must already be written).
    """
    b, hq, _, d = q.shape
    hkv = k_cache.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    g = hq // hkv
    lmax = k_cache.shape[2]
    qg = q.reshape(b, hkv, g, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhld->bhgl", qg, k_cache.astype(jnp.float32)) * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, lmax), 3)
    s = jnp.where(col < length[:, None, None, None], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgl,bhld->bhgd", p, v_cache.astype(jnp.float32))
    return o.reshape(b, hq, 1, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# Partial flash attention for ring / USP sequence parallelism
# ---------------------------------------------------------------------------


def _flash_partial_kernel(
    offsets_ref,           # [2] int32 scalar prefetch: (q_offset, k_offset)
    length_ref,            # [B] int32 scalar prefetch: valid KV per row
    q_ref,                 # [1, 1, bq, d]
    k_ref,                 # [1, 1, bk, d]
    v_ref,                 # [1, 1, bk, d]
    o_ref,                 # [1, 1, bq, d] f32 UNNORMALIZED accumulator out
    m_ref,                 # [1, 1, bq] f32 running max out
    l_ref,                 # [1, 1, bq] f32 softmax denominator out
    m_scratch,             # [bq, 128] f32
    l_scratch,             # [bq, 128] f32
    acc_scratch,           # [bq, d]  f32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    neg_inf: float,
    ragged_k: bool,
):
    """Flash tile pass that emits (acc, m, l) instead of normalized output.

    The ring merge (ops/ring_attention._ring_body) rescales partials across
    devices — the same job the reference does in dedicated Triton kernels
    (vila/train/sequence_parallel/ring/triton_utils.py). Causal masking uses
    GLOBAL positions via the prefetched (q_offset, k_offset) of this shard
    pair, so one compiled kernel serves every ring step.
    """
    b = pl.program_id(0)
    qi = pl.program_id(2)
    kj = pl.program_id(3)

    @pl.when(kj == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_len = length_ref[b]
    q_off = offsets_ref[0]
    k_off = offsets_ref[1]

    # Skip KV tiles entirely above the (global) causal diagonal or past kv_len.
    if causal:
        diag_ok = q_off + (qi + 1) * block_q - 1 >= k_off + kj * block_k
    else:
        diag_ok = True
    live = jnp.logical_and(diag_ok, kj * block_k < kv_len)
    # Interior tiles — every column valid (kv edge not crossed) and the
    # whole tile strictly below the causal diagonal — need NO per-element
    # masking. The iota/compare/select passes over the [bq, bk] f32 tile are
    # VPU work serialized between the two MXU dots, and interior tiles are
    # the vast majority of a long prefill (the traced 23k chunked prefill
    # ran this kernel at ~57% of the MXU floor before this split).
    fully_live = (kj + 1) * block_k <= kv_len
    if causal:
        fully_below = (q_off + qi * block_q) >= (k_off + (kj + 1) * block_k - 1)
        interior = jnp.logical_and(fully_live, fully_below)
    else:
        interior = fully_live

    def _tile(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # sm_scale folded into the reduce + the exp expression (one fused
        # elementwise pass) instead of a standalone pass over the f32 tile —
        # see _flash_kernel. m/l therefore live in the SCALED domain, same
        # as before.

        if masked:
            row = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                   + qi * block_q)
            col = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                   + kj * block_k)
            mask = col < kv_len
            if causal:
                mask = jnp.logical_and(mask, k_off + col <= q_off + row)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True) * sm_scale
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s * sm_scale - m_next[:, :1])
        if masked:
            # Rows with every key masked in EVERY tile so far would
            # accumulate exp(DMV*scale - DMV*scale) = 1 poison that never
            # washes out when the row stays fully masked for the whole
            # shard pair (common in ring: a diagonal shard's top rows).
            # Zero them explicitly; the threshold lives in the scaled
            # domain with m. (An interior tile's rows have real maxima.)
            p = jnp.where(
                (m_next[:, :1] > DEFAULT_MASK_VALUE * sm_scale / 2), p, 0.0
            )
        l_scratch[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next

        v = v_ref[0, 0]
        if masked and ragged_k:
            # See _flash_kernel: NaN garbage in edge-block v survives p==0.
            vrow = (jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
                    + kj * block_k)
            v = jnp.where(vrow < kv_len, v, jnp.zeros_like(v))
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(jnp.logical_and(live, interior))
    def _run_interior():
        _tile(masked=False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(interior)))
    def _run_boundary():
        _tile(masked=True)

    @pl.when(kj == num_kv_blocks - 1)
    def _store():
        # Clamp -inf / DMV to the ring's finite NEG_INF so the cross-device
        # exp(m - new_m) rescale stays well-defined for all-masked rows.
        # m/l outputs are [bq, 128] broadcast copies (every scratch column is
        # identical): a [bq]-shaped output block would violate the TPU (8,
        # 128) tile rule on its last two dims; the caller slices lane 0.
        m_ref[0, 0] = jnp.maximum(m_scratch[...], neg_inf)
        l_ref[0, 0] = l_scratch[...]
        o_ref[0, 0] = acc_scratch[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_q", "block_k", "interpret", "neg_inf"
    ),
)
def flash_attention_partial(
    q: jnp.ndarray,            # [B, H, Sq, D]
    k: jnp.ndarray,            # [B, Hkv, Sk, D]
    v: jnp.ndarray,
    q_offset: jnp.ndarray,     # [] global index of q's first row
    k_offset: jnp.ndarray,     # [] global index of k's first row
    kv_length: jnp.ndarray | None = None,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
    neg_inf: float = -1e30,
):
    """One ring step's partial attention -> (acc f32 [B,H,Sq,D], m, l [B,H,Sq]).

    acc is UNNORMALIZED (sum of p*v with p relative to this shard's running
    max m); callers merge shards with the online-softmax rescale and divide
    by the merged l at the end. Sequence dims must be 128-multiples.
    """
    b, hq, sq, d = q.shape
    _, hkv, sk, _ = k.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if kv_length is None:
        kv_length = jnp.full((b,), sk, dtype=jnp.int32)
    if sq % 128 or sk % 128:
        raise ValueError(f"partial flash needs 128-multiple seqs, got ({sq},{sk})")

    # Ragged grids with masked edge blocks (see flash_attention): shrinking
    # blocks to divisors exploded the grid for odd 128-multiples.
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    nq = -(-sq // block_q)
    nkv = -(-sk // block_k)
    grid = (b, hq, nq, nkv)
    q_per_kv = hq // hkv

    kernel = functools.partial(
        _flash_partial_kernel,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=nkv,
        neg_inf=neg_inf,
        ragged_k=bool(sk % block_k),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j, *_: (b, h // q_per_kv, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j, *_: (b, h // q_per_kv, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 128), lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 128), lambda b, h, i, j, *_: (b, h, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    offsets = jnp.stack(
        [jnp.asarray(q_offset, jnp.int32), jnp.asarray(k_offset, jnp.int32)]
    )
    # Under shard_map's per-axis type system the outputs must declare which
    # mesh axes they vary over, and every operand must carry the SAME vma
    # (the kernel body mixes them): take the union of all inputs' vmas and
    # pvary the stragglers up to it (e.g. a default kv_length built here is
    # unvarying while the ring offsets vary over the sequence axis).
    vma = frozenset()
    for x in (q, k, v, offsets, kv_length):
        vma = vma | getattr(jax.typeof(x), "vma", frozenset())

    def _pv(x):
        missing = tuple(vma - getattr(jax.typeof(x), "vma", frozenset()))
        return jax.lax.pvary(x, missing) if missing else x

    q, k, v, offsets, kv_length = map(_pv, (q, k, v, offsets, kv_length))
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, sq, d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((b, hq, sq, 128), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((b, hq, sq, 128), jnp.float32, vma=vma),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(offsets, kv_length.astype(jnp.int32), q, k, v)
    return acc, m[..., 0], l[..., 0]
