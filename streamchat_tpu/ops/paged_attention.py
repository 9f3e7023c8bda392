"""Pallas paged decode attention: page-table-indexed KV, no gather copy.

The XLA paged path (`models/paged_kv.paged_decode_attention`) materializes
`k_pages[table]` every step — for a 4k-context 7B decode that's read pages +
write the gathered copy + read it again (~3x the cache bytes). This kernel
indexes the page pool DIRECTLY through the page table via scalar prefetch
(the BlockSpec index_map picks pool page `table[b, j]` for grid step j), so
each step reads the cache exactly once at the HBM roofline.

One (batch row, kv head) owns its grid lane; pages stream along the
innermost grid dim with the online-softmax accumulators in VMEM scratch —
the decode twin of the prefill flash kernel (ops/attention._flash_kernel).
GQA is native: the q block holds the head's whole query group.

Unmapped / past-length pages are skipped with pl.when, so ragged batches
cost only their true lengths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from streamchat_tpu.ops.attention import DEFAULT_MASK_VALUE

# Pages streamed per sequential-pool grid step. 8 pages (1 MB int8 KV per
# step) left the kernel dominated by per-step fixed costs at long contexts:
# 23k ctx = 23 blocks x 28 layers x ~15 us of grid overhead per decode
# token. 32 pages (4 MB per step) amortizes it 4x; VMEM stays ~17 MB with
# double buffering. Partitioned batched pools must round max_pages_per_seq
# to this (generate_paged does).
SEQ_POOL_BLOCK = 32

# Probe hook (scripts/probe_p50.py --pool_block): forces every sequential-
# pool decode call to one block size so the 8/16/32 trade (DMA of the
# masked ceil-grid tail vs per-step grid overhead) can be A/B-measured
# on-chip at a given context. None = use the seq_pool_block policy.
SEQ_POOL_BLOCK_OVERRIDE: int | None = None


# Probe hook (scripts/probe_p50.py --table_kernel): False forces the
# page-table-indexed kernel even for sequential pools, so the kernel
# CHOICE (table vs sequential-pool streaming) can be A/B-measured on-chip
# at a given context. None = dispatch by pool layout (the production rule).
SEQ_KERNEL_OVERRIDE: bool | None = None


def use_seq_kernel(sequential_pages: bool) -> bool:
    """Trace-time dispatch between the sequential-pool and table kernels."""
    if SEQ_KERNEL_OVERRIDE is not None:
        return sequential_pages and SEQ_KERNEL_OVERRIDE
    return sequential_pages


def seq_pool_block(row_pages: int) -> int:
    """Pages per sequential-pool grid step for a row of `row_pages` pages.

    Single policy point consumed by BOTH the pool-size rounding in
    generate_paged and the decode-attention call sites in paged_kv — the
    batched partitioned layout requires row_pages to be a multiple of the
    kernel's block, so the two must never disagree.
    """
    if SEQ_POOL_BLOCK_OVERRIDE is not None:
        return SEQ_POOL_BLOCK_OVERRIDE
    return SEQ_POOL_BLOCK


def _paged_decode_kernel(
    table_ref,            # [B, maxp] int32 scalar prefetch
    length_ref,           # [B] int32 scalar prefetch
    q_ref,                # [1, 1, gpad, d]
    k_ref,                # [1, 1, ps, d] (pool page table[b, j])
    v_ref,
    o_ref,                # [1, 1, gpad, d]
    m_scratch,            # [gpad, 128] f32
    l_scratch,
    acc_scratch,          # [gpad, d] f32
    *,
    sm_scale: float,
    page_size: int,
    num_pages_per_seq: int,
):
    b = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    length = length_ref[b]
    live = jnp.logical_and(
        table_ref[b, j] >= 0, j * page_size < length
    )

    @pl.when(live)
    def _run():
        q = q_ref[0, 0]                                   # [gpad, d]
        k = k_ref[0, 0]                                   # [ps, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                      # [gpad, ps]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * page_size
        s = jnp.where(col < length, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scratch[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next
        v = v_ref[0, 0]
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(j == num_pages_per_seq - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "interpret")
)
def paged_decode_attention_pallas(
    q: jnp.ndarray,            # [B, Hq, 1, Dh]
    k_pages: jnp.ndarray,      # [num_pages, Hkv, page_size, Dh] (one layer)
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,   # [B, max_pages] int32 (-1 = unmapped)
    length: jnp.ndarray,       # [B] valid tokens
    sm_scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-token attention against a paged cache -> [B, Hq, 1, Dh].

    Drop-in for paged_kv.paged_decode_attention, reading pool pages through
    the table inside the kernel instead of gathering them into a contiguous
    copy first.
    """
    b, hq, _, d = q.shape
    num_pages, hkv, ps, _ = k_pages.shape
    maxp = page_table.shape[1]
    if sm_scale is None:
        sm_scale = d ** -0.5
    g = hq // hkv
    gpad = max(8, -(-g // 8) * 8)              # sublane-align the query group

    qg = q.reshape(b, hkv, g, d)
    if gpad > g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gpad - g), (0, 0)))

    grid = (b, hkv, maxp)
    kernel = functools.partial(
        _paged_decode_kernel,
        sm_scale=sm_scale,
        page_size=ps,
        num_pages_per_seq=maxp,
    )
    # Index maps receive (grid idx..., *prefetch_refs). Clamp the table entry
    # so unmapped (-1) pages still produce a legal index; pl.when skips them.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, gpad, d), lambda b, h, j, *_: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, ps, d),
                lambda b, h, j, table, length: (
                    jnp.maximum(table[b, j], 0), h, 0, 0
                ),
            ),
            pl.BlockSpec(
                (1, 1, ps, d),
                lambda b, h, j, table, length: (
                    jnp.maximum(table[b, j], 0), h, 0, 0
                ),
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, gpad, d), lambda b, h, j, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((gpad, 128), jnp.float32),
            pltpu.VMEM((gpad, 128), jnp.float32),
            pltpu.VMEM((gpad, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, gpad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), length.astype(jnp.int32),
      qg, k_pages, v_pages)
    return out[:, :, :g].reshape(b, hq, 1, d)


def _seq_decode_kernel(
    length_ref,           # [B] int32 scalar prefetch
    q_ref,                # [1, hkv, gpad, d] (row bi's query group)
    k_ref,                # [pb, hkv, ps, d] (pool pages of row bi, block j)
    v_ref,
    *refs,                # o_ref[, m_ref, l_ref], m/l/acc scratch
    sm_scale: float,
    page_size: int,
    pages_per_block: int,
    num_blocks: int,
    num_kv_heads: int,
    emit_ml: bool = False,
):
    """Sequential-pool decode: pages are in pool order (identity table).

    One grid step covers pages_per_block pages for ALL kv heads (static
    python loop) — vs the per-(page, head) grid of _paged_decode_kernel.
    At 7B/11.6k ctx this is 12 steps instead of 368; the per-step grid
    overhead was ~2/3 of measured decode attention time
    (scripts/probe_kvint8.py, round 3).

    Batched rows (grid (B, nb), j innermost): each row owns the STATICALLY
    PARTITIONED pool slice [bi*row_pages, (bi+1)*row_pages) — the BlockSpec
    index maps compute block offsets from bi directly, no page table. The
    online-softmax scratch resets at each row's j==0.

    emit_ml=True (the speculative-decode verify path): emit UNNORMALIZED
    f32 acc plus the running (m, l) instead of the normalized output — the
    caller merges with the staged in-flight block's partial attention under
    one softmax (models/spec_decode). Same contract as
    ops/attention.flash_attention_partial; m/l ride [gpad, 128] broadcast
    blocks (TPU tile rule), lane 0 is the value."""
    if emit_ml:
        o_ref, m_ref, l_ref, m_scratch, l_scratch, acc_scratch = refs
    else:
        o_ref, m_scratch, l_scratch, acc_scratch = refs
    bi = pl.program_id(0)
    j = pl.program_id(1)
    span = pages_per_block * page_size

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    length = length_ref[bi]

    @pl.when(j * span < length)
    def _run():
        for h in range(num_kv_heads):
            q = q_ref[0, h]                                    # [gpad, d]
            k = k_ref[:, h].reshape(span, -1)                  # [span, d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale                                       # [gpad, span]
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * span
            s = jnp.where(col < length, s, DEFAULT_MASK_VALUE)

            m_prev = m_scratch[h]
            l_prev = l_scratch[h]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_scratch[h] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scratch[h] = m_next
            v = v_ref[:, h].reshape(span, -1)
            acc_scratch[h] = acc_scratch[h] * alpha[:, :1] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

    @pl.when(j == num_blocks - 1)
    def _store():
        for h in range(num_kv_heads):
            if emit_ml:
                m_ref[0, h] = jnp.maximum(m_scratch[h], -1e30)
                l_ref[0, h] = l_scratch[h]
                o_ref[0, h] = acc_scratch[h].astype(o_ref.dtype)
            else:
                l = l_scratch[h][:, :1]
                l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
                o_ref[0, h] = (acc_scratch[h] * l_inv).astype(o_ref.dtype)


def _seq_decode_int8_kernel(
    length_ref,           # [B] int32 scalar prefetch
    q_ref,                # [1, hkv, gpad, d] (row bi's query group)
    k_ref,                # [pb, hkv, ps, d] int8
    v_ref,
    ks_ref,               # [hkv, span] f32 (head-major, page-dim flattened)
    vs_ref,
    *refs,                # o_ref[, m_ref, l_ref], m/l/acc scratch
    sm_scale: float,
    page_size: int,
    pages_per_block: int,
    num_blocks: int,
    num_kv_heads: int,
    emit_ml: bool = False,
):
    """Int8 twin of _seq_decode_kernel.

    h is a STATIC loop index, so the per-head scale row is a plain slice —
    no one-hot reduction (the one-hot select cost ~14 us per (page, head)
    step in the per-page kernel). The per-token scales commute out of the
    contractions — s = (q . k_i8) * ks, acc += (p * vs) @ v_i8 — so the int8
    pages are only ever CAST to bf16 (never element-wise dequantized through
    an f32 [span, d] intermediate, which cost ~6 ms/step at 7B/11.6k ctx).
    Scales arrive flattened [hkv, num_pages*ps] so the row slice is already
    lane-shaped [1, span]. Batched rows work exactly as in _seq_decode_kernel
    (grid (B, nb), statically partitioned pool, scratch reset at j==0).
    emit_ml: see _seq_decode_kernel."""
    if emit_ml:
        o_ref, m_ref, l_ref, m_scratch, l_scratch, acc_scratch = refs
    else:
        o_ref, m_scratch, l_scratch, acc_scratch = refs
    bi = pl.program_id(0)
    j = pl.program_id(1)
    span = pages_per_block * page_size

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    length = length_ref[bi]

    @pl.when(j * span < length)
    def _run():
        for h in range(num_kv_heads):
            q = q_ref[0, h]
            k = k_ref[:, h].astype(q.dtype).reshape(span, -1)   # cast only
            v = v_ref[:, h].astype(q.dtype).reshape(span, -1)
            ks = ks_ref[h : h + 1]                              # [1, span]
            vs = vs_ref[h : h + 1]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * ks * sm_scale
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * span
            s = jnp.where(col < length, s, DEFAULT_MASK_VALUE)

            m_prev = m_scratch[h]
            l_prev = l_scratch[h]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_scratch[h] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scratch[h] = m_next
            acc_scratch[h] = acc_scratch[h] * alpha[:, :1] + jax.lax.dot(
                (p * vs).astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )

    @pl.when(j == num_blocks - 1)
    def _store():
        for h in range(num_kv_heads):
            if emit_ml:
                m_ref[0, h] = jnp.maximum(m_scratch[h], -1e30)
                l_ref[0, h] = l_scratch[h]
                o_ref[0, h] = acc_scratch[h].astype(o_ref.dtype)
            else:
                l = l_scratch[h][:, :1]
                l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
                o_ref[0, h] = (acc_scratch[h] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "pages_per_block", "interpret")
)
def paged_decode_attention_pallas_seq(
    q: jnp.ndarray,            # [B, Hq, 1, Dh]
    k_pages: jnp.ndarray,      # [num_pages, Hkv, page_size, Dh] (one layer)
    v_pages: jnp.ndarray,
    length: jnp.ndarray,       # [B]
    sm_scale: float | None = None,
    pages_per_block: int = SEQ_POOL_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Decode attention for a SEQUENTIAL pool (identity/partitioned table).

    Single row (B=1): generate_paged's single-row caches are identity-mapped
    by construction (from_contiguous + the sequential allocator +
    compress_paged all map row pages to pool order), so the table is dropped
    and pages stream in pages_per_block-page blocks with all kv heads per
    grid step.

    Batched rows (B>1): the pool must be STATICALLY PARTITIONED — row bi
    owns pool pages [bi*row_pages, (bi+1)*row_pages), row_pages =
    num_pages // B (from_contiguous(..., partitioned=True)). Block offsets
    come straight from the grid indices; amortizes the decode weight read
    across rows (the batched-captioning serving path).
    """
    b, hq, _, d = q.shape
    hkv = k_pages.shape[1]
    g = hq // hkv
    gpad = max(8, -(-g // 8) * 8)
    qg = q.reshape(b, hkv, g, d)
    if gpad > g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gpad - g), (0, 0)))
    out = _seq_attention_call(
        qg, k_pages, v_pages, None, None, length,
        sm_scale=sm_scale, pages_per_block=pages_per_block,
        interpret=interpret, emit_ml=False,
    )
    return out[:, :, :g].reshape(b, hq, 1, d)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "pages_per_block", "interpret")
)
def paged_decode_attention_pallas_seq_int8(
    q: jnp.ndarray,            # [B, Hq, 1, Dh]
    k_pages: jnp.ndarray,      # [num_pages, Hkv, page_size, Dh] int8
    v_pages: jnp.ndarray,
    k_scale: jnp.ndarray,      # [num_pages, Hkv, page_size] f32
    v_scale: jnp.ndarray,
    length: jnp.ndarray,       # [B]
    sm_scale: float | None = None,
    pages_per_block: int = SEQ_POOL_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Int8-cache twin of paged_decode_attention_pallas_seq (incl. batched
    partitioned-pool rows)."""
    b, hq, _, d = q.shape
    hkv = k_pages.shape[1]
    g = hq // hkv
    gpad = max(8, -(-g // 8) * 8)
    qg = q.reshape(b, hkv, g, d)
    if gpad > g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gpad - g), (0, 0)))
    out = _seq_attention_call(
        qg, k_pages, v_pages, k_scale, v_scale, length,
        sm_scale=sm_scale, pages_per_block=pages_per_block,
        interpret=interpret, emit_ml=False,
    )
    return out[:, :, :g].reshape(b, hq, 1, d)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "pages_per_block", "interpret")
)
def paged_seq_attention_partial(
    q: jnp.ndarray,            # [B, Hq, T, Dh] — T in-flight queries
    k_pages: jnp.ndarray,      # [num_pages, Hkv, page_size, Dh] (one layer)
    v_pages: jnp.ndarray,
    length: jnp.ndarray,       # [B] valid pool tokens (the block EXCLUDED)
    sm_scale: float | None = None,
    pages_per_block: int = SEQ_POOL_BLOCK,
    interpret: bool = False,
):
    """Multi-query partial attention against a sequential pool ->
    (acc f32 [B, Hq, T, Dh] UNNORMALIZED, m [B, Hq, T], l [B, Hq, T]).

    The speculative-decode verify step (models/spec_decode): the T block
    tokens' queries attend the pool in ONE kernel sweep — the T*g query
    rows fold into the kernel's row dimension (same online-softmax body;
    a bigger M also feeds the MXU better than decode's 8 rows) — and the
    caller merges the result with the staged in-flight block's partial
    attention under one softmax. The XLA einsum alternative materializes a
    dequantized f32 copy of the pool per layer per step (~5 GB of extra
    HBM traffic at 7B/23k), which ate the entire speculative speedup at
    long context (round-4 probe)."""
    return _seq_partial(
        q, k_pages, v_pages, None, None, length,
        sm_scale=sm_scale, pages_per_block=pages_per_block,
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "pages_per_block", "interpret")
)
def paged_seq_attention_partial_int8(
    q: jnp.ndarray,            # [B, Hq, T, Dh]
    k_pages: jnp.ndarray,      # int8
    v_pages: jnp.ndarray,
    k_scale: jnp.ndarray,      # [num_pages, Hkv, page_size] f32
    v_scale: jnp.ndarray,
    length: jnp.ndarray,
    sm_scale: float | None = None,
    pages_per_block: int = SEQ_POOL_BLOCK,
    interpret: bool = False,
):
    """Int8-pool twin of paged_seq_attention_partial (fused in-register
    dequant — scales commute out of both contractions)."""
    return _seq_partial(
        q, k_pages, v_pages, k_scale, v_scale, length,
        sm_scale=sm_scale, pages_per_block=pages_per_block,
        interpret=interpret,
    )


def _seq_partial(
    q, k_pages, v_pages, k_scale, v_scale, length, *,
    sm_scale, pages_per_block, interpret,
):
    """Fold the T·g query rows into the kernel row dim -> (acc, m, l)."""
    b, hq, t, d = q.shape
    hkv = k_pages.shape[1]
    g = hq // hkv
    rows = g * t
    gpad = max(8, -(-rows // 8) * 8)
    # Head-major rows: row g_i*T + t_i <- query (head h*g+g_i, token t_i).
    qg = q.reshape(b, hkv, rows, d)
    if gpad > rows:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gpad - rows), (0, 0)))
    acc, m, l = _seq_attention_call(
        qg, k_pages, v_pages, k_scale, v_scale, length,
        sm_scale=sm_scale, pages_per_block=pages_per_block,
        interpret=interpret, emit_ml=True,
    )
    acc = acc[:, :, :rows].reshape(b, hq, t, d)
    m = m[:, :, :rows, 0].reshape(b, hq, t)
    l = l[:, :, :rows, 0].reshape(b, hq, t)
    return acc, m, l


def _seq_attention_call(
    qg, k_pages, v_pages, k_scale, v_scale, length, *,
    sm_scale, pages_per_block, interpret, emit_ml,
):
    """Shared pallas_call plumbing for ALL sequential-pool entry points
    (normalized decode and emit_ml partial, bf16 and int8 pools).

    qg is already [B, hkv, gpad, d]-padded. emit_ml=True returns
    (acc f32, m, l) with m/l as [B, hkv, gpad, 128] broadcast blocks;
    emit_ml=False returns the normalized output in qg.dtype."""
    b, hkv, gpad, d = qg.shape
    num_pages, _, ps, _ = k_pages.shape
    if num_pages % b:
        raise ValueError(f"pool of {num_pages} pages not divisible into "
                         f"{b} partitioned rows")
    row_pages = num_pages // b
    if b == 1:
        nb = -(-row_pages // pages_per_block)
    else:
        if row_pages % pages_per_block:
            raise ValueError(
                f"partitioned rows of {row_pages} pages must be a multiple "
                f"of pages_per_block={pages_per_block}")
        nb = row_pages // pages_per_block
    if sm_scale is None:
        sm_scale = d ** -0.5
    int8 = k_scale is not None
    span = pages_per_block * ps
    kern = _seq_decode_int8_kernel if int8 else _seq_decode_kernel
    kernel = functools.partial(
        kern, sm_scale=sm_scale, page_size=ps,
        pages_per_block=pages_per_block, num_blocks=nb, num_kv_heads=hkv,
        emit_ml=emit_ml,
    )
    in_specs = [
        pl.BlockSpec((1, hkv, gpad, d), lambda bi, j, length: (bi, 0, 0, 0)),
        pl.BlockSpec((pages_per_block, hkv, ps, d),
                     lambda bi, j, length, _nb=nb: (bi * _nb + j, 0, 0, 0)),
        pl.BlockSpec((pages_per_block, hkv, ps, d),
                     lambda bi, j, length, _nb=nb: (bi * _nb + j, 0, 0, 0)),
    ]
    operands = [qg, k_pages, v_pages]
    if int8:
        # Head-major flattened scales: [num_pages, hkv, ps] ->
        # [hkv, num_pages*ps] so a per-head row slice is already the
        # lane-shaped [1, span] the kernel multiplies s/p by. Rows' page
        # regions are contiguous, so a row's block j lives at flattened
        # block index bi*nb + j.
        k_scale_hm = k_scale.transpose(1, 0, 2).reshape(hkv, num_pages * ps)
        v_scale_hm = v_scale.transpose(1, 0, 2).reshape(hkv, num_pages * ps)
        in_specs += [
            pl.BlockSpec((hkv, span),
                         lambda bi, j, length, _nb=nb: (0, bi * _nb + j)),
            pl.BlockSpec((hkv, span),
                         lambda bi, j, length, _nb=nb: (0, bi * _nb + j)),
        ]
        operands += [k_scale_hm, v_scale_hm]
    out_block = pl.BlockSpec(
        (1, hkv, gpad, d), lambda bi, j, length: (bi, 0, 0, 0)
    )
    ml_block = pl.BlockSpec(
        (1, hkv, gpad, 128), lambda bi, j, length: (bi, 0, 0, 0)
    )
    if emit_ml:
        out_specs = [out_block, ml_block, ml_block]
        out_shape = [
            jax.ShapeDtypeStruct((b, hkv, gpad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, gpad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, gpad, 128), jnp.float32),
        ]
    else:
        out_specs = out_block
        out_shape = jax.ShapeDtypeStruct((b, hkv, gpad, d), qg.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((hkv, gpad, 128), jnp.float32),
            pltpu.VMEM((hkv, gpad, 128), jnp.float32),
            pltpu.VMEM((hkv, gpad, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(length.astype(jnp.int32), *operands)


def _paged_decode_int8_kernel(
    table_ref,            # [B, maxp] int32 scalar prefetch
    length_ref,           # [B] int32 scalar prefetch
    q_ref,                # [1, 1, gpad, d]
    k_ref,                # [1, 1, ps, d] int8 (pool page table[b, j])
    v_ref,
    ks_ref,               # [1, Hkv, ps] f32 scales for the page (all heads)
    vs_ref,
    o_ref,                # [1, 1, gpad, d]
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    sm_scale: float,
    page_size: int,
    num_pages_per_seq: int,
    num_kv_heads: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    length = length_ref[b]
    live = jnp.logical_and(table_ref[b, j] >= 0, j * page_size < length)

    @pl.when(live)
    def _run():
        q = q_ref[0, 0]
        # int8 values upcast in-register; the per-(token, head) scale
        # commutes out of the contraction: (q . k_i8) * scale.
        k = k_ref[0, 0].astype(q.dtype)
        # Select this kv head's scale row via a one-hot reduction — Mosaic
        # has no dynamic_slice on values, and a (1, 1, ps)-blocked scale
        # input would violate the (8, 128) tile rule.
        hsel = jax.lax.broadcasted_iota(
            jnp.int32, (num_kv_heads, 1), 0
        ) == h
        ks = jnp.sum(jnp.where(hsel, ks_ref[0], 0.0), axis=0, keepdims=True)
        vs = jnp.sum(jnp.where(hsel, vs_ref[0], 0.0), axis=0, keepdims=True)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * ks * sm_scale                                        # [gpad, ps]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * page_size
        s = jnp.where(col < length, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scratch[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next
        v = v_ref[0, 0].astype(q.dtype)
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + jax.lax.dot(
            (p * vs).astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(j == num_pages_per_seq - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def paged_decode_attention_pallas_int8(
    q: jnp.ndarray,            # [B, Hq, 1, Dh]
    k_pages: jnp.ndarray,      # [num_pages, Hkv, page_size, Dh] int8
    v_pages: jnp.ndarray,
    k_scale: jnp.ndarray,      # [num_pages, Hkv, page_size] f32
    v_scale: jnp.ndarray,
    page_table: jnp.ndarray,
    length: jnp.ndarray,
    sm_scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Int8-cache twin of paged_decode_attention_pallas."""
    b, hq, _, d = q.shape
    _, hkv, ps, _ = k_pages.shape
    maxp = page_table.shape[1]
    if sm_scale is None:
        sm_scale = d ** -0.5
    g = hq // hkv
    gpad = max(8, -(-g // 8) * 8)
    qg = q.reshape(b, hkv, g, d)
    if gpad > g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gpad - g), (0, 0)))

    grid = (b, hkv, maxp)
    kernel = functools.partial(
        _paged_decode_int8_kernel,
        sm_scale=sm_scale, page_size=ps, num_pages_per_seq=maxp,
        num_kv_heads=hkv,
    )
    page_idx = lambda b, h, j, table, length: (jnp.maximum(table[b, j], 0), h, 0, 0)
    scale_idx = lambda b, h, j, table, length: (jnp.maximum(table[b, j], 0), 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, gpad, d), lambda b, h, j, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, ps, d), page_idx),
            pl.BlockSpec((1, 1, ps, d), page_idx),
            pl.BlockSpec((1, hkv, ps), scale_idx),
            pl.BlockSpec((1, hkv, ps), scale_idx),
        ],
        out_specs=pl.BlockSpec((1, 1, gpad, d), lambda b, h, j, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((gpad, 128), jnp.float32),
            pltpu.VMEM((gpad, 128), jnp.float32),
            pltpu.VMEM((gpad, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, gpad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), length.astype(jnp.int32),
      qg, k_pages, v_pages, k_scale, v_scale)
    return out[:, :, :g].reshape(b, hq, 1, d)
