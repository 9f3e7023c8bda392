"""Pallas int4 weight-only matvec: stream packed nibbles, unpack in VMEM.

Single-stream decode is weight-bandwidth bound (ops/quant.py): per token the
full parameter set crosses HBM. XLA serves int8 at the roofline because the
int8->bf16 convert fuses into the dot's operand load — but it CANNOT fuse a
nibble unpack (shift/mask) into an operand load, so an XLA int4 matmul
materializes the unpacked matrix and runs 2.2x SLOWER than int8 (measured on
the v5e, round 3). This kernel is the fix: the packed bytes
(quantize_weight_int4's column-half layout, [in, out/2] int8) are DMA'd to
VMEM as-is — half of int8's bytes — and the nibbles are unpacked by the VPU
on-chip, where the unpack rides under the next block's DMA.

Layout contract (ops/quant.quantize_weight_int4):
  byte (i, j) = w[i, j] in the low nibble, w[i, j + out/2] in the high
  nibble; scale [g, 2, out/2] f32, dim 1 = (low, high) halves.

One grid step (j, k) covers a [bk, bo] byte block — bk = gpb groups of 128
input rows, bo packed columns — and contributes to BOTH output halves'
columns [j*bo, (j+1)*bo). Per sub-group dots keep the group scale exact
(it multiplies the f32 partial before accumulation, outside the dot).
Ragged edges use ceil grids: k-edge garbage is masked by zeroing each
sub-group's CONTRIBUTION (jnp.where on the scaled partial — 0*NaN never
reaches the accumulator), j-edge garbage lands in padded output columns
sliced off outside.

The reference has no analogue (no quantization at all); the closest kin is
its Triton flash kernel (vila/model/language_model/mpt/flash_attn_triton.py)
as "the hand-written kernel where the compiler can't".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128          # quantization group size (quantize_weight_int4 default)


def _accumulate_block(x_ref, w_ref, s_ref, acc_lo, acc_hi, k, gpb, num_groups):
    # Algebraic unpack — 2 single-byte VPU bit-ops instead of the naive 5
    # wide ones. One xor biases the LOW nibble: with b = (w_lo & 15) |
    # ((w_hi & 15) << 4), flipping bit 3 gives bx = b ^ 8 whose low nibble
    # is exactly w_lo + 8 in [1, 15], and whose SIGNED byte value is
    # 16*w_hi + (w_lo + 8) (the high nibble's two's-complement wrap folds
    # into w_hi for both signs). Both output halves then come from MXU dots
    # on bx and (bx & 0xF) plus per-group scalar corrections:
    #   lo-half dot = d_u - 8*sum(x_g)        where d_u = x . (bx & 0xF)
    #   hi-half dot = (d_b - d_u) / 16        where d_b = x . bx
    # All intermediate integers are <= 255 — exact in bf16; the dots
    # accumulate in f32. The naive per-nibble unpack widened every byte to
    # i32 (Mosaic has no i8 subtract) and measured 379 GB/s effective;
    # this form runs i8-native xor/and (they DO legalize) and measures
    # 597 GB/s on the 7B MLP matvec — against a 752 GB/s pure-DMA ceiling
    # for the same block structure (scan-amortized, dispatch-floor-
    # subtracted, v5e round 3).
    bx = w_ref[...] ^ jnp.int8(8)
    lo_u = (bx & jnp.int8(0xF)).astype(jnp.bfloat16)      # [bk, bo] = w_lo+8
    comb = bx.astype(jnp.bfloat16)                        # 16*w_hi + w_lo+8

    for gs in range(gpb):
        r0 = gs * GROUP
        xg = x_ref[:, r0:r0 + GROUP]                      # [8, 128]
        d_u = jax.lax.dot(xg, lo_u[r0:r0 + GROUP],
                          preferred_element_type=jnp.float32)
        d_b = jax.lax.dot(xg, comb[r0:r0 + GROUP],
                          preferred_element_type=jnp.float32)
        sx = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)  # [8, 1]
        p_lo = d_u - 8.0 * sx
        p_hi = (d_b - d_u) * 0.0625
        # Masked-edge k blocks: an out-of-range sub-group multiplies
        # garbage x rows and garbage scales — select 0 AFTER the scale
        # multiply so NaNs cannot reach the accumulator.
        valid = (k * gpb + gs) < num_groups
        acc_lo[...] += jnp.where(valid, p_lo * s_ref[gs, 0][None], 0.0)
        acc_hi[...] += jnp.where(valid, p_hi * s_ref[gs, 1][None], 0.0)


def _kernel(
    x_ref,            # [8, bk] bf16      (rows padded to 8)
    w_ref,            # [bk, bo] int8     (packed bytes)
    s_ref,            # [gpb, 2, bo] f32  (group scales, both halves)
    o_ref,            # [8, 2, bo] f32
    acc_lo,           # [8, bo] f32 scratch
    acc_hi,
    *,
    gpb: int,
    num_k: int,
    num_groups: int,
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_lo[...] = jnp.zeros_like(acc_lo)
        acc_hi[...] = jnp.zeros_like(acc_hi)

    _accumulate_block(x_ref, w_ref, s_ref, acc_lo, acc_hi, k, gpb, num_groups)

    @pl.when(k == num_k - 1)
    def _store():
        o_ref[:, 0] = acc_lo[...]
        o_ref[:, 1] = acc_hi[...]


def _kernel_fused(
    x_ref,            # [8, bk] bf16
    *refs,            # (w0, s0, w1, s1, ...), o_ref, acc_lo, acc_hi
    layout,           # tuple of (block_offset, num_blocks) per part
    gpb: int,
    num_k: int,
    num_groups: int,
):
    o_ref, acc_lo, acc_hi = refs[-3], refs[-2], refs[-1]
    j = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_lo[...] = jnp.zeros_like(acc_lo)
        acc_hi[...] = jnp.zeros_like(acc_hi)

    # One part is active per j step (its grid-segment); the inactive parts'
    # index maps pin to their first/last block so no DMA is issued for them.
    for p, (off, njp) in enumerate(layout):
        w_ref, s_ref = refs[2 * p], refs[2 * p + 1]

        @pl.when(jnp.logical_and(j >= off, j < off + njp))
        def _go(w_ref=w_ref, s_ref=s_ref):
            _accumulate_block(x_ref, w_ref, s_ref, acc_lo, acc_hi, k, gpb,
                              num_groups)

    @pl.when(k == num_k - 1)
    def _store():
        o_ref[:, 0] = acc_lo[...]
        o_ref[:, 1] = acc_hi[...]


@functools.partial(
    jax.jit, static_argnames=("block_out", "groups_per_block", "interpret")
)
def qmatvec_int4(
    x: jnp.ndarray,           # [N, in] bf16, N <= 8
    w_i4p: jnp.ndarray,       # [in, out/2] int8 packed
    scale: jnp.ndarray,       # [g, 2, out/2] f32
    block_out: int = 256,
    groups_per_block: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ W for packed int4 W -> [N, out] f32.

    Decode-oriented (N <= 8 activation rows ride one sublane block); weight
    traffic is the packed in*out/2 bytes. Callers gate on
    in % 128 == 0 and (out/2) % 128 == 0 (ops/quant.qmatmul_int4).
    """
    n, kin = x.shape
    _, oh = w_i4p.shape
    g = scale.shape[0]
    if kin // g != GROUP:
        raise ValueError(f"expected group size {GROUP}, got {kin // g}")
    if n > 8:
        raise ValueError(f"matvec kernel serves <=8 rows, got {n}")
    bo = min(block_out, -(-oh // 128) * 128)
    gpb = min(groups_per_block, g)
    bk = gpb * GROUP
    nj = -(-oh // bo)
    nk = -(-g // gpb)

    if n < 8:
        x = jnp.pad(x, ((0, 8 - n), (0, 0)))

    kernel = functools.partial(
        _kernel, gpb=gpb, num_k=nk, num_groups=g,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nj, nk),
        in_specs=[
            pl.BlockSpec((8, bk), lambda j, k: (0, k)),
            pl.BlockSpec((bk, bo), lambda j, k: (k, j)),
            pl.BlockSpec((gpb, 2, bo), lambda j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((8, 2, bo), lambda j, k: (0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((8, 2, nj * bo), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, bo), jnp.float32),
            pltpu.VMEM((8, bo), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w_i4p, scale)
    return out[:n, :, :oh].reshape(n, 2 * oh)


@functools.partial(
    jax.jit, static_argnames=("block_out", "groups_per_block", "interpret")
)
def qmatvec_int4_fused(
    x: jnp.ndarray,           # [N, in] bf16, N <= 8
    *flat,                    # w0, s0, w1, s1, ... (packed bytes + scales)
    block_out: int = 256,
    groups_per_block: int = 32,
    interpret: bool = False,
) -> tuple:
    """x @ W_p for several packed-int4 weights sharing the input dim.

    ONE pallas_call serves every part: the grid's j axis is segmented, one
    segment per weight, and each part's BlockSpec index map clamps to its
    own segment — outside it the index is pinned, so no DMA is issued for
    inactive parts and total weight traffic equals the sum of the separate
    calls. What it saves is per-call overhead: a decode step at 7B issues
    196 matvec kernels (7 per layer x 28); fusing q/k/v and gate/up cuts
    that to 4 per layer, and the 8-row x pad is shared instead of repeated.

    Parts narrower than block_out (e.g. the GQA k/v projections) ride a
    single edge block whose out-of-range columns hold garbage — sliced off
    per part below, same as the single-weight kernel's ragged j edge.

    Returns one [N, out_p] f32 array per part.
    """
    n, kin = x.shape
    parts = [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]
    g = parts[0][1].shape[0]
    if kin // g != GROUP:
        raise ValueError(f"expected group size {GROUP}, got {kin // g}")
    for w, s in parts:
        if w.shape[0] != kin or s.shape[0] != g:
            raise ValueError("fused parts must share the input dim / groups")
    if n > 8:
        raise ValueError(f"matvec kernel serves <=8 rows, got {n}")
    gpb = min(groups_per_block, g)
    bk = gpb * GROUP
    nk = -(-g // gpb)
    bo = min(block_out, max(-(-w.shape[1] // 128) * 128 for w, _ in parts))

    layout = []
    off = 0
    for w, _ in parts:
        njp = -(-w.shape[1] // bo)
        layout.append((off, njp))
        off += njp
    nj_total = off

    if n < 8:
        x = jnp.pad(x, ((0, 8 - n), (0, 0)))

    def w_spec(off_p, njp):
        return pl.BlockSpec(
            (bk, bo),
            lambda j, k, off_p=off_p, njp=njp: (
                k, jnp.clip(j - off_p, 0, njp - 1)
            ),
        )

    def s_spec(off_p, njp):
        return pl.BlockSpec(
            (gpb, 2, bo),
            lambda j, k, off_p=off_p, njp=njp: (
                k, 0, jnp.clip(j - off_p, 0, njp - 1)
            ),
        )

    in_specs = [pl.BlockSpec((8, bk), lambda j, k: (0, k))]
    operands = [x]
    for (w, s), (off_p, njp) in zip(parts, layout):
        in_specs.extend([w_spec(off_p, njp), s_spec(off_p, njp)])
        operands.extend([w, s])

    kernel = functools.partial(
        _kernel_fused, layout=tuple(layout), gpb=gpb, num_k=nk, num_groups=g,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nj_total, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, 2, bo), lambda j, k: (0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((8, 2, nj_total * bo), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, bo), jnp.float32),
            pltpu.VMEM((8, bo), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    results = []
    for (w, _), (off_p, njp) in zip(parts, layout):
        oh = w.shape[1]
        seg = out[:n, :, off_p * bo:off_p * bo + njp * bo]
        results.append(seg[:, :, :oh].reshape(n, 2 * oh))
    return tuple(results)
