"""Fused Pallas kernels for the ViT encoder's HBM-bound halves.

Round-1 profiling (CLAUDE.md roofline) showed the CLIP encoder is
activation-bandwidth bound on this chip (~244 GB/s effective HBM): XLA's
per-op fusions re-read the residual stream for every LayerNorm (3 passes),
write the [N*577, 4096] MLP intermediate to HBM between fc1 and fc2
(~1.2 GB/layer at batch 128), and materialize head-transpose copies around
attention. These kernels fuse each transformer-layer *half* into one
VMEM-resident pass:

* `fused_ln_mlp`:  out = x + fc2(act(fc1(LN(x))))   — the 4096-wide
  intermediate lives only in VMEM; fc1/fc2 weights (16.8 MB bf16) stay
  resident across grid steps (constant index_map -> Pallas skips the re-DMA).
  HBM traffic per layer drops from ~2.4 GB to read x + write out (302 MB).
* `fused_ln_attn`: out = x + O(softmax(QK^T/sqrt(d)) V) with LN and a single
  merged QKV projection — no q/k/v HBM round-trips, no transpose copies,
  scores never leave VMEM.

Replaces the per-op path of the reference's HF CLIP encoder
(`longva/model/multimodal_encoder/clip_encoder.py:68-79`) — the reference
leans on cuDNN/flash-attn; the TPU design wins by eliminating HBM traffic
instead. Both kernels are inference-only (no VJP) — StreamChat is
training-free end to end.

Numerics match the unfused path: LN statistics and softmax in f32, matmuls
bf16 x bf16 with f32 accumulation, activations stored bf16.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 120 * 1024 * 1024
_LOG2E = math.log2(math.e)


def _ln_f32(x32, scale, bias, eps, *, onepass=False):
    """LayerNorm over the last axis; input/output f32, params any dtype.

    `onepass` computes the statistics from one read (E[x], E[x^2]) instead
    of mean + centered variance — one fewer VPU pass over the tile. The
    var = E[x^2] - E[x]^2 form loses f32 bits when mean^2 >> var; the
    cancellation error is ~1e-7 * mean^2/var relative, i.e. below bf16
    output resolution (4e-3) for mean/std ratios up to ~100 — far beyond
    trained-ViT residual statistics (tests/test_fused_vit.py pins the
    ratio-100 case against the two-pass oracle).

    `scale=None` skips the affine (used when the caller folded g/b into the
    following matmul — see `fold_vit_layer_params`).
    """
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    if onepass:
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    else:
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    if scale is None:
        return y
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def fold_vit_attn_params(ln_scale, ln_bias, wqkv, bqkv, *, num_heads: int):
    """Fold the pre-attention LN affine and q pre-scale into wqkv/bqkv.

    For LN output y = n*g + c followed by y@W + b, the affine commutes into
    the matmul: y@W + b = n@(g*W) + (c@W + b). The q column block of wqkv
    additionally absorbs dh^-0.5 * log2(e), so the kernel's softmax can run
    exp2 directly on the scores (exp(s) == exp2(s * log2e)).

    Folding runs in f32 and rounds back to the input dtype — the same
    rounding the unfolded kernel pays when it casts the LN output to bf16.
    Returns (wqkv', bqkv') for `fused_ln_attn(..., folded=True)` (which
    then ignores the ln scale/bias operands).
    """
    f32 = jnp.float32
    d = wqkv.shape[0]
    dh = d // num_heads
    w = wqkv.astype(f32)
    b = bqkv.astype(f32) + ln_bias.astype(f32) @ w
    w = w * ln_scale.astype(f32)[:, None]
    qscale = (dh ** -0.5) * _LOG2E
    w = w.at[:, :d].multiply(qscale)
    b = b.at[:d].multiply(qscale)
    return w.astype(wqkv.dtype), b.astype(bqkv.dtype)


def fold_vit_layer_params(
    ln1_scale, ln1_bias, wqkv, bqkv, ln2_scale, ln2_bias, w1, b1,
    *, num_heads: int,
):
    """Fold both LN affines and the q pre-scale into the projection weights.

    The attention half is `fold_vit_attn_params`; the MLP half commutes the
    LN2 affine into fc1 the same way. Together this removes two full-width
    VPU affine passes and the [S, dh] q-scale pass from the kernel
    (round-5 variant sweep, scripts/probe_vit_variants.py: 13.9 ->
    12.6 ms/layer with ln_onepass + frame_tile=4).

    Returns (wqkv', bqkv', w1', b1'); pass them to `fused_vit_layer` with
    `folded=True` (which ignores the ln*_scale/bias operands).
    """
    f32 = jnp.float32
    w, b = fold_vit_attn_params(
        ln1_scale, ln1_bias, wqkv, bqkv, num_heads=num_heads)
    w1f = w1.astype(f32)
    b1f = b1.astype(f32) + ln2_bias.astype(f32) @ w1f
    w1f = w1f * ln2_scale.astype(f32)[:, None]
    return w, b, w1f.astype(w1.dtype), b1f.astype(b1.dtype)


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (f32, max abs err 1.5e-7)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _activate(h32, activation: str):
    if activation == "quick_gelu":          # CLIP: x * sigmoid(1.702 x)
        return h32 * jax.nn.sigmoid(1.702 * h32)
    if activation == "gelu":                # mm projector: exact erf GELU
        # Mosaic has no erf/erfc primitive; Abramowitz & Stegun 7.1.26
        # (max abs err 1.5e-7) is exact to well below bf16 resolution.
        return 0.5 * h32 * (1.0 + _erf(h32 * (2.0 ** -0.5)))
    if activation == "none":
        return h32
    raise ValueError(f"unknown activation: {activation}")


def _mlp_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *, eps, activation, layernorm, residual):
    x32 = x_ref[:].astype(jnp.float32)
    h = _ln_f32(x32, s_ref[:], b_ref[:], eps) if layernorm else x32
    h = h.astype(x_ref.dtype)
    mid = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    mid = _activate(mid + b1_ref[:].astype(jnp.float32), activation)
    mid = mid.astype(x_ref.dtype)
    out = jnp.dot(mid, w2_ref[:], preferred_element_type=jnp.float32)
    out = out + b2_ref[:].astype(jnp.float32)
    if residual:
        out = out + x32
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "activation", "layernorm", "residual", "token_tile",
                     "interpret"),
)
def fused_ln_mlp(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    eps: float = 1e-5,
    activation: str = "quick_gelu",
    layernorm: bool = True,
    residual: bool = True,
    token_tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """out = [x +] fc2(act(fc1(LN(x))))  with the intermediate VMEM-only.

    `x` is [T, Din] (callers flatten batch x seq). `token_tile` must be a
    multiple of 8 (TPU sublane tiling); the final block may overhang T —
    Pallas masks the out-of-bounds rows, and every op here is row-wise.
    """
    t, din = x.shape
    dmid = w1.shape[1]
    dout = w2.shape[1]
    if residual and dout != din:
        raise ValueError("residual requires matching in/out dims")
    if token_tile % 8:
        raise ValueError(f"token_tile={token_tile} must be a multiple of 8")
    grid = (pl.cdiv(t, token_tile),)
    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    kernel = functools.partial(
        _mlp_kernel, eps=eps, activation=activation,
        layernorm=layernorm, residual=residual,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((token_tile, din), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((din,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((din,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dmid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dmid,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((dmid, dout), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dout,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((token_tile, dout), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, dout), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2)


def _attn_body(x32, s_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
               *, num_heads, eps, dtype, softmax_mode="clamp", folded=False,
               ln_onepass=False):
    """f32 [S, D] -> f32 [S, D]: x + O(attention(QKV(LN(x))))."""
    d = x32.shape[-1]
    dh = d // num_heads
    if folded:
        # LN affine + dh^-0.5*log2e live in wqkv/bqkv (fold_vit_layer_params)
        h = _ln_f32(x32, None, None, eps, onepass=ln_onepass).astype(dtype)
    else:
        h = _ln_f32(x32, s_ref[:], b_ref[:], eps,
                    onepass=ln_onepass).astype(dtype)
    qkv = jnp.dot(h, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(dtype)
    ones_col = jnp.ones((x32.shape[0], 1), dtype)
    heads_out = []
    for hd in range(num_heads):  # static slices keep layouts trivial
        q = qkv[:, hd * dh:(hd + 1) * dh]
        if not folded:
            # Pre-scaling q touches [S, dh] instead of the [S, S] score tile
            # (scale = dh^-0.5 is a power of two for dh=64, so exact in bf16).
            q = q * dtype.type(dh ** -0.5)
        k = qkv[:, d + hd * dh:d + (hd + 1) * dh]
        v = qkv[:, 2 * d + hd * dh:2 * d + (hd + 1) * dh]
        s_qk = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                # [S, S] f32 (log2-units when folded)
        # Manual softmax, engineered for VPU passes over the [S, S] tile —
        # the in-kernel VPU work between the MXU dots is this kernel's
        # measured roofline gap (round-4 ingest probe). Two modes:
        #
        # * "clamp" (default): ONE fused elementwise pass (clamp+exp+cast)
        #   where scale + jax.nn.softmax + cast was ~6. The usual running-
        #   max subtraction exists only to keep exp() in range; the 80.0
        #   clamp gives the same OVERFLOW safety without the [S, S]
        #   max-reduce pass, and unnormalized exp has identical RELATIVE
        #   float precision to the max-subtracted form (softmax is a
        #   ratio). Its exactness domain is row max logit in (-87, 80]:
        #   above 80 logits flatten to equal weight; a row whose max sits
        #   below ~-87 underflows entirely and the 1e-30 denominator guard
        #   returns ~0 instead of the softmax average (no NaN either way).
        #   Both edges are pinned by adversarial tests
        #   (tests/test_fused_vit.py::TestSoftmaxModes). LN-bounded
        #   trained-ViT logits are expected well inside the domain —
        #   VALIDATE per real checkpoint with
        #   models.vit.attention_logit_bounds before shipping this mode.
        # * "exact": per-row max subtraction — exact for all inputs, one
        #   extra VPU max-reduce pass over [S, S] (~2.6% ingest, measured
        #   368 vs 378 f/s). The fallback when a checkpoint's logit probe
        #   lands outside the clamp domain.
        #
        # When `folded`, scores arrive in log2 units and the exp runs as a
        # bare exp2 (the clamp moves to 80*log2e; exp2(s*log2e) == exp(s),
        # so the domain in NATURAL logit units is unchanged). In both modes
        # the denominator rides the p·v MXU dot as a ones column (dh=64
        # output tiles pad to 128 lanes anyway, so it is free), and
        # normalization lands AFTER the dot on the [S, dh] output (9x fewer
        # elements than dividing p).
        if softmax_mode == "exact":
            m = jnp.max(s_qk, axis=-1, keepdims=True)             # [S, 1]
            p = jnp.exp2(s_qk - m) if folded else jnp.exp(s_qk - m)
        elif folded:
            p = jnp.exp2(jnp.minimum(s_qk, 80.0 * _LOG2E))        # [S, S] f32
        else:
            p = jnp.exp(jnp.minimum(s_qk, 80.0))                  # [S, S] f32
        ol = jnp.dot(
            p.astype(dtype), jnp.concatenate([v, ones_col], axis=1),
            preferred_element_type=jnp.float32,
        )                                                         # [S, dh+1]
        l_inv = 1.0 / jnp.maximum(ol[:, dh:], 1e-30)
        heads_out.append((ol[:, :dh] * l_inv).astype(dtype))
    attn = jnp.concatenate(heads_out, axis=-1)                    # [S, D]
    out = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
    return out + bo_ref[:].astype(jnp.float32) + x32


def _frame_loop(frame_tile, body):
    """Run `body(f)` for f in [0, frame_tile).

    frame_tile <= 2 unrolls in Python (trivial code size). Larger tiles use
    an in-kernel fori_loop: a 4-frame UNROLLED body stalled Mosaic compiles
    indefinitely (PARITY "frame-tile autotune", 2/2 hangs) while the rolled
    loop compiles fine and measures fastest (round-5 variant sweep: combo4
    12.57 ms/layer vs 12.92 at frame_tile=2).
    """
    if frame_tile > 2:
        jax.lax.fori_loop(0, frame_tile, lambda f, c: (body(f), c)[1], 0)
    else:
        for f in range(frame_tile):
            body(f)


def _attn_kernel(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, o_ref,
                 *, num_heads, eps, frame_tile, softmax_mode, folded,
                 ln_onepass):
    def body(f):
        out = _attn_body(
            x_ref[f].astype(jnp.float32), s_ref, b_ref, wqkv_ref, bqkv_ref,
            wo_ref, bo_ref, num_heads=num_heads, eps=eps, dtype=x_ref.dtype,
            softmax_mode=softmax_mode, folded=folded, ln_onepass=ln_onepass,
        )
        o_ref[f] = out.astype(o_ref.dtype)

    _frame_loop(frame_tile, body)


def _layer_kernel(x_ref, s1_ref, b1l_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  s2_ref, b2l_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                  *, num_heads, eps, activation, frame_tile, softmax_mode,
                  folded, ln_onepass):
    dt = x_ref.dtype

    def body(f):
        mid_x = _attn_body(
            x_ref[f].astype(jnp.float32), s1_ref, b1l_ref, wqkv_ref, bqkv_ref,
            wo_ref, bo_ref, num_heads=num_heads, eps=eps, dtype=dt,
            softmax_mode=softmax_mode, folded=folded, ln_onepass=ln_onepass,
        )                                                         # [S, D] f32
        if folded:
            h = _ln_f32(mid_x, None, None, eps, onepass=ln_onepass).astype(dt)
        else:
            h = _ln_f32(mid_x, s2_ref[:], b2l_ref[:], eps,
                        onepass=ln_onepass).astype(dt)
        mid = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
        mid = _activate(mid + b1_ref[:].astype(jnp.float32), activation)
        out = jnp.dot(mid.astype(dt), w2_ref[:], preferred_element_type=jnp.float32)
        out = out + b2_ref[:].astype(jnp.float32) + mid_x
        o_ref[f] = out.astype(o_ref.dtype)

    _frame_loop(frame_tile, body)


def _check_softmax_mode(softmax_mode):
    if softmax_mode not in ("clamp", "exact"):
        raise ValueError(
            f"softmax_mode={softmax_mode!r}: expected 'clamp' or 'exact'")


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "eps", "activation", "frame_tile",
                     "softmax_mode", "folded", "ln_onepass", "interpret"),
)
def fused_vit_layer(
    x: jnp.ndarray,
    ln1_scale: jnp.ndarray,
    ln1_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    ln2_scale: jnp.ndarray,
    ln2_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    num_heads: int,
    eps: float = 1e-5,
    activation: str = "quick_gelu",
    frame_tile: int = 2,
    softmax_mode: str = "clamp",
    folded: bool = False,
    ln_onepass: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """One full pre-LN transformer block, VMEM-resident per frame tile.

    out = y + fc2(act(fc1(LN2(y)))),  y = x + O(attn(QKV(LN1(x))))

    The residual stream round-trips HBM once per layer (read x, write out);
    everything else — LN statistics, q/k/v, scores, softmax, the MLP
    intermediate — lives in VMEM. All weights (~25 MB bf16 at ViT-L) stay
    resident across grid steps.

    `folded=True` expects wqkv/bqkv/w1/b1 pre-folded by
    `fold_vit_layer_params` (LN affines + q scale absorbed; the ln*_scale/
    bias operands are then ignored) and runs the softmax as a bare exp2 —
    the round-5 production configuration together with `ln_onepass=True`
    and frame_tile=4 (12.57 ms/layer vs 13.9 unfolded at ViT-L batch 128).
    """
    n, s, d = x.shape
    if n % frame_tile:
        raise ValueError(f"N={n} not a multiple of frame_tile={frame_tile}")
    _check_softmax_mode(softmax_mode)
    grid = (n // frame_tile,)
    kernel = functools.partial(
        _layer_kernel, num_heads=num_heads, eps=eps, activation=activation,
        frame_tile=frame_tile, softmax_mode=softmax_mode, folded=folded,
        ln_onepass=ln_onepass,
    )
    dmid = w1.shape[1]
    vec = lambda i: (0,)
    mat = lambda i: (0, 0)
    frame = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((frame_tile, s, d), frame, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dmid), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((dmid,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((dmid, d), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((frame_tile, s, d), frame, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, ln1_scale, ln1_bias, wqkv, bqkv, wo, bo,
      ln2_scale, ln2_bias, w1, b1, w2, b2)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "eps", "frame_tile", "softmax_mode",
                     "folded", "ln_onepass", "interpret"),
)
def fused_ln_attn(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    *,
    num_heads: int,
    eps: float = 1e-5,
    frame_tile: int = 1,
    softmax_mode: str = "clamp",
    folded: bool = False,
    ln_onepass: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """out = x + O(attention(QKV(LN(x)))) for non-causal ViT attention.

    `x` is [N, S, D]; `wqkv` is the merged [D, 3D] projection (q|k|v column
    blocks). N must be a multiple of `frame_tile`. Full S x S scores fit in
    VMEM at ViT lengths (S=577 -> 1.3 MB f32 per head). `folded` as in
    `fused_vit_layer` (here only the qkv-side fold applies).
    """
    n, s, d = x.shape
    if n % frame_tile:
        raise ValueError(f"N={n} not a multiple of frame_tile={frame_tile}")
    _check_softmax_mode(softmax_mode)
    grid = (n // frame_tile,)
    kernel = functools.partial(
        _attn_kernel, num_heads=num_heads, eps=eps, frame_tile=frame_tile,
        softmax_mode=softmax_mode, folded=folded, ln_onepass=ln_onepass,
    )
    vec = lambda i: (0,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((frame_tile, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((frame_tile, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo)
