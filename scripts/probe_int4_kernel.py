"""Isolate the int4 matvec kernel's bottleneck on the v5e (chip to itself).

ops/int4_matmul.qmatvec_int4 measures 11.1 ms/tok at 7B vs int8's 10.5 —
the packed-byte DMA floor is ~5 ms, so ~6 ms is kernel overhead. Candidate
culprits, each isolated by an ablation variant over the 7B MLP-up matvec
(3584x18944, packed bytes [3584, 9472]):

  dma    — DMA + grid overhead only (block consumed with one 8-row add)
  cast   — DMA + two bf16 casts + the per-group dots (NO bit ops; wrong
           numerics, timing only): adds MXU + cast cost over `dma`
  cur    — the shipping kernel's unpack (i32 widen, and/xor/sub, shift)
  xor32  — algebraic unpack: ONE xor biases the low nibble (+8), then both
           halves come from dots on (byte^8) and ((byte^8)&0xF) with
           per-group corrections (lo = d_u - 8*sum(x_g); hi = (d_b - d_u)/16)
           — bit ops per byte drop from 5 to 2, casts stay 2
  xor8   — same algebra with i8-native xor/and (4x lane density if Mosaic
           legalizes them; the shipping kernel widens to i32 because i8
           SUBTRACT fails to legalize — xor/and may still be fine)

Then a (groups_per_block x block_out) sweep on the winner.

Run:  python scripts/probe_int4_kernel.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128
DIN, DOUT = 3584, 18944


def make_kernel(variant, gpb, num_k, num_groups):
    def kernel(x_ref, w_ref, s_ref, o_ref, acc_lo, acc_hi):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            acc_lo[...] = jnp.zeros_like(acc_lo)
            acc_hi[...] = jnp.zeros_like(acc_hi)

        b = w_ref[...]
        if variant == "dma":
            acc_lo[...] += b[0:8, :].astype(jnp.float32)
        else:
            if variant == "cur":
                w32 = b.astype(jnp.int32)
                lo = (((w32 & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
                hi = (w32 >> 4).astype(jnp.bfloat16)
            elif variant == "xor32":
                w32 = b.astype(jnp.int32) ^ 8
                lo = (w32 & 0xF).astype(jnp.bfloat16)
                hi = w32.astype(jnp.bfloat16)
            elif variant == "xor8":
                bx = b ^ jnp.int8(8)
                lo = (bx & jnp.int8(0xF)).astype(jnp.bfloat16)
                hi = bx.astype(jnp.bfloat16)
            elif variant == "cast":
                lo = b.astype(jnp.bfloat16)
                hi = lo
            else:
                raise ValueError(variant)
            for gs in range(gpb):
                r0 = gs * GROUP
                xg = x_ref[:, r0:r0 + GROUP]
                p_lo = jax.lax.dot(xg, lo[r0:r0 + GROUP],
                                   preferred_element_type=jnp.float32)
                p_hi = jax.lax.dot(xg, hi[r0:r0 + GROUP],
                                   preferred_element_type=jnp.float32)
                if variant in ("xor32", "xor8"):
                    sx = jnp.sum(xg.astype(jnp.float32), axis=1,
                                 keepdims=True)
                    new_lo = p_lo - 8.0 * sx
                    p_hi = (p_hi - p_lo) * 0.0625
                    p_lo = new_lo
                valid = (k * gpb + gs) < num_groups
                acc_lo[...] += jnp.where(valid, p_lo * s_ref[gs, 0][None], 0.0)
                acc_hi[...] += jnp.where(valid, p_hi * s_ref[gs, 1][None], 0.0)

        @pl.when(k == num_k - 1)
        def _store():
            o_ref[:, 0] = acc_lo[...]
            o_ref[:, 1] = acc_hi[...]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("variant", "block_out", "gpb"))
def matvec(x, w_i4p, scale, variant="cur", block_out=1024, gpb=16):
    n, kin = x.shape
    _, oh = w_i4p.shape
    g = scale.shape[0]
    bo = min(block_out, -(-oh // 128) * 128)
    gpb = min(gpb, g)
    bk = gpb * GROUP
    nj = -(-oh // bo)
    nk = -(-g // gpb)
    if n < 8:
        x = jnp.pad(x, ((0, 8 - n), (0, 0)))
    out = pl.pallas_call(
        make_kernel(variant, gpb, nk, g),
        grid=(nj, nk),
        in_specs=[
            pl.BlockSpec((8, bk), lambda j, k: (0, k)),
            pl.BlockSpec((bk, bo), lambda j, k: (k, j)),
            pl.BlockSpec((gpb, 2, bo), lambda j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((8, 2, bo), lambda j, k: (0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((8, 2, nj * bo), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, bo), jnp.float32),
                        pltpu.VMEM((8, bo), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x, w_i4p, scale)
    return out[:n, :, :oh].reshape(n, 2 * oh)


def bench(x, q4, variant, bo, gpb, reps=50):
    @jax.jit
    def loop(x, w, s):
        def body(c, _):
            y = matvec(c, w, s, variant=variant, block_out=bo, gpb=gpb)
            c = (y[:, :DIN].astype(jnp.bfloat16) * 1e-3 + c)
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(c.astype(jnp.float32))

    float(loop(x, q4["w_i4p"], q4["scale"]))
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        float(loop(x, q4["w_i4p"], q4["scale"]))
        best = min(best, (time.time() - t0) / reps * 1e3)
    return best


def main():
    assert jax.default_backend() == "tpu"
    from streamchat_tpu.ops.quant import (
        dequantize_weight_int4, quantize_weight_int4)

    w = jax.random.normal(jax.random.key(0), (DIN, DOUT), jnp.float32) * 0.02
    q4 = quantize_weight_int4(w)
    wd = dequantize_weight_int4(q4, jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (1, DIN), jnp.bfloat16)
    ref = jnp.asarray(x @ wd, jnp.float32)
    del w, wd
    gb = DIN * DOUT / 2 / 1e9

    results = {}
    for variant in ("dma", "cast", "cur", "xor32", "xor8"):
        try:
            if variant in ("cur", "xor32", "xor8"):
                got = matvec(x, q4["w_i4p"], q4["scale"], variant=variant)
                err = float(jnp.max(jnp.abs(got - ref)))
                rel = err / float(jnp.max(jnp.abs(ref)))
            else:
                rel = None
            ms = bench(x, q4, variant, 1024, 16)
            results[variant] = ms
            print(json.dumps({
                "variant": variant, "ms": round(ms, 4),
                "eff_gbps": round(gb / ms * 1e3, 1),
                "max_rel_err": None if rel is None else round(rel, 6),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": variant,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)

    best = min((v, k) for k, v in results.items()
               if k not in ("dma", "cast"))[1]
    print(json.dumps({"sweep_variant": best}), flush=True)
    for gpb in (8, 16, 32):
        for bo in (512, 1024, 2048):
            try:
                ms = bench(x, q4, best, bo, gpb, reps=50)
                print(json.dumps({"gpb": gpb, "bo": bo, "ms": round(ms, 4),
                                  "eff_gbps": round(gb / ms * 1e3, 1)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"gpb": gpb, "bo": bo,
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
