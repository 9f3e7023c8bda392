"""Fused-ViT layer variant sweep toward the matmul floor (VERDICT r4 #2).

Round-4 attribution: ~13.9 ms per fused layer call (batch 128) vs a
~9.5-10.5 ms bf16 matmul floor; the gap is in-kernel VPU work plus the
dh=64 attention dots. Two questions this probe answers with measurements:

1. `--variant dotk`: does Mosaic charge a dh=64 contraction (QK^T) or a
   64-lane output (p.V) a FULL 128 tile pass? If yes the attention dots
   run at 50% MXU efficiency — and block-diagonal head packing provably
   cannot help (the packed zeros exactly equal the padding waste: any
   packing keeps M*ceil(K/128)*ceil(N/128) constant), so the honest
   outcome is a named negative result, not a packed kernel.

2. layer variants, each isolated in a subprocess (Mosaic compile stalls,
   PARITY "frame-tile autotune"):
   - base      : the shipped kernel (clamp softmax, frame_tile=2)
   - wfold     : fold LN1/LN2 scale+bias into wqkv/fc1 (g into W rows,
                 b@W into biases) and dh^-0.5*log2e into wq; softmax via
                 exp2 with the clamp at 80*log2e — removes the LN affine
                 passes and the q-prescale pass from the kernel
   - ln1p      : LN statistics in one read (E[x], E[x^2]) instead of
                 mean + centered var
   - bf16s     : QK^T accumulated in bf16 + bf16 exp (numerics ceiling
                 probe ONLY — not a production candidate)
   - ft4/ft4u  : frame_tile=4 via in-kernel fori_loop / Python unroll
                 (the round-4 Mosaic stall, attacked with both bodies)
   - combo     : wfold + ln1p at frame_tile=2

Timing: chained lax.scan of the layer (output feeds input) at two scan
lengths; the per-iteration cost is the slope, so relay dispatch and the
scan fixed cost cancel (CLAUDE.md timing discipline).

Run: python scripts/probe_vit_variants.py            # sweep (subprocesses)
     python scripts/probe_vit_variants.py --variant base   # one variant
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, S, D, HEADS, DMID = 128, 577, 1024, 16, 4096
LOG2E = math.log2(math.e)
_VMEM_LIMIT = 120 * 1024 * 1024


# ---------------------------------------------------------------------------
# Parameterized layer kernel
# ---------------------------------------------------------------------------


def _ln(x32, scale, bias, eps, onepass, affine):
    if onepass:
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        var = ms - mu * mu
    else:
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    if affine:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y


def _attn_mlp_body(x32, refs, opt):
    (s1_ref, b1l_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
     s2_ref, b2l_ref, w1_ref, b1_ref, w2_ref, b2_ref) = refs
    dt = jnp.bfloat16
    d, nh = D, HEADS
    dh = d // nh
    affine = not opt["wfold"]
    h = _ln(x32, s1_ref[:], b1l_ref[:], 1e-5, opt["ln1p"], affine).astype(dt)
    qkv = jnp.dot(h, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(dt)
    ones_col = jnp.ones((x32.shape[0], 1), dt)
    heads_out = []
    for hd in range(nh):
        q = qkv[:, hd * dh:(hd + 1) * dh]
        if not opt["wfold"]:
            q = q * dt(dh ** -0.5)
        k = qkv[:, d + hd * dh:d + (hd + 1) * dh]
        v = qkv[:, 2 * d + hd * dh:2 * d + (hd + 1) * dh]
        if opt["bf16s"]:
            # ceiling probe: bf16 scores AND bf16 exp (NOT production math)
            s_qk = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.bfloat16)
            pd = jnp.exp(jnp.minimum(s_qk, dt(80.0)))
        else:
            s_qk = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if opt["wfold"]:
                # wq carries dh^-0.5 * log2e: exp(s) == exp2(s')
                pd = jnp.exp2(jnp.minimum(s_qk, 80.0 * LOG2E)).astype(dt)
            else:
                pd = jnp.exp(jnp.minimum(s_qk, 80.0)).astype(dt)
        ol = jnp.dot(pd, jnp.concatenate([v, ones_col], axis=1),
                     preferred_element_type=jnp.float32)
        l_inv = 1.0 / jnp.maximum(ol[:, dh:], 1e-30)
        heads_out.append((ol[:, :dh] * l_inv).astype(dt))
    attn = jnp.concatenate(heads_out, axis=-1)
    mid_x = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
    mid_x = mid_x + bo_ref[:].astype(jnp.float32) + x32
    h2 = _ln(mid_x, s2_ref[:], b2l_ref[:], 1e-5, opt["ln1p"], affine).astype(dt)
    mid = jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32)
    mid = mid + b1_ref[:].astype(jnp.float32)
    mid = mid * jax.nn.sigmoid(1.702 * mid)
    out = jnp.dot(mid.astype(dt), w2_ref[:], preferred_element_type=jnp.float32)
    return out + b2_ref[:].astype(jnp.float32) + mid_x


def _kernel(x_ref, *rest, opt):
    refs, o_ref = rest[:-1], rest[-1]
    ft = opt["frame_tile"]
    if opt["fori"]:
        def body(f, _):
            out = _attn_mlp_body(x_ref[f].astype(jnp.float32), refs, opt)
            o_ref[f] = out.astype(o_ref.dtype)
            return 0
        jax.lax.fori_loop(0, ft, body, 0)
    else:
        for f in range(ft):
            out = _attn_mlp_body(x_ref[f].astype(jnp.float32), refs, opt)
            o_ref[f] = out.astype(o_ref.dtype)


def make_layer(opt):
    ft = opt["frame_tile"]
    vec = lambda i: (0,)
    mat = lambda i: (0, 0)
    frame = lambda i: (i, 0, 0)

    @jax.jit
    def layer(x, p):
        return pl.pallas_call(
            functools.partial(_kernel, opt=opt),
            grid=(N // ft,),
            in_specs=[
                pl.BlockSpec((ft, S, D), frame, memory_space=pltpu.VMEM),
                pl.BlockSpec((D,), vec, memory_space=pltpu.VMEM),
                pl.BlockSpec((D,), vec, memory_space=pltpu.VMEM),
                pl.BlockSpec((D, 3 * D), mat, memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * D,), vec, memory_space=pltpu.VMEM),
                pl.BlockSpec((D, D), mat, memory_space=pltpu.VMEM),
                pl.BlockSpec((D,), vec, memory_space=pltpu.VMEM),
                pl.BlockSpec((D,), vec, memory_space=pltpu.VMEM),
                pl.BlockSpec((D,), vec, memory_space=pltpu.VMEM),
                pl.BlockSpec((D, DMID), mat, memory_space=pltpu.VMEM),
                pl.BlockSpec((DMID,), vec, memory_space=pltpu.VMEM),
                pl.BlockSpec((DMID, D), mat, memory_space=pltpu.VMEM),
                pl.BlockSpec((D,), vec, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ft, S, D), frame, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, S, D), x.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(x, *p)
    return layer


def make_params(key, opt):
    ks = iter(jax.random.split(key, 12))
    f32 = jnp.float32
    d = D
    dh = d // HEADS
    g1 = 1.0 + 0.1 * jax.random.normal(next(ks), (d,), f32)
    c1 = 0.1 * jax.random.normal(next(ks), (d,), f32)
    wqkv = jax.random.normal(next(ks), (d, 3 * d), f32) * d ** -0.5
    bqkv = 0.1 * jax.random.normal(next(ks), (3 * d,), f32)
    wo = jax.random.normal(next(ks), (d, d), f32) * d ** -0.5
    bo = 0.1 * jax.random.normal(next(ks), (d,), f32)
    g2 = 1.0 + 0.1 * jax.random.normal(next(ks), (d,), f32)
    c2 = 0.1 * jax.random.normal(next(ks), (d,), f32)
    w1 = jax.random.normal(next(ks), (d, DMID), f32) * d ** -0.5
    b1 = 0.1 * jax.random.normal(next(ks), (DMID,), f32)
    w2 = jax.random.normal(next(ks), (DMID, d), f32) * DMID ** -0.5
    b2 = 0.1 * jax.random.normal(next(ks), (d,), f32)
    if opt["wfold"]:
        # LN affine into the following matmul: y@W + b = n@(g*W) + (c@W + b)
        bqkv = bqkv + c1 @ wqkv
        wqkv = wqkv * g1[:, None]
        b1 = b1 + c2 @ w1
        w1 = w1 * g2[:, None]
        # q columns carry dh^-0.5 * log2e (exp -> exp2)
        scale = dh ** -0.5 * LOG2E
        wqkv = wqkv.at[:, :d].multiply(scale)
        bqkv = bqkv.at[:d].multiply(scale)
        g1 = jnp.ones_like(g1); c1 = jnp.zeros_like(c1)
        g2 = jnp.ones_like(g2); c2 = jnp.zeros_like(c2)
    bf = jnp.bfloat16
    return tuple(a.astype(bf) for a in
                 (g1, c1, wqkv, bqkv, wo, bo, g2, c2, w1, b1, w2, b2))


VARIANTS = {
    "base":  dict(wfold=False, ln1p=False, bf16s=False, frame_tile=2, fori=False),
    "wfold": dict(wfold=True,  ln1p=False, bf16s=False, frame_tile=2, fori=False),
    "ln1p":  dict(wfold=False, ln1p=True,  bf16s=False, frame_tile=2, fori=False),
    "bf16s": dict(wfold=False, ln1p=False, bf16s=True,  frame_tile=2, fori=False),
    "ft4":   dict(wfold=False, ln1p=False, bf16s=False, frame_tile=4, fori=True),
    "ft4u":  dict(wfold=False, ln1p=False, bf16s=False, frame_tile=4, fori=False),
    "combo": dict(wfold=True,  ln1p=True,  bf16s=False, frame_tile=2, fori=False),
    "combo4": dict(wfold=True, ln1p=True,  bf16s=False, frame_tile=4, fori=True),
}


def time_scan(layer, params, x, lengths=(6, 18), reps=3):
    """Per-iteration seconds from the slope between two scan lengths."""
    results = {}
    for ln in lengths:
        @jax.jit
        def run(x, p, ln=ln):
            def body(c, _):
                return layer(c, p), None
            out, _ = jax.lax.scan(body, x, None, length=ln)
            return jnp.sum(out[:1, :1, :8].astype(jnp.float32))
        float(run(x, params))                     # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x, params))
            best = min(best, time.perf_counter() - t0)
        results[ln] = best
    (l1, t1), (l2, t2) = sorted(results.items())
    return (t2 - t1) / (l2 - l1), results


def run_variant(name):
    opt = VARIANTS[name]
    x = (jax.random.normal(jax.random.key(1), (N, S, D)) * 0.5).astype(jnp.bfloat16)
    params = make_params(jax.random.key(0), opt)
    layer = make_layer(opt)
    t0 = time.time()
    per_iter, raw = time_scan(layer, params, x)
    out = {
        "variant": name, **opt,
        "ms_per_layer_call": round(per_iter * 1e3, 3),
        "eq_frames_per_s_24l": round(N / (per_iter * 24), 1),
        "raw_s": {str(k): round(v, 4) for k, v in raw.items()},
        "total_probe_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out), flush=True)


def run_dotk():
    """MXU rate for dh=64-shaped attention dots vs 128-shaped equivalents."""
    dt = jnp.bfloat16

    N_DOTS = 96   # unrolled (fori-loop repeat bodies stalled Mosaic 2/2)

    def make(kind):
        # one operand varies per dot (realistic), the other is shared so
        # the score-sized side never exceeds VMEM
        if kind == "qk64":     # 96 x [S,64]x[64,S]
            a_s, b_s, out_n = (N_DOTS, S, 64), (64, S), S
        elif kind == "qk128":  # 48 x [S,128]x[128,S] (same total FLOPs)
            a_s, b_s, out_n = (N_DOTS // 2, S, 128), (128, S), S
        elif kind == "pv64":   # 96 x [S,S]x[S,64]
            a_s, b_s, out_n = (S, S), (N_DOTS, S, 64), 64
        else:                  # pv128: 48 x [S,S]x[S,128]
            a_s, b_s, out_n = (S, S), (N_DOTS // 2, S, 128), 128

        out_pad = max(out_n, 128)   # a 64-lane trailing out dim breaks tiling
        n = a_s[0] if len(a_s) == 3 else b_s[0]

        def kern(a_ref, b_ref, o_ref):
            acc = jnp.zeros((S, out_n), jnp.float32)
            for i in range(n):
                if len(a_s) == 3:
                    acc = acc + jnp.dot(a_ref[i], b_ref[:],
                                        preferred_element_type=jnp.float32)
                else:
                    acc = acc + jnp.dot(a_ref[:], b_ref[i],
                                        preferred_element_type=jnp.float32)
            if out_pad != out_n:
                acc = jnp.pad(acc, ((0, 0), (0, out_pad - out_n)))
            o_ref[:] = acc

        @jax.jit
        def f(a, b):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((S, out_pad), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT),
            )(a, b)
        a = (jax.random.normal(jax.random.key(0), a_s) * 0.1).astype(dt)
        b = (jax.random.normal(jax.random.key(1), b_s) * 0.1).astype(dt)
        return f, a, b

    for kind in ("qk64", "qk128", "pv64", "pv128"):
        f, a, b = make(kind)

        @functools.partial(jax.jit, static_argnames=("ln",))
        def run(a, b, ln):
            # carry feeds one element of `a` so the kernel call cannot be
            # hoisted out of the loop as loop-invariant
            def body(c, _):
                a_in = a.at[0, 0, 0].add(c[0, 0].astype(a.dtype))
                return f(a_in, b)[:1, :1] * 1e-6, None
            out, _ = jax.lax.scan(body, jnp.zeros((1, 1), jnp.float32),
                                  None, length=ln)
            return jnp.sum(out)

        times = {}
        for ln in (50, 450):
            float(run(a, b, ln))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(a, b, ln))
                best = min(best, time.perf_counter() - t0)
            times[ln] = best
        per = (times[450] - times[50]) / 400
        flops = 2 * S * S * 64 * N_DOTS  # identical for all four kinds
        print(json.dumps({
            "kind": kind, "us_per_call": round(per * 1e6, 2),
            "tflops": round(flops / per / 1e12, 1),
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None,
                    choices=list(VARIANTS) + ["dotk"])
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()
    if args.variant == "dotk":
        return run_dotk()
    if args.variant:
        return run_variant(args.variant)
    # sweep: each variant in its own process (compile stalls must not
    # poison the rest — PARITY frame-tile autotune lesson)
    for name in ["dotk"] + list(VARIANTS):
        cmd = [sys.executable, os.path.abspath(__file__), "--variant", name]
        try:
            r = subprocess.run(cmd, timeout=args.timeout,
                               capture_output=True, text=True)
            sys.stdout.write(r.stdout)
            if r.returncode != 0:
                print(json.dumps({"variant": name, "failed_rc": r.returncode,
                                  "stderr_tail": r.stderr[-400:]}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"variant": name,
                              "failed": f"timeout {args.timeout}s (Mosaic stall)"}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
