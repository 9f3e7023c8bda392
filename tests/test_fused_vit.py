"""Numerics of the fused Pallas ViT kernels vs the unfused XLA block.

The kernels run compiled on TPU; on the CPU test mesh they run in Pallas
interpret mode, which checks the same math (Mosaic-only lowering bugs are
covered by the on-chip bench/driver runs — CLAUDE.md workflow notes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.config import ViTConfig
from streamchat_tpu.models import vit
from streamchat_tpu.ops.fused_vit import (
    _erf,
    fold_vit_attn_params,
    fold_vit_layer_params,
    fused_ln_attn,
    fused_ln_mlp,
    fused_vit_layer,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ViTConfig.tiny()
    params = vit.init(jax.random.key(0), cfg, jnp.float32)
    x = jax.random.normal(
        jax.random.key(1), (4, cfg.num_patches + 1, cfg.hidden_size), jnp.float32
    )
    return cfg, params, x


def _rel_err(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))


def test_fused_layer_matches_block(setup):
    cfg, params, x = setup
    lp = params["layers"][0]
    wqkv = jnp.concatenate([lp["attn"][k]["w"] for k in ("q", "k", "v")], axis=1)
    bqkv = jnp.concatenate([lp["attn"][k]["b"] for k in ("q", "k", "v")])
    ref = vit._block(x, lp, cfg)
    out = fused_vit_layer(
        x, lp["ln1"]["scale"], lp["ln1"]["bias"], wqkv, bqkv,
        lp["attn"]["o"]["w"], lp["attn"]["o"]["b"],
        lp["ln2"]["scale"], lp["ln2"]["bias"],
        lp["mlp"]["fc1"]["w"], lp["mlp"]["fc1"]["b"],
        lp["mlp"]["fc2"]["w"], lp["mlp"]["fc2"]["b"],
        num_heads=cfg.num_heads, eps=cfg.layernorm_eps,
        frame_tile=2, interpret=True,
    )
    assert _rel_err(out, ref) < 2e-5


@pytest.mark.parametrize("mode", ["clamp", "exact"])
def test_fused_layer_folded_matches_block(setup, mode):
    """The round-5 production configuration: LN affines + q scale folded
    into the projections, one-pass LN statistics, frame_tile=4 (in-kernel
    fori_loop), exp2 softmax — numerics must still match the XLA block."""
    cfg, params, x = setup
    lp = params["layers"][0]
    wqkv = jnp.concatenate([lp["attn"][k]["w"] for k in ("q", "k", "v")], axis=1)
    bqkv = jnp.concatenate([lp["attn"][k]["b"] for k in ("q", "k", "v")])
    wqkv, bqkv, w1, b1 = fold_vit_layer_params(
        lp["ln1"]["scale"], lp["ln1"]["bias"], wqkv, bqkv,
        lp["ln2"]["scale"], lp["ln2"]["bias"],
        lp["mlp"]["fc1"]["w"], lp["mlp"]["fc1"]["b"],
        num_heads=cfg.num_heads,
    )
    ref = vit._block(x, lp, cfg)
    out = fused_vit_layer(
        x, lp["ln1"]["scale"], lp["ln1"]["bias"], wqkv, bqkv,
        lp["attn"]["o"]["w"], lp["attn"]["o"]["b"],
        lp["ln2"]["scale"], lp["ln2"]["bias"],
        w1, b1, lp["mlp"]["fc2"]["w"], lp["mlp"]["fc2"]["b"],
        num_heads=cfg.num_heads, eps=cfg.layernorm_eps,
        frame_tile=4, softmax_mode=mode, folded=True, ln_onepass=True,
        interpret=True,
    )
    assert _rel_err(out, ref) < 2e-5


def test_fold_params_pretree_matches_inline_fold(setup):
    """vit.fold_params attaches per-layer 'fused' projections; the fused
    path must produce the same output whether it consumes the pre-folded
    tree or folds in-trace, and folding must be idempotent."""
    cfg, params, _ = setup
    pixels = jax.random.normal(
        jax.random.key(9), (4, 3, cfg.image_size, cfg.image_size),
        jnp.float32)
    folded = vit.fold_params(params, cfg)
    assert all("fused" in p for p in folded["layers"])
    # idempotent: second call returns the same tree (no re-fold)
    again = vit.fold_params(folded, cfg)
    assert again["layers"][0]["fused"] is folded["layers"][0]["fused"]
    ref = vit.encode(params, pixels, cfg, fused=True, interpret=True)
    out = vit.encode(folded, pixels, cfg, fused=True, interpret=True)
    assert _rel_err(out, ref) < 1e-6
    # the unfused path ignores the extra leaves entirely
    plain = vit.encode(folded, pixels, cfg, fused=False)
    assert _rel_err(plain, vit.encode(params, pixels, cfg, fused=False)) < 1e-6


def test_shard_after_fold_drops_fused_leaves():
    """LongVA.shard must strip lazily-attached folds (the pspec tree is
    HF-layout; jax.tree.map needs matching structures)."""
    from streamchat_tpu.config import DecoderConfig, ViTConfig
    from streamchat_tpu.models import vit as vit_mod
    from streamchat_tpu.models.longva import LongVA

    model = LongVA.init_random(
        jax.random.key(0), ViTConfig.tiny(), DecoderConfig.tiny(),
        dtype=jnp.float32)
    model.vit_params = vit_mod.fold_params(model.vit_params, model.vit_cfg)
    assert "fused" in model.vit_params["layers"][0]
    model.shard()    # 8-device CPU test mesh; must not raise
    assert "fused" not in model.vit_params["layers"][0]


def test_onepass_ln_large_mean_to_std_ratio(setup):
    """One-pass LN (var = E[x^2] - E[x]^2) loses ~1e-7 * (mean/std)^2
    relative f32 bits to cancellation. Pin the documented domain: at
    mean/std = 100 the folded path still matches the two-pass XLA block to
    well under bf16 resolution (4e-3)."""
    cfg, params, _ = setup
    lp = params["layers"][0]
    x = 100.0 + 1.0 * jax.random.normal(
        jax.random.key(11), (4, cfg.num_patches + 1, cfg.hidden_size),
        jnp.float32)
    wqkv = jnp.concatenate([lp["attn"][k]["w"] for k in ("q", "k", "v")], axis=1)
    bqkv = jnp.concatenate([lp["attn"][k]["b"] for k in ("q", "k", "v")])
    fw, fb, w1, b1 = fold_vit_layer_params(
        lp["ln1"]["scale"], lp["ln1"]["bias"], wqkv, bqkv,
        lp["ln2"]["scale"], lp["ln2"]["bias"],
        lp["mlp"]["fc1"]["w"], lp["mlp"]["fc1"]["b"],
        num_heads=cfg.num_heads,
    )
    ref = vit._block(x, lp, cfg)
    out = fused_vit_layer(
        x, lp["ln1"]["scale"], lp["ln1"]["bias"], fw, fb,
        lp["attn"]["o"]["w"], lp["attn"]["o"]["b"],
        lp["ln2"]["scale"], lp["ln2"]["bias"],
        w1, b1, lp["mlp"]["fc2"]["w"], lp["mlp"]["fc2"]["b"],
        num_heads=cfg.num_heads, eps=cfg.layernorm_eps,
        frame_tile=4, folded=True, ln_onepass=True, interpret=True,
    )
    assert _rel_err(out, ref) < 1e-3


def test_fused_halves_match_block(setup):
    cfg, params, x = setup
    lp = params["layers"][1]
    n, s, d = x.shape
    wqkv = jnp.concatenate([lp["attn"][k]["w"] for k in ("q", "k", "v")], axis=1)
    bqkv = jnp.concatenate([lp["attn"][k]["b"] for k in ("q", "k", "v")])
    ref = vit._block(x, lp, cfg)
    a = fused_ln_attn(
        x, lp["ln1"]["scale"], lp["ln1"]["bias"], wqkv, bqkv,
        lp["attn"]["o"]["w"], lp["attn"]["o"]["b"],
        num_heads=cfg.num_heads, eps=cfg.layernorm_eps,
        frame_tile=1, interpret=True,
    )
    out = fused_ln_mlp(
        a.reshape(n * s, d), lp["ln2"]["scale"], lp["ln2"]["bias"],
        lp["mlp"]["fc1"]["w"], lp["mlp"]["fc1"]["b"],
        lp["mlp"]["fc2"]["w"], lp["mlp"]["fc2"]["b"],
        eps=cfg.layernorm_eps, token_tile=16, interpret=True,  # overhang: 4*57 % 16 != 0
    ).reshape(n, s, d)
    assert _rel_err(out, ref) < 2e-5


def test_encode_fused_path(setup):
    cfg, params, _ = setup
    pixels = jax.random.normal(
        jax.random.key(2), (4, 3, cfg.image_size, cfg.image_size), jnp.float32
    )
    ref = vit.encode(params, pixels, cfg, fused=False)
    out = vit.encode(params, pixels, cfg, fused=True, interpret=True)
    assert out.shape == ref.shape
    assert _rel_err(out, ref) < 2e-5


def test_fused_mlp_gelu_matches_projector():
    """The in-kernel erf approximation must match exact GELU to ~1e-6."""
    from streamchat_tpu.models import projector

    d_in, d_out = 64, 128
    p = projector.init(jax.random.key(0), d_in, d_out, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (40, d_in), jnp.float32)
    ref = projector.apply(p, x)
    out = fused_ln_mlp(
        x, jnp.ones((d_in,)), jnp.zeros((d_in,)),
        p["fc1"]["w"], p["fc1"]["b"], p["fc2"]["w"], p["fc2"]["b"],
        activation="gelu", layernorm=False, residual=False,
        token_tile=16, interpret=True,
    )
    assert _rel_err(out, ref) < 1e-4


def test_erf_approximation():
    x = jnp.linspace(-4.0, 4.0, 401)
    import scipy.special

    np.testing.assert_allclose(
        np.asarray(_erf(x)), scipy.special.erf(np.asarray(x)), atol=5e-7
    )


def test_use_fused_auto_is_off_on_cpu():
    assert vit._use_fused(None) is False  # CPU test mesh: 8 devices, cpu backend
    assert vit._use_fused(True) is True
    assert vit._use_fused(False) is False


class TestSoftmaxModes:
    """Adversarial numerics for the kernel softmax (ADVICE r4 / VERDICT #6).

    The "clamp" mode's exactness domain is row-max logit in (-87, 80];
    these tests pin each edge against a max-subtract oracle: inside the
    domain clamp == exact == oracle; above 80 clamp flattens to a uniform
    average (finite, no inf/NaN); below the underflow floor clamp returns
    the zero-attention output x + bo (finite, no NaN) while "exact" stays
    correct for ALL inputs.
    """

    D, HEADS, S, N = 16, 2, 12, 2

    def _weights(self, logit_center, logit_spread, key=3):
        """Craft wqkv/biases so attention logits land where we want them.

        Wq = 0 and bq = [c, 0...] make every query the same vector; Wk's
        first column maps LN(x) to a spread of key[0] values around
        bk[0]. Logits_ij = qk^T * dh^-0.5 = c * key_j[0] * dh^-0.5 —
        identical across rows i, centered/spread as requested.
        """
        d, dh = self.D, self.D // self.HEADS
        c = 8.0
        wqkv = np.zeros((d, 3 * d), np.float32)
        bqkv = np.zeros((3 * d,), np.float32)
        for h in range(self.HEADS):
            bqkv[h * dh] = c                       # q = [c, 0, ...] per head
        rng = np.random.default_rng(key)
        for h in range(self.HEADS):
            # key[0] = LN(x) . w + bias: spread via w, center via bias
            wqkv[:, d + h * dh] = rng.normal(0, 1, d) * (
                logit_spread * dh**0.5 / (c * d**0.5))
            bqkv[d + h * dh] = logit_center * dh**0.5 / c
        # v from x (identity), so the attention average is non-trivial
        wqkv[:, 2 * d:] = np.eye(d, dtype=np.float32)
        wo = rng.normal(0, d**-0.5, (d, d)).astype(np.float32)
        bo = rng.normal(0, 0.1, (d,)).astype(np.float32)
        return (jnp.asarray(wqkv), jnp.asarray(bqkv), jnp.asarray(wo),
                jnp.asarray(bo))

    def _x(self):
        return jax.random.normal(
            jax.random.key(7), (self.N, self.S, self.D), jnp.float32)

    def _oracle(self, x, wqkv, bqkv, wo, bo, eps=1e-5):
        """Max-subtract reference in f64-free f32: LN -> QKV -> softmax."""
        d, dh = self.D, self.D // self.HEADS
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
        h = (x - mu) * jax.lax.rsqrt(var + eps)
        qkv = h @ wqkv + bqkv
        outs = []
        for hd in range(self.HEADS):
            q = qkv[..., hd * dh:(hd + 1) * dh] * dh**-0.5
            k = qkv[..., d + hd * dh:d + (hd + 1) * dh]
            v = qkv[..., 2 * d + hd * dh:2 * d + (hd + 1) * dh]
            s_qk = jnp.einsum("nqd,nkd->nqk", q, k)
            outs.append(jnp.einsum(
                "nqk,nkd->nqd", jax.nn.softmax(s_qk, axis=-1), v))
        return x + jnp.concatenate(outs, -1) @ wo + bo

    def _run(self, mode, x, w):
        d = self.D
        return fused_ln_attn(
            x, jnp.ones((d,)), jnp.zeros((d,)), *w,
            num_heads=self.HEADS, softmax_mode=mode, interpret=True)

    def test_in_domain_modes_agree(self):
        x = self._x()
        for center in (-50.0, 0.0, 50.0):          # row max within (-87, 80]
            w = self._weights(center, 10.0)
            ref = self._oracle(x, *w)
            for mode in ("clamp", "exact"):
                assert _rel_err(self._run(mode, x, w), ref) < 2e-5, (
                    mode, center)

    def test_exact_mode_correct_at_extremes(self):
        x = self._x()
        for center in (-200.0, -110.0, 95.0, 140.0):
            w = self._weights(center, 8.0)
            out = self._run("exact", x, w)
            assert _rel_err(out, self._oracle(x, *w)) < 2e-5, center

    def test_clamp_underflow_returns_zero_attention(self):
        """Rows whose max logit sits below the f32 underflow floor: clamp
        degrades to x + bo (zero attention mass, 1e-30 denominator guard) —
        finite, never NaN. Documented divergence; exact mode is the fix."""
        x = self._x()
        w = self._weights(-200.0, 8.0)              # every logit < -150
        out = self._run("clamp", x, w)
        assert bool(jnp.all(jnp.isfinite(out)))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x + w[3]), rtol=1e-5, atol=1e-6)
        # and it genuinely diverges from the true softmax average
        assert _rel_err(out, self._oracle(x, *w)) > 1e-3

    def test_clamp_above_80_flattens_to_uniform(self):
        """All logits above the clamp: weights flatten to a uniform average
        over keys — finite (577·exp(80)·|v| stays under f32 max), wrong
        relative to the true softmax. Documented divergence."""
        x = self._x()
        w = self._weights(140.0, 8.0)               # min logit > 80
        out = self._run("clamp", x, w)
        assert bool(jnp.all(jnp.isfinite(out)))
        # uniform-attention oracle: mean of v over keys
        d, dh = self.D, self.D // self.HEADS
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
        h = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        qkv = h @ w[0] + w[1]
        v = qkv[..., 2 * d:]
        uni = x + jnp.broadcast_to(
            v.mean(axis=1, keepdims=True), v.shape) @ w[2] + w[3]
        assert _rel_err(out, uni) < 2e-5
        assert _rel_err(out, self._oracle(x, *w)) > 1e-3

    def test_folded_preserves_clamp_domain(self):
        """Folded scores arrive in log2 units with the clamp at 80*log2e —
        in NATURAL logit units the exactness domain must be unchanged.
        Check all three regimes against the unfolded kernel: in-domain,
        above the clamp (uniform flatten), and below the underflow floor
        (zero-attention degradation)."""
        x = self._x()
        d = self.D
        for center, mode in [(-50.0, "clamp"), (0.0, "clamp"), (50.0, "clamp"),
                             (140.0, "clamp"), (-200.0, "clamp"),
                             (95.0, "exact"), (-110.0, "exact")]:
            w = self._weights(center, 8.0)
            fw, fb = fold_vit_attn_params(
                jnp.ones((d,)), jnp.zeros((d,)), w[0], w[1],
                num_heads=self.HEADS)
            out = fused_ln_attn(
                x, jnp.ones((d,)), jnp.zeros((d,)), fw, fb, w[2], w[3],
                num_heads=self.HEADS, softmax_mode=mode, folded=True,
                ln_onepass=True, interpret=True)
            ref = self._run(mode, x, w)
            assert bool(jnp.all(jnp.isfinite(out))), (center, mode)
            assert _rel_err(out, ref) < 2e-5, (center, mode)

    def test_bad_mode_raises(self):
        x = self._x()
        w = self._weights(0.0, 5.0)
        with pytest.raises(ValueError, match="softmax_mode"):
            self._run("sloppy", x, w)

    def test_fused_layer_exact_mode(self, setup):
        cfg, params, x = setup
        lp = params["layers"][0]
        wqkv = jnp.concatenate(
            [lp["attn"][k]["w"] for k in ("q", "k", "v")], axis=1)
        bqkv = jnp.concatenate([lp["attn"][k]["b"] for k in ("q", "k", "v")])
        ref = vit._block(x, lp, cfg)
        out = fused_vit_layer(
            x, lp["ln1"]["scale"], lp["ln1"]["bias"], wqkv, bqkv,
            lp["attn"]["o"]["w"], lp["attn"]["o"]["b"],
            lp["ln2"]["scale"], lp["ln2"]["bias"],
            lp["mlp"]["fc1"]["w"], lp["mlp"]["fc1"]["b"],
            lp["mlp"]["fc2"]["w"], lp["mlp"]["fc2"]["b"],
            num_heads=cfg.num_heads, eps=cfg.layernorm_eps,
            frame_tile=2, softmax_mode="exact", interpret=True,
        )
        assert _rel_err(out, ref) < 2e-5


class TestLogitBoundsProbe:
    def test_bounds_shape_and_sanity(self, setup):
        """The one-time checkpoint validation probe for the clamp domain."""
        cfg, params, _ = setup
        pixels = jax.random.normal(
            jax.random.key(5), (2, 3, cfg.image_size, cfg.image_size),
            jnp.float32)
        bounds = vit.attention_logit_bounds(params, pixels, cfg)
        num_blocks = cfg.num_layers + 1 + cfg.select_layer
        assert bounds.shape == (num_blocks, 2)
        assert bool(jnp.all(bounds[:, 0] <= bounds[:, 1]))
        # random-init tiny weights: comfortably inside the clamp domain
        assert float(jnp.max(bounds[:, 1])) < 80.0
        assert float(jnp.min(bounds[:, 0])) > -87.0

    def test_bounds_match_manual_layer0(self, setup):
        cfg, params, _ = setup
        pixels = jax.random.normal(
            jax.random.key(5), (2, 3, cfg.image_size, cfg.image_size),
            jnp.float32)
        bounds = vit.attention_logit_bounds(params, pixels, cfg)
        # recompute layer-0 logits by hand from the embedding
        x = vit._embed_patches(pixels, params["patch_embed"]["w"], cfg)
        cls = jnp.broadcast_to(
            params["class_embed"][None, None, :], (2, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"][None]
        x = vit._layernorm(x, params["pre_ln"]["scale"],
                           params["pre_ln"]["bias"], cfg.layernorm_eps)
        p = params["layers"][0]
        h = vit._layernorm(x, p["ln1"]["scale"], p["ln1"]["bias"],
                           cfg.layernorm_eps)
        n, s, d = h.shape
        dh = d // cfg.num_heads
        q = (h @ p["attn"]["q"]["w"] + p["attn"]["q"]["b"]).reshape(
            n, s, cfg.num_heads, dh)
        k = (h @ p["attn"]["k"]["w"] + p["attn"]["k"]["b"]).reshape(
            n, s, cfg.num_heads, dh)
        s_qk = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                          preferred_element_type=jnp.float32) * dh**-0.5
        np.testing.assert_allclose(
            np.asarray(bounds[0]),
            [float(jnp.min(s_qk)), float(jnp.max(s_qk))], rtol=1e-5)
