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
