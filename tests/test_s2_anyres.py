"""S2 multiscale tower + anyres preprocessing tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.config import ViTConfig
from streamchat_tpu.models import vit


class TestS2:
    def test_multiscale_shapes_and_base_scale(self, key):
        cfg = ViTConfig.tiny()  # base 56, 16 patches, hidden 64
        params = vit.init(key, cfg, jnp.float32)
        pixels = jax.random.normal(jax.random.key(1), (2, 3, 56, 56))
        out = vit.encode_s2(params, pixels, cfg, scales=(56, 112))
        assert out.shape == (2, cfg.num_patches, cfg.hidden_size * 2)
        # First half of channels = plain base-scale encode.
        base = vit.encode(params, pixels, cfg)
        np.testing.assert_allclose(
            np.asarray(out[..., : cfg.hidden_size]), np.asarray(base), atol=1e-5
        )

    def test_rejects_non_multiple_scale(self, key):
        cfg = ViTConfig.tiny()
        params = vit.init(key, cfg, jnp.float32)
        with pytest.raises(ValueError):
            vit.encode_s2(params, jnp.zeros((1, 3, 56, 56)), cfg, scales=(56, 100))


class TestAnyRes:
    def test_select_best_resolution(self):
        from streamchat_tpu.pipeline.anyres import select_best_resolution

        # A wide image prefers a wide grid.
        best = select_best_resolution((672, 336), [[336, 336], [672, 336], [336, 672]])
        assert best == (672, 336)

    def test_parse_pinpoint_range(self):
        from streamchat_tpu.pipeline.anyres import parse_grid_pinpoints

        pins = parse_grid_pinpoints("(1x1)...(2x2)", 336)
        assert [336, 336] in [list(p) for p in pins]
        assert [672, 672] in [list(p) for p in pins]
        assert len(pins) == 4

    def test_process_anyres_image(self):
        from streamchat_tpu.pipeline.anyres import (
            get_anyres_image_grid_shape,
            process_anyres_image,
        )

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (100, 200, 3), np.uint8)
        out = process_anyres_image(img, [[112, 56], [56, 112]], base_size=56)
        # (112, 56) wins for a wide image: 2x1 tiles + 1 overview.
        assert out.shape == (3, 3, 56, 56)
        assert get_anyres_image_grid_shape((200, 100), [[112, 56], [56, 112]], 56) == (2, 1)
