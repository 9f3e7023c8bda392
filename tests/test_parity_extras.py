"""Tests for the parity-gap batch: optical flow, uni-modal answering,
PPL scoring, forgetful dialogue memory, feature-space tree search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.config import DecoderConfig, SamplingConfig, ViTConfig
from streamchat_tpu.memory.bank import ForgetfulMemoryBank, MemoryBank, forgetting_curve
from streamchat_tpu.models.longva import LongVA
from streamchat_tpu.ops.optical_flow import (
    compute_gradients,
    flow_magnitude,
    grayscale,
    keep_frames_optical_flow,
)


class TestOpticalFlow:
    def test_gradients_shapes_and_values(self):
        # Vertical edge -> strong Ix, zero Iy.
        img = jnp.zeros((1, 8, 8)).at[:, :, 4:].set(1.0)
        ix, iy = compute_gradients(img)
        assert ix.shape == iy.shape == (1, 8, 8)
        assert float(jnp.max(jnp.abs(ix))) > 0
        assert float(jnp.max(jnp.abs(iy[:, 1:-1]))) == pytest.approx(0.0)

    def test_static_pair_has_zero_flow(self):
        frame = jax.random.uniform(jax.random.key(0), (2, 16, 16))
        mag = flow_magnitude(frame, frame)
        assert np.all(np.asarray(mag) < 1e-3)

    def test_shifted_pair_has_flow(self):
        base = jax.random.uniform(jax.random.key(0), (1, 24, 24))
        shifted = jnp.roll(base, 2, axis=2)
        mag_moving = float(flow_magnitude(base, shifted)[0])
        mag_static = float(flow_magnitude(base, base)[0])
        assert mag_moving > mag_static + 0.01

    def test_keep_mask(self):
        frames = jnp.stack([
            jnp.zeros((16, 16)),
            jnp.zeros((16, 16)),                       # static -> drop
            jnp.roll(jnp.eye(16), 5, axis=1) * 10.0,   # big change -> keep
        ])
        keep = keep_frames_optical_flow(frames, threshold=0.05)
        assert bool(keep[0]) is True
        assert bool(keep[1]) is False

    def test_grayscale_weights(self):
        rgb = jnp.ones((1, 3, 4, 4))
        assert float(grayscale(rgb)[0, 0, 0]) == pytest.approx(0.9999, abs=1e-3)


@pytest.fixture(scope="module")
def tiny_longva():
    dec_cfg = DecoderConfig.tiny()
    return LongVA.init_random(
        jax.random.key(0), ViTConfig.tiny(projection_dim=dec_cfg.hidden_size), dec_cfg
    )


class TestUnimodalAnswer:
    def test_unimodal_path(self, tiny_longva):
        from streamchat_tpu.memory.tree import MemoryTreeNode, VisualMemoryTree
        from streamchat_tpu.pipeline.answer import answer_question_unimodal

        d = tiny_longva.dec_cfg.hidden_size
        tree = VisualMemoryTree(2, 2, lambda t: np.zeros((len(t), 8), np.float32),
                                lambda c: "s", lambda x, k: x[:k])
        child_a = MemoryTreeNode(jnp.ones((2, 4, d)), "a")
        child_b = MemoryTreeNode(jnp.full((2, 4, d), 2.0), "b")
        tree.roots = [MemoryTreeNode(jnp.ones((2, 4, d)), "root", depth=1,
                                     children=[child_a, child_b])]
        short = jax.random.normal(jax.random.key(1), (2, 4, d))
        res = answer_question_unimodal(
            "what?", tiny_longva, short, tree, None,
            SamplingConfig(temperature=0.0, max_answer_tokens_unimodal=4),
        )
        assert isinstance(res.output, str)

    def test_search_features_path_semantics(self):
        """Parent centroids per level + leaf (utiles.py:929-935)."""
        from streamchat_tpu.memory.tree import MemoryTreeNode, VisualMemoryTree

        tree = VisualMemoryTree(2, 2, lambda t: np.zeros((len(t), 8), np.float32),
                                lambda c: "s", lambda x, k: x[:k])
        leaf = MemoryTreeNode(jnp.full((1, 2, 4), 3.0), "leaf")
        other = MemoryTreeNode(jnp.full((1, 2, 4), -3.0), "other")
        root = MemoryTreeNode(jnp.ones((1, 2, 4)), "root", depth=1,
                              children=[other, leaf])
        tree.roots = [root]
        q = jnp.ones((2, 4))
        path = tree.search_features(q)
        assert len(path) == 2
        assert float(path[0][0, 0, 0]) == 1.0   # parent (root) first
        assert float(path[1][0, 0, 0]) == 3.0   # best child (max inner product)


class TestPPLScoring:
    def test_score_matches_manual_logprob(self, tiny_longva):
        nll, ppl = tiny_longva.score_with_image_embedding(
            "describe", "a cat sat"
        )
        assert np.isfinite(nll) and ppl == pytest.approx(np.exp(nll), rel=1e-5)
        # Random tiny model: NLL should be near log(vocab) scale, > 0.
        assert nll > 0

    def test_longer_target_changes_score(self, tiny_longva):
        nll1, _ = tiny_longva.score_with_image_embedding("p", "x")
        nll2, _ = tiny_longva.score_with_image_embedding("p", "x y z longer target")
        assert nll1 != nll2


def hash_embed(texts):
    out = np.zeros((len(texts), 16), np.float32)
    for i, t in enumerate(texts):
        for a, b in zip(t, t[1:]):
            out[i, (ord(a) * 31 + ord(b)) % 16] += 1.0
    return out


class TestForgetfulBank:
    def test_forgetting_curve_monotonic(self):
        assert forgetting_curve(0, 1) == pytest.approx(1.0)
        assert forgetting_curve(10, 1) < forgetting_curve(1, 1)
        # Stronger memories decay slower (the stated model; the reference's
        # operator-precedence bug inverts this).
        assert forgetting_curve(10, 5) > forgetting_curve(10, 1)

    def test_apply_forgetting_purges_old_turns(self, tmp_path):
        bank = MemoryBank(str(tmp_path / "m.json"), hash_embed)
        bank.enter_name("u")
        bank.save_local_memory("u", "old q", "old r", date="2020-01-01")
        bank.save_local_memory("u", "new q", "new r", date="2026-08-16")
        fb = ForgetfulMemoryBank(bank, seed=0)
        forgotten = fb.apply_forgetting("u", "2026-08-16")
        hist = bank.memory["u"]["history"]
        # 6-year-old unrecalled turn is gone with overwhelming probability.
        assert "2020-01-01" not in hist
        assert forgotten >= 1
        # Same-day turn survives (retention = 1 at t=0).
        assert len(hist["2026-08-16"]) == 1

    def test_strengthen_updates_metadata(self, tmp_path):
        bank = MemoryBank(str(tmp_path / "m.json"), hash_embed)
        bank.enter_name("u")
        bank.save_local_memory("u", "q", "r", date="2026-08-01")
        fb = ForgetfulMemoryBank(bank)
        fb.apply_forgetting("u", "2026-08-01")  # annotates metadata
        mid = bank.memory["u"]["history"]["2026-08-01"][0]["memory_id"]
        fb.strengthen("u", [mid], "2026-08-16")
        d = bank.memory["u"]["history"]["2026-08-01"][0]
        assert d["memory_strength"] == 2
        assert d["last_recall_date"] == "2026-08-16"


class TestFullMemoryPrompt:
    META = ("U:{user_name} S:{history_summary} R:{related_memory_content} "
            "P:{personality} B:{boot_actual_name} H:{history_text} D:{memo_dates}")
    META_RELATED = "U:{user_name} R:{related_memory_content} B:{boot_actual_name} D:{memo_dates}"
    NEW_USER = "NEW U:{user_name} B:{boot_actual_name} H:{history_text}"

    def test_full_branch(self):
        from streamchat_tpu.pipeline.prompts import build_full_memory_prompt

        out = build_full_memory_prompt(
            "what now?", "alice",
            {"overall_history": "we cooked", "overall_personality": "curious"},
            ["memo one"], "2026-01-01", self.META, self.NEW_USER,
            history=[{"query": "hi", "response": "hello"}],
        )
        assert "we cooked" in out and "curious" in out and "memo one" in out
        assert "[|User|]: what now?" in out

    def test_related_only_branch(self):
        from streamchat_tpu.pipeline.prompts import build_full_memory_prompt

        out = build_full_memory_prompt(
            "q", "bob", {}, ["memo"], "d", self.META_RELATED, self.NEW_USER,
        )
        assert out.startswith("U:bob")
        assert "memo" in out

    def test_new_user_branch(self):
        from streamchat_tpu.pipeline.prompts import build_full_memory_prompt

        out = build_full_memory_prompt(
            "q", "carol", {}, [], "", self.META_RELATED, self.NEW_USER,
        )
        assert out.startswith("NEW U:carol")
        assert "[|User|]: q" in out
