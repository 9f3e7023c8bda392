"""End-to-end pipeline test: synthetic video -> tiny models -> results JSON.

The golden-file integration test the reference never had (SURVEY.md §4d):
drives the full streaming loop — ingest, memory formation, tree growth,
dialogue memory write-back/retrieval, KV-cached answering, result sink —
with tiny random checkpoints on the CPU mesh.
"""

import dataclasses
import json

import jax
import pytest

from streamchat_tpu.config import (
    BertConfig,
    DecoderConfig,
    MemoryConfig,
    PipelineConfig,
    SamplingConfig,
    VideoConfig,
    ViTConfig,
)
from streamchat_tpu.memory.bank import MemoryBank
from streamchat_tpu.models.embedder import TextEmbedder
from streamchat_tpu.models.longva import LongVA
from streamchat_tpu.pipeline.runner import StreamChatPipeline
from streamchat_tpu.video.reader import SyntheticVideoReader


@pytest.fixture(scope="module")
def tiny_pipeline():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    dec_cfg = DecoderConfig.tiny()
    model = LongVA.init_random(
        k1, ViTConfig.tiny(projection_dim=dec_cfg.hidden_size), dec_cfg
    )
    cfg = PipelineConfig(
        memory=MemoryConfig(
            chunk_size=8, num_clusters=2, interval=2,
            short_window=6, remember_window=3, tau=5.0,
        ),
        sampling=SamplingConfig(
            temperature=0.0,
            max_answer_tokens=4, max_caption_tokens=4, max_summary_tokens=4,
        ),
        video=VideoConfig(sample_rate=0.5, image_size=56),
    )
    tree_emb = TextEmbedder.init_random(k2, BertConfig.tiny())
    bank_emb = TextEmbedder.init_random(
        k3, dataclasses.replace(BertConfig.tiny(), pooling="mean")
    )
    return StreamChatPipeline(model, tree_emb, bank_emb, cfg)


BREAKPOINTS = [
    {"question": "What is happening?", "answer": "a scene", "class": "OCP", "time": 2},
    {"question": "What changed since before?", "answer": "colors", "class": "CT", "time": 4},
]


def test_process_video_end_to_end(tiny_pipeline, tmp_path):
    reader = SyntheticVideoReader(total_frames=150, frame_rate=30.0, height=56, width=56)
    bank = MemoryBank(
        str(tmp_path / "memory_0.json"),
        lambda t: tiny_pipeline.bank_embedder.embed(t),
    )
    save_file = str(tmp_path / "results.json")
    results = tiny_pipeline.process_video(
        reader, BREAKPOINTS, bank, user_name="User", save_file=save_file
    )

    assert len(results) == 2
    for rec, bp in zip(results, BREAKPOINTS):
        assert rec["question"] == bp["question"]
        assert rec["label"] == bp["answer"]
        assert rec["class"] == bp["class"]
        assert isinstance(rec["predict"], str)
        assert rec["process_time"] >= 0
    # Result sink format matches the reference (:657).
    stored = json.load(open(save_file, encoding="utf-8"))
    assert stored == results
    # Second breakpoint's answer time stamp is the segment end.
    assert stored[1]["time"] == 4

    # Dialogue memory was written back per round (schema check).
    mem = json.load(open(tmp_path / "memory_0.json", encoding="utf-8"))
    turns = sum(len(v) for v in mem["User"]["history"].values())
    assert turns == 2

    # Long-term tree grew (30 frames/segment at sample_rate 0.5 -> 15
    # sampled frames/segment, chunk_size 8 -> chunks formed; interval 2 ->
    # summarize/merge fired). process_video exposes the final tree handle.
    tree = tiny_pipeline.last_tree
    assert len(tree) >= 1, "visual memory tree never grew"
    # Every root carries a searchable cached caption embedding (captions
    # themselves may be empty strings under tiny random weights — greedy
    # decode can emit EOS immediately).
    assert all(n.emb is not None for n in tree.roots)
    # 2 segments x 15 sampled frames / chunk_size 8 = 4 chunks entered;
    # interval 2 means a merge fired, so roots < chunks while total content
    # (merged subtrees included) accounts for all 4.
    def _count(nodes):
        return sum(1 + _count(n.children) for n in nodes)
    assert _count(tree.roots) >= 4
    assert any(n.depth > 0 for n in tree.roots), "no summarize-merge fired"
    feats, texts = tree.search(tiny_pipeline.embed_query("what happened?"))
    assert feats and texts

    # Phase attribution is persisted for artifacts (ingest / memory_update /
    # answer, with captioning split out as a subset of memory_update).
    totals = tiny_pipeline.last_phase_totals
    assert {"ingest", "memory_update", "answer", "caption"} <= set(totals)
    assert totals["caption"] <= totals["memory_update"] + 1e-6
    assert tiny_pipeline.last_phase_counts["answer"] == 2


def test_runner_cli_smoke(tiny_pipeline, tmp_path, monkeypatch):
    """Exercise run_inference + flag parsing with a synthetic annotation."""
    import numpy as np

    from streamchat_tpu.pipeline import runner as runner_mod

    anno = [{
        "info": {"video_path": "v.mp4", "class_1": "Ego"},
        "breakpoint": BREAKPOINTS[:1],
    }]
    ann_path = tmp_path / "annotations.json"
    ann_path.write_text(json.dumps(anno))
    video_dir = tmp_path / "videos"
    (video_dir / "Ego").mkdir(parents=True)
    (video_dir / "Ego" / "v.mp4").write_bytes(b"")

    monkeypatch.setattr(
        runner_mod, "open_video",
        lambda path: SyntheticVideoReader(
            total_frames=90, frame_rate=30.0, height=56, width=56
        ),
    )
    args = runner_mod.parse_args([
        "--video_dir", str(video_dir),
        "--annotations", str(ann_path),
        "--memory_basic_dir", str(tmp_path / "memories"),
        "--save_file", str(tmp_path / "out.json"),
        "--sample_rate", "0.5",
        "--chunk_size", "8",
    ])
    runner_mod.run_inference(tiny_pipeline, args)

    out = json.load(open(tmp_path / "out.json", encoding="utf-8"))
    assert len(out) == 1
    assert out[0]["question"] == BREAKPOINTS[0]["question"]
    assert (tmp_path / "memories" / "memory_0.json").exists()


def test_prefetch_reader_roundtrip():
    """Prefetched indices return identical frames to direct reads."""
    import numpy as np

    from streamchat_tpu.video.reader import PrefetchReader

    base = SyntheticVideoReader(total_frames=60, height=8, width=8)
    pre = PrefetchReader(base)
    idx = [0, 5, 10]
    direct = base.read_frames(idx)
    pre.schedule(idx)
    fetched = pre.read_frames(idx)
    assert np.array_equal(direct, fetched)
    # Unscheduled indices fall through to the wrapped reader.
    other = pre.read_frames([1, 2])
    assert np.array_equal(other, base.read_frames([1, 2]))
    pre.stop()


def test_phase_timer():
    import time as _time

    from streamchat_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        _time.sleep(0.01)
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert t.totals["a"] >= 0.01
    assert t.mean("a") > 0


def test_process_video_online(tiny_pipeline, tmp_path):
    """on_line mode: StreamingSession-backed concurrent memory updates."""
    reader = SyntheticVideoReader(total_frames=150, frame_rate=30.0, height=56, width=56)
    bank = MemoryBank(
        str(tmp_path / "memory_online.json"),
        lambda t: tiny_pipeline.bank_embedder.embed(t),
    )
    results = tiny_pipeline.process_video_online(
        reader, BREAKPOINTS, bank, user_name="User",
        save_file=str(tmp_path / "online.json"),
    )
    assert len(results) == 2
    assert all(isinstance(r["predict"], str) for r in results)
    # Tree persisted for inspection; grew across segments.
    assert len(tiny_pipeline.last_tree) >= 1


def _fresh_pipeline(cfg_kw=None, sampling_kw=None, memory_kw=None):
    """Independent pipeline with a fixed seed (fixture shares key state)."""
    from streamchat_tpu.config import PipelineConfig

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    dec_cfg = DecoderConfig.tiny()
    model = LongVA.init_random(
        k1, ViTConfig.tiny(projection_dim=dec_cfg.hidden_size), dec_cfg
    )
    cfg = PipelineConfig(
        memory=MemoryConfig(
            chunk_size=8, num_clusters=2, interval=2,
            short_window=6, remember_window=3, tau=5.0,
            **(memory_kw or {}),
        ),
        sampling=SamplingConfig(
            temperature=0.0, caption_temperature=0.0,
            max_answer_tokens=4, max_caption_tokens=4, max_summary_tokens=4,
            **(sampling_kw or {}),
        ),
        video=VideoConfig(sample_rate=0.1, image_size=56),
        **(cfg_kw or {}),
    )
    tree_emb = TextEmbedder.init_random(k2, BertConfig.tiny())
    bank_emb = TextEmbedder.init_random(
        k3, dataclasses.replace(BertConfig.tiny(), pooling="mean")
    )
    return StreamChatPipeline(model, tree_emb, bank_emb, cfg)


def test_online_matches_offline_first_round(tmp_path):
    """At temperature 0, in the regime where on_line and off_line semantics
    coincide (first breakpoint: the persistent FIFO equals the per-segment
    window; partial chunks skip k-means so no PRNG is consumed), the two
    modes must produce the SAME answer (VERDICT r1 item 9)."""
    bp = [{"question": "What is happening?", "answer": "x", "class": "OCP",
           "time": 1}]
    outs = {}
    for mode in ("off_line", "on_line"):
        pipe = _fresh_pipeline()
        reader = SyntheticVideoReader(
            total_frames=40, frame_rate=30.0, height=56, width=56
        )
        bank = MemoryBank(
            str(tmp_path / f"mem_{mode}.json"),
            lambda t: pipe.bank_embedder.embed(t),
        )
        process = (
            pipe.process_video_online if mode == "on_line"
            else pipe.process_video
        )
        results = process(reader, bp, bank, user_name="User")
        assert len(results) == 1
        outs[mode] = results[0]["predict"]
    assert outs["off_line"] == outs["on_line"]


def test_ppl_flag_persists_label_scores(tmp_path):
    """--ppl: records carry finite nll/ppl of the ground-truth answer."""
    import math

    pipe = _fresh_pipeline(cfg_kw={"ppl": True})
    reader = SyntheticVideoReader(total_frames=90, frame_rate=30.0,
                                  height=56, width=56)
    bank = MemoryBank(
        str(tmp_path / "mem_ppl.json"), lambda t: pipe.bank_embedder.embed(t)
    )
    save = str(tmp_path / "res_ppl.json")
    results = pipe.process_video(reader, BREAKPOINTS[:1], bank,
                                 user_name="User", save_file=save)
    rec = results[0]
    assert math.isfinite(rec["nll"]) and rec["nll"] > 0
    assert rec["ppl"] == pytest.approx(math.exp(rec["nll"]), rel=1e-5)
    stored = json.load(open(save, encoding="utf-8"))
    assert stored[0]["ppl"] == rec["ppl"]


def test_unimodal_dispatch(tmp_path):
    """multi_modal_memory=False routes through answer_question_unimodal."""
    from streamchat_tpu.pipeline import answer as answer_mod

    pipe = _fresh_pipeline(cfg_kw={"multi_modal_memory": False})
    reader = SyntheticVideoReader(total_frames=90, frame_rate=30.0,
                                  height=56, width=56)
    bank = MemoryBank(
        str(tmp_path / "mem_uni.json"), lambda t: pipe.bank_embedder.embed(t)
    )
    called = []
    orig = answer_mod.answer_question_unimodal

    def spy(*a, **kw):
        called.append(1)
        return orig(*a, **kw)

    import streamchat_tpu.pipeline.runner as runner_mod
    old = runner_mod.answer_question_unimodal
    runner_mod.answer_question_unimodal = spy
    try:
        results = pipe.process_video(reader, BREAKPOINTS[:1], bank,
                                     user_name="User")
    finally:
        runner_mod.answer_question_unimodal = old
    assert called and len(results) == 1


def test_num_beams_rejected():
    """Beam search is unimplemented: num_beams>1 must fail loudly, not decode
    greedily in silence (VERDICT r1 item 5)."""
    with pytest.raises(NotImplementedError, match="num_beams"):
        SamplingConfig(num_beams=4)


def test_batched_captioning_matches_sequential(tmp_path):
    """caption_batch > 1 routes chunks through one batched generate and, at
    temperature 0, produces the same captions (hence the same tree) as the
    reference's sequential path."""
    pipe_seq = _fresh_pipeline()
    pipe_bat = _fresh_pipeline(sampling_kw={"caption_batch": 4})
    import numpy as np

    from streamchat_tpu.pipeline.memory_update import update_memory

    feats = jax.random.normal(
        jax.random.key(5),
        (20, 4, pipe_seq.model.dec_cfg.hidden_size),  # tiny "patches"
    )
    outs = []
    for pipe in (pipe_seq, pipe_bat):
        tree = pipe.new_tree()
        tree, short = update_memory(
            feats, tree, pipe._caption, pipe.cfg.memory, jax.random.key(9),
        )
        outs.append(([n.text for n in tree.roots], np.asarray(short)))
    assert outs[0][0] == outs[1][0], "batched captions diverge from sequential"
    np.testing.assert_allclose(outs[0][1], outs[1][1])


def test_update_memory_box_pass_and_offload(tmp_path):
    """Box-passed features are popped (caller frame releases the stack) and
    offload_chunks parks raw chunks on host without changing the result."""
    import dataclasses

    import numpy as np

    from streamchat_tpu.pipeline.memory_update import update_memory

    pipe = _fresh_pipeline()
    feats = jax.random.normal(
        jax.random.key(5), (20, 4, pipe.model.dec_cfg.hidden_size)
    )

    tree_a = pipe.new_tree()
    tree_a, short_a = update_memory(
        feats, tree_a, pipe._caption, pipe.cfg.memory, jax.random.key(9),
    )

    seen = []

    def spy_caption(chunk):
        seen.append(chunk)
        return pipe._caption(np.asarray(chunk))

    box = [feats]
    off_cfg = dataclasses.replace(pipe.cfg.memory, offload_chunks=True)
    tree_b = pipe.new_tree()
    tree_b, short_b = update_memory(
        box, tree_b, spy_caption, off_cfg, jax.random.key(9),
    )
    assert box == [], "box-passed features must be popped by update_memory"
    # Offloaded chunks are parked on host but RE-STAGED to device (double-
    # buffered device_put) before the captioner sees them: the captioner
    # must receive device arrays, never raw numpy.
    assert all(isinstance(c, jax.Array) for c in seen), (
        "captioner must receive device-staged chunks under offload")
    assert [n.text for n in tree_a.roots] == [n.text for n in tree_b.roots]
    np.testing.assert_allclose(np.asarray(short_a), np.asarray(short_b))
