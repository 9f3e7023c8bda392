"""Cross-benchmark LongVA baseline runners (pipeline/bench_runners.py):
ActivityNet-QA-style videoqa, Video-Bench MC, SEED-Bench v2 PPL ranking.

Parity targets: test_other_models/act/inference_act_longva.py,
test_other_models/video_bench/inference_video_bench_longva.py,
test_other_models/seed_bench/inference_seed_bench_v2_longva.py.
"""

import argparse
import json

import jax
import numpy as np
import pytest

from streamchat_tpu.pipeline.bench_runners import (
    contiguous_chunk,
    filter_seed_questions,
    format_mc_question,
    resolve_video_path,
    seed_type_accuracy,
)


@pytest.fixture(scope="module")
def tiny_model():
    from streamchat_tpu.config import DecoderConfig, ViTConfig
    from streamchat_tpu.models.longva import LongVA

    dec = DecoderConfig.tiny()
    return LongVA.init_random(
        jax.random.key(0), ViTConfig.tiny(projection_dim=dec.hidden_size), dec
    )


def _write_video(path, frames=12, size=56):
    cv2 = pytest.importorskip("cv2")
    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (size, size)
    )
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(frames):
        w.write(rng.integers(0, 255, (size, size, 3), np.uint8))
    w.release()


class TestHelpers:
    def test_contiguous_chunk(self):
        # Reference get_chunk: ceil split, so 5 items over 2 chunks = 3+2.
        lst = list(range(5))
        assert contiguous_chunk(lst, 2, 0) == [0, 1, 2]
        assert contiguous_chunk(lst, 2, 1) == [3, 4]
        assert contiguous_chunk(lst, 1, 0) == lst

    def test_resolve_video_path(self, tmp_path):
        (tmp_path / "v_abc.webm").write_bytes(b"x")
        assert resolve_video_path(str(tmp_path), "abc").endswith("v_abc.webm")
        assert resolve_video_path(str(tmp_path), "nope") is None

    def test_format_mc_question_four_choices_verbatim(self):
        # Byte-exact against the reference f-string (video_bench:172-175).
        choices = {"A": "a1", "B": "b2", "C": "c3", "D": "d4"}
        q, cands = format_mc_question("What?", choices)
        expected = (
            "What? A.a1 B.b2 C.c3 D.d4 \n Among the four options A, B, C, D "
            "above, the one closest to the correct answer is:"
        )
        assert q == expected
        assert cands == ["A", "B", "C", "D"]

    def test_format_mc_question_six_choices_verbatim(self):
        # The 6-choice branch glues "Choices:" straight on (:163-166).
        choices = {k: k.lower() for k in "ABCDEF"}
        q, cands = format_mc_question("Q", choices)
        expected = (
            "QChoices: A.a B.b C.c D.d E.e F.f \n Among the six options "
            "A, B, C, D, E, F above, the one closest to the correct "
            "answer is:"
        )
        assert q == expected
        assert cands == list("ABCDEF")

    def test_format_mc_question_trailing_space_quirks(self):
        # 5/3/2-choice branches end "is: " (trailing space), 4/6 end "is:".
        five = {k: k for k in "ABCDE"}
        assert format_mc_question("q", five)[0].endswith("is: ")
        two = {k: k for k in "AB"}
        assert format_mc_question("q", two)[0].endswith("is: ")
        with pytest.raises(ValueError):
            format_mc_question("q", {"A": "only"})


class TestSeedFilters:
    ITEMS = [
        {"level": lv, "subpart": sp, "version": v}
        for lv in ("L1", "L2", "L3")
        for sp in ("Single-Image & Text Comprehension", "Image Generation")
        for v in ("v1", "v2")
    ]

    def test_levels_cumulative(self):
        assert all(
            q["level"] == "L1"
            for q in filter_seed_questions(self.ITEMS, level="L1")
        )
        l2 = filter_seed_questions(self.ITEMS, level="L2")
        assert {q["level"] for q in l2} == {"L1", "L2"}
        l3 = filter_seed_questions(self.ITEMS, level="L3")
        assert {q["level"] for q in l3} == {"L1", "L2", "L3"}

    def test_subpart_and_version(self):
        out = filter_seed_questions(
            self.ITEMS, level="L3", subpart="Image Generation", version="v1"
        )
        assert out and all(
            q["subpart"] == "Image Generation" and q["version"] == "v1"
            for q in out
        )

    def test_invalid_args_raise(self):
        with pytest.raises(ValueError):
            filter_seed_questions(self.ITEMS, level="L9")
        with pytest.raises(ValueError):
            filter_seed_questions(self.ITEMS, subpart="nope")
        with pytest.raises(ValueError):
            filter_seed_questions(self.ITEMS, version="v3")

    def test_type_accuracy_zero_correct_type(self):
        # The reference KeyErrors when a type has zero correct (:213).
        records = [
            {"prediction": "A", "gt": "A", "q_type_id": 1},
            {"prediction": "B", "gt": "C", "q_type_id": 2},
            {"prediction": "D", "gt": "C", "q_type_id": 2},
        ]
        s = seed_type_accuracy(records)
        assert s["per_type"] == {1: 1.0, 2: 0.0}
        assert s["total"] == pytest.approx(1 / 3)
        assert seed_type_accuracy([])["total"] == 0.0


class TestRunners:
    def test_videoqa_rows_and_chunking(self, tmp_path, tiny_model):
        from streamchat_tpu.pipeline.bench_runners import run_videoqa

        _write_video(tmp_path / "v_vid0.mp4")
        gt = [
            {"video_name": "vid0", "question": "what?", "answer": "a",
             "question_id": "q0"},
            {"video_name": "vid0", "question": "when?", "answer": "b",
             "question_id": "q1"},
        ]
        gt_file = tmp_path / "gt.json"
        gt_file.write_text(json.dumps(gt))
        args = argparse.Namespace(
            video_dir=str(tmp_path), gt_file_question=str(gt_file),
            output_dir=str(tmp_path / "out"), output_name="preds",
            video_prefix="v_", num_chunks=2, chunk_idx=0, num_frame=4,
            temperature=0.0, max_new_tokens=4,
        )
        rows = run_videoqa(tiny_model, args)
        # Contiguous ceil-split: chunk 0 of 2 gets only the first sample.
        assert len(rows) == 1
        lines = [json.loads(l) for l in
                 (tmp_path / "out" / "preds.json").read_text().splitlines()]
        assert lines == rows
        assert list(rows[0]) == ["id", "question", "answer", "pred"]
        assert rows[0]["id"] == "q0" and isinstance(rows[0]["pred"], str)

    def test_videobench_eval_schema(self, tmp_path, tiny_model):
        from streamchat_tpu.pipeline.bench_runners import run_videobench

        qa_root = tmp_path / "qa"
        (qa_root / "Eval_QA").mkdir(parents=True)
        vid_root = tmp_path / "videos"
        vid_root.mkdir()
        _write_video(vid_root / "clip.mp4")
        (qa_root / "Eval_QA" / "MSVD_QA_new.json").write_text(json.dumps({
            "msvd_1": {
                "video_id": "clip", "vid_path": "clip.mp4",
                "question": "what is shown?",
                "choices": {"A": "x", "B": "y", "C": "z", "D": "w"},
            },
        }))
        args = argparse.Namespace(
            eval_qa_root=str(qa_root), eval_video_root=str(vid_root),
            output_dir=str(tmp_path / "out"), datasets=["MSVD"],
            num_frame=4, temperature=0.0, max_new_tokens=4,
        )
        results = run_videobench(tiny_model, args)
        saved = json.loads((tmp_path / "out" / "MSVD_eval.json").read_text())
        assert saved == results["MSVD"]
        rec = saved["msvd_1"]
        assert set(rec) == {"video_id", "question", "output_sequence"}
        assert "Among the four options" in rec["question"]

    def test_seedbench_scores_candidates(self, tmp_path, tiny_model):
        cv2 = pytest.importorskip("cv2")
        from streamchat_tpu.pipeline.bench_runners import run_seedbench

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        for name in ("a.png", "b.png"):
            cv2.imwrite(str(img_dir / name),
                        rng.integers(0, 255, (48, 48, 3), np.uint8))
        anno = {"questions": [
            {"question_id": "s0", "question": "<img>what?",
             "choice_a": "cat", "choice_b": "a dog runs", "choice_c": "sky",
             "choice_d": "two people talk", "answer": "A",
             "question_type_id": 7, "data_source": "SEED-Bench v2",
             "data_id": "a.png", "level": "L1",
             "subpart": "Single-Image & Text Comprehension", "version": "v2"},
            {"question_id": "s1", "question": "order?",
             "choice_a": "one", "choice_b": "two", "choice_c": "three",
             "choice_d": "four", "answer": "B", "question_type_id": 8,
             "data_source": "cc3m", "data_id": ["a.png", "b.png"],
             "level": "L2",
             "subpart": "Multiple-Images & Text Comprehension",
             "version": "v2"},
        ]}
        anno_path = tmp_path / "anno.json"
        anno_path.write_text(json.dumps(anno))
        args = argparse.Namespace(
            anno_path=str(anno_path), output_dir=str(tmp_path / "out"),
            cc3m_dir=str(img_dir), seed_bench_dir=str(img_dir),
            evaluate_level="L2", evaluate_part="all", evaluate_version="v2",
            num_frame=4, temperature=0.0, max_new_tokens=4,
        )
        summary = run_seedbench(tiny_model, args)
        assert summary["count"] == 2
        rows = [json.loads(l) for l in
                (tmp_path / "out" / "results_longva.json")
                .read_text().splitlines()]
        assert len(rows) == 2
        assert set(rows[0]) == {"question_id", "prediction", "gt", "q_type_id"}
        assert all(r["prediction"] in "ABCD" for r in rows)
        # Random tiny weights: the ranking itself is arbitrary, but it must
        # come from candidate-text NLLs (the reference never scored the
        # candidate text at all — see module docstring).

    def test_videoqa_judge_scoring_chain(self, tmp_path, tiny_model):
        """The same 3-stage chain the reference runs on these rows:
        videoqa rows -> judge --format generic
        (eval_video_qa_with_llama3_others.py) -> score aggregation."""
        from streamchat_tpu.eval.judge import judge_predictions
        from streamchat_tpu.eval.scoring import aggregate_scores
        from streamchat_tpu.pipeline.bench_runners import run_videoqa

        _write_video(tmp_path / "v_vid0.mp4")
        gt_file = tmp_path / "gt.json"
        gt_file.write_text(json.dumps([
            {"video_name": "vid0", "question": "what?", "answer": "a",
             "question_id": "q0"},
        ]))
        args = argparse.Namespace(
            video_dir=str(tmp_path), gt_file_question=str(gt_file),
            output_dir=str(tmp_path / "out"), output_name="preds",
            video_prefix="v_", num_chunks=1, chunk_idx=0, num_frame=4,
            temperature=0.0, max_new_tokens=4,
        )
        rows = run_videoqa(tiny_model, args)
        judged = judge_predictions(
            rows, lambda p: "{'llama_pred': 'yes', 'score': 4.0}",
            fmt="generic",
        )
        scores = aggregate_scores(judged)
        assert scores["Yes count"] == 1 and scores["Accuracy"] == 1.0

    def test_seedbench_bad_source_raises(self, tmp_path, tiny_model):
        from streamchat_tpu.pipeline.bench_runners import run_seedbench

        anno_path = tmp_path / "anno.json"
        anno_path.write_text(json.dumps([{
            "question_id": "s0", "question": "q", "choice_a": "a",
            "choice_b": "b", "choice_c": "c", "choice_d": "d",
            "answer": "A", "question_type_id": 1, "data_source": "other",
            "data_id": "x.png", "level": "L1",
            "subpart": "Single-Image & Text Comprehension", "version": "v2",
        }]))
        args = argparse.Namespace(
            anno_path=str(anno_path), output_dir=str(tmp_path / "out"),
            cc3m_dir="", seed_bench_dir="", evaluate_level="L2",
            evaluate_part="all", evaluate_version="v2",
            num_frame=4, temperature=0.0, max_new_tokens=4,
        )
        with pytest.raises(ValueError, match="not valid"):
            run_seedbench(tiny_model, args)
