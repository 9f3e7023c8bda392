"""Tests for curation tools and the memory-free baseline runner."""

import json

import jax
import numpy as np
import pytest

from streamchat_tpu.tools.streambench import (
    annotation_stats,
    check_videos,
    resample_by_category,
)

ANNOS = [
    {"info": {"video_path": f"v{i}.mp4", "class_1": cat,
              "class_2": sub},
     "breakpoint": [
         {"question": "q", "answer": "a", "class": "OCP", "time": 5},
         {"question": "q2", "answer": "a2", "class": "CT", "time": 9},
     ]}
    for i, (cat, sub) in enumerate([
        ("Ego", "Cooking"), ("Ego", "Cooking"), ("Ego", "Room-Tour"),
        ("Movie", "Drama"), ("Movie", "Action"), ("Web", "Show"),
    ])
]


class TestTools:
    def test_stats(self):
        s = annotation_stats(ANNOS)
        assert s["num_videos"] == 6
        assert s["num_questions"] == 12
        assert s["question_classes"] == {"OCP": 6, "CT": 6}
        assert s["categories"] == {"Ego": 3, "Movie": 2, "Web": 1}
        assert s["video_seconds"]["max"] == 9

    def test_resample_balanced_and_deterministic(self):
        a = resample_by_category(ANNOS, per_category=2, seed=1)
        b = resample_by_category(ANNOS, per_category=2, seed=1)
        assert [x["info"]["video_path"] for x in a] == [
            x["info"]["video_path"] for x in b
        ]
        cats = [x["info"]["class_1"] for x in a]
        assert cats.count("Ego") == 2 and cats.count("Movie") == 2 and cats.count("Web") == 1

    def test_check_videos_missing(self, tmp_path):
        bad = check_videos(ANNOS[:2], str(tmp_path))
        assert len(bad) == 2

    def test_cli_stats_and_resample(self, tmp_path, capsys):
        from streamchat_tpu.tools import streambench

        ann = tmp_path / "a.json"
        ann.write_text(json.dumps(ANNOS))
        streambench.main(["stats", "--annotations", str(ann)])
        out = json.loads(capsys.readouterr().out)
        assert out["num_videos"] == 6

        dst = tmp_path / "sampled.json"
        streambench.main([
            "resample", "--annotations", str(ann),
            "--per_category", "1", "--output", str(dst),
        ])
        assert len(json.loads(dst.read_text())) == 3

    def test_stats_subclass_nesting(self):
        s = annotation_stats(ANNOS)
        assert s["subclasses"]["Ego"] == {"Cooking": 2, "Room-Tour": 1}
        assert s["subclasses"]["Movie"] == {"Drama": 1, "Action": 1}
        assert s["video_seconds"]["per_video"] == [9] * 6

    def test_distribution_plots(self, tmp_path):
        """Reference parity: tools/static.py histogram + pie,
        draw_sun_pic.py sunburst — computed values and PNG artifacts."""
        from streamchat_tpu.tools.visualize import (
            plot_category_sunburst,
            plot_class_pie,
            plot_duration_histogram,
        )

        s = annotation_stats(ANNOS)
        counts = plot_duration_histogram(
            s["video_seconds"]["per_video"], str(tmp_path / "h.png"), bins=4)
        assert counts.sum() == 6
        frac = plot_class_pie(s["question_classes"], str(tmp_path / "p.png"))
        assert frac == {"CT": 0.5, "OCP": 0.5}
        totals = plot_category_sunburst(
            s["subclasses"], str(tmp_path / "s.png"))
        assert totals == {"Ego": 3, "Movie": 2, "Web": 1}

    def test_cli_plots(self, tmp_path, capsys):
        from streamchat_tpu.tools import streambench

        ann = tmp_path / "a.json"
        ann.write_text(json.dumps(ANNOS))
        streambench.main([
            "plots", "--annotations", str(ann), "--out_dir", str(tmp_path),
        ])
        out = json.loads(capsys.readouterr().out)
        import os

        written = [p for p in out["wrote"] if os.path.exists(p)]
        # matplotlib present in this environment -> all three PNGs land
        assert len(written) == len(out["wrote"]) == 3


class TestExtractFrames:
    def test_extract_frames_interval_and_layout(self, tmp_path, capsys):
        """Port of ego_data.py: fps-based interval extraction into
        output_folder/<video_name>/ (the reference's write loop is dead
        code upstream; here it writes indexed jpgs)."""
        cv2 = pytest.importorskip("cv2")
        from streamchat_tpu.tools import streambench

        path = tmp_path / "clip.mp4"
        w = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (64, 64))
        assert w.isOpened()
        rng = np.random.default_rng(0)
        for _ in range(90):  # 3 s at 30 fps
            w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
        w.release()

        out_dir = tmp_path / "frames"
        streambench.main([
            "extract-frames", "--video", str(path),
            "--output_folder", str(out_dir), "--fps", "1",
        ])
        out = json.loads(capsys.readouterr().out)
        # interval = int(30/1) = 30 -> frames 0, 30, 60 extracted
        assert out["extracted_frames"] == 3
        assert out["total_frames"] == 90
        assert out["duration"] == "00:00:03"
        files = sorted((out_dir / "clip").iterdir())
        assert [f.name for f in files] == [
            "frame_000000.jpg", "frame_000001.jpg", "frame_000002.jpg"]

    def test_extract_frames_limit_and_bad_path(self, tmp_path):
        from streamchat_tpu.tools.streambench import extract_frames

        pytest.importorskip("cv2")
        with pytest.raises(ValueError, match="cannot open"):
            extract_frames(str(tmp_path / "nope.mp4"), str(tmp_path))


class TestBaseline:
    def test_uniform_indices(self):
        from streamchat_tpu.pipeline.baseline import uniform_indices

        idx = uniform_indices(100, 5, end_frame=50)
        assert idx[0] == 0 and idx[-1] == 49 and len(idx) == 5

    def test_ego_mode_schema_and_split(self, tmp_path):
        """Ego mode (reference inference_ego_streaming_longva.py): JSONL
        records with the reference sample_set keys, whole-video sampling,
        contiguous annotation split."""
        cv2 = pytest.importorskip("cv2")
        from streamchat_tpu.pipeline import baseline

        video_dir = tmp_path / "videos" / "Ego"
        video_dir.mkdir(parents=True)
        for name in ("v0.mp4", "v1.mp4"):
            w = cv2.VideoWriter(
                str(video_dir / name), cv2.VideoWriter_fourcc(*"mp4v"),
                30.0, (64, 64),
            )
            assert w.isOpened()
            rng = np.random.default_rng(0)
            for i in range(40):
                w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
            w.release()
        annos = [
            {"info": {"video_path": f"v{i}.mp4", "class_1": "Ego"},
             "breakpoint": [
                 {"question": "what?", "answer": "a", "class": "OCP", "time": 1},
             ]}
            for i in range(2)
        ]
        ann = tmp_path / "a.json"
        ann.write_text(json.dumps(annos))
        save = tmp_path / "ego_preds.json"
        # Contiguous ceil-split: chunk 0 of 2 gets only the FIRST video.
        baseline.main([
            "--video_dir", str(tmp_path / "videos"),
            "--annotations", str(ann),
            "--save_file", str(save),
            "--num_frame", "4",
            "--max_new_tokens", "4",
            "--num_chunks", "2", "--chunk_idx", "0",
            "--ego",
        ])
        rows = [json.loads(l) for l in save.read_text().splitlines() if l]
        assert len(rows) == 1                       # 1 video x 1 breakpoint
        assert set(rows[0]) == {"id", "question", "answer", "class", "pred"}
        assert rows[0]["id"] == 1 and isinstance(rows[0]["pred"], str)

    def test_baseline_answer_smoke(self):
        from streamchat_tpu.config import DecoderConfig, ViTConfig
        from streamchat_tpu.models.longva import LongVA
        from streamchat_tpu.pipeline.baseline import answer_baseline
        from streamchat_tpu.video.reader import SyntheticVideoReader

        dec = DecoderConfig.tiny()
        model = LongVA.init_random(
            jax.random.key(0), ViTConfig.tiny(projection_dim=dec.hidden_size), dec
        )
        reader = SyntheticVideoReader(total_frames=60, height=56, width=56)
        out = answer_baseline(
            model, reader, "what happens?", end_s=1.0, num_frame=4,
            temperature=0.0, max_new_tokens=4,
        )
        assert isinstance(out, str)


class TestVisualize:
    def test_pca_projection_shape(self):
        from streamchat_tpu.tools.visualize import pca_project, visualize_memory_features

        rng = np.random.default_rng(0)
        x = rng.normal(size=(20, 16))
        p = pca_project(x)
        assert p.shape == (20, 2)
        # First PC captures more variance than second.
        assert p[:, 0].var() >= p[:, 1].var()

        bank = [rng.normal(size=(4, 16)).astype(np.float32) for _ in range(10)]
        mems = [rng.normal(size=(2, 4, 16)).astype(np.float32) for _ in range(3)]
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            out = visualize_memory_features(bank, mems, os.path.join(d, "p.png"))
        assert out.shape == (10, 2)
