"""StreamBench annotation curation utilities.

Generalized port of the reference's ad-hoc `tools/` scripts (hard-coded
paths removed, same jobs):
  * stats — question counts / class distribution / video durations
    (tools/static.py:11-120).
  * resample — per-category balanced subsampling of annotations
    (tools/Ego_Class/resample.py).
  * check-videos — verify every referenced video exists and opens
    (tools/check_video_open_ok.py, check_all_data_exsit.py).
"""

from __future__ import annotations

import argparse
import json
import os
import random
from collections import defaultdict
from typing import Dict, List, Optional


def annotation_stats(annotations: List[dict], video_dir: Optional[str] = None) -> Dict:
    """Question/class/duration statistics over a StreamBench annotation list."""
    total_questions = 0
    class_counts: Dict[str, int] = defaultdict(int)
    category_counts: Dict[str, int] = defaultdict(int)
    subclass_counts: Dict[str, Dict[str, int]] = defaultdict(lambda: defaultdict(int))
    durations = []
    for item in annotations:
        bps = item.get("breakpoint", [])
        total_questions += len(bps)
        c1 = item["info"].get("class_1", "?")
        category_counts[c1] += 1
        subclass_counts[c1][item["info"].get("class_2", "?")] += 1
        for q in bps:
            class_counts[q.get("class", "?")] += 1
        if bps:
            durations.append(max(int(q["time"]) for q in bps))
        if video_dir:
            pass  # existence handled by check_videos
    out = {
        "num_videos": len(annotations),
        "num_questions": total_questions,
        "question_classes": dict(class_counts),
        "categories": dict(category_counts),
        "subclasses": {k: dict(v) for k, v in subclass_counts.items()},
    }
    if durations:
        out["video_seconds"] = {
            "total": sum(durations),
            "mean": sum(durations) / len(durations),
            "max": max(durations),
            "per_video": durations,
        }
    return out


def resample_by_category(
    annotations: List[dict],
    per_category: int,
    seed: int = 0,
    category_key: str = "class_1",
) -> List[dict]:
    """Balanced subsample: up to `per_category` videos per class_1 bucket."""
    rng = random.Random(seed)
    buckets: Dict[str, List[dict]] = defaultdict(list)
    for item in annotations:
        buckets[item["info"].get(category_key, "?")].append(item)
    out: List[dict] = []
    for cat in sorted(buckets):
        items = buckets[cat]
        if len(items) > per_category:
            items = rng.sample(items, per_category)
        out.extend(items)
    return out


def check_videos(annotations: List[dict], video_dir: str, open_check: bool = False) -> List[str]:
    """Missing (or unopenable) video paths."""
    bad: List[str] = []
    for item in annotations:
        path = os.path.join(
            video_dir, item["info"].get("class_1", ""), item["info"]["video_path"]
        )
        if not os.path.exists(path):
            bad.append(path)
            continue
        if open_check:
            import cv2

            cap = cv2.VideoCapture(path)
            if not cap.isOpened():
                bad.append(path)
            cap.release()
    return bad


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="StreamBench curation tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("stats")
    sp.add_argument("--annotations", required=True)

    rp = sub.add_parser("resample")
    rp.add_argument("--annotations", required=True)
    rp.add_argument("--per_category", type=int, required=True)
    rp.add_argument("--output", required=True)
    rp.add_argument("--seed", type=int, default=0)

    cp = sub.add_parser("check-videos")
    cp.add_argument("--annotations", required=True)
    cp.add_argument("--video_dir", required=True)
    cp.add_argument("--open_check", action="store_true")

    pp = sub.add_parser(
        "plots",
        help="distribution PNGs: duration histogram, question-class pie, "
             "domain/subclass sunburst (reference tools/static.py + "
             "draw_sun_pic.py)",
    )
    pp.add_argument("--annotations", required=True)
    pp.add_argument("--out_dir", default=".")

    args = p.parse_args(argv)
    with open(args.annotations, encoding="utf-8") as f:
        annotations = json.load(f)

    if args.cmd == "stats":
        print(json.dumps(annotation_stats(annotations), indent=2))
    elif args.cmd == "resample":
        sampled = resample_by_category(annotations, args.per_category, args.seed)
        with open(args.output, "w", encoding="utf-8") as f:
            json.dump(sampled, f, ensure_ascii=False, indent=2)
        print(f"wrote {len(sampled)} / {len(annotations)} annotations")
    elif args.cmd == "check-videos":
        bad = check_videos(annotations, args.video_dir, args.open_check)
        print(json.dumps({"missing_or_broken": bad, "count": len(bad)}, indent=2))
    elif args.cmd == "plots":
        from streamchat_tpu.tools.visualize import (
            plot_category_sunburst,
            plot_class_pie,
            plot_duration_histogram,
        )

        stats = annotation_stats(annotations)
        os.makedirs(args.out_dir, exist_ok=True)
        wrote = []
        if stats.get("video_seconds", {}).get("per_video"):
            path = os.path.join(
                args.out_dir, "video_time_distribution_histogram.png")
            plot_duration_histogram(stats["video_seconds"]["per_video"], path)
            wrote.append(path)
        if stats["question_classes"]:
            path = os.path.join(args.out_dir, "class_distribution_pie_chart.png")
            plot_class_pie(stats["question_classes"], path)
            wrote.append(path)
        if stats["subclasses"]:
            path = os.path.join(args.out_dir, "category_sunburst.png")
            plot_category_sunburst(stats["subclasses"], path)
            wrote.append(path)
        print(json.dumps({"wrote": wrote}, indent=2))


if __name__ == "__main__":
    main()
