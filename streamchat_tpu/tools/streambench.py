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
    durations = []
    for item in annotations:
        bps = item.get("breakpoint", [])
        total_questions += len(bps)
        category_counts[item["info"].get("class_1", "?")] += 1
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
    }
    if durations:
        out["video_seconds"] = {
            "total": sum(durations),
            "mean": sum(durations) / len(durations),
            "max": max(durations),
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


if __name__ == "__main__":
    main()
