"""Evaluation & scoring harness (L5).

LLaMA-3 judge + score aggregation for StreamBench v0.3 results
(eval_video_qa_with_llama3_ours.py, calculate_score.py,
calculate_avg_score.py).
"""

from streamchat_tpu.eval.judge import build_judge_prompt, judge_predictions, parse_judge_output
from streamchat_tpu.eval.scoring import aggregate_scores, per_class_breakdown

__all__ = [
    "aggregate_scores",
    "build_judge_prompt",
    "judge_predictions",
    "parse_judge_output",
    "per_class_breakdown",
]
