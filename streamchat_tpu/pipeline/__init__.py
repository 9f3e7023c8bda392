"""Streaming pipeline (L2): ingest, memory update, answering, orchestration."""

from streamchat_tpu.pipeline.answer import (
    AnswerResult,
    answer_question,
    make_captioner,
    make_summarizer,
)
from streamchat_tpu.pipeline.runner import StreamChatPipeline, build_pipeline

__all__ = [
    "AnswerResult",
    "StreamChatPipeline",
    "answer_question",
    "build_pipeline",
    "make_captioner",
    "make_summarizer",
]
