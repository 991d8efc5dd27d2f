"""Structured Streaming surface (optional path; SURVEY.md §2.7)."""

from ocr_spark.streaming.extract_stream import (
    incremental_dedup_batch_fn,
    run_stream_once,
    streaming_dedup,
    streaming_extract,
    streaming_incremental_dedup,
    streaming_sessionize,
    windowed_turn_counts,
)
from ocr_spark.streaming.stateful import conv_progress_stream

__all__ = [
    "streaming_extract",
    "streaming_dedup",
    "streaming_incremental_dedup",
    "incremental_dedup_batch_fn",
    "streaming_sessionize",
    "windowed_turn_counts",
    "run_stream_once",
    "conv_progress_stream",
]
