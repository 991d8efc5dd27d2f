"""Structured Streaming surface (optional path; SURVEY.md §2.7)."""

from ocr_spark.streaming.extract_stream import (
    run_stream_once,
    streaming_dedup,
    streaming_extract,
    streaming_sessionize,
    windowed_turn_counts,
)
from ocr_spark.streaming.stateful import conv_progress_stream

__all__ = [
    "streaming_extract",
    "streaming_dedup",
    "streaming_sessionize",
    "windowed_turn_counts",
    "run_stream_once",
    "conv_progress_stream",
]
