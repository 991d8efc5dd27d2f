"""Streaming variant of the extraction pipeline.

The reference's "streaming" is a control-plane progress channel with
at-most-once, lose-on-disconnect semantics (``OCR API 2/api.py:48,
141-178`` — SURVEY.md §2.7); the batch job already supersedes it with
checkpoint-resume. This module is the *data-plane* streaming surface
for deployments that tail an append-only transcripts table instead of
running scheduled batches:

- ``streaming_extract``: file-source ``readStream`` → the SAME
  Arrow-batch extraction UDF (stateless per-turn ⇒ identical results
  to the batch path by construction) → ``writeStream`` parquet with
  exactly-once file-sink semantics via the streaming checkpoint.
- ``windowed_turn_counts``: event-time windowed aggregation with a
  watermark for late turns — the stateful-operator pattern
  (conv activity rollup) the reference has no analogue for.

Scale notes: the extraction stage is shuffle-free (per-turn map);
the windowed agg shuffles on (window, conv bucket) with state bounded
by the watermark horizon. ``Trigger.AvailableNow`` gives batch-job
semantics for tests and backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.schema import TRANSCRIPT_SCHEMA
from ocr_spark.udfs import extract_udf


def streaming_extract(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a transcripts parquet directory → extraction."""
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    return src.select(
        "conv_id", "turn_idx", extract_udf(F.col("text")).alias("x")
    ).select("conv_id", "turn_idx", "x.*")


def windowed_turn_counts(
    spark: SparkSession,
    input_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-conversation turn counts in event-time windows, tolerant of
    late data up to the watermark."""
    src = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "conv_id",
            "n_turns",
        )
    )


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization on the live stream — the
    ``F.session_window`` twin the batch ``sessionize_events``
    docstring promises (relational.py): a conversation's session
    extends while consecutive turns arrive within ``gap``; state per
    open session is bounded by the watermark horizon (closed sessions
    are finalized and evicted — the only shape that works unbounded).

    Boundary semantics: session_window treats a turn landing exactly
    ``gap`` after the previous as a NEW session (the window is the
    half-open [event, event+gap)), while the batch lag-rule
    (``diff > gap`` starts new) keeps it — agreeing everywhere except
    exact-boundary ties; the parity test pins both behaviors.

    Output one row per closed (session, conv): start/end + turn
    count. Shuffles on (session window, conv) like the tumbling
    variant above."""
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "conv_id",
            "n_turns",
        )
    )


def streaming_dedup(
    spark: SparkSession, input_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup: the streaming twin of ``dedup_exact`` /
    the reference's dedup-on-append (J5, ``App.jsx:63-83``) — each
    normalized-text fingerprint survives once per watermark horizon.

    ``dropDuplicatesWithinWatermark`` keys state by fingerprint and
    EVICTS entries older than the watermark, so state is bounded by
    the duplicate-arrival horizon rather than corpus size — the only
    shape that works on an unbounded stream (a plain dropDuplicates
    would grow state forever). Shuffles once on fp, like the batch
    operator."""
    from ocr_spark.functions.text import fingerprint

    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    return (
        src.withWatermark("ts", watermark)
        .withColumn("fp", fingerprint(F.col("text")))
        .dropDuplicatesWithinWatermark(["fp"])
    )


def run_stream_once(
    df: DataFrame, output_dir: str, checkpoint_dir: str, mode: str = "append"
) -> None:
    """Drain all available input with AvailableNow, then stop —
    batch-equivalent execution of a streaming plan (tests, backfill)."""
    q = (
        df.writeStream.format("parquet")
        .outputMode(mode)
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
