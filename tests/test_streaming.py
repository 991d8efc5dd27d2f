"""Streaming surface: exactly-once extraction parity with the batch
path, and watermarked windowed aggregation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _split_input(spark, transcripts_path, out_dir, n_files=4):
    """Spread the fixture over several files so AvailableNow runs
    multiple microbatches (watermark advancement, file-source paging)."""
    (
        spark.read.parquet(transcripts_path)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def test_streaming_extract_matches_batch(spark, transcripts_path, tmp_path):
    from ocr_spark.job import ensure_package_shipped, extract_transcripts
    from ocr_spark.streaming import run_stream_once, streaming_extract

    ensure_package_shipped(spark)
    src = _split_input(spark, transcripts_path, str(tmp_path / "src"))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    run_stream_once(streaming_extract(spark, src), out, ckpt)
    stream_rows = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in spark.read.parquet(out).collect()
    }
    batch_rows = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in extract_transcripts(spark.read.parquet(transcripts_path)).collect()
    }
    assert stream_rows == batch_rows

    # idempotent restart: draining again adds nothing (exactly-once sink)
    run_stream_once(streaming_extract(spark, src), out, ckpt)
    assert spark.read.parquet(out).count() == len(batch_rows)


def test_windowed_turn_counts(spark, transcripts_path, tmp_path):
    from ocr_spark.streaming import windowed_turn_counts

    src = _split_input(spark, transcripts_path, str(tmp_path / "src2"))
    agg = windowed_turn_counts(spark, src, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT sum(n_turns) AS n FROM wincounts").collect()[0]["n"]
    expected = spark.read.parquet(src).count()
    assert got == expected
    # window integrity: each (window, conv) count also matches a batch
    # group-by over the same bucketing
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "conv_id")
        .count()
        .count()
    )
    assert spark.sql("SELECT count(*) AS c FROM wincounts").collect()[0]["c"] == batch


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark keyed on the text fingerprint:
    duplicates arriving across microbatches within the horizon are
    dropped; exactly one survivor per distinct normalized text."""
    from datetime import datetime, timedelta

    from ocr_spark.streaming import run_stream_once, streaming_dedup

    base = datetime(2026, 1, 1, 12, 0, 0)
    texts = ["alpha beta gamma", "delta epsilon", "ALPHA  beta gamma", "zeta"]
    # 12 rows / 4 normalized-distinct texts ("ALPHA  beta gamma"
    # normalizes to the same fingerprint as texts[0]) within 10 minutes
    rows = [
        (f"c{i}", 0, "user", texts[i % 4], None, base + timedelta(seconds=30 * i))
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    src = str(tmp_path / "dsrc")
    df.repartition(3).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")
    run_stream_once(streaming_dedup(spark, src), out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 3  # texts[0]≡texts[2] under normalization
    assert got.select("fp").distinct().count() == 3
    # exactly-once restart: draining again adds nothing
    run_stream_once(streaming_dedup(spark, src), out, ckpt)
    assert spark.read.parquet(out).count() == 3


def test_stateful_conv_progress(spark, transcripts_path, tmp_path):
    """applyInPandasWithState: running per-conversation totals carried
    across microbatches; the final update per conv equals the batch
    rollup regardless of how the input was split into batches."""
    from ocr_spark.job import ensure_package_shipped
    from ocr_spark.streaming import conv_progress_stream

    ensure_package_shipped(spark)
    src = _split_input(spark, transcripts_path, str(tmp_path / "src3"), n_files=5)
    q = (
        conv_progress_stream(spark, src, max_files_per_trigger=2)
        .writeStream.format("memory")
        .queryName("convprogress")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per conv per touching batch; the final
    # state is the row with the max n_turns per conv
    final = {
        r["conv_id"]: (r["n_turns"], r["total_chars"], r["max_turn_idx"])
        for r in spark.sql(
            """
            SELECT conv_id, n_turns, total_chars, max_turn_idx FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY conv_id ORDER BY n_turns DESC) AS rn
              FROM convprogress) WHERE rn = 1
            """
        ).collect()
    }
    batch = {
        r["conv_id"]: (r["n_turns"], r["total_chars"], r["max_turn_idx"])
        for r in spark.read.parquet(src)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("total_chars"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .collect()
    }
    assert final == batch
