"""Bucketed co-located join: zero shuffle exchanges on the join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.plans.checks import count_exchanges, physical_plan
from ocr_spark.sources.bucketing import colocated_join, write_bucketed


def test_bucketed_join_is_shuffle_free(spark, transcripts_path):
    df = spark.read.parquet(transcripts_path)
    left = df.select("conv_id", "turn_idx", "role")
    right = (
        df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    )
    write_bucketed(left, "b_turns", n_buckets=8)
    write_bucketed(right, "b_convs", n_buckets=8, sort_col=None)
    try:
        joined = colocated_join(spark, "b_turns", "b_convs")
        # the join itself introduces no shuffle: both sides read their
        # matching buckets in place (sorts may remain for SMJ)
        assert count_exchanges(joined) == 0, physical_plan(joined)
        # and it's still correct
        assert joined.count() == left.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_turns")
        spark.sql("DROP TABLE IF EXISTS b_convs")
