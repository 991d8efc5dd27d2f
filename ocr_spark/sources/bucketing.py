"""Bucketed-table support: co-located joins without shuffles.

At the 10^12-turn design point the expensive pattern is joining the
extraction output back to other conv-keyed tables (labels, scores,
lineage). Writing both sides bucketed by ``conv_id`` into the
warehouse makes that join shuffle-free: Spark trusts the bucket
layout, so SortMergeJoin reads bucket i of A against bucket i of B
with zero Exchange (SURVEY.md §2.6 "co-located joins via bucketing").

Parquet-path tables can't carry bucket metadata — this goes through
``saveAsTable`` (session warehouse locally, a real catalog on a
cluster). Iceberg's ``bucket(conv_id)`` partition transform is the
same idea with hidden partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 32,
    sort_col: str | None = "turn_idx",
) -> None:
    """Write as a bucketed (and per-bucket sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str = "conv_id"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — planner emits
    no Exchange on either side (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)
