"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline (sniff → route →
extract → normalize, one Arrow-batch UDF stage) over the sf0.001
documents table. ``queries``/``oracle_sql`` expose the SURVEY.md §2
operator suite plus the training-data operators (dedup, similarity
search, text analysis, multimodal plumbing); implementations live in
``ocr_spark.queries`` (Spark) with DuckDB oracle twins generated in the
same module so both sides share constants.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ocr_spark.queries import q_extract_documents

    return q_extract_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ocr_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query.
    Keys absent here (extract_transcripts, extract_documents,
    extract_fields, transaction_pivot, conv_rollup,
    multimodal_features) are non-SQL-expressible pipelines — the
    driver records a rows-only check; their exact-equality gates are
    tests/test_pipeline.py (pure-Python oracle equality,
    native-vs-grouped rollup identity, fields ground truth) and
    tests/test_core.py.
    """
    from ocr_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
