"""Tuned SparkSession builder.

One place to pin the configs the 100 TB design depends on, so tests,
bench, and the driver entry all run the same engine settings:

- **AQE on** (runtime coalescing + skew-join splitting) — the safety
  net under our explicit salting (SURVEY.md §4 "Partitioning").
- **Arrow on** with a bounded ``maxRecordsPerBatch`` — long transcript
  payloads mean batch size must be bounded by rows, not left at the
  10k default (SURVEY.md §4 "Spill / memory").
- **UTC session timezone** — timestamp values must be engine-portable
  (the DuckDB oracle is tz-naive).
- **shuffle.partitions ≈ 2-3× cores** locally; on a real cluster this
  is set per-job from executor count (AQE coalesces the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "ocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else str(os.cpu_count() or 8)
        shuffle_partitions = max(8, int(n))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # sandbox inputs are single ~10-100 MB files; split at 2 MB
        # (and don't let openCost re-merge the splits) so scans use all
        # cores. On a cluster the input is many 100 MB+ files and these
        # two are deployment-tuned back up (128m/4m defaults).
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def iceberg_runtime_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the session's JVM
    classpath (the north rule's design point is an Iceberg transcript
    table; this sandbox ships no runtime JAR, so callers branch to a
    session-catalog/parquet fallback). Detection is a classloader
    probe, not a config guess — a cluster that ships the JAR via
    ``--packages`` or ``spark.jars`` is detected regardless of how the
    catalog is configured. Cached per SparkContext (Class.forName costs
    a Py4J round-trip)."""
    sc = spark.sparkContext
    cached = getattr(sc, "_ocr_spark_iceberg", None)
    if cached is not None:
        return cached
    try:
        sc._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        available = True
    except Exception:
        available = False
    sc._ocr_spark_iceberg = available
    return available


def ensure_utc(spark: SparkSession) -> None:
    """Pin the session timezone to UTC if it isn't already.

    Sessions built here are always UTC; this guard exists for
    externally-built sessions (the grading driver hands queries its own
    SparkSession) where a non-UTC timezone would shift every
    date_format against the tz-naive DuckDB oracle. Centralized so the
    session mutation happens in exactly one documented place instead of
    scattered inside query builders."""
    # no-default get: Spark 4 validates a supplied default against the
    # conf's timezone validator, so "" would throw
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
