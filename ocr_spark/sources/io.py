"""Readers/writers: Iceberg-first with parquet-path fallback.

Rebuild of the reference's source/sink surface (SURVEY.md §2.1):
the directory scan + extension filter (S1, ``OCR API 2/main.py:42-72``)
becomes a table read with a predicate; the Socket.IO sink (S5) becomes
the output table + lineage manifest. One interface so the job code is
identical whether the catalog is Iceberg (production) or bare parquet
paths (this sandbox has no Iceberg runtime JAR — detected by name
shape, not by try/except at task time).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-generated relational tables (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _is_path(source: str) -> bool:
    return "/" in source or source.endswith(".parquet")


def read_input(spark: SparkSession, source: str) -> DataFrame:
    """Read a table. A path reads as parquet; a dotted identifier
    without '/' reads as an Iceberg table (runtime JAR + catalog on a
    real cluster; same call signature here)."""
    if not _is_path(source):
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)


def write_output(df: DataFrame, dest: str, mode: str = "overwrite") -> None:
    if not _is_path(dest):
        df.writeTo(dest).createOrReplace()
    else:
        df.write.mode(mode).parquet(dest)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver testdata table as a DataFrame."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}
