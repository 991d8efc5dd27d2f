"""Shared fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ocr_spark-tests")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory):
    """Small deterministic transcript fixture table (sf0.001)."""
    from ocr_spark.fixtures import write_transcripts

    path = tmp_path_factory.mktemp("fixtures") / "transcripts_sf0001.parquet"
    return write_transcripts(str(path), sf=0.001, seed=42)
