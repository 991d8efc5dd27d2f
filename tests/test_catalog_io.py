"""Table-identifier surface of read_input/write_output: the Iceberg
branch when the runtime JAR is present, the session-catalog managed
parquet table otherwise (this sandbox ships no JAR, so the fallback is
the live-tested branch and the Iceberg branch is skip-guarded)."""

from __future__ import annotations

import pytest

from ocr_spark.plans.session import iceberg_runtime_available
from ocr_spark.sources.io import read_input, write_output


def test_runtime_probe_is_cached_and_boolean(spark):
    a = iceberg_runtime_available(spark)
    assert isinstance(a, bool)
    assert iceberg_runtime_available(spark) is a  # cached per context


def test_identifier_roundtrip_via_session_catalog(spark, tmp_path):
    """Identifier writes must land in the catalog and read back through
    the same identifier — job code never branches on deployment."""
    if iceberg_runtime_available(spark):
        pytest.skip("covered by test_identifier_roundtrip_via_iceberg")
    df = spark.createDataFrame(
        [("c1", 0, "hello world"), ("c1", 1, "second turn")],
        "conv_id string, turn_idx int, text string",
    )
    tbl = "ocr_spark_test_roundtrip"
    try:
        write_output(df, tbl)
        back = read_input(spark, tbl)
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in df.collect()
        )
        # the fallback provider is parquet, not Iceberg
        provider = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
        }.get("Provider", "").lower()
        assert provider == "parquet"
        # overwrite is idempotent (same identifier, fresh contents)
        write_output(df.limit(1), tbl)
        assert read_input(spark, tbl).count() == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_jsonl_roundtrip_sft_pairs(spark, transcripts_path, tmp_path):
    """SFT pairs export to JSONL (the training-data interchange format)
    and read back with an explicit schema — no inference pre-pass, and
    the values survive the round trip exactly."""
    import os

    from ocr_spark.operators.conversation import sft_pairs
    from ocr_spark.sources.io import read_jsonl, write_jsonl

    pairs = sft_pairs(spark.read.parquet(transcripts_path))
    dest = str(tmp_path / "sft.jsonl")
    write_jsonl(pairs, dest)
    # line-delimited shards, one per task — no coalesce
    shards = [f for f in os.listdir(dest) if f.startswith("part-")]
    assert shards
    with open(os.path.join(dest, shards[0])) as fh:
        first = fh.readline()
    assert first.startswith("{") and first.rstrip().endswith("}")

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema)
    back = read_jsonl(spark, dest, schema=schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, pairs.collect()))


def test_identifier_roundtrip_via_iceberg(spark, tmp_path):
    """The production branch: an atomic Iceberg snapshot commit via
    writeTo().createOrReplace(). Runs only where the runtime JAR is on
    the classpath (a real cluster / a dev box with --packages)."""
    if not iceberg_runtime_available(spark):
        pytest.skip("Iceberg runtime JAR not on classpath in this sandbox")
    df = spark.createDataFrame([("c1", 0, "t")], "conv_id string, turn_idx int, text string")
    tbl = "ocr_spark_test_iceberg"
    try:
        write_output(df, tbl)
        assert read_input(spark, tbl).count() == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_compact_parquet_preserves_rows_and_reduces_files(spark, tmp_path):
    """Compaction: many tiny files → few, rows byte-identical, old
    directory cleaned up, metrics accurate."""
    from ocr_spark.sources.io import compact_parquet, load_table

    src = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_tiny")
    src.repartition(24).write.parquet(path)
    import os as _os

    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    stats = compact_parquet(spark, path, target_file_mb=256)
    assert stats["files_before"] == 24
    assert stats["files_after"] == 1  # tiny table → one file
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == before
    assert not _os.path.exists(path + ".compact_old")
    assert not _os.path.exists(path + ".compact_staging")
