"""Distributed orchestration: partitioning, skew salting, lineage,
checkpoint-resume (SURVEY.md §3.4, north_rule).

Design for the 10^12-turn target:

- **One shuffle.** The only exchange is the explicit
  ``repartition(P, conv_id, salt)``; extraction itself is a pipelined
  map stage (mapInPandas), and the output write is shuffle-free.
- **Skew salting.** Conversation sizes are Zipf-ish (FIXTURES.md): a
  single conversation can be 10^6 turns. A cheap partial-aggregated
  ``groupBy(conv_id).count()`` pre-pass finds heavy hitters (result is
  tiny — only convs above threshold — and broadcast), and only those
  get a per-turn salt; normal convs keep salt 0 so their turns stay
  co-located. Extraction is per-turn stateless, so salting is always
  safe.
- **Checkpoint-resume.** Work is split into ``n_shards`` bucket-groups
  by ``pmod(xxhash64(conv_id), n_shards)``. Each shard writes its
  output + lineage manifest, then an atomic ``.done`` marker; a re-run
  skips marked shards and overwrites (idempotent) any half-written
  shard directory — strictly stronger than the reference's
  lose-on-disconnect queue (``OCR API 2/api.py:167-178``). On a real
  cluster the markers live on the shared FS next to the Iceberg
  table; with Iceberg the per-shard write is a snapshot commit.
- **Per-partition lineage + metrics** (``MANIFEST_SCHEMA``): each task
  reports turns, convs, blocks kept/dropped, bytes in/out, wall_ms
  via an accumulator — one tiny dict per task on the driver.

The reference's whole "queue" lifecycle (``OCR API 2/api.py:48,
141-178``) maps to: a shard is the queue, the marker is its completion
event, the manifest rows are its per-job status events (S5/S6).
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid
import zipfile

import pandas as pd
from pyspark import TaskContext
from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

if __package__ in (None, ""):
    # executed by path (`python ocr_spark/job.py` / spark-submit's
    # driver script): the script's own dir lands on sys.path, not the
    # repo root — put the root first so the package imports resolve
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.schema import MANIFEST_SCHEMA, OUTPUT_SCHEMA
from ocr_spark.sources.io import read_input, validate_input_schema, write_output
from ocr_spark.udfs import extract_batch, extract_udf

DEFAULT_SALT_THRESHOLD = 2000  # turns per conv before salting kicks in
DEFAULT_N_SALTS = 16


class SimulatedFailure(RuntimeError):
    """Raised by tests to simulate a mid-job crash (resume testing)."""


class _ListAccumulator(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship the ``ocr_spark`` package to executors.

    Equivalent of ``spark-submit --py-files engine.zip`` (SURVEY.md
    §3.4) for sessions that weren't launched that way: zip the package
    once and ``addPyFile`` it so Python workers can unpickle the UDFs.
    No-op if already shipped on this SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_ocr_spark_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zip_path = tempfile.mkstemp(prefix="ocr_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "ocr_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._ocr_spark_shipped = True
    # Spark serves the zip through its file server from its own copy;
    # reclaim the staging file when the process exits
    import atexit

    atexit.register(lambda p=zip_path: os.path.exists(p) and os.unlink(p))


# --------------------------------------------------------------------------
# Declarative extraction (used by entry()/queries() and notebooks)
# --------------------------------------------------------------------------

def extract_transcripts(df: DataFrame) -> DataFrame:
    """transcripts → extraction output, as a single Catalyst-visible
    projection (column pruning reaches the scan: only conv_id,
    turn_idx, text are read)."""
    return df.select(
        "conv_id", "turn_idx", extract_udf(F.col("text")).alias("x")
    ).select("conv_id", "turn_idx", "x.*")


# --------------------------------------------------------------------------
# Skew salting
# --------------------------------------------------------------------------

def with_skew_salt(
    df: DataFrame,
    threshold: int = DEFAULT_SALT_THRESHOLD,
    n_salts: int = DEFAULT_N_SALTS,
) -> DataFrame:
    """Add a ``salt`` column: 0 for normal conversations; heavy
    conversations (> threshold turns) spread over ``n_salts`` values.

    The heavy-hitter list is a partial-aggregated count (map-side
    combine) filtered to the skew tail, so the broadcast side is tiny
    at any input scale.
    """
    heavy = (
        df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("_n_turns"))
        .filter(F.col("_n_turns") > threshold)
        .select("conv_id", F.lit(True).alias("_heavy"))
    )
    return (
        df.join(F.broadcast(heavy), "conv_id", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("_heavy"),
                F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_heavy")
    )


# --------------------------------------------------------------------------
# The job
# --------------------------------------------------------------------------

def _make_runner(acc, shard: int):
    """mapInPandas runner: extract + accumulate per-task lineage."""

    def run(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        attempt = ctx.attemptNumber() if ctx is not None else 0
        t0 = time.monotonic()
        n_turns = 0
        convs: set[str] = set()
        kept = dropped = b_in = b_out = 0
        status = "ok"
        try:
            for pdf in batches:
                ext = extract_batch(pdf["text"])
                out = pd.concat(
                    [
                        pdf[["conv_id", "turn_idx"]].reset_index(drop=True),
                        ext.reset_index(drop=True),
                    ],
                    axis=1,
                )
                n_turns += len(out)
                convs.update(pdf["conv_id"])
                kept += int(ext["blocks_kept"].sum())
                dropped += int(ext["blocks_dropped"].sum())
                b_in += int(ext["bytes_in"].sum())
                b_out += int(ext["bytes_out"].sum())
                yield out
        except Exception as exc:  # record, then let Spark retry the task
            status = f"failed:{type(exc).__name__}"
            raise
        finally:
            acc.add(
                [
                    {
                        "shard": shard,
                        "partition_id": pid,
                        "attempt": attempt,
                        "n_turns": n_turns,
                        "n_convs": len(convs),
                        "blocks_kept": kept,
                        "blocks_dropped": dropped,
                        "bytes_in": b_in,
                        "bytes_out": b_out,
                        "wall_ms": int((time.monotonic() - t0) * 1000),
                        "status": status,
                    }
                ]
            )

    return run


def _write_manifest_local(rows: list[dict], dest: str) -> None:
    """Manifest rows live on the driver (accumulator output, ≤1 tiny
    dict per task) — write them with pyarrow directly instead of
    spending a Spark job on ~128 rows. Layout matches write_output
    (parquet dir), so read_manifest is unchanged. On a real cluster
    with an object-store destination this stays a driver-side put."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dest, exist_ok=True)
    cols = [f.name for f in MANIFEST_SCHEMA.fields]
    int_cols = {f.name for f in MANIFEST_SCHEMA.fields if f.dataType.typeName() != "string"}
    arrays = [
        pa.array(
            [r[c] for r in rows],
            type=pa.int64()
            if c in int_cols and c not in ("shard", "partition_id", "attempt")
            else (
                pa.int32() if c in ("shard", "partition_id", "attempt") else pa.string()
            ),
        )
        for c in cols
    ]
    pq.write_table(pa.table(dict(zip(cols, arrays))), os.path.join(dest, "part-0.parquet"))


def _marker_path(checkpoint_dir: str, shard: int) -> str:
    return os.path.join(checkpoint_dir, f"shard-{shard:05d}.done")


def run_extraction(
    spark: SparkSession,
    input_source: str,
    output_dir: str,
    checkpoint_dir: str | None = None,
    n_shards: int = 1,
    num_partitions: int | None = None,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    n_salts: int = DEFAULT_N_SALTS,
    fail_after_shard: int | None = None,
) -> dict:
    """Run the full extraction job; returns a small summary dict.

    Output layout: ``output_dir/shard=K/*.parquet`` (+ the lineage
    manifest under ``output_dir/_manifest/shard=K`` — underscore
    prefix keeps it out of downstream reads of ``output_dir``).
    """
    ensure_package_shipped(spark)
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2

    src = read_input(spark, input_source)
    validate_input_schema(
        src, {"conv_id": "string", "turn_idx": "int", "text": "string"}
    )
    src = src.select("conv_id", "turn_idx", "text")
    done, ran = [], []
    for shard in range(n_shards):
        if checkpoint_dir and os.path.exists(_marker_path(checkpoint_dir, shard)):
            done.append(shard)
            continue
        part = src
        if n_shards > 1:
            part = src.filter(
                F.pmod(F.xxhash64("conv_id"), F.lit(n_shards)) == shard
            )
        salted = with_skew_salt(part, salt_threshold, n_salts)
        balanced = salted.repartition(num_partitions, "conv_id", "salt")
        acc = spark.sparkContext.accumulator([], _ListAccumulator())
        out = balanced.mapInPandas(_make_runner(acc, shard), OUTPUT_SCHEMA)
        write_output(out, os.path.join(output_dir, f"shard={shard}"))
        _write_manifest_local(
            list(acc.value), os.path.join(output_dir, "_manifest", f"shard={shard}")
        )
        ran.append(shard)
        # crash window: output written, marker not yet — a resume must
        # redo (overwrite) this shard with no duplicates
        if fail_after_shard is not None and shard == fail_after_shard:
            raise SimulatedFailure(f"simulated crash after shard {shard}")
        if checkpoint_dir:
            marker = _marker_path(checkpoint_dir, shard)
            tmp = f"{marker}.{uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as f:
                f.write("done\n")
            os.replace(tmp, marker)  # atomic
    return {"shards_run": ran, "shards_skipped": done, "n_shards": n_shards}


def read_manifest(
    spark: SparkSession, output_dir: str, dedupe: bool = True
) -> DataFrame:
    """Lineage manifest. Accumulator updates from transformations are
    NOT deduped by Spark across task retries/speculation, so a
    transient failure leaves a partial 'failed:*' row next to the
    retry's 'ok' row. ``dedupe=True`` (default) keeps one row per
    (shard, partition_id) — preferring ok status, then the highest
    attempt — which restores sum-able metrics; ``dedupe=False``
    returns the raw attempt log (every row, for failure forensics)."""
    raw = spark.read.schema(MANIFEST_SCHEMA).parquet(
        os.path.join(output_dir, "_manifest")
    )
    if not dedupe:
        return raw
    from pyspark.sql import Window

    w = Window.partitionBy("shard", "partition_id").orderBy(
        F.when(F.col("status") == "ok", 0).otherwise(1).asc(),
        F.col("attempt").desc(),
    )
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _cli_main(argv: list[str] | None = None) -> None:
    """spark-submit entry point (SURVEY.md §3.4):

        spark-submit --py-files ocr_spark.zip ocr_spark/job.py \
            --input <tbl-or-path> --output <tbl-or-path> \
            --checkpoint <dir> [--shards N] [--partitions P]

    On a cluster the session comes from spark-submit's conf; running
    under plain `python` falls back to a local session.
    """
    import argparse
    import json

    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser(description="ocr_spark extraction job")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--shards", type=int, default=1)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--salt-threshold", type=int, default=DEFAULT_SALT_THRESHOLD)
    ap.add_argument("--n-salts", type=int, default=DEFAULT_N_SALTS)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("ocr_spark-extract").getOrCreate()
    summary = run_extraction(
        spark,
        args.input,
        args.output,
        checkpoint_dir=args.checkpoint,
        n_shards=args.shards,
        num_partitions=args.partitions,
        salt_threshold=args.salt_threshold,
        n_salts=args.n_salts,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    _cli_main()
