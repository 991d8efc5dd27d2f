"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted in Arrow batches via ``mapInPandas``.

The container has no image/audio codecs, so the *decode* is a
clearly-marked deterministic stub (`_fake_decode`) — what is real and
tested is everything Spark-side: the binary+struct schema, the Arrow
batch shape through mapInPandas, partition-preserving execution (no
shuffle), and the feature-output contract. Swapping `_fake_decode` for
PIL/ffmpeg is a one-function change on a real cluster.

Scale notes: binary payloads dominate row size → batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set low in
plans/session.py); decode is embarrassingly parallel with zero shuffle,
so throughput scales linearly with cores until IO-bound.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", StringType()),
    ]
)


def to_media_table(docs: DataFrame) -> DataFrame:
    """Wrap document text as an opaque binary payload with typed
    metadata — the multimodal table shape (image/audio payloads would
    land here byte-identical)."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int]:
    """STUB decode. Real decode (PIL.Image.open / soundfile / pyav)
    is unavailable in this container — this deterministic stand-in
    derives stable pseudo-dimensions from the payload digest so the
    batch plumbing, schema, and tests are fully exercised.
    Replace body with the real codec on a cluster with codecs installed.
    """
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    return width, height


def extract_media_features(media: DataFrame) -> DataFrame:
    """Batch feature extraction over the media table. One mapInPandas
    stage, schema-stable output, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _fake_decode(p if isinstance(p, bytes) else bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"].astype("int64"),
                    "width": pd.Series([w for w, _ in dims], dtype="int32"),
                    "height": pd.Series([h for _, h in dims], dtype="int32"),
                    "checksum": [
                        hashlib.md5(p if isinstance(p, bytes) else bytes(p)).hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
