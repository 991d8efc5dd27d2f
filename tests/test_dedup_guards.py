"""Guard rails on the dedup family: cross-engine overflow bounds,
degenerate-document parity, and posting-cap behavior."""

from __future__ import annotations

import duckdb
import pytest

from ocr_spark.operators.dedup import (
    MAX_NUM_HASHES,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from ocr_spark.queries import _minhash_sql


def test_num_hashes_overflow_bound_enforced(spark):
    """g_i = a + i*b with 60-bit bases exceeds 2^63 for i >= 8: Spark
    would wrap silently where DuckDB raises, so the API refuses."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    with pytest.raises(ValueError, match="num_hashes"):
        minhash_lsh_dedup(df, num_hashes=16, bands=4)
    with pytest.raises(ValueError, match="num_hashes"):
        minhash_signatures(df, num_hashes=MAX_NUM_HASHES + 1)


TINY_DOCS = [
    (1, ""),  # zero tokens → zero shingles
    (2, "one"),  # 1 token
    (3, "two words"),  # 2 tokens → still zero 3-shingles
    (4, "exactly three tokens"),  # first doc with one shingle
    (5, "exactly three tokens"),  # its exact duplicate
    (6, "a completely different shingle here today"),
    (7, "a completely different shingle here tomorrow"),
    (8, " "),  # whitespace-only
]


def test_minhash_tiny_docs_parity_vs_duckdb(spark):
    """Docs with fewer than n tokens (empty shingle sets) must not
    surface as mutual candidates on either engine: Spark filters them
    before bucketing; DuckDB's list_min gives NULL buckets that never
    join. Result sets must agree exactly."""
    sdf = spark.createDataFrame(TINY_DOCS, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_dedup(sdf, threshold=0.3).collect()
    }

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in TINY_DOCS)
        + ") AS t(doc_id, text)"
    )
    want = {tuple(r) for r in con.sql(_minhash_sql(threshold=0.3)).fetchall()}
    assert got == want
    assert (4, 5, 1.0) in got  # the real duplicate pair still found
    empties = {1, 2, 3, 8}
    assert not any(a in empties or b in empties for a, b, _ in got)


def test_ngram_posting_cap_bounds_hot_shingles(spark):
    """A shingle hotter than max_postings is dropped from the candidate
    join (skew guard); a generous cap keeps exact behavior."""
    hot = [(i, "common boilerplate footer") for i in range(5)]
    sdf = spark.createDataFrame(hot, "doc_id int, text string")
    capped = ngram_jaccard_pairs(sdf, threshold=0.1, max_postings=2)
    assert capped.count() == 0  # the only shingle is in 5 > 2 docs
    uncapped = ngram_jaccard_pairs(sdf, threshold=0.1, max_postings=100)
    assert uncapped.count() == 10  # all C(5,2) exact-dup pairs
