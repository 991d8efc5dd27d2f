"""Unit + plan-shape tests for the corpus-level training-data
operators (ocr_spark/operators/corpus.py, PII functions in
functions/text.py). Cross-engine value parity is covered by
tests/test_entry_oracle.py; these tests pin semantics on crafted
inputs and the physical-plan shapes that carry the 100 TB story."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from ocr_spark.operators.corpus import (
    decontaminate,
    length_percentiles,
    tfidf_top_terms,
    train_val_split,
    vocab_stats,
)
from ocr_spark.plans.checks import count_exchanges, physical_plan
from ocr_spark.sources.io import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_decontaminate_semantics(spark):
    d = spark.createDataFrame(
        [(0, "a b c d"), (1, "b c d e"), (2, "x y z w")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in decontaminate(d).collect()}
    # doc 0 is the eval slice (0 % 41 == 0) and is excluded from output
    assert set(rows) == {1, 2}
    assert rows[1]["n_eval_shingles"] == 1  # shares "b c d" with doc 0
    assert rows[1]["contaminated"] == 1
    assert rows[2]["n_eval_shingles"] == 0
    assert rows[2]["contaminated"] == 0


def test_decontaminate_corpus_side_is_map_only(spark):
    """The corpus pass must not explode or shuffle the corpus shingle
    stream: the only Generate/Exchange nodes belong to the (small)
    eval-side aggregate, joined back as a broadcast."""
    df = decontaminate(load_table(spark, SF_DIR, "documents"))
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # one-row eval array side
    # eval side: one explode + its single-partition aggregate exchange
    assert len(re.findall(r"^\(\d+\) Generate", plan, re.M)) <= 1
    assert count_exchanges(df) <= 2


def test_tfidf_ranking_semantics(spark):
    d = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry cherry cherry")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(d, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rn"], r["term"], r["score"]))
    # doc 1: apple tf=2 df=1 → 2·(3/1)=6 beats banana 1·(3/2)=1.5
    assert sorted(by_doc[1]) == [(1, "apple", 6.0), (2, "banana", 1.5)]
    # doc 3: cherry tf=3 df=2 → 4.5; only term
    assert sorted(by_doc[3]) == [(1, "cherry", 4.5)]


def test_tfidf_dfreq_is_broadcast(spark):
    df = tfidf_top_terms(load_table(spark, SF_DIR, "documents"))
    assert "BroadcastHashJoin" in physical_plan(df)
    assert "SortMergeJoin" not in physical_plan(df)


def test_length_percentiles_matches_bruteforce(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = {r["lang"]: r for r in length_percentiles(docs).collect()}
    raw = [(r["lang"], len(r["text"].strip().split())) for r in docs.collect()]
    langs = {lang for lang, _ in raw}
    for lang in langs:
        ns = sorted(n for l, n in raw if l == lang)
        exp50 = ns[math.ceil(0.5 * len(ns)) - 1]
        exp90 = ns[math.ceil(0.9 * len(ns)) - 1]
        assert got[lang]["n_docs"] == len(ns)
        assert got[lang]["p50_tokens"] == exp50, lang
        assert got[lang]["p90_tokens"] == exp90, lang


def test_length_percentiles_shuffles_histogram_not_rows(spark):
    """Histogram formulation: the (group, n) pre-aggregate has map-side
    combine (two HashAggregates around its exchange); everything after
    operates on the tiny histogram."""
    df = length_percentiles(load_table(spark, SF_DIR, "documents"))
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2
    assert count_exchanges(df) <= 3


def test_vocab_stats_small(spark):
    d = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    r = vocab_stats(d).collect()[0]
    assert r["n_total_tokens"] == 5
    assert r["n_distinct_terms"] == 3
    assert r["n_hapax"] == 1  # only "c"
    assert r["hapax_frac"] == round(1 / 3, 6)


def test_train_val_split_deterministic_fractions(spark):
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    a = {r["doc_id"]: r["split"] for r in train_val_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in train_val_split(docs).collect()}
    assert a == b  # stateless — identical across runs
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.83 <= frac_train <= 0.95
    assert {"train", "val", "test"} <= set(a.values()) or n < 60


def test_pii_redact_edges(spark):
    from ocr_spark.functions.text import pii_counts, pii_redact

    rows = [
        (1, "mail a.b-c_1@ex-ample.co.uk now"),
        (2, "call 555-123-4567 x9"),
        (3, "host 10.0.0.1 up"),
        (4, "ver 1.2.3.4.5 tag"),          # IP regex eats 1.2.3.4, leaves .5
        (5, "serial 1234-123-1234 ok"),     # NOT a phone (no 3-digit prefix)
        (6, "plain text only"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    e, p, i = pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in d.select(
            "doc_id",
            e.alias("e"),
            p.alias("p"),
            i.alias("i"),
            pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert out[1]["e"] == 1 and out[1]["red"] == "mail [EMAIL] now"
    assert out[2]["p"] == 1 and out[2]["red"] == "call [PHONE] x9"
    assert out[3]["i"] == 1 and out[3]["red"] == "host [IP] up"
    assert out[4]["i"] == 1 and out[4]["red"] == "ver [IP].5 tag"
    assert out[5]["p"] == 0 and out[5]["red"] == rows[4][1]
    assert out[6]["red"] == rows[5][1]
