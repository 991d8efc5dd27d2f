"""Sketch operators: HLL mergeability/accuracy, Bloom no-false-
negatives, and the plan shapes that make both scale (oracle parity is
covered by tests/test_entry_oracle.py like every driver query)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ocr_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    bloom_build,
    bloom_semijoin_stats,
    cms_top_frequencies,
    count_min_counters,
    hll_distinct,
    hll_registers,
)
from ocr_spark.plans.checks import count_exchanges, physical_plan
from ocr_spark.sources.io import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_hll_rank_formula_matches_bit_twiddling():
    """Both engines derive rank via the length of the minimal binary
    string (maxr - bitlen) — verify against an independent
    count-the-leading-zeros loop over the whole rank range plus random
    hashes, so a shared off-by-one can't hide behind engine parity."""
    import hashlib

    from ocr_spark.operators.sketch import HLL_MAXRANK, HLL_P

    field_bits = 32 - HLL_P

    def rank_reference(w: int) -> int:
        lz = 0
        for bit in range(field_bits - 1, -1, -1):
            if w >> bit & 1:
                break
            lz += 1
        else:
            lz = field_bits
        return lz + 1

    def rank_formula(w: int) -> int:
        return HLL_MAXRANK if w == 0 else HLL_MAXRANK - len(bin(w)[2:])

    # every boundary value (single set bit, all-ones prefixes) ...
    for b in range(field_bits):
        for w in (1 << b, (1 << (b + 1)) - 1):
            assert rank_formula(w) == rank_reference(w), w
    assert rank_formula(0) == rank_reference(0) == HLL_MAXRANK
    # ... and the md5-derived hashes the operator actually produces
    for i in range(500):
        h32 = int(hashlib.md5(f"hll|{i}".encode()).hexdigest()[:8], 16)
        w = h32 >> HLL_P
        assert rank_formula(w) == rank_reference(w), (i, w)


def test_hll_merge_is_register_max(spark):
    """The distributed-merge property the 1000-executor story rests
    on: sketching two halves separately and merging by per-register
    max equals sketching the whole input. (Spark's partial/final
    HashAggregate pair applies exactly this merge across partitions.)"""
    li = load_table(spark, SF_DIR, "lineitem")
    whole = hll_registers(li, "l_orderkey", "l_returnflag")
    half_a = hll_registers(li.filter(F.col("l_partkey") % 2 == 0), "l_orderkey", "l_returnflag")
    half_b = hll_registers(li.filter(F.col("l_partkey") % 2 == 1), "l_orderkey", "l_returnflag")
    merged = (
        half_a.unionByName(half_b)
        .groupBy("grp", "idx")
        .agg(F.max("mr").alias("mr"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_hll_accuracy_in_raw_regime(spark):
    """All driver-tier groups sit in the raw-estimate regime
    (>= 2.5*m distinct) and land within 20% of exact (m=256 standard
    error is ~6.5%; 20% = ~3 sigma)."""
    li = load_table(spark, SF_DIR, "lineitem")
    rows = hll_distinct(li, "l_orderkey", "l_returnflag").collect()
    assert rows
    for r in rows:
        assert r.exact_distinct >= 2.5 * HLL_M
        assert r.rel_err_bp < 2000, (r.l_returnflag, r.rel_err_bp)


def test_hll_sketch_path_two_exchanges(spark):
    """Without the exact-count comparison join, the sketch is exactly
    two partially-aggregated shuffles (register max, group fold) —
    the shuffle payload is register-sized, never input-sized."""
    li = load_table(spark, SF_DIR, "lineitem")
    df = hll_distinct(li, "l_orderkey", "l_returnflag", include_exact=False)
    assert count_exchanges(df) == 2
    assert "Join" not in physical_plan(df)


def test_cms_merge_is_counter_sum(spark):
    """Sketching two halves and merging by per-cell SUM equals
    sketching the whole input — the count-min merge operator, applied
    by Spark's partial aggregation across partitions."""
    li = load_table(spark, SF_DIR, "lineitem")
    whole = count_min_counters(li, "l_partkey")
    half_a = count_min_counters(li.filter(F.col("l_linenumber") % 2 == 0), "l_partkey")
    half_b = count_min_counters(li.filter(F.col("l_linenumber") % 2 == 1), "l_partkey")
    merged = (
        half_a.unionByName(half_b).groupBy("row", "col").agg(F.sum("c").alias("c"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_never_undercounts_and_bound_holds(spark):
    """est >= exact for every probe (collisions only add), and the
    overestimate respects ~3x the (e/w)*N expectation bound."""
    li = load_table(spark, SF_DIR, "lineitem")
    n = li.count()
    rows = cms_top_frequencies(li, "l_partkey").collect()
    assert len(rows) == 20
    bound = 3 * (2.718281828 / CMS_WIDTH) * n
    for r in rows:
        assert r.overestimate >= 0, (r.l_partkey, r.overestimate)
        assert r.overestimate <= bound, (r.l_partkey, r.overestimate, bound)


def test_cms_counter_table_bounded(spark):
    """The sketch state is at most d*w cells — broadcast-sized no
    matter how many items streamed through — and one partial-agg
    Exchange away from the scan."""
    li = load_table(spark, SF_DIR, "lineitem")
    counters = count_min_counters(li, "l_partkey")
    assert counters.count() <= CMS_DEPTH * CMS_WIDTH
    assert count_exchanges(counters) == 1


def test_bloom_no_false_negatives(spark):
    """Probing the needle keys themselves: every one must pass its own
    filter (bloom filters cannot produce false negatives)."""
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    stats = bloom_semijoin_stats(orders, orders, "o_orderkey", "o_orderkey").collect()[0]
    assert stats.n_candidates == stats.n_fact
    assert stats.n_false_pos == 0


def test_bloom_probe_is_broadcast_only(spark):
    """The fact table is never shuffled: the bloom row and the needle
    keys both arrive by broadcast, so the only Exchange is the final
    single-row stats fold. No SortMergeJoin anywhere."""
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    df = bloom_semijoin_stats(li, orders, "l_orderkey", "o_orderkey")
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan
    # exchanges: bloom build (word fold + single-row collect) and the
    # final stats fold — none of them carry fact rows
    fact_side = plan.split("BroadcastNestedLoopJoin")[0] if "BroadcastNestedLoopJoin" in plan else plan
    assert not re.search(r"Exchange hashpartitioning\(fk", fact_side)


def test_bloom_word_table_is_sparse_and_bounded(spark):
    """The serialized filter is at most n_bits/32 words regardless of
    needle count — the broadcast stays metadata-sized."""
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    row = bloom_build(orders, "o_orderkey").collect()[0]
    assert 0 < len(row.bloom) <= 65536 // 32
    assert all(v != 0 for v in row.bloom.values())


def test_hll_null_keys_do_not_mint_registers(spark):
    """NULL keys are filtered before hashing: the sketch over a column
    with NULLs equals the sketch over the same column with the NULL
    rows removed (no phantom register, no zero_registers skew)."""
    from ocr_spark.operators.sketch import hll_distinct

    base = [("g", i) for i in range(200)]
    with_nulls = base + [("g", None)] * 7
    a = hll_distinct(
        spark.createDataFrame(with_nulls, "grp string, k int"), "k", "grp"
    ).collect()[0]
    b = hll_distinct(
        spark.createDataFrame(base, "grp string, k int"), "k", "grp"
    ).collect()[0]
    assert a == b


def test_hll_nondefault_precision_works_and_bounds_error(spark):
    """p is a real parameter now: constants derive from p, and the
    estimate at p=12 (4096 registers) lands within the raw-regime
    error bound for a large distinct count."""
    import pytest

    from ocr_spark.operators.sketch import hll_consts, hll_distinct

    rows = [("g", i) for i in range(20000)]
    df = spark.createDataFrame(rows, "grp string, k int")
    out = hll_distinct(df, "k", "grp", p=12).collect()[0]
    # standard error 1.04/sqrt(4096) ~ 1.6%; allow 5 sigma
    assert abs(out["est_distinct"] - 20000) / 20000 < 0.082, out["est_distinct"]
    with pytest.raises(ValueError, match="out of range"):
        hll_consts(3)
    with pytest.raises(ValueError, match="out of range"):
        hll_consts(27)


def test_keep_best_raises_on_unscored_doc(spark):
    """A comps doc missing from scored fails the job loudly instead of
    silently vanishing (quiet-corpus-loss guard)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from ocr_spark.operators.dedup import keep_best_representative

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id int, component int"
    )
    scored = spark.createDataFrame([(1, 0.9), (2, 0.5)], "doc_id int, quality double")
    with pytest.raises((Py4JJavaError, Exception), match="no score for 3"):
        keep_best_representative(scored, comps).collect()
