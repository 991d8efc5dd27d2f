"""End-to-end corpus-preparation walkthrough over the documents table.

    python examples/corpus_prep.py [sf_dir]

The training-data side of the engine in pipeline order: quality + lang
filtering, exact and near dedup, benchmark decontamination, PII
redaction, sequence packing, the deterministic split, and the sketch
family for monitoring — the same operators the driver contract
(`__spark_entry__.py`) exercises query by query, here composed into
one flow. Default input is the sf0.001 synthetic tier.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ocr_spark.functions.text import lang_id, pii_redact, quality_score  # noqa: E402
from ocr_spark.operators.corpus import (  # noqa: E402
    decontaminate,
    materialize_mixture,
    pack_sequences,
    snapshot_diff,
    source_mixture_weights,
    train_val_split,
)
from ocr_spark.operators.dedup import (  # noqa: E402
    dedup_exact,
    duplicate_components,
    keep_best_representative,
    minhash_lsh_dedup,
    winnow_span_runs,
)
from ocr_spark.operators.sketch import bloom_semijoin_stats, hll_distinct  # noqa: E402
from ocr_spark.plans.session import build_session  # noqa: E402
from ocr_spark.sources.io import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session("ocr_spark-corpus-prep")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    print(f"== {n0} docs from {sf_dir}; quality + language gates")
    gated = docs.withColumn("lang_pred", lang_id(F.col("text"))).withColumn(
        "q", quality_score(F.col("text"))
    )
    kept = gated.filter((F.col("q") >= 0.5) & (F.col("lang_pred") != "und"))
    print(f"   kept {kept.count()}/{n0} after gates")

    print("== exact dedup (md5 fingerprint keeper)")
    groups = dedup_exact(kept.select("doc_id", "text", "source"))
    print(f"   {groups.count()} distinct fingerprints (keeper = min doc_id)")

    print("== incremental dedup vs yesterday's index (batch-vs-index)")
    from ocr_spark.functions.text import fingerprint
    from ocr_spark.operators.dedup import incremental_dedup

    yesterday = kept.filter(F.col("doc_id") % 2 == 0).select(
        fingerprint(F.col("text")).alias("fp")
    )
    verdicts = incremental_dedup(kept.select("doc_id", "text"), yesterday)
    verdicts.groupBy("verdict").count().orderBy("verdict").show()

    print("== near-dup pairs (MinHash-LSH, threshold 0.5)")
    pairs = minhash_lsh_dedup(kept.select("doc_id", "text"), threshold=0.5)
    print(f"   {pairs.count()} near-dup pairs flagged")

    print("== clusters -> keep the best-quality member of each")
    comps = duplicate_components(kept.select("doc_id", "text"), pairs)
    reps = keep_best_representative(
        kept.select("doc_id", F.col("q").alias("quality")), comps
    )
    n_drop = reps.filter(~F.col("is_best")).count()
    print(f"   {n_drop} docs dropped in favor of a higher-quality duplicate")

    print("== duplicated-passage spans (exact-substring dedup)")
    spans = winnow_span_runs(kept.select("doc_id", "text"))
    spans.orderBy(F.desc("n_fps"), "id_a", "id_b").show(3)

    print("== benchmark decontamination (eval slice = doc_id % 41 == 0)")
    decon = decontaminate(kept.select("doc_id", "text"))
    flagged = decon.filter(F.col("contaminated") == 1).count()
    print(f"   {flagged} training docs share an n-gram with the eval slice")

    print("== collocations (top adjacent pairs by PMI, min_count=5)")
    from ocr_spark.operators.corpus import pmi_collocations

    pmi_collocations(kept.select("doc_id", "text"), top_n=5).show(5)

    print("== tokenizer prep: first BPE merge candidates")
    from ocr_spark.operators.corpus import bpe_merge_candidates

    bpe_merge_candidates(kept.select("doc_id", "text"), top_n=5).show(5)

    print("== vocabulary growth curve (Heaps' law checkpoints)")
    from ocr_spark.operators.corpus import vocab_growth

    vocab_growth(kept.select("doc_id", "text")).orderBy("pct").show()

    print("== PII redaction + sequence packing (512-token windows)")
    clean = kept.select(
        "doc_id", "source", pii_redact(F.col("text")).alias("text")
    )
    packed = pack_sequences(clean, capacity=512)
    print(f"   {packed.count()} packed sequences")

    print("== deterministic split + temperature mixing weights")
    train_val_split(clean).groupBy("split").count().orderBy("split").show()
    source_mixture_weights(clean).orderBy("source").show(5)

    print("== the weights applied as a sampling pass (RNG-free)")
    mixed = materialize_mixture(clean)
    mixed.groupBy("source", "keep_rate").agg(
        F.sum(F.col("is_kept").cast("int")).alias("kept"),
        F.count(F.lit(1)).alias("total"),
    ).orderBy("source").show(5)

    print("== monitoring sketches")
    hll_distinct(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey", "l_returnflag"
    ).orderBy("l_returnflag").show(3)
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bloom_semijoin_stats(
        load_table(spark, sf_dir, "lineitem"), urgent, "l_orderkey", "o_orderkey"
    ).show()

    print("== snapshot self-diff (CDC sanity: everything unchanged)")
    snapshot_diff(clean, clean).orderBy("source").show(3)

    print("== weighted sampling (A-ES, 5 per source, weight ∝ length)")
    from ocr_spark.operators.corpus import weighted_sample

    weighted = weighted_sample(
        clean.withColumn(
            "weight", (F.lit(1) + F.floor(F.length("text") / 512)).cast("int")
        ),
        k=5,
    )
    weighted.orderBy("source", "sample_rank").show(5)

    print("== embedding-space passes: semantic dedup clusters,")
    print("   eval decontamination, label propagation, filtered search")
    from ocr_spark.operators.similarity import (
        cosine_neardup_lsh,
        cosine_topk_filtered,
        knn_label_propagation,
        semantic_decontaminate,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_neardup_lsh(emb, threshold=0.3, bits=8, n_bands=8, max_bucket=256)
    comps = duplicate_components(emb.select("vec_id"), pairs, id_col="vec_id")
    n_collapsed = comps.filter(~F.col("is_keeper")).count()
    print(f"   semantic dedup: {n_collapsed} vectors collapse into clusters")
    contaminated = semantic_decontaminate(emb).filter("contaminated").count()
    print(f"   eval-similar vectors flagged: {contaminated}")
    knn_label_propagation(emb, n_queries=5, k=5).show(5)
    en_ids = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "en"
    ).select(F.col("doc_id").alias("vec_id"))
    cosine_topk_filtered(emb, en_ids, n_queries=3, k=2).show(6)

    spark.stop()
    print("corpus prep walkthrough complete")


if __name__ == "__main__":
    main()
