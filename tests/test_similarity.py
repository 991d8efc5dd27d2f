"""ANN quality: approximate methods measured against brute force."""

from __future__ import annotations

from ocr_spark.operators.similarity import (
    cosine_neardup,
    cosine_neardup_lsh,
    cosine_topk,
    ivf_topk,
    ivf_topk_seeded,
)
from ocr_spark.sources.io import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["q_id"], r["vec_id"]) for r in cosine_topk(emb, n_queries=10, k=5).collect()
    }
    approx = {
        (r["q_id"], r["vec_id"])
        for r in ivf_topk(emb, n_queries=10, k=5, n_cells=16, n_probe=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall  # near-random vectors: probing 6/16 cells


def test_ivf_seeded_recall_vs_bruteforce(spark):
    """The oracle-checked seeded-quantizer variant holds a recall floor
    too (quality gate on top of the exact-parity gate)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["q_id"], r["vec_id"]) for r in cosine_topk(emb, n_queries=10, k=5).collect()
    }
    approx = {
        (r["q_id"], r["vec_id"])
        for r in ivf_topk_seeded(emb, n_queries=10, k=5, n_cells=16, n_probe=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall  # seeded (no Lloyd) trails k-means slightly


def test_sign_lsh_is_subset_of_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]) for r in cosine_neardup(emb, threshold=0.3).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_lsh(emb, threshold=0.3, bits=4).collect()
    }
    assert lsh <= exact  # verification step guarantees no false positives
    if exact:
        print("sign-lsh recall:", len(lsh) / len(exact))
