"""Corpus deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

All four are **pure Catalyst expressions** — no Python UDFs — so the
whole family runs JVM-side with whole-stage codegen and scales by
shuffle width alone. Portability rule (shared with the DuckDB oracle):
the only hash used anywhere is ``md5`` over strings, compared/min'd as
fixed-width hex strings; lexicographic order of the hex equals numeric
order of the 128-bit value, so ``min(md5(x))`` IS a valid MinHash
permutation and every engine agrees on it bit-for-bit.

Scale design (the 100 TB story):

- **exact**: one shuffle on the 32-hex fingerprint; map-side partial
  aggregation shrinks it to ~unique-count.
- **n-gram Jaccard**: inverted-index self-join on shingle — standard,
  but unbounded posting lists on hot shingles. Kept as the *exact*
  verifier; at scale the candidate generator must be LSH, not this.
- **MinHash+LSH**: signatures are k min-aggregates in ONE pass over
  the exploded shingles (one shuffle by doc); banding turns pair
  discovery into an equi-join on (band, band_hash) — shuffle is
  O(docs × bands), never O(docs²). Hot buckets are bounded by
  ``max_bucket`` (skew guard: a bucket with B docs yields B² pairs).
- **SimHash**: 64-bit signature from per-bit majority vote over token
  hashes; near-dup = equal signature (or equal band for Hamming<k).

Reference lineage: the reference dedups uploads by name on append
(``docOcrWeb/src/App.jsx:63-83``, SURVEY.md J5) and fingerprints
nothing; these operators are the corpus-scale generalization the
north brief asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import fingerprint, word_shingles

DEFAULT_NUM_HASHES = 8
DEFAULT_BANDS = 4  # rows per band = num_hashes // bands


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint.
    Returns (fp, keeper, n_dups); keeper = min id (deterministic)."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def exploded_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) pairs, distinct per doc — the inverted-index base."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("sh"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ t).

    Self-join on shingle → per-pair intersection count → Jaccard from
    set sizes. Integer counts + one double division → engine-portable.
    """
    sh = exploded_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """k-column MinHash signature: sig_i = min(md5('s<i>|' || shingle)).

    One pass over exploded shingles, k min-aggregates (map-side
    combined), one shuffle keyed by doc."""
    sh = exploded_shingles(df, text_col, id_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("sh")))).alias(f"sig{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    max_bucket: int = 64,
) -> DataFrame:
    """Candidate pairs sharing ≥1 LSH band bucket (id_a < id_b, distinct).

    Band hash = md5 of the band's concatenated signature slots; pair
    generation is an equi-join on (band, bucket). ``max_bucket`` caps
    degenerate buckets (boilerplate-heavy corpora) — dropped buckets
    trade recall for a hard bound on join fan-out; at 100 TB this is
    what keeps the stage from quadratic blowup.
    """
    r = num_hashes // bands
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"sig{b * r + j}") for j in range(r)]
        band_rows.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("bucket"))
        )
    buckets = sig.select(
        "id", F.explode(F.array(*band_rows)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    counts = buckets.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))
    small = counts.filter(F.col("n") <= max_bucket).select("band", "bucket")
    bounded = buckets.join(small, ["band", "bucket"])
    return (
        bounded.alias("a")
        .join(bounded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: signatures → banded candidates →
    exact-Jaccard verification of candidates only.

    Output (id_a, id_b, jaccard) — same shape as ``ngram_jaccard_pairs``
    but with LSH-bounded candidate generation (the scale path)."""
    sig = minhash_signatures(df, num_hashes, text_col, id_col, n)
    cand = lsh_candidate_pairs(sig, num_hashes, bands)
    sh = exploded_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    # count common shingles for candidate pairs only (join-pruned)
    common = (
        cand.join(sh.select(F.col("id").alias("id_a"), "sh"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .filter(F.col("sh") == F.col("sh_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


_HEX = "0123456789abcdef"


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over distinct tokens, as a 16-hex-char string.

    For each token, h = md5(token)[:16] (64 bits as hex). For each bit,
    tokens vote +1/-1; majority (> 0) sets the bit. Implemented with
    explode over (hex position k, bit m) — pure integer arithmetic, no
    bit intrinsics, so the DuckDB oracle can run the identical algorithm.
    Tie (sum == 0) → bit 0, deterministic.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))).alias("tok"),
    ).withColumn("h", F.md5(F.col("tok")))
    k = toks.select("id", "h", F.explode(F.sequence(F.lit(1), F.lit(16))).alias("k"))
    digit = k.withColumn(
        "d",
        (F.expr(f"instr('{_HEX}', substring(h, k, 1))") - 1).cast("int"),
    )
    bits = digit.select(
        "id",
        "k",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("m"),
        F.col("d"),
    ).withColumn(
        "contrib",
        (F.floor(F.col("d") / F.pow(F.lit(2), F.col("m"))).cast("long") % 2) * 2 - 1,
    )
    votes = bits.groupBy("id", "k", "m").agg(F.sum("contrib").alias("s"))
    digits = (
        votes.withColumn("bitv", F.when(F.col("s") > 0, 1).otherwise(0))
        .groupBy("id", "k")
        .agg(F.sum(F.col("bitv") * F.pow(F.lit(2), F.col("m")).cast("int")).alias("dig"))
        .withColumn("c", F.substring(F.lit(_HEX), (F.col("dig") + 1).cast("int"), 1))
    )
    return digits.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "c"))), lambda s: s["c"]
            ),
            "",
        ).alias("simhash")
    )
