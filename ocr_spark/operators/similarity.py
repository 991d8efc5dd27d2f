"""Embedding similarity search: brute-force cosine top-k (baseline) and
a sign-bucket LSH variant (the scale path).

Determinism contract (shared with the DuckDB oracle): the dot product
and norms are **generated left-to-right expression chains** over fixed
``dim`` components, each cast to double before multiply — a sequential
IEEE-754 fold that every engine evaluates bit-identically (no
reduce-order ambiguity, unlike SUM over an exploded view). Ranking ties
break on vec_id.

Scale story:

- **Brute force** is a broadcast nested loop: queries (small) are
  broadcast against the full corpus — one scan, no shuffle of the big
  side, O(Q×N) flops JVM-side under codegen. Correct baseline + the
  verifier for the ANN path.
- **Sign-LSH** buckets vectors by the sign pattern of their first
  ``bits`` components (a fixed-hyperplane SimHash — axis-aligned
  planes keep it expressible in ANSI SQL). Candidates share a bucket →
  the join is an equi-join on the bucket key; probing flips are cheap
  to add. Recall is approximate by design; the oracle runs the *same
  algorithm*, so correctness checks algorithm fidelity, while
  ``tests/`` check recall against brute force.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64


def dot_expr(a: str, b: str, dim: int = EMB_DIM) -> Column:
    """Left-to-right chained dot product (Spark arrays are 0-indexed)."""
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(dim)
    )
    return F.expr(terms)


def norm_expr(a: str, dim: int = EMB_DIM) -> Column:
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE)" for i in range(dim)
    )
    return F.expr(f"SQRT({terms})")


def dot_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    """The same chain in ANSI/DuckDB SQL (1-indexed lists)."""
    return " + ".join(
        f"CAST({a}[{i + 1}] AS DOUBLE) * CAST({b}[{i + 1}] AS DOUBLE)" for i in range(dim)
    )


def norm_sql(a: str, dim: int = EMB_DIM) -> str:
    return (
        "SQRT("
        + " + ".join(
            f"CAST({a}[{i + 1}] AS DOUBLE) * CAST({a}[{i + 1}] AS DOUBLE)" for i in range(dim)
        )
        + ")"
    )


def cosine_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 3,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Brute-force cosine top-k: first ``n_queries`` vec_ids as queries,
    broadcast against the full table. Output (q_id, vec_id, sim, rank)."""
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    joined = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "sim",
            F.round(
                dot_expr("q_emb", "embedding", dim)
                / (norm_expr("q_emb", dim) * norm_expr("embedding", dim)),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "sim", "rank")
    )


def sign_bucket(col: str, bits: int = 8, offset: int = 0) -> Column:
    """Axis-aligned sign-LSH bucket key: '+'/'-' per component in
    ``[offset, offset + bits)`` — ``offset`` lets banded callers key
    each hash table on a disjoint component slice."""
    chars = [
        F.when(F.expr(f"CAST({col}[{offset + i}] AS DOUBLE)") >= 0, F.lit("+")).otherwise(
            F.lit("-")
        )
        for i in range(bits)
    ]
    return F.concat(*chars)


def sign_bucket_sql(col: str, bits: int = 8, offset: int = 0) -> str:
    parts = " || ".join(
        f"(CASE WHEN CAST({col}[{offset + i + 1}] AS DOUBLE) >= 0 THEN '+' ELSE '-' END)"
        for i in range(bits)
    )
    return f"({parts})"


def cosine_neardup(
    emb: DataFrame, threshold: float = 0.4, dim: int = EMB_DIM
) -> DataFrame:
    """Exact embedding near-dup pairs (vec_id_a < vec_id_b, sim ≥ t).
    O(N²) verifier — the LSH variant below is the scale path."""
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim",
            F.round(
                dot_expr("e_a", "e_b", dim) / (norm_expr("e_a", dim) * norm_expr("e_b", dim)),
                6,
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def cosine_neardup_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    bits: int = 8,
    n_bands: int = 8,
    max_bucket: int = 256,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Banded sign-LSH near-dup pairs (id_a < id_b, sim ≥ t): candidate
    generation via ``n_bands`` independent sign-hash tables, exact
    cosine verification of candidates only.

    Scale contract (the 100 TB guards):

    - **Banding.** Band ``l`` keys on the sign pattern of components
      ``[l*bits, (l+1)*bits)``. A pair is a candidate if ANY band
      agrees — recall 1-(1-p^bits)^n_bands instead of the single-table
      p^bits, the same OR-of-ANDs trade MinHash banding makes
      (dedup.py). A single table at small ``bits`` is NOT a substitute:
      it has 2^bits buckets TOTAL, so every bucket holds ~N/2^bits
      vectors and the self-join is quadratic in corpus size.
    - **Per-(band, bucket) ``max_bucket`` cap.** Buckets hotter than
      the cap are dropped from the candidate join (recall traded for a
      hard fan-out bound — the same guard as ``lsh_candidate_pairs``).
      Worst-case pair work is thus ≤ n_bands × (N/max_bucket buckets) ×
      C(max_bucket, 2) — linear in N — no matter how degenerate the
      sign distribution is.
    - **Payload-free pair shuffle.** Candidates are generated from
      (vec_id, band, bucket) rows only; the dim-float vectors join back
      for the verify, bounded by candidate volume.

    ``bits × n_bands`` must fit in ``dim``. At production scale pick
    bits ≈ log2(N / max_bucket) and spend remaining dims on bands.
    """
    if bits * n_bands > dim:
        raise ValueError(
            f"bits ({bits}) × n_bands ({n_bands}) exceeds dim ({dim}) — "
            "bands must key on disjoint component slices"
        )
    buckets = emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[sign_bucket("embedding", bits, l * bits) for l in range(n_bands)])
        ).alias("band", "bucket"),
    )
    counts = buckets.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))
    small = counts.filter(F.col("n") <= max_bucket).select("band", "bucket")
    bounded = buckets.join(small, ["band", "bucket"])
    cand = (
        bounded.alias("a")
        .join(bounded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "sim",
            F.round(
                dot_expr("e_a", "e_b", dim) / (norm_expr("e_a", dim) * norm_expr("e_b", dim)),
                6,
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def neardup_lsh_sql(
    threshold: float = 0.4,
    bits: int = 8,
    n_bands: int = 8,
    max_bucket: int = 256,
    dim: int = EMB_DIM,
) -> str:
    """DuckDB twin of ``cosine_neardup_lsh`` — identical algorithm
    (banding, cap, verify), identical fold order, 1-indexed lists."""
    bands = "\n  UNION ALL ".join(
        f"SELECT vec_id, {l} AS band, "
        f"{sign_bucket_sql('embedding', bits, l * bits)} AS bucket FROM embeddings"
        for l in range(n_bands)
    )
    dot = dot_sql("ea.embedding", "eb.embedding", dim)
    na = norm_sql("ea.embedding", dim)
    nb = norm_sql("eb.embedding", dim)
    return f"""
WITH wb AS (
  {bands}
),
ok AS (
  SELECT band, bucket FROM wb GROUP BY band, bucket HAVING count(*) <= {max_bucket}
),
bounded AS (
  SELECT wb.vec_id, wb.band, wb.bucket FROM wb JOIN ok USING (band, bucket)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bounded a JOIN bounded b USING (band, bucket)
  WHERE a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b,
       round(({dot}) / (({na}) * ({nb})), 6) AS sim
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.id_a
JOIN embeddings eb ON eb.vec_id = c.id_b
WHERE round(({dot}) / (({na}) * ({nb})), 6) >= {threshold}
"""


def cosine_topk_filtered(
    emb: DataFrame,
    allowed_ids: DataFrame,
    n_queries: int = 10,
    k: int = 3,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Pre-filtered ANN ("filtered vector search"): cosine top-k where
    candidates are restricted to ``allowed_ids`` (one ``vec_id``
    column) BEFORE any distance work — the retrieval pattern behind
    metadata-scoped search (lang = 'en', quality ≥ t, source = X).

    Pre- vs post-filter matters at scale: post-filtering a plain
    top-k under a selective predicate returns < k rows (or forces
    k/selectivity over-fetch); pre-filtering does the key-sized
    semi-join first, so the O(dim) cosine runs only on survivors.
    When the metadata lives in the vector table itself the predicate
    pushes into the scan instead and the join disappears — this
    operator is the two-table form.

    Output (q_id, vec_id, sim, rank) — rank over the filtered pool."""
    from pyspark.sql import Window

    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    pool = emb.join(allowed_ids.select("vec_id").distinct(), "vec_id")
    scored = (
        pool.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "sim",
            F.round(
                dot_expr("q_emb", "embedding", dim)
                / (norm_expr("q_emb", dim) * norm_expr("embedding", dim)),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "sim", "rank")
    )


def semantic_decontaminate(
    emb: DataFrame,
    n_eval: int = 20,
    threshold: float = 0.4,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Embedding-space benchmark decontamination: flag corpus vectors
    whose max cosine to ANY held-out eval vector reaches ``threshold``
    — the semantic complement of the n-gram `decontaminate` operator
    (paraphrased eval leakage carries no shingle overlap; this is the
    practice behind e.g. the Phi/Llama-3 embedding-decontamination
    passes, public reports).

    Scale shape: the eval set is the SMALL side (thousands of rows at
    most) and is broadcast; the corpus is scanned once with a
    broadcast-NL join — no shuffle of the big side, same plan as
    ``cosine_topk``. The per-row reduction (max over rounded sims) is
    fold-order-free, so results are partition-layout independent.

    Output (vec_id, max_eval_sim, contaminated) for every corpus
    (non-eval) vector."""
    evals = emb.filter(F.col("vec_id") < n_eval).select(
        F.col("vec_id").alias("e_id"), F.col("embedding").alias("e_emb")
    )
    corpus = emb.filter(F.col("vec_id") >= n_eval)
    scored = corpus.crossJoin(F.broadcast(evals)).withColumn(
        "sim",
        F.round(
            dot_expr("e_emb", "embedding", dim)
            / (norm_expr("e_emb", dim) * norm_expr("embedding", dim)),
            6,
        ),
    )
    return scored.groupBy("vec_id").agg(
        F.max("sim").alias("max_eval_sim"),
        (F.max("sim") >= F.lit(threshold)).alias("contaminated"),
    )


def knn_label_propagation(
    emb: DataFrame,
    n_queries: int = 30,
    k: int = 5,
    dim: int = EMB_DIM,
) -> DataFrame:
    """kNN label propagation (auto-labeling): treat the first
    ``n_queries`` vectors as unlabeled and predict each one's label by
    majority vote among its ``k`` nearest labeled neighbors (cosine) —
    the distributed form of the classifier used to transfer quality /
    topic / safety labels from a small annotated pool onto a corpus.

    Deterministic end to end: sims round to 6 before ranking, neighbor
    ties break on vec_id, vote ties break on the smaller label. Scale
    shape: queries broadcast against one corpus scan (broadcast-NL,
    no big-side shuffle); the vote is a (query × k)-sized groupBy.
    With a larger query side, swap the candidate stage for the IVF
    cell join (``ivf_topk_seeded``) — the vote logic is unchanged.

    Output (vec_id, predicted_label, votes)."""
    from pyspark.sql import Window

    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    labeled = emb.filter(F.col("vec_id") >= n_queries)
    scored = labeled.crossJoin(F.broadcast(queries)).withColumn(
        "sim",
        F.round(
            dot_expr("q_emb", "embedding", dim)
            / (norm_expr("q_emb", dim) * norm_expr("embedding", dim)),
            6,
        ),
    )
    w_nn = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    nn = scored.withColumn("rk", F.row_number().over(w_nn)).filter(F.col("rk") <= k)
    votes = nn.groupBy("q_id", "label").agg(F.count(F.lit(1)).alias("votes"))
    w_v = Window.partitionBy("q_id").orderBy(F.col("votes").desc(), F.col("label").asc())
    return (
        votes.withColumn("pr", F.row_number().over(w_v))
        .filter(F.col("pr") == 1)
        .select(
            F.col("q_id").alias("vec_id"),
            F.col("label").alias("predicted_label"),
            "votes",
        )
    )


def label_centroid_count(emb: DataFrame, dim: int = EMB_DIM) -> DataFrame:
    """Per-label vector counts + exact (decimal-summed) centroid of the
    first component — demonstrates order-independent float aggregation:
    components go through DECIMAL(25,9) so the sum is exact regardless
    of partitioning, then back to double for output."""
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # cast the exact decimal sum to double BEFORE dividing —
            # decimal-division scale rules differ across engines
            (
                F.sum(F.expr("CAST(CAST(embedding[0] AS DOUBLE) AS DECIMAL(25,9))")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("centroid_c0"),
        )
        .withColumn("centroid_c0", F.round(F.col("centroid_c0"), 6))
    )


def _quant_code_expr(i: int, vec: str = "embedding", one_indexed: bool = False) -> str:
    """Int8 code for component ``i`` against per-dim [mn_i, mx_i] stats:
    floor((x - mn) / (mx - mn) * 256), clipped to 255 at x == mx, then
    shifted to [-128, 127]. floor-then-cast is the cross-engine-safe
    order — DuckDB rounds on CAST(double AS INT) while Spark truncates,
    but both agree on an already-integral double. Degenerate dims
    (mx == mn) code to 0."""
    x = f"CAST({vec}[{i + 1 if one_indexed else i}] AS DOUBLE)"
    return (
        f"CASE WHEN mx_{i} = mn_{i} THEN 0 ELSE "
        f"CAST(LEAST(255.0, FLOOR(({x} - mn_{i}) / (mx_{i} - mn_{i}) * 256.0)) AS INT)"
        f" - 128 END"
    )


def quantize_embeddings(emb: DataFrame, dim: int = EMB_DIM) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the storage /
    ANN-index compression step (4 bytes/float32 → 1 byte/component).
    Two passes: a per-dimension min/max aggregate collapses to ONE
    stats row (map-side combined — the shuffle carries one partial row
    per task), broadcast back so the encode pass is map-only and
    pipelines with the scan. The quantizer parameters being a
    broadcast-sized artifact is exactly how a deployed int8 index
    ships its calibration. All arithmetic is IEEE doubles + floor —
    bit-identical cross-engine (see _quant_code_expr).

    Output (vec_id, codes) with codes the comma-joined int8 values
    (driver-surface scalar serialization)."""
    stats = emb.agg(
        *[
            F.min(F.expr(f"CAST(embedding[{i}] AS DOUBLE)")).alias(f"mn_{i}")
            for i in range(dim)
        ],
        *[
            F.max(F.expr(f"CAST(embedding[{i}] AS DOUBLE)")).alias(f"mx_{i}")
            for i in range(dim)
        ],
    )
    codes = [F.expr(_quant_code_expr(i)) for i in range(dim)]
    return emb.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        F.concat_ws(",", *[c.cast("string") for c in codes]).alias("codes"),
    )


def quantize_sql(dim: int = EMB_DIM) -> str:
    """The DuckDB twin of ``quantize_embeddings`` (1-indexed lists)."""
    mins = ", ".join(
        f"min(CAST(embedding[{i + 1}] AS DOUBLE)) AS mn_{i}" for i in range(dim)
    )
    maxs = ", ".join(
        f"max(CAST(embedding[{i + 1}] AS DOUBLE)) AS mx_{i}" for i in range(dim)
    )
    codes = ", ".join(
        f"CAST(({_quant_code_expr(i, one_indexed=True)}) AS VARCHAR)"
        for i in range(dim)
    )
    return f"""
WITH stats AS (SELECT {mins}, {maxs} FROM embeddings)
SELECT vec_id, concat_ws(',', {codes}) AS codes
FROM embeddings, stats
"""


def l2_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    """Squared-L2 chain in SQL (1-indexed), same fold order as Spark."""
    return " + ".join(
        f"pow(CAST({a}[{i + 1}] AS DOUBLE) - CAST({b}[{i + 1}] AS DOUBLE), 2)"
        for i in range(dim)
    )


def ivf_topk_seeded(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = EMB_DIM,
    inline_max_cells: int = 256,
) -> DataFrame:
    """IVF top-k with SEEDED centroids: the coarse quantizer's
    centroids are the first ``n_cells`` vectors themselves (no Lloyd
    iterations) — a standard cheap IVF variant whose every step is a
    deterministic closed-form expression, so the DuckDB oracle can run
    the identical algorithm end-to-end (the k-means variant
    ``ivf_topk`` stays rows-only + recall-gated: MLlib isn't SQL).

    Scale shape: centroids are collected driver-side (n_cells×dim
    floats — metadata at any corpus scale, exactly like a deployed IVF
    index); cell assignment is a map-only pass over the corpus with NO
    shuffle; the candidate join is an equi-join on cell id bounded by
    probe volume. Ties everywhere break on the lower cell / vec_id.

    Assignment has two bit-identical physical forms, switched on
    ``inline_max_cells``: at small n_cells the centroids are baked
    into the expression as literal pow-chains (zero extra operators,
    whole-stage codegen); past the threshold that expression tree
    (n_cells × dim pow terms) would blow Catalyst codegen limits long
    before memory, so the centroids travel as DATA instead — one
    broadcast row holding array<array<double>>, distance =
    ``aggregate(zip_with(...))`` over it, expression tree CONSTANT in
    n_cells. Both forms fold dim terms left-to-right with the same
    pow/cast primitives, so they agree to the last bit (pinned in
    test_similarity.py) and the oracle needs no variant.
    """
    from pyspark.sql import Window

    seeds = (
        emb.filter(F.col("vec_id") < n_cells)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in seeds]

    def dist_exprs(col: str) -> list[Column]:
        return [
            F.expr(
                " + ".join(
                    f"pow(CAST({col}[{i}] AS DOUBLE) - CAST({c[i]!r} AS DOUBLE), 2)"
                    for i in range(dim)
                )
            )
            for c in cents
        ]

    if len(cents) <= inline_max_cells:
        attach = lambda df: df  # noqa: E731

        def darr(col: str) -> Column:
            return F.array(*dist_exprs(col))

    else:
        cent_df = emb.sparkSession.createDataFrame(
            [(cents,)], "_cents array<array<double>>"
        )
        attach = lambda df: df.crossJoin(F.broadcast(cent_df))  # noqa: E731

        def darr(col: str) -> Column:
            # same left fold as the literal chain: 0.0 + t0 + t1 + …
            # (0.0 + x ≡ x in IEEE for the non-negative pow terms)
            return F.transform(
                F.col("_cents"),
                lambda c: F.aggregate(
                    F.zip_with(
                        F.col(col).cast("array<double>"),
                        c,
                        lambda a, b: F.pow(a - b, F.lit(2.0)),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )

    d_corpus = darr("embedding")
    # first occurrence of the min = lowest cell id on ties
    cell = (F.array_position(d_corpus, F.array_min(d_corpus)) - 1).cast("int")
    assigned = attach(emb).select("vec_id", "embedding", cell.alias("cell"))

    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    q_cells = attach(queries).select(
        "q_id", "q_emb", F.posexplode(darr("q_emb")).alias("cell", "dist")
    )
    w_probe = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("cell").asc())
    probed = (
        q_cells.withColumn("pr", F.row_number().over(w_probe))
        .filter(F.col("pr") <= n_probe)
        .select("q_id", "q_emb", "cell")
    )

    cand = probed.join(assigned, "cell").filter(F.col("vec_id") != F.col("q_id"))
    scored = cand.withColumn(
        "sim",
        F.round(
            dot_expr("q_emb", "embedding", dim)
            / (norm_expr("q_emb", dim) * norm_expr("embedding", dim)),
            6,
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "sim", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = EMB_DIM,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means cells + probe the
    ``n_probe`` nearest cells per query, exact cosine inside them.

    Scale path: the corpus is scanned once to assign cells (model
    broadcast by MLlib); per query only ~n_probe/n_cells of the corpus
    is ranked — the candidate join is an equi-join on cell id, so
    shuffle is bounded by candidate volume, never O(Q×N). Centroids
    (n_cells × dim floats) live on the driver: metadata-sized at any
    corpus scale. Deterministic for a fixed seed and input.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    vecs = emb.withColumn("features", array_to_vector(F.col("embedding").cast("array<double>")))
    model = KMeans(k=n_cells, seed=42, featuresCol="features", predictionCol="cell").fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "embedding", "cell")

    # query → n_probe nearest cells (driver-side centroid math; tiny)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    spark = emb.sparkSession
    cent_rows = [(ci, [float(x) for x in c]) for ci, c in enumerate(centroids)]
    cent_df = spark.createDataFrame(cent_rows, "cell int, centroid array<double>")
    q_cell_dist = queries.crossJoin(F.broadcast(cent_df)).withColumn(
        "dist",
        F.expr(
            " + ".join(
                f"pow(CAST(q_emb[{i}] AS DOUBLE) - centroid[{i}], 2)" for i in range(dim)
            )
        ),
    )
    w_probe = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("cell").asc())
    probed = (
        q_cell_dist.withColumn("pr", F.row_number().over(w_probe))
        .filter(F.col("pr") <= n_probe)
        .select("q_id", "q_emb", "cell")
    )

    cand = probed.join(assigned, "cell").filter(F.col("vec_id") != F.col("q_id"))
    scored = cand.withColumn(
        "sim",
        F.round(
            dot_expr("q_emb", "embedding", dim)
            / (norm_expr("q_emb", dim) * norm_expr("embedding", dim)),
            6,
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "sim", "rank")
    )
