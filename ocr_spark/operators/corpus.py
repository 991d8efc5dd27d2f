"""Corpus-level training-data operators: benchmark decontamination,
TF-IDF salient terms, exact length percentiles, vocabulary statistics,
and deterministic train/val/test splits.

All pure Catalyst expressions (no Python UDFs) following the engine's
portability rules (see ocr_spark/queries.py module docstring): md5-hex
hashes only, integer counts, single IEEE divisions — every operator has
a bit-identical DuckDB oracle.

Scale design (the 100 TB story):

- **decontamination**: the eval-benchmark side is *small by nature*
  (a benchmark is curated, bounded data), so its distinct shingle set
  is collapsed to one array row and broadcast — the corpus pass is then
  MAP-ONLY (``array_intersect`` per doc, zero shuffle, zero explode of
  the corpus shingle stream). For eval sets too big for a single array
  (>~10^6 shingles), flip to the explode + broadcast-hash-join + re-agg
  shape (one shuffle) — same semantics, noted below.
- **tf-idf**: two partial-aggregated shuffles (term frequencies, doc
  frequencies); the document-frequency table is vocabulary-sized and
  broadcast back, so the scoring join is map-side; top-k per doc is one
  window on doc_id.
- **percentiles**: histogram-based exact percentiles — aggregate to
  (group, value) counts first (map-side combine shrinks the shuffle to
  #distinct values), then a cumulative window over the *tiny* histogram.
  Never sorts the raw rows; integer-only rank arithmetic (cum*10 >= p*total)
  avoids float thresholds. At 100 TB this beats both a global sort and
  percentile_disc-over-rows, and stays exact (approx_percentile is the
  lossy alternative, not needed).
- **vocab stats**: explode → one partially-aggregated shuffle on term →
  scalar re-agg of the vocabulary-sized table.
- **splits**: stateless md5 bucket per row — map-only, reproducible
  across runs/engines, no coordination (the property a 1000-executor
  split assignment needs).
- **broadcast marginals**: where a count floor provably bounds the
  broadcast side it is applied (``pmi_collocations`` pre-filters
  marginals to c_t >= min_count — output-invariant, cuts the Zipf
  tail); where the OUTPUT depends on the full vocabulary (tf-idf's
  dfreq, keyness's tf_c) the ``broadcast()`` hint is an optimization
  for realistic vocabulary sizes — at extreme vocabulary scale drop
  the hint and AQE falls back to a shuffled join on the token key
  with identical semantics.

Reference lineage: the reference has no corpus-level ops (single-doc
service); these generalize its routing/fingerprint semantics
(``OCR API 2/ocr_utils.py:15-41`` classify, J5 dedup-on-append) to the
corpus-preparation operations the north brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import token_count, tokens
from ocr_spark.operators.dedup import shingle_arrays

DEFAULT_EVAL_MOD = 41  # doc_id % mod == 0 designates the held-out eval docs


def decontaminate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    eval_mod: int = DEFAULT_EVAL_MOD,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    n-gram with the held-out eval slice (docs with id % eval_mod == 0
    stand in for a benchmark table; swap the filter for a real eval
    DataFrame in production).

    Output (doc_id, n_eval_shingles, contaminated) over the NON-eval
    docs. Map-only over the corpus: the eval shingle set is one
    broadcast array row, matched per-doc with ``array_intersect`` —
    the corpus-side shingle stream is never exploded or shuffled."""
    sh = shingle_arrays(df, text_col, id_col, n)
    eval_arr = (
        sh.filter(F.col("id") % eval_mod == 0)
        .select(F.explode("sh_arr").alias("s"))
        .agg(F.array_sort(F.collect_set("s")).alias("eval_sh"))
    )
    return (
        sh.filter(F.col("id") % eval_mod != 0)
        .crossJoin(F.broadcast(eval_arr))
        .select(
            F.col("id").alias(id_col),
            F.size(F.array_intersect("sh_arr", "eval_sh"))
            .cast("long")
            .alias("n_eval_shingles"),
        )
        .withColumn(
            "contaminated", (F.col("n_eval_shingles") > 0).cast("int")
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k salient terms per document by tf·(N/df) — the tf-idf
    ranking with a ratio idf (no log), keeping the score a single
    IEEE division + multiplication of exact integers so both engines
    agree bit-for-bit. Ranking ties break on the term string.

    Output (doc_id, term, tf, dfreq, score, rn)."""
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    from pyspark.sql.window import Window

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * (F.col("n_docs") / F.col("dfreq")))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tf", "dfreq", "score", "rn")
    )


def length_percentiles(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Exact p50/p90 of per-doc token counts per group, histogram
    formulation: aggregate to (group, n_tokens) counts (map-side
    combine → shuffle carries #distinct values, not #docs), cumulative
    window over that tiny histogram, then integer-rank pick
    (percentile_disc semantics: smallest value whose cumulative count
    reaches ceil(p·total), expressed as cum·10 >= p·10·total — no
    floats anywhere).

    Output (group, n_docs, p50_tokens, p90_tokens)."""
    from pyspark.sql.window import Window

    hist = (
        df.select(F.col(group_col).alias("grp"), token_count(F.col(text_col)).alias("n"))
        .groupBy("grp", "n")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy("grp"))
    )
    return cum.groupBy("grp").agg(
        F.max("total").alias("n_docs"),
        F.min(F.when(F.col("cum") * 10 >= F.col("total") * 5, F.col("n"))).alias(
            "p50_tokens"
        ),
        F.min(F.when(F.col("cum") * 10 >= F.col("total") * 9, F.col("n"))).alias(
            "p90_tokens"
        ),
    ).withColumnRenamed("grp", group_col)


def vocab_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary statistics in one row: total token count,
    distinct term count, hapax legomena count and fraction. One
    partially-aggregated shuffle on term, then a scalar re-agg of the
    vocabulary-sized table."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").alias("c"))
    return counts.agg(
        F.sum("c").alias("n_total_tokens"),
        F.count("*").alias("n_distinct_terms"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
    ).withColumn(
        "hapax_frac",
        F.round(F.col("n_hapax") / F.col("n_distinct_terms"), 6),
    )


def source_stats(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus diagnostics: doc count, distinct languages,
    distinct normalized texts (exact-dup check), majority language and
    its fraction, mean chars. The (source, lang) aggregate and the
    per-source aggregate are both partially aggregated map-side, so
    each shuffle carries #keys rows, not #docs; the two key-sized
    results meet in a broadcast join. Ratios are single IEEE divisions
    of exact integers (bit-identical cross-engine); majority-lang ties
    break lexicographically (the A5 mode rule).

    Output (source, n_docs, n_langs, n_unique_texts, top_lang,
    top_lang_frac, avg_chars)."""
    from pyspark.sql.window import Window

    from ocr_spark.functions.text import fingerprint

    per_lang = df.groupBy(source_col, lang_col).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(source_col).orderBy(F.desc("cnt"), F.asc(lang_col))
    top = (
        per_lang.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            source_col,
            F.col(lang_col).alias("top_lang"),
            F.col("cnt").alias("top_cnt"),
        )
    )
    tot = df.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(lang_col).alias("n_langs"),
        F.countDistinct(fingerprint(F.col(text_col))).alias("n_unique_texts"),
        F.sum("n_chars").alias("sum_chars"),
    )
    return tot.join(F.broadcast(top), source_col).select(
        source_col,
        "n_docs",
        "n_langs",
        "n_unique_texts",
        "top_lang",
        F.round(F.col("top_cnt") / F.col("n_docs"), 6).alias("top_lang_frac"),
        F.round(F.col("sum_chars") / F.col("n_docs"), 6).alias("avg_chars"),
    )


def cross_source_overlap(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 3,
    max_sources: int = 10,
) -> DataFrame:
    """Cross-source contamination matrix: for each source pair, the
    number of distinct word n-gram shingles both emit — the mirror /
    syndicated-content detector for multi-crawl corpora. Inverted-index
    shape: distinct (shingle, source) postings, a count window on the
    same key bounds each posting list to ``max_sources`` (shingles in
    nearly every source carry no dup signal and would dominate the
    join fan-out — the identical skew guard as LSH's ``max_bucket``),
    then a per-shingle self-join grouped to the #sources²-sized matrix.
    Per-shingle fan-out is hard-capped at C(max_sources, 2); the
    discard is quantified by ``cap_drop_stats`` (surfaced as the
    ``cap_drop_accounting`` driver query), not silent.

    Output (source_a, source_b, n_shared_shingles)."""
    from pyspark.sql.window import Window

    from ocr_spark.functions.text import word_shingles

    postings = (
        df.select(
            F.col(source_col).alias("src"),
            F.explode(word_shingles(F.col(text_col), n)).alias("s"),
        )
        .distinct()
    )
    w = Window.partitionBy("s")
    bounded = (
        postings.withColumn("n_src", F.count(F.lit(1)).over(w))
        .filter((F.col("n_src") >= 2) & (F.col("n_src") <= max_sources))
        .select("src", "s")
    )
    return (
        bounded.alias("a")
        .join(bounded.alias("b"), "s")
        .filter(F.col("a.src") < F.col("b.src"))
        .groupBy(
            F.col("a.src").alias("source_a"), F.col("b.src").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def cap_drop_stats(
    postings: DataFrame, key_col: str, cap: int, name: str
) -> DataFrame:
    """Drop accounting for a posting-cap skew guard: ONE summary row
    quantifying exactly what a ``count(key) <= cap`` filter discards —
    the caps themselves (winnow_overlap_pairs' ``max_postings``,
    cross_source_overlap's ``max_sources``, LSH ``max_bucket``) trade
    recall for a hard join-fan-out bound, and a user sizing that trade
    at THEIR corpus scale needs the discard quantified, not silent.

    Output (cap_name, cap_value, n_keys, n_keys_dropped, n_postings,
    n_postings_dropped). One groupBy + one all-to-one aggregate over
    key-sized rows — strictly cheaper than the capped operator it
    audits, so it can run alongside every production invocation."""
    counts = postings.groupBy(key_col).agg(F.count(F.lit(1)).alias("c"))
    dropped = F.col("c") > cap
    return counts.agg(
        F.lit(name).alias("cap_name"),
        F.lit(cap).cast("int").alias("cap_value"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(dropped.cast("int")).cast("long").alias("n_keys_dropped"),
        F.sum("c").cast("long").alias("n_postings"),
        F.sum(F.when(dropped, F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_postings_dropped"),
    )


def weighted_sample(
    df: DataFrame,
    k: int = 20,
    weight_col: str = "weight",
    group_col: str = "source",
    id_col: str = "doc_id",
    max_weight: int = 16,
) -> DataFrame:
    """Deterministic weighted sampling without replacement, k per
    group (Efraimidis & Spirakis 2006, A-ES): rank items by a key
    whose distribution is u^(1/w) and keep the top k — each item's
    inclusion probability is proportional to its weight.

    Transcendental-free determinism: for INTEGER weights the A-ES key
    u^(1/w) is equal in distribution to the MAX of w independent
    uniforms (CDF x^w both ways), so the key here is
    ``max_{i=1..w} md5int(id|i)`` — pure md5 + integer compare, no
    pow/ln whose 1-ulp libm differences could flip ranks between
    engines. Weights clamp to [1, max_weight]; the key loop is O(w)
    md5 calls inside one map-side projection.

    Scale shape: the only wide operation is the per-group top-k
    window — one shuffle on ``group_col`` followed by Spark's
    external (spill-safe) sort; sampling keys are uniform by
    construction, so there is no key-space skew, and group skew is
    absorbed by the sort's spilling rather than any collect. This is
    the coordination-free mixture-sampling primitive: at any corpus
    scale each row computes its own key from its id alone, so the
    sample is reproducible and append-stable (new rows never perturb
    existing keys — only the top-k cut line moves).

    Output (id_col, group_col, weight, sample_rank), sample_rank in
    [1, k] by descending key (ties break on id). The [1, max_weight]
    clamp is a silent distortion for any corpus whose weights exceed
    it (a weight-40 doc samples like weight-16, 2.5× under its nominal
    inclusion odds) — ``weighted_sample_clamp_stats`` is the
    cap_drop_stats-style accounting row that quantifies exactly that
    at the caller's corpus scale; raise max_weight when its
    weight_mass delta matters (the key loop cost grows O(max_weight)
    md5 calls per row)."""
    from pyspark.sql import Window

    w_clamped = F.greatest(
        F.lit(1), F.least(F.col(weight_col).cast("int"), F.lit(max_weight))
    )
    key = F.array_max(
        F.transform(
            F.sequence(F.lit(1), w_clamped),
            lambda i: F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("wrs|"),
                            F.col(id_col).cast("string"),
                            F.lit("|"),
                            i.cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint"),
        )
    )
    keyed = df.select(
        id_col, group_col, w_clamped.alias("weight"), key.alias("_key")
    )
    win = Window.partitionBy(group_col).orderBy(
        F.col("_key").desc(), F.col(id_col).asc()
    )
    return (
        keyed.withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
        .select(id_col, group_col, "weight", "sample_rank")
    )


def weighted_sample_clamp_stats(
    df: DataFrame,
    weight_col: str = "weight",
    max_weight: int = 16,
    name: str = "weighted_sample_max_weight",
) -> DataFrame:
    """Accounting row for ``weighted_sample``'s [1, max_weight] weight
    clamp — the quantified answer to "does the cap change MY sampling
    distribution?": how many rows clamp (high and low), the heaviest
    raw weight seen, and the total weight mass before vs after the
    clamp (their delta is exactly the inclusion-probability mass the
    cap redistributes). Mirrors ``cap_drop_stats``'s contract: one
    all-to-one aggregate over already-computed columns, strictly
    cheaper than the sampler it audits, integer-exact on both engines.

    The clamped-mass term uses the sampler's own clamp expression
    verbatim, so the accounting can never drift from the behavior it
    reports on."""
    w = F.col(weight_col).cast("int")
    clamped = F.greatest(F.lit(1), F.least(w, F.lit(max_weight)))
    return df.agg(
        F.lit(name).alias("cap_name"),
        F.lit(max_weight).cast("int").alias("cap_value"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((w > max_weight).cast("int")).cast("long").alias("n_clamped_high"),
        F.sum((w < 1).cast("int")).cast("long").alias("n_clamped_low"),
        F.sum(w.isNull().cast("int")).cast("long").alias("n_null_weight"),
        F.max(w).cast("long").alias("max_weight_seen"),
        F.sum(w).cast("long").alias("weight_mass_raw"),
        F.sum(clamped).cast("long").alias("weight_mass_clamped"),
    )


def boilerplate_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 4,
    max_docs: int = 4,
) -> DataFrame:
    """CCNet-style corpus-frequency boilerplate removal: segments that
    recur across more than ``max_docs`` documents (headers, footers,
    navigation chrome, license blurbs) are dropped from every document
    and the text is reassembled from the surviving segments in order.
    CCNet's removal unit is the paragraph; for unstructured single-line
    text the unit is a fixed non-overlapping ``seg_tokens``-token window
    (``chunk_structs`` with window == stride).

    Scale shape: segment rows are token-sized (not char-sized), the
    frequency count is one partially-aggregated shuffle on the segment
    key, and the boilerplate set — frequency-capped by definition — is
    broadcast so the scrub join is map-side. Reassembly is one shuffle
    on the doc id (collect_list + array_sort, no per-doc window). At
    100 TB only the two key-sized aggregates shuffle; if the
    boilerplate set ever outgrew the broadcast threshold the same plan
    works as a shuffle hash join.

    Output (doc_id, clean_text, n_seg_kept, n_seg_dropped)."""
    from ocr_spark.functions.text import chunk_structs

    segs = df.select(
        F.col(id_col),
        F.posexplode(
            chunk_structs(F.col(text_col), window=seg_tokens, stride=seg_tokens)
        ).alias("pos", "c"),
    ).select(id_col, "pos", F.col("c.chunk_text").alias("seg"))
    boiler = (
        segs.groupBy("seg")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") > max_docs)
        .select("seg", F.lit(1).alias("bp"))
    )
    marked = segs.join(F.broadcast(boiler), "seg", "left")
    kept = F.col("bp").isNull()
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.when(kept, F.struct("pos", "seg")))),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.when(kept, 1)).alias("n_seg_kept"),
        F.count(F.when(~kept, 1)).alias("n_seg_dropped"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    capacity: int = 256,
) -> DataFrame:
    """Concat-and-split sequence packing — the pretraining step that
    lays documents end-to-end into fixed ``capacity``-token context
    windows. Packing is per shard (``shard_col``), the way a real
    pipeline packs within an input shard so 1000 executors pack 1000
    shards with zero coordination: a running token total over
    (shard, doc_id) order places each document at an absolute stream
    offset, and integer division by ``capacity`` yields its first bin,
    offset within it, and how many bins it spans. One shuffle (the
    per-shard window sort); all arithmetic exact integers.

    A global (single-window) pack would serialize on one partition at
    scale — per-shard packing is the deliberate design point, not a
    shortcut; bins never mix shards, which is also what source-weighted
    sampling needs downstream.

    Output (source, doc_id, n_tokens, bin_id, bin_offset, n_bins)."""
    from pyspark.sql.window import Window

    from ocr_spark.functions.text import token_count

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nt = token_count(F.col(text_col)).cast("long")
    return (
        df.select(shard_col, id_col, nt.alias("n_tokens"))
        .withColumn("cum", F.sum(F.col("n_tokens")).over(w))
        .select(
            shard_col,
            id_col,
            "n_tokens",
            F.expr(f"(cum - n_tokens) DIV {capacity}").alias("bin_id"),
            ((F.col("cum") - F.col("n_tokens")) % capacity).alias("bin_offset"),
            F.expr(
                f"(cum - 1) DIV {capacity} - (cum - n_tokens) DIV {capacity} + 1"
            ).alias("n_bins"),
        )
    )


def script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document character-class profile — the script/charset gate of
    a multilingual ingest (mojibake and wrong-charset docs show up as
    high ``other_frac``). Counts are length deltas under global
    regexp_replace with explicit character classes (identical Java
    regex / RE2 semantics; ``\\s`` differs between the engines so the
    whitespace class is spelled out). Map-only, zero shuffle, zero
    Python; fractions are single IEEE divisions of exact ints.

    Output (doc_id, n_chars, latin_frac, digit_frac, space_frac,
    other_frac)."""

    def cnt(cls: str):
        t = F.col(text_col)
        return F.length(t) - F.length(F.regexp_replace(t, cls, ""))

    n = F.length(F.col(text_col))
    latin, digit, space = cnt("[A-Za-z]"), cnt("[0-9]"), cnt("[ \\t\\n\\r]")
    return df.select(
        "doc_id",
        n.cast("long").alias("n_chars"),
        F.round(latin / n, 6).alias("latin_frac"),
        F.round(digit / n, 6).alias("digit_frac"),
        F.round(space / n, 6).alias("space_frac"),
        F.round((n - latin - digit - space) / n, 6).alias("other_frac"),
    )


def source_mixture_weights(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Temperature-based source mixing (multilingual-pretraining
    sampling, α = 0.5): raw source probabilities p_i from exact token
    counts, smoothed w_i = sqrt(p_i) (sqrt, unlike pow, is IEEE
    correctly-rounded — bit-identical cross-engine), normalized over
    sources. The normalizer folds the per-source weights in sorted
    source order via an explicit left fold, so the double sum has ONE
    evaluation order on any engine and any partitioning — the
    order-independence trick the DECIMAL sums use, transplanted to
    doubles. Per-source token counts partially aggregate map-side; the
    source table is metadata-sized, so the normalize step is a
    broadcast of one row.

    Output (source, n_tokens, p_raw, weight, sample_mult) where
    sample_mult = weight / p_raw is the per-source over/undersampling
    factor."""
    from ocr_spark.functions.text import token_count

    s = df.groupBy("source").agg(
        F.sum(token_count(F.col(text_col)).cast("long")).alias("n_tokens")
    )
    tot = s.agg(F.sum("n_tokens").alias("t"))
    r = s.crossJoin(F.broadcast(tot)).withColumn(
        "wr", F.sqrt(F.col("n_tokens") / F.col("t"))
    )
    z = r.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "wr"))),
            F.lit(0.0),
            lambda acc, x: acc + x["wr"],
        ).alias("z")
    )
    return r.crossJoin(F.broadcast(z)).select(
        "source",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("t"), 6).alias("p_raw"),
        F.round(F.col("wr") / F.col("z"), 6).alias("weight"),
        F.round(
            (F.col("wr") / F.col("z")) / (F.col("n_tokens") / F.col("t")), 6
        ).alias("sample_mult"),
    )


def unigram_commonness(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-LM quality signal (the CCNet/KenLM perplexity filter's
    exact-arithmetic analogue): score each document by the mean
    document-frequency of its token occurrences — gibberish and
    wrong-language docs are rare-token-heavy and score low. A log-prob
    perplexity would need transcendental ``ln`` whose last-ulp varies
    between engines (libm vs JVM intrinsics), which the exact-parity
    gate disallows; the linear-space mean carries the same ordering
    signal with exact integer arithmetic: sum_df is an exact long sum
    (order-free), and the score is ONE IEEE division
    sum_df / (n_docs * n_tokens) — bit-identical on any engine, any
    partitioning.

    Scale: the doc-frequency table is vocabulary-sized (one partially
    aggregated shuffle over distinct (doc, token) pairs) and broadcast
    back, so scoring is a map-side join; the only corpus-sized shuffle
    is the per-doc re-aggregation. Same two-shuffle shape as TF-IDF.

    Output (doc_id, n_tokens, sum_df, common_score)."""
    from ocr_spark.functions.text import tokens

    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t"))
    dfreq = tok.groupBy("t").agg(F.countDistinct(id_col).alias("dfc"))
    n_docs = df.agg(F.count(F.lit(1)).alias("nd"))
    return (
        tok.join(F.broadcast(dfreq), "t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("dfc").alias("sum_df"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "n_tokens",
            "sum_df",
            F.round(
                F.col("sum_df") / (F.col("nd") * F.col("n_tokens")), 6
            ).alias("common_score"),
        )
    )


def train_val_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_lt: int = 230,
    val_lt: int = 243,
) -> DataFrame:
    """Deterministic hash split: first md5 byte of the id buckets each
    doc into train (<230 ≈ 90%), val (<243 ≈ 5%), test (rest ≈ 5%).
    Stateless and engine-portable — the same doc lands in the same
    split on any cluster, any run, any engine (the reproducibility
    property a distributed split assignment needs; no sampling RNG).

    Output (doc_id, bucket, split)."""
    b = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10).cast(
        "int"
    )
    return df.select(
        F.col(id_col),
        b.alias("bucket"),
    ).withColumn(
        "split",
        F.when(F.col("bucket") < train_lt, "train")
        .when(F.col("bucket") < val_lt, "val")
        .otherwise("test"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Corpus version diff: per-source added / removed / changed /
    unchanged counts between two snapshots — the CDC primitive an
    iteratively-rebuilt training corpus needs (what changed since the
    last cut, and where).

    Shape: each side collapses to (id, source, md5 fingerprint) at
    scan time — the full-outer join shuffles key-sized rows, never
    text — then one per-source conditional aggregation. At 100 TB,
    bucket both snapshot tables by id (sources/bucketing.py) and the
    join becomes a shuffle-free zip of co-located partitions.

    Output (source, n_added, n_removed, n_changed, n_unchanged)."""
    o = old.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("src_o"),
        F.md5(F.col(text_col)).alias("fp_o"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("src_n"),
        F.md5(F.col(text_col)).alias("fp_n"),
    )
    status = (
        F.when(F.col("fp_o").isNull(), "added")
        .when(F.col("fp_n").isNull(), "removed")
        .when(F.col("fp_o") != F.col("fp_n"), "changed")
        .otherwise("unchanged")
    )
    return (
        o.join(n, "id", "full_outer")
        .select(F.coalesce("src_n", "src_o").alias("source"), status.alias("st"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("st") == "added", 1).otherwise(0)).alias("n_added"),
            F.sum(F.when(F.col("st") == "removed", 1).otherwise(0)).alias("n_removed"),
            F.sum(F.when(F.col("st") == "changed", 1).otherwise(0)).alias("n_changed"),
            F.sum(F.when(F.col("st") == "unchanged", 1).otherwise(0)).alias(
                "n_unchanged"
            ),
        )
    )


def materialize_mixture(
    df: DataFrame,
    base_rate: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Turn the temperature mixing WEIGHTS into an actual sampling
    PASS: per-source keep rate = min(1, base_rate × sample_mult) from
    ``source_mixture_weights``, applied as a deterministic Bernoulli
    draw — the doc's md5-derived 32-bit uniform against the rate's
    integer threshold. No RNG state anywhere: any executor, any retry,
    any engine draws the same verdict for the same doc (the same
    coordination-free trick as ``train_val_split``), which is what
    makes a 100 TB sampling pass resumable and auditable. The weights
    table is source-cardinality metadata → broadcast; the corpus pass
    is map-only after it.

    Output: (id, source, keep_rate, is_kept) for every doc."""
    w = source_mixture_weights(df, text_col).select("source", "sample_mult")
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix|"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    # NO rounding on the rate: base_rate × sample_mult is one IEEE
    # multiply on a double both engines already hold bit-identically
    # (sample_mult is the round-6 output column) — rounding HERE would
    # re-create exact 7th-decimal ties (0.5 × a 6-dp value), which the
    # engines break differently. One multiply, zero rounds, identical.
    rate = F.least(F.lit(1.0), F.lit(base_rate) * F.col("sample_mult"))
    return (
        df.select(id_col, "source")
        .join(F.broadcast(w), "source")
        .withColumn("keep_rate", rate)
        .withColumn(
            "is_kept",
            u32
            < F.floor(F.col("keep_rate") * F.lit(4294967296.0)).cast("long"),
        )
        .select(id_col, "source", "keep_rate", "is_kept")
    )


def source_top_terms(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    min_tf: int = 5,
) -> DataFrame:
    """Distinctive terms PER SOURCE by keyness — the relative-frequency
    ratio (tf_s/N_s)/(tf_c/N_c) corpus linguists use to answer "what
    does this source talk about that the rest of the corpus doesn't"
    (complements ``tfidf_top_terms``, which is per-document salience).
    Score = one IEEE division of two exact BIGINT cross-products
    (tf_s·N_c and N_s·tf_c — both < 2^53 at any plausible vocab, so
    the doubles are exact) — bit-identical cross-engine, rank ties
    break on the term string. ``min_tf`` suppresses hapax noise.

    Shuffles: one partial-agg on (source, term); the term-marginal and
    source-marginal tables re-aggregate from it (vocab- and
    source-sized) and broadcast back; the top-k window partitions by
    source over the vocab-bounded scored table."""
    toks = df.select("source", F.explode(tokens(F.col(text_col))).alias("term"))
    tfs = toks.groupBy("source", "term").agg(F.count("*").alias("tf_s"))
    tot_s = tfs.groupBy("source").agg(F.sum("tf_s").alias("n_s"))
    tfc = tfs.groupBy("term").agg(F.sum("tf_s").alias("tf_c"))
    n_c = tot_s.agg(F.sum("n_s").alias("n_c"))
    from pyspark.sql.window import Window

    scored = (
        tfs.filter(F.col("tf_s") >= min_tf)
        .join(F.broadcast(tfc), "term")
        .join(F.broadcast(tot_s), "source")
        .crossJoin(F.broadcast(n_c))
        .withColumn(
            "keyness", (F.col("tf_s") * F.col("n_c")) / (F.col("n_s") * F.col("tf_c"))
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("keyness"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "source",
            "term",
            "tf_s",
            "tf_c",
            F.round("keyness", 6).alias("keyness"),
            "rn",
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Collocation mining: the corpus's most-associated adjacent word
    pairs by pointwise mutual information — the classic phrase
    detector (Church & Hanks 1990; word2vec's phrase pass uses the
    same statistic). Complements tfidf_top_terms / source_top_terms
    (which rank single terms per doc/source) with corpus-global
    MULTI-word units — the vocabulary entries a tokenizer or phrase
    normalizer should treat as one symbol.

    Exact-parity arithmetic: PMI = log of n_total·c(xy) / (c(x)·c(y)),
    and log is monotone, so ranking by the RATIO is ranking by PMI —
    and the ratio is two exact BIGINT products (each < 2^53 here;
    at extreme corpus scale lift them to DECIMAL(38,0)) meeting in ONE
    IEEE division, bit-identical on any engine — no transcendental
    ``ln`` whose last ulp varies between libm builds (same dodge as
    unigram_commonness). min_count floors the classic PMI rare-pair
    pathology (a 1-occurrence pair of two 1-occurrence words scores
    maximal PMI).

    Shape: one corpus-sized partial-agg shuffle for bigram counts, one
    for unigram counts (vocabulary-sized output); unigram marginals
    then broadcast-join back onto the min_count-survivor bigrams, and
    the final top_n window sorts only the survivor table. No shuffle
    carries document text. The broadcast side is NOT the full
    vocabulary: a surviving bigram needs c(xy) >= min_count, and
    c(x) >= c(xy), so marginals are pre-filtered to c_t >= min_count —
    provably output-invariant, and it cuts the hapax-dominated Zipf
    tail (the bulk of distinct types in a web corpus) before the
    broadcast. n_total still sums the UNFILTERED counts. If the
    filtered marginal table still exceeds broadcast size at extreme
    vocabulary scale, drop the two broadcast() hints and let AQE pick
    a sort-merge join on the token key — the semantics don't move.

    Output (bigram, c_xy, c_x, c_y, pmi_ratio, rank), rank 1..top_n by
    (ratio desc, bigram asc) — a total order, so ties are stable.
    """
    from pyspark.sql import Window

    w = tokens(F.col(text_col))
    pairs = (
        df.select(w.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS x, toks[i] AS y))"
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
    )
    uni = (
        df.select(F.explode(w).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    n_total = uni.agg(F.sum("c_t").alias("n_total"))
    # output-invariant broadcast bound: c(x) >= c(xy) >= min_count for
    # every surviving bigram, so sub-min_count marginals can't join
    marg = uni.filter(F.col("c_t") >= min_count)
    big = (
        pairs.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    scored = (
        big.join(F.broadcast(marg.withColumnRenamed("t", "x")), "x")
        .withColumnRenamed("c_t", "c_x")
        .join(F.broadcast(marg.withColumnRenamed("t", "y")), "y")
        .withColumnRenamed("c_t", "c_y")
        .crossJoin(F.broadcast(n_total))
        .select(
            F.concat_ws(" ", "x", "y").alias("bigram"),
            "c_xy",
            "c_x",
            "c_y",
            F.round(
                (F.col("n_total") * F.col("c_xy")).cast("double")
                / (F.col("c_x") * F.col("c_y")).cast("double"),
                6,
            ).alias("pmi_ratio"),
        )
    )
    rk = Window.orderBy(F.desc("pmi_ratio"), "bigram")
    return (
        scored.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= top_n)
        .select("bigram", "c_xy", "c_x", "c_y", "pmi_ratio", "rank")
    )


def bpe_merge_candidates(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 30,
    min_count: int = 5,
) -> DataFrame:
    """Tokenizer-training primitive: the first BPE merge step's pair
    statistics (Sennrich et al. 2016) — adjacent character-pair counts
    over the corpus, each word's pairs weighted by the word's corpus
    frequency. The top pair IS the first merge a BPE trainer would
    learn; re-running on re-segmented vocab yields the next, so this
    one operator is the fixed point of the whole training loop.

    Shape — the reason this scales: corpus text is touched ONCE, by
    the word-count aggregation (partial-agg shuffle, vocabulary-sized
    output). The quadratic-looking pair explosion then runs on the
    VOCABULARY table (distinct words × avg word length rows — millions,
    not trillions), and the final rank filter compiles to a
    window-group-limit. Pure integer sums end to end.

    Output (pair, lhs, rhs, pair_count, rank), rank 1..top_n by
    (count desc, pair asc)."""
    from pyspark.sql import Window

    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = vocab.select(
        "wc",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> struct(substr(word, i, 1) AS l,"
                " substr(word, i + 1, 1) AS r))"
            )
        ).alias("p"),
    ).select("p.l", "p.r", "wc")
    counted = (
        pairs.groupBy("l", "r")
        .agg(F.sum("wc").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
        .select(
            F.concat("l", "r").alias("pair"),
            F.col("l").alias("lhs"),
            F.col("r").alias("rhs"),
            "pair_count",
        )
    )
    rk = Window.orderBy(F.desc("pair_count"), "pair")
    return (
        counted.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= top_n)
        .select("pair", "lhs", "rhs", "pair_count", "rank")
    )


def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law vocabulary-growth diagnostic: distinct-term and
    token totals for the corpus prefix at 25/50/75/100% of the id
    space — the curve that says whether a corpus is still finding new
    vocabulary (healthy growth) or has flattened into repetition, and
    the empirical basis for sizing a tokenizer's vocab against planned
    corpus growth.

    Shape — no global sort, no per-checkpoint rescan: each term's
    contribution to every prefix is fully determined by its FIRST
    occurrence, so one vocab-sized shuffle computes
    ``min(doc_id) per term`` (map-side combined), and the four
    checkpoints are conditional aggregations over that vocabulary
    table plus one map-only conditional-sum pass for doc/token
    totals. Checkpoint thresholds come from ``max(doc_id)`` (scalar
    agg). Integer arithmetic throughout; the Heaps ratio is one IEEE
    division per row.

    Output (pct, id_threshold, n_docs, n_tokens, n_distinct_terms,
    heaps_ratio) — one row per checkpoint, pct in {25,50,75,100}."""
    toks = df.select(F.col(id_col).alias("did"), tokens(F.col(text_col)).alias("w"))
    max_id = df.agg(F.max(F.col(id_col)).alias("mid"))
    first_seen = (
        toks.select("did", F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.min("did").alias("fs"))
    )
    pcts = df.sparkSession.range(1, 5).select(
        (F.col("id") * 25).cast("int").alias("pct")
    )
    thresholds = pcts.crossJoin(F.broadcast(max_id)).select(
        "pct", F.floor(F.col("mid") * F.col("pct") / 100).alias("id_threshold")
    )
    vocab_at = (
        first_seen.crossJoin(F.broadcast(thresholds))
        .groupBy("pct", "id_threshold")
        .agg(
            F.sum(F.when(F.col("fs") <= F.col("id_threshold"), 1).otherwise(0))
            .alias("n_distinct_terms")
        )
    )
    totals_at = (
        toks.select("did", F.size("w").alias("nt"))
        .crossJoin(F.broadcast(thresholds))
        .groupBy("pct", "id_threshold")
        .agg(
            F.sum(F.when(F.col("did") <= F.col("id_threshold"), 1).otherwise(0))
            .alias("n_docs"),
            F.sum(
                F.when(F.col("did") <= F.col("id_threshold"), F.col("nt")).otherwise(0)
            ).alias("n_tokens"),
        )
    )
    return (
        vocab_at.join(totals_at, ["pct", "id_threshold"])
        .select(
            "pct",
            "id_threshold",
            "n_docs",
            "n_tokens",
            "n_distinct_terms",
            F.round(F.col("n_distinct_terms") / F.col("n_tokens"), 6).alias(
                "heaps_ratio"
            ),
        )
    )
