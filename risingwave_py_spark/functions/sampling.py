"""Deterministic sampling operators for training-data curation
(BASELINE.json extension surface; runs over the `documents` fixture).

Real corpus pipelines never use RNG-based TABLESAMPLE for the splits
that matter: a sample must be REPRODUCIBLE (same rows on every rerun,
every engine, any partitioning) and CONSISTENT (a doc's split
assignment never changes when the corpus grows). The standard tool is
hash-mod bucketing on a stable key — which is also the Spark-friendly
tool:

  - uniform sampling is a pure projection-level filter (no shuffle,
    no RNG state, trivially parallel over 100 TB; the md5 cost is
    per-row constant inside whole-stage codegen);
  - split assignment (train/valid/test) is the same filter three
    ways — a doc's bucket depends only on its key, so incremental
    corpus additions never migrate old docs between splits;
  - stratified per-group quotas use one ranked window per stratum
    (single shuffle on the stratum key). Strata in curation are
    low-cardinality (language, source, license), so the window
    partitions are few and large — exactly the shape AQE handles, and
    a hot stratum degrades one task, not the job.

Portable hashing convention (shared with functions/dedup.py): 32-bit
hash = first 8 hex digits of md5 — bit-identical in Spark and DuckDB,
so every sampling decision here is oracle-checkable row for row.

Reference parity note: the reference SDK (risingwave-py core.py) has
no sampling surface — this is part of the large-scale-pipeline
extension mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from risingwave_py_spark.catalog import fanout, table
from risingwave_py_spark.functions.text import duck_hash32, spark_hash32
from risingwave_py_spark.registry import register

# Sampling rate = SAMPLE_NUM / SAMPLE_DEN buckets kept.
SAMPLE_NUM = 50
SAMPLE_DEN = 1000
QUOTA_PER_STRATUM = 20
# train/valid/test = 90/5/5 by hash bucket out of 100.
VALID_LO, TEST_LO = 90, 95


def _spark_bucket(key_sql: str, den: int) -> str:
    return f"pmod({spark_hash32(key_sql)}, {den})"


def _duck_bucket(key_sql: str, den: int) -> str:
    return f"({duck_hash32(key_sql)} % {den})"


@register(
    "sample_uniform_hash",
    oracle=f"""
    SELECT doc_id, lang, source,
           {_duck_bucket("CAST(doc_id AS VARCHAR)", SAMPLE_DEN)} AS bucket
    FROM documents
    WHERE {_duck_bucket("CAST(doc_id AS VARCHAR)", SAMPLE_DEN)} < {SAMPLE_NUM}
    """,
)
def sample_uniform_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform 5% sample by hash-mod bucketing on the
    stable key. Scale: a pure scan+filter — no shuffle, no driver
    state, reproducible under any partitioning; at 100 TB this runs at
    full scan bandwidth and the same predicate re-selects the same
    rows on the next run."""
    d = table(spark, sf_dir, "documents")
    bucket = F.expr(_spark_bucket("CAST(doc_id AS STRING)", SAMPLE_DEN))
    return (
        d.select("doc_id", "lang", "source", bucket.alias("bucket"))
        .filter(F.col("bucket") < SAMPLE_NUM)
    )


@register(
    "sample_stratified_quota",
    oracle=f"""
    SELECT lang, doc_id, pick_rank
    FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {_duck_bucket("CAST(doc_id AS VARCHAR)", 2147483647)}, doc_id
               ) AS pick_rank
        FROM documents
    ) r
    WHERE pick_rank <= {QUOTA_PER_STRATUM}
    """,
)
def sample_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: a fixed quota of docs per language,
    chosen by hash rank (NOT by doc_id order — hash rank makes the
    pick uniform within each stratum while staying deterministic).
    Scale: one window shuffle keyed on the stratum column; quota
    selection is rank<=k inside each partition, so only k rows per
    stratum survive the exchange. For very hot strata the two-phase
    variant (per-partition top-k, then global top-k — same shape as
    agg_salted_skew) bounds task memory; row_number itself streams in
    O(1) memory per partition."""
    d = table(spark, sf_dir, "documents")
    hrank = F.expr(_spark_bucket("CAST(doc_id AS STRING)", 2147483647))
    w = Window.partitionBy("lang").orderBy(hrank.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("pick_rank"))
        .filter(F.col("pick_rank") <= QUOTA_PER_STRATUM)
    )


@register(
    "sample_split_assign",
    oracle=f"""
    WITH assigned AS (
        SELECT lang,
               CASE WHEN {_duck_bucket("CAST(doc_id AS VARCHAR)", 100)} >= {TEST_LO} THEN 'test'
                    WHEN {_duck_bucket("CAST(doc_id AS VARCHAR)", 100)} >= {VALID_LO} THEN 'valid'
                    ELSE 'train' END AS split
        FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs
    FROM assigned
    GROUP BY lang, split
    """,
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/valid/test split assignment (90/5/5) by hash bucket,
    audited per language. A doc's bucket depends only on doc_id, so
    re-running after the corpus grows never moves an old doc across
    splits (no leakage of eval docs into train). Scale: assignment is
    projection-only; the audit is one partial-agg groupBy over
    (lang, split) — dozens of groups cross the wire regardless of
    corpus size."""
    d = table(spark, sf_dir, "documents")
    bucket = F.expr(_spark_bucket("CAST(doc_id AS STRING)", 100))
    split = (
        F.when(bucket >= TEST_LO, F.lit("test"))
        .when(bucket >= VALID_LO, F.lit("valid"))
        .otherwise(F.lit("train"))
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


MIX_BUDGET_FRACTION = 2  # token budget = total_tokens / 2


@register(
    "corpus_mixture_plan",
    oracle=rf"""
    WITH tok AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
                   AS n_tokens,
               CASE WHEN CAST(substring(source, 4) AS INT) < 10
                    THEN 1 ELSE 3 END AS weight
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(weight) AS BIGINT) AS total_weight
        FROM tok
    )
    SELECT source, n_docs, n_tokens, weight,
           CAST(floor((total_tokens / {MIX_BUDGET_FRACTION}.0) * weight
                      / total_weight) AS BIGINT) AS target_tokens,
           round(((total_tokens / {MIX_BUDGET_FRACTION}.0) * weight
                  / total_weight) / n_tokens, 6) AS sample_rate,
           CASE WHEN ((total_tokens / {MIX_BUDGET_FRACTION}.0) * weight
                      / total_weight) > n_tokens
                THEN 'upsample' ELSE 'downsample' END AS mode
    FROM tok, tot
    ORDER BY source
    """,
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixture planning: given per-source target weights
    (curated sources src10+ get 3x the weight of web sources src0-9)
    and a token budget of total/{MIX_BUDGET_FRACTION}, compute each
    source's target token count and the sampling rate (>1 = epochs of
    upsampling) that realizes the mixture — the standard precursor to
    `sample_uniform_hash`-style deterministic selection.

    Scale shape: one aggregate keyed by source (map-side combined)
    cross-joined with a one-row total — the totals side is a
    broadcast, nothing large shuffles twice."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", r"\s+"))
    tok = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(n_tok).cast("long").alias("n_tokens"),
    ).withColumn(
        "weight",
        F.when(F.substring("source", 4, 10).cast("int") < 10, 1).otherwise(3),
    )
    tot = tok.agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("weight").cast("long").alias("total_weight"),
    )
    target = (
        (F.col("total_tokens") / float(MIX_BUDGET_FRACTION))
        * F.col("weight")
        / F.col("total_weight")
    )
    return (
        tok.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight",
            F.floor(target).cast("long").alias("target_tokens"),
            F.round(target / F.col("n_tokens"), 6).alias("sample_rate"),
            F.when(target > F.col("n_tokens"), "upsample")
            .otherwise("downsample")
            .alias("mode"),
        )
        .orderBy("source")
    )


@register(
    "profile_lineitem",
    oracle="""
    WITH s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS qty_nulls,
               CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS qty_distinct,
               CAST(CAST(MIN(l_quantity) AS DECIMAL(18,2)) AS VARCHAR) AS qty_min,
               CAST(CAST(MAX(l_quantity) AS DECIMAL(18,2)) AS VARCHAR) AS qty_max,
               CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT) AS ship_nulls,
               CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) AS ship_distinct,
               CAST(MIN(l_shipdate) AS VARCHAR) AS ship_min,
               CAST(MAX(l_shipdate) AS VARCHAR) AS ship_max,
               CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT) AS rf_nulls,
               CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS rf_distinct,
               MIN(l_returnflag) AS rf_min,
               MAX(l_returnflag) AS rf_max
        FROM lineitem
    )
    SELECT 'l_quantity' AS column_name, n_rows, qty_nulls AS n_nulls,
           qty_distinct AS n_distinct, qty_min AS min_value, qty_max AS max_value
    FROM s
    UNION ALL
    SELECT 'l_shipdate', n_rows, ship_nulls, ship_distinct, ship_min, ship_max FROM s
    UNION ALL
    SELECT 'l_returnflag', n_rows, rf_nulls, rf_distinct, rf_min, rf_max FROM s
    """,
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the pre-training data-validation step — what
    DuckDB spells SUMMARIZE): per-column null count, exact distinct
    count, min and max, computed in ONE scan and unpivoted to a long
    (column, stats) shape with stack().

    100 TB shape: a single aggregate over one pass of the table —
    COUNT(DISTINCT) expands to Spark's expand+two-phase plan (swap to
    approx_count_distinct when exactness isn't the contract); the
    stack unpivot is a projection of the 1-row aggregate."""
    l = table(spark, sf_dir, "lineitem")
    s = l.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("l_quantity")).alias("qty_nulls"),
        F.countDistinct("l_quantity").alias("qty_distinct"),
        F.min("l_quantity").cast("decimal(18,2)").cast("string").alias("qty_min"),
        F.max("l_quantity").cast("decimal(18,2)").cast("string").alias("qty_max"),
        (F.count("*") - F.count("l_shipdate")).alias("ship_nulls"),
        F.countDistinct("l_shipdate").alias("ship_distinct"),
        F.min("l_shipdate").cast("string").alias("ship_min"),
        F.max("l_shipdate").cast("string").alias("ship_max"),
        (F.count("*") - F.count("l_returnflag")).alias("rf_nulls"),
        F.countDistinct("l_returnflag").alias("rf_distinct"),
        F.min("l_returnflag").alias("rf_min"),
        F.max("l_returnflag").alias("rf_max"),
    )
    return s.select(
        F.expr(
            "stack(3, "
            "'l_quantity', n_rows, qty_nulls, qty_distinct, qty_min, qty_max, "
            "'l_shipdate', n_rows, ship_nulls, ship_distinct, ship_min, ship_max, "
            "'l_returnflag', n_rows, rf_nulls, rf_distinct, rf_min, rf_max) "
            "AS (column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )


@register(
    "sample_mixture_apply",
    oracle=rf"""
    WITH tok AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
                   AS n_tokens,
               CASE WHEN CAST(substring(source, 4) AS INT) < 10
                    THEN 1 ELSE 3 END AS weight
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(weight) AS BIGINT) AS total_weight
        FROM tok
    ), plan AS (
        SELECT source,
               CAST(floor((total_tokens / {MIX_BUDGET_FRACTION}.0) * weight
                          / total_weight) AS BIGINT) AS target_tokens,
               round(((total_tokens / {MIX_BUDGET_FRACTION}.0) * weight
                      / total_weight) / n_tokens, 6) AS rate
        FROM tok, tot
    ), docs AS (
        SELECT d.doc_id, d.source,
               CAST(len(regexp_split_to_array(d.text, '\s+')) AS BIGINT) AS n_tok,
               CAST(floor(p.rate) AS BIGINT)
                 + CASE WHEN CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                            < (p.rate - floor(p.rate)) * 4294967296.0
                        THEN 1 ELSE 0 END AS copies
        FROM documents d JOIN plan p USING (source)
    )
    SELECT d.source, p.target_tokens,
           CAST(SUM(CASE WHEN d.copies > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_selected,
           CAST(SUM(d.copies) AS BIGINT) AS doc_copies,
           CAST(SUM(d.n_tok * d.copies) AS BIGINT) AS tokens_selected,
           round(CAST(SUM(d.n_tok * d.copies) AS DOUBLE) / p.target_tokens, 4) AS fill
    FROM docs d JOIN plan p USING (source)
    GROUP BY d.source, p.target_tokens
    """,
)
def sample_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-plan EXECUTION: realize `corpus_mixture_plan`'s rates
    with deterministic per-doc selection — every doc gets
    floor(rate) whole copies (upsampling epochs) plus one more iff
    its 32-bit content hash falls under the fractional remainder.
    Output compares achieved tokens per source against the plan's
    target (fill ≈ 1.0 up to per-doc granularity).

    100 TB shape: the plan is a 20-row broadcast; selection is a
    codegen projection per doc (hash + compare, no RNG state, stable
    under retries/partitioning — the ONLY sampling that's safe on a
    cluster); the audit is one two-phase aggregate."""
    plan = corpus_mixture_plan(spark, sf_dir).select(
        "source", "target_tokens", F.col("sample_rate").alias("rate")
    )
    d = fanout(table(spark, sf_dir, "documents"))
    h = F.expr(spark_hash32("CAST(doc_id AS STRING)"))
    frac = F.col("rate") - F.floor(F.col("rate"))
    copies = (
        F.floor(F.col("rate")).cast("long")
        + F.when(h < frac * F.lit(4294967296.0), 1).otherwise(0)
    )
    docs = (
        d.select("doc_id", "source", F.size(F.split("text", r"\s+")).alias("n_tok"))
        .join(F.broadcast(plan), "source")
        .withColumn("copies", copies)
    )
    return docs.groupBy("source", "target_tokens").agg(
        F.sum(F.when(F.col("copies") > 0, 1).otherwise(0)).alias("docs_selected"),
        F.sum("copies").alias("doc_copies"),
        F.sum(F.col("n_tok") * F.col("copies")).alias("tokens_selected"),
        F.round(
            F.sum(F.col("n_tok") * F.col("copies")).cast("double")
            / F.col("target_tokens"),
            4,
        ).alias("fill"),
    )
