"""Registry wiring operator implementations to the driver contract.

Every implemented operator registers:
  - a callable (spark, sf_dir) -> DataFrame   (the Spark-first impl)
  - optionally an oracle SQL string DuckDB can run on the same parquet
    tables (views: region nation customer supplier part orders
    lineitem events documents embeddings).

`__spark_entry__.py` re-exports QUERIES/ORACLES to the driver.

Determinism rules (both sides MUST follow):
  - alias every computed column identically in Spark and SQL;
  - money/discount sums go through DECIMAL(18,2) then CAST AS DOUBLE
    (bit-exact across engines — float association order never leaks);
  - any LIMIT/top-k has a total deterministic ORDER BY (ties broken
    by a key column);
  - float expressions that can't be made decimal-exact are ROUND()ed
    to 6 places (error budget ~1e-14 « 1e-6).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from risingwave_py_spark.operators import relational, time_windows, analytic, tpch_extra  # noqa: F401
    from risingwave_py_spark.functions import dedup, vectors, text, multimodal, sampling  # noqa: F401
    from risingwave_py_spark.streaming import demo_queries  # noqa: F401
    # LAST: re-registers hot benched names with single-statement SQL
    # forms (same plans, no per-invocation Column-API overhead).
    from risingwave_py_spark.operators import sqlfast  # noqa: F401


# The driver's correctness gate samples the FIRST 50 queries in the
# order ``__spark_entry__.queries()`` yields them. Round 1 sampled its
# first 50, round 2 the (different) PRIORITY 50 — cumulative driver
# coverage 100/160. Round 3 rotates the window a third time: every
# query that has NEVER had a driver CORRECTNESS row sorts first (the
# OVER-window/analytic battery, the text/sampling suite, the
# embeddings/ANN remainder, multimodal, and this round's new
# retraction scenario), so cumulative coverage reaches ~150/160. The
# local verify sweep (tools/verify_queries.py) remains the backstop
# for everything.
PRIORITY: list[str] = [
    # NEW this round: retraction-capable incremental MV maintenance
    "dml_inc_mv_scenario", "dml_join_agg_inc_mv_scenario",
    "dml_join_inc_mv_scenario", "star3_inc_mv_scenario",
    # OVER-window / analytic battery (never driver-sampled)
    "window_rank_lag", "window_running_sum", "window_topk_per_group",
    "window_ntile_percentrank", "window_range_frame", "window_filtered_agg",
    "gapfill_locf", "agg_percentile_disc", "agg_salted_skew",
    "asof_join_last_click", "interval_join_events", "sessionize_events",
    "events_funnel", "events_retention_cohorts", "events_json_extract",
    "sketch_error_bounds",
    # text / sampling suite (never driver-sampled)
    "text_quality_scores", "text_decontaminate", "text_token_count",
    "text_langid_markers", "text_fingerprint", "text_chunk_windows",
    "text_pii_redact", "text_repetition_ratio", "text_pack_sequences",
    "text_unigram_logprob", "text_char_entropy", "text_quality_classifier",
    "text_token_count_bpe", "heavy_hitter_bigrams", "corpus_source_drift",
    "corpus_vocab_stats", "corpus_mixture_plan", "sample_mixture_apply",
    "sample_uniform_hash", "sample_stratified_quota", "sample_split_assign",
    # embeddings / ANN remainder (never driver-sampled)
    "ann_lsh_signatures", "ann_quality_filtered", "embedding_blocked_pairs",
    "embedding_label_outliers", "dedup_embedding_cosine",
    "cluster_kmeans_embeddings", "dedup_semantic_clusters",
    # multimodal (decode is hash-checked as of this round)
    "multimodal_metadata", "multimodal_decode_features",
    "multimodal_image_pipeline", "multimodal_audio_pipeline",
    "multimodal_video_pipeline",
    # tail of the never-sampled set (spots 51+ roll to round 4)
    "monthly_revenue_trend", "recursive_month_spine", "profile_lineitem",
    "scalar_array_lambda",
    "scalar_string_funcs2", "scalar_date_funcs2", "scalar_math_funcs2",
    # previously driver-green suites follow (regression re-samples)
    "mv_changelog_scenario", "inc_mv_scenario", "join_inc_mv_scenario",
    "join_agg_inc_mv_scenario", "streaming_mv_scenario",
    "upsert_version_scenario", "table_changelog_scenario",
    "cascade_mv_scenario", "dml_scenario", "topn_mv_scenario",
    "sink_scenario", "tumble_mv_scenario", "emit_on_close_scenario",
    "join_mv_scenario",
    "q18_large_volume_customer",  # broadcast hint changed this round
    "tumble_events_15m", "hop_events_30m_15m", "session_window_events",
    "asof_join_grammar",
]


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES reordered so the driver's sample window hits PRIORITY first."""
    out: dict[str, QueryFn] = {}
    for name in PRIORITY:
        if name in QUERIES:
            out[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in out:
            out[name] = fn
    return out


def ordered_oracles() -> dict[str, str]:
    """ORACLES in the same order as :func:`ordered_queries`."""
    return {n: ORACLES[n] for n in ordered_queries() if n in ORACLES}
