"""Approximate aggregates — the documented scale fallbacks (SCALE.md
§Aggregation): HyperLogLog++ distinct counts and quantile sketches.
Exact twins verify the error envelope at test scale; at 100 TB the
sketches are mergeable across partitions (one pass, bounded memory)
where exact distinct/percentile would shuffle the full key set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from risingwave_py_spark.catalog import table


def test_hll_distinct_within_rsd(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(4 * 0.02 * row.exact, 1.0)


def test_hll_sketch_mergeable_across_partitions(spark, sf_dir):
    """The sketch aggregates per-group then merges — the property that
    makes it one-pass at cluster scale: union of per-type sketches
    equals the sketch of the union."""
    ev = table(spark, sf_dir, "events")
    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_union_agg("sk").alias("u"))
        .select(F.hll_sketch_estimate("u").alias("est"))
        .collect()[0]
        .est
    )
    direct = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()[0]
        .est
    )
    assert merged == direct  # identical sketch state, not just close


def test_approx_percentile_within_accuracy(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    row = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("approx"),
    ).collect()[0]
    # approx_percentile returns a true data value within rank error
    # 1/accuracy of the target rank; at 1e3 accuracy on ~6k rows that
    # is a handful of ranks — bound loosely by 2% of the value.
    assert abs(row.approx - row.exact) / row.exact < 0.02
