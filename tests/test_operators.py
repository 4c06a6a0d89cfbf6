"""Operator smoke tests over the sf0.001 fixtures: every registered
query runs and returns a sane shape. Full value-correctness vs DuckDB
is tools/verify_queries.py (and the driver's gate)."""

from __future__ import annotations

import pytest

from risingwave_py_spark import registry

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    rows = df.collect()
    assert df.columns, name
    assert rows is not None


def test_every_oracle_has_query():
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_q1_values(spark, sf_dir):
    rows = {
        (r.l_returnflag, r.l_linestatus): r
        for r in registry.QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    }
    total = sum(r.count_order for r in rows.values())
    from pyspark.sql import functions as F

    from risingwave_py_spark.catalog import table

    expected = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .count()
    )
    assert total == expected
    for r in rows.values():
        assert abs(r.avg_qty - r.sum_qty / r.count_order) < 1e-9
