"""Bucketed-layout twins of the fact-heavy TPC-H shapes.

The `<q>_bucketed` queries assert their own scale property in-line
(no shuffle on the order key, bucketed scans, <=1 small-group shuffle)
— these tests pin the parts the in-query assertion can't: result
equivalence with the plain-parquet twin, and build idempotency.
"""

from __future__ import annotations

import pytest

from risingwave_py_spark import registry
from risingwave_py_spark.operators import bucketed as bk

registry.load_all()

PAIRS = [
    ("q18_bucketed", "q18_large_volume_customer"),
    ("q3_bucketed", "q3_shipping_priority"),
    ("q9_bucketed", "q9_profit_by_nation"),
    ("q10_bucketed", "q10_returned_items"),
    ("q5_bucketed", "q5_local_supplier_volume"),
    ("q7_bucketed", "q7_volume_shipping"),
]


def _canon(df):
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return sorted(map(tuple, pdf.astype(str).values.tolist()))


@pytest.mark.parametrize("variant,plain", PAIRS)
def test_bucketed_twin_matches_plain(spark, sf_dir, variant, plain):
    """Same SQL over the bucketed layout must produce the exact rows
    of the plain-parquet twin (both also carry the same DuckDB oracle
    through the driver gate)."""
    assert _canon(registry.QUERIES[variant](spark, sf_dir)) == _canon(
        registry.QUERIES[plain](spark, sf_dir)
    )


def test_build_is_idempotent(spark, sf_dir):
    """A second ensure call must reuse the existing bucketed copy (the
    per-query hot path pays a dict lookup, not a rebuild) — and a
    fresh-session lookup must accept an on-disk copy via the marker."""
    db = bk._ensure_bucketed(spark, sf_dir)
    li = spark.table(f"{db}.lineitem")
    n = li.count()
    assert bk._ensure_bucketed(spark, sf_dir) == db
    assert spark.table(f"{db}.lineitem").count() == n  # no double-append
    # cold-cache path: marker short-circuits the rebuild
    bk._READY.clear()
    assert bk._ensure_bucketed(spark, sf_dir) == db
    assert spark.table(f"{db}.lineitem").count() == n
