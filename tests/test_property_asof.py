"""Property-based test: the ASOF JOIN dialect rewrite agrees with
DuckDB's native ASOF JOIN on random data — every variant (backward/
forward × strict/inclusive × inner/left), random keys and times with
deliberate collisions on the key but unique (key, right-time) pairs
(the tie case both engines leave implementation-defined)."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

import duckdb
import pandas as pd


_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 50)), min_size=0, max_size=25
)
_variant = st.sampled_from([(">=", False), (">", False), ("<=", True), ("<", True)])
_outer = st.booleans()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_rows, right=_rows, variant=_variant, outer=_outer)
def test_asof_rewrite_matches_duckdb(spark, left, right, variant, outer):
    from risingwave_py_spark.plans.rewrite import rewrite_asof_join

    op, _forward = variant
    ldf = pd.DataFrame(left, columns=["k", "t"]).assign(
        lid=lambda d: range(len(d))
    )
    # unique (k, t) on the right: equal-time right rows are the one
    # case whose winner both engines leave implementation-defined
    rdf = (
        pd.DataFrame(right, columns=["k", "t"])
        .drop_duplicates(["k", "t"])
        .reset_index(drop=True)
        .assign(rid=lambda d: range(1000, 1000 + len(d)))
    )
    spark.createDataFrame(
        ldf, schema="k bigint, t bigint, lid bigint"
    ).createOrReplaceTempView("pa_l")
    spark.createDataFrame(
        rdf, schema="k bigint, t bigint, rid bigint"
    ).createOrReplaceTempView("pa_r")

    kw = "ASOF LEFT JOIN" if outer else "ASOF JOIN"
    sql = (
        f"SELECT l.lid, r.rid FROM pa_l l {kw} pa_r r "
        f"ON l.k = r.k AND l.t {op} r.t"
    )
    got = sorted(
        (r.lid, r.rid) for r in spark.sql(rewrite_asof_join(sql)).collect()
    )

    con = duckdb.connect()
    con.register("pa_l", ldf)
    con.register("pa_r", rdf)
    want = sorted(
        (int(a), None if b is None else int(b))
        for a, b in con.execute(sql).fetchall()
    )
    assert got == want, f"{sql}\n got={got}\nwant={want}"
