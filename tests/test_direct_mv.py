"""Driver-side (zero-Spark-job) simple-agg MV refresh — the direct
path that closes the reference's insert -> FLUSH -> on_change loop
(/root/reference/risingwave/core.py:541-560) without a single job
dispatch for small insert-only deltas. These tests pin: that the path
actually engages (zero jobs across flush+refresh), that merged results
are bit-equal to a from-scratch recompute, that the changelog emission
matches the Spark paths' contract, and that every ineligible shape
(retractions, large deltas, NaN, restart) falls back and re-arms
without ever double-merging."""

from __future__ import annotations

import uuid

import pandas as pd
import pytest

from risingwave_py_spark.core import RisingWaveConnection
from risingwave_py_spark.engine import SparkEngine


@pytest.fixture
def conn(spark):
    schema = f"dmv_{uuid.uuid4().hex[:8]}"
    eng = SparkEngine(spark=spark, default_schema=schema)
    yield RisingWaveConnection(eng), eng, schema
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")


def _no_jobs(spark):
    tracker = spark.sparkContext.statusTracker()

    class Ctx:
        def __enter__(self):
            self.before = tracker.getJobIdsForGroup(None)
            return self

        def __exit__(self, *a):
            self.after = tracker.getJobIdsForGroup(None)

        @property
        def clean(self):
            return self.after == self.before

    return Ctx()


def test_global_agg_runs_zero_jobs_and_matches_recompute(spark, conn):
    c, eng, s = conn
    c.execute(f"CREATE TABLE {s}.ev (k BIGINT, v DOUBLE)")
    c.execute(
        f"CREATE MATERIALIZED VIEW {s}.agg AS "
        f"SELECT count(*) AS n, sum(v) AS sm, min(v) AS lo, max(v) AS hi "
        f"FROM {s}.ev"
    )
    st = eng.mvs[f"{s}.agg"]
    assert st.inc_direct is not None, "global agg must arm the direct path"
    assert st.inc is None, "no GROUP BY: the Spark inc path cannot arm"
    c.insert_row("ev", schema_name=s, force_flush=True, k=1, v=2.5)
    # steady state: the ENTIRE insert+flush+refresh is job-free
    with _no_jobs(spark) as jobs:
        c.insert_row("ev", schema_name=s, force_flush=True, k=2, v=-1.0)
        c.insert_row("ev", schema_name=s, force_flush=True, k=3, v=None)
    assert jobs.clean, "insert+flush+MV refresh dispatched Spark jobs"
    assert c.fetch(f"SELECT n, sm, lo, hi FROM {s}.agg") == [(3, 1.5, -1.0, 2.5)]
    # changelog contract: keyless bag diff (Delete old + Insert new)
    ops = [r["op"] for r in spark.table(eng.changelog_name(f"{s}.agg"))
           .orderBy("rw_timestamp").collect()]
    assert ops[-2:] == ["Delete", "Insert"]
    assert st.inc_direct is not None


def test_grouped_agg_direct_matches_recompute_bit_exact(spark, conn):
    c, eng, s = conn
    c.execute(f"CREATE TABLE {s}.t (p STRING, v BIGINT)")
    c.execute(
        f"CREATE MATERIALIZED VIEW {s}.m AS "
        f"SELECT p, sum(v) AS total, count(*) AS n, min(v) AS lo, "
        f"max(v) AS hi FROM {s}.t GROUP BY p"
    )
    st = eng.mvs[f"{s}.m"]
    assert st.inc_direct is not None and st.inc is not None
    c.insert(pd.DataFrame({"p": ["a", "b"], "v": [1, 2]}),
             table_name="t", schema_name=s, force_flush=True)
    with _no_jobs(spark) as jobs:
        c.insert_row("t", schema_name=s, force_flush=True, p="a", v=5)
        c.insert_row("t", schema_name=s, force_flush=True, p="c", v=None)
    assert jobs.clean
    got = sorted(c.fetch(f"SELECT * FROM {s}.m"))
    want = sorted(c.fetch(
        f"SELECT p, sum(v) AS total, count(*) AS n, min(v) AS lo, "
        f"max(v) AS hi FROM {s}.t GROUP BY p"
    ))
    assert got == want == [
        ("a", 6, 2, 1, 5), ("b", 2, 1, 2, 2), ("c", None, 1, None, None)
    ]
    # grouped emission: UpdateDelete/UpdateInsert pairs + Insert
    cl = spark.table(eng.changelog_name(f"{s}.m"))
    last = cl.agg({"rw_timestamp": "max"}).first()[0]
    prev_ops = sorted(
        r["op"] for r in cl.filter(f"rw_timestamp < {last}")
        .orderBy("rw_timestamp").collect()
    )[-2:]
    assert prev_ops == sorted(["UpdateDelete", "UpdateInsert"])


def test_retraction_falls_back_and_stays_correct(spark, conn):
    c, eng, s = conn
    c.execute(f"CREATE TABLE {s}.t (p STRING, v BIGINT)")
    c.execute(
        f"CREATE MATERIALIZED VIEW {s}.m AS "
        f"SELECT p, sum(v) AS total FROM {s}.t GROUP BY p"
    )
    c.insert(pd.DataFrame({"p": ["a", "b"], "v": [1, 2]}),
             table_name="t", schema_name=s, force_flush=True)
    c.execute(f"UPDATE {s}.t SET v = 10 WHERE p = 'a'")
    c.execute("FLUSH")
    assert sorted(c.fetch(f"SELECT * FROM {s}.m")) == [("a", 10), ("b", 2)]
    st = eng.mvs[f"{s}.m"]
    # the retraction went through the Spark inc path; direct stays
    # armed (shared watermark) and handles the next small insert
    assert st.inc_direct is not None
    with _no_jobs(spark) as jobs:
        c.insert_row("t", schema_name=s, force_flush=True, p="b", v=3)
    assert jobs.clean
    assert sorted(c.fetch(f"SELECT * FROM {s}.m")) == [("a", 10), ("b", 5)]


def test_large_delta_falls_back_then_rearms(spark, conn):
    c, eng, s = conn
    c.execute(f"CREATE TABLE {s}.ev (k BIGINT, v BIGINT)")
    c.execute(
        f"CREATE MATERIALIZED VIEW {s}.agg AS "
        f"SELECT count(*) AS n, sum(v) AS sm FROM {s}.ev"
    )
    st = eng.mvs[f"{s}.agg"]
    limit = eng.DIRECT_MAX_DELTA_ROWS
    big = pd.DataFrame({"k": range(limit + 10), "v": range(limit + 10)})
    c.insert(big, table_name="ev", schema_name=s, force_flush=True)
    want_sum = int(big["v"].sum())
    assert c.fetch(f"SELECT n, sm FROM {s}.agg") == [(limit + 10, want_sum)]
    # global agg: fallback was snapshot-diff, which disarms + re-arms
    st = eng.mvs[f"{s}.agg"]
    assert st.inc_direct is not None, "re-arm probe must restore the direct plan"
    with _no_jobs(spark) as jobs:
        c.insert_row("ev", schema_name=s, force_flush=True, k=-1, v=7)
    assert jobs.clean
    assert c.fetch(f"SELECT n, sm FROM {s}.agg") == [
        (limit + 11, want_sum + 7)
    ]


def test_engine_restart_rearms_without_double_merge(spark, conn):
    c, eng, s = conn
    c.execute(f"CREATE TABLE {s}.ev (k BIGINT, v BIGINT)")
    c.execute(
        f"CREATE MATERIALIZED VIEW {s}.agg AS "
        f"SELECT count(*) AS n, sum(v) AS sm FROM {s}.ev"
    )
    for i in range(3):
        c.insert_row("ev", schema_name=s, force_flush=True, k=i, v=i)
    # same-session engine restart: MVState restores with plans None
    eng2 = SparkEngine(spark=spark, default_schema=s)
    c2 = RisingWaveConnection(eng2)
    st2 = eng2.mvs[f"{s}.agg"]
    assert st2.inc_direct is None
    c2.insert_row("ev", schema_name=s, force_flush=True, k=10, v=10)
    assert c2.fetch(f"SELECT n, sm FROM {s}.agg") == [(4, 13)]
    assert st2.inc_direct is not None, "first refresh re-arms the direct plan"
    with _no_jobs(spark) as jobs:
        c2.insert_row("ev", schema_name=s, force_flush=True, k=11, v=100)
    assert jobs.clean
    assert c2.fetch(f"SELECT n, sm FROM {s}.agg") == [(5, 113)]


def test_nan_delta_falls_back_not_corrupts(spark, conn):
    c, eng, s = conn
    c.execute(f"CREATE TABLE {s}.ev (k BIGINT, v DOUBLE)")
    c.execute(
        f"CREATE MATERIALIZED VIEW {s}.agg AS "
        f"SELECT count(*) AS n, max(v) AS hi FROM {s}.ev"
    )
    c.insert_row("ev", schema_name=s, force_flush=True, k=1, v=1.0)
    c.insert_row("ev", schema_name=s, force_flush=True, k=2, v=float("nan"))
    # Spark treats NaN as the largest double; the direct path must
    # have bowed out rather than apply Python NaN comparisons
    row = c.fetch(f"SELECT n, hi FROM {s}.agg")[0]
    assert row[0] == 2
    assert row[1] != row[1]  # NaN is the max


def test_decimal_sums_stay_exact(spark, conn):
    import decimal

    c, eng, s = conn
    c.execute(f"CREATE TABLE {s}.p (g STRING, amt DECIMAL(10,2))")
    c.execute(
        f"CREATE MATERIALIZED VIEW {s}.m AS "
        f"SELECT g, sum(amt) AS total FROM {s}.p GROUP BY g"
    )
    st = eng.mvs[f"{s}.m"]
    assert st.inc_direct is not None
    c.insert_row("p", schema_name=s, force_flush=True,
                 g="a", amt=decimal.Decimal("1.10"))
    with _no_jobs(spark) as jobs:
        c.insert_row("p", schema_name=s, force_flush=True,
                     g="a", amt=decimal.Decimal("2.05"))
    assert jobs.clean
    assert c.fetch(f"SELECT g, total FROM {s}.m") == [
        ("a", decimal.Decimal("3.15"))
    ]
    recomputed = c.fetch(f"SELECT g, sum(amt) AS t FROM {s}.p GROUP BY g")
    assert recomputed == [("a", decimal.Decimal("3.15"))]


def test_direct_result_survives_spark_path_interleaving(spark, conn):
    """Alternating direct refreshes, Spark-path retraction refreshes,
    and direct again must agree with recompute at every step — the
    SET LOCATION generation swap and the DROP+RENAME swap have to
    interoperate on one table."""
    c, eng, s = conn
    c.execute(f"CREATE TABLE {s}.t (p STRING, v BIGINT)")
    c.execute(
        f"CREATE MATERIALIZED VIEW {s}.m AS "
        f"SELECT p, sum(v) AS total, count(*) AS n FROM {s}.t GROUP BY p"
    )
    rng = [("a", 1), ("b", 2), ("a", 3)]
    for p, v in rng:
        c.insert_row("t", schema_name=s, force_flush=True, p=p, v=v)
    c.execute(f"DELETE FROM {s}.t WHERE p = 'b'")
    c.execute("FLUSH")
    c.insert_row("t", schema_name=s, force_flush=True, p="c", v=9)
    c.execute(f"UPDATE {s}.t SET v = v + 1 WHERE p = 'a'")
    c.execute("FLUSH")
    c.insert_row("t", schema_name=s, force_flush=True, p="a", v=100)
    got = sorted(c.fetch(f"SELECT * FROM {s}.m"))
    want = sorted(c.fetch(
        f"SELECT p, sum(v) AS total, count(*) AS n FROM {s}.t GROUP BY p"
    ))
    assert got == want == [("a", 106, 3), ("c", 9, 1)]


def test_unconsumed_vacuum_disarms_then_rearms_direct(spark, conn):
    """Vacuuming epochs the direct plan has not folded yet must disarm
    it (the delta suffix is gone); the SAME flush falls back to
    snapshot-diff, stays exact, and the re-arm probe restores the
    direct plan from a fresh induction base."""
    c, eng, s = conn
    c.execute(f"CREATE TABLE {s}.ev (k BIGINT, v BIGINT)")
    c.execute(
        f"CREATE MATERIALIZED VIEW {s}.agg AS "
        f"SELECT count(*) AS n, sum(v) AS sm FROM {s}.ev"
    )
    st = eng.mvs[f"{s}.agg"]
    c.insert_row("ev", schema_name=s, force_flush=True, k=1, v=1)
    assert st.inc_direct is not None
    # publish an epoch the MV has NOT consumed, then vacuum everything
    eng.insert_df(
        "ev", spark.createDataFrame([(2, 2)], "k bigint, v bigint"),
        schema_name=s,
    )
    c.execute(
        f"CREATE SUBSCRIPTION {s}.sub0 FROM {s}.ev WITH (retention = '0s')"
    )
    eng.vacuum_changelogs()
    assert eng.vacuum_floor.get(
        eng.changelog_name(f"{s}.ev"), 0
    ) > st.last_epoch
    c.execute("FLUSH")
    st = eng.mvs[f"{s}.agg"]
    assert c.fetch(f"SELECT n, sm FROM {s}.agg") == [(2, 3)]
    assert st.inc_direct is not None, "same-flush re-arm must recover"
    # and the recovered plan keeps merging job-free
    with _no_jobs(spark) as jobs:
        c.insert_row("ev", schema_name=s, force_flush=True, k=3, v=3)
    assert jobs.clean
    assert c.fetch(f"SELECT n, sm FROM {s}.agg") == [(3, 6)]
