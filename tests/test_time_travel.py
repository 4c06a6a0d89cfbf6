"""FOR SYSTEM_TIME AS OF EPOCH n (engine.table_asof + SQL rewrite).

The driver-gated time_travel_scenario pins the happy path (bag
multiplicity, deletes, update retraction pairs, multiple AS OF refs
in one statement); these tests pin the refusals and the equivalence
invariant the oracle can't express."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture()
def conn_eng(spark):
    from risingwave_py_spark.core import RisingWaveConnection
    from risingwave_py_spark.engine import SparkEngine

    spark.sql("DROP DATABASE IF EXISTS tt_t CASCADE")
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(f"{wh.removeprefix('file:')}/tt_t.db", ignore_errors=True)
    eng = SparkEngine(spark=spark, default_schema="tt_t")
    yield RisingWaveConnection(eng), eng
    spark.sql("DROP DATABASE IF EXISTS tt_t CASCADE")


def test_asof_latest_epoch_equals_current_table(conn_eng, spark):
    """Reconstruction at the newest epoch must equal the table itself
    — the fold over the full history IS the table, for any DML mix."""
    conn, eng = conn_eng
    conn.execute("CREATE TABLE tt_t.x (k BIGINT, v DOUBLE)")
    conn.insert(pd.DataFrame({"k": [1, 2, 2], "v": [1.0, 2.0, 2.0]}),
                table_name="x", schema_name="tt_t", force_flush=True)
    conn.execute("DELETE FROM tt_t.x WHERE k = 1")
    conn.execute("UPDATE tt_t.x SET v = 9.0 WHERE k = 2")
    conn.insert(pd.DataFrame({"k": [5], "v": [5.0]}),
                table_name="x", schema_name="tt_t", force_flush=True)
    latest = max(
        int(r[0].split("=", 1)[1])
        for r in spark.sql(
            f"SHOW PARTITIONS {eng.changelog_name('tt_t.x')}"
        ).collect()
    )
    got = sorted(tuple(r) for r in eng.table_asof("tt_t.x", latest).collect())
    want = sorted(tuple(r) for r in spark.table("tt_t.x").collect())
    assert got == want


def test_asof_epoch_zero_is_empty(conn_eng):
    conn, eng = conn_eng
    conn.execute("CREATE TABLE tt_t.x (k BIGINT, v DOUBLE)")
    conn.insert(pd.DataFrame({"k": [1], "v": [1.0]}),
                table_name="x", schema_name="tt_t", force_flush=True)
    assert eng.table_asof("tt_t.x", 0).count() == 0


def test_vacuumed_history_is_refused(conn_eng):
    conn, eng = conn_eng
    conn.execute("CREATE TABLE tt_t.x (k BIGINT, v DOUBLE)")
    conn.insert(pd.DataFrame({"k": [1], "v": [1.0]}),
                table_name="x", schema_name="tt_t", force_flush=True)
    eng.vacuum_floor[eng.changelog_name("tt_t.x")] = 1
    with pytest.raises(ValueError, match="vacuumed"):
        eng.table_asof("tt_t.x", 5)


def test_upsert_table_is_refused(conn_eng):
    conn, eng = conn_eng
    conn.execute(
        "CREATE TABLE tt_t.u (k BIGINT PRIMARY KEY, v BIGINT) "
        "ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(v)"
    )
    with pytest.raises(ValueError, match="upsert"):
        eng.table_asof("tt_t.u", 1)


def test_non_engine_table_is_refused(conn_eng, spark):
    _conn, eng = conn_eng
    spark.sql("CREATE TABLE IF NOT EXISTS tt_t.plain (k BIGINT) USING PARQUET")
    with pytest.raises(ValueError, match="changelog"):
        eng.table_asof("tt_t.plain", 1)


def test_materialized_view_is_refused(conn_eng):
    """An MV's changelog starts at its first refresh delta (the
    creation snapshot is never emitted), so a bag fold over it would
    silently drop the initial rows — refuse loudly and point at the
    base tables instead."""
    conn, eng = conn_eng
    conn.execute("CREATE TABLE tt_t.b (g STRING, v DOUBLE)")
    conn.insert(pd.DataFrame({"g": ["x"], "v": [1.0]}),
                table_name="b", schema_name="tt_t", force_flush=True)
    conn.execute(
        "CREATE MATERIALIZED VIEW tt_t.m AS "
        "SELECT g, sum(v) AS total FROM tt_t.b GROUP BY g"
    )
    with pytest.raises(ValueError, match="materialized view"):
        eng.table_asof("tt_t.m", 99)
