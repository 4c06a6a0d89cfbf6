"""UPDATE / DELETE DML (PG surface reachable through the reference's
execute pass-through, /root/reference/risingwave/core.py:161-181):
mutations rewrite the table and emit changelog ops in one atomic
epoch — Delete for deletions, UpdateDelete/UpdateInsert pairs for
updates (the demo.py:50 contract).
"""

from __future__ import annotations

import pandas as pd
import pytest


def _sub_rows(rw, table, tag):
    rw.execute(
        f"CREATE SUBSCRIPTION IF NOT EXISTS public.{tag}_sub FROM public.{table} "
        "WITH (retention = '86400s')"
    )
    rw.execute(f"DECLARE {tag}_cur subscription cursor for public.{tag}_sub SINCE 0")
    _, rows = rw.engine.fetch_cursor(f"{tag}_cur", 10000)
    return rows


def test_delete_where(rw):
    rw.execute("DROP TABLE IF EXISTS t_del")
    rw.insert(data=pd.DataFrame({"k": [1, 2, 3, 4], "v": [10.0, 20.0, None, 40.0]}),
              table_name="t_del", force_flush=True)
    rw.execute("DELETE FROM t_del WHERE v > 15")
    got = sorted(r[0] for r in rw.fetch("SELECT k FROM t_del"))
    # v=NULL row survives (predicate NULL is not TRUE), v=10 survives
    assert got == [1, 3]
    ops = [(r[0], r[-2]) for r in _sub_rows(rw, "t_del", "t_del")]
    assert (2, "Delete") in ops and (4, "Delete") in ops


def test_update_set_where_and_simultaneous_assignment(rw):
    rw.execute("DROP TABLE IF EXISTS t_upd")
    rw.insert(data=pd.DataFrame({"a": [1, 2], "b": [100, 200]}),
              table_name="t_upd", force_flush=True)
    # swap semantics: both expressions see the OLD row
    rw.execute("UPDATE t_upd SET a = b, b = a WHERE a = 1")
    rows = sorted(rw.fetch("SELECT a, b FROM t_upd"))
    assert rows == [(2, 200), (100, 1)]
    ops = sorted((r[-2]) for r in _sub_rows(rw, "t_upd", "t_upd")
                 if r[-2] != "Insert")
    assert ops == ["UpdateDelete", "UpdateInsert"]


def test_update_casts_to_column_type_and_funcs_in_set(rw):
    rw.execute("DROP TABLE IF EXISTS t_upd2")
    rw.insert(data=pd.DataFrame({"k": [1, 2], "v": [10, 20]}),
              table_name="t_upd2", force_flush=True)
    rw.execute("UPDATE t_upd2 SET v = greatest(v * 2.5, 1) WHERE k = 2")
    rows = dict(rw.fetch("SELECT k, v FROM t_upd2"))
    assert rows == {1: 10, 2: 50}  # 50.0 cast back to the bigint column


def test_update_no_match_is_noop(rw):
    rw.execute("DROP TABLE IF EXISTS t_upd3")
    rw.insert(data=pd.DataFrame({"k": [1]}), table_name="t_upd3", force_flush=True)
    before = rw.engine.current_epoch
    rw.execute("UPDATE t_upd3 SET k = 99 WHERE k = 42")
    assert rw.fetch("SELECT k FROM t_upd3") == [(1,)]


def test_mv_refreshes_after_dml(rw):
    rw.execute("DROP TABLE IF EXISTS t_dmlmv")
    rw.insert(data=pd.DataFrame({"p": ["x", "x", "y"], "v": [1.0, 2.0, 3.0]}),
              table_name="t_dmlmv", force_flush=True)
    rw.mv(stmt="SELECT p, sum(v) AS total FROM t_dmlmv GROUP BY p", name="t_dmlmv_mv")
    rw.execute("DELETE FROM t_dmlmv WHERE v = 2.0")
    rw.execute("UPDATE t_dmlmv SET v = 30.0 WHERE p = 'y'")
    rw.execute("FLUSH")
    rows = dict(rw.fetch("SELECT p, total FROM t_dmlmv_mv"))
    assert rows == {"x": 1.0, "y": 30.0}


def test_dml_on_upsert_table(rw):
    """UPDATE/DELETE on an ON CONFLICT table (the reference server
    allows DML on PK tables): updates append a later-epoch image that
    wins the latest-by-version window; deletes append a tombstone that
    hides the key — the log stays append-only in both cases."""
    import pandas as pd

    rw.execute("DROP TABLE IF EXISTS t_dmlup")
    rw.execute(
        "CREATE TABLE t_dmlup (pk STRING PRIMARY KEY, ver BIGINT, val DOUBLE) "
        "ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(ver)"
    )
    rw.insert(pd.DataFrame({"pk": ["a", "b", "c"], "ver": [1, 1, 1],
                            "val": [1.0, 2.0, 3.0]}),
              table_name="t_dmlup", force_flush=True)
    n = rw.execute("UPDATE t_dmlup SET val = val * 10 WHERE pk = 'b'")
    assert dict(rw.fetch("SELECT pk, val FROM t_dmlup")) == {
        "a": 1.0, "b": 20.0, "c": 3.0}
    n = rw.execute("DELETE FROM t_dmlup WHERE pk = 'c'")
    assert sorted(r[0] for r in rw.fetch("SELECT pk FROM t_dmlup")) == ["a", "b"]
    # a later higher-version insert resurrects the deleted key
    rw.insert(pd.DataFrame({"pk": ["c"], "ver": [2], "val": [9.0]}),
              table_name="t_dmlup", force_flush=True)
    assert dict(rw.fetch("SELECT pk, val FROM t_dmlup"))["c"] == 9.0
    # PK columns are immutable under UPDATE
    with pytest.raises(RuntimeError, match="primary-key"):
        rw.execute("UPDATE t_dmlup SET pk = 'z' WHERE pk = 'a'")
    rw.execute("DROP TABLE t_dmlup")


def test_delete_returning(rw):
    import pandas as pd
    rw.execute("DROP TABLE IF EXISTS ret_t1")
    rw.insert(pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}),
              table_name="ret_t1", force_flush=True)
    got = sorted(rw.fetch("DELETE FROM ret_t1 WHERE a >= 2 RETURNING a, b"))
    assert got == [(2, "y"), (3, "z")]
    assert rw.fetch("SELECT a FROM ret_t1") == [(1,)]
    # no matches → empty RETURNING, not None
    assert rw.fetch("DELETE FROM ret_t1 WHERE a = 99 RETURNING a") == []
    rw.execute("DROP TABLE ret_t1")


def test_update_returning_new_values(rw):
    import pandas as pd
    rw.execute("DROP TABLE IF EXISTS ret_t2")
    rw.insert(pd.DataFrame({"a": [1, 2], "v": [10.0, 20.0]}),
              table_name="ret_t2", force_flush=True)
    got = rw.fetch("UPDATE ret_t2 SET v = v * 2 WHERE a = 2 RETURNING a, v")
    assert got == [(2, 40.0)]  # RETURNING sees post-update values
    rw.execute("DROP TABLE ret_t2")


def test_insert_returning(rw):
    rw.execute("DROP TABLE IF EXISTS ret_t3")
    rw.execute("CREATE TABLE ret_t3 (a INT, b STRING)")
    got = sorted(rw.fetch(
        "INSERT INTO ret_t3 (a, b) VALUES (1, 'x'), (2, 'y') RETURNING b, a * 10 AS a10"))
    assert got == [("x", 10), ("y", 20)]
    assert sorted(rw.fetch("SELECT a, b FROM ret_t3")) == [(1, "x"), (2, "y")]
    rw.execute("DROP TABLE ret_t3")


def test_insert_select_is_positional(rw):
    """SQL semantics: INSERT ... SELECT maps source columns to the
    target POSITIONALLY — differently-named/computed source columns
    must land in the right target columns, never turn into NULLs."""
    import pytest

    rw.execute("DROP TABLE IF EXISTS ins_sel_t")
    rw.execute("DROP TABLE IF EXISTS ins_sel_s")
    rw.execute("CREATE TABLE ins_sel_t (a INT, b STRING)")
    rw.execute("CREATE TABLE ins_sel_s (x INT, y STRING)")
    rw.execute("INSERT INTO ins_sel_s VALUES (7, 'hi')")
    rw.execute("FLUSH")
    rw.execute("INSERT INTO ins_sel_t SELECT x + 1, y FROM ins_sel_s")
    rw.execute("FLUSH")
    assert rw.fetch("SELECT * FROM ins_sel_t") == [(8, "hi")]
    # explicit column list maps positionally to the listed columns
    rw.execute("INSERT INTO ins_sel_t (b, a) SELECT y, x FROM ins_sel_s")
    rw.execute("FLUSH")
    assert sorted(rw.fetch("SELECT * FROM ins_sel_t")) == [(7, "hi"), (8, "hi")]
    with pytest.raises(RuntimeError, match="column"):
        rw.execute("INSERT INTO ins_sel_t SELECT x FROM ins_sel_s")
    rw.execute("DROP TABLE ins_sel_t")
    rw.execute("DROP TABLE ins_sel_s")


def test_pandas_insert_realigns_column_order(rw):
    """A pandas frame with the table's columns in a different order
    must realign by name (insert_df appends positionally)."""
    import pandas as pd

    rw.execute("DROP TABLE IF EXISTS ins_ord_t")
    rw.execute("CREATE TABLE ins_ord_t (a INT, b STRING)")
    rw.insert(pd.DataFrame({"b": ["x"], "a": [1]}), table_name="ins_ord_t",
              force_flush=True)
    assert rw.fetch("SELECT * FROM ins_ord_t") == [(1, "x")]
    rw.execute("DROP TABLE ins_ord_t")


def test_upsert_log_compaction_bounds_size(rw, spark):
    """FLUSH compacts an upsert table's append log down to one winning
    row per key (tombstones included) once enough batches accumulate:
    the log stops growing with update traffic, the latest-by-version
    view is unchanged, and a deleted key still outranks a later
    lower-version insert."""
    import uuid

    eng = rw.engine
    t = f"up_comp_{uuid.uuid4().hex[:8]}"
    eng.UPSERT_COMPACT_BATCHES = 4  # instance attr shadows the class
    try:
        rw.execute(
            f"CREATE TABLE {t} (k INT PRIMARY KEY, v VARCHAR, ver BIGINT) "
            f"ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(ver)"
        )
        for i in range(12):
            rw.execute(
                f"INSERT INTO {t} (k, v, ver) VALUES ({i % 3}, 'v{i}', {i})"
            )
        rw.execute(f"DELETE FROM {t} WHERE k = 2")
        rw.execute("FLUSH")
        log = eng.log_name(f"public.{t}")
        # 13 appended batches collapse to exactly one row per key:
        # two live winners + one tombstone winner
        assert spark.table(log).count() == 3
        assert sorted(rw.fetch(f"SELECT * FROM {t}")) == [
            (0, "v9", 9), (1, "v10", 10),
        ]
        # the kept tombstone (k=2, ver 11) still wins over a stale
        # re-insert with a lower version
        rw.execute(f"INSERT INTO {t} (k, v, ver) VALUES (2, 'stale', 1)")
        assert sorted(rw.fetch(f"SELECT * FROM {t}")) == [
            (0, "v9", 9), (1, "v10", 10),
        ]
        # ... and loses to a higher-version re-insert
        rw.execute(f"INSERT INTO {t} (k, v, ver) VALUES (2, 'back', 99)")
        assert (2, "back", 99) in rw.fetch(f"SELECT * FROM {t}")
    finally:
        del eng.UPSERT_COMPACT_BATCHES
        rw.execute(f"DROP TABLE IF EXISTS {t}")
