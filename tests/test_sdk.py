"""SDK API-parity tests: the reference's four canonical usage patterns
(/root/reference/README.md:29-123) plus the §2.1 ingest machinery."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from risingwave_py_spark import OutputFormat


def test_insert_dataframe_auto_create_and_fetch(rw):
    # README.md:45-55 — insert into a never-created table, then fetch
    df = pd.DataFrame({"product": ["foo", "bar"], "price": [123.45, 0.11]})
    rw.insert(data=df, table_name="t_sdk_product", force_flush=True)
    out = rw.fetch("SELECT * FROM t_sdk_product", format=OutputFormat.DATAFRAME)
    assert sorted(out.columns) == ["price", "product"]
    assert len(out) == 2
    raw = rw.fetch("SELECT * FROM t_sdk_product ORDER BY product")
    assert raw == [("bar", 0.11), ("foo", 123.45)]


def test_fetchone(rw):
    row = rw.fetchone("SELECT 1 AS a, 'x' AS b")
    assert row == (1, "x")
    assert rw.fetchone("SELECT 1 WHERE 1 = 0") is None


def test_version_parseable(rw):
    (v,) = rw.fetchone("SELECT version()")
    assert "RisingWave-2.1.0" in v
    assert rw.rw_version == "2.1.0"


def test_check_exist(rw):
    assert rw.check_exist("t_sdk_product")
    assert not rw.check_exist("definitely_missing_table")


def test_create_table_ddl_and_insert_row_buffering(rw):
    rw.execute("DROP TABLE IF EXISTS t_sdk_tick")
    rw.execute(
        "CREATE TABLE IF NOT EXISTS t_sdk_tick "
        "(symbol STRING, ts TIMESTAMPTZ, close FLOAT)"
    )
    for i in range(7):
        rw.insert_row(
            table_name="t_sdk_tick", symbol="eth",
            ts=datetime.datetime(2024, 1, 1, 0, 0, i), close=100.0 + i,
        )
    # buf_size=5 → first 5 flushed, 2 still buffered (core.py:68 parity)
    assert len(rw.fetch("SELECT * FROM t_sdk_tick")) == 5
    rw.insert_row(table_name="t_sdk_tick", symbol="eth",
                  ts=datetime.datetime(2024, 1, 1, 0, 1), close=1.0, force_flush=True)
    assert len(rw.fetch("SELECT * FROM t_sdk_tick")) == 8


def test_insert_row_null_fill(rw):
    rw.execute("DROP TABLE IF EXISTS t_sdk_nulls")
    rw.execute("CREATE TABLE t_sdk_nulls (a INT, b STRING, c DOUBLE)")
    rw.insert_row(table_name="t_sdk_nulls", a=1, force_flush=True)
    assert rw.fetch("SELECT * FROM t_sdk_nulls") == [(1, None, None)]


def test_mv_create_query_drop(rw):
    rw.execute("DROP TABLE IF EXISTS t_sdk_sales")
    rw.insert(
        data=pd.DataFrame({"product": ["a", "a", "b"], "price": [1.0, 3.0, 10.0]}),
        table_name="t_sdk_sales", force_flush=True,
    )
    mv = rw.mv(
        stmt="SELECT product, avg(price) AS avg_price FROM t_sdk_sales GROUP BY product",
        name="t_sdk_sales_mv",
    )
    got = sorted(rw.fetch("SELECT * FROM t_sdk_sales_mv"))
    assert got == [("a", 2.0), ("b", 10.0)]
    # MV refreshes on flush after new inserts
    rw.insert(data=pd.DataFrame({"product": ["b"], "price": [20.0]}),
              table_name="t_sdk_sales", force_flush=True)
    got = sorted(rw.fetch("SELECT * FROM t_sdk_sales_mv"))
    assert got == [("a", 2.0), ("b", 15.0)]
    mv._delete()
    assert not rw.check_exist("t_sdk_sales_mv")


def test_upsert_table_version_column(rw):
    rw.execute("DROP TABLE IF EXISTS t_sdk_progress")
    rw.execute(
        "CREATE TABLE IF NOT EXISTS t_sdk_progress "
        "(sub_name STRING PRIMARY KEY, progress BIGINT) "
        "ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(progress)"
    )
    rw.execute("INSERT INTO t_sdk_progress (sub_name, progress) VALUES ('s1', 10)")
    rw.execute("INSERT INTO t_sdk_progress (sub_name, progress) VALUES ('s1', 25)")
    rw.execute("INSERT INTO t_sdk_progress (sub_name, progress) VALUES ('s2', 5)")
    # stale version must NOT win
    rw.execute("INSERT INTO t_sdk_progress (sub_name, progress) VALUES ('s1', 7)")
    got = sorted(rw.fetch("SELECT * FROM t_sdk_progress"))
    assert got == [("s1", 25), ("s2", 5)]


def test_schema_namespaces(rw):
    rw.execute("CREATE SCHEMA IF NOT EXISTS t_sdk_ns")
    rw.insert(data=pd.DataFrame({"x": [1, 2]}), table_name="nums",
              schema_name="t_sdk_ns", force_flush=True)
    assert rw.check_exist("nums", schema_name="t_sdk_ns")
    assert len(rw.fetch("SELECT * FROM t_sdk_ns.nums")) == 2


def test_tumble_rewrite(rw):
    rw.execute("DROP TABLE IF EXISTS t_sdk_tumble")
    rows = pd.DataFrame({
        "sym": ["a", "a", "a"],
        "ts": pd.to_datetime(["2024-01-01 00:00:03", "2024-01-01 00:00:07",
                               "2024-01-01 00:00:14"]),
        "v": [1.0, 2.0, 10.0],
    })
    rw.insert(data=rows, table_name="t_sdk_tumble", force_flush=True)
    got = rw.fetch(
        "SELECT window_start, window_end, sym, avg(v) AS av "
        "FROM tumble(t_sdk_tumble, ts, interval '10 seconds') "
        "GROUP BY window_start, window_end, sym ORDER BY window_start"
    )
    assert len(got) == 2
    assert got[0][3] == 1.5 and got[1][3] == 10.0
    assert got[0][1] == got[1][0]  # adjacent windows


def test_hop_rewrite(rw):
    rw.execute("DROP TABLE IF EXISTS t_sdk_hop")
    rows = pd.DataFrame({
        "sym": ["a", "a"],
        "ts": pd.to_datetime(["2024-01-01 00:00:03", "2024-01-01 00:00:14"]),
        "v": [1.0, 10.0],
    })
    rw.insert(data=rows, table_name="t_sdk_hop", force_flush=True)
    got = rw.fetch(
        "SELECT window_start, window_end, count(*) AS n "
        "FROM hop(t_sdk_hop, ts, interval '5 seconds', interval '10 seconds') "
        "GROUP BY window_start, window_end ORDER BY window_start"
    )
    # each event lands in size/slide = 2 windows; t=3s → starts {-5,0},
    # t=14s → starts {5,10}; all window widths are 10 s
    assert len(got) == 4
    assert all(r[2] == 1 for r in got)
    assert all((r[1] - r[0]).total_seconds() == 10 for r in got)
    import datetime as dt

    assert got[0][0] == dt.datetime(2023, 12, 31, 23, 59, 55)
    assert got[1][0] == dt.datetime(2024, 1, 1, 0, 0, 0)


def test_output_formats(rw):
    df = rw.fetch("SELECT 1 AS a", format=OutputFormat.DATAFRAME)
    assert isinstance(df, pd.DataFrame) and df["a"].iloc[0] == 1
    raw = rw.fetch("SELECT 1 AS a", format=OutputFormat.RAW)
    assert raw == [(1,)]


def test_pg_function_shims(rw):
    assert rw.fetchone("SELECT strpos('hello', 'll') AS p")[0] == 3
    assert rw.fetchone("SELECT generate_series(1, 4) AS s")[0] == [1, 2, 3, 4]
    # natively-supported PG spellings stay available through fetch
    # (note: Spark's :: cast truncates toward zero where PG rounds —
    # a documented dialect divergence, not shimmed)
    assert rw.fetchone("SELECT 3.5::INT AS x")[0] == 3
    assert rw.fetchone("SELECT 'a' || 'b' AS x")[0] == "ab"
    assert rw.fetchone("SELECT position('ll' IN 'hello') AS x")[0] == 3
    # delimiter is literal (any regex metachar), per PG string_to_array
    assert rw.fetchone("SELECT string_to_array('a.b.c', '.') AS a")[0] == ["a", "b", "c"]
    assert rw.fetchone("SELECT array_length(string_to_array('x|y', '|'), 1) AS n")[0] == 2
    assert rw.fetchone("SELECT split_part('x|y|z', '|', 2) AS p")[0] == "y"


def test_asof_join_rewrite(rw):
    """ASOF JOIN grammar end-to-end through engine SQL: backward,
    strict, forward, and LEFT variants on a hand-built price/quote
    pair where every expected match is known."""
    rw.execute("DROP TABLE IF EXISTS t_sdk_trades")
    rw.execute("DROP TABLE IF EXISTS t_sdk_quotes")
    rw.insert(data=pd.DataFrame({
        "sym": ["a", "a", "b"],
        "tts": pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:10",
                               "2024-01-01 00:00:05"]),
    }), table_name="t_sdk_trades", force_flush=True)
    rw.insert(data=pd.DataFrame({
        "sym": ["a", "a", "a"],
        "qts": pd.to_datetime(["2024-01-01 00:00:04", "2024-01-01 00:00:05",
                               "2024-01-01 00:00:09"]),
        "px": [1.0, 2.0, 3.0],
    }), table_name="t_sdk_quotes", force_flush=True)

    # Backward inclusive: latest quote at-or-before each trade.
    got = rw.fetch(
        "SELECT t.sym, t.tts, q.px FROM t_sdk_trades t ASOF JOIN t_sdk_quotes q "
        "ON t.sym = q.sym AND t.tts >= q.qts ORDER BY t.tts"
    )
    assert [(r[0], r[2]) for r in got] == [("a", 2.0), ("a", 3.0)]

    # Backward strict: the 00:00:05 quote is no longer eligible for
    # the 00:00:05 trade.
    got = rw.fetch(
        "SELECT t.sym, t.tts, q.px FROM t_sdk_trades t ASOF JOIN t_sdk_quotes q "
        "ON t.sym = q.sym AND t.tts > q.qts ORDER BY t.tts"
    )
    assert [(r[0], r[2]) for r in got] == [("a", 1.0), ("a", 3.0)]

    # Forward inclusive: earliest quote at-or-after each trade. The
    # 00:00:10 trade has no later quote, so the inner join drops it.
    got = rw.fetch(
        "SELECT t.sym, t.tts, q.px FROM t_sdk_trades t ASOF JOIN t_sdk_quotes q "
        "ON t.sym = q.sym AND t.tts <= q.qts ORDER BY t.tts"
    )
    assert [(r[0], r[2]) for r in got] == [("a", 2.0)]

    # LEFT keeps the unmatched 'b' trade with NULL quote.
    got = rw.fetch(
        "SELECT t.sym, q.px FROM t_sdk_trades t ASOF LEFT JOIN t_sdk_quotes q "
        "ON t.sym = q.sym AND t.tts >= q.qts ORDER BY t.sym, t.tts"
    )
    assert len(got) == 3
    assert got[2][0] == "b" and got[2][1] is None

    rw.execute("DROP TABLE t_sdk_trades")
    rw.execute("DROP TABLE t_sdk_quotes")


def test_asof_join_rewrite_rejects_unsupported_terms():
    from risingwave_py_spark.plans.rewrite import rewrite_asof_join

    with pytest.raises(ValueError, match="inequality"):
        rewrite_asof_join("SELECT * FROM a x ASOF JOIN b y ON x.k = y.k")
    with pytest.raises(ValueError, match="equality key"):
        rewrite_asof_join("SELECT * FROM a x ASOF JOIN b y ON x.t >= y.t")
    with pytest.raises(ValueError, match="WHERE"):
        rewrite_asof_join(
            "SELECT * FROM a x ASOF JOIN b y ON x.k = y.k AND x.t >= y.t AND x.z = 1"
        )


def test_pg_regex_operators(rw):
    """PG `~` / `!~` / `~*` / `!~*` regex-match operators through the
    dialect pass; ILIKE and `::` casts are native in Spark 4."""
    rw.execute("DROP TABLE IF EXISTS t_sdk_rx")
    rw.insert(data=pd.DataFrame({"s": ["Alpha", "beta", "gamma"]}),
              table_name="t_sdk_rx", force_flush=True)
    assert rw.fetch(
        "SELECT s FROM t_sdk_rx WHERE s ~ '^b' ORDER BY s") == [("beta",)]
    assert rw.fetch(
        "SELECT s FROM t_sdk_rx WHERE s ~* '^a' ORDER BY s") == [("Alpha",)]
    assert rw.fetch(
        "SELECT s FROM t_sdk_rx WHERE s !~ 'a' ORDER BY s") == []
    assert rw.fetch(
        "SELECT s FROM t_sdk_rx WHERE s !~* '^[ab]' ORDER BY s") == [("gamma",)]
    assert rw.fetch(
        "SELECT s FROM t_sdk_rx WHERE s ILIKE 'alpha' ORDER BY s") == [("Alpha",)]
    # a lone '~' inside a string literal is untouched
    assert rw.fetch("SELECT '~' AS tilde") == [("~",)]
    # a regex-op SHAPE embedded inside a larger string literal (with
    # '' escapes) must pass through byte-identical, not become RLIKE
    assert rw.fetch("SELECT 'x ~ ''pat''' AS s") == [("x ~ 'pat'",)]
    assert rw.fetch("SELECT 'a.b ~* ''^q''' AS s") == [("a.b ~* '^q'",)]
    # ...while a REAL operator after such a literal still rewrites
    assert rw.fetch(
        "SELECT s FROM t_sdk_rx WHERE s <> 'x ~ ''p''' AND s ~ '^b'"
    ) == [("beta",)]
    rw.execute("DROP TABLE t_sdk_rx")


def test_pg_ordered_set_and_recursive_syntax(rw):
    """PG ordered-set aggregates and recursive CTEs are native in
    Spark 4 and reachable through the engine SQL surface unchanged."""
    assert rw.fetchone(
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY v) "
        "FROM VALUES (1.0),(2.0),(10.0) t(v)")[0] == 2.0
    assert rw.fetchone(
        "SELECT percentile_disc(0.75) WITHIN GROUP (ORDER BY v) "
        "FROM VALUES (1.0),(2.0),(10.0) t(v)")[0] == 10.0
    assert rw.fetchone(
        "SELECT mode() WITHIN GROUP (ORDER BY v) FROM VALUES (1),(2),(2) t(v)")[0] == 2
    assert rw.fetchone(
        "SELECT listagg(v, ',') WITHIN GROUP (ORDER BY v) "
        "FROM VALUES ('b'),('a') t(v)")[0] == "a,b"
    assert rw.fetchone(
        "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM r WHERE n < 5) "
        "SELECT sum(n) FROM r")[0] == 15


def test_dialect_edge_spellings(rw):
    """Review regressions in the dialect classifier/rewrites: compact
    INSERT/SET spellings, string literals containing AND, IN-lists in
    ASOF ON clauses, dotted JSON keys, unit-outside intervals, and
    parameterized column types."""
    import datetime as dt

    from risingwave_py_spark.plans.rewrite import (
        classify,
        parse_columns,
        rewrite_asof_join,
        rewrite_json_ops,
        rewrite_tumble,
    )

    # INSERT INTO t VALUES(...) — no space before the paren — must
    # still hit the engine's changelog-aware insert path.
    assert classify("INSERT INTO t VALUES(1,2)").kind == "INSERT"
    rw.execute("DROP TABLE IF EXISTS t_sdk_edge")
    rw.execute("CREATE TABLE t_sdk_edge (k INT, v VARCHAR(40), amt DECIMAL(10,2))")
    rw.execute("INSERT INTO t_sdk_edge VALUES(1, 'x', 2.50)")
    rw.execute("FLUSH")
    assert rw.fetch("SELECT * FROM t_sdk_edge") == [(1, "x", 2.50)] or \
        str(rw.fetch("SELECT * FROM t_sdk_edge")[0][2]) == "2.50"
    # the insert DID flow through the changelog (not raw spark.sql)
    assert rw.fetch(
        "SELECT count(*) FROM public.__rw_changelog__t_sdk_edge")[0][0] == 1
    rw.execute("DROP TABLE t_sdk_edge")

    # SET without spaces around '='
    rw.execute("SET application_mode='batch'")
    assert rw.fetch("SHOW application_mode") == [("batch",)]

    # AND inside a string literal must not split the ON clause
    sql = rewrite_asof_join(
        "SELECT * FROM a x ASOF JOIN b y ON x.k = y.k AND x.t >= y.t "
        "AND y.genre = 'rock and roll'"
    )
    assert "rock and roll" in sql and "rock AND roll" not in sql

    # IN-list (parens) in the residual + trailing semicolon
    sql = rewrite_asof_join(
        "SELECT * FROM a x ASOF JOIN b y ON x.k = y.k AND y.kind IN ('u', 'v') "
        "AND x.t >= y.t;"
    )
    assert "IN ('u', 'v')" in sql and sql.count("(") == sql.count(")")

    # the word ASOF inside a string literal is NOT join syntax
    sql = "SELECT 'the ASOF JOIN keyword' AS doc FROM a"
    assert rewrite_asof_join(sql) == sql

    # dotted JSON key → bracket-quoted path
    assert "$['user.name']" in rewrite_json_ops("SELECT p ->> 'user.name' FROM t")
    assert "$.name" in rewrite_json_ops("SELECT p ->> 'name' FROM t")

    # SQL-standard unit-outside interval form in tumble()
    out = rewrite_tumble("SELECT * FROM tumble(t, ts, interval '10' second)")
    assert "window_start" in out

    # parameterized types parse (DECIMAL split + VARCHAR(n))
    cols, pks = parse_columns("k INT PRIMARY KEY, v VARCHAR(40), amt DECIMAL(10,2)")
    assert cols == [("k", "INT"), ("v", "STRING"), ("amt", "DECIMAL(10,2)")]
    assert pks == ["k"]


def test_parameter_binding(rw):
    """Reference execute/fetch/fetchone accept *args bind parameters
    and forward them to SQLAlchemy text() (core.py:176,202,234), whose
    named-marker syntax (:name) Spark SQL shares. Positional ? markers
    also bind. DDL statement classes reject params explicitly."""
    df = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    rw.insert(data=df, table_name="t_sdk_params", force_flush=True)

    # named parameters, RAW
    assert rw.fetch(
        "SELECT k, v FROM t_sdk_params WHERE k > :lo ORDER BY k",
        OutputFormat.RAW, {"lo": 1},
    ) == [(2, "b"), (3, "c")]
    # positional parameters, DATAFRAME
    out = rw.fetch(
        "SELECT k, v FROM t_sdk_params WHERE v = ? OR v = ? ORDER BY k",
        OutputFormat.DATAFRAME, "a", "c",
    )
    assert list(out["k"]) == [1, 3]
    # fetchone with named params in both formats
    assert rw.fetchone(
        "SELECT v FROM t_sdk_params WHERE k = :k", OutputFormat.RAW, {"k": 2}
    ) == ("b",)
    one = rw.fetchone(
        "SELECT v FROM t_sdk_params WHERE k = :k",
        OutputFormat.DATAFRAME, {"k": 3},
    )
    assert list(one["v"]) == ["c"]
    # execute: INSERT VALUES with named params
    rw.execute(
        "INSERT INTO t_sdk_params (k, v) VALUES (:k, :v)", {"k": 9, "v": "z"}
    )
    rw.execute("FLUSH")
    assert rw.fetchone(
        "SELECT v FROM t_sdk_params WHERE k = :k", OutputFormat.RAW, {"k": 9}
    ) == ("z",)
    # params on a DDL class fail loudly, not silently
    with pytest.raises(NotImplementedError, match="bind parameters"):
        rw.execute("CREATE TABLE t_sdk_params_bad (k INT)", {"x": 1})
    rw.execute("DROP TABLE t_sdk_params")


def test_parameter_binding_dml(rw):
    """UPDATE/DELETE accept bind parameters too (the reference
    forwards *args for EVERY statement class, core.py:176): values
    are inlined as SQL literals into the SET/WHERE/RETURNING
    fragments — quote-escaped, markers inside string literals
    untouched, positional markers consumed in statement order."""
    df = pd.DataFrame({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "q?x"]})
    rw.insert(data=df, table_name="t_sdk_dmlp", force_flush=True)

    # named params across SET and WHERE
    rw.execute(
        "UPDATE t_sdk_dmlp SET v = :nv WHERE k = :k",
        {"nv": "it's", "k": 2},
    )
    assert rw.fetchone(
        "SELECT v FROM t_sdk_dmlp WHERE k = 2", OutputFormat.RAW
    ) == ("it's",)
    # positional params consumed in SET-then-WHERE order; the ?
    # inside the string literal is data, not a marker
    rw.execute(
        "UPDATE t_sdk_dmlp SET v = ? WHERE v = 'q?x' AND k = ?", "d", 4
    )
    assert rw.fetchone(
        "SELECT v FROM t_sdk_dmlp WHERE k = 4", OutputFormat.RAW
    ) == ("d",)
    # backslashes survive Spark's escape processing (doubled before
    # quotes) — and a crafted value cannot escape the string literal
    rw.execute("UPDATE t_sdk_dmlp SET v = :x WHERE k = 3",
               {"x": "C:\\temp"})
    assert rw.fetchone(
        "SELECT v FROM t_sdk_dmlp WHERE k = 3", OutputFormat.RAW
    ) == ("C:\\temp",)
    rw.execute("UPDATE t_sdk_dmlp SET v = 'safe' WHERE v = ?",
               "x\\' OR k > 0 --")
    assert rw.fetch("SELECT k FROM t_sdk_dmlp WHERE v = 'safe'") == []
    # DELETE with a named param + RETURNING
    rw.execute("DELETE FROM t_sdk_dmlp WHERE k <= :hi", {"hi": 1})
    assert rw.fetch("SELECT k FROM t_sdk_dmlp ORDER BY k") == [
        (2,), (3,), (4,),
    ]
    # unknown / unused params raise rather than silently no-op
    with pytest.raises(KeyError):
        rw.execute("DELETE FROM t_sdk_dmlp WHERE k = :missing", {"other": 1})
    with pytest.raises(ValueError):
        rw.execute("DELETE FROM t_sdk_dmlp WHERE k = ?", 1, 2)
    with pytest.raises(ValueError, match="more [?] markers"):
        rw.execute("DELETE FROM t_sdk_dmlp WHERE k = ? AND v = ?", 1)
    # mixing named params with positional markers fails at bind time
    # (not as an opaque parse error later inside F.expr)
    with pytest.raises(ValueError, match="mixed with named"):
        rw.execute("UPDATE t_sdk_dmlp SET v = :a WHERE k = ?", {"a": "z"})
    rw.execute("DROP TABLE t_sdk_dmlp")


def test_async_subscription_handler(rw):
    """The reference types SubscriptionHandler as Awaitable
    (core.py:18); a coroutine handler must actually run (driven to
    completion per batch), not be silently discarded."""
    import threading
    import time

    rw.insert(data=pd.DataFrame({"k": [1], "v": [2.0]}),
              table_name="t_sdk_async", force_flush=True)
    got: list = []

    async def handler(data):
        got.append(data)

    stop = threading.Event()
    t = threading.Thread(
        target=lambda: rw.on_change(
            subscribe_from="t_sdk_async", handler=handler,
            output_format=OutputFormat.RAW, persist_progress=False,
            max_batch_size=10, _stop_event=stop,
        ),
        daemon=True,
    )
    t.start()
    # the cursor starts at declare-time: keep producing until the
    # coroutine handler has demonstrably run
    deadline = time.time() + 120
    k = 2
    while not got and time.time() < deadline:
        rw.insert(data=pd.DataFrame({"k": [k], "v": [float(k)]}),
                  table_name="t_sdk_async", force_flush=True)
        k += 1
        time.sleep(0.5)
    stop.set()
    t.join(timeout=60)
    assert got, "async handler never ran"
    rw.execute("DROP TABLE t_sdk_async")


def test_sql_literal_rendering():
    """Unit contract for the DML bind-value renderer: backslashes are
    doubled BEFORE quotes (Spark's parser processes escape sequences
    in string literals), special floats become CAST literals, Decimal
    stays numeric, bytes become X'..' hex."""
    import datetime
    import decimal
    import math  # noqa: F401

    from risingwave_py_spark.plans.rewrite import sql_literal

    assert sql_literal(None) == "NULL"
    assert sql_literal(True) == "TRUE"
    assert sql_literal(42) == "42"
    assert sql_literal(1.5) == "1.5"
    assert sql_literal(float("nan")) == "CAST('NaN' AS DOUBLE)"
    assert sql_literal(float("-inf")) == "CAST('-Infinity' AS DOUBLE)"
    # Decimals stay exact-decimal through the parser: plain notation
    # (never exponent form, which Spark would type as DOUBLE) wrapped
    # in an explicit DECIMAL cast sized to the value
    assert sql_literal(decimal.Decimal("19.99")) == \
        "CAST('19.99' AS DECIMAL(4,2))"
    assert sql_literal(decimal.Decimal("1E+3")) == \
        "CAST('1000' AS DECIMAL(4,0))"
    assert sql_literal(decimal.Decimal("-0.05")) == \
        "CAST('-0.05' AS DECIMAL(2,2))"
    assert sql_literal(decimal.Decimal("0")) == "CAST('0' AS DECIMAL(1,0))"
    for bad in ("NaN", "Infinity", "-Infinity"):
        with pytest.raises(ValueError, match="non-finite Decimal"):
            sql_literal(decimal.Decimal(bad))
    assert sql_literal(b"\x01\xff") == "X'01ff'"
    assert sql_literal(datetime.date(2024, 1, 2)) == "DATE '2024-01-02'"
    assert sql_literal("it's") == "'it''s'"
    assert sql_literal("C:\\temp") == "'C:\\\\temp'"
    assert sql_literal("end\\") == "'end\\\\'"
    # the classic breakout: quote-escape preceded by a backslash
    assert sql_literal("x\\' OR 1=1 --") == "'x\\\\'' OR 1=1 --'"
