"""Empirical IVM scaling probe: measure MV refresh cost as the BASE
table grows, for the incremental fast paths vs snapshot-diff.

The claim under test (SCALE.md "Incremental delta-merge"): fast-path
flush cost tracks the DELTA (+ touched groups), not the base size —
so the fast/snapshot gap must widen roughly linearly with base rows,
for inserts AND for retraction (UPDATE/DELETE) batches.

Method: load k × 100k synthetic fact rows (100 groups) into an engine
table (one bulk insert), create agg / join+agg MVs, then time
  - a 100-row insert flush,
  - an UPDATE flush touching ONE group (retraction path),
on the fast path and again with the fast path disabled
(fastpath_blocked, snapshot-diff). Each timing is a full engine flush
including changelog publication.

Usage: python tools/ivm_probe.py [--scales 1,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def probe(spark, k: int, groups: int = 100) -> dict:
    from pyspark.sql import functions as F

    from risingwave_py_spark.core import RisingWaveConnection
    from risingwave_py_spark.engine import SparkEngine

    import shutil

    schema = f"ivmp{k}"
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(f"{wh.removeprefix('file:')}/{schema}.db", ignore_errors=True)
    eng = SparkEngine(spark=spark, default_schema=schema)
    conn = RisingWaveConnection(eng)

    fact = spark.range(100_000 * k).select(
        F.col("id").alias("k"),
        (F.col("id") % groups).alias("g"),
        (F.col("id") % 50).alias("v"),
    )
    eng.insert_df("fact", fact, schema_name=schema)
    conn.execute("FLUSH")
    dim_rows = spark.range(groups).select(
        F.col("id").alias("g"), F.concat(F.lit("grp"), F.col("id")).alias("name")
    )
    eng.insert_df("dim", dim_rows, schema_name=schema)
    conn.execute("FLUSH")
    n_rows = 100_000 * k

    conn.execute(
        f"CREATE MATERIALIZED VIEW {schema}.agg_mv AS "
        f"SELECT g, sum(v) AS total, count(*) AS n, max(v) AS hi "
        f"FROM {schema}.fact GROUP BY g"
    )
    conn.execute(
        f"CREATE MATERIALIZED VIEW {schema}.ja_mv AS "
        f"SELECT d.name AS name, sum(f.v) AS total, count(*) AS n "
        f"FROM {schema}.fact f JOIN {schema}.dim d ON f.g = d.g "
        f"GROUP BY d.name"
    )
    st_agg = eng.mvs[f"{schema}.agg_mv"]
    st_ja = eng.mvs[f"{schema}.ja_mv"]
    assert st_agg.inc is not None and st_ja.inc_joinagg is not None

    import pandas as pd

    def timed_flush() -> float:
        t0 = time.monotonic()
        conn.execute("FLUSH")
        return time.monotonic() - t0

    out: dict = {"k": k, "base_rows": n_rows, "groups": groups}

    def one_round(label: str) -> None:
        conn.insert(
            pd.DataFrame({"k": list(range(100)), "g": [i % 100 for i in range(100)],
                          "v": [5] * 100}),
            table_name="fact", schema_name=schema, force_flush=False,
        )
        out[f"insert_{label}"] = timed_flush()
        conn.execute(f"UPDATE {schema}.fact SET v = 7 WHERE g = 3 AND v = 5")
        out[f"update_{label}"] = timed_flush()

    # round 9: the 100-row insert delta is small enough for the
    # DRIVER-SIDE direct merge on agg_mv — "fast" now measures it
    assert st_agg.inc_direct is not None
    one_round("fast")
    assert st_agg.inc is not None and st_ja.inc_joinagg is not None, (
        "probe DML must stay on the fast paths"
    )
    # disarm ONLY the driver-side merge → the Spark inc path cost
    # (stable: the re-arm probe runs only from snapshot-diff, which
    # the still-armed inc path never reaches)
    st_agg.inc_direct = None
    one_round("incpath")
    assert st_agg.inc_direct is None and st_agg.inc is not None
    # disable the fast paths → snapshot-diff recompute per flush
    st_agg.inc = None
    st_ja.inc_joinagg = None
    st_agg.fastpath_blocked = True
    st_ja.fastpath_blocked = True
    one_round("snap")
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    return out


def probe_tumble(spark, k: int) -> dict:
    """Round-11 windowed-MV claim (VERDICT r10 'What's missing' #1):
    a BULK delta (1,000 rows — past DIRECT_MAX_DELTA_ROWS=512) on a
    tumble MV refreshes O(delta) via the Spark incremental merge, so
    the fast/snapshot gap must widen with base size. k=10 → 1M base
    rows at 1-second spacing under 15-SECOND windows (~66k groups —
    snapshot-diff must re-scan the base AND diff the full result per
    flush; the fast path touches the delta + touched windows)."""
    import shutil

    import pandas as pd
    from pyspark.sql import functions as F

    from risingwave_py_spark.core import RisingWaveConnection
    from risingwave_py_spark.engine import SparkEngine

    schema = f"ivmpt{k}"
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(f"{wh.removeprefix('file:')}/{schema}.db", ignore_errors=True)
    eng = SparkEngine(spark=spark, default_schema=schema)
    conn = RisingWaveConnection(eng)
    n = 100_000 * k
    t0_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    fact = spark.range(n).select(
        F.timestamp_micros(
            (F.lit(t0_us) + F.col("id") * 1_000_000).cast("bigint")
        ).alias("ts"),
        (F.col("id") % 50).alias("v"),
    )
    eng.insert_df("tick", fact, schema_name=schema)
    conn.execute("FLUSH")
    conn.execute(
        f"CREATE MATERIALIZED VIEW {schema}.wmv AS "
        f"SELECT window_start, window_end, sum(v) AS s, count(*) AS n "
        f"FROM tumble({schema}.tick, ts, interval '15 seconds') "
        f"GROUP BY window_start, window_end"
    )
    st = eng.mvs[f"{schema}.wmv"]
    assert st.inc is not None and st.inc["derive_tpl"], (
        "tumble MV must arm the Spark incremental path"
    )

    def timed_flush() -> float:
        t0 = time.monotonic()
        conn.execute("FLUSH")
        return time.monotonic() - t0

    out: dict = {"path": "tumble", "k": k, "base_rows": n}
    base = pd.Timestamp("2024-02-01 00:00:00")

    def one_round(label: str, off: int) -> None:
        delta = pd.DataFrame({
            "ts": [base + pd.Timedelta(seconds=off * 3600 + i)
                   for i in range(1000)],
            "v": [i % 50 for i in range(1000)],
        })
        conn.insert(delta, table_name="tick", schema_name=schema,
                    force_flush=False)
        out[f"insert_{label}"] = timed_flush()
        # one touched window: the retraction path must re-aggregate
        # only that window's base rows, never the 1M-row table
        conn.execute(
            f"UPDATE {schema}.tick SET v = 7 WHERE v = 5 AND "
            f"ts < TIMESTAMP '2024-01-01 00:00:15'"
        )
        out[f"update_{label}"] = timed_flush()

    one_round("fast", 0)
    assert st.inc is not None, "bulk tumble delta must stay incremental"
    st.inc = None
    st.inc_direct = None
    st.fastpath_blocked = True
    one_round("snap", 1)
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    return out


def probe_topn(spark, k: int, groups: int = 100) -> dict:
    """Same protocol for the grouped Top-N fast path (own schema so
    its refresh cost never pollutes the agg/join timings): a 100-row
    insert flush (stored-winners ∪ delta merge, zero base reads) and a
    one-group UPDATE flush (touched-partition re-rank from the base),
    fast path vs snapshot-diff."""
    import shutil

    import pandas as pd
    from pyspark.sql import functions as F

    from risingwave_py_spark.core import RisingWaveConnection
    from risingwave_py_spark.engine import SparkEngine

    schema = f"ivmt{k}"
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(f"{wh.removeprefix('file:')}/{schema}.db", ignore_errors=True)
    eng = SparkEngine(spark=spark, default_schema=schema)
    conn = RisingWaveConnection(eng)

    fact = spark.range(100_000 * k).select(
        F.col("id").alias("k"),
        (F.col("id") % groups).alias("g"),
        (F.col("id") % 50).alias("v"),
    )
    eng.insert_df("fact", fact, schema_name=schema)
    conn.execute("FLUSH")
    conn.execute(
        f"CREATE MATERIALIZED VIEW {schema}.topn_mv AS "
        f"SELECT * FROM (SELECT *, ROW_NUMBER() OVER "
        f"(PARTITION BY g ORDER BY v DESC, k) AS rnk FROM {schema}.fact) "
        f"WHERE rnk <= 3"
    )
    st_topn = eng.mvs[f"{schema}.topn_mv"]
    assert st_topn.inc_topn is not None

    def timed_flush() -> float:
        t0 = time.monotonic()
        conn.execute("FLUSH")
        return time.monotonic() - t0

    out: dict = {"k": k, "base_rows": 100_000 * k, "groups": groups}

    def one_round(label: str) -> None:
        conn.insert(
            pd.DataFrame({"k": [10_000_000 + i for i in range(100)],
                          "g": [i % groups for i in range(100)],
                          "v": [60] * 100}),
            table_name="fact", schema_name=schema, force_flush=False,
        )
        out[f"insert_{label}"] = timed_flush()
        conn.execute(f"UPDATE {schema}.fact SET v = 0 WHERE g = 3 AND v = 60")
        out[f"update_{label}"] = timed_flush()

    one_round("fast")
    assert st_topn.inc_topn is not None, "probe DML must stay on the fast path"
    st_topn.inc_topn = None
    st_topn.fastpath_blocked = True
    one_round("snap")
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,8")
    ap.add_argument("--groups", type=int, default=100)
    ap.add_argument("--path", choices=["agg", "topn", "tumble", "all"],
                    default="all")
    args = ap.parse_args()

    from risingwave_py_spark.session import build_session

    spark = build_session()
    rows = []
    for k in [int(s) for s in args.scales.split(",")]:
        if args.path in ("agg", "all"):
            r = probe(spark, k, args.groups)
            rows.append(r)
            print(json.dumps(r), flush=True)
        if args.path in ("topn", "all"):
            r = {"path": "topn", **probe_topn(spark, k, args.groups)}
            rows.append(r)
            print(json.dumps(r), flush=True)
        if args.path in ("tumble", "all"):
            r = probe_tumble(spark, k)
            rows.append(r)
            print(json.dumps(r), flush=True)
    print("\n| base rows | insert fast | insert snap | update fast | update snap |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['base_rows']:,} | {r['insert_fast']:.2f}s | "
            f"{r['insert_snap']:.2f}s | {r['update_fast']:.2f}s | "
            f"{r['update_snap']:.2f}s |"
        )


if __name__ == "__main__":
    main()
