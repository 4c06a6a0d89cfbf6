"""Cross-PROCESS catalog durability via the opt-in persistent-
metastore session mode (session.py build_session(persistent_metastore
=True) / SPARK_GRAFT_METASTORE=derby).

The default engine session uses Spark's in-memory catalog: same-
process restarts restore from the persisted JSON doc, but a NEW
process previously had to replay that doc against a cold catalog.
With the embedded Derby Hive metastore next to the warehouse, table/
view definitions survive the process natively and the doc only
re-attaches the semantics Spark's catalog cannot hold (MV state,
subscriptions, upsert metadata). These tests spawn REAL separate
python processes — the only honest way to test process death.

Reference scope note: the reference SDK delegates all durability to
its server (/root/reference/risingwave/core.py connects over
PG-wire); this mode is the Spark-native equivalent of that server's
persistent catalog. On a cluster, Hive/Glue plays Derby's role.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap


def _run(tmp_path, body: str) -> str:
    script = textwrap.dedent(
        f"""
        import os, sys
        sys.path.insert(0, {str(__import__('pathlib').Path(__file__).resolve().parents[1])!r})
        os.chdir({str(tmp_path)!r})  # derby.log + relative paths land here
        from risingwave_py_spark.session import build_session
        from risingwave_py_spark.engine import SparkEngine
        from risingwave_py_spark.core import RisingWaveConnection
        import pandas as pd
        spark = build_session(
            "metastore-test", shuffle_partitions=4,
            persistent_metastore=True,
            warehouse_dir={str(tmp_path / "warehouse")!r},
        )
        """
    ) + textwrap.dedent(body)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    return proc.stdout


def test_engine_catalog_survives_process_restart(tmp_path):
    out_a = _run(tmp_path, """
        conn = RisingWaveConnection(SparkEngine(spark))
        conn.execute("CREATE TABLE ms_t (k INT, v DOUBLE)")
        conn.insert(pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]}),
                    table_name="ms_t", force_flush=True)
        conn.execute("CREATE MATERIALIZED VIEW ms_mv AS "
                     "SELECT count(*) AS n, sum(v) AS s FROM ms_t")
        print("A_ROWS", conn.fetch("SELECT n, s FROM ms_mv"))
        spark.stop()
    """)
    assert "A_ROWS [(2, 4.0)]" in out_a

    # a brand-new PROCESS over the same warehouse: tables and views
    # come back from the Derby metastore, engine semantics (MV
    # registration, epochs) from the catalog doc — and the restored
    # MV keeps refreshing on new DML
    out_b = _run(tmp_path, """
        eng = SparkEngine(spark)
        assert "public.ms_mv" in eng.mvs, sorted(eng.mvs)
        conn = RisingWaveConnection(eng)
        print("B_RESTORED", conn.fetch("SELECT n, s FROM ms_mv"))
        conn.insert(pd.DataFrame({"k": [3], "v": [3.0]}),
                    table_name="ms_t", force_flush=True)
        print("B_AFTER", conn.fetch("SELECT n, s FROM ms_mv"))
        spark.stop()
    """)
    assert "B_RESTORED [(2, 4.0)]" in out_b
    assert "B_AFTER [(3, 7.0)]" in out_b
