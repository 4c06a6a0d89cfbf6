"""Epoch-manifest steady-state probe (round 11, verdict item #3).

Measures the per-flush refresh latency of a direct-path MV as the
base changelog's RETAINED EPOCH COUNT grows 10² → 10³ → 10⁴, plus the
raw cost of the SHOW PARTITIONS listing the manifest replaced. Before
round 11 every flush ran that listing (O(retained epochs) driver-side,
93 ms at ~140 epochs per the r10 verdict); with the manifest the
steady-state check is one os.stat of the commit marker, so flush
latency must stay FLAT in the epoch count.

Usage: python tools/manifest_probe.py [--max 10000]
Appends one JSON line per epoch level to stdout; paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from risingwave_py_spark.engine import SparkEngine  # noqa: E402
from risingwave_py_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max", type=int, default=10_000)
    ap.add_argument("--flushes", type=int, default=40)
    args = ap.parse_args()

    import shutil

    from risingwave_py_spark.core import RisingWaveConnection

    spark = build_session("manifest_probe", shuffle_partitions=8)
    spark.sql("DROP DATABASE IF EXISTS mprobe CASCADE")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(f"{wh.removeprefix('file:')}/mprobe.db", ignore_errors=True)
    eng = SparkEngine(spark=spark, default_schema="mprobe")
    conn = RisingWaveConnection(eng)
    conn.execute("CREATE TABLE mprobe.t (p STRING, v BIGINT)")
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("p", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    eng.insert_rows_local("t", [("seed", 0)], schema, "mprobe")
    conn.execute("CREATE MATERIALIZED VIEW mprobe.m AS "
                 "SELECT p, sum(v) AS s, count(*) AS n "
                 "FROM mprobe.t GROUP BY p")
    st = eng.mvs["mprobe.m"]
    cl = eng.changelog_name("mprobe.t")

    import pyarrow as pa
    import pyarrow.parquet as pq

    cl_loc = eng._table_location(cl)

    def fabricate_epochs(upto: int, committed: int) -> int:
        """Accumulate retained history WITHOUT paying 10k sequential
        ALTERs (the probe measures FLUSH latency at a given retained
        count, not accumulation cost): write one-row epoch partition
        dirs directly, register them with ONE recoverPartitions, bump
        the engine's epoch counter, and invalidate the manifest (the
        next flush re-lists once — exactly the restart/drift path)."""
        while committed < upto:
            committed += 1
            pdir = os.path.join(cl_loc, f"rw_timestamp={committed}")
            os.makedirs(pdir, exist_ok=True)
            pq.write_table(
                pa.table({"p": ["bulk"], "v": [committed],
                          "op": ["Insert"]}),
                os.path.join(pdir, f"rwfast-fab-{committed}.parquet"),
            )
        spark.catalog.recoverPartitions(cl)
        spark.catalog.refreshTable(cl)
        eng._epoch = max(eng._epoch, committed)
        eng._epoch_cache.pop(cl, None)
        eng._touch_epoch_marker(cl)
        return committed

    levels = [n for n in (100, 1_000, 10_000) if n <= args.max]
    committed = 1
    for level in levels:
        committed = fabricate_epochs(level - args.flushes, committed)
        # measured phase: insert_row + full MV refresh per flush
        lat: list[float] = []
        for i in range(args.flushes):
            t0 = time.perf_counter()
            eng.insert_rows_local("t", [("hot", i)], schema, "mprobe")
            committed += 1
            eng.refresh_mv(st)
            lat.append((time.perf_counter() - t0) * 1e3)
        # the listing the manifest replaced, at this epoch count
        t0 = time.perf_counter()
        nparts = len(spark.sql(f"SHOW PARTITIONS {cl}").collect())
        show_ms = (time.perf_counter() - t0) * 1e3
        print(json.dumps({
            "retained_epochs": nparts,
            "flush_ms_median": round(statistics.median(lat), 2),
            "flush_ms_p90": round(sorted(lat)[int(0.9 * len(lat))], 2),
            "show_partitions_ms": round(show_ms, 2),
            "direct_armed": st.inc_direct is not None,
        }), flush=True)

    spark.sql("DROP DATABASE IF EXISTS mprobe CASCADE")


if __name__ == "__main__":
    main()
