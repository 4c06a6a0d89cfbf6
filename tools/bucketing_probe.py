"""Bucketed-layout probe: what co-locating the fact tables on the
join/group key buys at scale.

The round-6 fact-scaling probe (SCALE.md) showed q18/q9's residual
cost at 8x is the lineitem->orders fact-fact edge: the per-orderkey
aggregate shuffles 1.2M groups, then the join moves orders. At 100 TB
the standard fix is LAYOUT, not plan: bucket both facts by orderkey
at ingest (Spark `bucketBy`, the Hive-compatible clustered layout;
Delta/Iceberg equivalents are clustering / sorted partitions). Then:

- GROUP BY l_orderkey needs NO exchange (bucketed scan satisfies the
  required hash distribution);
- the oq<->orders join needs NO exchange on either side (same bucket
  count, same key);
- only the tiny customer dim broadcast remains.

This probe writes bucketed copies of the scaled facts, runs the
q18-shape on both layouts (median of N, one session, interleaved),
and prints the exchange count from each plan — evidence for the
SCALE.md claim that the remaining local-mode gap vs DuckDB is
exchange machinery that layout removes.

Usage: python tools/bucketing_probe.py [--scale-dir /tmp/rw_scale_tpch_8]
(build the scaled dir first via `python tools/scaling_probe.py
--suite tpch`).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BUCKETS = 16

Q18 = """
WITH oq AS (SELECT l_orderkey, SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS qc
            FROM {li} GROUP BY l_orderkey
            HAVING SUM(CAST(round(l_quantity*100,0) AS BIGINT)) > 27000)
SELECT /*+ BROADCAST(c) */ c_name, c_custkey, o_orderkey, o_orderdate,
       o_totalprice, CAST(CAST(qc AS DECIMAL(38,0))/100 AS DOUBLE) AS sum_qty
FROM oq JOIN {o} o ON oq.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def n_exchanges(spark, sql: str) -> int:
    plan = spark.sql(sql)._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln or "Exchange rangepartitioning" in ln
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale-dir", default="/tmp/rw_scale_tpch_8")
    ap.add_argument("--rounds", type=int, default=7)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_SPLIT_CACHE"] = "0"
    from risingwave_py_spark.session import build_session

    spark = build_session("bucketing-probe", shuffle_partitions=32)
    from risingwave_py_spark.operators.sqlfast import ensure_views

    ensure_views(spark, args.scale_dir)

    # Bucketed copies (one-time ingest cost, amortized over every
    # subsequent query — measured and printed for honesty).
    from risingwave_py_spark.catalog import clear_stale_location

    t0 = time.perf_counter()
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        tbl = f"default.__bkt_{name}__"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        clear_stale_location(spark, tbl)
        (
            spark.table(name)
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
    ingest = time.perf_counter() - t0
    print(f"bucketed ingest ({N_BUCKETS} buckets/fact): {ingest:.1f}s")

    variants = {
        "plain": Q18.format(li="lineitem", o="orders"),
        "bucketed": Q18.format(li="default.__bkt_lineitem__",
                               o="default.__bkt_orders__"),
    }
    for label, sql in variants.items():
        print(f"{label:9s} exchanges in plan: {n_exchanges(spark, sql)}")
    for sql in variants.values():
        spark.sql(sql).collect()  # warm
    res = {k: [] for k in variants}
    for _ in range(args.rounds):
        for k, sql in variants.items():
            t0 = time.perf_counter()
            spark.sql(sql).collect()
            res[k].append(time.perf_counter() - t0)
    for k, runs in res.items():
        print(f"{k:9s} q18-shape median {statistics.median(runs):.3f}s "
              f"min {min(runs):.3f}s")
    for name in ("lineitem", "orders"):  # disk hygiene
        spark.sql(f"DROP TABLE IF EXISTS default.__bkt_{name}__")


if __name__ == "__main__":
    main()
