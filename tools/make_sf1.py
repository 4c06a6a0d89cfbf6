"""Build an sf1-scale copy of the driver testdata (round 11, verdict
item #4): ~6 M lineitem rows, with EVERY key-bearing table scaled 10×
by re-keyed independent copies — unlike the 8× fact-only probe, dims
(customer/supplier/part) and the events/documents/embeddings tables
scale too, so GROUP COUNTS grow 10× (the IVM/ANN state-path stress the
verdict asked for). region/nation stay fixed (TPC-H does the same).

Copy c of each table shifts its primary key (and every foreign key
into a scaled table) by c*offset, creating 10 disjoint universes over
the shared region/nation dims: join fan-in and group cardinality grow
the way a real 10× scale-up grows. The oracle protocol is unchanged —
verify_queries.py --sf <out> runs Spark and DuckDB over the SAME
parquet, so correctness is scale-independent by construction.

Usage: python tools/make_sf1.py [--out /root/repo/.testdata_sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.testdata_sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from risingwave_py_spark.catalog import table
    from risingwave_py_spark.session import build_session

    spark = build_session("make_sf1", shuffle_partitions=32)
    os.environ["SPARK_GRAFT_SPLIT_CACHE"] = "0"
    k = args.k
    shutil.rmtree(args.out, ignore_errors=True)
    os.makedirs(args.out, exist_ok=True)

    def off(name: str, col: str) -> int:
        return table(spark, BASE, name).agg(F.max(col)).first()[0] + 1

    o_cust = off("customer", "c_custkey")
    o_supp = off("supplier", "s_suppkey")
    o_part = off("part", "p_partkey")
    o_ord = off("orders", "o_orderkey")
    o_ev = off("events", "event_id")
    o_user = off("events", "user_id")
    o_doc = off("documents", "doc_id")
    o_vec = off("embeddings", "vec_id")

    # (table, {col: per-copy offset}) — every key shifted consistently
    # so copy c's facts reference copy c's dims
    plans = [
        ("customer", {"c_custkey": o_cust}),
        ("supplier", {"s_suppkey": o_supp}),
        ("part", {"p_partkey": o_part}),
        ("orders", {"o_orderkey": o_ord, "o_custkey": o_cust}),
        ("lineitem", {"l_orderkey": o_ord, "l_suppkey": o_supp,
                      "l_partkey": o_part}),
        ("events", {"event_id": o_ev, "user_id": o_user}),
        ("documents", {"doc_id": o_doc}),
        ("embeddings", {"vec_id": o_vec}),
    ]
    for name, shifts in plans:
        d = table(spark, BASE, name)
        parts = []
        for c in range(k):
            p = d
            for col, o in shifts.items():
                p = p.withColumn(col, F.col(col) + c * o)
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        nfiles = max(8, 2 * k) if name in ("lineitem", "orders",
                                           "events") else 8
        out.repartition(nfiles).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{name}.parquet")
        )
        print(f"{name}: x{k}", flush=True)
    for t in ("region", "nation"):
        shutil.copy(os.path.join(BASE, f"{t}.parquet"),
                    os.path.join(args.out, f"{t}.parquet"))
    print(f"done → {args.out}")


if __name__ == "__main__":
    main()
