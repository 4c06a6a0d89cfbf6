"""EMA fold probe: array form vs applyInPandas escape hatch at
1x/2x/4x/8x the sf0.1 events table (VERDICT r9 #5).

Scaled corpora re-key event_id by +c*N with ts/value unchanged, so
per-key histories grow k-fold (the dimension the array form is
bounded by: one collect_list array per event_type on one executor).
Both forms must return BIT-IDENTICAL rows at every scale; the probe
prints wall times and fails loudly on any divergence.

Usage: python tools/ema_probe.py [--max-scale 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-scale", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import risingwave_py_spark.operators.analytic as A
    from risingwave_py_spark.catalog import table
    from risingwave_py_spark.session import build_session

    spark = build_session()
    e1 = table(spark, BASE, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    n = e1.count()
    k = 1
    print(f"{'scale':>5} {'rows':>9} {'array_s':>8} {'pandas_s':>9}  equal")
    while k <= args.max_scale:
        e = e1
        for c in range(1, k):
            e = e.unionByName(
                e1.select(
                    (F.col("event_id") + c * n).alias("event_id"),
                    "ts", "event_type", "value",
                )
            )
        e = e.localCheckpoint(eager=True)

        def run(df):
            per = df.groupBy("event_type").agg(
                F.count("*").alias("n_events"),
                F.expr(
                    "sort_array(collect_list(struct(ts, event_id, value)))"
                ).alias("h"),
                F.round(
                    F.avg(F.col("value").cast("double")), 6
                ).alias("mean_value"),
            )
            vals = "transform(h, s -> CAST(s.value AS DOUBLE))"
            return per.select(
                "event_type", "n_events",
                F.expr(
                    f"round(aggregate(slice({vals}, 2, size(h) - 1), "
                    f"element_at({vals}, 1), "
                    f"(acc, x) -> acc + CAST(0.125 AS DOUBLE) * (x - acc)), 6)"
                ).alias("ema"),
                "mean_value",
            ).orderBy("event_type")

        t0 = time.perf_counter()
        a = [tuple(r) for r in run(e).collect()]
        t_arr = time.perf_counter() - t0
        t0 = time.perf_counter()
        b = [tuple(r) for r in A._ema_drift_pandas(e).collect()]
        t_pd = time.perf_counter() - t0
        print(f"{k:>5} {n * k:>9} {t_arr:>8.2f} {t_pd:>9.2f}  {a == b}")
        if a != b:
            print("array :", a)
            print("pandas:", b)
            sys.exit(1)
        k *= 2


if __name__ == "__main__":
    main()
