"""Per-stage wall attribution for the sf1 TPC-H constant (q9/q10).

VERDICT r11 asked where the ~1-2 s absolute Spark time on 6M-row
TPC-H shapes goes before the "per-stage scheduling constant" claim is
pinned: scan vs exchange vs codegen compute vs scheduling/driver.

Method: run the benched SQL (sqlfast.SQL_TEXT, the exact text
bench.py times) with AQE OFF so the executed plan is static, take the
median-of-3 wall, then walk the executed plan's SQLMetrics:

  - scan        = sum of FileSourceScan "scan time" (+ metadata time)
  - exchange    = sum of Exchange shuffle write time + fetch wait
  - codegen     = max over WholeStageCodegen "duration" per stage-side
                  (an upper bound on pipeline compute; tasks overlap)
  - task wall   = sum of stage task-time from the status tracker
  - residual    = wall − (what the driver can see running) — the
                  dispatch/scheduling constant the claim is about

SQLMetric values are task-summed; with 32-way parallelism a metric
of N ms contributes ~N/32 ms of wall when the stage is saturated, so
the table prints both the raw sums and the /parallelism view. Job and
stage counts come from the status tracker for the dispatch story.

Usage: python tools/sf1_profile.py [--sf /root/repo/.testdata_sf1]
                                   [--queries q9_profit_by_nation,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def walk_metrics(node, rows, depth=0):
    name = node.nodeName()
    m = node.metrics()
    it = m.iterator()
    while it.hasNext():
        kv = it.next()
        rows.append((name, kv._1(), kv._2().value()))
    # AQE shells hide the real plan behind executedPlan/finalPlan
    ch = node.children()
    for i in range(ch.size()):
        walk_metrics(ch.apply(i), rows, depth + 1)
    # InputAdapter / QueryStage wrappers
    if name == "AdaptiveSparkPlan":
        walk_metrics(node.executedPlan(), rows, depth + 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.testdata_sf1")
    ap.add_argument(
        "--queries", default="q9_profit_by_nation,q10_returned_items"
    )
    args = ap.parse_args()

    from risingwave_py_spark import registry
    from risingwave_py_spark.catalog import ensure_views
    from risingwave_py_spark.operators.sqlfast import SQL_TEXT
    from risingwave_py_spark.session import build_session

    registry.load_all()
    spark = build_session("sf1-profile")
    # static plans: attribute a fixed executed tree, like bench.py
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    ensure_views(spark, args.sf)
    sc = spark.sparkContext
    par = sc.defaultParallelism
    out = {}
    for q in args.queries.split(","):
        text = SQL_TEXT[q]
        for _ in range(2):  # codegen + page-cache warm
            spark.sql(text).collect()
        jids_before = set(sc.statusTracker().getJobIdsForGroup(None))
        walls = []
        for _ in range(3):
            t0 = time.time()
            df = spark.sql(text)
            df.collect()
            walls.append(time.time() - t0)
        wall = sorted(walls)[1]
        jids_after = set(sc.statusTracker().getJobIdsForGroup(None))
        rows: list[tuple] = []
        walk_metrics(df._jdf.queryExecution().executedPlan(), rows)

        def pick(key_subs: tuple[str, ...]) -> float:
            # SQLMetric internal keys (camelCase); shuffleWriteTime is
            # the one nanosecond-valued timer — caller converts
            return sum(
                val
                for _, metric, val in rows
                if any(metric == s for s in key_subs)
            )

        scan_ms = pick(("scanTime", "metadataTime"))
        shuffle_write_ms = pick(("shuffleWriteTime",)) / 1e6  # ns
        fetch_wait_ms = pick(("fetchWaitTime",))
        codegen_ms = pick(("pipelineTime",))
        agg_ms = pick(("aggTime",))
        join_build_ms = pick(("buildTime",))
        broadcast_ms = pick(("broadcastTime", "collectTime"))
        jids = sorted(jids_after - jids_before)
        n_stages = sum(
            len(sc.statusTracker().getJobInfo(j).stageIds)
            for j in jids
            if sc.statusTracker().getJobInfo(j) is not None
        )
        covered = (scan_ms + shuffle_write_ms + codegen_ms) / par / 1e3
        out[q] = {
            "wall_sec": round(wall, 3),
            "walls": [round(w, 3) for w in walls],
            "parallelism": par,
            "task_summed_ms": {
                "scan": int(scan_ms),
                "shuffle_write": int(shuffle_write_ms),
                "fetch_wait": int(fetch_wait_ms),
                "codegen_pipelines": int(codegen_ms),
                "agg_build": int(agg_ms),
                "join_build": int(join_build_ms),
                "broadcast_driver": int(broadcast_ms),
            },
            "wall_view_sec": {
                "scan/par": round(scan_ms / par / 1e3, 3),
                "shuffle_write/par": round(shuffle_write_ms / par / 1e3, 3),
                "codegen/par": round(codegen_ms / par / 1e3, 3),
                "covered_total": round(covered, 3),
                "residual_dispatch": round(wall - covered, 3),
            },
            "jobs": len(jids),
            "stages": n_stages,
        }
        print(q, json.dumps(out[q]), flush=True)
    print("PROFILE " + json.dumps(out))


if __name__ == "__main__":
    main()
