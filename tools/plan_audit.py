"""Plan audit: scan every registered non-scenario query's physical
plan for scale-killer signatures and summarize.

Flags per query:
  - CartesianProduct            (quadratic join)
  - BatchEvalPython             (row-at-a-time pickled Python UDF)
  - ArrowEvalPython / MapInPandas / MapInArrow (Python boundary —
    expected for decode kernels; listed for the record)
  - SortMergeJoin               (usually fine at scale; listed)
  - BroadcastNestedLoopJoin     (fine for tiny×N non-equi; listed)
  - scans whose ReadSchema is the full table width (pruning defeated)

Usage: python tools/plan_audit.py [--sf DIR] > plans/r12/plan_audit.txt
Scenario queries (engine DML) are skipped: their cost is covered by
the subscription-latency benchmark, not a single static plan.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

FLAGS = [
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
]


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]

    from risingwave_py_spark import registry
    from risingwave_py_spark.session import build_session

    registry.load_all()
    spark = build_session("plan_audit", shuffle_partitions=8)

    names = args or [
        n for n in registry.ordered_queries() if not n.endswith("_scenario")
    ]
    counts: dict[str, list[str]] = {f: [] for f in FLAGS}
    exchanges: dict[str, int] = {}
    errors: list[str] = []
    for name in names:
        fn = registry.QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            errors.append(f"{name}: {exc}")
            continue
        hits = [f for f in FLAGS if f in plan]
        for f in hits:
            counts[f].append(name)
        exchanges[name] = len(re.findall(r"\bExchange\b", plan))
        print(f"{name}: exchanges={exchanges[name]}"
              + (f" flags={','.join(hits)}" if hits else ""), flush=True)
    print("\n=== summary ===")
    for f in FLAGS:
        print(f"{f}: {len(counts[f])} -> {', '.join(counts[f]) or '-'}")
    if errors:
        print("\nerrors:")
        for e in errors:
            print(" ", e)
    spark.stop()


if __name__ == "__main__":
    main()
