"""Per-query wall-time decomposition (guide §1): split each benched
query's toPandas wall into
  build  — Python-side DataFrame construction (fn call)
  plan   — Catalyst analysis/optimization/physical planning
           (forcing queryExecution().executedPlan())
  exec   — noop-sink execution (jobs, no driver collect)
  pandas — full fn().toPandas() wall (the benched number), so
           pandas - (build+plan+exec) ~ Arrow collect overhead
Each phase is measured on a FRESH fn() invocation (median of N) after
the standard two warm passes, in bench.py's session (AQE off, sized
shuffle partitions).

Usage: python tools/decompose_probe.py [names...]   (default: bench set)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, PROBE_RUNS (default 5).
"""

from __future__ import annotations

import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    n_runs = int(os.environ.get("PROBE_RUNS", "5"))

    from risingwave_py_spark import registry
    from risingwave_py_spark.session import build_session

    registry.load_all()
    import bench

    names = sys.argv[1:] or bench.BENCH_QUERIES
    parts = max(8, min(200, int(64 * sf))) if sf > 0 else 32
    spark = build_session(
        "decompose_probe",
        shuffle_partitions=parts,
        extra_conf={"spark.sql.adaptive.enabled": "false"} if sf <= 1 else None,
    )
    spark.range(1).count()
    for _ in range(2):
        for name in names:
            try:
                registry.QUERIES[name](spark, sf_dir).toPandas()
            except Exception as exc:  # noqa: BLE001
                print(f"warm {name} FAILED: {exc}", file=sys.stderr)

    tracker = spark.sparkContext.statusTracker()
    print(f"{'query':30s} {'build':>7s} {'plan':>7s} {'exec':>7s} "
          f"{'pandas':>7s} {'jobs':>4s}")
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        try:
            builds, plans, execs, pandas_w = [], [], [], []
            jobs = 0
            for i in range(n_runs):
                spark.sparkContext.setJobDescription(f"probe {name}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df._jdf.queryExecution().executedPlan()
                t2 = time.perf_counter()
                j0 = len(tracker.getJobIdsForGroup(None) or [])
                df.write.format("noop").mode("overwrite").save()
                t3 = time.perf_counter()
                if i == 0:
                    # count jobs of the noop execute via new job ids
                    jobs = len(tracker.getJobIdsForGroup(None) or []) - j0
                builds.append(t1 - t0)
                plans.append(t2 - t1)
                execs.append(t3 - t2)
                t4 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                pandas_w.append(time.perf_counter() - t4)
            med = statistics.median
            print(f"{name:30s} {med(builds):7.3f} {med(plans):7.3f} "
                  f"{med(execs):7.3f} {med(pandas_w):7.3f} {jobs:4d}",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name} FAILED: {exc}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
