"""Capture .explain('formatted') output for every benched query.

Usage: python tools/capture_plans.py <outdir-suffix, e.g. r12/before>
Writes plans/<suffix>/<query>_<tag>.txt (tag = basename of suffix).

Matches the bench session: AQE off at sf<=1, shuffle partitions sized
by sf (bench.py's formula), so the captured plan is the plan the bench
actually runs. Queries that execute multiple internal actions (dedup
ladders) capture the plan of the RETURNED DataFrame plus a jobs/stages
count from the status tracker for the full invocation.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "r12/before"
    tag = os.path.basename(suffix.rstrip("/"))
    outdir = os.path.join("/root/repo/plans", suffix)
    os.makedirs(outdir, exist_ok=True)
    only = sys.argv[2:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from risingwave_py_spark import registry
    from risingwave_py_spark.session import build_session

    registry.load_all()
    import bench

    parts = max(8, min(200, int(64 * sf))) if sf > 0 else 32
    spark = build_session(
        "plans",
        shuffle_partitions=parts,
        extra_conf={"spark.sql.adaptive.enabled": "false"} if sf <= 1 else None,
    )
    sc = spark.sparkContext
    st = spark.sparkContext.statusTracker()

    names = only or bench.BENCH_QUERIES
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        sc.setJobDescription(f"plan-capture {name}")
        try:
            jobs0 = len(st.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            # one execution so multi-action queries report their full
            # job count (plan text itself is pre-execution)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            jobs1 = len(st.getJobIdsForGroup(None))
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(
                    f"-- {name} @ {sf_dir} ({tag}); shuffle.partitions={parts}, "
                    f"AQE={'off' if sf <= 1 else 'on'}\n"
                    f"-- invocation: {jobs1 - jobs0} Spark jobs, "
                    f"{wall:.3f}s wall (fn + noop-sink execute, single run)\n"
                )
                fh.write(plan)
            print(f"{name}: {jobs1 - jobs0} jobs, {wall:.3f}s", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name} FAILED: {exc}", flush=True)
        finally:
            sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
