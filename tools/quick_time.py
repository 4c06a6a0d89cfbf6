"""Quick per-query timing mirroring bench.py's session + protocol
(2 untimed warm passes, median of N timed toPandas runs) for a subset
of queries — used for optimization A/B iterations where the full
bracketed bench would be overkill.

Usage: python tools/quick_time.py q1_pricing_summary dedup_simhash ...
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, QUICK_RUNS (default 5).
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    n_runs = int(os.environ.get("QUICK_RUNS", "5"))
    names = sys.argv[1:]

    from risingwave_py_spark import registry
    from risingwave_py_spark.session import build_session

    registry.load_all()
    parts = max(8, min(200, int(64 * sf))) if sf > 0 else 32
    spark = build_session(
        "quick_time",
        shuffle_partitions=parts,
        extra_conf={"spark.sql.adaptive.enabled": "false"} if sf <= 1 else None,
    )
    spark.range(1).count()
    for _ in range(2):
        for name in names:
            registry.QUERIES[name](spark, sf_dir).toPandas()
    for name in names:
        fn = registry.QUERIES[name]
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        print(
            f"{name}: median {runs[len(runs) // 2]:.3f}s "
            f"min {runs[0]:.3f} max {runs[-1]:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
