"""Fixed-code A/B probe (VERDICT r9 #2): pin whether the r8->r9 bench
movement (engine +18% on identical plans vs DuckDB +4%) is host drift
or a real engine-side regression.

Methodology: bench.py's bracketed protocol cannot distinguish a
uniform host slowdown from a uniform engine regression, and true
in-process interleaving is invalid (a live ~100 GiB JVM perturbs
DuckDB 10x+ — see bench.py). So the A/B alternates PROCESSES over the
same host window: engine mini-bench runs of the top movers at two
CODE CHECKOUTS (r8-final worktree vs current tree), bracketed by
DuckDB-alone canary runs that track host speed. A stable E(current) >
E(r8) delta with flat canaries is a real regression; both moving with
the canaries is host drift.

Usage:
  python tools/ab_probe.py engine          # mini-bench, current code
  python tools/ab_probe.py duck            # DuckDB canary
Each prints ONE JSON line {"mode":..., "queries": {name: sec}}.
The alternation itself is driven externally (run this script from
each checkout in A/B/A/B order).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOVERS = [
    "ann_ivf_topk",
    "ann_cosine_topk",
    "dedup_minhash_lsh",
    "window_topk_per_group",
    "agg_salted_skew",
]


def engine_pass(sf_dir: str) -> dict[str, float]:
    from risingwave_py_spark import registry
    from risingwave_py_spark.session import build_session

    registry.load_all()
    spark = build_session(
        "ab_probe",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.range(1).count()
    # same two-pass warm as bench.py, restricted to the probed set
    for _ in range(2):
        for name in MOVERS:
            registry.QUERIES[name](spark, sf_dir).toPandas()
    out: dict[str, float] = {}
    for name in MOVERS:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).toPandas()
            runs.append(time.perf_counter() - t0)
        out[name] = round(sorted(runs)[1], 3)
    spark.stop()
    return out


def duck_pass(sf_dir: str) -> dict[str, float]:
    import duckdb

    from risingwave_py_spark import registry

    registry.load_all()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out: dict[str, float] = {}
    for name in MOVERS:
        sql = registry.ORACLES[name]
        con.execute(sql).fetchall(); con.execute(sql).fetchall()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).df()
            runs.append(time.perf_counter() - t0)
        out[name] = round(sorted(runs)[1], 3)
    con.close()
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "engine"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fn = engine_pass if mode == "engine" else duck_pass
    q = fn(sf_dir)
    print(json.dumps({
        "mode": mode,
        "cwd": os.getcwd(),
        "total": round(sum(q.values()), 3),
        "queries": q,
    }))


if __name__ == "__main__":
    main()
