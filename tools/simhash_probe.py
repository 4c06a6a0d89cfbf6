"""Decompose dedup_simhash's wall time into its two real phases
(guide §1): the fingerprint pass (tokenize + 64 bit-vote aggregate
over the corpus — the O(corpus) stage) and the 4-band rung (band
explode, self-join on (band, val), hamming filter, DISTINCT, top-20).

Verdict r12 item 6 asks whether rung-side pruning (pre-aggregating
band collisions per pair / pushing the hamming filter lower) is worth
restructuring; that only makes sense if the rung is a material share
of the query. This probe times each phase separately (median of N
fresh runs after a warm pass) in the bench session shape.

Usage: python tools/simhash_probe.py   (env SPARK_GRAFT_SF_DIR/_CPUS,
PROBE_RUNS default 5)
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

    from risingwave_py_spark.session import build_session
    from risingwave_py_spark.catalog import ensure_views
    from risingwave_py_spark.operators import sqlfast

    parts = max(8, min(200, int(64 * sf))) if sf > 0 else 32
    spark = build_session(
        "simhash_probe",
        shuffle_partitions=parts,
        extra_conf={"spark.sql.adaptive.enabled": "false"} if sf <= 1 else None,
    )
    ensure_views(spark, sf_dir)

    def timed(label, fn):
        fn()  # warm (codegen)
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        med = statistics.median(runs)
        print(f"{label:28s} median {med:.3f}s  (runs: "
              + ", ".join(f"{r:.3f}" for r in runs) + ")")
        return med

    # Phase 1: fingerprint relation (what every rung consumes).
    fp_t = timed("fp pass (checkpoint)",
                 lambda: spark.sql(sqlfast._SH_FP_SQL)
                 .localCheckpoint(eager=True))

    # A materialized fp for the rung phases (outside their timing).
    fp = spark.sql(sqlfast._SH_FP_SQL).localCheckpoint(eager=True)
    fp.createOrReplaceTempView("__probe_sh_fp")

    # Phase 2: the 4-band rung top-20 over the pre-built fp.
    def rung(n_bands):
        def run():
            (spark.sql(sqlfast._SH_RUNGS[n_bands]
                       .replace("__sqlfast_sh_fp", "__probe_sh_fp"))
             .orderBy("hamming", "doc_a", "doc_b").limit(20)
             .write.format("noop").mode("overwrite").save())
        return run

    r4_t = timed("rung 4-band top-20 (noop)", rung(4))

    # Full benched function for the cross-check.
    from risingwave_py_spark import registry
    registry.load_all()
    full_t = timed("full dedup_simhash toPandas",
                   lambda: registry.QUERIES["dedup_simhash"](spark, sf_dir)
                   .toPandas())

    print(f"\nsf={sf}  fp={fp_t:.3f}s  rung4={r4_t:.3f}s  "
          f"full={full_t:.3f}s  rung_share={r4_t / full_t:.1%}")


if __name__ == "__main__":
    main()
