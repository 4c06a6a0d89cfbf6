"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
{"metric": ..., "value": total_sec, "unit": "sec",
 "queries": {name: sec}, "sf": ...}.

Methodology (disclosed in the JSON as mode=steady_state_median3): after the
session warm-up, each query runs once UNTIMED — paying Janino codegen
compilation, JIT warm-up, and file-listing population — then once
timed 3x with the MEDIAN reported (same protocol for the DuckDB
comparison run — the first post-warm run still carries JIT-deopt/GC
noise). Spark caches no results between runs (no .cache/.persist
anywhere; every timed run re-reads parquet and re-executes); what the
warm run amortizes is exactly the per-query compile cost that is
invariant in data size, so the timed number is the per-query latency
a warmed cluster shows at any scale. Timing includes plan + execute +
Arrow materialization (the driver-visible latency).

Layout: catalog.table serves scans from an ingest-time split layout
(.tablecache/, built once per sf outside any timed region): the
driver's testdata is ONE parquet row group per table — a row group is
Spark's minimum split, so without the re-layout every scan is one
task regardless of cores (DuckDB parallelizes inside a row group;
Spark cannot). Values and schema are identical; only file count
changes. This is the Spark equivalent of DuckDB's intra-row-group
parallelism, not a result cache — every timed run still reads parquet
from disk.

The JSON also reports a same-process DuckDB run of the identical
oracle SQL (duckdb_same_session_sec / vs_duckdb_ratio): absolute wall
times on this host drift ~40% with ambient load (BASELINE.md), so the
gate ratio is only meaningful engine-vs-engine at the same moment.

A/B protocol (mode=bracketed_ab_median3, round 6): the DuckDB pass
runs TWICE — once before the Spark session exists and once after the
JVM stops — bracketing the Spark window in time, so a one-sided host
draft shows up as pass1/pass2 disagreement (duckdb_drift) instead of
silently moving the ratio. Per-query DuckDB time is the mean of the
two passes' medians. True per-query interleaving is deliberately NOT
used: the idle Spark JVM (~100 GiB heap, 32 task threads) measurably
perturbs DuckDB (a 0.3 s oracle measured 5.1 s next to the live JVM),
so each engine must have the machine to itself. dispatch_floor_sec is
the measured SELECT-1 round-trip through the same toPandas
materialization path — the fixed per-query cost that dominates
sub-0.3 s queries at sf0.1 (BASELINE.md decomposition).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family that matters at scale.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q3_bucketed",
    # *_bucketed: identical query + oracle, fact tables served from the
    # CREATE TABLE … WITH (bucket_by, buckets) layout — benched next to
    # the plain-parquet twin so the same session measures the layout
    # delta (the one-time bucketed ingest happens in warmup, untimed).
    "q5_local_supplier_volume",
    "q5_bucketed",
    "q10_returned_items",
    "q10_bucketed",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q7_bucketed",
    "q9_profit_by_nation",
    "q9_bucketed",
    "q18_large_volume_customer",
    "q18_bucketed",
    "q19_disc_revenue_or",
    "agg_distinct_multi",
    "agg_rollup",
    "window_topk_per_group",
    "window_running_sum",
    "tumble_events_15m",
    "hop_events_30m_15m",
    "sessionize_events",
    "asof_join_last_click",
    "events_json_extract",
    # M6 extension operators (registered later rounds):
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_span_exact",
    "text_quality_scores",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "agg_salted_skew",
    # round 9: audio decode+fingerprint clustering (one mapInPandas
    # stage + hash group-by chain vs DuckDB's closed-form signal SQL)
    "multimodal_audio_dedup",
]


def duck_pass(sf_dir: str, names: list[str]) -> dict[str, float]:
    """One full DuckDB pass over the oracle SQL of ``names`` — 2 warm
    runs + median of 3 timed, same materialization contract (.df())
    as the Spark side's toPandas."""
    import duckdb

    from risingwave_py_spark.registry import ORACLES

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written multi-file table dirs
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out: dict[str, float] = {}
    for name in names:
        sql = ORACLES.get(name)
        if sql is None:
            continue
        try:
            con.execute(sql).fetchall(); con.execute(sql).fetchall()
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).df()
                runs.append(time.perf_counter() - t0)
            out[name] = round(sorted(runs)[1], 3)
        except Exception as exc:  # noqa: BLE001
            print(f"duckdb {name} FAILED: {exc}", file=sys.stderr)
    con.close()
    return out


def subscription_latency(spark, n_events: int = 60) -> dict:
    """End-to-end change-visibility latency: wall time from the
    client's insert(force_flush=True) call to the first on_change
    delivery of that row, measured per event over a raw-table
    subscription and an aggregation-MV subscription (the reference's
    implied bound is sub-second: per-insert FLUSH + 100 ms cursor poll,
    reference core.py:20,121,541-560). The consumer runs the real
    on_change loop in a thread (RAW format, default poll interval);
    the producer stamps t0 before insert and the handler stamps
    arrival, so the number includes flush, changelog publication, MV
    refresh (for the MV case), cursor fetch, and handler dispatch."""
    import statistics
    import threading

    from risingwave_py_spark.core import OutputFormat, RisingWaveConnection
    from risingwave_py_spark.engine import SparkEngine

    spark.sql("DROP DATABASE IF EXISTS benchlat CASCADE")
    conn = RisingWaveConnection(SparkEngine(spark, default_schema="benchlat"))
    out: dict[str, dict] = {}
    warmup = 5
    # Each phase gets its OWN base table so all three start from the
    # same state (empty table, empty changelog): a shared table makes
    # later phases pay the earlier phases' accumulated changelog
    # partitions in every SHOW PARTITIONS — an ordering artifact, not
    # a property of the measured shape.
    for base, target, label, key_of, mv_stmt in (
        # raw rows arrive as (k, v, op, rw_timestamp)
        ("ev_raw", "ev_raw", "raw_table", lambda row: int(row[0]), None),
        # the MV's global aggregate arrives as (n, s, op, rw_timestamp);
        # event k is the (k+1)-th row inserted into this phase's table,
        # so the (Update)Insert with n rows marks delivery of the n-th
        # insert (phase-local index n-1)
        ("ev_agg", "evagg", "agg_mv",
         lambda row: (int(row[0]) - 1
                      if row[-2] in ("Insert", "UpdateInsert") else None),
         "CREATE MATERIALIZED VIEW benchlat.evagg AS "
         "SELECT count(*) AS n, sum(v) AS s FROM benchlat.ev_agg"),
        # the avg regime (VERDICT r9 #1/#6): round(avg())+WHERE is the
        # reference demo's MV shape — direct-path via the sum/count
        # companion decomposition since round 10; measured separately
        # so the artifact shows both agg regimes
        ("ev_avg", "evavg", "avg_mv",
         lambda row: (int(row[0]) - 1
                      if row[-2] in ("Insert", "UpdateInsert") else None),
         "CREATE MATERIALIZED VIEW benchlat.evavg AS "
         "SELECT count(*) AS n, round(avg(v), 2) AS a "
         "FROM benchlat.ev_avg WHERE v >= 0"),
    ):
        conn.execute(f"CREATE TABLE benchlat.{base} (k BIGINT, v DOUBLE)")
        if mv_stmt is not None:
            conn.execute(mv_stmt)
        ds0 = dict(conn.engine.direct_stats)
        arrivals: dict[int, float] = {}
        stop = threading.Event()

        def handler(rows, _k=key_of, _a=arrivals):
            now = time.perf_counter()
            for row in rows:
                k = _k(row)
                if k is not None:
                    _a.setdefault(k, now)

        th = threading.Thread(
            target=conn.on_change,
            kwargs=dict(subscribe_from=target, schema_name="benchlat",
                        handler=handler, output_format=OutputFormat.RAW,
                        max_batch_size=10, _stop_event=stop),
            daemon=True,
        )
        th.start()
        while not conn.engine.cursors:  # cursor positioned before producing
            time.sleep(0.01)
        lats: list[float] = []
        acks: list[float] = []
        for i in range(warmup + n_events):
            t0 = time.perf_counter()
            conn.insert_row(base, schema_name="benchlat", force_flush=True,
                            k=i, v=float(i))
            t_ack = time.perf_counter()
            deadline = t0 + 60
            while i not in arrivals and time.perf_counter() < deadline:
                time.sleep(0.001)
            if i in arrivals and i >= warmup:
                lats.append((arrivals[i] - t0) * 1000)
                acks.append((t_ack - t0) * 1000)
        stop.set()
        th.join(timeout=30)
        conn.engine.cursors.clear()
        if lats:
            srt = sorted(lats)
            out[label] = {
                "median_ms": round(statistics.median(lats), 1),
                "p99_ms": round(srt[min(len(srt) - 1,
                                        int(0.99 * len(srt)))], 1),
                # producer-side insert+FLUSH cost (synchronous Spark
                # write jobs) — total minus this is the consumer-side
                # poll + cursor-fetch delivery gap
                "insert_flush_median_ms": round(statistics.median(acks), 1),
                "max_ms": round(srt[-1], 1),
                "n": len(lats),
                # direct-path event deltas for THIS phase (r10 verdict
                # #5: attribute p99 tails to fallback/re-arm/companion-
                # rebuild events vs host noise — a tail with zero
                # events here is GC/host, not the engine's plan)
                "direct_events": {
                    k: conn.engine.direct_stats[k] - ds0[k]
                    for k in ds0
                },
            }
    spark.sql("DROP DATABASE IF EXISTS benchlat CASCADE")
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from risingwave_py_spark import registry
    from risingwave_py_spark.session import build_session

    registry.load_all()
    # DuckDB pass 1: BEFORE any JVM exists (the bracket's left side).
    try:
        duck1 = duck_pass(sf_dir, BENCH_QUERIES)
    except Exception as exc:  # noqa: BLE001
        print(f"duckdb pass1 unavailable: {exc}", file=sys.stderr)
        duck1 = {}
    # Size shuffle partitions to the data scale (SCALE.md rule: right-
    # size partitions for the SF; AQE stays on and coalesces further).
    # sf0.1 → 8 partitions (~75k lineitem rows each); caps at 200 for
    # cluster-scale SFs.
    parts = max(8, min(200, int(64 * sf))) if sf > 0 else 32
    # AQE off for the benched SF: its per-stage materialization adds a
    # driver round-trip per shuffle, and with single-digit-MB shuffles
    # there is nothing for runtime re-planning to win back (no skew, no
    # mis-estimated joins) — measured 10-30% of sub-second query time.
    # The engine session default keeps AQE ON (session.py): at cluster
    # scale stage re-planning and skew-join splitting pay for
    # themselves; this is per-workload tuning, not a global stance.
    spark = build_session(
        "bench",
        shuffle_partitions=parts,
        extra_conf={"spark.sql.adaptive.enabled": "false"} if sf <= 1 else None,
    )
    # Warm the JVM once so the first timed query doesn't pay session
    # bring-up: JIT the vectorized parquet reader + codegen paths with
    # one untimed scan-aggregate per benched table. A bare count()
    # would be answered from parquet footers (aggregate pushdown), so
    # hash every column instead — that forces real column decode.
    # (No results are cached — Spark recomputes every timed query
    # from the files.)
    from pyspark.sql import functions as _F

    spark.range(1).count()
    from risingwave_py_spark.catalog import table as _t

    for name in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        try:
            df = _t(spark, sf_dir, name)
            # max, not sum: summing 64-bit hashes overflows under ANSI
            # mode (and the error spam would pollute the bench artifact).
            df.agg(_F.max(_F.xxhash64(*df.columns))).collect()
        except Exception:  # noqa: BLE001 — missing table: skip warmup for it
            pass
    # JIT the decimal-sum codegen path the TPC-H money math uses.
    _t(spark, sf_dir, "lineitem").agg(
        _F.sum(_F.col("l_extendedprice").cast("decimal(12,2)"))
    ).collect()

    # Two-phase protocol. Phase 1: TWO untimed passes over the whole
    # set — the first compiles each query's codegen, the second lets
    # the JVM's SHARED infrastructure (shuffle writers, parquet reader,
    # Arrow serializer, window exec) reach steady JIT tier; per-query
    # warm runs alone leave the first-alphabet queries measured on a
    # half-warm JVM (~1.2 s across the set, measured). Phase 2: per
    # query, median of 3 timed runs. Nothing is cached — every run
    # re-reads parquet and re-executes (same protocol for DuckDB).
    runnable: list[str] = []
    for _pass in range(2):
        for name in BENCH_QUERIES:
            fn = registry.QUERIES.get(name)
            if fn is None:
                continue
            try:
                fn(spark, sf_dir).toPandas()
                if _pass == 0:
                    runnable.append(name)
            except Exception as exc:  # noqa: BLE001
                print(f"bench {name} FAILED (warmup): {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    total = 0.0
    for name in runnable:
        fn = registry.QUERIES[name]
        # §1.5: label the timed jobs so the UI/event log attributes
        # stages to queries (set outside the timed region).
        spark.sparkContext.setJobDescription(f"bench {name}")
        runs = []
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                # Materialize through Arrow — the SDK's interchange
                # format (OutputFormat.DATAFRAME); row-at-a-time
                # collect() would bill Python deserialization.
                n = len(fn(spark, sf_dir).toPandas())
                runs.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            print(f"bench {name} FAILED: {exc}", file=sys.stderr)
            continue
        el = round(sorted(runs)[1], 3)
        spark.sparkContext.setJobDescription(None)
        timings[name] = el
        total += el
        print(f"bench {name}: {el:.2f}s ({n} rows)", file=sys.stderr)

    spark.sparkContext.setJobDescription(None)  # clear failure-path label
    # Dispatch floor: the SELECT-1 round-trip through the identical
    # toPandas materialization path — the fixed per-query cost every
    # benched number includes (warm x3, median of 5).
    for _ in range(3):
        spark.sql("SELECT 1").toPandas()
    floor_runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        spark.sql("SELECT 1").toPandas()
        floor_runs.append(time.perf_counter() - t0)
    dispatch_floor = round(sorted(floor_runs)[2], 3)

    # Change-visibility latency (insert → flush → first on_change
    # delivery) — the reference's implied bound is sub-second
    # (per-insert FLUSH + 100 ms poll); BASELINE.md records the pair.
    try:
        sub_lat = subscription_latency(spark)
    except Exception as exc:  # noqa: BLE001
        print(f"subscription latency probe FAILED: {exc}", file=sys.stderr)
        sub_lat = {}

    # DuckDB pass 2: AFTER the JVM stops (the bracket's right side).
    # The JVM must be gone first: its ~100 GiB heap + 32 idle task
    # threads perturb the DuckDB side (observed: a 0.3 s oracle
    # measured 5.1 s next to the live JVM) — each engine gets the
    # machine to itself, same as the Spark side had.
    spark.stop()
    try:
        duck2 = duck_pass(sf_dir, [n for n in BENCH_QUERIES if n in timings])
    except Exception as exc:  # noqa: BLE001
        print(f"duckdb pass2 unavailable: {exc}", file=sys.stderr)
        duck2 = {}

    # Per-query DuckDB time = mean of the two bracketing passes'
    # medians; pass disagreement (duckdb_drift) exposes host draft.
    # Pass totals and drift are computed over the INTERSECTION of
    # queries present in both passes — a query failing in one pass
    # must not masquerade as host draft — and an empty pass reports
    # no total rather than a measured-looking 0.0.
    duck_timings: dict[str, float] = {}
    for name in timings:
        vals = [d[name] for d in (duck1, duck2) if name in d]
        if vals:
            duck_timings[name] = round(sum(vals) / len(vals), 3)
    duck_total = round(sum(duck_timings.values()), 3) if duck_timings else None
    both = [n for n in timings if n in duck1 and n in duck2]
    d1_total = round(sum(duck1[n] for n in both), 3) if both else None
    d2_total = round(sum(duck2[n] for n in both), 3) if both else None

    out = {
        "metric": "headline_query_wall_time",
        "value": round(total, 3),
        "unit": "sec",
        "mode": "bracketed_ab_median3",
        "queries": timings,
        "sf": sf,
        "dispatch_floor_sec": dispatch_floor,
    }
    if sub_lat:
        out["subscription_latency_ms"] = sub_lat
    if duck_total:
        out["duckdb_same_session_sec"] = duck_total
        out["duckdb_queries"] = duck_timings
        if d1_total is not None:
            out["duckdb_pass1_sec"] = d1_total
        if d2_total is not None:
            out["duckdb_pass2_sec"] = d2_total
        if d1_total and d2_total:
            out["duckdb_drift"] = round(d2_total / d1_total, 3)
        out["vs_duckdb_ratio"] = round(total / duck_total, 2)
    line = json.dumps(out)
    # Persist the full line locally too: the driver's capture window
    # truncates long lines, and round-over-round diffs must be
    # computable from repo artifacts alone.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        rnd = os.environ.get("SPARK_GRAFT_ROUND", "")
        if not rnd:
            # infer: this bench run belongs to the round AFTER the
            # last driver-recorded one
            done = [
                int(m.group(1)) for f in os.listdir(here)
                if (m := re.match(r"BENCH_r(\d+)\.json$", f))
            ]
            rnd = f"{(max(done) + 1) if done else 1:02d}"
        # APPEND, never overwrite: every local sample stays
        # reconstructible (COVERAGE round-10 rule) — one JSON line per
        # run, newest last.
        with open(os.path.join(here, f"BENCH_LOCAL_r{rnd}.json"), "a") as fh:
            fh.write(line + "\n")
    except OSError:
        pass
    print(line)


if __name__ == "__main__":
    main()
