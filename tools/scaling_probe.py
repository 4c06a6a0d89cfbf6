"""Empirical scaling probe: run the heavyweight corpus operators at
1x/2x/4x/8x the sf0.1 documents table and report wall times.

Scaled corpora are derived from the driver's fixture (never replaces
it): copy c re-keys doc_id by +c*N and suffixes every token with _c,
so copies are mutually independent documents (no artificial dup
clusters) — the probe measures DATA scaling, not duplicate blowup.

Usage: python tools/scaling_probe.py [--max-scale 8]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
OPS = [
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_span_exact",
    "text_unigram_logprob",
    "heavy_hitter_bigrams",
    "text_char_entropy",
    # persisted-index pair (round 5): the warm pass builds the stored
    # signature table for the scaled corpus; the timed passes measure
    # the PROBE serving from it — the recompute-per-run twin
    # (dedup_cross_corpus) shows what the stored index saves.
    "dedup_cross_corpus",
    "dedup_index_probe",
    # audio near-dup (round 9): clips synthesize deterministically from
    # doc_id, so the re-keyed scaled corpus grows the clip count k-fold;
    # decode+fingerprint is one Arrow mapInPandas stage (O(n)) and
    # clustering a hash group-by chain — this row is the evidence.
    "multimodal_audio_dedup",
]


def build_scaled(spark, k: int, out_dir: str) -> int:
    from pyspark.sql import functions as F

    from risingwave_py_spark.catalog import table

    d = table(spark, BASE, "documents")
    n = d.count()
    parts = []
    for c in range(k):
        parts.append(
            d.select(
                (F.col("doc_id") + c * n).alias("doc_id"),
                F.expr(
                    f"array_join(transform(split(text, '\\\\s+'), w -> concat(w, '_{c}')), ' ')"
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionAll(p)
    shutil.rmtree(out_dir, ignore_errors=True)
    df.repartition(max(8, 4 * k)).write.parquet(os.path.join(out_dir, "documents.parquet"))
    # the other fixture tables pass through unscaled (ensure_views
    # registers all of them)
    for t in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        os.symlink(os.path.join(BASE, f"{t}.parquet"),
                   os.path.join(out_dir, f"{t}.parquet"))
    return n * k


# Perf-weak set from the round-5 verdict: correct plans, but their
# sf0.1 numbers sit on the dispatch floor — this suite measures how
# the engine/DuckDB ratio TRENDS as facts grow (dims stay fixed, the
# 100 TB shape), which is the evidence the floor argument needs.
TPCH_OPS = [
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q9_profit_by_nation",
    "q10_returned_items",
    "q18_large_volume_customer",
    "ann_ivf_topk",
]
TPCH_SCALED = ("lineitem", "orders", "embeddings")


def build_scaled_tpch(spark, k: int, out_dir: str) -> None:
    """Scale the FACT tables k-fold (dims untouched): lineitem/orders
    copies re-key orderkey by +c*(max+1) — independent new orders over
    the same customer/supplier/part dims, so join fan-in grows the way
    a 100 TB fact table grows; embeddings copies re-key vec_id past
    the query/centroid id ranges, growing every IVF cell k-fold."""
    from pyspark.sql import functions as F

    from risingwave_py_spark.catalog import table

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    orders = table(spark, BASE, "orders")
    off = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    for name, keycol, offset in (
        ("lineitem", "l_orderkey", off),
        ("orders", "o_orderkey", off),
        ("embeddings", "vec_id", None),
    ):
        d = table(spark, BASE, name)
        if offset is None:
            offset = d.count()
        parts = [
            d.withColumn(keycol, F.col(keycol) + c * offset) for c in range(k)
        ]
        df = parts[0]
        for pp in parts[1:]:
            df = df.unionAll(pp)
        df.repartition(max(8, 4 * k)).write.parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for t in ("region nation customer supplier part events documents").split():
        os.symlink(os.path.join(BASE, f"{t}.parquet"),
                   os.path.join(out_dir, f"{t}.parquet"))


def duck_time(sf_dir: str, names: list[str]) -> dict[str, float]:
    """Median-of-3 DuckDB timings of the oracle SQL over the same
    (scaled) parquet — bench.py's pass helper, one protocol for the
    gate bench and this probe (incl. Spark-written table dirs)."""
    from bench import duck_pass

    return duck_pass(sf_dir, names)


def run_tpch_suite(spark, scales: list[int]) -> None:
    from risingwave_py_spark import registry

    eng: dict[str, dict[int, float]] = {op: {} for op in TPCH_OPS}
    duck: dict[str, dict[int, float]] = {op: {} for op in TPCH_OPS}
    for k in scales:
        out = f"/tmp/rw_scale_tpch_{k}"
        build_scaled_tpch(spark, k, out)
        os.environ["SPARK_GRAFT_SPLIT_CACHE"] = "0"
        for op in TPCH_OPS:
            fn = registry.QUERIES[op]
            fn(spark, out).collect()  # warm
            ts = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, out).collect()
                ts.append(time.time() - t0)
            eng[op][k] = sorted(ts)[1]
            print(f"scale {k}x  {op:28s} engine {eng[op][k]:.2f}s", flush=True)
        for op, v in duck_time(out, TPCH_OPS).items():
            duck[op][k] = v
            print(f"scale {k}x  {op:28s} duckdb {v:.2f}s", flush=True)

    print("\n| query | " + " | ".join(
        f"{k}× eng / duck (ratio)" for k in scales) + " |")
    print("|---|" + "---|" * len(scales))
    for op in TPCH_OPS:
        cells = " | ".join(
            f"{eng[op][k]:.2f}s / {duck[op][k]:.2f}s "
            f"({eng[op][k] / duck[op][k]:.1f}×)"
            for k in scales
        )
        print(f"| {op} | {cells} |")


BUCKETED_PAIRS = [
    ("q3_shipping_priority", "q3_bucketed"),
    ("q5_local_supplier_volume", "q5_bucketed"),
    ("q7_volume_shipping", "q7_bucketed"),
    ("q9_profit_by_nation", "q9_bucketed"),
    ("q10_returned_items", "q10_bucketed"),
    ("q18_large_volume_customer", "q18_bucketed"),
]


def run_bucketed_suite(spark, scales: list[int], rounds: int = 5) -> None:
    """Plain-parquet vs bucketed-layout twins, interleaved within one
    session at each fact scale (dims fixed). The bucketed copies build
    once per scaled dir through the engine DDL (the `<q>_bucketed`
    queries' own ensure step, exercised by the first warm call); the
    timed rounds alternate plain/bucketed so host drift drafts both
    equally. This is the scaling half of the SCALE.md round-8 table:
    the exchange the layout removes GROWS with the fact tables, so the
    delta should widen with k."""
    import statistics

    from risingwave_py_spark import registry

    res: dict[tuple[str, int], tuple[float, float]] = {}
    for k in scales:
        out = BASE if k == 1 else f"/tmp/rw_scale_tpch_{k}"
        if k != 1 and not os.path.isdir(out):
            build_scaled_tpch(spark, k, out)
        # scaled dirs are already multi-file; BASE keeps the bench's
        # split-cache layout so the 1x plain numbers match the bench
        os.environ["SPARK_GRAFT_SPLIT_CACHE"] = "1" if k == 1 else "0"
        for plain, bk in BUCKETED_PAIRS:
            fp, fb = registry.QUERIES[plain], registry.QUERIES[bk]
            fp(spark, out).collect()  # warm plain
            fb(spark, out).collect()  # warm + one-time bucketed build
            tp: list[float] = []
            tb: list[float] = []
            for _ in range(rounds):
                t0 = time.time(); fp(spark, out).collect()
                tp.append(time.time() - t0)
                t0 = time.time(); fb(spark, out).collect()
                tb.append(time.time() - t0)
            mp, mb = statistics.median(tp), statistics.median(tb)
            res[(plain, k)] = (mp, mb)
            print(f"scale {k}x  {plain:28s} plain {mp:.2f}s  "
                  f"bucketed {mb:.2f}s  ({(mb - mp) / mp * 100:+.0f}%)",
                  flush=True)

    print("\n| query | " + " | ".join(
        f"{k}× plain / bucketed (delta)" for k in scales) + " |")
    print("|---|" + "---|" * len(scales))
    for plain, _bk in BUCKETED_PAIRS:
        cells = " | ".join(
            f"{res[(plain, k)][0]:.2f}s / {res[(plain, k)][1]:.2f}s "
            f"({(res[(plain, k)][1] / res[(plain, k)][0] - 1) * 100:+.0f}%)"
            for k in scales
        )
        print(f"| {plain} | {cells} |")


def run_hint_ab(spark, targets: list[str], rounds: int = 7) -> None:
    """Interleaved A/B of a query's registered SQL (with join hints) vs
    the same SQL with SHUFFLE_HASH stripped — the protocol that pinned
    q18's −26% in round 6: both variants alternate within ONE session
    so host drift drafts them equally; medians decide. Run at 1× and at
    the 8× scaled facts (the regime where Spark's static planner would
    broadcast the orders fact)."""
    import re
    import statistics

    from risingwave_py_spark.catalog import ensure_views
    from risingwave_py_spark.operators.sqlfast import SQL_TEXT

    dirs = {1: BASE}
    out8 = "/tmp/rw_scale_tpch_8"
    if not os.path.isdir(out8):
        build_scaled_tpch(spark, 8, out8)
    dirs[8] = out8
    os.environ["SPARK_GRAFT_SPLIT_CACHE"] = "0"
    for k, d in dirs.items():
        ensure_views(spark, d)
        for name in targets:
            sql_hint = SQL_TEXT[name]
            sql_nohint = re.sub(r",?\s*SHUFFLE_HASH\(\w+\)", "", sql_hint)
            assert sql_nohint != sql_hint, f"{name} has no SHUFFLE_HASH hint"
            variants = {"hint": sql_hint, "nohint": sql_nohint}
            for s in variants.values():  # warm both plans
                spark.sql(s).collect()
            times: dict[str, list[float]] = {v: [] for v in variants}
            for _ in range(rounds):
                for label, s in variants.items():
                    t0 = time.time()
                    spark.sql(s).collect()
                    times[label].append(time.time() - t0)
            med = {v: statistics.median(ts) for v, ts in times.items()}
            delta = (med["hint"] - med["nohint"]) / med["nohint"] * 100
            print(
                f"scale {k}x  {name:26s} hint {med['hint']:.3f}s  "
                f"nohint {med['nohint']:.3f}s  ({delta:+.0f}% with hint)",
                flush=True,
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-scale", type=int, default=8)
    ap.add_argument("--suite", choices=["docs", "tpch", "hintab", "bucketed"],
                    default="docs")
    ap.add_argument("--targets", nargs="*",
                    default=["q10_returned_items"])
    args = ap.parse_args()

    from risingwave_py_spark import registry
    from risingwave_py_spark.session import build_session

    registry.load_all()
    spark = build_session("scaling-probe")
    scales = [1]
    while scales[-1] * 2 <= args.max_scale:
        scales.append(scales[-1] * 2)

    if args.suite == "tpch":
        run_tpch_suite(spark, scales)
        return
    if args.suite == "hintab":
        run_hint_ab(spark, args.targets)
        return
    if args.suite == "bucketed":
        run_bucketed_suite(spark, scales)
        return

    results: dict[str, dict[int, float]] = {op: {} for op in OPS}
    for k in scales:
        out = f"/tmp/rw_scale_{k}"
        n_docs = build_scaled(spark, k, out)
        os.environ["SPARK_GRAFT_SPLIT_CACHE"] = "0"  # read scaled dirs directly
        for op in OPS:
            fn = registry.QUERIES[op]
            fn(spark, out).collect()  # warm (codegen/listing)
            ts = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, out).collect()
                ts.append(time.time() - t0)
            results[op][k] = sorted(ts)[1]
            print(f"scale {k}x ({n_docs} docs)  {op:24s} {results[op][k]:.2f}s",
                  flush=True)

    print("\n| operator | " + " | ".join(f"{k}×" for k in scales) +
          " | 8×/1× ratio |")
    print("|---|" + "---|" * (len(scales) + 1))
    for op in OPS:
        row = results[op]
        ratio = row[scales[-1]] / row[scales[0]]
        cells = " | ".join(f"{row[k]:.2f}s" for k in scales)
        print(f"| {op} | {cells} | {ratio:.1f}× |")


if __name__ == "__main__":
    main()
