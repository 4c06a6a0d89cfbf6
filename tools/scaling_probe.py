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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-scale", type=int, default=8)
    args = ap.parse_args()

    from risingwave_py_spark import registry
    from risingwave_py_spark.session import build_session

    registry.load_all()
    spark = build_session("scaling-probe")
    scales = [1]
    while scales[-1] * 2 <= args.max_scale:
        scales.append(scales[-1] * 2)

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
