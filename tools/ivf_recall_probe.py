"""Measured cost/recall curve of the trained-IVF probe vs nprobe.

Every ANN deployment tunes exactly one dial — how many inverted-list
cells a query visits (nprobe) — trading probe latency for recall.
`ann_ivf_recall` grades one point of that curve through the driver's
oracle; this probe measures the WHOLE curve at bench scale: for each
nprobe it times the stored-index probe (median of 3, warm) and
computes mean recall@K against exact brute-force cosine top-k.

nprobe = k (corpus-derived, vectors.corpus_kmeans_k) visits every
cell, so its recall row must read 1.0
— a built-in self-check that the probe, the codebook, and the ground
truth agree. Results land in SCALE.md.

Usage: python tools/ivf_recall_probe.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from risingwave_py_spark import registry
    from risingwave_py_spark.catalog import ensure_views
    from risingwave_py_spark.functions import vectors as V
    from risingwave_py_spark.session import build_session

    registry.load_all()
    spark = build_session("ivf-recall-probe")
    ensure_views(spark, args.sf)

    # ground truth: exact brute-force cosine top-k per query (the
    # registered ann_cosine_topk query IS the brute-force baseline)
    truth_df = registry.QUERIES["ann_cosine_topk"](spark, args.sf)
    truth: dict[int, set[int]] = {}
    for r in truth_df.collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    V._ensure_ivf_index(spark, args.sf)  # build once, untimed

    k_eff = V.corpus_kmeans_k(spark, args.sf)
    sweep = sorted({1, 2, 4, max(8, k_eff // 4), k_eff})
    rows = []
    for np_ in sweep:
        df = V._ivf_probe_topk(spark, args.sf, n_probe=np_)
        got = [(r["query_id"], r["vec_id"]) for r in df.collect()]  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            V._ivf_probe_topk(spark, args.sf, n_probe=np_).collect()
            ts.append(time.time() - t0)
        by_q: dict[int, set[int]] = {}
        for qid, vid in got:
            by_q.setdefault(qid, set()).add(vid)
        recalls = [
            len(by_q.get(qid, set()) & hits) / len(hits)
            for qid, hits in sorted(truth.items())
        ]
        mean_recall = sum(recalls) / len(recalls)
        rows.append((np_, sorted(ts)[1], mean_recall, min(recalls)))
        print(
            f"nprobe={np_}  probe {sorted(ts)[1]:.3f}s  "
            f"mean recall@{V.TOP_K} {mean_recall:.3f}  min {min(recalls):.3f}",
            flush=True,
        )

    assert abs(rows[-1][2] - 1.0) < 1e-9, (
        "nprobe=K must be exhaustive (recall 1.0) — probe/ground-truth "
        f"disagree: {rows[-1]}"
    )
    print(f"\n| nprobe | probe s (median of 3) | mean recall@{V.TOP_K} | min |")
    print("|---|---|---|---|")
    for np_, t, mr, mn in rows:
        print(f"| {np_} | {t:.3f} | {mr:.3f} | {mn:.3f} |")


if __name__ == "__main__":
    main()
