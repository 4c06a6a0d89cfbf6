"""Sustained ingest → IVM → delivery THROUGHPUT probe.

bench.py's subscription_latency measures ONE row's visibility;
this probe measures sustained rows/sec through the same full loop —
insert + FLUSH (refreshing an attached incremental agg MV) with a
subscription consumer draining the raw changelog concurrently — at
three batch regimes:

- 256-row batches through the buffered CLIENT path (insert_row):
  lands via the direct row-group fast path, zero Spark jobs per
  batch, the MV refreshed by the driver-side merge.
- 10k / 100k-row batches through the Spark insert path
  (conn.insert of a pandas frame + FLUSH): the incremental MV fast
  path carries the refresh; this is the regime a real feed (CDC
  micro-batches, file drops) runs in.

Two numbers per regime:
- producer rows/sec: rows / wall time of the insert+FLUSH loop
  (includes MV refresh — read-your-writes acks AFTER refresh), and
- end-to-end rows/sec: rows / (last subscription delivery − first
  insert), i.e. throughput at which a downstream consumer actually
  sees the data.

A no-MV control isolates what the IVM refresh costs per regime.

Usage: python tools/throughput_probe.py [--batches 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_regime(
    spark, label: str, batch_rows: int, n_batches: int,
    client_path: bool, with_mv: bool,
) -> dict:
    import pandas as pd

    from risingwave_py_spark.core import OutputFormat, RisingWaveConnection
    from risingwave_py_spark.engine import SparkEngine

    from risingwave_py_spark.core import InsertContext

    schema = "thrp"
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    conn = RisingWaveConnection(SparkEngine(spark, default_schema=schema))
    conn.execute(f"CREATE TABLE {schema}.fact (k BIGINT, g BIGINT, v DOUBLE)")
    if client_path:
        # the reference's default buf_size=5 flushes every 5 rows; a
        # throughput producer sizes the buffer to its batch (the SDK
        # exposes buf_size for exactly this)
        conn._insert_ctx[f"{schema}.fact"] = InsertContext(
            conn.engine, "fact", schema, buf_size=batch_rows
        )
    if with_mv:
        conn.execute(
            f"CREATE MATERIALIZED VIEW {schema}.agg AS "
            f"SELECT g, count(*) AS n, sum(v) AS s FROM {schema}.fact GROUP BY g"
        )

    total = batch_rows * n_batches
    delivered = {"n": 0, "t_last": None}
    stop = threading.Event()

    def handler(rows, _d=delivered):
        _d["n"] += len(rows)
        _d["t_last"] = time.perf_counter()

    th = threading.Thread(
        target=conn.on_change,
        kwargs=dict(subscribe_from="fact", schema_name=schema,
                    handler=handler, output_format=OutputFormat.RAW,
                    max_batch_size=max(batch_rows, 4096),
                    _stop_event=stop),
        daemon=True,
    )
    th.start()
    while not conn.engine.cursors:
        time.sleep(0.01)

    t0 = time.perf_counter()
    next_k = 0
    for b in range(n_batches):
        if client_path:
            # buffer fills at batch_rows -> ONE direct-ingest flush
            # (+ FLUSH barrier) per batch, like the reference's
            # bulk_insert at a production buffer size
            for i in range(batch_rows):
                conn.insert_row("fact", schema_name=schema,
                                k=next_k + i, g=(next_k + i) % 100,
                                v=float(i))
        else:
            pdf = pd.DataFrame({
                "k": range(next_k, next_k + batch_rows),
                "g": [x % 100 for x in range(next_k, next_k + batch_rows)],
                "v": [float(x % 50) for x in range(batch_rows)],
            })
            conn.insert(pdf, "fact", schema_name=schema, force_flush=True)
        next_k += batch_rows
    t_prod = time.perf_counter()

    deadline = t_prod + 120
    while delivered["n"] < total and time.perf_counter() < deadline:
        time.sleep(0.005)
    stop.set()
    th.join(timeout=30)
    conn.engine.cursors.clear()

    assert delivered["n"] >= total, (
        f"{label}: consumer saw {delivered['n']}/{total} rows"
    )
    prod_s = t_prod - t0
    # the consumer can drain the final epoch inside the producer's
    # last FLUSH window, so clamp: end-to-end is never faster than
    # the producer loop itself
    e2e_s = max(delivered["t_last"] or t_prod, t_prod) - t0
    res = {
        "label": label, "batch_rows": batch_rows, "batches": n_batches,
        "rows": total,
        "producer_rows_per_s": round(total / prod_s),
        "e2e_rows_per_s": round(total / e2e_s),
        "producer_s": round(prod_s, 2), "e2e_s": round(e2e_s, 2),
    }
    print(
        f"{label:34s} {total:8d} rows  producer {res['producer_rows_per_s']:>8,}/s"
        f"  end-to-end {res['e2e_rows_per_s']:>8,}/s", flush=True,
    )
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=10)
    args = ap.parse_args()

    from risingwave_py_spark.session import build_session

    spark = build_session("throughput-probe")
    rows = []
    # warm the engine paths once, untimed
    run_regime(spark, "warmup", 256, 2, True, True)
    for label, batch, client, mv in (
        ("client 256/batch direct, agg MV", 256, True, True),
        ("client 256/batch direct, no MV", 256, True, False),
        ("spark 10k/batch, agg MV", 10_000, False, True),
        ("spark 10k/batch, no MV", 10_000, False, False),
        ("spark 100k/batch, agg MV", 100_000, False, True),
        ("spark 100k/batch, no MV", 100_000, False, False),
    ):
        rows.append(run_regime(spark, label, batch, args.batches, client, mv))

    print("\n| regime | rows | producer rows/s | end-to-end rows/s |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['label']} | {r['rows']:,} "
              f"| {r['producer_rows_per_s']:,} | {r['e2e_rows_per_s']:,} |")


if __name__ == "__main__":
    main()
