"""Runnable demos mirroring the reference's two end-to-end flows
(/root/reference/demo.py:58-108 demo_simple, :111-158 demo_boll) on
the Spark engine — same observable behavior, no server, no network.

Differences from the reference, by design:
  - bounded: fixed tick counts and stop events instead of
    KeyboardInterrupt, so ``python demo.py`` finishes in ~a minute;
  - deterministic: seeded RNG and synthetic timestamps;
  - demo_boll's websocket feed is replaced with the synthetic push
    source (``sources/push.py``) — the handler → buffered-insert
    bridge is identical — and the reference's insert/insert_row kwarg
    bug (SURVEY.md §2.10) is fixed by using ``insert_row``.
"""

from __future__ import annotations

import datetime as dt
import random
import threading
import time

import pandas as pd

from risingwave_py_spark import OutputFormat, RisingWave
from risingwave_py_spark.sources.push import subscribe_ticks

SYMBOLS = ["ethusdt", "btcusdt", "adausdt", "dogeusdt", "xrpusdt"]
SCHEMA = "risingwave_py_demo"


def demo_simple(n_ticks: int = 8) -> None:
    """Synthetic ticks → raw-table subscription (persisted progress) +
    tumbling-window avg-price MV subscription with the client-side
    ≥300 alert predicate (demo.py:45-55)."""
    rw = RisingWave()
    rw.execute(f"DROP SCHEMA IF EXISTS {SCHEMA}")
    rw.execute(f"CREATE SCHEMA IF NOT EXISTS {SCHEMA}")

    rng = random.Random(1)
    base = dt.datetime(2024, 1, 1)

    def tick_df(tick: int) -> pd.DataFrame:
        n = rng.randint(1, 5)
        return pd.DataFrame(
            {
                "symbol": [rng.choice(SYMBOLS) for _ in range(n)],
                "timestamp": [base + dt.timedelta(seconds=tick) for _ in range(n)],
                "close": [round(rng.uniform(100.0, 500.0), 2) for _ in range(n)],
            }
        )

    # seed the table so both subscriptions have a relation to attach to
    rw.insert(data=tick_df(0), schema_name=SCHEMA, table_name="tick", force_flush=True)

    stop = threading.Event()
    received = {"ticks": 0, "alerts": 0}

    def on_tick_changes(rows: list) -> None:
        received["ticks"] += len(rows)
        print(f"received {len(rows)} new tick rows")

    def on_analytics_changes(batch: pd.DataFrame) -> None:
        for _, row in batch.iterrows():
            if row["op"] in ("Insert", "UpdateInsert") and row["avg_price"] >= 300:
                received["alerts"] += 1
                print(
                    f"{row['window_start']} - {row['window_end']}: "
                    f"{row['symbol']} avg price {row['avg_price']} exceeds 300"
                )

    def subscribe_tick_stream() -> None:
        rw.on_change(
            subscribe_from="tick", schema_name=SCHEMA, handler=on_tick_changes,
            output_format=OutputFormat.RAW, persist_progress=True,
            max_batch_size=5, _stop_event=stop,
        )

    def subscribe_tick_analytics() -> None:
        mv = rw.mv(
            schema_name=SCHEMA, name="tick_analytics",
            stmt="SELECT window_start, window_end, symbol, round(avg(close)) AS avg_price "
                 f"FROM tumble({SCHEMA}.tick, timestamp, interval '10 seconds') "
                 "GROUP BY window_start, window_end, symbol",
        )
        mv.on_change(
            handler=on_analytics_changes, output_format=OutputFormat.DATAFRAME,
            persist_progress=True, max_batch_size=1, _stop_event=stop,
        )

    threads = [
        threading.Thread(target=f)
        for f in (subscribe_tick_stream, subscribe_tick_analytics)
    ]
    for t in threads:
        t.start()
    while len(rw.engine.cursors) < 2:  # both cursors positioned before producing
        time.sleep(0.05)

    for tick in range(1, n_ticks):
        rw.insert(data=tick_df(tick), schema_name=SCHEMA, table_name="tick",
                  force_flush=True)
    time.sleep(1.0)  # poll idle interval is 100 ms; let consumers drain
    stop.set()
    for t in threads:
        t.join()
    print(f"demo_simple done: {received['ticks']} tick rows, "
          f"{received['alerts']} alerts")


def demo_boll(n_ticks: int = 6) -> None:
    """External push source → buffered insert_row → SELECT * MV →
    subscription printing new bars (the reference's Binance pipeline,
    offline)."""
    rw = RisingWave()
    rw.execute(f"CREATE SCHEMA IF NOT EXISTS {SCHEMA}")
    rw.execute(
        f"CREATE TABLE IF NOT EXISTS {SCHEMA}.bars "
        "(symbol STRING, timestamp FLOAT, price FLOAT)"
    )

    def on_bar(msg: dict) -> None:
        rw.insert_row(table_name="bars", schema_name=SCHEMA, force_flush=True, **msg)

    # first batch lands before the MV exists — covered by MV's initial state
    src = subscribe_ticks(on_bar, n_ticks=n_ticks // 2, seed=1).start()
    while src.running:
        time.sleep(0.05)
    rw.execute("FLUSH")
    mv = rw.mv(schema_name=SCHEMA, name="bars_mv", stmt=f"SELECT * FROM {SCHEMA}.bars")

    stop = threading.Event()
    printed = {"n": 0}

    def on_mv_change(rows: list) -> None:
        printed["n"] += len(rows)
        for r in rows:
            print(f"bar change: {r}")

    t = threading.Thread(
        target=lambda: mv.on_change(handler=on_mv_change, output_format=OutputFormat.RAW,
                                    max_batch_size=10, _stop_event=stop)
    )
    t.start()
    while not rw.engine.cursors:
        time.sleep(0.05)

    # second batch streams in while the subscription is live
    src = subscribe_ticks(on_bar, n_ticks=n_ticks - n_ticks // 2, seed=2).start()
    while src.running:
        time.sleep(0.05)
    rw.execute("FLUSH")
    time.sleep(1.0)
    stop.set()
    t.join()
    print(f"demo_boll done: {printed['n']} bar changes observed")


if __name__ == "__main__":
    demo_simple()
    demo_boll()
