"""Push-source bridge (sources/push.py): feed → handler → insert_row →
fetch, the reference's demo ingestion pattern end to end
(demo.py:133-144 shape, with the insert/insert_row bug fixed per
SURVEY §2.10)."""

from __future__ import annotations

import time

from risingwave_py_spark.sources.push import PushSource, subscribe_bars, subscribe_ticks


def _drain(src: PushSource, timeout_s: float = 30.0) -> None:
    src.start()
    t0 = time.time()
    while src.running and time.time() - t0 < timeout_s:
        time.sleep(0.05)
    src.stop()


def test_subscribe_ticks_deterministic():
    rows_a: list[dict] = []
    rows_b: list[dict] = []
    _drain(subscribe_ticks(rows_a.append, n_ticks=5, seed=7))
    _drain(subscribe_ticks(rows_b.append, n_ticks=5, seed=7))
    assert rows_a == rows_b
    assert 5 <= len(rows_a) <= 25
    assert set(rows_a[0]) == {"symbol", "timestamp", "price"}


def test_push_source_restarts_after_feed_error():
    calls: list[int] = []
    attempts: list[int] = []

    def feed():
        attempts.append(1)
        yield len(calls)
        raise RuntimeError("boom")

    src = PushSource(feed, calls.append, restart_interval_s=0.01, max_restarts=2)
    _drain(src)
    assert len(attempts) == 3  # initial + 2 restarts
    assert len(src.errors) == 3


def test_push_source_stop_mid_feed():
    def feed():
        while True:
            yield 1
            time.sleep(0.01)

    got: list[int] = []
    src = PushSource(feed, got.append).start()
    time.sleep(0.2)
    assert src.running
    src.stop()
    assert not src.running
    assert got


def test_ticks_feed_engine_ingest(rw):
    """Demo parity: push ticks → insert_row buffer → fetch aggregate."""
    rw.execute("CREATE TABLE IF NOT EXISTS push_tick (symbol STRING, timestamp FLOAT, price FLOAT)")

    def handler(row: dict) -> None:
        rw.insert_row(table_name="push_tick", force_flush=False, **row)

    _drain(subscribe_ticks(handler, n_ticks=4, seed=3))
    rw.insert_row(table_name="push_tick", force_flush=True,
                  symbol="ABC", timestamp=99.0, price=1.0)
    n = rw.fetchone("SELECT count(*) AS n FROM push_tick")
    assert n[0] >= 5


def test_subscribe_bars_missing_websocket_surfaces_error():
    src = subscribe_bars(["btcusdt@kline_1m"], lambda m: None)
    src._max_restarts = 0
    _drain(src)
    assert src.errors and isinstance(src.errors[0], (ImportError, Exception))
