"""External push sources (SURVEY.md §2.1 'External push source').

The reference bridges a push-based feed into the engine with a tiny
pattern: a background thread receives events, decodes them, and hands
each to a user handler which typically calls ``insert_row``
(/root/reference/binance/core.py:11-35 — websocket → json → handler;
/root/reference/demo.py:133-144 — handler → insert). The engine sees
only inserts; everything downstream (MVs, subscriptions) follows.

Re-expressed here:

  - ``PushSource``       — the generic bridge: any iterator/callback
                           feed → handler thread with auto-restart
                           (the reference reconnects every 5 s on
                           socket close);
  - ``subscribe_ticks``  — deterministic synthetic tick generator
                           matching the reference demo's producer
                           shape (1-5 rows/tick — demo.py:10-30);
  - ``subscribe_bars``   — signature-parity websocket connector
                           (stream names → combined-stream URL →
                           JSON-decoded messages). The websocket
                           client library is optional in this
                           environment, so the network path raises
                           ImportError at call time, not import time.

At scale the same pattern runs on the driver of a streaming job or is
replaced by a Kafka `readStream`; the handler contract is unchanged.
"""

from __future__ import annotations

import json
import random
import threading
import time
from collections.abc import Callable, Iterator
from typing import Any


class PushSource:
    """Background thread pumping events from a feed into a handler.

    ``feed`` is a zero-arg callable returning an iterator of events;
    if the iterator ends or raises, the feed is re-created after
    ``restart_interval_s`` (the reference's reconnect loop,
    binance/core.py:27-35), until ``stop()``.
    """

    def __init__(
        self,
        feed: Callable[[], Iterator[Any]],
        handler: Callable[[Any], None],
        restart_interval_s: float = 5.0,
        max_restarts: int | None = None,
    ):
        self._feed = feed
        self._handler = handler
        self._restart_interval_s = restart_interval_s
        self._max_restarts = max_restarts
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.errors: list[Exception] = []

    def _run(self) -> None:
        restarts = 0
        while not self._stop.is_set():
            try:
                for event in self._feed():
                    if self._stop.is_set():
                        return
                    self._handler(event)
            except Exception as exc:  # noqa: BLE001 — feed failure: restart
                self.errors.append(exc)
            restarts += 1
            if self._max_restarts is not None and restarts > self._max_restarts:
                return
            self._stop.wait(self._restart_interval_s)

    def start(self) -> "PushSource":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self, join_timeout_s: float = 10.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(join_timeout_s)

    @property
    def running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()


def subscribe_ticks(
    handler: Callable[[dict], None],
    symbols: tuple[str, ...] = ("ABC", "DEF", "XYZ"),
    n_ticks: int = 10,
    interval_s: float = 0.0,
    seed: int = 42,
) -> PushSource:
    """Synthetic tick feed with the reference demo's shape: each tick
    emits 1-5 rows of ``{symbol, timestamp, price}`` (demo.py:10-30),
    deterministic under ``seed``. Runs ``n_ticks`` then stops."""
    rng = random.Random(seed)

    def feed() -> Iterator[dict]:
        for tick in range(n_ticks):
            for _ in range(rng.randint(1, 5)):
                yield {
                    "symbol": rng.choice(symbols),
                    "timestamp": float(tick),
                    "price": round(rng.uniform(100.0, 400.0), 2),
                }
            if interval_s:
                time.sleep(interval_s)

    return PushSource(feed, handler, max_restarts=0)


def subscribe_bars(
    streams: list[str],
    handler: Callable[[dict], None],
    encoder: Callable[[str], Any] = json.loads,
    base_url: str = "wss://stream.binance.com/stream",
) -> PushSource:
    """Websocket kline connector with the reference's signature
    (binance/core.py:11-35): combined-stream URL from stream names,
    each message decoded with ``encoder`` and pushed to ``handler``,
    auto-reconnect every 5 s. Requires ``websocket-client`` — absent
    in this environment, so constructing the feed raises ImportError
    when started, with the plumbing still unit-testable via
    ``PushSource`` + any feed."""
    url = f"{base_url}?streams={'/'.join(streams)}"

    def feed() -> Iterator[Any]:
        import websocket  # optional dep; ImportError surfaces in PushSource.errors

        ws = websocket.create_connection(url)
        try:
            while True:
                yield encoder(ws.recv())
        finally:
            ws.close()

    return PushSource(feed, handler)
