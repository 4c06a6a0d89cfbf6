"""Changelog / subscription semantics tests (SURVEY.md §5 item 3):
scripted insert sequences → expected op sequences; progress
persistence and SINCE resume; at-least-once behavior."""

from __future__ import annotations

import threading
import time

import pandas as pd
import pytest

from risingwave_py_spark import OutputFormat


def _ops(rows):
    return sorted((r[0], r[-2]) for r in rows)


def test_agg_mv_changelog_ops(rw):
    """Mirrors demo.py:50 — an agg MV emits Insert for new groups and
    UpdateDelete/UpdateInsert pairs for changed groups."""
    rw.execute("DROP TABLE IF EXISTS t_ch_sales")
    rw.insert(data=pd.DataFrame({"p": ["x", "y"], "v": [1.0, 2.0]}),
              table_name="t_ch_sales", force_flush=True)
    rw.mv(stmt="SELECT p, sum(v) AS total FROM t_ch_sales GROUP BY p",
          name="t_ch_mv")
    rw.execute(
        "CREATE SUBSCRIPTION IF NOT EXISTS public.t_ch_sub FROM public.t_ch_mv "
        "WITH (retention = '86400s')"
    )
    rw.execute("DECLARE t_ch_cur subscription cursor for public.t_ch_sub SINCE 0")

    # change x (update), add z (insert)
    rw.insert(data=pd.DataFrame({"p": ["x", "z"], "v": [9.0, 5.0]}),
              table_name="t_ch_sales", force_flush=True)
    cols, rows = rw.engine.fetch_cursor("t_ch_cur", 100)
    assert cols[-2:] == ["op", "rw_timestamp"]
    assert _ops(rows) == [
        ("x", "UpdateDelete"), ("x", "UpdateInsert"), ("z", "Insert"),
    ]
    old_x = [r for r in rows if r[0] == "x" and r[1] == 1.0]
    new_x = [r for r in rows if r[0] == "x" and r[1] == 10.0]
    assert old_x[0][-2] == "UpdateDelete"
    assert new_x[0][-2] == "UpdateInsert"


def test_epochs_monotonic_and_batched(rw):
    rw.execute("DROP TABLE IF EXISTS t_ch_mono")
    rw.insert(data=pd.DataFrame({"k": [1], "v": [1.0]}),
              table_name="t_ch_mono", force_flush=True)
    rw.execute(
        "CREATE SUBSCRIPTION IF NOT EXISTS public.t_ch_mono_sub FROM public.t_ch_mono "
        "WITH (retention = '86400s')"
    )
    rw.execute("DECLARE t_ch_mono_cur subscription cursor for public.t_ch_mono_sub SINCE 0")
    for i in range(3):
        rw.insert(data=pd.DataFrame({"k": [10 + i], "v": [float(i)]}),
                  table_name="t_ch_mono", force_flush=True)
    _, rows = rw.engine.fetch_cursor("t_ch_mono_cur", 1000)
    ts = [r[-1] for r in rows]
    assert ts == sorted(ts)
    assert len(set(ts)) == 4  # initial + 3 single-row epochs
    # ops on a plain table are all Insert
    assert {r[-2] for r in rows} == {"Insert"}


def test_fetch_does_not_split_epochs(rw):
    rw.execute("DROP TABLE IF EXISTS t_ch_split")
    rw.insert(data=pd.DataFrame({"k": list(range(5)), "v": [0.0] * 5}),
              table_name="t_ch_split", force_flush=True)
    rw.execute(
        "CREATE SUBSCRIPTION IF NOT EXISTS public.t_ch_split_sub FROM public.t_ch_split "
        "WITH (retention = '86400s')"
    )
    rw.execute("DECLARE t_ch_split_cur subscription cursor for public.t_ch_split_sub SINCE 0")
    # batch limit 3 < epoch size 5 → the whole 5-row epoch is delivered
    _, rows = rw.engine.fetch_cursor("t_ch_split_cur", 3)
    assert len(rows) == 5
    assert len({r[-1] for r in rows}) == 1


def test_progress_persist_and_since_resume(rw):
    """Progress written after handling; a new subscription run resumes
    from the persisted offset and sees only newer epochs
    (core.py:525-557 contract)."""
    rw.execute("DROP TABLE IF EXISTS t_ch_resume")
    rw.insert(data=pd.DataFrame({"k": [1], "v": [1.0]}),
              table_name="t_ch_resume", force_flush=True)

    got_first: list = []
    stop = threading.Event()
    t = threading.Thread(
        target=lambda: rw.on_change(
            subscribe_from="t_ch_resume",
            handler=lambda d: got_first.append(d),
            output_format=OutputFormat.RAW,
            persist_progress=True, max_batch_size=100,
            _stop_event=stop,
        ),
        daemon=True,
    )
    t.start()
    # keep producing (like the reference demo's tick thread) until the
    # subscriber — whose cursor starts at declare-time — sees a batch
    deadline = time.time() + 120
    k = 2
    while not got_first and time.time() < deadline:
        rw.insert(data=pd.DataFrame({"k": [k], "v": [float(k)]}),
                  table_name="t_ch_resume", force_flush=True)
        k += 1
        time.sleep(0.5)
    assert got_first, "no batch delivered to live subscription"
    stop.set()
    t.join(timeout=60)
    assert not t.is_alive()
    delivered_ts = got_first[-1][-1][-1]

    # progress row persisted = last delivered epoch
    prow = rw.fetchone(
        "SELECT progress FROM risingwave_py_sub_progress "
        "WHERE sub_name = 'public.t_ch_resume_sub'"
    )
    assert prow is not None and prow[0] == delivered_ts

    # second run (fresh loop) resumes SINCE progress: only newer epochs
    rw.insert(data=pd.DataFrame({"k": [999], "v": [9.0]}),
              table_name="t_ch_resume", force_flush=True)
    got_second: list = []
    rw.on_change(
        subscribe_from="t_ch_resume", handler=lambda d: got_second.append(d),
        output_format=OutputFormat.RAW, persist_progress=True,
        max_batch_size=100, _stop_when_idle=True,
    )
    flat = [r for b in got_second for r in b]
    assert 999 in [r[0] for r in flat]
    assert all(r[-1] > delivered_ts for r in flat)
    # no redelivery of rows handled in the first run
    first_keys = {r[0] for b in got_first for r in b}
    assert first_keys.isdisjoint({r[0] for r in flat})


def test_dataframe_format_has_rw_timestamp_last(rw):
    rw.execute("DROP TABLE IF EXISTS t_ch_fmt")
    rw.insert(data=pd.DataFrame({"k": [1]}), table_name="t_ch_fmt", force_flush=True)
    rw.execute(
        "CREATE SUBSCRIPTION IF NOT EXISTS public.t_ch_fmt_sub FROM public.t_ch_fmt "
        "WITH (retention = '86400s')"
    )
    rw.execute("DECLARE t_ch_fmt_cur subscription cursor for public.t_ch_fmt_sub SINCE 0")
    data = rw.fetch("FETCH 10 FROM t_ch_fmt_cur", format=OutputFormat.DATAFRAME)
    assert list(data.columns) == ["k", "op", "rw_timestamp"]
    assert data["rw_timestamp"].iloc[-1] > 0


def test_vacuum_changelogs_applies_retention(rw):
    """Subscription retention (core.py:500-505 WITH retention): vacuum
    drops epochs whose commit WALL TIME is older than (now -
    retention) — an age, not an epoch count; a cursor declared SINCE 0
    afterwards replays only the surviving epochs."""
    import pandas as pd

    eng = rw.engine
    rw.execute("DROP TABLE IF EXISTS vac_ev")
    for batch in ([1], [2], [3], [4]):
        rw.insert(pd.DataFrame({"k": batch}), table_name="vac_ev", force_flush=True)
    # 120 s window: wide enough that slow DDL under full-suite load
    # can never age the FRESH epochs past it (the aged ones are pushed
    # a full hour back, far beyond any plausible test latency).
    rw.execute("CREATE SUBSCRIPTION vac_s FROM vac_ev WITH (retention = '120s')")
    # Discover the four insert epochs from the changelog itself (other
    # tests' MV refreshes also consume engine epochs, so current_epoch
    # is not the insert epoch), then age the first two past the window.
    eng.declare_cursor("vac_probe", "vac_s", since=0)
    _, all_rows = eng.fetch_cursor("vac_probe", 100)
    epochs = [r[-1] for r in all_rows]  # rw_timestamp is the last column
    assert len(epochs) == 4
    for e in epochs[:2]:
        eng.epoch_wall[e] -= 3600
    eng.vacuum_changelogs()
    eng.declare_cursor("vac_cur", "vac_s", since=0)
    cols, rows = eng.fetch_cursor("vac_cur", 100)
    ks = sorted(r[0] for r in rows)
    assert ks == [3, 4], rows
    rw.execute("DROP SUBSCRIPTION vac_s")


def test_vacuum_retention_is_wall_clock_not_epoch_count(rw):
    """An old-but-few-epochs changelog IS vacuumed by age: two epochs,
    both older than the window, both dropped — under epoch-count
    semantics a '{n}s' >= 2 retention would have kept them."""
    import pandas as pd

    eng = rw.engine
    rw.execute("DROP TABLE IF EXISTS vac_old")
    for batch in ([1], [2]):
        rw.insert(pd.DataFrame({"k": batch}), table_name="vac_old", force_flush=True)
    rw.execute("CREATE SUBSCRIPTION vac_old_s FROM vac_old WITH (retention = '60s')")
    eng.declare_cursor("vac_old_probe", "vac_old_s", since=0)
    _, all_rows = eng.fetch_cursor("vac_old_probe", 100)
    epochs = [r[-1] for r in all_rows]
    assert len(epochs) == 2
    for e in epochs:
        eng.epoch_wall[e] -= 3600  # both epochs are an hour old
    eng.vacuum_changelogs()
    eng.declare_cursor("vac_old_cur", "vac_old_s", since=0)
    cols, rows = eng.fetch_cursor("vac_old_cur", 100)
    assert rows == [], rows  # entire history aged out
    # unknown-age epochs (no wall stamp) are never destroyed
    rw.insert(pd.DataFrame({"k": [9]}), table_name="vac_old", force_flush=True)
    e9 = eng.current_epoch
    del eng.epoch_wall[e9]
    eng.vacuum_changelogs()
    cols, rows = eng.fetch_cursor("vac_old_cur", 100)
    assert [r[0] for r in rows] == [9]
    rw.execute("DROP SUBSCRIPTION vac_old_s")


def test_concurrent_poll_never_sees_partial_epoch(rw):
    """Regression: refresh_mv publishes an epoch's changelog rows in
    several appends (UpdateDelete batch, then UpdateInsert batch). A
    cursor polling concurrently must never fetch between them — that
    would deliver a half epoch and advance past the missing rows
    forever. With epoch publication and cursor reads serialized on the
    engine lock, every UpdateDelete must arrive with its UpdateInsert
    partner in the same fetched epoch."""
    rw.execute("DROP TABLE IF EXISTS t_race")
    rw.insert(data=pd.DataFrame({"p": ["x"], "v": [1.0]}),
              table_name="t_race", force_flush=True)
    rw.mv(stmt="SELECT p, sum(v) AS total FROM t_race GROUP BY p", name="t_race_mv")
    rw.execute(
        "CREATE SUBSCRIPTION IF NOT EXISTS public.t_race_sub FROM public.t_race_mv "
        "WITH (retention = '86400s')"
    )
    rw.execute("DECLARE t_race_cur subscription cursor for public.t_race_sub SINCE 0")

    got: list[tuple] = []
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            _, rows = rw.engine.fetch_cursor("t_race_cur", 1000)
            got.extend(rows)
            time.sleep(0.01)

    t = threading.Thread(target=poll)
    t.start()
    try:
        for i in range(6):
            rw.insert(data=pd.DataFrame({"p": ["x"], "v": [1.0]}),
                      table_name="t_race", force_flush=True)
    finally:
        time.sleep(0.5)
        stop.set()
        t.join()
    # drain anything left
    _, rows = rw.engine.fetch_cursor("t_race_cur", 10000)
    got.extend(rows)
    by_epoch: dict[int, list] = {}
    for r in got:
        by_epoch.setdefault(r[-1], []).append(r[-2])
    for epoch, ops in by_epoch.items():
        assert ops.count("UpdateDelete") == ops.count("UpdateInsert"), (epoch, ops)
    # all 6 updates were observed (nothing silently dropped)
    assert sum(ops.count("UpdateInsert") for ops in by_epoch.values()) == 6


def test_emit_on_window_close_append_only(rw):
    """EMIT ON WINDOW CLOSE: Insert-only changelog, frozen closed
    windows, and MV rows accumulate (never retracted)."""
    import pandas as pd

    rw.execute("DROP TABLE IF EXISTS eowc_t")
    rw.execute("CREATE TABLE eowc_t (ts TIMESTAMPTZ, k STRING, "
               "WATERMARK FOR ts AS ts - INTERVAL '5 seconds')")
    rw.execute("CREATE MATERIALIZED VIEW eowc_m AS "
               "SELECT window_start, window_end, k, count(*) AS n "
               "FROM tumble(eowc_t, ts, interval '10 seconds') "
               "GROUP BY window_start, window_end, k EMIT ON WINDOW CLOSE")
    rw.execute("CREATE SUBSCRIPTION eowc_sub FROM eowc_m WITH (retention='86400s')")
    rw.execute("DECLARE eowc_cur subscription cursor for eowc_sub SINCE 0")

    def tick(sec):
        rw.insert(pd.DataFrame({"ts": [pd.Timestamp(f"2024-06-01 00:00:{sec:02d}")],
                                "k": ["x"]}),
                  table_name="eowc_t", force_flush=True)

    tick(2)
    assert rw.fetch("SELECT * FROM eowc_m") == []  # nothing closed yet
    tick(16)  # wm=:11 closes [0,10)
    assert rw.fetch("SELECT k, n FROM eowc_m") == [("x", 1)]
    tick(3)   # late for closed [0,10): dropped, not reopened
    assert rw.fetch("SELECT k, n FROM eowc_m") == [("x", 1)]
    tick(31)  # wm=:26 closes [10,20)
    got = sorted(rw.fetch("SELECT window_start, n FROM eowc_m"))
    assert len(got) == 2 and got[1][1] == 1  # [10,20) emitted once
    _, rows = rw.engine.fetch_cursor("eowc_cur", 100)
    assert {r[-2] for r in rows} == {"Insert"}  # append-only changelog
    rw.execute("DROP SUBSCRIPTION eowc_sub")
    rw.execute("DROP MATERIALIZED VIEW eowc_m")
    rw.execute("DROP TABLE eowc_t")


def test_handler_crash_before_progress_redelivers(rw):
    """At-least-once contract (SURVEY §5.3): progress is persisted only
    AFTER the handler returns (core.py:549-557 ordering), so a handler
    that crashes mid-batch must see that same batch redelivered on the
    next run."""
    import pandas as pd

    from risingwave_py_spark.core import OutputFormat

    rw.execute("DROP TABLE IF EXISTS t_ch_crash")
    rw.insert(data=pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]}),
              table_name="t_ch_crash", force_flush=True)
    # A cursor with no SINCE starts at "now" (RisingWave semantics), so
    # seed progress=0: both runs then resume SINCE 0 and replay history.
    rw.execute(
        "CREATE TABLE IF NOT EXISTS risingwave_py_sub_progress "
        "(sub_name STRING PRIMARY KEY, progress BIGINT) "
        "ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(progress)"
    )
    rw.execute(
        "INSERT INTO risingwave_py_sub_progress (sub_name, progress) "
        "VALUES ('public.t_ch_crash_sub', 0)"
    )

    seen_then_crashed: list = []

    def bad_handler(data):
        seen_then_crashed.append(data)
        raise RuntimeError("handler died before progress write")

    with pytest.raises(RuntimeError):
        rw.on_change(
            subscribe_from="t_ch_crash", handler=bad_handler,
            output_format=OutputFormat.RAW, persist_progress=True,
            max_batch_size=100, _stop_when_idle=True,
        )
    assert seen_then_crashed, "crashing handler never saw a batch"
    crashed_keys = {r[0] for b in seen_then_crashed for r in b}

    # progress was NOT advanced for the failed delivery
    prow = rw.fetchone(
        "SELECT progress FROM risingwave_py_sub_progress "
        "WHERE sub_name = 'public.t_ch_crash_sub'"
    )
    assert prow is not None and prow[0] == 0

    # a fresh run redelivers the exact same rows
    got: list = []
    rw.on_change(
        subscribe_from="t_ch_crash", handler=lambda d: got.append(d),
        output_format=OutputFormat.RAW, persist_progress=True,
        max_batch_size=100, _stop_when_idle=True,
    )
    redelivered_keys = {r[0] for b in got for r in b}
    assert crashed_keys <= redelivered_keys
