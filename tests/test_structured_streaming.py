"""Structured Streaming execution paths (streaming/structured.py).

Covers the genuine readStream→writeStream pipelines that back the
engine's scale path: file-source streaming over engine tables,
update-mode windowed aggregation with foreachBatch changelog merge,
and the applyInPandasWithState custom sessionizer. All tests use
availableNow triggers so they are deterministic and hermetic.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import uuid

import pandas as pd
import pytest

from pyspark.sql import functions as F

from risingwave_py_spark.streaming.structured import (
    StreamingMV,
    interval_join_streams,
    lookup_join_stream,
    sessionize_stream,
    stream_table,
    tumbling_counts_stream,
)


def _ts(minute: int, hour: int = 9) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute)


@pytest.fixture()
def events_dir(tmp_path, spark):
    """A parquet directory acting as a streaming source (plus helper
    to append micro-batch files the stream discovers incrementally)."""
    path = str(tmp_path / "events_stream")
    os.makedirs(path, exist_ok=True)

    def append(rows: list[tuple[int, dt.datetime, str, float]]) -> None:
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)

    return path, append


def _read_stream(spark, path):
    schema = "user_id bigint, ts timestamp, event_type string, value double"
    return spark.readStream.schema(schema).parquet(path)


def test_tumbling_counts_stream_matches_batch(spark, events_dir):
    path, append = events_dir
    rows = [
        (1, _ts(0), "click", 1.0),
        (1, _ts(5), "click", 2.0),
        (2, _ts(20), "view", 3.0),
        (3, _ts(40), "click", 4.0),
    ]
    append(rows)
    agg = tumbling_counts_stream(_read_stream(spark, path))
    sink = f"tcs_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table(sink).collect()
    }
    batch = (
        spark.read.parquet(path)
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {(r.w.start, r.event_type): (r.n, r.s) for r in batch}
    assert got == want
    assert len(got) == 3  # 9:00 click×2, 9:15 view, 9:30 click


def test_streaming_mv_merge_and_changelog(spark, events_dir):
    path, append = events_dir
    append([(1, _ts(1), "click", 1.0), (2, _ts(2), "view", 2.0)])

    name = f"smv_{uuid.uuid4().hex[:8]}"
    source = _read_stream(spark, path)
    mv = StreamingMV(
        spark,
        name,
        source,
        transform=lambda df: tumbling_counts_stream(df, width="15 minutes"),
        key_cols=["window_start", "event_type"],
    )
    mv.start(available_now=True)
    mv.process_all()

    first = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.table(mv.result_table).collect()
    }
    assert first[(_ts(0), "click")] == 1
    assert first[(_ts(0), "view")] == 1
    cl1 = spark.table(mv.changelog_table).collect()
    assert {r.op for r in cl1} == {"Insert"}

    # Second micro-batch: revises the 9:00/click window, adds 9:15/click.
    append([(1, _ts(3), "click", 5.0), (3, _ts(16), "click", 7.0)])
    mv.start(available_now=True)
    mv.process_all()

    second = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table(mv.result_table).collect()
    }
    assert second[(_ts(0), "click")] == (2, 6.0)  # revised in place
    assert second[(_ts(0), "view")] == (1, 2.0)  # untouched group kept
    assert second[(_ts(15), "click")] == (1, 7.0)  # new group
    ops: dict = {}
    for r in (
        spark.table(mv.changelog_table)
        .filter(F.col("rw_timestamp") > 0)
        .collect()
    ):
        ops.setdefault((r.window_start, r.event_type), set()).add(r.op)
    # revised group emits the full retraction pair; new group inserts
    assert ops[(_ts(0), "click")] == {"UpdateDelete", "UpdateInsert"}
    assert ops[(_ts(15), "click")] == {"Insert"}
    # changelog epochs monotone non-decreasing
    eps = [r.rw_timestamp for r in spark.table(mv.changelog_table).orderBy("rw_timestamp").collect()]
    assert eps == sorted(eps)

    mv.drop()


def test_streaming_mv_merge_rewrites_only_touched_buckets(spark, events_dir):
    """Scale invariant: the foreachBatch merge is O(changed groups),
    not O(result size) — a micro-batch touching one group must rewrite
    only that group's bucket partition, leaving every other bucket's
    files byte-for-byte untouched (path AND mtime)."""
    from risingwave_py_spark.streaming.structured import _table_location

    path, append = events_dir
    # Batch 1: 4 windows × 6 event types (all within one hour, so the
    # 1 h watermark cannot drop batch 2) → many groups, many buckets.
    rows = []
    kinds = ["click", "view", "buy", "scroll", "hover", "share"]
    for m in (0, 16, 31, 46):
        for i, kind in enumerate(kinds):
            rows.append((i, _ts(m, 9), kind, 1.0))
    append(rows)
    name = f"smvb_{uuid.uuid4().hex[:8]}"
    mv = StreamingMV(
        spark, name, _read_stream(spark, path),
        transform=lambda df: tumbling_counts_stream(df, width="15 minutes"),
        key_cols=["window_start", "event_type"],
    )
    mv.start(available_now=True)
    mv.process_all()

    loc = _table_location(spark, mv.data_table)
    def listing():
        out = {}
        for root, _dirs, files in os.walk(loc):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[os.path.relpath(p, loc)] = os.stat(p).st_mtime_ns
        return out

    before = listing()
    n_buckets_before = len({p.split("/")[0] for p in before})
    assert n_buckets_before >= 4, "test needs groups spread over buckets"

    # Batch 2: ONE group revised (latest window — not late).
    append([(1, _ts(47, 9), "click", 5.0)])
    mv.start(available_now=True)
    mv.process_all()
    after = listing()

    changed = {
        p for p in set(before) | set(after)
        if before.get(p) != after.get(p)
    }
    assert changed, "the touched bucket must have been rewritten"
    changed_buckets = {p.split("/")[0] for p in changed}
    assert len(changed_buckets) == 1, (
        f"one-group batch must rewrite exactly one bucket, got {changed_buckets}"
    )
    # result correctness unaffected by the partitioned layout
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.table(mv.result_table).collect()
    }
    assert got[(_ts(45, 9), "click")] == 2  # revised group
    assert got[(_ts(0, 9), "view")] == 1    # untouched group kept
    assert len(got) == 24
    mv.drop()


def test_stream_table_reads_engine_table(spark, rw):
    import pandas as pd

    tbl = f"stbl_{uuid.uuid4().hex[:8]}"
    rw.insert(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}), table_name=tbl, force_flush=True)
    fq = f"public.{tbl}"
    sdf = stream_table(spark, fq)
    assert sdf.isStreaming
    sink = f"st_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted((r.k, r.v) for r in spark.table(sink).collect()) == [(1, "a"), (2, "b")]


def test_interval_join_streams(spark, tmp_path):
    """Clicks joined to purchases that happen within 10 min after the
    click — the stream-stream time-bounded join."""
    clicks_path = str(tmp_path / "clicks")
    buys_path = str(tmp_path / "buys")
    spark.createDataFrame(
        pd.DataFrame(
            [(1, _ts(0)), (2, _ts(5)), (3, _ts(30))],
            columns=["c_user", "c_ts"],
        )
    ).coalesce(1).write.parquet(clicks_path)
    spark.createDataFrame(
        pd.DataFrame(
            [
                (1, _ts(4), 10.0),   # 4 min after user 1's click -> match
                (2, _ts(25), 20.0),  # 20 min after user 2's click -> no match
                (3, _ts(31), 30.0),  # 1 min after user 3's click -> match
                (4, _ts(6), 40.0),   # no click at all
            ],
            columns=["b_user", "b_ts", "amount"],
        )
    ).coalesce(1).write.parquet(buys_path)

    clicks = spark.readStream.schema("c_user bigint, c_ts timestamp").parquet(clicks_path)
    buys = spark.readStream.schema("b_user bigint, b_ts timestamp, amount double").parquet(
        buys_path
    )
    joined = interval_join_streams(
        clicks, buys, "c_user", "b_user", "c_ts", "b_ts", max_delay="10 minutes"
    )
    sink = f"ivj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted((r.c_user, r.amount) for r in spark.table(sink).collect())
    assert got == [(1, 10.0), (3, 30.0)]


def test_lookup_join_stream_sees_dimension_updates(spark, events_dir):
    """Stream-static join re-reads the dimension every micro-batch —
    process-time temporal semantics (FOR SYSTEM_TIME AS OF PROCTIME())."""
    path, append = events_dir
    dim = f"dim_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        pd.DataFrame({"d_user": [1, 2], "segment": ["gold", "silver"]})
    ).write.saveAsTable(dim)

    def run_batch() -> dict:
        sink = f"lkp_{uuid.uuid4().hex[:8]}"
        enriched = lookup_join_stream(
            _read_stream(spark, path), spark.table(dim), "user_id", "d_user"
        )
        q = (
            enriched.select("user_id", "ts", "segment")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r.user_id, r.ts): r.segment for r in spark.table(sink).collect()}

    append([(1, _ts(0), "click", 1.0), (3, _ts(1), "view", 2.0)])
    first = run_batch()
    assert first[(1, _ts(0))] == "gold"
    assert first[(3, _ts(1))] is None  # left join: unmatched key -> NULL

    # Dimension gains user 3; a later batch is enriched with it.
    spark.createDataFrame(
        pd.DataFrame({"d_user": [3], "segment": ["bronze"]})
    ).write.mode("append").saveAsTable(dim)
    spark.catalog.refreshTable(dim)
    append([(3, _ts(2), "click", 3.0)])
    second = run_batch()
    assert second[(3, _ts(2))] == "bronze"
    spark.sql(f"DROP TABLE IF EXISTS {dim}")


def test_sessionize_stateful_emits_closed_sessions(spark, events_dir):
    path, append = events_dir
    # user 1: session A (9:00-9:10), >30min gap, session B (10:00-) still open;
    # user 2: single open session — nothing emitted for it.
    append(
        [
            (1, _ts(0), "click", 1.0),
            (1, _ts(10), "click", 2.0),
            (1, _ts(0, hour=10), "click", 9.0),
            (2, _ts(5), "view", 3.0),
        ]
    )
    sessions = sessionize_stream(_read_stream(spark, path))
    sink = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(sink).collect()
    assert len(rows) == 1
    (s,) = rows
    assert s.user_id == 1
    assert s.session_start == _ts(0) and s.session_end == _ts(10)
    assert s.n_events == 2 and s.total_value == 3.0


def test_hopping_counts_stream_matches_batch(spark, events_dir):
    from risingwave_py_spark.streaming.structured import hopping_counts_stream

    path, append = events_dir
    append([
        (1, _ts(0), "click", 1.0),
        (1, _ts(14), "click", 2.0),
        (2, _ts(20), "view", 3.0),
        (3, _ts(40), "click", 4.0),
    ])
    agg = hopping_counts_stream(_read_stream(spark, path))
    sink = f"hcs_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.event_type): r.n_events for r in spark.table(sink).collect()
    }
    batch = (
        spark.read.parquet(path)
        .groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want = {(r.w.start, r.event_type): r.n for r in batch}
    assert got == want
    # each event appears in exactly width/slide = 2 overlapping windows
    assert sum(got.values()) == 8


def test_session_counts_stream_finalizes_below_watermark(spark, events_dir):
    from risingwave_py_spark.streaming.structured import session_counts_stream

    path, append = events_dir
    append([
        (1, _ts(0), "click", 1.0),
        (1, _ts(3), "click", 1.0),   # same session (gap 5m)
        (1, _ts(20), "click", 1.0),  # new session for user 1
        (2, _ts(1), "view", 1.0),
        # sentinel far in the future: pushes the watermark past every
        # session above so append mode finalizes them
        (9, _ts(0, hour=12), "click", 1.0),
    ])
    agg = session_counts_stream(_read_stream(spark, path))
    sink = f"scs_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", path + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.session_start, r.user_id): r.n_events for r in spark.table(sink).collect()
    }
    # sessions: user1 9:00-9:08 (2 events), user1 9:20 (1), user2 9:01 (1)
    assert got == {
        (_ts(0), 1): 2,
        (_ts(20), 1): 1,
        (_ts(1), 2): 1,
    }


def test_dedup_stream_drops_duplicates_across_batches(spark, events_dir):
    from risingwave_py_spark.streaming.structured import dedup_stream

    path, append = events_dir
    append([
        (1, _ts(0), "click", 1.0),
        (1, _ts(0), "click", 1.0),  # intra-batch duplicate
        (2, _ts(5), "view", 2.0),
    ])
    sink = f"dds_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_stream(_read_stream(spark, path))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .start()
    )
    q.processAllAvailable()
    # Cross-batch duplicate (1, 9:00, click) arrives again within the
    # watermark window, plus one genuinely new event.
    append([
        (1, _ts(0), "click", 1.0),
        (3, _ts(10), "click", 3.0),
    ])
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.user_id, r.ts, r.event_type) for r in spark.table(sink).collect()
    )
    assert got == [
        (1, _ts(0), "click"),
        (2, _ts(5), "view"),
        (3, _ts(10), "click"),
    ]


def _has_protobuf() -> bool:
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_transform_with_state_running_agg(spark, events_dir):
    """transformWithState (Spark 4 API): state persists across
    micro-batches — the second drain's emission continues from the
    first drain's counts, per key.

    The state-API client needs protobuf at query start; without it
    (this container) the test still verifies the operator wires up —
    plan construction and output schema — then skips execution."""
    from risingwave_py_spark.streaming.structured import running_agg_stream

    path, append = events_dir
    wired = running_agg_stream(_read_stream(spark, path))
    assert wired.isStreaming
    assert [f.name for f in wired.schema.fields] == [
        "user_id", "n_events", "total_value"]
    if not _has_protobuf():
        # protobuf is PERMANENTLY absent in this container (no pip);
        # before skipping execution, pin the graceful-error contract:
        # starting the query surfaces a clear capability error quickly
        # instead of hanging or corrupting state.
        append([(1, _ts(0), "click", 1.0)])
        fail_ckpt = tempfile.mkdtemp(prefix="rw_twsfail_")
        failed = None
        try:
            q = (
                running_agg_stream(_read_stream(spark, path))
                .writeStream.outputMode("update")
                .format("memory")
                .queryName(f"raggf_{uuid.uuid4().hex[:8]}")
                .option("checkpointLocation", fail_ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(120)
            finally:
                q.stop()
        except Exception as e:  # noqa: BLE001 — the expected path
            failed = e
        # Spark surfaces the missing state-API client as a fast
        # STREAM_FAILED ("TransformWithStateInPySpark driver worker
        # exited unexpectedly") — the contract pinned here is fail-fast
        # with a query-terminated error, never a hang.
        msg = str(failed).lower() if failed is not None else ""
        assert failed is not None and (
            "stream_failed" in msg or "transformwithstate" in msg
        ), f"expected a fast query-terminated error, got {failed!r}"
        pytest.skip("transformWithState execution needs protobuf (absent "
                    "in this container, no pip — permanent); wiring and "
                    "graceful-error path verified")
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ckpt = tempfile.mkdtemp(prefix="rw_twstest_")
    sink = f"ragg_{uuid.uuid4().hex[:8]}"

    def drain():
        q = (
            running_agg_stream(_read_stream(spark, path))
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = {}
        for r in spark.table(sink).collect():
            out[r.user_id] = (r.n_events, r.total_value)  # last write wins
        return out

    try:
        append([(1, _ts(0), "click", 1.0), (1, _ts(1), "view", 2.0),
                (2, _ts(2), "click", 5.0)])
        first = drain()
        assert first[1] == (2, 3.0)
        assert first[2] == (1, 5.0)

        append([(1, _ts(3), "click", 4.0)])
        second = drain()
        assert second[1] == (3, 7.0)  # continued from persisted state
        assert second[2] == (1, 5.0)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_curation_pipeline(spark, tmp_path):
    """End-to-end STREAMING corpus curation: document stream →
    content-hash dedup (watermark-bounded state) → token-count quality
    gate → per-source token accounting via foreachBatch into a result
    table. The streaming twin of pipeline_curate_corpus, composed
    entirely from the proven streaming operators."""
    from risingwave_py_spark.streaming.structured import dedup_stream

    path = str(tmp_path / "docs_stream")
    os.makedirs(path, exist_ok=True)

    def append(rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "source", "text"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)

    schema = "doc_id bigint, ts timestamp, source string, text string"
    result = f"curate_{uuid.uuid4().hex[:8]}"
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(path)
        deduped = dedup_stream(
            stream.withColumn("content_hash", F.md5("text")),
            key_cols=["content_hash"],
        )
        kept = deduped.filter(F.size(F.split("text", r"\s+")) >= 3).select(
            "doc_id", "source", F.size(F.split("text", r"\s+")).alias("n_tokens")
        )

        def merge(batch, _bid):
            batch.groupBy("source").agg(
                F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens")
            ).write.mode("append").saveAsTable(result)

        q = (
            kept.writeStream.foreachBatch(merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark.catalog.refreshTable(result)
        return {
            r.source: (r.docs, r.tokens)
            for r in spark.table(result)
            .groupBy("source")
            .agg(F.sum("docs").alias("docs"), F.sum("tokens").alias("tokens"))
            .collect()
        }

    t0 = _ts(0)
    append([
        (1, t0, "web", "alpha beta gamma delta"),
        (2, t0, "web", "alpha beta gamma delta"),   # exact dup → dropped
        (3, t0, "web", "too short"),                # quality gate → dropped
        (4, t0, "book", "one two three four five"),
    ])
    first = drain()
    assert first == {"web": (1, 4), "book": (1, 5)}

    # second batch: a cross-batch duplicate (within watermark) is
    # dropped by streaming state; a fresh doc lands.
    append([
        (5, _ts(1), "web", "alpha beta gamma delta"),  # dup of doc 1
        (6, _ts(1), "web", "six seven eight nine"),
    ])
    second = drain()
    assert second == {"web": (2, 8), "book": (1, 5)}
    spark.sql(f"DROP TABLE IF EXISTS {result}")
