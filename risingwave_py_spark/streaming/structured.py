"""Genuine Structured Streaming execution paths (SURVEY.md §2.8).

The engine's default MV runtime (engine.py:refresh_mv) is snapshot
micro-batch recompute — correct for arbitrary SQL, and cheap at the
reference's interactive scale. This module adds the *scale* path the
reference delegates to its server's streaming core
(/root/reference/risingwave/core.py:453-455 CREATE MATERIALIZED VIEW;
/root/reference/risingwave/core.py:541-560 changelog delivery):

  - ``stream_table``      — readStream over an engine table's parquet
                            directory (file-source streaming; at
                            cluster scale the same call points at
                            S3/Kafka paths — new files are discovered
                            incrementally, never re-scanned);
  - ``StreamingMV``       — watermarked incremental aggregation in
                            update mode; ``foreachBatch`` merges
                            changed groups into the MV result table
                            and appends (op, rw_timestamp) changelog
                            rows matching the reference contract
                            (/root/reference/risingwave/core.py:551-554);
  - ``sessionize_stream`` — custom stateful operator via
                            ``applyInPandasWithState``: per-key
                            gap-based sessionization with timeout
                            emission (an operator Spark's built-in
                            ``session_window`` can't express once the
                            session payload is custom).

Scale notes (100 TB / 1000 executors):
  - only *state* for the windowed agg lives on executors (RocksDB/
    HDFS-backed state store in cluster deployments) — input files
    stream through once; watermark bounds state size;
  - ``foreachBatch`` output per micro-batch is the set of *changed*
    groups (update mode), not the whole result — merge cost tracks
    the change rate, not table size;
  - the changelog append is an append-only parquet write partitioned
    by epoch — no compaction stalls on the hot path; retention is the
    subscription vacuum (engine.py:vacuum_changelogs).
"""

from __future__ import annotations

import os
import re
import tempfile
from collections.abc import Callable, Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OP_INSERT = "Insert"
OP_UPDATE_INSERT = "UpdateInsert"
OP_UPDATE_DELETE = "UpdateDelete"


def _table_location(spark: SparkSession, fq: str) -> str:
    """Filesystem path of a (parquet) catalog table."""
    row = spark.sql(f"DESCRIBE TABLE EXTENDED {fq}").filter(
        F.col("col_name") == "Location"
    ).head()
    if row is None:
        raise ValueError(f"no Location for table {fq}")
    return re.sub(r"^file:", "", row.data_type)


def stream_table(spark: SparkSession, fq: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """A streaming DataFrame over an engine table's data directory.

    File-source streaming: each appended parquet file is consumed
    exactly once (source tracks seen files in the checkpoint), so the
    cost per micro-batch is the new data, never a rescan. This is the
    idiomatic Spark replacement for the reference's server-side table
    scan dataflow.
    """
    schema = spark.table(fq).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(_table_location(spark, fq))


class StreamingMV:
    """A continuously-maintained windowed aggregate over a streamed table.

    The Structured-Streaming analogue of the reference's
    ``CREATE MATERIALIZED VIEW`` + subscription pair: the update-mode
    aggregate emits each micro-batch's *changed* groups; foreachBatch
    (1) merges them into the queryable result table and (2) appends
    changelog rows ``(…group cols…, op, rw_timestamp)`` with
    ``UpdateInsert`` for revised groups and ``Insert`` for new ones —
    the op vocabulary observed in the reference demo
    (/root/reference/demo.py:50).

    ``transform`` maps the raw stream to an aggregated streaming
    DataFrame (caller controls watermark/window/keys); ``key_cols``
    are the aggregate's group keys used for the merge.

    Storage layout (scale): the physical result lives in a
    ``<name>__data`` table PARTITIONED BY a key-hash bucket; the merge
    rewrites only the buckets the batch touches (dynamic partition
    overwrite), so per-batch write cost is O(changed buckets' rows),
    not O(result size). ``<name>`` itself is a view projecting the
    user-facing columns, so consumers see exactly the aggregate's
    schema. At true cluster scale the same layout maps 1:1 onto a
    Delta/Iceberg MERGE keyed by the bucket.
    """

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        key_cols: list[str],
        checkpoint_dir: str | None = None,
        n_buckets: int = 64,
    ):
        self.spark = spark
        self.name = name
        self.key_cols = list(key_cols)
        self.result_table = name           # user-facing view
        self.data_table = f"{name}__data"  # bucket-partitioned storage
        self.changelog_table = f"{name}__changelog"
        self.n_buckets = max(int(n_buckets), 1)
        self._available_now = True
        self._checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix=f"rw_smv_{os.getpid()}_")
        self._agg = transform(source)
        self.query = None

    # -- foreachBatch sink -------------------------------------------------

    def _bucket(self) -> "F.Column":
        return F.pmod(
            F.hash(*[F.col(k) for k in self.key_cols]), F.lit(self.n_buckets)
        ).alias("__rw_bucket")

    def _merge_batch(self, batch: DataFrame, epoch_id: int) -> None:
        spark = self.spark
        batch = batch.localCheckpoint(eager=True)  # cut lineage; batch is reused 3×
        out_cols = batch.columns
        batch_b = batch.withColumn("__rw_bucket", self._bucket())
        if not spark.catalog.tableExists(self.data_table):
            batch_b.limit(0).write.format("parquet").partitionBy(
                "__rw_bucket"
            ).saveAsTable(self.data_table)
            spark.sql(
                f"CREATE OR REPLACE VIEW {self.result_table} AS "
                f"SELECT {', '.join(out_cols)} FROM {self.data_table}"
            )
            cl = batch.withColumn("op", F.lit("x")).withColumn(
                "rw_timestamp", F.lit(0).cast("bigint")
            )
            cl.limit(0).write.format("parquet").saveAsTable(self.changelog_table)
        # Buckets this batch touches: bounded by n_buckets (a constant),
        # so the collect is O(1) — and it lets the read below PRUNE to
        # touched partitions instead of scanning the whole result.
        touched = sorted(
            r[0] for r in batch_b.select("__rw_bucket").distinct().collect()
        )
        # Eager snapshot: revised/fresh/kept are evaluated after the
        # overwrite below — without the checkpoint they would re-read
        # the already-merged partitions and misclassify every key.
        current = (
            spark.table(self.data_table)
            .filter(F.col("__rw_bucket").isin(touched))
            .localCheckpoint(eager=True)
        )
        on = [batch[k].eqNullSafe(current[k]) for k in self.key_cols]
        cond = on[0]
        for c in on[1:]:
            cond = cond & c
        revised = batch.join(current, cond, "left_semi")
        fresh = batch.join(current, cond, "left_anti")
        # Merge WITHIN the touched buckets only: keep their rows whose
        # key is not in the batch, add the batch, dynamically overwrite
        # just those partitions. Untouched buckets are never rewritten.
        kept = current.join(batch, cond, "left_anti")
        # old values of revised groups — the UpdateDelete half of the
        # changelog pair (replaying the changelog must retract the old
        # row or every revision double-counts)
        old_revised = current.join(batch, cond, "left_semi").select(*out_cols)
        merged = (
            kept.unionByName(batch_b)
            .select(*spark.table(self.data_table).columns)
            .localCheckpoint(eager=True)
        )
        # Session conf, not a write option: insertInto does not honor
        # the per-writer partitionOverwriteMode option, and STATIC
        # overwrite here would drop every untouched bucket.
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prev_mode = spark.conf.get(conf_key, "STATIC")
        spark.conf.set(conf_key, "dynamic")
        try:
            merged.write.mode("overwrite").insertInto(
                self.data_table, overwrite=True
            )
        finally:
            spark.conf.set(conf_key, prev_mode)
        changelog = (
            old_revised.withColumn("op", F.lit(OP_UPDATE_DELETE))
            .unionByName(revised.withColumn("op", F.lit(OP_UPDATE_INSERT)))
            .unionByName(fresh.withColumn("op", F.lit(OP_INSERT)))
            .withColumn("rw_timestamp", F.lit(int(epoch_id)).cast("bigint"))
        )
        changelog.write.mode("append").insertInto(self.changelog_table)
        # Reads that happened before this batch cached the parquet file
        # listing for both tables; invalidate so readers see this batch.
        spark.catalog.refreshTable(self.data_table)
        spark.catalog.refreshTable(self.changelog_table)

    # -- lifecycle ---------------------------------------------------------

    def start(self, available_now: bool = True, processing_time: str | None = None):
        writer = (
            self._agg.writeStream.outputMode("update")
            .option("checkpointLocation", self._checkpoint)
            .foreachBatch(self._merge_batch)
        )
        self._available_now = available_now
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        self.query = writer.start()
        return self.query

    def process_all(self) -> None:
        """Reference-FLUSH semantics for this stream: drain everything
        currently available (core.py:121 parity). An availableNow
        query terminates after the drain, so we wait for termination;
        a processingTime query never terminates — processAllAvailable
        blocks until the backlog is consumed and returns."""
        if self.query is None:
            return
        if self._available_now:
            self.query.awaitTermination()
        else:
            self.query.processAllAvailable()

    def stop(self) -> None:
        if self.query is not None and self.query.isActive:
            self.query.stop()

    def drop(self) -> None:
        """Stop the query and remove the view + backing tables."""
        self.stop()
        self.spark.sql(f"DROP VIEW IF EXISTS {self.result_table}")
        self.spark.sql(f"DROP TABLE IF EXISTS {self.data_table}")
        self.spark.sql(f"DROP TABLE IF EXISTS {self.changelog_table}")


# ---------------------------------------------------------------------------
# Custom stateful operator: gap-based sessionization with custom payload
# ---------------------------------------------------------------------------

_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1000)


def _make_sessionize_fn(gap_minutes: int, idle_timeout_ms: int):
    """Build the per-user session accumulator closure.

    Emits a session row whenever an event gap closes one; with
    ``idle_timeout_ms > 0`` an idle key's open session is also flushed
    on processing-time timeout. State is one 4-tuple per live session
    per key — O(keys) memory, watermark-independent.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                s_us, l_us, n, total = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(s_us, unit="us")],
                        "session_end": [pd.Timestamp(l_us, unit="us")],
                        "n_events": [n],
                        "total_value": [total],
                    }
                )
            return

        events = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        if state.exists:
            s_us, l_us, n, total = state.get
        else:
            s_us = l_us = -1
            n = 0
            total = 0.0
        out_rows: list[tuple[int, int, int, float]] = []
        for ts, value in zip(events["ts"], events["value"]):
            t = _us(ts)
            if s_us < 0:
                s_us, l_us, n, total = t, t, 1, float(value)
            elif t - l_us > gap_us:
                out_rows.append((s_us, l_us, n, total))
                s_us, l_us, n, total = t, t, 1, float(value)
            else:
                l_us = t
                n += 1
                total += float(value)
        state.update((s_us, l_us, n, total))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_rows),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in out_rows],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in out_rows],
                    "n_events": [n for _, _, n, _ in out_rows],
                    "total_value": [t for _, _, _, t in out_rows],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, idle_timeout_ms: int = 0
) -> DataFrame:
    """Custom stateful sessionization over a streaming events frame.

    ``applyInPandasWithState`` — Arrow-batched, one state entry per
    user; the built-in ``session_window`` can't carry this custom
    accumulator (running total + event count emitted only at session
    close). Expects columns (user_id, ts, value).

    ``idle_timeout_ms=0`` (default) uses NoTimeout: open sessions stay
    in state, and an ``availableNow`` drain terminates deterministically
    — the mode for batch-like catch-up runs. With a positive timeout
    (continuous triggers), idle users' sessions flush after that much
    processing time; note an availableNow query then keeps running
    batches to fire timeouts and will not self-terminate.
    """
    fn = _make_sessionize_fn(gap_minutes, idle_timeout_ms)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (SURVEY.md §2.3: RisingWave's join
    on a time-bounded condition between two streams).

    Both sides are watermarked, and the join condition is
    ``left.key == right.key AND right.ts IN [left.ts, left.ts +
    max_delay]`` — the time bound plus the watermarks is what lets
    Spark expire buffered rows: each side holds at most
    (watermark + max_delay) of state per key range, so state is
    bounded on unbounded streams. Caller supplies disjoint column
    names across the two sides (rename before joining).
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, how)


def lookup_join_stream(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Process-time temporal lookup join (SURVEY.md §2.3: RisingWave's
    ``FOR SYSTEM_TIME AS OF PROCTIME()``).

    Stream-static join: Structured Streaming re-executes the static
    side's plan every micro-batch, so each event is enriched against
    the dimension rows as of that batch's processing time — the
    process-time temporal semantics (after out-of-band dimension
    writes, ``spark.catalog.refreshTable`` invalidates the cached file
    listing). The dimension is broadcast: no shuffle touches the
    stream side, which is what makes this viable on a 100 TB/day
    stream against a million-row dimension.
    """
    return stream.join(F.broadcast(dim), stream[stream_key] == dim[dim_key], how)


def tumbling_counts_stream(events: DataFrame, width: str = "15 minutes",
                           watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregate (update-mode-ready).

    The streaming twin of the batch ``tumble_events_15m`` query: the
    watermark lets Spark drop window state older than max(event time)
    - 1 h, so state is bounded regardless of stream length — the
    late-data policy the reference leaves to its server.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hopping_counts_stream(events: DataFrame, width: str = "30 minutes",
                          slide: str = "15 minutes",
                          watermark: str = "1 hour") -> DataFrame:
    """Watermarked hopping (sliding) window aggregate — the streaming
    twin of the batch ``hop_events_30m_15m`` query and of RisingWave's
    hop() TVF. Each event lands in width/slide overlapping windows;
    Spark expands that assignment inside codegen before the shuffle,
    and the watermark bounds how many open windows hold state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, key_cols: list[str] | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming deduplication: first-occurrence-wins on the key
    columns, with state bounded by the watermark
    (``dropDuplicatesWithinWatermark``) — the streaming twin of the
    batch ``dedup_exact_docs`` operator and of a RisingWave
    append-only dedup MV (``SELECT DISTINCT ON (key) ...`` over a
    stream).

    Scale: state is a hash set keyed by the dedup key, sharded across
    executors by the same key hash the exchange uses — each executor
    holds only its shard, and the watermark evicts keys older than
    max(event time) - delay, so state size tracks the duplicate
    ARRIVAL window, not stream length. The unbounded-state alternative
    (plain ``dropDuplicates`` on a stream) is exactly what a 100 TB/day
    pipeline must not do.
    """
    keys = key_cols or ["user_id", "ts", "event_type"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def session_counts_stream(events: DataFrame, gap: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Watermarked session-window aggregate — Spark's native
    session_window() (dynamic-gap windows merged in the state store),
    completing the time-window trio next to tumbling_counts_stream and
    hopping_counts_stream. In append mode a session emits once the
    watermark passes its close — the RisingWave session-window MV
    semantics with explicit late-data policy."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# transformWithState: Spark 4's arbitrary-stateful-operator API — the
# modern successor to applyInPandasWithState (typed state variables,
# TTL, timers, RocksDB-backed). Used here for RisingWave's core
# primitive: an always-on incremental aggregation that emits the
# refreshed row per key on every micro-batch (what `CREATE
# MATERIALIZED VIEW ... GROUP BY user_id` maintains server-side,
# /root/reference/risingwave/core.py:453-455).
# ---------------------------------------------------------------------------

_RUNNING_AGG_OUT = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
)


def running_agg_stream(events: DataFrame) -> DataFrame:
    """Per-user running count/sum via ``transformWithStateInPandas``.

    One ValueState entry per user (RocksDB state store — set
    ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider before starting the query); each micro-batch folds its
    Arrow batches into the state and emits the UPDATED aggregate row,
    exactly the changelog-upsert stream an incremental MV produces.

    100 TB/day shape: state is O(distinct keys), partitioned by the
    group key across executors; per-batch work is O(batch) with no
    reshuffle beyond the groupBy exchange. Emission is Update-mode
    (only touched keys re-emit)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            # single state round trip: get() returns None when absent
            prior = self._agg.get()
            n, total = prior if prior is not None else (0, 0.0)
            for pdf in rows:
                n += int(len(pdf))
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningAgg(),
            outputStructType=_RUNNING_AGG_OUT,
            outputMode="Update",
            timeMode="None",
        )
    )
