"""Tombstone-aware maintenance for persisted index tables.

The stored ANN/MinHash/aHash indexes (posting lists, signature tables,
fingerprint tables) are refreshed incrementally: inserts append O(new
batch) rows. This module adds the retraction half — at 100 TB a privacy
deletion is a routine event and must not rewrite the whole index:

- **Delete** — ids present in the index but gone from the corpus are
  appended to a small tombstone side table (O(deleted batch) work);
  readers anti-join it (broadcast — tombstones are tiny relative to
  the index), so stale posting-list entries become invisible the same
  refresh that observes the deletion.
- **Re-insert** — an id-keyed tombstone would hide a row that comes
  back, so a re-inserted tombstoned id triggers compaction first.
- **Compaction** — a physical rewrite of the index minus tombstones,
  after which the tombstone table is dropped. Triggered by re-insert
  or by tombstones growing past COMPACT_FRACTION of the LIVE index.
  The rewrite is crash-atomic: survivors are staged into a fresh
  table, the live index is renamed aside, the stage renamed in, and
  only then are the aside copy and the tombstones dropped — a crash at
  any statement leaves either the live index or a recoverable
  stage/aside pair (``recover_stored_index`` heals both windows; a
  surviving tombstone table next to an already-compacted index is
  benign — the anti-join removes nothing — and is cleared by the next
  compaction). On a cluster lakehouse the same operation is a
  Delta/Iceberg DELETE (file-level rewrite of only the matching
  files, with the format's own commit-log atomicity).

**Crash recovery of a refresh**: the three writes inside one refresh
(tombstone append, compaction swap, new-row append) are individually
atomic but not jointly — a crash mid-refresh can leave tombstones
applied with the new batch missing. Recovery is simply re-running
``refresh_stored_index`` against the same corpus: the function is
idempotent (it re-derives gone/new id sets from the current
index-vs-corpus diff, so completed sub-steps become no-ops), which the
random-evolution property test pins (tests/test_index_store.py).

**Concurrency**: refresh and compaction take a per-index writer lock —
an OS-level ``flock`` on a lockfile next to the warehouse — so two
engines (threads OR processes) sharing one warehouse serialize their
refreshes instead of interleaving a compaction swap with an append.
Readers never take the lock: every reader-visible transition (tombstone
append, rename swap, row append) is individually atomic. On a
multi-host cluster this single-host lock does not reach — there the
index tables live in a lakehouse format whose optimistic-commit
protocol provides the same single-writer guarantee per commit.

The reference's client SDK has no index storage at all
(/root/reference/risingwave/core.py is a PG-wire client); this module
is the Spark-native durability layer under the dedup/ANN operators.
"""

from __future__ import annotations

import os
import re
from contextlib import contextmanager
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Tombstone fraction of LIVE index rows (stored minus tombstoned)
# beyond which a refresh compacts even without a re-insert — keeps the
# reader-side anti-join broadcast-small forever.
COMPACT_FRACTION = 0.25


def tomb_name(tbl: str) -> str:
    return f"{tbl}_tomb"


def _stage_name(tbl: str) -> str:
    return f"{tbl}__compact_stage"


def _pre_name(tbl: str) -> str:
    return f"{tbl}__compact_pre"


def _lock_path(spark: SparkSession, tbl: str) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = re.sub(r"^file:", "", wh)
    os.makedirs(wh, exist_ok=True)
    safe = re.sub(r"[^A-Za-z0-9_.]", "_", tbl)
    return os.path.join(wh, f".{safe}.idxlock")


@contextmanager
def writer_lock(spark: SparkSession, tbl: str):
    """Per-index single-writer lock (blocking). ``flock`` conflicts
    across processes AND across independent fds within one process, so
    two engines over one warehouse serialize refreshes either way. No
    unlink on release — deleting a lockfile others may have open would
    let a third writer lock a fresh inode and run concurrently."""
    try:
        import fcntl
    except ImportError:  # non-POSIX: in-process engine lock only
        yield
        return
    fd = os.open(_lock_path(spark, tbl), os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        try:
            fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)


def live_index(spark: SparkSession, tbl: str, id_col: str) -> DataFrame:
    """The index as readers must see it: stored rows minus tombstoned
    ids. The anti-join side is broadcast — tombstones stay small by
    construction (compaction bounds them at COMPACT_FRACTION)."""
    idx = spark.table(tbl)
    t = tomb_name(tbl)
    if spark.catalog.tableExists(t):
        idx = idx.join(F.broadcast(spark.table(t)), id_col, "left_anti")
    return idx


def recover_stored_index(spark: SparkSession, tbl: str) -> None:
    """Heal a crash inside ``_compact``'s swap window: if the index
    table is missing, install the best surviving copy — the compacted
    stage if it completed (equivalent reader-visible content), else
    the renamed-aside original — and drop the other remnant. A
    tombstone table that survives alongside an installed STAGE is
    benign (its ids are no longer in the index, so the reader
    anti-join removes nothing) and is dropped by the next compaction;
    alongside an installed PRE it is load-bearing and kept.

    When the index is LIVE this is a no-op: a stage/pre table next to
    a live index may belong to a concurrent writer mid-swap (writers
    serialize on ``writer_lock``, but recovery may be called without
    it) — our own compaction re-drops stale remnants under the lock
    before staging."""
    stage, pre = _stage_name(tbl), _pre_name(tbl)
    if spark.catalog.tableExists(tbl):
        return
    if spark.catalog.tableExists(stage):
        spark.sql(f"ALTER TABLE {stage} RENAME TO {tbl}")
    elif spark.catalog.tableExists(pre):
        spark.sql(f"ALTER TABLE {pre} RENAME TO {tbl}")
    for leftover in (stage, pre):
        if spark.catalog.tableExists(leftover):
            spark.sql(f"DROP TABLE IF EXISTS {leftover}")


def _compact(spark: SparkSession, tbl: str, id_col: str) -> None:
    """Rewrite the index minus tombstones — stage-then-swap, never
    overwrite-in-place: the index is expensive to rebuild (shingling /
    centroid assignment / media decode over the whole corpus), so a
    non-atomic overwrite that crashes mid-write must not be able to
    truncate it. Same rename-aside pattern as the engine's upsert-log
    compaction (engine.py _compact_upsert_log). Caller holds
    ``writer_lock``."""
    from risingwave_py_spark.catalog import clear_stale_location

    t = tomb_name(tbl)
    stage, pre = _stage_name(tbl), _pre_name(tbl)
    spark.sql(f"DROP TABLE IF EXISTS {stage}")
    clear_stale_location(spark, stage)
    spark.sql(
        f"CREATE TABLE {stage} USING PARQUET AS "
        f"SELECT /*+ BROADCAST(d) */ i.* FROM {tbl} i "
        f"LEFT ANTI JOIN {t} d ON i.`{id_col}` = d.`{id_col}`"
    )
    spark.sql(f"DROP TABLE IF EXISTS {pre}")
    clear_stale_location(spark, pre)
    spark.sql(f"ALTER TABLE {tbl} RENAME TO {pre}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {pre}")
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.catalog.refreshTable(tbl)


def refresh_stored_index(
    spark: SparkSession,
    tbl: str,
    corpus_ids: DataFrame,
    id_col: str,
    make_rows: Callable[[DataFrame], DataFrame],
) -> None:
    """Create-or-incrementally-refresh a stored index table so it
    reflects exactly the ids in ``corpus_ids`` (a 1-column DataFrame).

    ``make_rows(new_ids)`` builds index rows for the new-id batch (the
    caller joins back to its corpus for payloads — so the expensive
    pass, shingling or centroid assignment, runs only over the batch).
    Deletes tombstone, inserts append: both O(changed batch), never a
    rescan of the already-indexed corpus. In an engine deployment the
    changed-id sets come from the table changelog
    (``index_maintenance_scenario``); here they are recovered by two
    id-only anti-joins, which at scale prune to dictionary-encoded id
    columns on both sides.

    Idempotent: a crash anywhere mid-refresh is healed by re-running
    against the same corpus (sub-steps already applied re-derive to
    no-ops). Serialized against other writers by ``writer_lock``.

    Multi-row-per-id indexes (e.g. the video keyframe-hash index,
    several keyframe rows per doc) work unchanged — a tombstone hides
    ALL of an id's rows, and the compaction budget counts dead ROWS
    (index rows whose id is tombstoned), so the reader-side anti-join
    stays within COMPACT_FRACTION of live rows regardless of
    rows-per-id skew.
    """
    with writer_lock(spark, tbl):
        recover_stored_index(spark, tbl)
        if not spark.catalog.tableExists(tbl):
            from risingwave_py_spark.catalog import clear_stale_location

            clear_stale_location(spark, tbl)
            make_rows(corpus_ids).write.saveAsTable(tbl)
            return
        t = tomb_name(tbl)
        has_tomb = spark.catalog.tableExists(t)
        # EVERY refresh decision in ONE driver action: per-id stored
        # row counts full-outer-joined with the tombstone and corpus
        # id sets, aggregated once. This folds what used to be three
        # isEmpty() round-trips (gone / new / reinserted) plus the
        # dead-row-budget count into a single .first(). Dead rows are
        # counted exactly (multi-row-per-id indexes like video
        # keyframes hide several rows per tombstoned id), and they
        # include the rows this refresh is ABOUT to tombstone, so the
        # budget sees the post-append state. Plain shuffle joins on
        # distinct id columns — no broadcast of the (between-
        # compactions unbounded) tombstone set.
        stored = spark.table(tbl).groupBy(id_col).agg(
            F.count(F.lit(1)).alias("__nrows")
        )
        if has_tomb:
            tomb_ids = (
                spark.table(t).select(id_col).distinct()
                .withColumn("__t", F.lit(1))
            )
            stored = stored.join(tomb_ids, id_col, "full")
        else:
            stored = stored.withColumn("__t", F.lit(None).cast("int"))
        j = stored.join(
            corpus_ids.select(id_col).distinct().withColumn("__c", F.lit(1)),
            id_col, "full",
        )
        is_stored = F.col("__nrows").isNotNull()
        is_tomb = F.col("__t").isNotNull()
        in_corpus = F.col("__c").isNotNull()
        is_live = is_stored & ~is_tomb
        will_be_dead = is_tomb | (is_live & ~in_corpus)
        d = j.agg(
            F.sum(F.coalesce("__nrows", F.lit(0))).alias("total_rows"),
            F.sum(F.when(will_be_dead, F.col("__nrows")).otherwise(0)
                  ).alias("dead_rows"),
            F.sum((is_live & ~in_corpus).cast("long")).alias("n_gone"),
            F.sum((in_corpus & ~is_live).cast("long")).alias("n_new"),
            F.sum((in_corpus & is_tomb).cast("long")).alias("n_reins"),
        ).first()
        live_ids = live_index(spark, tbl, id_col).select(id_col).distinct()
        # materialize the new-id batch BEFORE any tombstone append or
        # compaction swap — both mutate the tables the lazy plan reads
        new_ids = None
        if d["n_new"]:
            new_ids = corpus_ids.join(
                live_ids, id_col, "left_anti"
            ).localCheckpoint(eager=True)
        if d["n_gone"]:
            gone = live_ids.join(corpus_ids, id_col, "left_anti")
            if has_tomb:
                gone.write.mode("append").saveAsTable(t)
            else:
                from risingwave_py_spark.catalog import clear_stale_location

                clear_stale_location(spark, t)
                gone.write.saveAsTable(t)
            spark.catalog.refreshTable(t)
        n_dead = d["dead_rows"] or 0
        n_live = (d["total_rows"] or 0) - n_dead
        if d["n_reins"] or n_dead > COMPACT_FRACTION * max(n_live, 1):
            _compact(spark, tbl, id_col)
        if new_ids is not None:
            make_rows(new_ids).write.mode("append").saveAsTable(tbl)
            spark.catalog.refreshTable(tbl)


def drop_stored_index(spark: SparkSession, tbl: str) -> None:
    """Remove an index table, its tombstones, and any crash remnants
    (scenario hygiene)."""
    for x in (tbl, tomb_name(tbl), _stage_name(tbl), _pre_name(tbl)):
        spark.sql(f"DROP TABLE IF EXISTS {x}")
