"""Tombstone-aware maintenance for persisted index tables.

The stored ANN/MinHash indexes (posting lists, signature tables) are
refreshed incrementally: inserts append O(new batch) rows. This module
adds the retraction half — at 100 TB a privacy deletion is a routine
event and must not rewrite the whole index:

- **Delete** — ids present in the index but gone from the corpus are
  appended to a small tombstone side table (O(deleted batch) work);
  readers anti-join it (broadcast — tombstones are tiny relative to
  the index), so stale posting-list entries become invisible the same
  refresh that observes the deletion.
- **Re-insert** — an id-keyed tombstone would hide a row that comes
  back, so a re-inserted tombstoned id triggers compaction first.
- **Compaction** — a physical rewrite of the index minus tombstones
  (survivors snapshotted via localCheckpoint so the overwrite never
  reads the table it replaces), after which the tombstone table is
  dropped. Triggered by re-insert or by tombstones growing past
  COMPACT_FRACTION of the index. On a cluster lakehouse the same
  operation is a Delta/Iceberg DELETE (file-level rewrite of only the
  matching files).

The reference's client SDK has no index storage at all
(/root/reference/risingwave/core.py is a PG-wire client); this module
is the Spark-native durability layer under the dedup/ANN operators.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Tombstone fraction of live index rows beyond which a refresh
# compacts even without a re-insert (keeps the reader-side anti-join
# broadcast-small forever).
COMPACT_FRACTION = 0.25


def tomb_name(tbl: str) -> str:
    return f"{tbl}_tomb"


def live_index(spark: SparkSession, tbl: str, id_col: str) -> DataFrame:
    """The index as readers must see it: stored rows minus tombstoned
    ids. The anti-join side is broadcast — tombstones stay small by
    construction (compaction bounds them at COMPACT_FRACTION)."""
    idx = spark.table(tbl)
    t = tomb_name(tbl)
    if spark.catalog.tableExists(t):
        idx = idx.join(F.broadcast(spark.table(t)), id_col, "left_anti")
    return idx


def _compact(spark: SparkSession, tbl: str, id_col: str) -> None:
    t = tomb_name(tbl)
    remaining = (
        spark.table(tbl)
        .join(F.broadcast(spark.table(t)), id_col, "left_anti")
        .localCheckpoint(eager=True)
    )
    remaining.write.mode("overwrite").insertInto(tbl, overwrite=True)
    spark.sql(f"DROP TABLE {t}")
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
    """
    if not spark.catalog.tableExists(tbl):
        from risingwave_py_spark.catalog import clear_stale_location

        clear_stale_location(spark, tbl)
        make_rows(corpus_ids).write.saveAsTable(tbl)
        return
    t = tomb_name(tbl)
    live_ids = live_index(spark, tbl, id_col).select(id_col).distinct()
    gone = live_ids.join(corpus_ids, id_col, "left_anti")
    if not gone.isEmpty():
        if spark.catalog.tableExists(t):
            gone.write.mode("append").saveAsTable(t)
        else:
            from risingwave_py_spark.catalog import clear_stale_location

            clear_stale_location(spark, t)
            gone.write.saveAsTable(t)
        spark.catalog.refreshTable(t)
    new_ids = corpus_ids.join(live_ids, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    has_new = not new_ids.isEmpty()
    if spark.catalog.tableExists(t):
        tomb = spark.table(t)
        reinserted = has_new and not tomb.join(
            new_ids, id_col, "left_semi"
        ).isEmpty()
        over_budget = tomb.count() > COMPACT_FRACTION * max(
            spark.table(tbl).count(), 1
        )
        if reinserted or over_budget:
            _compact(spark, tbl, id_col)
    if has_new:
        make_rows(new_ids).write.mode("append").saveAsTable(tbl)
        spark.catalog.refreshTable(tbl)


def drop_stored_index(spark: SparkSession, tbl: str) -> None:
    """Remove an index table and its tombstones (scenario hygiene)."""
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {tomb_name(tbl)}")
