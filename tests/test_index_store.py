"""Tombstone-aware stored-index maintenance (functions/index_store.py).

The reference's subscription contract delivers Insert / Delete /
UpdateDelete / UpdateInsert ops (/root/reference/risingwave/core.py:551
op-column contract, demo.py:50); the stored dedup/ANN indexes must
honor retractions, not just appends. These tests pin the store's
semantics directly; the registered queries ann_index_dml /
dedup_index_dml / index_maintenance_scenario pin the end-to-end forms
against the DuckDB oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from risingwave_py_spark.functions import index_store as ixs


def _corpus(spark, ids):
    return spark.createDataFrame([(i, i * 10) for i in ids], "id bigint, v bigint")


def _mk(corpus):
    def make_rows(new_ids):
        return corpus.join(new_ids, "id", "left_semi").withColumn(
            "payload", F.col("v") + 1
        )

    return make_rows


@pytest.fixture
def tbl(spark):
    name = "default.__ixstore_test__"
    ixs.drop_stored_index(spark, name)
    yield name
    ixs.drop_stored_index(spark, name)


def _live_ids(spark, tbl):
    return sorted(
        r["id"] for r in ixs.live_index(spark, tbl, "id").select("id").collect()
    )


def test_insert_then_delete_tombstones(spark, tbl):
    c1 = _corpus(spark, range(10))
    ixs.refresh_stored_index(spark, tbl, c1.select("id"), "id", _mk(c1))
    assert _live_ids(spark, tbl) == list(range(10))
    # privacy deletion: ids 3..4 leave the corpus (under the
    # COMPACT_FRACTION budget, so no physical rewrite happens)
    c2 = c1.filter(~F.col("id").between(3, 4))
    ixs.refresh_stored_index(spark, tbl, c2.select("id"), "id", _mk(c2))
    assert _live_ids(spark, tbl) == [0, 1, 2, 5, 6, 7, 8, 9]
    # tombstoned, not rewritten: physical table still has the dead rows
    assert spark.table(tbl).count() == 10
    assert spark.table(ixs.tomb_name(tbl)).count() == 2


def test_refresh_is_idempotent(spark, tbl):
    c1 = _corpus(spark, range(6))
    c2 = c1.filter(F.col("id") != 4)
    for corpus in (c1, c2, c2):  # re-applying the same corpus is a no-op
        ixs.refresh_stored_index(
            spark, tbl, corpus.select("id"), "id", _mk(corpus)
        )
    assert _live_ids(spark, tbl) == [0, 1, 2, 3, 5]
    live = ixs.live_index(spark, tbl, "id")
    assert live.groupBy("id").count().filter("count > 1").isEmpty()


def test_reinsert_compacts_and_resurfaces(spark, tbl):
    c1 = _corpus(spark, range(8))
    ixs.refresh_stored_index(spark, tbl, c1.select("id"), "id", _mk(c1))
    c2 = c1.filter(F.col("id") != 2)
    ixs.refresh_stored_index(spark, tbl, c2.select("id"), "id", _mk(c2))
    assert 2 not in _live_ids(spark, tbl)
    # id 2 comes back: the id-keyed tombstone must not hide the new row
    ixs.refresh_stored_index(spark, tbl, c1.select("id"), "id", _mk(c1))
    assert _live_ids(spark, tbl) == list(range(8))
    # compaction dropped the tombstone table and the dead physical row
    assert not spark.catalog.tableExists(ixs.tomb_name(tbl))
    assert spark.table(tbl).count() == 8


def test_tombstone_growth_triggers_compaction(spark, tbl):
    c1 = _corpus(spark, range(20))
    ixs.refresh_stored_index(spark, tbl, c1.select("id"), "id", _mk(c1))
    # delete 6/20 = 30% > COMPACT_FRACTION: the refresh that pushes
    # tombstones over budget compacts in the same pass, bounding the
    # reader-side anti-join forever
    c2 = c1.filter(F.col("id") >= 6)
    ixs.refresh_stored_index(spark, tbl, c2.select("id"), "id", _mk(c2))
    assert _live_ids(spark, tbl) == list(range(6, 20))
    assert spark.table(tbl).count() == 14
    assert not spark.catalog.tableExists(ixs.tomb_name(tbl))


def test_make_rows_sees_only_new_batch(spark, tbl):
    """The expensive pass (shingling / centroid assignment) must run
    over exactly the new ids — O(batch), never the indexed corpus."""
    seen: list[list[int]] = []

    def spy(corpus):
        inner = _mk(corpus)

        def make_rows(new_ids):
            seen.append(sorted(r["id"] for r in new_ids.collect()))
            return inner(new_ids)

        return make_rows

    c1 = _corpus(spark, range(5))
    ixs.refresh_stored_index(spark, tbl, c1.select("id"), "id", spy(c1))
    c2 = _corpus(spark, range(7))
    ixs.refresh_stored_index(spark, tbl, c2.select("id"), "id", spy(c2))
    assert seen == [[0, 1, 2, 3, 4], [5, 6]]


# --- property: random corpus evolutions vs a dict model ---------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Each step is the corpus's live id-set after that refresh: subsets of
# a small universe so deletes, re-inserts, and no-ops all occur.
_id_sets = st.lists(
    st.sets(st.integers(min_value=0, max_value=11), min_size=1, max_size=12),
    min_size=2,
    max_size=5,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(steps=_id_sets)
def test_store_matches_set_model_under_random_evolution(spark, steps):
    """Whatever interleaving of deletes / inserts / re-inserts /
    no-ops the corpus goes through, the live index equals the current
    corpus exactly — one row per id, correct payload — and tombstones
    never exceed the compaction budget after a refresh observes them."""
    name = "default.__ixstore_prop__"
    ixs.drop_stored_index(spark, name)
    try:
        for ids in steps:
            corpus = _corpus(spark, sorted(ids))
            ixs.refresh_stored_index(
                spark, name, corpus.select("id"), "id", _mk(corpus)
            )
            live = ixs.live_index(spark, name, "id")
            rows = {(r["id"], r["payload"]) for r in live.collect()}
            assert rows == {(i, i * 10 + 1) for i in ids}
        tname = ixs.tomb_name(name)
        if spark.catalog.tableExists(tname):
            n_tomb = spark.table(tname).count()
            n_idx = spark.table(name).count()
            assert n_tomb <= ixs.COMPACT_FRACTION * n_idx + 1
    finally:
        ixs.drop_stored_index(spark, name)
