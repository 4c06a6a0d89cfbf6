"""Round-11 epoch manifest (engine._changelog_epochs): the per-flush
replacement for SHOW PARTITIONS. Correctness surface: the in-memory
set must never go stale — in-process commits update it directly,
FOREIGN-engine commits must be detected through the on-disk commit
marker (one os.stat per use), and vacuum rewrites must force a
re-list."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture()
def fresh(spark):
    import shutil

    from risingwave_py_spark.core import RisingWaveConnection
    from risingwave_py_spark.engine import SparkEngine

    spark.sql("DROP DATABASE IF EXISTS mant CASCADE")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(f"{wh.removeprefix('file:')}/mant.db", ignore_errors=True)
    eng = SparkEngine(spark=spark, default_schema="mant")
    return RisingWaveConnection(eng), eng


def test_manifest_tracks_in_process_commits(fresh):
    conn, eng = fresh
    conn.execute("CREATE TABLE mant.t (p STRING, v BIGINT)")
    conn.insert(pd.DataFrame({"p": ["a"], "v": [1]}),
                table_name="t", schema_name="mant", force_flush=True)
    cl = eng.changelog_name("mant.t")
    eps1 = set(eng._changelog_epochs(cl))  # copy: the cache set is live
    assert eps1 and max(eps1) == eng._changelog_max_epoch(cl)
    assert set(eng._changelog_epochs(cl)) == eps1
    conn.insert(pd.DataFrame({"p": ["b"], "v": [2]}),
                table_name="t", schema_name="mant", force_flush=True)
    eps2 = set(eng._changelog_epochs(cl))
    assert max(eps2) > max(eps1), "own commit must appear without a re-list"


def test_manifest_sees_foreign_engine_commits(spark, fresh):
    """A SECOND engine over the same warehouse commits epochs; the
    first engine's manifest must pick them up via the marker bump —
    this is the cross-process staleness hazard the commit marker
    exists for."""
    from risingwave_py_spark.core import RisingWaveConnection
    from risingwave_py_spark.engine import SparkEngine

    conn, eng = fresh
    conn.execute("CREATE TABLE mant.t (p STRING, v BIGINT)")
    conn.insert(pd.DataFrame({"p": ["a"], "v": [1]}),
                table_name="t", schema_name="mant", force_flush=True)
    cl = eng.changelog_name("mant.t")
    m0 = eng._changelog_max_epoch(cl)  # hydrates eng's manifest

    eng2 = SparkEngine(spark=spark, default_schema="mant")
    conn2 = RisingWaveConnection(eng2)
    conn2.insert(pd.DataFrame({"p": ["z"], "v": [9]}),
                 table_name="t", schema_name="mant", force_flush=True)
    m2 = eng2._changelog_max_epoch(cl)
    assert m2 > m0
    # eng's cached manifest is stale in memory — the marker stat must
    # force a re-list and surface eng2's epoch
    assert eng._changelog_max_epoch(cl) == m2


def test_manifest_survives_vacuum_rewrite(fresh):
    """Vacuum rewrites the changelog into a new directory; the
    manifest must re-list (truncated epochs leave the set) instead of
    serving the pre-vacuum epochs."""
    import time as _t

    conn, eng = fresh
    conn.execute("CREATE TABLE mant.t (p STRING, v BIGINT)")
    for i in range(4):
        conn.insert(pd.DataFrame({"p": ["a"], "v": [i]}),
                    table_name="t", schema_name="mant", force_flush=True)
    conn.execute(
        "CREATE SUBSCRIPTION mant.s FROM mant.t WITH (retention = '1s')"
    )
    cl = eng.changelog_name("mant.t")
    before = set(eng._changelog_epochs(cl))  # copy
    assert len(before) >= 4
    _t.sleep(1.2)
    # a new epoch younger than the cutoff keeps the changelog alive
    conn.insert(pd.DataFrame({"p": ["b"], "v": [99]}),
                table_name="t", schema_name="mant", force_flush=True)
    eng.vacuum_changelogs()
    after = set(eng._changelog_epochs(cl))
    assert after and after < before | after
    assert min(after) > min(before), "expired epochs must leave the manifest"
    assert max(after) == eng._changelog_max_epoch(cl)
