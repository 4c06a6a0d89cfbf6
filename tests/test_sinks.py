"""External file sinks (CREATE SINK, SURVEY.md §2.1 connectors).

The reference reaches CREATE SINK through SQL pass-through
(/root/reference/risingwave/core.py:161-181); our engine forwards a
relation's changelog to files incrementally on FLUSH — append-only
(data rows, Insert ops only) or changelog mode (op + rw_timestamp).
"""

from __future__ import annotations

import uuid

import pandas as pd
import pytest


def _name() -> str:
    return f"snk_{uuid.uuid4().hex[:8]}"


def test_sink_append_only_snapshot_and_incremental(rw, spark, tmp_path):
    out = str(tmp_path / "out_pq")
    t, s = _name(), _name()
    rw.insert(pd.DataFrame({"k": [1, 2]}), table_name=t, force_flush=True)
    rw.execute(
        f"CREATE SINK {s} FROM {t} WITH (connector='filesystem', path='{out}', format='parquet')"
    )
    # snapshot written at creation
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [1, 2]
    rw.insert(pd.DataFrame({"k": [3]}), table_name=t, force_flush=True)
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [1, 2, 3]
    # flush with no new epochs must not duplicate rows
    rw.execute("FLUSH")
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [1, 2, 3]
    rw.execute(f"DROP SINK {s}")


def test_sink_changelog_mode_over_mv(rw, spark, tmp_path):
    out = str(tmp_path / "out_cl")
    t, m, s = _name(), _name(), _name()
    rw.insert(pd.DataFrame({"p": ["x"], "v": [1.0]}), table_name=t, force_flush=True)
    rw.execute(f"CREATE MATERIALIZED VIEW {m} AS SELECT p, sum(v) AS total FROM {t} GROUP BY p")
    rw.execute(
        f"CREATE SINK {s} FROM {m} WITH (connector='filesystem', path='{out}', "
        f"format='parquet', type='changelog')"
    )
    rw.insert(pd.DataFrame({"p": ["x"], "v": [9.0]}), table_name=t, force_flush=True)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"p", "total", "op", "rw_timestamp"}
    ops = sorted((r.op, r.total) for r in got.collect())
    assert ("Insert", 1.0) in ops  # creation snapshot
    assert ("UpdateDelete", 1.0) in ops and ("UpdateInsert", 10.0) in ops
    rw.execute(f"DROP SINK {s}")


def test_sink_as_select_owns_hidden_mv(rw, spark, tmp_path):
    out = str(tmp_path / "out_as")
    t, s = _name(), _name()
    rw.insert(pd.DataFrame({"p": ["a", "b"], "v": [1.0, 2.0]}), table_name=t, force_flush=True)
    rw.execute(
        f"CREATE SINK {s} AS SELECT p, sum(v) AS total FROM {t} GROUP BY p "
        f"WITH (connector='filesystem', path='{out}', format='json', type='append-only')"
    )
    got = spark.read.json(out)
    assert sorted((r.p, r.total) for r in got.collect()) == [("a", 1.0), ("b", 2.0)]
    hidden = [x for x in rw.engine.mvs if "__rw_sinkmv__" in x]
    assert len(hidden) == 1
    rw.execute(f"DROP SINK {s}")
    assert not [x for x in rw.engine.mvs if "__rw_sinkmv__" in x]
    # sink output files stay after drop
    assert sorted((r.p, r.total) for r in spark.read.json(out).collect()) == [
        ("a", 1.0),
        ("b", 2.0),
    ]


def test_sink_snapshot_false_and_errors(rw, spark, tmp_path):
    out = str(tmp_path / "out_nosnap")
    t, s = _name(), _name()
    rw.insert(pd.DataFrame({"k": [1, 2]}), table_name=t, force_flush=True)
    rw.execute(
        f"CREATE SINK IF NOT EXISTS {s} FROM {t} WITH (connector='filesystem', "
        f"path='{out}', format='parquet', snapshot='false')"
    )
    rw.execute(f"CREATE SINK IF NOT EXISTS {s} FROM {t} WITH (connector='filesystem', "
               f"path='{out}', format='parquet')")  # idempotent, no second snapshot
    rw.insert(pd.DataFrame({"k": [3]}), table_name=t, force_flush=True)
    # pre-existing rows skipped, only the post-create epoch arrives
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [3]
    with pytest.raises(RuntimeError, match="unsupported sink connector"):
        rw.engine.create_sink(_name(), {"connector": "jdbc", "path": "x"}, from_rel=t)
    with pytest.raises(RuntimeError, match="unsupported sink type"):
        rw.engine.create_sink(
            _name(), {"path": str(tmp_path / "y"), "type": "upsert-kafka"}, from_rel=t
        )
    with pytest.raises(RuntimeError, match="does not exist"):
        rw.engine.create_sink(_name(), {"path": str(tmp_path / "z")}, from_rel="no_such_rel")
    rw.execute(f"DROP SINK {s}")


def test_create_sink_kafka_capability_check(rw):
    """connector='kafka' maps to the batch kafka writer; missing
    required properties fail first, and without the kafka package on
    the classpath the zero-row probe write fails the CREATE itself."""
    import pytest

    with pytest.raises(RuntimeError, match="bootstrap"):
        rw.engine.create_sink("k_sink", {"connector": "kafka", "topic": "t"})
    with pytest.raises(Exception, match="(?i)kafka"):
        rw.engine.create_sink(
            "k_sink",
            {"connector": "kafka", "topic": "t",
             "properties.bootstrap.server": "localhost:9092"},
        )
    assert "public.k_sink" not in rw.engine.sinks
