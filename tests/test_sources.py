"""External file sources (CREATE SOURCE, SURVEY.md §2.1 connectors).

The reference reaches CREATE SOURCE through SQL pass-through
(/root/reference/risingwave/core.py:161-181); our engine maps the
filesystem connector to Spark external datasource tables — no copy,
full pushdown, FLUSH refreshes the file listing.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd

from risingwave_py_spark.core import OutputFormat


def _name() -> str:
    return f"src_{uuid.uuid4().hex[:8]}"


def test_create_source_csv(rw, tmp_path):
    path = tmp_path / "csvsrc"
    path.mkdir()
    (path / "part1.csv").write_text("k,v\n1,a\n2,b\n")
    s = _name()
    rw.execute(
        f"CREATE SOURCE {s} WITH (connector='filesystem', path='{path}', "
        f"format='csv', header='true', inferSchema='true')"
    )
    rows = sorted(rw.fetch(f"SELECT k, v FROM {s}"))
    assert rows == [(1, "a"), (2, "b")]
    rw.execute(f"DROP SOURCE {s}")
    # external table drop leaves the files in place
    assert (path / "part1.csv").exists()


def test_create_source_json(rw, tmp_path):
    path = tmp_path / "jsonsrc"
    path.mkdir()
    (path / "a.json").write_text('{"k": 1, "v": "x"}\n{"k": 2, "v": "y"}\n')
    s = _name()
    rw.execute(
        f"CREATE SOURCE {s} WITH (connector='filesystem', path='{path}', format='json')"
    )
    df = rw.fetch(f"SELECT k, v FROM {s} ORDER BY k", format=OutputFormat.DATAFRAME)
    assert list(df["v"]) == ["x", "y"]
    rw.execute(f"DROP SOURCE {s}")


def test_source_sees_new_files_after_flush(rw, tmp_path, spark):
    path = str(tmp_path / "pqsrc")
    spark.createDataFrame(pd.DataFrame({"k": [1]})).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    s = _name()
    rw.execute(f"CREATE SOURCE {s} WITH (connector='filesystem', path='{path}', format='parquet')")
    assert len(rw.fetch(f"SELECT * FROM {s}")) == 1
    # a file lands out-of-band; FLUSH is the visibility barrier
    spark.createDataFrame(pd.DataFrame({"k": [2]})).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    rw.execute("FLUSH")
    assert sorted(r[0] for r in rw.fetch(f"SELECT k FROM {s}")) == [1, 2]
    rw.execute(f"DROP SOURCE {s}")


def test_create_source_idempotent_and_errors(rw, tmp_path):
    path = tmp_path / "e"
    path.mkdir()
    (path / "a.json").write_text('{"k": 1}\n')
    s = _name()
    ddl = f"CREATE SOURCE IF NOT EXISTS {s} WITH (connector='filesystem', path='{path}', format='json')"
    rw.execute(ddl)
    rw.execute(ddl)  # IF NOT EXISTS: no error
    import pytest

    with pytest.raises(RuntimeError, match="unsupported source connector"):
        rw.engine.create_source(_name(), {"connector": "kafka", "path": "x"})
    with pytest.raises(RuntimeError, match="requires a path"):
        rw.engine.create_source(_name(), {"connector": "filesystem"})
    rw.execute(f"DROP SOURCE {s}")
