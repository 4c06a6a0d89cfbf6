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
        rw.engine.create_source(_name(), {"connector": "pubsub", "path": "x"})
    with pytest.raises(RuntimeError, match="requires a path"):
        rw.engine.create_source(_name(), {"connector": "filesystem"})
    rw.execute(f"DROP SOURCE {s}")


def test_create_source_datagen_streams_into_table(rw):
    """Streaming-class CREATE SOURCE: the datagen connector (RisingWave
    parity; Spark `rate` source) lands micro-batches into the backing
    table through ordinary engine epochs, so a subscription sees the
    rows as Insert ops — same contract as the PushSource bridge."""
    import time

    s = "dg_src"
    rw.execute(
        f"CREATE SOURCE {s} WITH (connector='datagen', "
        f"rows.per.second='50', trigger.interval='250 milliseconds')"
    )
    rw.execute(f"CREATE SUBSCRIPTION {s}_sub FROM {s} WITH (retention='86400s')")
    eng = rw.engine
    eng.declare_cursor(f"{s}_cur", f"{s}_sub", since=0)
    deadline = time.time() + 30
    n = 0
    while time.time() < deadline:
        rw.execute("FLUSH")
        n = rw.fetch(f"SELECT count(*) FROM {s}")[0][0]
        if n >= 10:
            break
        time.sleep(0.3)
    assert n >= 10, f"stream produced only {n} rows"
    cols, rows = eng.fetch_cursor(f"{s}_cur", 1000)
    assert rows and all(r[cols.index("op")] == "Insert" for r in rows)
    rw.execute(f"DROP SUBSCRIPTION {s}_sub")
    rw.execute(f"DROP SOURCE {s}")
    assert eng.sources.get(f"public.{s}") is None


def test_create_source_kafka_capability_check(rw):
    """connector='kafka' maps to readStream.format('kafka'); without
    the kafka connector jar on the classpath the DDL itself fails with
    Spark's DATA_SOURCE_NOT_FOUND (checked at CREATE SOURCE time, not
    first read), and missing bootstrap servers is caught before that."""
    import pytest

    with pytest.raises(RuntimeError, match="bootstrap"):
        rw.engine.create_source("k_src", {"connector": "kafka", "topic": "t"})
    with pytest.raises(Exception, match="(?i)kafka"):
        rw.engine.create_source(
            "k_src",
            {
                "connector": "kafka",
                "topic": "t",
                "properties.bootstrap.server": "localhost:9092",
            },
        )
    assert rw.engine.sources.get("public.k_src") is None


def test_show_create_source(rw, tmp_path):
    path = tmp_path / "scsrc"
    path.mkdir()
    (path / "p.csv").write_text("k,v\n1,a\n")
    s = _name()
    rw.execute(
        f"CREATE SOURCE {s} WITH (connector='filesystem', path='{path}', "
        f"format='csv', header='true', inferSchema='true')"
    )
    rows = rw.fetch(f"SHOW CREATE SOURCE {s}")
    assert rows[0][0] == f"public.{s}"
    ddl = rows[0][1]
    assert ddl.startswith(f"CREATE SOURCE public.{s} WITH (")
    assert "connector = 'filesystem'" in ddl and "format = 'csv'" in ddl
    rw.execute(f"DROP SOURCE {s}")


def test_create_source_s3_with_path_override(rw, tmp_path, spark):
    """s3-connector sources are Spark file sources over an object-store
    URI: RisingWave's s3.* WITH-properties map to fs.s3a.* Hadoop conf,
    and an explicit `path` override (any Hadoop FS scheme) exercises
    the identical format machinery locally."""
    path = tmp_path / "s3src"
    path.mkdir()
    pd.DataFrame({"k": [1, 2], "v": ["x", "y"]}).to_parquet(path / "p.parquet")
    s = _name()
    rw.execute(
        f"CREATE SOURCE {s} WITH (connector='s3', "
        f"s3.region_name='us-east-1', s3.bucket_name='ignored-by-override', "
        f"path='{path}', format='parquet')"
    )
    assert sorted(rw.fetch(f"SELECT k, v FROM {s}")) == [(1, "x"), (2, "y")]
    # the region property reached the Hadoop conf, SCOPED to the bucket
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    scoped = "fs.s3a.bucket.ignored-by-override.endpoint.region"
    assert hc.get(scoped) == "us-east-1"
    rw.execute(f"DROP SOURCE {s}")
    assert hc.get(scoped) is None, "DROP SOURCE must release its conf keys"


def test_two_s3_sources_with_different_credentials_coexist(rw, tmp_path, spark):
    """Credentials are scoped per bucket (fs.s3a.bucket.<bucket>.*):
    a second s3 source with different credentials must not clobber the
    first's (previously both wrote session-global fs.s3a.* — last DDL
    won for every read), a conflicting source on the SAME bucket is
    rejected, and DROP SOURCE releases only its own keys."""
    import pytest

    hc = spark.sparkContext._jsc.hadoopConfiguration()
    dirs = []
    for i in (1, 2):
        d = tmp_path / f"s3src{i}"
        d.mkdir()
        pd.DataFrame({"k": [i]}).to_parquet(d / "p.parquet")
        dirs.append(d)
    s1, s2 = _name(), _name()
    rw.execute(
        f"CREATE SOURCE {s1} WITH (connector='s3', s3.bucket_name='bkt-a', "
        f"s3.credentials.access='AK1', s3.credentials.secret='SK1', "
        f"path='{dirs[0]}', format='parquet')"
    )
    rw.execute(
        f"CREATE SOURCE {s2} WITH (connector='s3', s3.bucket_name='bkt-b', "
        f"s3.credentials.access='AK2', s3.credentials.secret='SK2', "
        f"path='{dirs[1]}', format='parquet')"
    )
    # both remain readable, and each bucket keeps ITS OWN credentials
    assert rw.fetch(f"SELECT k FROM {s1}") == [(1,)]
    assert rw.fetch(f"SELECT k FROM {s2}") == [(2,)]
    assert hc.get("fs.s3a.bucket.bkt-a.access.key") == "AK1"
    assert hc.get("fs.s3a.bucket.bkt-b.access.key") == "AK2"
    # a same-bucket source with CONFLICTING credentials is rejected
    with pytest.raises(Exception, match="conflicts with live source"):
        rw.execute(
            f"CREATE SOURCE {_name()} WITH (connector='s3', "
            f"s3.bucket_name='bkt-a', s3.credentials.access='EVIL', "
            f"path='{dirs[0]}', format='parquet')"
        )
    assert hc.get("fs.s3a.bucket.bkt-a.access.key") == "AK1"
    # dropping one source releases its keys and leaves the other's
    rw.execute(f"DROP SOURCE {s1}")
    assert hc.get("fs.s3a.bucket.bkt-a.access.key") is None
    assert hc.get("fs.s3a.bucket.bkt-b.access.key") == "AK2"
    rw.execute(f"DROP SOURCE {s2}")
    assert hc.get("fs.s3a.bucket.bkt-b.access.key") is None


def test_create_source_s3_requires_bucket(rw):
    import pytest

    with pytest.raises(Exception, match="s3.bucket_name"):
        rw.execute(
            f"CREATE SOURCE {_name()} WITH (connector='s3', format='parquet')"
        )
