"""UDF surface (SURVEY.md §2.9): RisingWave's embedded-Python
CREATE FUNCTION DDL mapped to Spark UDFs, plus programmatic
registration including the vectorized pandas_udf fast path.
"""

from __future__ import annotations

import pandas as pd
import pytest


def test_create_function_ddl(rw):
    rw.execute(
        "CREATE FUNCTION gcd_udf(a INT, b INT) RETURNS INT LANGUAGE python AS $$\n"
        "def gcd_udf(a, b):\n"
        "    while b:\n"
        "        a, b = b, a % b\n"
        "    return a\n"
        "$$"
    )
    assert rw.fetchone("SELECT gcd_udf(12, 18) AS g")[0] == 6
    # usable inside a real query over a table
    rw.execute("DROP TABLE IF EXISTS t_udf")
    rw.insert(data=pd.DataFrame({"a": [10, 9], "b": [4, 6]}),
              table_name="t_udf", force_flush=True)
    got = sorted(rw.fetch("SELECT gcd_udf(a, b) AS g FROM t_udf"))
    assert got == [(2,), (3,)]
    rw.execute("DROP FUNCTION gcd_udf")
    with pytest.raises(Exception):
        rw.fetch("SELECT gcd_udf(1, 2)")


def test_create_function_idempotent_and_errors(rw):
    ddl = ("CREATE FUNCTION IF NOT EXISTS twice_udf(x INT) RETURNS INT "
           "LANGUAGE python AS $$\ndef twice_udf(x):\n    return x * 2\n$$")
    rw.execute(ddl)
    rw.execute(ddl)  # IF NOT EXISTS
    assert rw.fetchone("SELECT twice_udf(21) AS x")[0] == 42
    with pytest.raises(RuntimeError, match="unsupported return type"):
        rw.engine.create_function("bad1", "GEOMETRY", "def bad1(x): return x")
    with pytest.raises(RuntimeError, match="must define a function"):
        rw.engine.create_function("bad2", "INT", "y = 1")
    rw.execute("DROP FUNCTION twice_udf")


def test_register_udf_plain_and_pandas(rw):
    rw.register_udf("rev_udf", lambda s: s[::-1], "STRING")
    assert rw.fetchone("SELECT rev_udf('abc') AS r")[0] == "cba"

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def vsquare(s: pd.Series) -> pd.Series:
        return s * s

    rw.register_udf("vsquare", vsquare)
    assert rw.fetchone("SELECT vsquare(3.0) AS x")[0] == 9.0
