"""Registry wiring operator implementations to the driver contract.

Every implemented operator registers:
  - a callable (spark, sf_dir) -> DataFrame   (the Spark-first impl)
  - optionally an oracle SQL string DuckDB can run on the same parquet
    tables (views: region nation customer supplier part orders
    lineitem events documents embeddings).

`__spark_entry__.py` re-exports QUERIES/ORACLES to the driver.

Determinism rules (both sides MUST follow):
  - alias every computed column identically in Spark and SQL;
  - money/discount sums go through DECIMAL(18,2) then CAST AS DOUBLE
    (bit-exact across engines — float association order never leaks);
  - any LIMIT/top-k has a total deterministic ORDER BY (ties broken
    by a key column);
  - float expressions that can't be made decimal-exact are ROUND()ed
    to 6 places (error budget ~1e-14 « 1e-6).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from risingwave_py_spark.operators import relational, time_windows, analytic, tpch_extra  # noqa: F401
    from risingwave_py_spark.functions import dedup, vectors, text, multimodal, sampling  # noqa: F401
    from risingwave_py_spark.streaming import demo_queries  # noqa: F401
