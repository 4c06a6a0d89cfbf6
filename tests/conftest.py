from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("RW_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from risingwave_py_spark.session import build_session

    s = build_session("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def rw(spark):
    from risingwave_py_spark import RisingWave

    return RisingWave(spark=spark)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
