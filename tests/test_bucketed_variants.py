"""Bucketed-layout twins of the fact-heavy TPC-H shapes.

The `<q>_bucketed` queries assert their own scale property in-line
(no shuffle on the order key, bucketed scans, <=1 small-group shuffle)
— these tests pin the parts the in-query assertion can't: result
equivalence with the plain-parquet twin, and build idempotency.
"""

from __future__ import annotations

import os

import pytest
# Long-running sweep: excluded from the default fast lane (pyproject addopts
# -m "not slow"); the full suite runs it via -m "slow or not slow".
pytestmark = pytest.mark.slow


from risingwave_py_spark import registry
from risingwave_py_spark.operators import bucketed as bk

registry.load_all()

PAIRS = [
    ("q18_bucketed", "q18_large_volume_customer"),
    ("q3_bucketed", "q3_shipping_priority"),
    ("q9_bucketed", "q9_profit_by_nation"),
    ("q10_bucketed", "q10_returned_items"),
    ("q5_bucketed", "q5_local_supplier_volume"),
    ("q7_bucketed", "q7_volume_shipping"),
]


def _canon(df):
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return sorted(map(tuple, pdf.astype(str).values.tolist()))


@pytest.mark.parametrize("variant,plain", PAIRS)
def test_bucketed_twin_matches_plain(spark, sf_dir, variant, plain):
    """Same SQL over the bucketed layout must produce the exact rows
    of the plain-parquet twin (both also carry the same DuckDB oracle
    through the driver gate)."""
    assert _canon(registry.QUERIES[variant](spark, sf_dir)) == _canon(
        registry.QUERIES[plain](spark, sf_dir)
    )


def test_build_is_idempotent(spark, sf_dir):
    """A second ensure call must reuse the existing bucketed copy (the
    per-query hot path pays a dict lookup, not a rebuild) — and a
    fresh-session lookup must accept an on-disk copy via the marker."""
    db = bk._ensure_bucketed(spark, sf_dir)
    li = spark.table(f"{db}.lineitem")
    n = li.count()
    assert bk._ensure_bucketed(spark, sf_dir) == db
    assert spark.table(f"{db}.lineitem").count() == n  # no double-append
    # cold-cache path: marker short-circuits the rebuild
    bk._READY.clear()
    assert bk._ensure_bucketed(spark, sf_dir) == db
    assert spark.table(f"{db}.lineitem").count() == n


def test_fresh_process_adopts_on_disk_copy(spark, sf_dir, tmp_path):
    """A brand-new PROCESS (fresh in-memory catalog, same warehouse)
    must ADOPT the surviving on-disk bucketed copy — external tables
    over the existing bucket files — instead of deleting + rebuilding
    it, which breaks any concurrent reader's cached file listings
    (observed: FAILED_READ_FILE.FILE_NOT_EXIST in a parallel session).
    The adopted scans must still be bucketed (the in-query assertion
    runs inside q3_bucketed) and produce the plain twin's rows."""
    import subprocess
    import sys

    db = bk._ensure_bucketed(spark, sf_dir)
    li_dir = os.path.join(bk._warehouse_dir(spark), f"{db}.db", "lineitem")
    before = sorted(os.listdir(li_dir))

    script = tmp_path / "adopt_probe.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from risingwave_py_spark.session import build_session\n"
        "from risingwave_py_spark import registry\n"
        "from risingwave_py_spark.operators import bucketed as bk\n"
        "registry.load_all()\n"
        "spark = build_session('adopt-probe', shuffle_partitions=8)\n"
        f"sf = {sf_dir!r}\n"
        "import os\n"
        "db = bk.bucketed_db_name(sf)\n"
        "li = os.path.join(bk._warehouse_dir(spark), db + '.db', 'lineitem')\n"
        "before = sorted(os.listdir(li))\n"
        "rows = registry.QUERIES['q3_bucketed'](spark, sf).collect()\n"
        "after = sorted(os.listdir(li))\n"
        "assert before == after, 'fresh process rebuilt instead of adopting'\n"
        "print('ADOPTED', len(rows))\n"
    )
    out = subprocess.run(
        [sys.executable, str(script)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=600,
    )
    assert "ADOPTED" in out.stdout, out.stdout + out.stderr
    assert sorted(os.listdir(li_dir)) == before  # our copy untouched
