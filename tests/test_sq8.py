"""SQ8-quantized posting lists (functions/vectors.py SQ8 section).

The driver gate checks probe/build/recall/dml values against the
from-scratch DuckDB quantization; these tests pin the two properties
the oracle can't express: the mathematical reconstruction bound of
round-half-up scalar quantization, and that the quantized index is
actually SMALLER on disk than the float one (the reason it exists).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from risingwave_py_spark import registry
from risingwave_py_spark.functions import vectors as V
from risingwave_py_spark.functions.index_store import live_index

registry.load_all()


def _table_bytes(spark, fq: str) -> int:
    loc = (
        spark.sql(f"DESC FORMATTED {fq}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    ).removeprefix("file:")
    total = 0
    for root, _dirs, files in os.walk(loc):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def test_sq8_reconstruction_error_within_half_step(spark, sf_dir):
    """round-half-up quantization guarantees |x - q*scale| <= scale/2
    per dimension; any violation means the stored codes don't encode
    the vectors they claim to."""
    tbl = V._ensure_sq8_index(spark, sf_dir)
    idx = live_index(spark, tbl, "vec_id")
    emb = (
        V.table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .join(idx.select("vec_id", "q", "qscale"), "vec_id")
    )
    worst = emb.select(
        F.expr(
            "max(aggregate(zip_with(embedding, q, (x, v) -> "
            "abs(CAST(x AS DOUBLE) - CAST(v AS DOUBLE) * qscale) / qscale), "
            "CAST(0.0 AS DOUBLE), (acc, e) -> greatest(acc, e)))"
        ).alias("worst_ratio")
    ).collect()[0]["worst_ratio"]
    assert worst <= 0.5 + 1e-9, worst


def test_sq8_index_is_smaller_than_float_index(spark, sf_dir):
    """The point of the compression: the SQ8 posting lists must be
    materially smaller on disk than the float posting lists over the
    same corpus (parquet bit-packs the small ints; in memory the int8
    codes are 4x smaller than float32)."""
    f_tbl = V._ensure_ivf_index(spark, sf_dir)
    q_tbl = V._ensure_sq8_index(spark, sf_dir)
    fb, qb = _table_bytes(spark, f_tbl), _table_bytes(spark, q_tbl)
    assert qb < 0.8 * fb, (qb, fb)


def test_sq8_probe_matches_float_probe_mostly(spark, sf_dir):
    """Quantization is lossy but must stay CLOSE: over the probe
    queries, at least half of each top-10 must agree with the float
    probe's top-10 (at sf0.001/0.01 the measured overlap is far
    higher; this floor just catches a broken quantized ranking)."""
    fl = {
        (r["query_id"], r["vec_id"])
        for r in V._ivf_probe_topk(spark, sf_dir).collect()
    }
    qz = {
        (r["query_id"], r["vec_id"])
        for r in V._sq8_probe_topk(spark, sf_dir).collect()
    }
    qids = {q for q, _ in fl}
    for qid in qids:
        f_hits = {v for q, v in fl if q == qid}
        q_hits = {v for q, v in qz if q == qid}
        assert len(f_hits & q_hits) >= len(f_hits) // 2, (
            qid, sorted(f_hits), sorted(q_hits)
        )
