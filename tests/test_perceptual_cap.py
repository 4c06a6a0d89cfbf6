"""Hot-bucket frequency caps on the perceptual candidate joins.

The image band join and the video keyframe-hash join are O(n ·
colliding bucket); a degenerate family (constant images, black
keyframes) makes one bucket quadratic. These tests pin (a) that the
fixture really contains buckets at/over the caps at the driver's
correctness SF — so the oracle gate exercises the guard, it isn't
decorative — and (b) that after the guard no candidate bucket reaches
the cap and the candidate space actually shrinks.
"""

from __future__ import annotations

import collections

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from risingwave_py_spark.functions.multimodal import (
    AHASH_BANDS,
    AHASH_MAX_DF,
    AHASH_SIDE,
    VHASH_MAX_DF,
    VID1_MAX_FRAMES,
    VID1_STEP,
    _ahash_bands_df,
    _ahash_fp,
    _vhash_fp,
    decode_raw1,
    decode_vid1,
    encode_raw1,
    encode_vid1,
    resize_nearest,
)

DRIVER_SF = "/root/testdata/sf0.01"  # the driver's correctness scale


def _doc_ids():
    return pq.read_table(
        f"{DRIVER_SF}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_pylist()


def test_fixture_has_hot_buckets_at_driver_sf():
    """Closed-form (numpy) recount: the sf0.01 corpus must contain an
    image band bucket with df >= AHASH_MAX_DF and a keyframe hash with
    df >= VHASH_MAX_DF — if a fixture regeneration ever removes the
    degenerate families, the caps become untested and this fails."""
    shifts = np.arange(16, dtype=np.int64)
    band_df: collections.Counter = collections.Counter()
    fpv_df: collections.Counter = collections.Counter()
    for d in _doc_ids():
        arr = decode_raw1(encode_raw1(int(d)))
        flat = resize_nearest(
            arr.astype(np.int64).sum(axis=2), AHASH_SIDE, AHASH_SIDE
        ).flatten()
        bits = (flat * 64 >= flat.sum()).astype(np.int64)
        for k in range(AHASH_BANDS):
            band_df[(k, int((bits[k * 16:(k + 1) * 16] << shifts).sum()))] += 1
        clip = decode_vid1(encode_vid1(int(d)))
        seen = set()
        for j, f in enumerate(range(0, clip.shape[0], VID1_STEP)):
            if j >= VID1_MAX_FRAMES:
                break
            fl = resize_nearest(
                clip[f].astype(np.int64).sum(axis=2), AHASH_SIDE, AHASH_SIDE
            ).flatten()
            b = (fl * 64 >= fl.sum()).astype(np.int64)
            fpv = "_".join(
                str(int((b[k * 16:(k + 1) * 16] << shifts).sum()))
                for k in range(AHASH_BANDS)
            )
            if fpv not in seen:
                seen.add(fpv)
                fpv_df[fpv] += 1
    assert max(band_df.values()) >= AHASH_MAX_DF
    assert max(fpv_df.values()) >= VHASH_MAX_DF


def test_capped_candidate_buckets_bounded(spark):
    """After the guard, every surviving candidate bucket is < cap (the
    join is O(n · cap), never quadratic) and the guard removes rows at
    the driver SF (cap active, not vacuous)."""
    docs = spark.read.parquet(f"{DRIVER_SF}/documents.parquet").select(
        "doc_id"
    ).repartition(8)
    bands = _ahash_bands_df(_ahash_fp(docs).localCheckpoint(eager=True))
    df_per_bucket = bands.groupBy("band_id", "val").count()
    hot = df_per_bucket.filter(F.col("count") >= AHASH_MAX_DF)
    assert hot.count() > 0  # fixture exercises the image cap
    kept = bands.join(hot.select("band_id", "val"), ["band_id", "val"],
                      "left_anti")
    assert kept.count() < bands.count()
    assert (
        kept.groupBy("band_id", "val").count()
        .agg(F.max("count")).first()[0] < AHASH_MAX_DF
    )

    bags = _vhash_fp(docs).select("doc_id", "fpv").distinct() \
        .localCheckpoint(eager=True)
    vdf = bags.groupBy("fpv").count()
    vhot = vdf.filter(F.col("count") >= VHASH_MAX_DF)
    assert vhot.count() > 0  # fixture exercises the video cap
    vkept = bags.join(vhot.select("fpv"), ["fpv"], "left_anti")
    assert vkept.count() < bags.count()
    assert (
        vkept.groupBy("fpv").count().agg(F.max("count")).first()[0]
        < VHASH_MAX_DF
    )
