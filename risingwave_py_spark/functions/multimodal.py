"""Multimodal (image/audio/video) column handling.

Pattern for a 100 TB training-data pipeline: media lives as opaque
``BINARY`` payloads (or object-store URIs) beside typed metadata;
decode / feature-extraction runs as Arrow-batched Pandas UDFs via
``mapInPandas`` so bytes stream through executors without ever
concentrating on the driver.

Two tiers live here:

  * REAL pipelines over real formats: uncompressed RAW1 images, PCM1
    audio, VID1 video (genuine binary codecs — magic check, header
    unpack, buffer reshape; real resize/decimate/frame-sample numpy
    kernels), plus the ZC01 COMPRESSED container (stdlib zlib
    inflate wrapping any of the three). Closed-form synthetic
    payloads make the ENTIRE encode→compress→inflate→decode→
    featurize chain DuckDB-oracle-checked — no rows-only queries.
  * A disclosed FAKE kernel (``decode_payload``) standing in for
    lossy-format codecs (JPEG/FLAC/H.264) whose libraries
    (PIL/torchaudio/pyav) are not in this container — swap the kernel
    body, nothing else changes. Kept as the documented plug point;
    no registered query depends on it.

The fixture has no binary column, so payloads are synthesized
deterministically (from text bytes or doc_id): stable inputs →
oracle-checkable outputs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from risingwave_py_spark.catalog import fanout, table
from risingwave_py_spark.registry import register

MODALITIES = ("image", "audio", "video")

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, byte_mean double, "
    "byte_std double, feat_head string, decoder string"
)


def with_payload(df: DataFrame) -> DataFrame:
    """Attach a synthetic binary payload + modality metadata to each doc.
    (In production this column comes straight from parquet/Delta.)"""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % len(MODALITIES) + 1).cast("int"),
    )
    return df.select(
        "doc_id",
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def decode_payload(payload: bytes, modality: str) -> dict:
    """STUB DECODER (deterministic fake).

    A real implementation would dispatch on modality:
      image → PIL.Image.open(io.BytesIO(payload)) → resize → pixels
      audio → torchaudio.load → resample → frames
      video → pyav keyframe sample
    None of those libraries exist in this container, so we derive
    deterministic pseudo-features from the raw bytes. The Spark-side
    contract (signature, batching, schema) is exactly what a real
    decoder plugs into."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return {"byte_mean": 0.0, "byte_std": 0.0, "feat_head": ""}
    return {
        "byte_mean": float(arr.mean()),
        "byte_std": float(arr.std()),
        "feat_head": payload[:8].hex(),
    }


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of binary payloads
    in, flat feature rows out. Scales as a pure map — no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_payload(p, m) for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "byte_mean": [f["byte_mean"] for f in feats],
                    "byte_std": [f["byte_std"] for f in feats],
                    "feat_head": [f["feat_head"] for f in feats],
                    "decoder": "stub-v1",
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


@register(
    "multimodal_metadata",
    oracle=f"""
    SELECT doc_id,
           CASE CAST(doc_id % {len(MODALITIES)} AS INT)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads — byte length + content
    hash, all JVM-side (the cheap pre-filter before any decode)."""
    d = with_payload(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        "modality",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


# ---------------------------------------------------------------------------
# COMPRESSED-container decode ("ZC01": magic + zlib deflate stream
# wrapping a RAW1 / PCM1 / VID1 payload). This replaces the round-1/2
# rows-only stub: the decompression is REAL (stdlib zlib — the same
# inflate step a PNG/gzip codec performs), the inner codecs are the
# real parsers above, and the features have closed forms — so the
# whole compressed-decode chain is DuckDB-oracle-checked. Compressed
# SIZE is deliberately not part of the output (deflate byte output
# may vary across zlib builds; content after inflate never does).

ZC_MAGIC = b"ZC01"
ZC_IMG_RESIZE = 8     # image feature: 8×8 nearest-resize mean
ZC_AUD_DECIMATE = 16  # audio feature: 16× decimated mean
# video feature: frame 0, row y=0 (16 px × 3 ch)


def encode_container(doc_id: int) -> bytes:
    """Modality-dispatched (doc_id % 3 → image/audio/video) synthetic
    media payload, deflate-compressed inside a ZC01 container."""
    import zlib

    m = doc_id % 3
    inner = (encode_raw1, encode_pcm1, encode_vid1)[m](doc_id)
    return ZC_MAGIC + zlib.compress(inner, 6)


def decode_container(payload: bytes) -> bytes:
    """Real decompression: magic check + zlib inflate."""
    import zlib

    if payload[:4] != ZC_MAGIC:
        raise ValueError("not a ZC01 container")
    return zlib.decompress(payload[4:])


@register(
    "multimodal_decode_features",
    oracle=f"""
    WITH img AS (
        SELECT d.doc_id, CAST(9 + 32*32*3 AS BIGINT) AS raw_bytes,
               CAST(SUM((12*gx.i + 28*gy.j + 11*gc.c + d.doc_id) % 256) AS BIGINT) AS csum,
               CAST(COUNT(*) AS BIGINT) AS cn
        FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d,
             (SELECT unnest(generate_series(0, {ZC_IMG_RESIZE - 1})) AS i) gx,
             (SELECT unnest(generate_series(0, {ZC_IMG_RESIZE - 1})) AS j) gy,
             (SELECT unnest(generate_series(0, 2)) AS c) gc
        GROUP BY d.doc_id
    ), aud AS (
        SELECT d.doc_id, CAST(10 + 2*d.n AS BIGINT) AS raw_bytes,
               CAST(SUM((t.i * {ZC_AUD_DECIMATE} * d.k) % 2000 - 1000) AS BIGINT) AS csum,
               CAST(COUNT(*) AS BIGINT) AS cn
        FROM (SELECT doc_id, 2048 + (doc_id % 4) * 512 AS n, doc_id % 7 + 1 AS k
              FROM documents WHERE doc_id % 3 = 1) d,
             LATERAL (SELECT unnest(generate_series(0, d.n // {ZC_AUD_DECIMATE} - 1)) AS i) t
        GROUP BY d.doc_id, d.n
    ), vid AS (
        SELECT d.doc_id, CAST(11 + (4 + d.doc_id % 5) * 768 AS BIGINT) AS raw_bytes,
               CAST(SUM((3*gx.x + 11*gc.c + d.doc_id) % 256) AS BIGINT) AS csum,
               CAST(COUNT(*) AS BIGINT) AS cn
        FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 2) d,
             (SELECT unnest(generate_series(0, 15)) AS x) gx,
             (SELECT unnest(generate_series(0, 2)) AS c) gc
        GROUP BY d.doc_id
    ), per_doc AS (
        SELECT 'image' AS modality, raw_bytes, csum, cn FROM img
        UNION ALL SELECT 'audio', raw_bytes, csum, cn FROM aud
        UNION ALL SELECT 'video', raw_bytes, csum, cn FROM vid
    )
    SELECT modality,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(raw_bytes) AS BIGINT) AS total_raw_bytes,
           CAST(SUM(csum) AS BIGINT) AS content_sum,
           CAST(SUM(cn) AS BIGINT) AS content_n,
           round(CAST(SUM(csum) AS DOUBLE) / SUM(cn), 6) AS avg_content
    FROM per_doc GROUP BY modality ORDER BY modality
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-container decode pipeline, fully hash-checked (the
    last rows-only query through round 2): every doc's media payload
    is a zlib-deflated RAW1/PCM1/VID1 container; the kernel INFLATES
    it (real stdlib decompression — the inflate step of PNG/gzip),
    parses the inner codec, and reduces to an exact integer content
    sum per doc (image: 8×8 nearest-resize; audio: 16× decimation;
    video: frame-0 top row). Integer sums make the cross-modality
    aggregate bit-reproducible: the only float is ONE final division
    from two BIGINTs, identical in Spark and DuckDB.

    100 TB shape: one mapInPandas stage over the doc list (zero
    shuffle until the 3-group rollup); bytes never leave executors."""
    out_schema = (
        "modality string, doc_raw_bytes long, csum long, cn long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                raw = decode_container(encode_container(doc_id))
                m = doc_id % 3
                if m == 0:
                    img = decode_raw1(raw)
                    small = resize_nearest(img, ZC_IMG_RESIZE, ZC_IMG_RESIZE)
                    csum, cn = int(small.astype(np.int64).sum()), small.size
                elif m == 1:
                    s, _rate = decode_pcm1(raw)
                    dec = s[::ZC_AUD_DECIMATE].astype(np.int64)
                    csum, cn = int(dec.sum()), dec.size
                else:
                    clip = decode_vid1(raw)
                    row0 = clip[0, 0].astype(np.int64)  # (W, C)
                    csum, cn = int(row0.sum()), row0.size
                rows.append((MODALITIES[m], len(raw), csum, cn))
            yield pd.DataFrame(
                rows, columns=["modality", "doc_raw_bytes", "csum", "cn"]
            )

    d = table(spark, sf_dir, "documents").select("doc_id")
    per_doc = d.mapInPandas(run, schema=out_schema)
    agg = per_doc.groupBy("modality").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_raw_bytes").alias("total_raw_bytes"),
        F.sum("csum").alias("content_sum"),
        F.sum("cn").alias("content_n"),
    )
    return agg.select(
        "modality", "n_docs", "total_raw_bytes", "content_sum", "content_n",
        F.round(
            F.col("content_sum").cast("double") / F.col("content_n"), 6
        ).alias("avg_content"),
    ).orderBy("modality")


RESIZE_SCHEMA = (
    "doc_id long, height int, width int, n_channels int, pixels_head string"
)


def resize_images(df: DataFrame, height: int = 224, width: int = 224) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas op (1 row in →
    1 row out). STUB KERNEL: a real implementation replaces the body
    of ``kernel`` with PIL ``Image.open(...).resize((w, h))`` and
    returns the pixel buffer; here deterministic pseudo-pixels are
    derived from the payload so schema, batching, and determinism are
    testable without image libraries. Pure map — no shuffle; at 100 TB
    this runs one task per input split with Arrow transfer only."""

    def kernel(payload: bytes) -> str:
        # stand-in for the resized pixel buffer: first 8 bytes of a
        # deterministic fold of (payload, target shape)
        acc = (len(payload) * 2654435761 + height * 31 + width) % (1 << 32)
        for b in payload[:64]:
            acc = (acc * 1099511628211 + b) % (1 << 64)
        return f"{acc:016x}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["modality"] == "image"]
            yield pd.DataFrame(
                {
                    "doc_id": img["doc_id"],
                    "height": height,
                    "width": width,
                    "n_channels": 3,
                    "pixels_head": [kernel(p) for p in img["payload"]],
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, ts_s double, frame_head string"


def sample_frames(df: DataFrame, every_s: float = 1.0, max_frames: int = 4) -> DataFrame:
    """Video frame sampling as mapInPandas (1 row in → N frame rows
    out — the batch-expanding shape a real pyav keyframe sampler
    uses). STUB KERNEL: frame count derives deterministically from the
    payload length; each emitted frame carries its timestamp and a
    payload-slice digest standing in for the decoded frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["modality"] == "video"]
            out = {"doc_id": [], "frame_idx": [], "ts_s": [], "frame_head": []}
            for doc_id, payload in zip(vids["doc_id"], vids["payload"]):
                n = min(max(len(payload) // 64, 1), max_frames)
                for i in range(n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["ts_s"].append(i * every_s)
                    out["frame_head"].append(payload[i * 8 : i * 8 + 8].hex())
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image pipeline over an uncompressed raw format ("RAW1":
# magic + <u16 width><u16 height><u8 channels> + w*h*c pixel bytes —
# the same family as PPM/BMP). Unlike the disclosed fake above, every
# step here is genuine: the payload is real bytes, decode really
# parses the header and reshapes the buffer, resize is real
# nearest-neighbor sampling, and the per-channel means are computed
# from the resized pixels. The synthetic pixel function has a closed
# form, so the WHOLE pipeline is DuckDB-oracle-checked end to end —
# no rows-only concession.

import struct


def _round_half_up(x: float, nd: int) -> float:
    """SQL ROUND semantics (HALF_UP) — Python's round() is banker's
    rounding and diverges from both engines on exact ties."""
    import math

    m = 10 ** nd
    return math.floor(x * m + 0.5) / m


RAW1_MAGIC = b"RAW1"
RAW1_H = 32  # source height; width varies 32/48/64 by doc_id % 3
RESIZE_TO = 16


def encode_raw1(doc_id: int) -> bytes:
    """Synthesize a deterministic RAW1 image for a doc: pixel(y,x,c) =
    (3x + 7y + 11c + doc_id) mod 256 — real bytes with a real header."""
    import numpy as np

    w = 32 + (doc_id % 3) * 16
    h = RAW1_H
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    px = ((3 * x + 7 * y + 11 * c + doc_id) % 256).astype(np.uint8)
    return RAW1_MAGIC + struct.pack("<HHB", w, h, 3) + px.tobytes()


def decode_raw1(payload: bytes):
    """Parse a RAW1 payload into (H, W, C) uint8 — a real binary-format
    decoder (magic check, header unpack, buffer reshape)."""
    import numpy as np

    if payload[:4] != RAW1_MAGIC:
        raise ValueError("not a RAW1 payload")
    w, h, c = struct.unpack("<HHB", payload[4:9])
    arr = np.frombuffer(payload[9:], dtype=np.uint8)
    if arr.size != w * h * c:
        raise ValueError("truncated RAW1 payload")
    return arr.reshape(h, w, c)


def resize_nearest(arr, out_h: int, out_w: int):
    """Nearest-neighbor resize by index sampling (what PIL's NEAREST
    does): src row/col = floor(dst_index * src_extent / dst_extent)."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    iy = (np.arange(out_h) * h) // out_h
    ix = (np.arange(out_w) * w) // out_w
    return arr[iy][:, ix]


@register(
    "multimodal_image_pipeline",
    oracle=f"""
    WITH g AS (
        SELECT unnest(generate_series(0, {RESIZE_TO - 1})) AS i
    ), d AS (
        SELECT doc_id,
               CAST(32 + (doc_id % 3) * 16 AS BIGINT) AS w,
               CAST({RAW1_H} AS BIGINT) AS h
        FROM documents
    ), px AS (
        SELECT d.doc_id, d.w, d.h,
               (gx.i * d.w) // {RESIZE_TO} AS sx,
               (gy.i * d.h) // {RESIZE_TO} AS sy
        FROM d, g gx, g gy
    )
    SELECT doc_id, w AS width, h AS height, 3 AS channels,
           round(AVG(CAST((sx*3 + sy*7 + doc_id) % 256 AS DOUBLE)), 4) AS mean_c0,
           round(AVG(CAST((sx*3 + sy*7 + 11 + doc_id) % 256 AS DOUBLE)), 4) AS mean_c1,
           round(AVG(CAST((sx*3 + sy*7 + 22 + doc_id) % 256 AS DOUBLE)), 4) AS mean_c2
    FROM px GROUP BY doc_id, w, h
    """,
)
def multimodal_image_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → decode → resize → featurize, all real: RAW1 bytes are
    synthesized per doc, PARSED back (magic/header/reshape), resized
    16×16 nearest-neighbor, and reduced to per-channel means — the
    image-preprocessing DAG of a multimodal training pipeline, with
    the closed-form pixel function making it fully oracle-checked.

    100 TB shape: one `mapInPandas` stage — Arrow batches of binary
    in, flat feature rows out, zero shuffle; bytes never reach the
    driver. Swap encode_raw1 for a parquet binary column and
    decode_raw1 for PIL/torchvision and nothing else changes."""
    out_schema = (
        "doc_id long, width long, height long, channels int, "
        "mean_c0 double, mean_c1 double, mean_c2 double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                payload = encode_raw1(int(doc_id))
                img = decode_raw1(payload)
                h, w, c = img.shape
                small = resize_nearest(img, RESIZE_TO, RESIZE_TO)
                means = small.astype(np.float64).mean(axis=(0, 1))
                rows.append(
                    (int(doc_id), w, h, c,
                     _round_half_up(float(means[0]), 4),
                     _round_half_up(float(means[1]), 4),
                     _round_half_up(float(means[2]), 4))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels",
                         "mean_c0", "mean_c1", "mean_c2"],
            )

    d = table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# REAL audio pipeline over raw PCM ("PCM1": magic + <u32 n><u16 rate>
# + int16-LE samples — a WAV data chunk without the RIFF wrapper).
# Same contract as the image pipeline: real bytes, real header parse,
# real decimation resample, real RMS/zero-crossing features, and a
# closed-form sample function so DuckDB checks the whole chain.

PCM1_MAGIC = b"PCM1"
PCM1_RATE = 16000
PCM1_DECIMATE = 4


def _pcm1_params(doc_id: int) -> tuple[int, int]:
    """(n_samples, sawtooth step) for a doc's synthetic signal."""
    return 2048 + (doc_id % 4) * 512, doc_id % 7 + 1


def encode_pcm1(doc_id: int) -> bytes:
    """Synthesize a deterministic PCM1 clip: s[i] = ((i*k) mod 2000)
    - 1000 — an integer sawtooth with doc-dependent pitch."""
    import numpy as np

    n, k = _pcm1_params(doc_id)
    i = np.arange(n, dtype=np.int64)
    s = ((i * k) % 2000 - 1000).astype(np.int16)
    return PCM1_MAGIC + struct.pack("<IH", n, PCM1_RATE) + s.tobytes()


def decode_pcm1(payload: bytes):
    """Parse a PCM1 payload into (samples int16 array, sample_rate)."""
    import numpy as np

    if payload[:4] != PCM1_MAGIC:
        raise ValueError("not a PCM1 payload")
    n, rate = struct.unpack("<IH", payload[4:10])
    s = np.frombuffer(payload[10:], dtype="<i2")
    if s.size != n:
        raise ValueError("truncated PCM1 payload")
    return s, rate


@register(
    "multimodal_audio_pipeline",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               CAST(2048 + (doc_id % 4) * 512 AS BIGINT) AS n,
               doc_id % 7 + 1 AS k
        FROM documents
    ), dec AS (
        SELECT d.doc_id, d.n, d.k, t.i,
               ((t.i * {PCM1_DECIMATE}) * d.k) % 2000 - 1000 AS s
        FROM d, LATERAL (SELECT unnest(generate_series(0, d.n // {PCM1_DECIMATE} - 1)) AS i) t
    ), flags AS (
        SELECT doc_id, n, s,
               CASE WHEN (s >= 0) <>
                   (lead(s) OVER (PARTITION BY doc_id ORDER BY i) >= 0)
                   THEN 1.0 ELSE 0.0 END AS chg
        FROM dec
    ), feat AS (
        SELECT doc_id, n,
               CAST(COUNT(*) AS BIGINT) AS n_decimated,
               round(sqrt(AVG(CAST(s AS DOUBLE) * s)), 4) AS rms,
               round(SUM(chg) / COUNT(*), 4) AS zcr_frac
        FROM flags GROUP BY doc_id, n
    )
    SELECT doc_id, CAST({PCM1_RATE} AS INT) AS sample_rate, n AS n_samples,
           n_decimated, rms, zcr_frac,
           round(CAST(n AS DOUBLE) / {PCM1_RATE}, 6) AS duration_s
    FROM feat
    """,
)
def multimodal_audio_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → decode → decimate → featurize for audio: PCM1 bytes
    parsed back to int16 samples, decimated 4× (the cheap resample),
    then RMS and zero-crossing-rate — the standard audio-quality
    features a speech pipeline gates on. Closed-form signal ⇒ DuckDB
    verifies decode + resample + both features exactly.

    100 TB shape: one mapInPandas stage, zero shuffle."""
    out_schema = (
        "doc_id long, sample_rate int, n_samples long, n_decimated long, "
        "rms double, zcr_frac double, duration_s double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                s, rate = decode_pcm1(encode_pcm1(int(doc_id)))
                dec = s[::PCM1_DECIMATE].astype(np.float64)
                rms = float(np.sqrt((dec * dec).mean()))
                nn = (dec >= 0).astype(np.int8)
                zcr = float((nn[1:] != nn[:-1]).sum()) / dec.size
                rows.append(
                    (int(doc_id), rate, int(s.size), int(dec.size),
                     _round_half_up(rms, 4), _round_half_up(zcr, 4),
                     _round_half_up(s.size / rate, 6))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "n_decimated",
                         "rms", "zcr_frac", "duration_s"],
            )

    d = table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# REAL video pipeline ("VID1": magic + <u16 n_frames><u16 w><u16 h>
# <u8 c> + n_frames RAW frames back to back). Frame sampling — every
# 2nd frame, capped at 4 — then a per-sampled-frame mean, the
# keyframe-extraction shape of a video training pipeline. Closed-form
# pixels ⇒ the whole chain is oracle-checked.

VID1_MAGIC = b"VID1"
VID1_W = 16
VID1_H = 16
VID1_FPS = 2.0
VID1_STEP = 2
VID1_MAX_FRAMES = 4


def encode_vid1(doc_id: int) -> bytes:
    """Synthesize a deterministic VID1 clip: 4 + doc_id % 5 frames of
    16×16×3 with pixel(f,y,x,c) = (3x + 7y + 11c + 13f + doc_id) % 256."""
    import numpy as np

    nf = 4 + doc_id % 5
    x = np.arange(VID1_W, dtype=np.int64)[None, None, :, None]
    y = np.arange(VID1_H, dtype=np.int64)[None, :, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, :]
    f = np.arange(nf, dtype=np.int64)[:, None, None, None]
    px = ((3 * x + 7 * y + 11 * c + 13 * f + doc_id) % 256).astype(np.uint8)
    return VID1_MAGIC + struct.pack("<HHHB", nf, VID1_W, VID1_H, 3) + px.tobytes()


def decode_vid1(payload: bytes):
    """Parse a VID1 payload into (n_frames, H, W, C) uint8."""
    import numpy as np

    if payload[:4] != VID1_MAGIC:
        raise ValueError("not a VID1 payload")
    nf, w, h, c = struct.unpack("<HHHB", payload[4:11])
    arr = np.frombuffer(payload[11:], dtype=np.uint8)
    if arr.size != nf * w * h * c:
        raise ValueError("truncated VID1 payload")
    return arr.reshape(nf, h, w, c)


@register(
    "multimodal_video_pipeline",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, 4 + doc_id % 5 AS nf FROM documents
    ), frames AS (
        SELECT d.doc_id, d.nf, t.f
        FROM d, LATERAL (SELECT unnest(generate_series(0, d.nf - 1)) AS f) t
        WHERE t.f % {VID1_STEP} = 0 AND t.f // {VID1_STEP} < {VID1_MAX_FRAMES}
    ), px AS (
        SELECT fr.doc_id, fr.nf, fr.f,
               (3 * gx.x + 7 * gy.y + 11 * gc.c + 13 * fr.f + fr.doc_id) % 256 AS v
        FROM frames fr,
             (SELECT unnest(generate_series(0, {VID1_W - 1})) AS x) gx,
             (SELECT unnest(generate_series(0, {VID1_H - 1})) AS y) gy,
             (SELECT unnest(generate_series(0, 2)) AS c) gc
    )
    SELECT doc_id, CAST(nf AS INT) AS n_frames, CAST(f AS INT) AS frame_idx,
           round(CAST(f AS DOUBLE) / {VID1_FPS}, 4) AS ts_s,
           round(AVG(CAST(v AS DOUBLE)), 4) AS frame_mean
    FROM px GROUP BY doc_id, nf, f
    """,
)
def multimodal_video_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → decode → frame-sample → featurize for video: VID1
    payloads parsed to (frames, H, W, C), every 2nd frame sampled
    (max 4 — the keyframe budget), each sampled frame reduced to its
    pixel mean with its timestamp. 1 row in → N frame rows out, the
    batch-expanding mapInPandas shape a pyav sampler uses.

    100 TB shape: one mapInPandas stage, zero shuffle; frame bytes
    stay on executors."""
    out_schema = (
        "doc_id long, n_frames int, frame_idx int, ts_s double, frame_mean double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                clip = decode_vid1(encode_vid1(int(doc_id)))
                nf = clip.shape[0]
                for j, f in enumerate(range(0, nf, VID1_STEP)):
                    if j >= VID1_MAX_FRAMES:
                        break
                    rows.append(
                        (int(doc_id), nf, f,
                         _round_half_up(f / VID1_FPS, 4),
                         _round_half_up(
                             float(clip[f].astype(np.float64).mean()), 4))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "frame_idx", "ts_s", "frame_mean"],
            )

    d = table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (aHash): the multimodal twin of the text
# near-dup operators. Every large-scale image corpus dedups on a
# perceptual hash (average-hash / pHash family) before training; this
# implements the full chain over the REAL RAW1 codec — decode →
# channel-sum grayscale → 8×8 nearest resize → mean-threshold 64-bit
# aHash — banded into 4×16-bit pieces so candidate generation is an
# equi-join on band collisions (O(n·bands) shuffle rows, never
# all-pairs; by pigeonhole every pair with hamming ≤ 3 collides on at
# least one band, so that radius is EXACT). All arithmetic is integer
# (channel SUM, 64·g ≥ Σg threshold), making the entire
# decode→hash→join chain DuckDB-oracle-checkable from the closed-form
# pixels. Reference has no media operators (it is a client SDK); this
# extends the BASELINE.json multimodal surface.

AHASH_SIDE = 8         # resize target: 8×8 → 64 bits
AHASH_BANDS = 4        # 4 × 16-bit bands
AHASH_TOP = 20

# Hot-bucket skew guards, the perceptual twin of dedup.NGRAM_MAX_DF
# (stop-shingle cap, functions/dedup.py): a fingerprint bucket shared
# by k docs emits k(k-1)/2 candidate pairs from the equi-join — a
# degenerate family (constant/flat images, black keyframes) makes one
# bucket quadratic. Buckets at or above these document frequencies
# carry no near-dup signal (that many "identical" images are a
# degenerate pattern, not copies) and are excluded from BOTH candidate
# join sides, symmetrically in Spark and the DuckDB oracles. The
# synthetic fixture IS such a corpus (68 distinct band patterns across
# the whole image corpus; one keyframe hash covers ~58% of videos), so
# the caps are exercised by the driver gate at sf0.01, not just styled
# on. Image bands (16-bit, 4 bands/doc) saturate far faster than
# whole-hash video buckets, hence the lower cap.
AHASH_MAX_DF = 16      # per (band_id, val) bucket, image candidates
VHASH_MAX_DF = 100     # per keyframe-hash bucket, video candidates


def _ahash_ctes(where: str = "TRUE") -> str:
    """DuckDB CTE chain ending in bands(doc_id, band_id, val) and
    fp(doc_id, b0..b3): closed-form aHash fingerprints over the
    documents passing ``where`` — shared by the dedup top-20, the
    stored-index histogram, and the DML variants."""
    ch_sum = " + ".join(
        f"(3*sx + 7*sy + {11 * c} + doc_id) % 256" for c in range(3)
    )
    fp_cols = ", ".join(
        f"MAX(CASE WHEN band_id = {k} THEN val END) AS b{k}"
        for k in range(AHASH_BANDS)
    )
    return f"""px AS (
        SELECT doc_id, gi.i AS i, gj.j AS j,
               (gi.i * {RAW1_H}) // {AHASH_SIDE} AS sy,
               (gj.j * (32 + (doc_id % 3) * 16)) // {AHASH_SIDE} AS sx
        FROM (SELECT doc_id FROM documents WHERE {where}) d,
             generate_series(0, {AHASH_SIDE - 1}) AS gi(i),
             generate_series(0, {AHASH_SIDE - 1}) AS gj(j)
    ), g AS (
        SELECT doc_id, (i * {AHASH_SIDE} + j) AS p, ({ch_sum}) AS g
        FROM px
    ), bits AS (
        SELECT doc_id, p,
               CASE WHEN 64 * g >= SUM(g) OVER (PARTITION BY doc_id)
                    THEN 1 ELSE 0 END AS bit
        FROM g
    ), bands AS (
        SELECT doc_id, p // 16 AS band_id,
               CAST(SUM(bit << (p % 16)) AS BIGINT) AS val
        FROM bits GROUP BY doc_id, p // 16
    ), fp AS (
        SELECT doc_id, {fp_cols} FROM bands GROUP BY doc_id
    )"""


def _ahash_pairs_select() -> str:
    ham = " + ".join(
        f"bit_count(xor(fa.b{k}, fb.b{k}))" for k in range(AHASH_BANDS)
    )
    return f"""bands_k AS (
        SELECT doc_id, band_id, val FROM (
            SELECT doc_id, band_id, val,
                   COUNT(*) OVER (PARTITION BY band_id, val) AS df
            FROM bands
        ) q WHERE df < {AHASH_MAX_DF}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands_k a JOIN bands_k b
          ON a.band_id = b.band_id AND a.val = b.val
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST({ham} AS INT) AS hamming
    FROM cand
    JOIN fp fa ON fa.doc_id = doc_a
    JOIN fp fb ON fb.doc_id = doc_b
    ORDER BY hamming, doc_a, doc_b
    LIMIT {AHASH_TOP}"""


def _ahash_oracle(where: str = "TRUE") -> str:
    return f"WITH {_ahash_ctes(where)}, {_ahash_pairs_select()}"


def _ahash_hist_oracle(where: str = "TRUE") -> str:
    return f"""
    WITH {_ahash_ctes(where)}
    SELECT band_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_buckets
    FROM bands GROUP BY band_id ORDER BY band_id
    """


@register("multimodal_image_dedup", oracle=_ahash_oracle())
def multimodal_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup detection over images: top-20 candidate
    pairs by aHash Hamming distance. The hash runs through the REAL
    decode path (RAW1 parse → channel-sum grayscale → nearest resize →
    integer mean threshold) inside one Arrow ``mapInPandas`` stage —
    bytes never leave the executors, only (doc_id, 4×16-bit bands)
    rows ever shuffle. Candidates come from the band-collision
    equi-join (exact for hamming ≤ 3 by pigeonhole; the top-20
    contract itself is defined over band-colliding pairs, identical in
    the oracle). 100 TB shape: per-image work is constant, the banded
    join is O(n · colliding bucket) with hot buckets (df ≥
    AHASH_MAX_DF — degenerate constant/flat image families) excluded
    from both sides, and the hash table (doc_id + 8 bytes) is the only
    state a daily incremental run needs — the same stored-index
    pattern as dedup_index_build."""
    fp = _ahash_fp(
        table(spark, sf_dir, "documents").select("doc_id").transform(fanout)
    ).localCheckpoint(eager=True)  # hash once; both join sides reuse it
    return _ahash_top_pairs(fp)


def _ahash_fp(docs: DataFrame) -> DataFrame:
    """(doc_id, b0..b3): the 64-bit aHash of each doc's image as four
    16-bit bands, computed through the REAL decode path inside one
    Arrow mapInPandas stage. This is the expensive pass an index
    stores — for images the decode dwarfs everything else, so serving
    probes from stored fingerprints matters even more than for text
    shingles."""
    import numpy as np

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(16, dtype=np.int64)
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                arr = decode_raw1(encode_raw1(int(doc_id)))
                gray = arr.astype(np.int64).sum(axis=2)
                rs = resize_nearest(gray, AHASH_SIDE, AHASH_SIDE)
                flat = rs.flatten()  # row-major: p = i*8 + j
                bits = (flat * 64 >= flat.sum()).astype(np.int64)
                rows.append(
                    [int(doc_id)]
                    + [
                        int((bits[k * 16:(k + 1) * 16] << shifts).sum())
                        for k in range(AHASH_BANDS)
                    ]
                )
            yield pd.DataFrame(
                rows, columns=["doc_id"] + [f"b{k}" for k in range(AHASH_BANDS)]
            )

    return docs.mapInPandas(
        kernel,
        schema="doc_id bigint, " + ", ".join(
            f"b{k} bigint" for k in range(AHASH_BANDS)
        ),
    )


def _ahash_bands_df(fp: DataFrame) -> DataFrame:
    return fp.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"b{k}") for k in range(AHASH_BANDS)])
                     ).alias("band_id", "val"),
    )


def _ahash_top_pairs(fp: DataFrame) -> DataFrame:
    """Top-20 band-colliding pairs by Hamming distance over a
    fingerprint relation (works identically over freshly-hashed or
    STORED fingerprints — the probe path). Buckets with
    df >= AHASH_MAX_DF are excluded from BOTH candidate join sides
    (the hot-bucket guard; Hamming is still computed over the full
    uncapped fingerprints)."""
    bands = _ahash_bands_df(fp)
    bands = (
        bands.withColumn(
            "df", F.count("*").over(Window.partitionBy("band_id", "val"))
        )
        .filter(F.col("df") < AHASH_MAX_DF)
        .drop("df")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.val") == F.col("b.val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    fa, fb = fp.alias("fa"), fp.alias("fb")
    ham = sum(
        F.bit_count(F.col(f"fa.b{k}").bitwiseXOR(F.col(f"fb.b{k}")))
        for k in range(AHASH_BANDS)
    )
    return (
        cand.join(fa, F.col("doc_a") == F.col("fa.doc_id"))
        .join(fb, F.col("doc_b") == F.col("fb.doc_id"))
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .orderBy("hamming", "doc_a", "doc_b")
        .limit(AHASH_TOP)
    )


# --- stored perceptual-hash index: build-once / probe-many ------------
# Completes the modality symmetry of the persisted-index family: text
# (MinHash signatures), vectors (IVF posting lists), images (aHash
# fingerprints) — all maintained through the same tombstone-aware
# index_store (deletes O(batch), re-inserts compact). For images the
# stored index saves the DECODE pass, the dominant cost at real image
# sizes; probes must not re-decode (plan-asserted: no mapInPandas, no
# documents scan in the probe plan).


def _image_index_fq(sf_dir: str) -> str:
    import hashlib

    tag = hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:8]
    return f"default.__img_ahash_index_{tag}__"


def _image_refresh(spark: SparkSession, tbl: str, corpus: DataFrame) -> None:
    """Sync the stored fingerprint table to ``corpus`` (doc_id rows):
    only NEW docs are decoded and hashed; deleted docs are tombstoned."""
    from risingwave_py_spark.functions.index_store import refresh_stored_index

    def make_rows(new_ids: DataFrame) -> DataFrame:
        return _ahash_fp(corpus.join(new_ids, "doc_id", "left_semi")
                         .transform(fanout))

    refresh_stored_index(spark, tbl, corpus.select("doc_id"), "doc_id",
                         make_rows)


@register("image_index_build", oracle=_ahash_hist_oracle())
def image_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build (or incrementally refresh) the stored aHash fingerprint
    index and report its band histogram FROM THE STORED TABLE — the
    DDL half of the image build/probe pair."""
    from risingwave_py_spark.functions.index_store import live_index

    tbl = _image_index_fq(sf_dir)
    _image_refresh(spark, tbl, table(spark, sf_dir, "documents").select("doc_id"))
    return (
        _ahash_bands_df(live_index(spark, tbl, "doc_id"))
        .groupBy("band_id")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct("val").alias("n_buckets"))
        .orderBy("band_id")
    )


@register("image_index_probe", oracle=_ahash_oracle())
def image_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe the STORED fingerprint index: same top-20 contract as
    multimodal_image_dedup, but fingerprints come from the index table
    — the probe plan never decodes an image (no mapInPandas stage) and
    never scans the documents parquet (both plan-asserted)."""
    from risingwave_py_spark.functions.index_store import live_index

    tbl = _image_index_fq(sf_dir)
    _image_refresh(spark, tbl, table(spark, sf_dir, "documents").select("doc_id"))
    return _ahash_top_pairs(live_index(spark, tbl, "doc_id"))


_IMG_DML_GONE = "doc_id >= 200 AND doc_id < 260"
_IMG_DML_BACK = 200


@register(
    "image_index_dml",
    oracle=_ahash_hist_oracle(
        where=f"NOT ({_IMG_DML_GONE}) OR doc_id = {_IMG_DML_BACK}"
    ),
)
def image_index_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DML maintenance of the stored fingerprint index: full build, a
    privacy-deletion batch (60 docs tombstoned — no re-decode of
    survivors), one deleted doc re-inserted (compaction path). The
    final LIVE band histogram must equal a from-scratch hash pass over
    the surviving corpus."""
    from risingwave_py_spark.functions.index_store import (
        drop_stored_index,
        live_index,
    )

    tbl = _image_index_fq(sf_dir) + "_dml"
    drop_stored_index(spark, tbl)  # self-contained: fresh build each run
    d = table(spark, sf_dir, "documents").select("doc_id")
    _image_refresh(spark, tbl, d)
    _image_refresh(spark, tbl, d.filter(f"NOT ({_IMG_DML_GONE})"))
    _image_refresh(
        spark, tbl, d.filter(f"NOT ({_IMG_DML_GONE}) OR doc_id = {_IMG_DML_BACK}")
    )
    return (
        _ahash_bands_df(live_index(spark, tbl, "doc_id"))
        .groupBy("band_id")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct("val").alias("n_buckets"))
        .orderBy("band_id")
    )


# ---------------------------------------------------------------------------
# Perceptual video near-dup (aHash over sampled keyframes): completes
# the modality matrix — text (MinHash), vectors (IVF), images (aHash),
# video (keyframe-aHash bags) — on the same stored-index substrate.
# Each clip reduces to a BAG OF KEYFRAME FINGERPRINTS (the 64-bit
# aHash of every sampled keyframe, same step/cap as the keyframe
# pipeline above); two videos are near-dup candidates when they share
# an identical keyframe hash (the classic bag-of-fingerprints overlap
# a video dedup pipeline uses — robust to trims/re-encodes because
# any surviving keyframe matches). Candidate generation is an
# equi-join on the hash value: O(n · colliding bucket), never
# all-pairs. Integer-only arithmetic end to end, so the whole
# decode → keyframe-sample → hash → overlap chain is oracle-checked
# from VID1's closed-form pixels. Reference has no media operators
# (client SDK); extends the BASELINE.json multimodal surface.

VHASH_TOP = 20


def _vhash_ctes(where: str = "TRUE") -> str:
    """DuckDB CTE chain ending in fp(doc_id, frame_idx, fpv):
    closed-form keyframe aHash fingerprints (fpv = 'b0_b1_b2_b3') for
    every sampled keyframe of every video passing ``where``. Mirrors
    the Spark kernel exactly: VID1 16×16 frames, channel-sum gray,
    nearest resize to 8×8 (source pixel (2i, 2j)), integer mean
    threshold, 4×16-bit bands."""
    ch_sum = " + ".join(
        f"(6*gj.j + 14*gi.i + {11 * c} + 13*fr.f + fr.doc_id) % 256"
        for c in range(3)
    )
    band_cols = " || '_' || ".join(
        f"CAST(MAX(CASE WHEN band_id = {k} THEN val END) AS VARCHAR)"
        for k in range(AHASH_BANDS)
    )
    return f"""vd AS (
        SELECT doc_id, 4 + doc_id % 5 AS nf FROM documents WHERE {where}
    ), frames AS (
        SELECT vd.doc_id, t.f
        FROM vd, LATERAL (SELECT unnest(generate_series(0, vd.nf - 1)) AS f) t
        WHERE t.f % {VID1_STEP} = 0 AND t.f // {VID1_STEP} < {VID1_MAX_FRAMES}
    ), g AS (
        SELECT fr.doc_id, fr.f, (gi.i * {AHASH_SIDE} + gj.j) AS p,
               ({ch_sum}) AS g
        FROM frames fr,
             generate_series(0, {AHASH_SIDE - 1}) AS gi(i),
             generate_series(0, {AHASH_SIDE - 1}) AS gj(j)
    ), bits AS (
        SELECT doc_id, f, p,
               CASE WHEN 64 * g >= SUM(g) OVER (PARTITION BY doc_id, f)
                    THEN 1 ELSE 0 END AS bit
        FROM g
    ), bandvals AS (
        SELECT doc_id, f, p // 16 AS band_id,
               CAST(SUM(bit << (p % 16)) AS BIGINT) AS val
        FROM bits GROUP BY doc_id, f, p // 16
    ), fp AS (
        SELECT doc_id, CAST(f AS INT) AS frame_idx, {band_cols} AS fpv
        FROM bandvals GROUP BY doc_id, f
    )"""


def _vhash_pairs_select() -> str:
    return f"""bags0 AS (
        SELECT DISTINCT doc_id, fpv FROM fp
    ), bags AS (
        SELECT doc_id, fpv FROM (
            SELECT doc_id, fpv, COUNT(*) OVER (PARTITION BY fpv) AS df
            FROM bags0
        ) q WHERE df < {VHASH_MAX_DF}
    ), sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM bags GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM bags a JOIN bags b
          ON a.fpv = b.fpv AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_shared, sa.n AS n_a, sb.n AS n_b
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    ORDER BY n_shared DESC, doc_a, doc_b
    LIMIT {VHASH_TOP}"""


def _vhash_oracle(where: str = "TRUE") -> str:
    return f"WITH {_vhash_ctes(where)}, {_vhash_pairs_select()}"


def _vhash_hist_oracle(where: str = "TRUE") -> str:
    return f"""
    WITH {_vhash_ctes(where)}
    SELECT frame_idx, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT fpv) AS BIGINT) AS n_hashes
    FROM fp GROUP BY frame_idx ORDER BY frame_idx
    """


def _vhash_fp(docs: DataFrame) -> DataFrame:
    """(doc_id, frame_idx, fpv): 64-bit aHash of each sampled keyframe
    rendered as a joinable 'b0_b1_b2_b3' string, computed through the
    REAL VID1 decode inside one Arrow mapInPandas stage (1 video row →
    up to 4 keyframe rows). This is the expensive pass the stored
    index saves — for video, decode + frame sampling dwarfs the hash."""
    import numpy as np

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(16, dtype=np.int64)
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                clip = decode_vid1(encode_vid1(int(doc_id)))
                nf = clip.shape[0]
                for j, f in enumerate(range(0, nf, VID1_STEP)):
                    if j >= VID1_MAX_FRAMES:
                        break
                    gray = clip[f].astype(np.int64).sum(axis=2)
                    rs = resize_nearest(gray, AHASH_SIDE, AHASH_SIDE)
                    flat = rs.flatten()
                    bits = (flat * 64 >= flat.sum()).astype(np.int64)
                    fpv = "_".join(
                        str(int((bits[k * 16:(k + 1) * 16] << shifts).sum()))
                        for k in range(AHASH_BANDS)
                    )
                    rows.append((int(doc_id), int(f), fpv))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "fpv"])

    return docs.mapInPandas(
        kernel, schema="doc_id bigint, frame_idx int, fpv string"
    )


def _vhash_top_pairs(fp: DataFrame) -> DataFrame:
    """Top-20 video pairs by keyframe-fingerprint-bag overlap over a
    keyframe-hash relation (identical over freshly-hashed or STORED
    fingerprints — the probe path). n_a/n_b are each side's distinct
    hash counts, so any overlap measure (containment, Jaccard) is
    computable downstream without re-decoding. Callers with an
    expensive fp (the decode path) checkpoint it BEFORE calling — a
    checkpoint here would hide the upstream plan from the
    no-re-decode plan assertions; over the stored index the repeated
    bags scan is a cheap parquet read. Keyframe hashes shared by
    df >= VHASH_MAX_DF videos are excluded SYMMETRICALLY from the
    candidate join and the size denominators (the hot-bucket guard:
    a black/constant keyframe shared by the whole corpus must not go
    quadratic, and must not inflate containment denominators)."""
    bags = fp.select("doc_id", "fpv").distinct()
    bags = (
        bags.withColumn("df", F.count("*").over(Window.partitionBy("fpv")))
        .filter(F.col("df") < VHASH_MAX_DF)
        .drop("df")
    )
    sizes = bags.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = bags.alias("a"), bags.alias("b")
    shared = (
        a.join(b, (F.col("a.fpv") == F.col("b.fpv"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        shared.join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("n", "n_a")), "doc_a")
        .join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n", "n_b")), "doc_b")
        .select("doc_a", "doc_b", "n_shared", "n_a", "n_b")
        .orderBy(F.desc("n_shared"), "doc_a", "doc_b")
        .limit(VHASH_TOP)
    )


@register("multimodal_video_dedup", oracle=_vhash_oracle())
def multimodal_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup detection over videos: top-20 pairs by
    keyframe-hash-bag overlap. Decode → keyframe-sample → aHash runs
    in one Arrow mapInPandas stage (frame bytes never leave the
    executors; only doc_id + hash strings shuffle); candidates come
    from the exact-hash equi-join. 100 TB shape: per-clip work is
    bounded by the keyframe budget, the overlap join is O(n ·
    colliding bucket) with hot hashes (df ≥ VHASH_MAX_DF — shared
    black/constant keyframes) excluded from candidates and
    denominators, and the keyframe-hash table is the only state a
    daily incremental run needs (the stored index below)."""
    fp = _vhash_fp(
        table(spark, sf_dir, "documents").select("doc_id").transform(fanout)
    ).localCheckpoint(eager=True)  # decode+hash once; all sides reuse it
    return _vhash_top_pairs(fp)


# --- stored keyframe-hash index: build-once / probe-many --------------


def _video_index_fq(sf_dir: str) -> str:
    import hashlib

    tag = hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:8]
    return f"default.__vid_ahash_index_{tag}__"


def _video_refresh(spark: SparkSession, tbl: str, corpus: DataFrame) -> None:
    """Sync the stored keyframe-hash table to ``corpus`` (doc_id
    rows): only NEW videos are decoded and hashed (multi-row-per-id
    index: each new doc contributes its keyframe rows); deleted videos
    are tombstoned by doc_id, hiding all their keyframe rows at once."""
    from risingwave_py_spark.functions.index_store import refresh_stored_index

    def make_rows(new_ids: DataFrame) -> DataFrame:
        return _vhash_fp(corpus.join(new_ids, "doc_id", "left_semi")
                         .transform(fanout))

    refresh_stored_index(spark, tbl, corpus.select("doc_id"), "doc_id",
                         make_rows)


@register("video_index_build", oracle=_vhash_hist_oracle())
def video_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build (or incrementally refresh) the stored keyframe-hash index
    and report its per-keyframe histogram FROM THE STORED TABLE."""
    from risingwave_py_spark.functions.index_store import live_index

    tbl = _video_index_fq(sf_dir)
    _video_refresh(spark, tbl,
                   table(spark, sf_dir, "documents").select("doc_id"))
    return (
        live_index(spark, tbl, "doc_id")
        .groupBy("frame_idx")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct("fpv").alias("n_hashes"))
        .orderBy("frame_idx")
    )


@register("video_index_probe", oracle=_vhash_oracle())
def video_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe the STORED keyframe-hash index: same top-20 overlap
    contract as multimodal_video_dedup, but hashes come from the index
    table — the probe plan never decodes a video (no mapInPandas
    stage) and never scans the documents parquet (both plan-asserted
    in tests/test_plan_quality.py)."""
    from risingwave_py_spark.functions.index_store import live_index

    tbl = _video_index_fq(sf_dir)
    _video_refresh(spark, tbl,
                   table(spark, sf_dir, "documents").select("doc_id"))
    return _vhash_top_pairs(live_index(spark, tbl, "doc_id"))


_VID_DML_GONE = "doc_id >= 300 AND doc_id < 360"
_VID_DML_BACK = 300


@register(
    "video_index_dml",
    oracle=_vhash_hist_oracle(
        where=f"NOT ({_VID_DML_GONE}) OR doc_id = {_VID_DML_BACK}"
    ),
)
def video_index_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DML maintenance of the stored keyframe-hash index: full build,
    a privacy-deletion batch (60 videos tombstoned — one tombstone
    hides all of a video's keyframe rows, no re-decode of survivors),
    one deleted video re-inserted (compaction path). The final LIVE
    per-keyframe histogram must equal a from-scratch decode+hash pass
    over the surviving corpus."""
    from risingwave_py_spark.functions.index_store import (
        drop_stored_index,
        live_index,
    )

    tbl = _video_index_fq(sf_dir) + "_dml"
    drop_stored_index(spark, tbl)  # self-contained: fresh build each run
    d = table(spark, sf_dir, "documents").select("doc_id")
    _video_refresh(spark, tbl, d)
    _video_refresh(spark, tbl, d.filter(f"NOT ({_VID_DML_GONE})"))
    _video_refresh(
        spark, tbl,
        d.filter(f"NOT ({_VID_DML_GONE}) OR doc_id = {_VID_DML_BACK}"),
    )
    return (
        live_index(spark, tbl, "doc_id")
        .groupBy("frame_idx")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct("fpv").alias("n_hashes"))
        .orderBy("frame_idx")
    )


# ---------------------------------------------------------------------------
# AUDIO near-dup + stored fingerprint index — completes the modality
# matrix (text/vector/image/video each have near-dup + a persisted
# index; reference scope note: the reference SDK has no media ops at
# all — this is the Spark-native data-pipeline layer).
#
# Fingerprint: per 256-sample window over the REAL PCM1 decode, an
# integer pair (positive-sample count, energy bucket = Σs² >> 21)
# rendered as a joinable 'w_pc_eb' string. Integer-only arithmetic ⇒
# the DuckDB oracle mirrors the kernel bit-for-bit.
#
# The synthetic corpus has ~28 distinct signal classes (doc_id % 4
# lengths × doc_id % 7 pitches), i.e. it is DUPLICATE-HEAVY — so the
# scale-right near-dup shape here is the O(n) fingerprint-bag CLUSTER
# (hash group-by, no pair join at all), not all-pairs; pair-style
# matching lives in the bounded PROBE query, whose candidate join is
# capped per bucket (AUD_MAX_DF) exactly like the text stop-shingle /
# image hot-band guards.

AUD_WIN = 256          # samples per fingerprint window
AUD_EB_SHIFT = 21      # energy bucket = windowed Σs² >> 21
AUD_MAX_DF = 64        # probe candidate cap per fingerprint bucket
AUD_TOP = 20
AUD_PROBE_DOCS = 8     # probe clip set: doc_id < 8
AUD_PROBE_K = 3        # matches kept per probe


def _audfp_ctes(where: str = "TRUE") -> str:
    """DuckDB CTE chain ending in fp(doc_id, win, fpv): closed-form
    per-window fingerprints of the PCM1 sawtooth s[i] = (i*k) % 2000
    - 1000 for every doc passing ``where``. Pure integer arithmetic —
    mirrors the Spark kernel exactly."""
    return f"""ad AS (
        SELECT doc_id, 2048 + (doc_id % 4) * 512 AS n, doc_id % 7 + 1 AS k
        FROM documents WHERE {where}
    ), wins AS (
        SELECT ad.doc_id, ad.k, t.w
        FROM ad, LATERAL (
            SELECT unnest(generate_series(0, ad.n // {AUD_WIN} - 1)) AS w
        ) t
    ), samp AS (
        SELECT doc_id, w,
               SUM(CASE WHEN ((t2.i * k) % 2000 - 1000) >= 0
                        THEN 1 ELSE 0 END) AS pc,
               SUM(CAST((t2.i * k) % 2000 - 1000 AS BIGINT)
                   * ((t2.i * k) % 2000 - 1000)) AS e
        FROM wins, LATERAL (
            SELECT unnest(generate_series(
                wins.w * {AUD_WIN}, wins.w * {AUD_WIN} + {AUD_WIN - 1})) AS i
        ) t2
        GROUP BY doc_id, w
    ), fp AS (
        SELECT doc_id, CAST(w AS INT) AS win,
               CAST(w AS VARCHAR) || '_' || CAST(pc AS VARCHAR) || '_'
               || CAST(e // {1 << AUD_EB_SHIFT} AS VARCHAR) AS fpv
        FROM samp
    )"""


def _audfp_hist_oracle(where: str = "TRUE") -> str:
    return f"""
    WITH {_audfp_ctes(where)}
    SELECT win, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT fpv) AS BIGINT) AS n_fps
    FROM fp GROUP BY win ORDER BY win
    """


def _audfp_cluster_oracle(where: str = "TRUE") -> str:
    return f"""
    WITH {_audfp_ctes(where)}, bag AS (
        SELECT doc_id, STRING_AGG(fpv, '|' ORDER BY fpv) AS sig
        FROM fp GROUP BY doc_id
    )
    SELECT MIN(doc_id) AS rep_doc, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MAX(doc_id) AS max_doc
    FROM bag GROUP BY sig
    ORDER BY n_docs DESC, rep_doc LIMIT {AUD_TOP}
    """


def _audfp_probe_oracle(where: str = "TRUE") -> str:
    return f"""
    WITH {_audfp_ctes(where)}, kept AS (
        SELECT doc_id, fpv FROM (
            SELECT doc_id, fpv, COUNT(*) OVER (PARTITION BY fpv) AS df
            FROM fp
        ) q WHERE df < {AUD_MAX_DF}
    ), pr AS (
        SELECT doc_id AS probe_id, fpv FROM kept
        WHERE doc_id < {AUD_PROBE_DOCS}
    ), m AS (
        SELECT pr.probe_id, c.doc_id AS match_doc,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM pr JOIN kept c
          ON pr.fpv = c.fpv AND c.doc_id <> pr.probe_id
        GROUP BY pr.probe_id, c.doc_id
    ), rk AS (
        SELECT probe_id, match_doc, n_shared,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY probe_id
                   ORDER BY n_shared DESC, match_doc) AS INT) AS rk
        FROM m
    )
    SELECT probe_id, match_doc, n_shared, rk FROM rk
    WHERE rk <= {AUD_PROBE_K} ORDER BY probe_id, rk
    """


def _audio_fp(docs: DataFrame) -> DataFrame:
    """(doc_id, win, fpv): integer per-window fingerprints through the
    REAL PCM1 decode inside one Arrow mapInPandas stage (1 clip row →
    8-14 window rows; sample bytes never leave the executors). This is
    the expensive pass the stored index saves."""
    import numpy as np

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                s, _rate = decode_pcm1(encode_pcm1(int(doc_id)))
                nw = s.size // AUD_WIN
                # all windows at once: one reshape + two row reductions
                win = s[: nw * AUD_WIN].astype(np.int64).reshape(nw, AUD_WIN)
                pcs = (win >= 0).sum(axis=1)
                ebs = (win * win).sum(axis=1) >> AUD_EB_SHIFT
                rows.extend(
                    (int(doc_id), w, f"{w}_{pcs[w]}_{ebs[w]}")
                    for w in range(nw)
                )
            yield pd.DataFrame(rows, columns=["doc_id", "win", "fpv"])

    return docs.mapInPandas(
        kernel, schema="doc_id bigint, win int, fpv string"
    )


def _audio_clusters(fp: DataFrame) -> DataFrame:
    """Duplicate clusters by full fingerprint bag: one O(n) hash
    group-by chain, NO pair join — the right shape for a duplicate-
    heavy corpus at any scale (all-pairs within a dup class is
    quadratic; the class signature is not)."""
    bag = fp.groupBy("doc_id").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("fpv"))).alias("sig")
    )
    return (
        bag.groupBy("sig")
        .agg(F.min("doc_id").alias("rep_doc"),
             F.count("*").alias("n_docs"),
             F.max("doc_id").alias("max_doc"))
        .select("rep_doc", "n_docs", "max_doc")
        .orderBy(F.desc("n_docs"), "rep_doc")
        .limit(AUD_TOP)
    )


def _audio_probe_matches(fp: DataFrame) -> DataFrame:
    """Top-K matches per probe clip over a fingerprint relation.
    Fingerprints shared by df >= AUD_MAX_DF clips (near-universal
    windows — the audio analogue of stop-shingles) are excluded from
    BOTH join sides, bounding the per-probe candidate set to
    O(windows × AUD_MAX_DF) regardless of corpus size."""
    kept = (
        fp.select("doc_id", "fpv")
        .withColumn("df", F.count("*").over(Window.partitionBy("fpv")))
        .filter(F.col("df") < AUD_MAX_DF)
        .drop("df")
    )
    pr = (
        kept.filter(F.col("doc_id") < AUD_PROBE_DOCS)
        .withColumnRenamed("doc_id", "probe_id")
    )
    m = (
        F.broadcast(pr).alias("p")
        .join(kept.alias("c"),
              (F.col("p.fpv") == F.col("c.fpv"))
              & (F.col("c.doc_id") != F.col("p.probe_id")))
        .groupBy(F.col("p.probe_id"), F.col("c.doc_id").alias("match_doc"))
        .agg(F.count("*").alias("n_shared"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("n_shared"), "match_doc"
    )
    return (
        m.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= AUD_PROBE_K)
        .select("probe_id", "match_doc", "n_shared", "rk")
        .orderBy("probe_id", "rk")
    )


@register("multimodal_audio_dedup", oracle=_audfp_cluster_oracle())
def multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup detection over audio: top-20 duplicate
    clusters by full fingerprint bag. Decode → window → fingerprint
    runs in one Arrow mapInPandas stage; clustering is a pure hash
    group-by chain (zero pair joins — see _audio_clusters)."""
    fp = _audio_fp(
        table(spark, sf_dir, "documents").select("doc_id").transform(fanout)
    )
    return _audio_clusters(fp)


# --- stored audio-fingerprint index: build-once / probe-many ----------


def _audio_index_fq(sf_dir: str) -> str:
    import hashlib

    tag = hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:8]
    return f"default.__aud_fp_index_{tag}__"


def _audio_refresh(spark: SparkSession, tbl: str, corpus: DataFrame) -> None:
    """Sync the stored fingerprint table to ``corpus`` (doc_id rows):
    only NEW clips are decoded and fingerprinted (multi-row-per-id
    index: each new clip contributes its window rows); deleted clips
    are tombstoned by doc_id, hiding all their window rows at once."""
    from risingwave_py_spark.functions.index_store import refresh_stored_index

    def make_rows(new_ids: DataFrame) -> DataFrame:
        return _audio_fp(corpus.join(new_ids, "doc_id", "left_semi")
                         .transform(fanout))

    refresh_stored_index(spark, tbl, corpus.select("doc_id"), "doc_id",
                         make_rows)


@register("audio_index_build", oracle=_audfp_hist_oracle())
def audio_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build (or incrementally refresh) the stored audio-fingerprint
    index and report its per-window histogram FROM THE STORED TABLE."""
    from risingwave_py_spark.functions.index_store import live_index

    tbl = _audio_index_fq(sf_dir)
    _audio_refresh(spark, tbl,
                   table(spark, sf_dir, "documents").select("doc_id"))
    return (
        live_index(spark, tbl, "doc_id")
        .groupBy("win")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct("fpv").alias("n_fps"))
        .orderBy("win")
    )


@register("audio_index_probe", oracle=_audfp_probe_oracle())
def audio_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe the STORED fingerprint index: top-3 matches per probe
    clip by shared (df-capped) windows. Fingerprints come from the
    index table — the probe plan never decodes a clip (no mapInPandas
    stage) and never scans the documents parquet (both plan-asserted
    in tests/test_plan_quality.py)."""
    from risingwave_py_spark.functions.index_store import live_index

    tbl = _audio_index_fq(sf_dir)
    _audio_refresh(spark, tbl,
                   table(spark, sf_dir, "documents").select("doc_id"))
    return _audio_probe_matches(live_index(spark, tbl, "doc_id"))


_AUD_DML_GONE = "doc_id >= 100 AND doc_id < 160"
_AUD_DML_BACK = 100


@register(
    "audio_index_dml",
    oracle=_audfp_hist_oracle(
        where=f"NOT ({_AUD_DML_GONE}) OR doc_id = {_AUD_DML_BACK}"
    ),
)
def audio_index_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DML maintenance of the stored fingerprint index: full build, a
    privacy-deletion batch (60 clips tombstoned — one tombstone hides
    all of a clip's window rows, no re-decode of survivors), one
    deleted clip re-inserted (compaction path). The final LIVE
    per-window histogram must equal a from-scratch decode+fingerprint
    pass over the surviving corpus."""
    from risingwave_py_spark.functions.index_store import (
        drop_stored_index,
        live_index,
    )

    tbl = _audio_index_fq(sf_dir) + "_dml"
    drop_stored_index(spark, tbl)  # self-contained: fresh build each run
    d = table(spark, sf_dir, "documents").select("doc_id")
    _audio_refresh(spark, tbl, d)
    _audio_refresh(spark, tbl, d.filter(f"NOT ({_AUD_DML_GONE})"))
    _audio_refresh(
        spark, tbl,
        d.filter(f"NOT ({_AUD_DML_GONE}) OR doc_id = {_AUD_DML_BACK}"),
    )
    return (
        live_index(spark, tbl, "doc_id")
        .groupBy("win")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct("fpv").alias("n_fps"))
        .orderBy("win")
    )


# ---------------------------------------------------------------------------
# Capstone v3: MULTIMODAL curation — one composed query chaining a
# perceptual-image exact-dup stage (banded aHash candidates, hot-bucket
# df cap, hamming=0), an audio fingerprint-bag cluster stage (keep the
# min-doc representative per identical clip class), and a unigram-LM
# text-quality gate (per-doc mean token log-prob at or above the
# surviving corpus's mean), reporting the per-source funnel. This is
# the cross-modality version of pipeline_curate_corpus_v2: a real
# training-data curation DAG runs all three modalities over one corpus
# snapshot, and the per-stage accounting is the artifact data teams
# actually review.

_CURATE_NORM_TOK = r"regexp_split_to_array(text, '\s+')"


def _curate_mm_oracle() -> str:
    ham = " + ".join(
        f"bit_count(xor(fa.b{k}, fb.b{k}))" for k in range(AHASH_BANDS)
    )
    aud = _audfp_ctes().replace("), fp AS (", "), afp AS (")
    return rf"""
    WITH {_ahash_ctes()}, {aud}, bands_k AS (
        SELECT doc_id, band_id, val FROM (
            SELECT doc_id, band_id, val,
                   COUNT(*) OVER (PARTITION BY band_id, val) AS df
            FROM bands) WHERE df < {AHASH_MAX_DF}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bands_k a JOIN bands_k b
          ON a.band_id = b.band_id AND a.val = b.val AND a.doc_id < b.doc_id
    ), img_drop AS (
        SELECT DISTINCT db AS doc_id FROM cand
        JOIN fp fa ON fa.doc_id = da JOIN fp fb ON fb.doc_id = db
        WHERE {ham} = 0
    ), keep_img AS (
        SELECT d.doc_id, d.source, d.text FROM documents d
        ANTI JOIN img_drop x ON d.doc_id = x.doc_id
    ), bag AS (
        SELECT f.doc_id, STRING_AGG(f.fpv, '|' ORDER BY f.fpv) AS sig
        FROM afp f JOIN keep_img k ON k.doc_id = f.doc_id GROUP BY f.doc_id
    ), aud_keepers AS (SELECT MIN(doc_id) AS doc_id FROM bag GROUP BY sig),
    keep_aud AS (
        SELECT k.* FROM keep_img k JOIN aud_keepers a ON a.doc_id = k.doc_id
    ), tok AS (
        SELECT doc_id, source, lower(unnest({_CURATE_NORM_TOK})) AS w
        FROM keep_aud
    ), vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
    scored AS (
        SELECT t.doc_id, t.source,
               round(SUM(ln(CAST(v.c AS DOUBLE) / tot.n)) / COUNT(*), 6)
                   AS avg_lp
        FROM tok t JOIN vocab v USING (w) CROSS JOIN tot
        GROUP BY t.doc_id, t.source
    ), thresh AS (SELECT round(AVG(avg_lp), 4) AS mean_lp FROM scored),
    final AS (SELECT * FROM scored CROSS JOIN thresh WHERE avg_lp >= mean_lp),
    src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_in
        FROM documents GROUP BY source
    )
    SELECT s.source, s.docs_in,
           s.docs_in - (SELECT COUNT(*) FROM keep_img k
                        WHERE k.source = s.source) AS image_dups,
           CAST((SELECT COUNT(*) FROM keep_img k WHERE k.source = s.source)
              - (SELECT COUNT(*) FROM keep_aud k WHERE k.source = s.source)
              AS BIGINT) AS audio_dups,
           CAST((SELECT COUNT(*) FROM keep_aud k WHERE k.source = s.source)
              - (SELECT COUNT(*) FROM final f WHERE f.source = s.source)
              AS BIGINT) AS text_low_quality,
           CAST((SELECT COUNT(*) FROM final f WHERE f.source = s.source)
              AS BIGINT) AS docs_kept
    FROM src s ORDER BY s.source
    """


@register("pipeline_curate_multimodal", oracle=_curate_mm_oracle())
def pipeline_curate_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal curation capstone, one composed query: (1) image
    exact-perceptual dedup — banded aHash candidates with the
    hot-bucket df cap, hamming=0 verification, drop the higher doc of
    every colliding pair; (2) audio dup-cluster — identical
    fingerprint bags keep only their min-doc representative; (3)
    unigram-LM text-quality gate over the survivors. Returns the
    per-source funnel (docs_in / image_dups / audio_dups /
    text_low_quality / docs_kept).

    Scale shape: each stage is the proven plan of its standalone
    operator — media bytes never leave their Arrow map stage (only
    doc_id + hash strings shuffle), the image candidate join is
    df-capped per bucket, the audio stage is a pure O(n) hash
    group-by chain, and the text gate moves tokens + per-doc scalars
    with a 1-row broadcast total. Nothing in the funnel is quadratic
    in the corpus."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    ids = d.select("doc_id").transform(fanout)
    # stage 1: image exact-perceptual dedup. Checkpoint the decode
    # (feeds the band index AND both sides of the verify join).
    ifp = _ahash_fp(ids).localCheckpoint(eager=True)
    bands_k = (
        _ahash_bands_df(ifp)
        .withColumn(
            "df", F.count("*").over(Window.partitionBy("band_id", "val"))
        )
        .filter(F.col("df") < AHASH_MAX_DF)
        .drop("df")
    )
    a, b = bands_k.alias("a"), bands_k.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    fa = ifp.select(
        F.col("doc_id").alias("da"),
        *[F.col(f"b{k}").alias(f"fa{k}") for k in range(AHASH_BANDS)],
    )
    fb = ifp.select(
        F.col("doc_id").alias("db"),
        *[F.col(f"b{k}").alias(f"fb{k}") for k in range(AHASH_BANDS)],
    )
    ham = " + ".join(
        f"bit_count(fa{k} ^ fb{k})" for k in range(AHASH_BANDS)
    )
    img_drop = (
        cand.join(fa, "da").join(fb, "db")
        .filter(F.expr(ham) == 0)
        .select(F.col("db").alias("doc_id"))
        .distinct()
    )
    # checkpoint: keep_img feeds the audio decode, the accounting, and
    # (via keep_aud) the token stage
    keep_img = d.join(img_drop, "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    # stage 2: audio dup clusters among the survivors
    afp = _audio_fp(keep_img.select("doc_id").transform(fanout))
    bag = afp.groupBy("doc_id").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("fpv"))).alias("sig")
    )
    aud_keepers = bag.groupBy("sig").agg(F.min("doc_id").alias("doc_id"))
    keep_aud = keep_img.join(
        aud_keepers, "doc_id", "left_semi"
    ).localCheckpoint(eager=True)
    # stage 3: unigram-LM quality gate (pipeline_curate_corpus_v2's
    # scoring plan over the multimodal survivors)
    tok = keep_aud.select(
        "doc_id", "source",
        F.explode(F.split(F.col("text"), r"\s+")).alias("w0"),
    ).select("doc_id", "source", F.lower("w0").alias("w"))
    vocab = tok.groupBy("w").agg(F.count("*").alias("c")).localCheckpoint(
        eager=True
    )
    total = vocab.agg(F.sum("c").alias("n"))
    lp = F.log(F.col("c").cast("double") / F.col("n"))
    scored = (
        tok.join(vocab, "w")
        .join(F.broadcast(total))
        .groupBy("doc_id", "source")
        .agg(F.round(F.sum(lp) / F.count("*"), 6).alias("avg_lp"))
    )
    thresh = scored.agg(F.round(F.avg("avg_lp"), 4).alias("mean_lp"))
    final = scored.join(F.broadcast(thresh)).filter(
        F.col("avg_lp") >= F.col("mean_lp")
    )
    # per-source funnel accounting
    src = d.groupBy("source").agg(F.count("*").alias("docs_in"))
    c_img = keep_img.groupBy("source").agg(F.count("*").alias("n_img"))
    c_aud = keep_aud.groupBy("source").agg(F.count("*").alias("n_aud"))
    c_fin = final.groupBy("source").agg(F.count("*").alias("n_fin"))
    return (
        src.join(c_img, "source", "left")
        .join(c_aud, "source", "left")
        .join(c_fin, "source", "left")
        .select(
            "source",
            "docs_in",
            (F.col("docs_in") - F.coalesce("n_img", F.lit(0))
             ).alias("image_dups"),
            (F.coalesce("n_img", F.lit(0)) - F.coalesce("n_aud", F.lit(0))
             ).alias("audio_dups"),
            (F.coalesce("n_aud", F.lit(0)) - F.coalesce("n_fin", F.lit(0))
             ).alias("text_low_quality"),
            F.coalesce("n_fin", F.lit(0)).alias("docs_kept"),
        )
        .orderBy("source")
    )
