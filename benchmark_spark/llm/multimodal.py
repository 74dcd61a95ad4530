"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Per the north star (BASELINE.json), media payloads are carried as
`binary` columns with typed metadata; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched functions over
`mapInPandas`. The container has no image/audio libraries, so the
DECODE step is stubbed (`decode_image` raises NotImplementedError;
the pipeline uses a clearly-marked deterministic fake) — the
Spark-side plumbing (binary schema, partitioning, Arrow batch shape,
UDF signatures) is real and tested (tests/test_multimodal.py).

Scale posture: media bytes dominate row size, so the iterator-based
mapInPandas path streams Arrow batches without materializing a
partition in memory; metadata-only queries never touch the payload
column thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from benchmark_spark.catalog import load_table
from benchmark_spark.registry import register

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes) -> "object":
    """REAL DECODE STUB: the container ships no image/audio codecs.

    On a production cluster this is `PIL.Image.open(io.BytesIO(payload))`
    (or torchaudio/ffmpeg for audio/video) inside the same mapInPandas
    worker; everything around it — schema, batching, partitioning —
    is unchanged.
    """
    raise NotImplementedError("no media codecs in this environment; see fake_features")


def fake_features(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for decode+embed: byte-window means.

    Keeps the exact output shape a real extractor would produce
    (fixed-dim float vector) so downstream similarity/dedup operators
    are exercised for real.
    """
    if not payload:
        return [0.0] * dim
    chunk = max(1, len(payload) // dim)
    out = []
    for i in range(dim):
        window = payload[i * chunk : (i + 1) * chunk] or payload[-chunk:]
        out.append(sum(window) / (255.0 * len(window)))
    return out


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents: utf-8 payload bytes +
    typed metadata — the storage shape for any binary modality."""
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


@register(
    "q_binary_meta",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_hash
        FROM documents
    """,
    doc="Binary-column metadata path: payload stays opaque; length/hash/type are computed without decoding (and without even reading the payload when pruned).",
    tags=("extension", "multimodal"),
)
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    return media.join(
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("content_hash")),
        "doc_id",
    ).select("doc_id", "media_type", "n_bytes", "content_hash")


# DuckDB replay of the deterministic fake extractor: payload bytes are
# recovered by hex-ing the utf-8 blob and parsing 2-char windows, then
# checksum and the 4 byte-window means are plain integer/double math
# both engines evaluate identically — so even the stubbed multimodal
# path is hash-verified end-to-end, not rows-only. (A real decoder
# would be rows-only again; the plumbing under it stays proven.)
_FEATURES_ORACLE = """
    WITH media AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
               hex(encode(text)) AS hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS n
        FROM documents
    ),
    bytes AS (
        SELECT doc_id, t.i AS i,
               CAST('0x' || substring(hx, CAST(2 * t.i + 1 AS INT), 2) AS BIGINT) AS b
        FROM media, unnest(range(0, n)) AS t(i)
    ),
    chk AS (SELECT doc_id, SUM(b) % 997 AS checksum FROM bytes GROUP BY doc_id),
    dims AS (
        SELECT doc_id, n, greatest(n // 4, 1) AS chunk, d.d AS dim
        FROM media, unnest(range(0, 4)) AS d(d)
    ),
    win AS (
        -- python: window = payload[dim*chunk:(dim+1)*chunk] or payload[-chunk:]
        SELECT doc_id, dim,
               CASE WHEN dim * chunk < n THEN dim * chunk ELSE n - chunk END AS lo,
               CASE WHEN dim * chunk < n THEN least((dim + 1) * chunk, n) ELSE n END AS hi
        FROM dims
    ),
    feat AS (
        SELECT w.doc_id, w.dim,
               SUM(b.b) * 1.0 / (255.0 * (w.hi - w.lo)) AS m
        FROM win w
        JOIN bytes b ON b.doc_id = w.doc_id AND b.i >= w.lo AND b.i < w.hi
        GROUP BY w.doc_id, w.dim, w.hi, w.lo
    ),
    feats AS (
        -- fixed-point string form: the driver's canonicalizer sorts a
        -- pandas frame by every column and crashes on list cells
        -- (unhashable) — so the feature vector is serialized to
        -- '123456,...,999999' (floor(m*1e6+0.5) per dim) on BOTH engines
        SELECT doc_id,
               string_agg(CAST(CAST(floor(m * 1000000 + 0.5) AS BIGINT) AS VARCHAR),
                          ',' ORDER BY dim) AS feature
        FROM feat GROUP BY doc_id
    )
    SELECT m.doc_id, m.media_type, m.n AS n_bytes,
           -- CAST: SUM(...) is HUGEINT -> pandas float64 vs Spark int64
           CAST(COALESCE(c.checksum, 0) AS BIGINT) AS checksum,
           COALESCE(f.feature, '0,0,0,0') AS feature
    FROM media m
    LEFT JOIN chk c USING (doc_id)
    LEFT JOIN feats f USING (doc_id)
"""


def features_frame(media: DataFrame) -> DataFrame:
    """Array-typed feature extraction over binary payloads via iterator
    mapInPandas (Arrow-batched): per row, byte length, checksum, and a
    fixed-dim fake feature vector standing in for the stubbed decoder
    (decode_image). This is the production output shape — downstream
    similarity/dedup operators consume the array<double> column
    directly (tests/test_llm.py pins batch shape + determinism)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(lambda b: sum(b) % 997).astype("int64"),
                    "feature": payloads.map(fake_features),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


@register(
    "q_multimodal_features",
    oracle=_FEATURES_ORACLE,
    doc=(
        "Feature extraction over binary payloads via iterator mapInPandas "
        "(Arrow-batched): per row, byte length, checksum, and a fixed-dim fake "
        "feature vector standing in for the stubbed decoder (decode_image). "
        "The fake is pure byte arithmetic, so the DuckDB oracle reproduces it "
        "bit-exactly (hex-parse the blob). The registered form serializes the "
        "vector to a fixed-point string ('123456,...,999999', floor(x*1e6+0.5) "
        "per dim) because the driver's canonicalizer sorts a pandas frame by "
        "all columns and crashes on unhashable array cells (CORRECTNESS_r02); "
        "the array<double> production shape stays available as features_frame. "
        "tests/test_llm.py pins batch shapes and determinism."
    ),
    tags=("extension", "multimodal"),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    arr = features_frame(media_table(spark, sf_dir))
    fixed = F.transform(
        "feature",
        lambda x: F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("string"),
    )
    return arr.withColumn("feature", F.concat_ws(",", fixed))


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL RESIZE STUB: `PIL.Image.open(...).resize((width, height))`
    on a production cluster — no codecs in this container."""
    raise NotImplementedError("no media codecs in this environment; see fake_resize")


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in with a real extractor's contract: output
    length scales with the requested dimensions (repeat/truncate the
    payload to width*height bytes)."""
    target = max(1, width * height)
    if not payload:
        return b"\x00" * target
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def sample_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """REAL FRAME-SAMPLE STUB: ffmpeg/decord keyframe sampling on a
    production cluster."""
    raise NotImplementedError("no media codecs in this environment; see fake_sample_frames")


def fake_sample_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in: n_frames evenly spaced byte windows —
    the (video -> list<binary> frames) column shape downstream
    per-frame operators consume via explode."""
    if not payload:
        return [b""] * n_frames
    chunk = max(1, len(payload) // n_frames)
    return [payload[i * chunk : (i + 1) * chunk] or payload[-chunk:] for i in range(n_frames)]


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


# Frame oracle: the fake sampler is pure byte slicing, so DuckDB
# reproduces each frame with hex substring over the utf-8 payload.
# The frame is emitted as a LOWERCASE HEX STRING, not a blob: DuckDB
# blobs reach pandas as bytearray (unhashable), which crashes the
# driver's sort-based canonicalizer — same class as the r2
# q_multimodal_features failure, caught by the hardened local gate.
_FRAMES_ORACLE = """
    WITH media AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS n
        FROM documents
    ),
    dims AS (
        SELECT doc_id, hx, n, greatest(n // 3, 1) AS c, f.f AS frame_id
        FROM media, unnest(range(0, 3)) AS f(f)
    )
    SELECT doc_id,
           CAST(frame_id AS INTEGER) AS frame_id,
           lower(CASE WHEN frame_id * c < n
                THEN substring(hx, CAST(2 * frame_id * c + 1 AS INT),
                         CAST(2 * (least((frame_id + 1) * c, n) - frame_id * c) AS INT))
                ELSE substring(hx, CAST(2 * (n - c) + 1 AS INT),
                               CAST(2 * c AS INT))
           END) AS frame_hex,
           CAST(CASE WHEN frame_id * c < n
                     THEN least((frame_id + 1) * c, n) - frame_id * c
                     ELSE c END AS BIGINT) AS frame_bytes
    FROM dims
"""


def frames_frame(media: DataFrame, n_frames: int = 3) -> DataFrame:
    """Binary-typed frame sampling: mapInPandas explodes each payload
    into n_frames fixed-stride frames (decode stubbed: sample_frames ->
    fake_sample_frames), yielding the (doc, frame_id, frame binary)
    layout per-frame feature extraction consumes. Production shape."""

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_id": [], "frame": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, fr in enumerate(fake_sample_frames(bytes(payload), n_frames)):
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(i)
                    out["frame"].append(fr)
                    out["frame_bytes"].append(len(fr))
            yield pd.DataFrame(out)

    return media.mapInPandas(explode_frames, schema=FRAMES_SCHEMA)


@register(
    "q_frame_sample",
    oracle=_FRAMES_ORACLE,
    doc=(
        "Video-style frame sampling over binary payloads: mapInPandas explodes "
        "each payload into 3 fixed-stride frames (decode stubbed: sample_frames "
        "-> fake_sample_frames). The fake sampler is pure byte slicing, so the "
        "DuckDB oracle reproduces every frame bit-exactly via hex substring. "
        "The registered form emits the frame as a lowercase hex STRING: DuckDB "
        "blobs reach the driver's pandas canonicalizer as unhashable bytearray "
        "cells and crash its sort (the r2 q_multimodal_features class); the "
        "binary production shape stays available as frames_frame. Batch shape "
        "and determinism pinned in tests/test_llm.py."
    ),
    tags=("extension", "multimodal"),
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frames_frame(media_table(spark, sf_dir), n_frames=3)
    return frames.select(
        "doc_id",
        "frame_id",
        F.lower(F.hex("frame")).alias("frame_hex"),
        "frame_bytes",
    )
