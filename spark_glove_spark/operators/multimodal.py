"""Multimodal (image/audio/video) column plumbing (north-star item).

Contract per the task definition: media lives as opaque ``binary``
columns with typed metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas kernels over ``mapInPandas``.
The image/audio codec libraries are NOT in this container, so the
codec call itself is stubbed (``decode_media`` raises
NotImplementedError unless a known deterministic fake format is used)
— but everything Spark-side is real and tested: the binary schema, the
mapInPandas batch shapes, partitioning, and the metadata pipeline.

The fixture media table is synthesized deterministically from the
``documents`` fixture (content = UTF-8 bytes of the text, media type
cycled by doc_id), so row counts and byte-level results are stable and
the byte-plumbing query is fully DuckDB-oracle-checked.

At 100 TB: binary payloads dominate row size — keep them OUT of
shuffles (derive features first, shuffle features only), write media
tables partitioned by media_type, and size
``spark.sql.execution.arrow.maxRecordsPerBatch`` down (payloads are
MBs, not bytes) so Arrow batches fit executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_glove_spark.registry import query
from spark_glove_spark.sources import parallelized, table

MEDIA_TYPES = ["image", "audio", "video"]


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized media table: (item_id, media_type, content binary,
    meta struct). Deterministic — derived from the documents fixture."""
    d = parallelized(table(spark, sf_dir, "documents"))
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("item_id"),
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.col("n_chars").alias("n_bytes_declared"),
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_media(content: bytes, media_type: str):
    """Codec stub: real deployments plug PIL / torchaudio / pyav here.

    This container has none of them, so any real decode request fails
    loudly rather than fabricating pixels."""
    raise NotImplementedError(
        f"no {media_type} codec available in this environment; "
        "install pillow/torchaudio/pyav and replace decode_media"
    )


def _byte_stats_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Feature extraction over binary payloads — the Arrow batch shape
    a real decoder would use (bytes in, fixed-width features out)."""
    for pdf in batches:
        if pdf.empty:
            continue
        feats = []
        for item_id, content in zip(pdf["item_id"], pdf["content"]):
            b = bytes(content)
            n = len(b)
            arr = np.frombuffer(b, dtype=np.uint8)
            mean = float(arr.mean()) if n else 0.0
            var = float(arr.var()) if n else 0.0
            feats.append(
                {
                    "item_id": int(item_id),
                    "n_bytes": n,
                    "byte_mean": round(mean, 6),
                    "byte_var": round(var, 6),
                    "head_hex": b[:4].hex(),
                }
            )
        yield pd.DataFrame(feats)


@query(
    "mm_byte_plumbing",
    section="J5,G7",
    oracle="""
SELECT doc_id AS item_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       lower(hex(substring(text, 1, 4))) AS head_hex,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type
FROM documents
""",
)
def mm_byte_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing, fully oracle-checked: payload length and

    head bytes survive the encode→binary→expression round trip
    exactly."""
    m = media_table(spark, sf_dir)
    return m.select(
        "item_id",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring("content", 1, 4))).alias("head_hex"),
        "media_type",
    )


@query("mm_feature_extract", section="J5")
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (byte
    moments stand in for codec features; same batch shape). Rows-only:
    deterministic, row count == documents count."""
    m = media_table(spark, sf_dir)
    return m.select("item_id", "content").mapInPandas(
        _byte_stats_kernel,
        schema="item_id long, n_bytes long, byte_mean double, byte_var double, head_hex string",
    )


@query(
    "mm_frame_sample",
    section="J5,G6",
    oracle="""
SELECT doc_id AS item_id,
       CAST((octet_length(encode(text)) + 9) // 10 AS BIGINT) AS n_frames
FROM documents
WHERE doc_id % 3 = 2
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' items: every 10th byte is a 'frame'

    boundary (stand-in for keyframe extraction); frame COUNT is
    oracle-checked, the frames themselves stay binary-side."""
    m = media_table(spark, sf_dir).where(F.col("media_type") == "video")
    n = F.octet_length("content")
    return m.select(
        "item_id",
        F.ceil(n / 10.0).cast("long").alias("n_frames"),
    )


def _resize_kernel(stride: int):
    """Stride-downsample of the payload — the deterministic stand-in
    for a codec resize (PIL/libvips plugs in here; batch shape, schema
    and memory profile are identical to the real thing)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"item_id": [], "content_resized": [], "n_bytes_in": [], "n_bytes_out": []}
            for item_id, content in zip(pdf["item_id"], pdf["content"]):
                b = bytes(content)
                small = b[::stride]
                out["item_id"].append(int(item_id))
                out["content_resized"].append(small)
                out["n_bytes_in"].append(len(b))
                out["n_bytes_out"].append(len(small))
            yield pd.DataFrame(out)

    return kernel


@query(
    "mm_resize",
    section="J5,G5",
    oracle="""
SELECT doc_id AS item_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_in,
       CAST((octet_length(encode(text)) + 3) // 4 AS BIGINT) AS n_bytes_out
FROM documents
WHERE doc_id % 3 = 0
""",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize for 'image' items: stride-4 downsample via mapInPandas.
    The resized payload stays binary-side (never shuffled, never
    compared); the size arithmetic — ceil(n/4) — is oracle-checked, so
    the kernel's input/output contract is verified even though the
    codec itself is a stub (no image libs in this container)."""
    m = media_table(spark, sf_dir).where(F.col("media_type") == "image")
    out = m.select("item_id", "content").mapInPandas(
        _resize_kernel(4),
        schema="item_id long, content_resized binary, n_bytes_in long, n_bytes_out long",
    )
    return out.select("item_id", "n_bytes_in", "n_bytes_out")
