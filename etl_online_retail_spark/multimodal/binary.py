"""Opaque-binary media columns + Arrow-batched feature extraction.

Pattern: media rows are (id, content: binary, meta: struct<mime,size>);
decode / feature-extract / resize / frame-sample run as mapInPandas over
Arrow batches - the only layer that should ever hold raw bytes in Python.
Batch sizing: binary payloads dominate memory, so real deployments set
spark.sql.execution.arrow.maxRecordsPerBatch to keep
(records x avg_payload) within executor memory; the plumbing here is
payload-size-agnostic.

The codec step is STUBBED (no PIL/ffmpeg in this container): decode_*_stub
raises NotImplementedError if called for real, and binary_features extracts
deterministic byte-level features (length, header hex) so the full Spark
path - binary column -> Arrow batch -> pandas -> result schema - executes
and is oracle-checkable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("byte_len", T.IntegerType()),
    T.StructField("header_hex", T.StringType()),
])


def to_media_table(docs: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "text",
                   mime: str = "application/octet-stream") -> DataFrame:
    """Build a media table from any source column by treating its UTF-8
    bytes as the opaque payload (stand-in for real image/audio ingestion,
    which would arrive as binary already)."""
    content = F.encode(F.col(payload_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(content).cast("long").alias("size_bytes"),
        ).alias("meta"),
    )


def binary_features(media: DataFrame, header_bytes: int = 8) -> DataFrame:
    """Arrow-batched byte-level feature extraction via mapInPandas.

    This is the exact plumbing a real decoder uses (same batch shape, same
    schema contract); only the per-payload function differs. Deterministic,
    so a SQL oracle can verify the full path.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "byte_len": payloads.map(len).astype("int32"),
                "header_hex": payloads.map(
                    lambda b: bytes(b)[:header_bytes].hex().upper()),
            })

    return media.select("media_id", "content").mapInPandas(extract, FEATURE_SCHEMA)


def decode_image_stub(content: bytes) -> dict:
    """Placeholder for the real image decode (PIL.Image.open etc.).

    The container ships no imaging libraries; a deployment would replace
    this body and keep every signature/schema above unchanged.
    """
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; binary_features demonstrates the full Spark plumbing"
    )


def frame_sample_stub(content: bytes, every_n: int = 30) -> list[bytes]:
    """Placeholder for video frame sampling (ffmpeg/pyav)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/pyav, not present here"
    )
