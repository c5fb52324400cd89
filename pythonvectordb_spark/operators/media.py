"""Multimodal column handling: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` (driver mandate, SURVEY §2.12).

The container has no image/audio codecs, so the *decode* step is a
deterministic stand-in (byte length + md5) behind the same interface a
real decoder would use; the Spark-side plumbing — binary column, schema,
batch iteration, partition behavior — is real and oracle-checked.
A real deployment swaps ``_decode_batch``'s body for PIL/ffmpeg calls;
nothing else changes.

Scale notes: mapInPandas streams Arrow batches (no per-row Python), media
payloads stay in executor memory one batch at a time, and feature
extraction parallelizes per partition — the standard 100 TB media-ETL
shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("content_md5", StringType()),
    ]
)


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stub decoder: byte length + md5 of the payload.

    Replace the body with a real decode (image resize, audio resample,
    frame sampling) — the Arrow batch shape and output schema stay put.
    """
    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payload.map(len).astype("int32"),
                "content_md5": payload.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


def media_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Extract features from a binary media column via mapInPandas."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_decode_batch, MEDIA_FEATURE_SCHEMA)


def text_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Treat utf-8 text bytes as an opaque media payload (the testdata has
    no binary column; this builds one deterministically)."""
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("payload")
    )


def decode_media_stub_real() -> None:
    """Marker for the genuinely-unimplementable step in this container:
    actual image/audio decoding requires codec libraries not installed
    here."""
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg; _decode_batch is the "
        "deterministic stand-in wired through the same mapInPandas path"
    )
