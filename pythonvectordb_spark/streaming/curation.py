"""Streaming corpus curation: the ingest-time half of the curation
pipeline (operators/curation.py) — scrub and screen documents AS they
arrive instead of in a nightly batch.

Both operators are stateless per-row transforms, so they lift onto an
unbounded stream in append mode with no watermark and no state store:
``pii_scrub`` is a pure expression chain; decontamination scores each
document against a STATIC benchmark shingle vocabulary carried as one
broadcast array (the stream-static pattern — the benchmark set is fixed
per deployment, and a per-doc set intersection needs no cross-batch
state). The batch twins are the correctness oracle, pinned by
tests/test_stream_curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pythonvectordb_spark.functions.text import shingles
from pythonvectordb_spark.operators.curation import pii_scrub
from pythonvectordb_spark.operators.dedup import _shingled


def scrub_stream(stream: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII-redact a document stream (stateless transform; works on both
    bounded and unbounded DataFrames)."""
    return pii_scrub(stream, text_col=text_col, id_col=id_col)


def quality_gate_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """Ingest-time quality gate: documents failing the composite
    :func:`~pythonvectordb_spark.operators.curation.quality_filter`
    verdict are dropped the moment they arrive; survivors pass through
    with their original columns plus the verdict (so downstream sinks
    can partition on signals). Stateless single-pass expressions —
    append mode, no watermark, no state store."""
    from pythonvectordb_spark.operators.curation import quality_filter

    gated = quality_filter(
        stream, text_col=text_col, id_col=id_col, keep_columns=True, **thresholds
    )
    return gated.filter(F.col("keep")).drop("keep", "reject_reason")


def chunk_stream(
    stream: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk documents as they arrive (RAG-index ingestion): the batch
    chunker is one stateless explode, so it lifts onto an unbounded
    stream unchanged — each document's chunks are emitted exactly once,
    in the micro-batch that carried the document."""
    from pythonvectordb_spark.operators.textops import chunk_documents

    return chunk_documents(
        stream,
        chunk_tokens=chunk_tokens,
        overlap=overlap,
        text_col=text_col,
        id_col=id_col,
    )


def decontaminate_stream(
    stream: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_common: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag streaming documents overlapping a STATIC benchmark set.

    The benchmark's distinct shingle vocabulary is folded into a single
    array row and broadcast; each arriving document is scored with
    ``size(array_intersect(doc_shingles, vocabulary))`` — a stateless
    per-row decision, made the moment the document arrives. Shingle
    lists are distinct on both sides, so the intersection size equals
    the batch operator's per-doc shared-shingle count exactly.

    At scale the vocabulary of a real eval set is a few hundred thousand
    shingles — comfortably broadcastable; a vocabulary too large to
    broadcast is the batch operator's inverted-index job instead.
    """
    vocab_row = (
        _shingled(benchmark, text_col, id_col, n)
        .select(F.explode("sh").alias("shingle"))
        .agg(F.collect_set("shingle").alias("_vocab"))
    )
    scored = (
        stream.select(F.col(id_col), shingles(text_col, n).alias("_sh"))
        .crossJoin(F.broadcast(vocab_row))
        .select(
            F.col(id_col),
            F.size(F.array_intersect("_sh", "_vocab")).cast("long").alias("n_shared"),
        )
    )
    return scored.filter(F.col("n_shared") >= F.lit(min_common))
