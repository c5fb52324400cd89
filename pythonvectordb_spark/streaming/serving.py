"""Streaming query serving: a stream of *query vectors* scored against
the static vector table — the closest Spark gets to the reference's
online ``search`` loop, expressed as Structured Streaming.

Shape: ``readStream`` of (query_id, embedding) -> per-microbatch
``knn_join`` against the cached table -> append sink. Each microbatch is
one bounded batched-knn job, so throughput is the batched-knn throughput
(bench: ~1200+ qps at the 50k-vector regime) and latency is the
microbatch interval + job time. BASELINE.md documents the single-query
latency mismatch vs the reference's in-process ~1 ms; this is the
serving architecture that amortizes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_knn_serving(
    query_stream: DataFrame,
    table: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "qvec_query",
) -> StreamingQuery:
    """Serve a stream of query vectors with top-k results appended to
    parquet. ``table`` should be a cached qvec table (with_qvec + persist);
    the dup-free append semantics come from the checkpoint."""
    from pythonvectordb_spark.operators.search import knn_join

    def serve_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        out = knn_join(table, batch, k=k, query_id=query_id, query_vec=query_vec)
        out.write.mode("append").parquet(output_dir)

    return (
        query_stream.writeStream.foreachBatch(serve_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
