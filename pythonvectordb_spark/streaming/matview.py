"""Incrementally-maintained aggregate snapshot ("materialized view") via
``foreachBatch`` merge — the streaming upsert pattern the reference's
in-place mutable state maps to in Spark (SURVEY.md §2.7/§2.10).

Each micro-batch folds its partial aggregate into the stored per-key
totals and atomically swaps the snapshot directory, so readers always see
a complete view.  A ``_last_batch.json`` transaction marker makes the
merge idempotent under foreachBatch's at-least-once replay: a re-delivered
batch_id is skipped instead of double-counted.  (Idempotency holds within
a checkpoint lineage — the Structured Streaming contract; replaying from a
fresh checkpoint is a rebuild and should target an empty directory.)

At 100 TB the same shape runs with the view in a transactional table
format; here the swap + marker implement the same reader guarantees on
plain parquet.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

MARKER_FILE = "_last_batch.json"


def _read_marker(target_dir: str) -> int:
    try:
        with open(os.path.join(target_dir, MARKER_FILE)) as f:
            return int(json.load(f)["batch_id"])
    except Exception:
        return -1


def start_user_spend_matview(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain per-user (n_events, value_cents) totals over an event
    stream. Exact-integer aggregates, so merge order never changes the
    result."""

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch_id <= _read_marker(target_dir):
            return  # replayed batch: already folded in
        delta = batch.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
                "value_cents"
            ),
        )
        try:
            current = spark.read.parquet(target_dir)
        except Exception:
            current = None  # first batch: view starts from the delta
        merged = (
            delta
            if current is None
            else current.unionByName(delta)
            .groupBy("user_id")
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("value_cents").cast("long").alias("value_cents"),
            )
        )
        tmp = f"{target_dir}__mv_tmp"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, MARKER_FILE), "w") as f:
            json.dump({"batch_id": batch_id}, f)
        if os.path.exists(target_dir):
            shutil.rmtree(target_dir)
        os.rename(tmp, target_dir)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
