"""Training-data export: the last mile of a pretraining pipeline — a
deterministic global shuffle of the curated corpus into N equal shards,
written so a data loader can stream them without any further shuffling.

No reference analogue (the reference stops at vector storage/search,
pythonvectordb.py:25-659); this is part of the driver mandate's
"operations a large-scale training-data pipeline would need".

Design for 100 TB:

- Shard assignment is a pure projection: ``md5(id) mod n_shards``. No
  global sort, no sampled range boundaries, no driver coordination —
  every task can place every row independently, and the assignment is
  stable across retries, engines, and partition layouts (the same
  replayable-hash-gate contract as ``curation.stratified_sample``).
  A hash mod is also the anti-skew choice: md5 scatters adjacent ids,
  so shard sizes concentrate tightly around corpus_size / n_shards
  regardless of how the input was ordered or clustered.
- Within a shard, order is ``md5(id)`` too: reading a shard start to
  finish IS the deterministic document-level shuffle training wants —
  no loader-side shuffle buffer needed for document order.
- The write is one ``repartition(n_shards, shard)`` shuffle (each shard
  lands as one file sequence) — the only wide stage, and it moves each
  row exactly once. At 100 TB with 1024 shards that is ~100 GB per
  shard task tree; set ``spark.sql.shuffle.partitions`` >= n_shards so
  AQE can split hot partitions if the id space were ever adversarial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "assign_shards",
    "shard_stats",
    "write_training_shards",
    "interleave_audit",
]


def _shard_col(id_col: str, n_shards: int):
    # First 8 md5 hex chars -> bigint -> mod. 32 bits of hash is plenty
    # for shard balance; parsing only 8 chars keeps the DuckDB oracle
    # expression (('0x' || substr(md5(..),1,8))::BIGINT % n) exact —
    # both engines stay far below 2^63.
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(int(n_shards))).cast("int")


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a deterministic ``shard`` column (``md5(id) mod n_shards``)
    and a ``shard_key`` (the full md5) that orders rows within a shard.

    Pure projection — no shuffle, no rng, no driver state."""
    return df.withColumn("shard", _shard_col(id_col, n_shards)).withColumn(
        "shard_key", F.md5(F.col(id_col).cast("string"))
    )


def shard_stats(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest: document count, token total (when
    ``token_col`` is given), and the first/last within-shard order keys
    — what an export job writes next to the shards so the training
    launcher can plan loader parallelism without listing files.

    One map-side-combined shuffle on the (tiny) shard key space."""
    d = assign_shards(df, n_shards, id_col)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("shard_key").alias("first_key"),
        F.max("shard_key").alias("last_key"),
    ]
    if token_col is not None:
        aggs.insert(1, F.sum(token_col).cast("long").alias("n_tokens"))
    return d.groupBy("shard").agg(*aggs)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> None:
    """Write the corpus as ``n_shards`` hash shards under ``path``
    (``shard=K/`` hive dirs), each sorted by ``shard_key`` so a
    sequential read of one shard is already document-shuffled.

    ``repartition`` on the shard id is the single wide stage;
    ``sortWithinPartitions`` is a task-local sort (no extra shuffle).
    The sort leads with ``shard`` so it already satisfies the dynamic-
    partition writer's required ordering — otherwise the writer re-sorts
    by partition column alone (not stable), scrambling shard_key order
    inside each shard file."""
    d = assign_shards(df, n_shards, id_col)
    (
        d.repartition(int(n_shards), "shard")
        .sortWithinPartitions("shard", "shard_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def interleave_audit(
    df: DataFrame,
    n_blocks: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    token_col: str | None = None,
) -> DataFrame:
    """Mixing audit for the deterministic global shuffle: slice the md5
    hash space into ``n_blocks`` EQUAL RANGES (``floor(h32 * n / 2^32)``
    — order-preserving, so block k is exactly the k-th contiguous run of
    the shard-key order that ``write_training_shards`` lays down) and
    report, per block, how well-mixed a sequential reader's window is:

    (block, n_docs, n_tokens?, n_sources, top_source_share)

    ``top_source_share`` = largest single source's fraction of the
    block's docs. A healthy hash shuffle gives every block ~the corpus
    source distribution; a block whose share spikes means id-space
    clustering leaked through (e.g. ids assigned per-crawl AND a hash
    collision-prone id scheme) and a training run would see correlated
    batches. This is the check run BEFORE burning cluster-months.

    Scale shape: pure-projection block id (integer multiply + shift, no
    sort, no window), one (block, source) map-side-combined agg, then a
    tiny (block) agg — shuffle keys are n_blocks x n_sources.
    """
    h32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    # h32 in [0, 2^32); h32 * n < 2^63 for any sane n -> exact bigint
    # math; >> 32 is the floor divide by 2^32
    block = F.shiftright(h32 * F.lit(int(n_blocks)), 32).cast("int")
    d = df.select(
        block.alias("block"),
        F.col(source_col).alias("source"),
        *( [F.col(token_col).alias("n_tok")] if token_col else [] ),
    )
    per_bs = d.groupBy("block", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bs"),
        *( [F.sum("n_tok").cast("long").alias("t_bs")] if token_col else [] ),
    )
    aggs = [
        F.sum("n_bs").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.round(
            F.max("n_bs").cast("double") / F.sum("n_bs").cast("double"), 9
        ).alias("top_source_share"),
    ]
    if token_col:
        aggs.insert(1, F.sum("t_bs").cast("long").alias("n_tokens"))
    return per_bs.groupBy("block").agg(*aggs)
