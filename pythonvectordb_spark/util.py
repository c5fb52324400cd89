"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the input has too few partitions for the
    cluster (e.g. one small parquet file -> one partition -> one core does
    all the per-row work). On a real multi-file/partitioned table this is
    a no-op, so no gratuitous shuffle at scale.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, 8):
        return df.repartition(target)
    return df
