"""Readers for the driver-generated parquet tables (TESTDATA.md).

At 100 TB these would be partitioned/bucketed tables behind a catalog;
here they are single parquet files per table. All access is via
``spark.read.parquet`` so Catalyst gets column pruning + predicate
pushdown into the scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (enables spark.sql)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
