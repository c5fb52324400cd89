"""Readers for the driver-generated parquet tables (TESTDATA.md).

At 100 TB these would be partitioned/bucketed tables behind a catalog;
here they are single parquet files per table. All access is via
``spark.read.parquet`` so Catalyst gets column pruning + predicate
pushdown into the scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    # Queries parse timestamp literals and render dates in the SESSION
    # timezone; the DuckDB oracle is timezone-naive. Under an externally
    # created session (the driver's) a non-UTC zone would shift date
    # filters/formatting — pin UTC before any plan is built. Also apply
    # the engine's runtime-settable tuning (harmless if already set).
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.shuffle.partitions", "32"),
    ):
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass
    if name == "events":
        # must also work under externally-created sessions (the driver's):
        # the conf is runtime-settable and required before the scan plans
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark's reader
        # rejects; with nanosAsLong (set in session.get_spark) it arrives
        # as a nanosecond long. Truncating to microseconds via integer
        # division matches DuckDB's native ns->us truncation exactly.
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (enables spark.sql)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
