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
        ("spark.sql.join.preferSortMergeJoin", "false"),
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
        # events.ts has shipped as TIMESTAMP(NANOS) parquet in some driver
        # rounds, which Spark's reader rejects; with nanosAsLong (set in
        # session.get_spark) it arrives as a nanosecond long. Truncating to
        # microseconds via integer division matches DuckDB's ns->us
        # truncation exactly.
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Timezone-naive parquet timestamps (isAdjustedToUTC=false) arrive as
    # TIMESTAMP_NTZ under Spark 4's default inference. The engine's temporal
    # operators use instant-based functions (unix_micros, window ranges)
    # that require TIMESTAMP_LTZ; with the session pinned to UTC above, the
    # NTZ->LTZ cast reinterprets the same wall-clock as the same instant, so
    # this is a pure type normalization — values, and DuckDB oracle parity,
    # are unchanged.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (enables spark.sql)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
