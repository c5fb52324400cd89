"""Local replica of the driver's oracle comparison: row-count + schema +
order-insensitive value comparison between a Spark DataFrame and DuckDB SQL
over the same parquet tables."""

from __future__ import annotations

import math

import duckdb

from pythonvectordb_spark.sources.testdata import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "tolist"):  # numpy scalar/array
        return _canon(v.tolist())
    return v


def rowset(rows, colnames):
    """Order-insensitive canonical rowset with columns sorted by name."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    sp_rows = [tuple(r) for r in spark_df.collect()]
    sp_cols = spark_df.columns
    duck = con.execute(sql)
    d_cols = [d[0] for d in duck.description]
    d_rows = duck.fetchall()
    if sorted(sp_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(sp_cols)} duck={sorted(d_cols)}"
    if len(sp_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(sp_rows)} duck={len(d_rows)}"
    a, b = rowset(sp_rows, sp_cols), rowset(d_rows, d_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
