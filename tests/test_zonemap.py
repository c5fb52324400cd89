"""Zone-map data skipping: the manifest must be exact per file, the
pruned read must equal the full-scan filter, and a clustered layout must
actually skip files (while a spanning predicate degrades gracefully)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    # events written range-clustered on value: narrow zones per file
    out = str(tmp_path_factory.mktemp("zones") / "events")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ev.repartitionByRange(8, "value").write.parquet(out)
    return out


def test_manifest_is_exact(spark, clustered):
    from pythonvectordb_spark.sources.zonemap import build_zone_map

    df = spark.read.parquet(clustered)
    zm = build_zone_map(df, ["value"]).collect()
    assert sum(r.n_rows for r in zm) == df.count()
    whole = df.agg(F.min("value"), F.max("value")).first()
    assert min(r.min_value for r in zm) == whole[0]
    assert max(r.max_value for r in zm) == whole[1]


def test_pruned_read_equals_full_filter_and_skips_files(spark, clustered):
    from pythonvectordb_spark.sources.zonemap import (
        build_zone_map,
        pruned_read,
        zone_files_for_range,
    )

    df = spark.read.parquet(clustered)
    zm = build_zone_map(df, ["value"])
    lo, hi = 10.0, 20.0
    got = pruned_read(spark, zm, "value", lo, hi)
    want = df.filter((F.col("value") >= lo) & (F.col("value") <= hi))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # the range-clustered layout must let a narrow range skip most files
    n_files = zm.count()
    n_hit = len(zone_files_for_range(zm, "value", lo, hi))
    assert n_hit < n_files, f"no skipping: {n_hit}/{n_files}"


def test_empty_range_returns_typed_empty(spark, clustered):
    from pythonvectordb_spark.sources.zonemap import build_zone_map, pruned_read

    df = spark.read.parquet(clustered)
    zm = build_zone_map(df, ["value"])
    out = pruned_read(spark, zm, "value", 1e12, 2e12)
    assert out.count() == 0
    assert out.schema == df.schema
