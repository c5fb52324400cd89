"""Watermarked streaming dedup must keep exactly one row per key and
match the batch twin's key set (sf0.001 events with injected duplicates)."""

import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdirs(tmp_path):
    d = {"src": str(tmp_path / "src"), "chk": str(tmp_path / "chk")}
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_stream_dedup_matches_batch(spark, tmpdirs):
    from pythonvectordb_spark.sources.testdata import load_table
    from pythonvectordb_spark.streaming.dedup import dedup_stream

    ev = load_table(spark, SF_SMOKE, "events")
    # duplicate every event (two source files with the same rows)
    dup = ev.unionByName(ev)
    dup.repartition(4).write.parquet(tmpdirs["src"])

    n_keys = ev.select("event_id").distinct().count()
    assert dedup_stream(dup, ["event_id"]).count() == n_keys  # batch twin

    stream = spark.readStream.schema(ev.schema).parquet(tmpdirs["src"])
    q = (
        dedup_stream(stream, ["event_id"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", tmpdirs["chk"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("dedup_out")
    assert out.count() == n_keys
    assert out.select("event_id").distinct().count() == n_keys
