"""applyInPandasWithState: per-user running state across microbatches
must converge to the batch aggregate over the same rows."""

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.mark.slow
def test_stateful_tracker_converges_to_batch(spark, tmp_path):
    from pythonvectordb_spark.sources.testdata import load_table
    from pythonvectordb_spark.streaming.stateful import user_activity_tracker

    events = load_table(spark, SF_SMOKE, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "src")
    # several files -> several microbatches worth of state updates
    events.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    # one file per trigger => state genuinely accumulates across batches
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        user_activity_tracker(stream)
        .writeStream.format("memory")
        .queryName("tracker_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # the LAST emitted row per user is the converged state
    out = spark.sql(
        """
        SELECT user_id, n_events, value_cents FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM tracker_out
        ) WHERE rn = 1
        """
    )
    got = {(r.user_id, r.n_events, r.value_cents) for r in out.collect()}
    want = {
        (r.user_id, r.n_events, r.value_cents)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
        )
        .collect()
    }
    # value_cents via per-batch float-sum rounding can differ by a cent on
    # batch boundaries; require exact count match and cents within 1
    got_map = {u: (n, c) for u, n, c in got}
    want_map = {u: (n, c) for u, n, c in want}
    assert set(got_map) == set(want_map)
    for u in want_map:
        assert got_map[u][0] == want_map[u][0], f"user {u} count"
        assert abs(got_map[u][1] - want_map[u][1]) <= 1, f"user {u} cents"
