"""Data-layout and scan-pruning: Z-order, snapshot diff, Bloom semi-join, zone-map pruned scans.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import DataFrame, F, SparkSession, load_table


def q_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout envelope: events bucketed by the top 4 bits of the
    Morton key over (user_id, |floor(value)|) masked to 16 bits; each
    bucket's (count, min/max per dimension) is the pruning envelope a
    Z-sorted write turns into parquet footer stats — both dimensions
    bounded at once, which a single-column sort cannot give."""
    from pythonvectordb_spark.operators.layout import zorder_pruning_stats

    ev = load_table(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(65536)).alias("xd"),
        F.pmod(F.abs(F.floor("value")).cast("long"), F.lit(65536)).alias("yd"),
    )
    return zorder_pruning_stats(ev, "xd", "yd", bits=16, bucket_bits=4)


def o_zorder_pruning() -> str:
    zterms = " + ".join(
        f"(((xd >> {i}) & 1) << {2 * i}) + (((yd >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    )
    return f"""
WITH d AS (
  SELECT user_id % 65536 AS xd,
         CAST(abs(floor("value")) AS BIGINT) % 65536 AS yd
  FROM events
),
z AS (SELECT xd, yd, ({zterms}) >> 28 AS zbucket FROM d)
SELECT CAST(zbucket AS INT) AS zbucket, count(*)::BIGINT AS n_rows,
       min(xd)::BIGINT AS x_min, max(xd)::BIGINT AS x_max,
       min(yd)::BIGINT AS y_min, max(yd)::BIGINT AS y_max
FROM z GROUP BY zbucket
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: yesterday's corpus = vec_id % 5 != 4, today's =
    vec_id % 5 != 0 with every vec_id % 11 == 3 vector re-embedded
    (simulated by reversing it) — classify every id as
    added/deleted/changed via one full outer join with exact array
    comparison."""
    from pythonvectordb_spark.operators.layout import snapshot_diff

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 4)
    new = emb.filter(F.col("vec_id") % 5 != 0).withColumn(
        "embedding",
        F.when(F.col("vec_id") % 11 == 3, F.reverse("embedding")).otherwise(
            F.col("embedding")
        ),
    )
    return snapshot_diff(old, new, id_col="vec_id", compare_cols=["embedding"])


def o_snapshot_diff() -> str:
    return """
WITH old AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 != 4),
new AS (
  SELECT vec_id,
         CASE WHEN vec_id % 11 = 3 THEN list_reverse(embedding)
              ELSE embedding END AS embedding
  FROM embeddings WHERE vec_id % 5 != 0
)
SELECT coalesce(o.vec_id, n.vec_id) AS vec_id,
       CASE WHEN o.vec_id IS NULL THEN 'added'
            WHEN n.vec_id IS NULL THEN 'deleted'
            WHEN o.embedding IS DISTINCT FROM n.embedding THEN 'changed'
            ELSE 'unchanged' END AS change
FROM old o FULL OUTER JOIN new n ON o.vec_id = n.vec_id
WHERE CASE WHEN o.vec_id IS NULL THEN 'added'
           WHEN n.vec_id IS NULL THEN 'deleted'
           WHEN o.embedding IS DISTINCT FROM n.embedding THEN 'changed'
           ELSE 'unchanged' END != 'unchanged'
"""


def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi join: per-user event rollups restricted to the
    big-purchase user set (value >= 500 purchases), with the key set
    folded into one broadcast Bloom bitset that prunes the fact scan
    BEFORE the exact semi join. Results are exactly the plain semi
    join's (the Bloom stage only ever passes a superset), so the oracle
    is the plain semi join."""
    from pythonvectordb_spark.operators.layout import bloom_semi_join

    ev = load_table(spark, sf_dir, "events")
    keys = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") >= 500)
    ).select("user_id")
    hits = bloom_semi_join(ev, keys, "user_id")
    return hits.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
    )


def o_bloom_prune_join() -> str:
    return """
SELECT user_id, count(*)::BIGINT AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
WHERE user_id IN (
  SELECT user_id FROM events WHERE event_type = 'purchase' AND "value" >= 500
)
GROUP BY user_id
"""


def q_zone_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data skipping (`sources/zonemap.py`): build the per-file
    (count, min/max) manifest in one grouped scan, turn a value-range
    predicate into the intersecting file list, read ONLY those files,
    re-apply the exact predicate, aggregate. Results are the plain
    filter's by contract (zones pass a superset; the predicate re-check
    makes it exact — same prune-then-verify shape as bloom_prune_join),
    so the oracle is the plain filtered aggregate. The multi-file
    skipping behavior itself is pinned by tests/test_zonemap.py on a
    range-clustered layout."""
    from pythonvectordb_spark.sources.zonemap import build_zone_map, pruned_read

    ev = load_table(spark, sf_dir, "events")
    zm = build_zone_map(ev, ["value"])
    hits = pruned_read(spark, zm, "value", 100.0, 200.0)
    return hits.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
    )


def o_zone_pruned_scan() -> str:
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events WHERE value >= 100.0 AND value <= 200.0
GROUP BY 1
"""
