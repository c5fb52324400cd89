"""Plan advisor: each anti-pattern detector must fire on a plan built to
exhibit it and stay quiet on the engine's own (deliberately clean)
flagship plans."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


def _codes(findings):
    return {f.code for f in findings}


def test_flags_cartesian(spark, events):
    from pythonvectordb_spark.plans.advisor import advise

    small = events.limit(5).select(F.col("event_id").alias("b_id"))
    cross = events.crossJoin(small)
    # a crossJoin surfaces as CartesianProduct or BroadcastNestedLoopJoin
    # depending on size estimates — either way the advisor must object
    assert _codes(advise(cross)) & {"cartesian-product", "nested-loop-join"}


def test_flags_python_row_udf(spark, events):
    from pyspark.sql.types import DoubleType

    from pythonvectordb_spark.plans.advisor import advise

    slow = F.udf(lambda x: x * 2.0, DoubleType())
    df = events.select(slow("value").alias("v2"))
    found = advise(df)
    assert "python-row-udf" in _codes(found)
    assert found[0].severity == "high"  # sorted most-severe first


def test_flags_unpushed_filter(spark, events):
    from pyspark.sql.types import BooleanType

    from pythonvectordb_spark.plans.advisor import advise

    pred = F.udf(lambda x: x > 100.0, BooleanType())
    df = events.filter(pred("value"))
    assert "unpushed-filter" in _codes(advise(df))


def test_flags_global_sort_but_not_topk(spark, events):
    from pythonvectordb_spark.plans.advisor import advise

    assert "global-sort" in _codes(advise(events.orderBy("value")))
    assert "global-sort" not in _codes(advise(events.orderBy("value").limit(10)))


def test_flags_union_recompute(spark, events):
    from pythonvectordb_spark.plans.advisor import advise

    agg = events.groupBy("user_id").agg(F.sum("value").alias("s"))
    # regression twin: the same expensive subtree under two union branches
    assert "union-recompute" in _codes(advise(agg.union(agg)))
    # ... and under two self-join sides
    sj = agg.alias("a").join(
        agg.alias("b"), F.col("a.user_id") == F.col("b.user_id")
    )
    assert "union-recompute" in _codes(advise(sj))


def test_union_recompute_respects_checkpoints_and_caches(spark, events):
    """The sanctioned fan-out patterns must stay silent: reads of one
    localCheckpoint (cached blocks), reads of one .cache()d frame, and
    unions of genuinely different pipelines."""
    from pythonvectordb_spark.plans.advisor import advise

    agg = events.groupBy("user_id").agg(F.sum("value").alias("s"))
    cp = agg.localCheckpoint(eager=True)
    assert "union-recompute" not in _codes(advise(cp.union(cp)))
    cached = agg.cache()
    try:
        assert "union-recompute" not in _codes(advise(cached.union(cached)))
    finally:
        cached.unpersist()
    other = (
        events.groupBy("event_type")
        .agg(F.sum("value").alias("s"))
        .select(F.col("event_type").cast("long").alias("user_id"), "s")
    )
    assert "union-recompute" not in _codes(advise(agg.union(other)))


def test_clean_plans_stay_clean(spark):
    from pythonvectordb_spark.plans.advisor import advise
    from pythonvectordb_spark.registry import QUERIES

    # the flagship exact search and the pushdown-pinned filtered variant
    for name in ("knn_search", "knn_search_filtered", "pricing_summary"):
        found = advise(QUERIES[name](spark, SF_SMOKE))
        assert not {"cartesian-product", "python-row-udf"} & _codes(found), name


@pytest.mark.slow
def test_registry_has_no_scale_killers(spark):
    """Self-audit: NO registered query may plan a cartesian product, a
    row-at-a-time Python UDF, or a duplicated expensive subtree (the
    union-recompute class — every fan-out must be an explode and every
    multiply-read frame checkpointed; the UDTF surface is exempt by
    design — UDTFs have no Arrow mode and the advisor classes them
    separately)."""
    from pythonvectordb_spark.plans.advisor import advise
    from pythonvectordb_spark.registry import QUERIES

    flagged = {}
    for name, fn in QUERIES.items():
        bad = [
            f.code
            for f in advise(fn(spark, SF_SMOKE))
            if f.code in ("cartesian-product", "python-row-udf", "union-recompute")
        ]
        if bad:
            flagged[name] = bad
    assert not flagged, f"scale-killer plans in registry: {flagged}"


def test_als_blocked_recommend_not_a_cartesian(spark):
    """MLlib's recommendForUserSubset plans a blocked factor
    cross-product by design; the advisor must class it
    `mllib-blocked-recommend`, not the cartesian bug class — while a
    REAL accidental cartesian stays flagged."""
    from pyspark.ml.recommendation import ALS
    from pyspark.sql import functions as F

    from pythonvectordb_spark.plans.advisor import advise

    inter = spark.createDataFrame(
        [(u, i, 1.0) for u in range(12) for i in range(8) if (u + i) % 3],
        "user int, item int, cnt double",
    )
    model = ALS(
        rank=2, maxIter=2, implicitPrefs=True, seed=42,
        userCol="user", itemCol="item", ratingCol="cnt",
    ).fit(inter)
    recs = model.recommendForUserSubset(inter.select("user").distinct(), 3)
    codes = _codes(advise(recs))
    assert "cartesian-product" not in codes
    assert "mllib-blocked-recommend" in codes
    # control: a genuine cartesian is still the bug class (hinted so
    # the tiny frames don't degrade to a broadcast nested loop)
    a = spark.range(10).select(F.col("id").alias("x"))
    b = spark.range(10).select(F.col("id").alias("y"))
    assert "cartesian-product" in _codes(
        advise(a.crossJoin(b.hint("shuffle_replicate_nl")))
    )
    # tightened control (ADVICE r8): a genuine cartesian that is
    # ADJACENT to a recommend frame — here, directly ABOVE one, with
    # ALS machinery throughout its left subtree — must still flag; the
    # exemption requires the recommendation class in BOTH direct child
    # branches of the cartesian node itself
    leak = recs.select("user").crossJoin(b.hint("shuffle_replicate_nl"))
    codes_leak = _codes(advise(leak))
    assert "cartesian-product" in codes_leak
