"""Layout/pruning operators: Z-order envelope property, snapshot diff
classification, Bloom semi-join exactness + actual scan pruning."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_zorder_key_interleaves_bits(spark):
    from pythonvectordb_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "x long, y long"
    )
    got = [r.z for r in df.select(zorder_key("x", "y", bits=16).alias("z")).collect()]

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(x, y) for x, y in [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]]


def test_zorder_buckets_bound_both_dims(spark):
    """The layout property that justifies Z-order: with a uniform grid,
    every top-bits bucket spans at most half of EACH dimension's range
    (bucket_bits=2 -> one quadrant), so predicates on either column can
    skip buckets. A single-column sort bounds only that column."""
    from pythonvectordb_spark.operators.layout import zorder_pruning_stats

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    rows = zorder_pruning_stats(grid, "x", "y", bits=6, bucket_bits=2).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.x_max - r.x_min <= 31, r
        assert r.y_max - r.y_min <= 31, r
        assert r.n_rows == 64 * 64 // 4


def test_snapshot_diff_classes(spark):
    from pythonvectordb_spark.operators.layout import snapshot_diff

    old = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, [5.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    new = spark.createDataFrame(
        [(2, [3.0, 4.0]), (3, [6.0, 5.0]), (4, [7.0, 8.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r.change for r in snapshot_diff(old, new).collect()}
    assert got == {1: "deleted", 3: "changed", 4: "added"}  # 2 unchanged -> absent


@pytest.fixture(scope="module")
def events(spark):
    from pythonvectordb_spark.sources.testdata import load_table

    return load_table(spark, SF_SMOKE, "events")


def test_bloom_semi_join_exact(spark, events):
    from pythonvectordb_spark.operators.layout import bloom_semi_join

    keys = events.filter(F.col("event_type") == "purchase").select("user_id")
    got = sorted(
        tuple(r)
        for r in bloom_semi_join(events, keys, "user_id")
        .select("event_id", "user_id")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in events.join(keys.distinct(), "user_id", "left_semi")
        .select("event_id", "user_id")
        .collect()
    )
    assert got == want and len(got) > 0


def test_bloom_actually_prunes(spark):
    """With a tiny key set against a large distinct-key fact table, the
    Bloom stage must reject the overwhelming majority of rows before the
    join: measure the pass count of the Bloom filter alone."""
    from pythonvectordb_spark.operators.layout import bloom_semi_join

    fact = spark.range(20_000).select(F.col("id").alias("k"))
    keys = spark.range(10).select((F.col("id") * 1000).alias("k"))
    out = bloom_semi_join(fact, keys, "k", m_bits=4096, n_hashes=3)
    assert {r.k for r in out.collect()} == {i * 1000 for i in range(10)}
    # the pre-filter alone must reject ~everything: expected fpr
    # ~ (1-e^(-kn/m))^k with n=10, m=4096, k=3 ~ 1e-6, so of 19,990
    # non-members a handful at most may leak through
    from pythonvectordb_spark.operators.layout import bloom_pass_filter

    n_pass = bloom_pass_filter(fact, keys, "k", m_bits=4096, n_hashes=3).count()
    assert 10 <= n_pass <= 30, f"bloom passed {n_pass} of 20000"
