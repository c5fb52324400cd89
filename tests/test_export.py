"""Training-shard export: deterministic assignment, balanced shards,
sorted-within-shard files, and a stats manifest that matches the data."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_assignment_is_deterministic_and_total(spark, docs):
    from pythonvectordb_spark.operators.export import assign_shards

    a = assign_shards(docs, 8).select("doc_id", "shard")
    b = assign_shards(docs.repartition(7), 8).select("doc_id", "shard")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    rng = a.agg(F.min("shard"), F.max("shard")).first()
    assert rng[0] >= 0 and rng[1] <= 7
    assert a.count() == docs.count()


def test_shards_are_balanced(spark, docs):
    # md5 mod 8 over 500 ids: no shard should be empty or grossly hot
    from pythonvectordb_spark.operators.export import shard_stats

    stats = shard_stats(docs, 8).collect()
    counts = {r["shard"]: r["n_docs"] for r in stats}
    assert len(counts) == 8
    n = sum(counts.values())
    assert max(counts.values()) < 2.0 * n / 8


def test_write_then_read_roundtrip_sorted(spark, docs, tmp_path):
    from pythonvectordb_spark.operators.export import (
        shard_stats,
        write_training_shards,
    )

    out = str(tmp_path / "shards")
    write_training_shards(docs, out, 4)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # hive partition column survives and matches the stats manifest
    manifest = {r["shard"]: r["n_docs"] for r in shard_stats(docs, 4).collect()}
    disk = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert disk == manifest
    # within a shard, rows come back in shard_key order per file
    one = back.filter(F.col("shard") == 0).select("shard_key").toPandas()["shard_key"]
    assert list(one) == sorted(one)


def test_interleave_audit_blocks_cover_and_mix(spark, docs):
    from pythonvectordb_spark.operators.export import interleave_audit

    d = docs.withColumn("n_tok", F.lit(10).cast("long"))
    out = interleave_audit(d, 16, token_col="n_tok").collect()
    # every doc lands in exactly one of 16 blocks
    assert sum(r.n_docs for r in out) == docs.count()
    assert all(0 <= r.block < 16 for r in out)
    assert {r.block for r in out} == set(range(16))  # 500 docs: none empty
    # token sums follow doc counts with the constant token col
    assert all(r.n_tokens == 10 * r.n_docs for r in out)
    # share is a valid fraction and consistent with source count
    for r in out:
        assert 0.0 < r.top_source_share <= 1.0
        assert r.top_source_share >= 1.0 / r.n_sources
    # hash-mixed blocks: no block should be one-source dominated
    assert max(r.top_source_share for r in out) < 0.8


def test_interleave_audit_is_layout_independent(spark, docs):
    from pythonvectordb_spark.operators.export import interleave_audit

    a = interleave_audit(docs, 8).collect()
    b = interleave_audit(docs.repartition(13), 8).collect()
    key = lambda r: r.block  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
