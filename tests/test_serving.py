"""Streaming knn serving + snapshot compaction."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_streaming_knn_serving_matches_batch(spark, tmp_path):
    from pythonvectordb_spark.operators.search import knn_join, with_qvec
    from pythonvectordb_spark.sources.testdata import load_table
    from pythonvectordb_spark.streaming.serving import start_knn_serving

    emb = load_table(spark, SF_SMOKE, "embeddings")
    table = with_qvec(emb).persist()
    table.count()

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec_query")
    )
    src = str(tmp_path / "qsrc")
    queries.repartition(2).write.parquet(src)

    qstream = spark.readStream.schema(queries.schema).parquet(src)
    q = start_knn_serving(
        qstream,
        table,
        str(tmp_path / "out"),
        str(tmp_path / "chk"),
        k=5,
    )
    q.awaitTermination(120)

    served = spark.read.parquet(str(tmp_path / "out"))
    want = sorted(tuple(r) for r in knn_join(table, queries, k=5).collect())
    got = sorted(tuple(r) for r in served.collect())
    assert got == want
    table.unpersist()


def test_compact_snapshot(spark, tmp_path):
    import glob

    from pythonvectordb_spark.operators.search import with_qvec
    from pythonvectordb_spark.sources import snapshot as SN
    from pythonvectordb_spark.sources.testdata import load_table

    emb = with_qvec(load_table(spark, SF_SMOKE, "embeddings"))
    path = str(tmp_path / "snap")
    SN.save_snapshot(emb, path, dim=64, num_files=16)  # fragmented
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before == 16

    n = SN.compact_snapshot(spark, path, target_file_mb=128)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert after == n == 1  # tiny table -> single right-sized file
    back = SN.load_snapshot(spark, path, expected_dim=64)  # meta preserved
    assert back.count() == emb.count()
    a = sorted((r.vec_id, tuple(r.qvec)) for r in emb.select("vec_id", "qvec").collect())
    b = sorted((r.vec_id, tuple(r.qvec)) for r in back.select("vec_id", "qvec").collect())
    assert a == b
