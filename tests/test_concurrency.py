"""Concurrent search correctness (SURVEY.md §3.4 / benchmark_suite.py:
164-226): the reference serializes every search on one RLock; here
concurrent searches are independent Spark jobs on a shared immutable
cached table — no lock, and every thread must get exactly the same
answer a serial run gets."""

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

N_THREADS = 8
QUERIES_PER_THREAD = 5


def test_concurrent_searches_all_correct(spark):
    from pythonvectordb_spark import fixtures as FX
    from pythonvectordb_spark.operators.search import knn_search, with_qvec
    from pythonvectordb_spark.sources.testdata import load_table

    emb = with_qvec(load_table(spark, SF_SMOKE, "embeddings")).persist()
    emb.count()

    queries = [FX._seeded_unit(1000 + t) for t in range(N_THREADS)]
    expected = [
        [(r.vec_id, r.score) for r in knn_search(emb, q, k=5).collect()]
        for q in queries
    ]

    def worker(t: int):
        out = []
        for _ in range(QUERIES_PER_THREAD):
            rows = knn_search(emb, queries[t], k=5).collect()
            out.append([(r.vec_id, r.score) for r in rows])
        return out

    with ThreadPoolExecutor(max_workers=N_THREADS) as ex:
        results = list(ex.map(worker, range(N_THREADS)))

    for t, per_thread in enumerate(results):
        for got in per_thread:
            assert got == expected[t], f"thread {t} diverged under concurrency"
    emb.unpersist()
