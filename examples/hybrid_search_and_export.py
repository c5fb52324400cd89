"""Retrieval + export walkthrough on the public API — runnable:

    python examples/hybrid_search_and_export.py [sf_dir]

Composes the round-3 surface the way a retrieval-backed data product
would: ingest-time IVF+PQ indexing (cluster-partitioned layout) ->
lexical BM25 + semantic knn shortlists fused with Reciprocal Rank
Fusion -> shuffle-key skew check before the heavy join -> per-source
token caps -> deterministic training-shard export with a manifest.

Defaults to the sf0.001 testdata so it runs in seconds.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import pythonvectordb_spark as pv
from pythonvectordb_spark import fixtures as FX
from pythonvectordb_spark.indexing import ann_ivf_search_indexed, build_ivf_index
from pythonvectordb_spark.operators.textops import tokens as _tokens  # noqa: F401
from pythonvectordb_spark.sources.testdata import load_table


def run(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = pv.get_spark("hybrid-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    tmp = tempfile.mkdtemp(prefix="pv_example_")
    out: dict = {}
    try:
        # 1. build the cluster-partitioned index once (write-side cost);
        #    queries then probe a subset of partitions and never read
        #    the rest (streaming twin: streaming/ingest.start_indexed_ingest)
        build_ivf_index(emb, FX.CENTROIDS, f"{tmp}/ivf")
        hits = ann_ivf_search_indexed(
            spark, f"{tmp}/ivf", FX.QUERY_VEC, FX.CENTROIDS, k=10, nprobe=2
        )
        out["ivf_hits"] = [int(r.vec_id) for r in hits.collect()]

        # 2. hybrid retrieval: lexical + semantic shortlists, RRF-fused
        from pythonvectordb_spark.registry import q_bm25_rank

        bm25 = q_bm25_rank(spark, sf_dir)
        knn = pv.knn_search(pv.with_qvec(emb), FX.QUERY_VEC, k=20).select(
            F.col("vec_id").alias("doc_id"), F.round("score", 9).alias("score")
        )
        fused = pv.rrf_fuse(bm25, knn, "doc_id", "bm25", "score", k=10)
        out["hybrid_top"] = [int(r.doc_id) for r in fused.collect()]

        # 3. decide-before-you-shuffle: is doc_id a safe join key?
        skew = pv.key_skew_report(docs, "doc_id").first().asDict()
        out["skew_factor"] = skew["skew_factor"]

        # 4. per-source anti-dominance cap, then shard export + manifest
        capped = pv.cap_per_source(docs, max_tokens_per_source=700)
        keep = docs.join(capped.select("doc_id"), "doc_id", "left_semi")
        pv.write_training_shards(keep, f"{tmp}/shards", n_shards=4)
        manifest = pv.shard_stats(keep, 4).orderBy("shard").collect()
        out["shards"] = {int(r.shard): int(r.n_docs) for r in manifest}
        out["n_exported"] = spark.read.parquet(f"{tmp}/shards").count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


if __name__ == "__main__":
    res = run(*sys.argv[1:])
    for k, v in res.items():
        print(f"{k}: {v}")
