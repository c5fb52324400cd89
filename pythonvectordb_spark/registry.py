"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB oracle SQL string
with matching column names and types (driver contract, __spark_entry__.py).

Parity conventions (see oracle.py):
  * scores rounded to 9 dp on both sides (raw agreement is ~1 ULP);
  * integer outputs exact, cast to BIGINT/INT explicitly on both sides;
  * deterministic tie-breaks (score DESC, id ASC) everywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from pythonvectordb_spark import fixtures as FX
from pythonvectordb_spark import oracle as O
from pythonvectordb_spark.functions.vector import dequantize
from pythonvectordb_spark.operators import search as S
from pythonvectordb_spark.operators import mutation as M
from pythonvectordb_spark.operators import stats as ST
from pythonvectordb_spark.sources.testdata import load_table

DIM = FX.DIM

# --------------------------------------------------------------------------
# shared bits
# --------------------------------------------------------------------------

def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.with_qvec(load_table(spark, sf_dir, "embeddings"))


_NEW_BATCH_IDS = (9000001, 9000002, 9000003)
_NEW_BATCH_VECS = [FX._seeded_unit(5000 + i) for i in range(3)]
_DELETE_IDS = (5, 10, 15, 20, 25)

_BATCH_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def _new_batch(spark: SparkSession) -> DataFrame:
    rows = [
        (i, [float(x) for x in v], 0)
        for i, v in zip(_NEW_BATCH_IDS, _NEW_BATCH_VECS)
    ]
    return spark.createDataFrame(rows, _BATCH_SCHEMA)


def _sql_new_batch() -> str:
    """VALUES clause mirroring _new_batch (double literals, exact)."""
    rows = ", ".join(
        f"({i}::BIGINT, [{', '.join(repr(float(x)) for x in v)}]::DOUBLE[], 0::INT)"
        for i, v in zip(_NEW_BATCH_IDS, _NEW_BATCH_VECS)
    )
    return f"(VALUES {rows}) AS t(vec_id, embedding, label)"


def _fingerprint(df: DataFrame) -> DataFrame:
    """Whole-table exact integer fingerprint over (vec_id, qvec)."""
    qsum = F.aggregate(F.col("qvec"), F.lit(0).cast("long"), lambda a, x: a + x.cast("long"))
    qchk = F.aggregate(
        F.zip_with(
            F.col("qvec"),
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda x, i: x.cast("long") * i.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("vec_id")).cast("long").alias("sum_id"),
        F.sum(qsum).cast("long").alias("sum_q"),
        F.sum(qchk).cast("long").alias("sum_qchk"),
    )


def _sql_fingerprint(from_clause: str, qvec_expr: str = None) -> str:
    qv = qvec_expr or O.sql_qvec("embedding")
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(vec_id) AS BIGINT) AS sum_id,
       CAST(sum(list_aggregate(list_transform({qv}, x -> x::BIGINT), 'sum')) AS BIGINT) AS sum_q,
       CAST(sum(list_aggregate(list_transform({qv}, (x, i) -> x::BIGINT * i), 'sum')) AS BIGINT) AS sum_qchk
FROM {from_clause}
"""


# --------------------------------------------------------------------------
# vector-surface queries
# --------------------------------------------------------------------------

def q_knn_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: reference search() — int8 cosine brute-force top-10."""
    out = S.knn_search(_emb(spark, sf_dir), FX.QUERY_VEC, k=10)
    return out.select("vec_id", F.round("score", 9).alias("score"))


def o_knn_search() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
WITH q AS (SELECT vec_id, {qv} AS qvec FROM embeddings)
SELECT vec_id, round({O.sql_cosine_int8_lit(FX.QUERY_VEC, 'qvec')}, 9) AS score
FROM q ORDER BY score DESC, vec_id ASC LIMIT 10
"""


def q_knn_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered search (reference filter_fn path, predicate-first)."""
    out = S.knn_search(_emb(spark, sf_dir), FX.QUERY_VEC_2, k=10, pred=F.col("label") == 3)
    return out.select("vec_id", F.round("score", 9).alias("score"))


def o_knn_search_filtered() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
WITH q AS (SELECT vec_id, {qv} AS qvec FROM embeddings WHERE label = 3)
SELECT vec_id, round({O.sql_cosine_int8_lit(FX.QUERY_VEC_2, 'qvec')}, 9) AS score
FROM q ORDER BY score DESC, vec_id ASC LIMIT 10
"""


def q_knn_search_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Float-precision exact cosine top-10 (no quantization)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.knn_search_float(emb, FX.QUERY_VEC, k=10)
    return out.select("vec_id", F.round("score", 9).alias("score"))


def o_knn_search_float() -> str:
    return f"""
SELECT vec_id, round({O.sql_cosine_float_lit(FX.QUERY_VEC, 'embedding')}, 9) AS score
FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 10
"""


def q_get_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup + dequantize (reference get_vector)."""
    return S.get_vector(_emb(spark, sf_dir), 7)


def o_get_vector() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
SELECT vec_id, list_transform({qv}, x -> x::DOUBLE / 127.0) AS vector
FROM embeddings WHERE vec_id = 7
"""


def q_quantize_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2+K3 pipeline parity: exact integer fingerprint per row."""
    df = _emb(spark, sf_dir)
    qsum = F.aggregate(F.col("qvec"), F.lit(0).cast("long"), lambda a, x: a + x.cast("long"))
    qss = F.aggregate(
        F.col("qvec"), F.lit(0).cast("long"), lambda a, x: a + x.cast("long") * x.cast("long")
    )
    qchk = F.aggregate(
        F.zip_with(
            F.col("qvec"),
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda x, i: x.cast("long") * i.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return df.select(
        "vec_id", qsum.alias("q_sum"), qss.alias("q_sumsq"), qchk.alias("q_checksum")
    )


def o_quantize_vectors() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
WITH q AS (SELECT vec_id, {qv} AS qvec FROM embeddings)
SELECT vec_id,
       CAST(list_aggregate(list_transform(qvec, x -> x::BIGINT), 'sum') AS BIGINT) AS q_sum,
       CAST(list_aggregate(list_transform(qvec, x -> x::BIGINT * x::BIGINT), 'sum') AS BIGINT) AS q_sumsq,
       CAST(list_aggregate(list_transform(qvec, (x, i) -> x::BIGINT * i), 'sum') AS BIGINT) AS q_checksum
FROM q
"""


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query knn: 5 query vectors vs the whole table."""
    emb = _emb(spark, sf_dir)
    queries = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec_query"))
    )
    out = S.knn_join(emb, queries, k=5, query_vec="qvec_query")
    return out.select(
        "query_id",
        "vec_id",
        F.round("score", 9).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


def o_knn_join() -> str:
    qv = O.sql_qvec("e.embedding")
    cos = O.sql_cosine_int8_cols("q.embedding", "qvec")
    return f"""
WITH data AS (SELECT e.vec_id, e.embedding, {qv} AS qvec FROM embeddings e),
     qs AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
     scored AS (
       SELECT qs.query_id, data.vec_id, {cos.replace('q.embedding', 'qs.embedding')} AS score
       FROM data CROSS JOIN qs
     ),
     ranked AS (
       SELECT query_id, vec_id, score,
              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
       FROM scored
     )
SELECT query_id, vec_id, round(score, 9) AS score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate search (random hyperplanes)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.ann_lsh_search(emb, FX.QUERY_VEC, FX.HYPERPLANES, k=10)
    return out.select("vec_id", F.round("score", 9).alias("score"))


def o_ann_lsh() -> str:
    qsig = 0
    for i, h in enumerate(FX.HYPERPLANES):
        d = sum(float(a) * float(b) for a, b in zip(FX.QUERY_VEC, h))
        if d >= 0:
            qsig |= 1 << i
    sig_terms = " + ".join(
        f"(CASE WHEN ({O.sql_dot_lit(h, 'embedding')}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, h in enumerate(FX.HYPERPLANES)
    )
    return f"""
WITH cand AS (SELECT * FROM embeddings WHERE ({sig_terms}) = {qsig})
SELECT vec_id, round({O.sql_cosine_float_lit(FX.QUERY_VEC, 'embedding')}, 9) AS score
FROM cand ORDER BY score DESC, vec_id ASC LIMIT 10
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed approximate search over a fixed codebook."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.ann_ivf_search(emb, FX.QUERY_VEC, FX.CENTROIDS, k=10, nprobe=2)
    return out.select("vec_id", F.round("score", 9).alias("score"))


def o_ann_ivf() -> str:
    probe = S.ivf_probe(FX.QUERY_VEC, FX.CENTROIDS, nprobe=2)
    sims = ", ".join(O.sql_cosine_float_lit(c, "embedding") for c in FX.CENTROIDS)
    probe_list = ", ".join(str(p) for p in probe)
    return f"""
WITH assigned AS (
  SELECT *, [{sims}] AS sims FROM embeddings
),
cand AS (
  SELECT * FROM assigned
  WHERE (list_position(sims, list_aggregate(sims, 'max')) - 1) IN ({probe_list})
)
SELECT vec_id, round({O.sql_cosine_float_lit(FX.QUERY_VEC, 'embedding')}, 9) AS score
FROM cand ORDER BY score DESC, vec_id ASC LIMIT 10
"""


def q_add_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write path: normalize->quantize->dup-guard->union, fingerprinted."""
    table = _emb(spark, sf_dir)
    out = M.add_vectors(table, _new_batch(spark))
    return _fingerprint(out)


def o_add_vectors() -> str:
    return _sql_fingerprint(
        f"(SELECT vec_id, embedding FROM embeddings UNION ALL SELECT vec_id, embedding FROM {_sql_new_batch()})"
    )


def q_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete as anti-join, fingerprinted."""
    table = _emb(spark, sf_dir)
    ids = spark.createDataFrame([(i,) for i in _DELETE_IDS], "vec_id long")
    out = M.delete_vectors(table, ids)
    return _fingerprint(out)


def o_delete_vectors() -> str:
    ids = ", ".join(str(i) for i in _DELETE_IDS)
    return _sql_fingerprint(f"(SELECT * FROM embeddings WHERE vec_id NOT IN ({ids}))")


def q_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference get_stats as a one-row aggregate."""
    return ST.vector_stats(load_table(spark, sf_dir, "embeddings"))


def o_vector_stats() -> str:
    return """
SELECT CAST(count(*) AS BIGINT) AS vector_count,
       CAST(count(DISTINCT vec_id) AS BIGINT) AS distinct_ids,
       CAST(min(len(embedding)) AS INT) AS min_dim,
       CAST(max(len(embedding)) AS INT) AS max_dim,
       CAST(count(*) * min(len(embedding)) AS BIGINT) AS memory_bytes_int8
FROM embeddings
"""


# --------------------------------------------------------------------------
# registry assembly
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "knn_search": q_knn_search,
    "knn_search_filtered": q_knn_search_filtered,
    "knn_search_float": q_knn_search_float,
    "get_vector": q_get_vector,
    "quantize_vectors": q_quantize_vectors,
    "knn_join": q_knn_join,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "add_vectors": q_add_vectors,
    "delete_vectors": q_delete_vectors,
    "vector_stats": q_vector_stats,
}

ORACLES: dict[str, str] = {
    "knn_search": o_knn_search(),
    "knn_search_filtered": o_knn_search_filtered(),
    "knn_search_float": o_knn_search_float(),
    "get_vector": o_get_vector(),
    "quantize_vectors": o_quantize_vectors(),
    "knn_join": o_knn_join(),
    "ann_lsh": o_ann_lsh(),
    "ann_ivf": o_ann_ivf(),
    "add_vectors": o_add_vectors(),
    "delete_vectors": o_delete_vectors(),
    "vector_stats": o_vector_stats(),
}
