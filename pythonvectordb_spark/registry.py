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

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

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
from pythonvectordb_spark import fixtures_trained as FT
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
    """Point lookup + dequantize (reference get_vector), exploded to
    scalar (vec_id, idx, val) rows — array-free output shape."""
    v = S.get_vector(_emb(spark, sf_dir), 7)
    return v.select(
        "vec_id", F.posexplode("vector").alias("idx", "val")
    ).select("vec_id", F.col("idx").cast("int").alias("idx"), "val")


def o_get_vector() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
SELECT vec_id, CAST(u.idx AS INT) AS idx, u.val AS val
FROM (
  SELECT vec_id,
         unnest(list_transform({qv}, (x, i) -> {{'idx': i - 1, 'val': x::DOUBLE / 127.0}})) AS u
  FROM embeddings WHERE vec_id = 7
)
"""


_LOOKUP_IDS = (3, 7, 11, 400)  # 400 beyond sf0.001's 100 rows: miss path


def q_get_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched point lookup (multi-id get_vector): IN-list filter reaches
    the scan; absent ids simply produce no rows (the reference returns
    None per miss — here misses are empty, checked by the id set)."""
    emb = _emb(spark, sf_dir)
    from pythonvectordb_spark.functions.vector import dequantize as DQ

    got = emb.filter(F.col("vec_id").isin(*_LOOKUP_IDS)).select(
        "vec_id", DQ("qvec").alias("vector")
    )
    return got.select("vec_id", F.posexplode("vector").alias("idx", "val")).select(
        "vec_id", F.col("idx").cast("int").alias("idx"), "val"
    )


def o_get_vectors() -> str:
    qv = O.sql_qvec("embedding")
    ids = ", ".join(str(i) for i in _LOOKUP_IDS)
    return f"""
SELECT vec_id, CAST(u.idx AS INT) AS idx, u.val AS val
FROM (
  SELECT vec_id,
         unnest(list_transform({qv}, (x, i) -> {{'idx': i - 1, 'val': x::DOUBLE / 127.0}})) AS u
  FROM embeddings WHERE vec_id IN ({ids})
)
"""


def q_normalize_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 standalone: per-row norm and sequential-fold sum of the
    normalized vector (deterministic doubles)."""
    from pythonvectordb_spark.functions.vector import l2_norm, l2_normalize

    emb = load_table(spark, sf_dir, "embeddings")
    nv = l2_normalize("embedding")
    seq_sum = F.aggregate(nv, F.lit(0.0), lambda a, x: a + x)
    return emb.select(
        "vec_id",
        F.round(l2_norm("embedding"), 9).alias("raw_norm"),
        F.round(seq_sum, 9).alias("normalized_sum"),
    )


def o_normalize_vectors() -> str:
    nrm = O.sql_l2_norm("embedding")
    return f"""
SELECT vec_id,
       round({nrm}, 9) AS raw_norm,
       round(list_aggregate(list_transform(embedding, x -> x::DOUBLE / {nrm}), 'sum'), 9) AS normalized_sum
FROM embeddings
"""


def q_upsert_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert (delete-then-insert): 2 replaced ids + 1 new, fingerprinted."""
    table = _emb(spark, sf_dir)
    batch_rows = [
        (3, [float(x) for x in FX._seeded_unit(7001)], 1),
        (4, [float(x) for x in FX._seeded_unit(7002)], 1),
        (9000010, [float(x) for x in FX._seeded_unit(7003)], 1),
    ]
    batch = spark.createDataFrame(batch_rows, _BATCH_SCHEMA)
    return _fingerprint(M.upsert_vectors(table, batch))


def o_upsert_vectors() -> str:
    rows = ", ".join(
        f"({i}::BIGINT, [{', '.join(repr(float(x)) for x in FX._seeded_unit(seed))}]::DOUBLE[], 1::INT)"
        for i, seed in ((3, 7001), (4, 7002), (9000010, 7003))
    )
    return _sql_fingerprint(
        f"""(
  SELECT vec_id, embedding FROM embeddings WHERE vec_id NOT IN (3, 4, 9000010)
  UNION ALL
  SELECT vec_id, embedding FROM (VALUES {rows}) AS t(vec_id, embedding, label)
)"""
    )


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
    # symmetric int8 scoring: both sides quantized -> exact integer dot and
    # norms, identical under any summation order (mirrors
    # cosine_similarity_int8_sym and the numpy mapInPandas path)
    qv = O.sql_qvec("embedding")
    return f"""
WITH data AS (SELECT vec_id, {qv} AS qvec FROM embeddings),
     qs AS (SELECT vec_id AS query_id, {qv} AS qq FROM embeddings WHERE vec_id < 5),
     scored AS (
       SELECT qs.query_id, data.vec_id,
              CASE WHEN list_aggregate(list_transform(qs.qq, x -> x::BIGINT * x::BIGINT), 'sum') = 0
                     OR list_aggregate(list_transform(data.qvec, x -> x::BIGINT * x::BIGINT), 'sum') = 0
                   THEN 0.0
                   ELSE list_aggregate(list_transform(data.qvec, (x, i) -> x::BIGINT * qs.qq[i]::BIGINT), 'sum')::DOUBLE
                        / (sqrt(list_aggregate(list_transform(data.qvec, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)
                           * sqrt(list_aggregate(list_transform(qs.qq, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE))
              END AS score
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
    """LSH-bucketed approximate search, multi-table default (20 tables
    x 5 bits, OR of bucket matches).

    Round-2 bench showed the old single-6-bit-table default at
    recall@10 = 0.0 — oracle-green (the oracle replicates the same
    bucketing) but useless as retrieval. Round-3 A/B on the 10-probe
    set (sf0.1): 16x6 = 0.58, 20x5 = 0.80, 24x4 = 0.98 at ~equal cost
    — 20x5 is the registered default (the ≥0.8 point distinct from
    `ann_lsh_multiprobe`'s 24x4); the single-band config survives only
    as the bench's `lsh_single_band_6bit` teaching baseline."""
    from pythonvectordb_spark.operators.dedup import lsh_band_planes

    emb = load_table(spark, sf_dir, "embeddings")
    out = S.ann_lsh_multiprobe_search(emb, FX.QUERY_VEC, lsh_band_planes(20, 5), k=10)
    return out.select("vec_id", F.round("score", 9).alias("score"))


def o_ann_lsh() -> str:
    from pythonvectordb_spark.operators.dedup import lsh_band_planes

    planes = lsh_band_planes(20, 5)
    or_terms = []
    for bp in planes:
        qsig = 0
        terms = []
        for i, h in enumerate(bp):
            d = sum(float(a) * float(b) for a, b in zip(FX.QUERY_VEC, h))
            if d >= 0:
                qsig |= 1 << i
            terms.append(
                f"(CASE WHEN ({O.sql_dot_lit(h, 'embedding')}) >= 0 THEN {1 << i} ELSE 0 END)"
            )
        or_terms.append(f"(({' + '.join(terms)}) = {qsig})")
    cond = "\n   OR ".join(or_terms)
    return f"""
WITH cand AS (SELECT * FROM embeddings WHERE {cond})
SELECT vec_id, round({O.sql_cosine_float_lit(FX.QUERY_VEC, 'embedding')}, 9) AS score
FROM cand ORDER BY score DESC, vec_id ASC LIMIT 10
"""


def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded multi-probe LSH ANN (24 bands x 4 bits): OR-of-ANDs recall
    amplification over the single-band bucket search."""
    from pythonvectordb_spark.operators.dedup import lsh_band_planes

    emb = load_table(spark, sf_dir, "embeddings")
    out = S.ann_lsh_multiprobe_search(emb, FX.QUERY_VEC, lsh_band_planes(24, 4), k=10)
    return out.select("vec_id", F.round("score", 9).alias("score"))


def o_ann_lsh_multiprobe() -> str:
    from pythonvectordb_spark.operators.dedup import lsh_band_planes

    planes = lsh_band_planes(24, 4)
    or_terms = []
    for bp in planes:
        qsig = 0
        terms = []
        for i, h in enumerate(bp):
            d = sum(float(a) * float(b) for a, b in zip(FX.QUERY_VEC, h))
            if d >= 0:
                qsig |= 1 << i
            terms.append(
                f"(CASE WHEN ({O.sql_dot_lit(h, 'embedding')}) >= 0 THEN {1 << i} ELSE 0 END)"
            )
        or_terms.append(f"(({' + '.join(terms)}) = {qsig})")
    cond = "\n   OR ".join(or_terms)
    return f"""
WITH cand AS (SELECT * FROM embeddings WHERE {cond})
SELECT vec_id, round({O.sql_cosine_float_lit(FX.QUERY_VEC, 'embedding')}, 9) AS score
FROM cand ORDER BY score DESC, vec_id ASC LIMIT 10
"""


def _pq_sql_dist(col: str, offset: int, centroid: list[float]) -> str:
    """Squared L2 of a literal sub-centroid against a vector slice,
    left-assoc like the Spark fold."""
    return " + ".join(
        f"(({col}[{offset + j + 1}]::DOUBLE - {float(c)!r}::DOUBLE)"
        f" * ({col}[{offset + j + 1}]::DOUBLE - {float(c)!r}::DOUBLE))"
        for j, c in enumerate(centroid)
    )


def _pq_sql_codes(codebooks=None) -> tuple[str, str]:
    """(dist-lists CTE body, codes CTE body) mirroring pq_code_expr."""
    dist_cols = []
    code_terms = []
    offset = 0
    for s, cents in enumerate(codebooks if codebooks is not None else FX.PQ_CODEBOOKS):
        lst = ", ".join(_pq_sql_dist("embedding", offset, c) for c in cents)
        offset += len(cents[0])
        dist_cols.append(f"[{lst}] AS d{s}")
        code_terms.append(
            f"CAST(list_position(d{s}, list_aggregate(d{s}, 'min')) - 1 AS INT)"
        )
    dists = "SELECT vec_id, embedding, " + ", ".join(dist_cols) + " FROM embeddings"
    codes = (
        "SELECT vec_id, embedding, [" + ", ".join(code_terms) + "] AS code FROM d"
    )
    return dists, codes


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: 64 float dims -> 8 one-byte codes
    (argmin-L2 per subspace over the fixture codebooks).

    The code vector is projected to a '-'-joined string because the
    driver's canonicalizer sorts/hashes columns in pandas, where an
    array<int> cell is unhashable (round-2 VERDICT item 2)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.concat_ws(
            "-", S.pq_code_expr("embedding", FX.PQ_CODEBOOKS).cast("array<string>")
        ).alias("code_str"),
    )


def o_pq_encode() -> str:
    dists, codes = _pq_sql_codes()
    return f"""
WITH d AS ({dists}), c AS ({codes})
SELECT vec_id, array_to_string(code, '-') AS code_str FROM c
"""


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC search with exact re-rank of the top-100 ADC shortlist —
    the classic two-stage compressed-domain retrieval (scale-matched
    random fixture books; see ann_pq_trained for the production path)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.ann_pq_search(emb, FX.QUERY_VEC, FX.PQ_CODEBOOKS, k=10, rerank=100)
    return out.select("vec_id", F.round("score", 9).alias("score"))


def _o_ann_pq(codebooks) -> str:
    dists, codes = _pq_sql_codes(codebooks)
    tables = S.pq_adc_tables(FX.QUERY_VEC, codebooks)
    lookups = " + ".join(
        f"list_extract([{', '.join(f'{float(x)!r}::DOUBLE' for x in row)}], code[{s + 1}] + 1)"
        for s, row in enumerate(tables)
    )
    cos = O.sql_cosine_float_lit(FX.QUERY_VEC, "embedding")
    return f"""
WITH d AS ({dists}), c AS ({codes}),
adc AS (SELECT vec_id, embedding, ({lookups}) AS adc_dist FROM c),
short AS (SELECT * FROM adc ORDER BY adc_dist ASC, vec_id ASC LIMIT 100)
SELECT vec_id, round({cos}, 9) AS score
FROM short ORDER BY score DESC, vec_id ASC LIMIT 10
"""


def o_ann_pq() -> str:
    return _o_ann_pq(FX.PQ_CODEBOOKS)


def q_ann_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC search over KMEANS-TRAINED codebooks (frozen literals from
    `indexing.train_pq_codebooks` on sf0.1 — see fixtures_trained.py):
    the production PQ path, where the books match the data's per-subspace
    density instead of a random shell. Round-2 bench measured random-book
    ADC recall@10 at 0.2-0.5; trained books are the fix."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.ann_pq_search(
        emb, FX.QUERY_VEC, FT.PQ_CODEBOOKS_TRAINED, k=10, rerank=100
    )
    return out.select("vec_id", F.round("score", 9).alias("score"))


def o_ann_pq_trained() -> str:
    return _o_ann_pq(FT.PQ_CODEBOOKS_TRAINED)


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


def q_knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean-distance exact top-10 (extension metric)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.l2_knn_search(emb, FX.QUERY_VEC, k=10)
    return out.select("vec_id", F.round("dist", 9).alias("dist"))


def o_knn_l2() -> str:
    terms = " + ".join(
        f"(({float(x)!r}::DOUBLE - embedding[{i + 1}]::DOUBLE) * "
        f"({float(x)!r}::DOUBLE - embedding[{i + 1}]::DOUBLE))"
        for i, x in enumerate(FX.QUERY_VEC)
    )
    return f"""
SELECT vec_id, round(sqrt({terms}), 9) AS dist
FROM embeddings ORDER BY dist ASC, vec_id ASC LIMIT 10
"""


def q_knn_mips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product exact top-10 (extension metric)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.mips_search(emb, FX.QUERY_VEC, k=10)
    return out.select("vec_id", F.round("score", 9).alias("score"))


def o_knn_mips() -> str:
    return f"""
SELECT vec_id, round({O.sql_dot_lit(FX.QUERY_VEC, 'embedding')}, 9) AS score
FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 10
"""


def q_ann_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN: metadata predicate BEFORE the IVF probe (predicate +
    cluster pruning compose — both reach the scan)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("label") % 2 == 0)
    out = S.ann_ivf_search(emb, FX.QUERY_VEC, FX.CENTROIDS, k=10, nprobe=2)
    return out.select("vec_id", F.round("score", 9).alias("score"))


def o_ann_ivf_filtered() -> str:
    probe = S.ivf_probe(FX.QUERY_VEC, FX.CENTROIDS, nprobe=2)
    sims = ", ".join(O.sql_cosine_float_lit(c, "embedding") for c in FX.CENTROIDS)
    probe_list = ", ".join(str(p) for p in probe)
    return f"""
WITH assigned AS (
  SELECT *, [{sims}] AS sims FROM embeddings WHERE label % 2 = 0
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
# dedup / text-analysis / multimodal queries (SURVEY §2.12 extension surface)
# --------------------------------------------------------------------------

from pythonvectordb_spark.functions.text import LANG_MARKERS_SORTED  # noqa: E402
from pythonvectordb_spark.functions.text import STOPWORDS  # noqa: E402
from pythonvectordb_spark.functions.vector import l2_norm  # noqa: E402
from pythonvectordb_spark.functions.text import tokens as _tokens  # noqa: E402
from pythonvectordb_spark.operators import dedup as DD  # noqa: E402
from pythonvectordb_spark.operators import media as MM  # noqa: E402
from pythonvectordb_spark.operators import textops as TX  # noqa: E402

_SH_CTE = f"""
t AS (SELECT doc_id, {O.sql_tokens('text')} AS w FROM documents),
sh AS (SELECT doc_id, {O.sql_shingles_of('w')} AS sh FROM t)
"""

_JACCARD = "n_common::DOUBLE / (n_a + n_b - n_common)::DOUBLE"

# document-frequency cap for the registered n-gram dedup call sites: a
# shingle shared by more than this many docs is boilerplate (no near-dup
# signal) and would emit df^2 join rows; no-op on the driver testdata
# (max observed df: 25 at sf0.1) so pair values are unchanged, but the
# cap is ON and the oracles below mirror it exactly.
NGRAM_MAX_DF = 50

# capped-vocabulary CTEs (require `sh` from _SH_CTE): shk carries each
# doc's full shingle list plus its df-capped sublist `shv`
_SH_KEPT_CTE = f"""
inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
kept AS (SELECT shingle FROM inv GROUP BY shingle HAVING count(*) <= {NGRAM_MAX_DF}),
kinv AS (SELECT i.doc_id, i.shingle FROM inv i JOIN kept k ON i.shingle = k.shingle),
shk AS (
  SELECT s.doc_id, s.sh, coalesce(l.shv, []) AS shv
  FROM sh s LEFT JOIN (SELECT doc_id, list(shingle) AS shv FROM kinv GROUP BY doc_id) l
    ON s.doc_id = l.doc_id
)
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash; keep the smallest doc_id per group."""
    return DD.dedup_exact(load_table(spark, sf_dir, "documents"))


def o_dedup_exact() -> str:
    return """
SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: word-3-gram Jaccard >= 0.8 (inverted-index join,
    boilerplate shingles df-capped)."""
    return DD.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8, max_df=NGRAM_MAX_DF
    )


def o_dedup_ngram_jaccard() -> str:
    # independent implementation: brute-force pairwise set intersection
    # over the df-capped vocabulary (common counted on kept shingles,
    # sizes on full lists — mirrors the operator's cap semantics)
    return f"""
WITH {_SH_CTE},
{_SH_KEPT_CTE},
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.shv, b.shv))::BIGINT AS n_common,
         len(a.sh)::BIGINT AS n_a, len(b.sh)::BIGINT AS n_b
  FROM shk a JOIN shk b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, round({_JACCARD}, 9) AS jaccard
FROM pairs WHERE {_JACCARD} >= 0.8
"""


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided shingle-containment near-dup pairs (new round 4):
    |A∩B| / min(|A|,|B|) >= 0.8 — Broder's containment companion to
    resemblance. Catches the quote/snippet/prefix case symmetric
    Jaccard misses: a short doc wholly embedded in a longer one scores
    ~|A|/|B| on Jaccard but 1.0 here
    (`operators/dedup.containment_pairs`, same inverted-index +
    df-cap skeleton as `dedup_ngram_jaccard`)."""
    return DD.containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8, max_df=NGRAM_MAX_DF
    )


def o_containment_pairs() -> str:
    # independent brute-force twin of o_dedup_ngram_jaccard with the
    # one-sided denominator: common counted on df-capped shingles,
    # min() sizes on the full lists (mirrors the operator's cap
    # semantics); exact integer division promoted to double
    cont = "n_common::DOUBLE / least(n_a, n_b)::DOUBLE"
    return f"""
WITH {_SH_CTE},
{_SH_KEPT_CTE},
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.shv, b.shv))::BIGINT AS n_common,
         len(a.sh)::BIGINT AS n_a, len(b.sh)::BIGINT AS n_b
  FROM shk a JOIN shk b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, round({cont}, 9) AS containment
FROM pairs WHERE {cont} >= 0.8
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH banding candidates, exact-Jaccard verified at 0.8."""
    return DD.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), threshold=0.8)


def o_dedup_minhash_lsh() -> str:
    from pythonvectordb_spark.functions.text import MINHASH_P, minhash_params

    params = minhash_params(12)
    sigs = ", ".join(
        f"min(({a}::BIGINT * h1 + {b}::BIGINT * h2) % {MINHASH_P}::BIGINT) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, md5(h{b * 3}::VARCHAR || '|' || h{b * 3 + 1}::VARCHAR || '|' || h{b * 3 + 2}::VARCHAR) AS bkey FROM sig"
        for b in range(4)
    )
    return f"""
WITH {_SH_CTE},
inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
hashed AS (SELECT doc_id,
                  ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h1,
                  ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS h2
           FROM inv),
sig AS (SELECT doc_id, {sigs} FROM hashed GROUP BY doc_id),
banded AS ({bands}),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM banded x JOIN banded y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
),
ver AS (
  SELECT id_a, id_b,
         len(list_intersect(a.sh, b.sh))::BIGINT AS n_common,
         len(a.sh)::BIGINT AS n_a, len(b.sh)::BIGINT AS n_b
  FROM cand JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b
)
SELECT id_a, id_b, round({_JACCARD}, 9) AS jaccard
FROM ver WHERE {_JACCARD} >= 0.8
"""


def _simhash_cte(bits: int = 32) -> str:
    """SimHash fingerprint CTE chain (requires `sh` from _SH_CTE),
    parameterized by fingerprint width — mirrors
    ``dedup.simhash_fingerprints(bits=...)`` exactly (same md5 prefix,
    same per-bit votes)."""
    n_hex = (bits + 3) // 4
    return (
        "inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),\n"
        f"hv AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, {n_hex}))::BIGINT AS h FROM inv),\n"
        "votes AS (SELECT doc_id, "
        + ", ".join(
            f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}" for b in range(bits)
        )
        + " FROM hv GROUP BY doc_id),\n"
        "fps AS (SELECT doc_id, CAST("
        + " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
        + " AS BIGINT) AS simhash FROM votes)"
    )


_SIMHASH_CTE = _simhash_cte(32)


def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprint per document."""
    return DD.simhash_fingerprints(load_table(spark, sf_dir, "documents"))


def o_simhash_fingerprints() -> str:
    return f"""
WITH {_SH_CTE},
{_SIMHASH_CTE}
SELECT doc_id, simhash FROM fps
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with SimHash hamming <= 3 (byte-block candidates)."""
    return DD.simhash_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3)


def o_dedup_simhash() -> str:
    return f"""
WITH {_SH_CTE},
{_SIMHASH_CTE},
blocks AS (
  SELECT doc_id, simhash, b.blk, (simhash >> (b.blk * 8)) & 255 AS bval
  FROM fps, (VALUES (0), (1), (2), (3)) b(blk)
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b, x.simhash AS fa, y.simhash AS fb
  FROM blocks x JOIN blocks y ON x.blk = y.blk AND x.bval = y.bval AND x.doc_id < y.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= 3
"""


def q_dedup_simhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with the SIZE-RULE SimHash (new round 4): 60-bit
    fingerprints, four 15-bit pigeonhole blocks (32k buckets per block
    vs the 32-bit default's 256) — the configuration the 10x scale
    rehearsal runs, here driver-oracled so the wide path's exact
    fingerprint/blocking math has its own correctness row. Hamming <= 3
    on 60 bits is a tighter similarity bound than on 32 (distance
    scales with width), so pair sets differ from `dedup_simhash` by
    design."""
    return DD.simhash_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=3, bits=60
    )


def o_dedup_simhash_wide() -> str:
    return f"""
WITH {_SH_CTE},
{_simhash_cte(60)},
blocks AS (
  SELECT doc_id, simhash, b.blk, (simhash >> (b.blk * 15)) & 32767 AS bval
  FROM fps, (VALUES (0), (1), (2), (3)) b(blk)
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b, x.simhash AS fa, y.simhash AS fb
  FROM blocks x JOIN blocks y ON x.blk = y.blk AND x.bval = y.bval AND x.doc_id < y.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= 3
"""


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate text spans (ExactSubstr-dedup shape, new
    round 4): maximal runs of >= 8 consecutive tokens shared with
    another document, via 60-bit window hashes + a distinct-doc count +
    gaps-and-islands merge (`operators/textops.duplicate_spans`).
    Document-level dedup keeps a unique page that quotes boilerplate;
    this finds the quoted span itself."""
    return TX.duplicate_spans(load_table(spark, sf_dir, "documents"), window=8)


def o_duplicate_spans(window: int = 8) -> str:
    wh = (
        "('0x' || substr(md5(array_to_string("
        f"w[CAST(i + 1 AS INT):CAST(i + {window} AS INT)], ' ')), 1, 15))::BIGINT"
    )
    return f"""
WITH t AS (SELECT doc_id, {O.sql_tokens('text')} AS w FROM documents),
big AS (SELECT doc_id, w FROM t WHERE len(w) >= {window}),
wins AS (
  SELECT doc_id,
         unnest(range(0, len(w) - {window - 1})) AS pos,
         unnest(list_transform(range(0, len(w) - {window - 1}), i -> {wh})) AS whash
  FROM big
),
dup AS (SELECT whash FROM wins GROUP BY whash HAVING count(DISTINCT doc_id) >= 2),
dpos AS (SELECT DISTINCT wins.doc_id, wins.pos FROM wins JOIN dup USING (whash)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dpos
)
SELECT doc_id, CAST(min(pos) AS INT) AS start_tok,
       CAST(max(pos) + {window} AS INT) AS end_tok,
       CAST(max(pos) + {window} - min(pos) AS INT) AS span_tokens,
       CAST(count(*) AS BIGINT) AS n_windows
FROM isl GROUP BY doc_id, grp
"""


def q_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination (new round 4): the exact
    >=8-token runs of corpus documents that appear verbatim in the
    held-out set (doc_id % 7 == 0 stands in for an eval set — a wider
    split than `decontaminate_corpus`'s %97 so the span report is
    non-trivial at every SF). `decontaminate_corpus` flags WHICH docs
    overlap; this reports WHERE, for surgical span removal
    (`operators/textops.contamination_spans`)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    return TX.contamination_spans(corpus, bench, window=8)


def o_contamination_spans(window: int = 8) -> str:
    wh = (
        "('0x' || substr(md5(array_to_string("
        f"w[CAST(i + 1 AS INT):CAST(i + {window} AS INT)], ' ')), 1, 15))::BIGINT"
    )
    return f"""
WITH t AS (SELECT doc_id, {O.sql_tokens('text')} AS w FROM documents),
big AS (SELECT doc_id, w FROM t WHERE len(w) >= {window}),
wins AS (
  SELECT doc_id,
         unnest(range(0, len(w) - {window - 1})) AS pos,
         unnest(list_transform(range(0, len(w) - {window - 1}), i -> {wh})) AS whash
  FROM big
),
bw AS (SELECT DISTINCT whash FROM wins WHERE doc_id % 7 = 0),
dpos AS (
  SELECT wins.doc_id, wins.pos FROM wins JOIN bw USING (whash)
  WHERE wins.doc_id % 7 != 0
),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dpos
)
SELECT doc_id, CAST(min(pos) AS INT) AS start_tok,
       CAST(max(pos) + {window} AS INT) AS end_tok,
       CAST(max(pos) + {window} - min(pos) AS INT) AS span_tokens,
       CAST(count(*) AS BIGINT) AS n_windows
FROM isl GROUP BY doc_id, grp
"""


def q_scrub_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surgical CUT that completes the decontamination pipeline (new
    round 4): detect the leaked >=8-token runs (`contamination_spans`,
    same %7 eval split) and REMOVE them from each corpus document,
    emitting an auditable row per doc — token counts before/after, span
    count, and an md5 of the scrubbed text
    (`operators/textops.scrub_spans`). Detect -> cut -> verify: the
    clean_md5 pins the exact post-scrub byte content, not just counts."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    spans = TX.contamination_spans(corpus, bench, window=8)
    return TX.scrub_spans(corpus, spans)


def o_scrub_spans(window: int = 8) -> str:
    wh = (
        "('0x' || substr(md5(array_to_string("
        f"w[CAST(i + 1 AS INT):CAST(i + {window} AS INT)], ' ')), 1, 15))::BIGINT"
    )
    return f"""
WITH t AS (SELECT doc_id, {O.sql_tokens('text')} AS w FROM documents),
corpus AS (SELECT doc_id, w FROM t WHERE doc_id % 7 != 0),
big AS (SELECT doc_id, w FROM t WHERE len(w) >= {window}),
wins AS (
  SELECT doc_id,
         unnest(range(0, len(w) - {window - 1})) AS pos,
         unnest(list_transform(range(0, len(w) - {window - 1}), i -> {wh})) AS whash
  FROM big
),
bw AS (SELECT DISTINCT whash FROM wins WHERE doc_id % 7 = 0),
dpos AS (
  SELECT wins.doc_id, wins.pos FROM wins JOIN bw USING (whash)
  WHERE wins.doc_id % 7 != 0
),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dpos
),
spans AS (
  SELECT doc_id, CAST(min(pos) AS INT) AS start_tok,
         CAST(max(pos) + {window} AS INT) AS end_tok
  FROM isl GROUP BY doc_id, grp
),
tok AS (
  SELECT doc_id, unnest(w) AS tok, unnest(range(0, len(w))) AS p FROM corpus
),
-- spans are disjoint per doc (gaps-and-islands output), so a position
-- matches at most one span: LEFT JOIN + IS NULL is an exact anti-join
kept AS (
  SELECT tk.doc_id, tk.tok, tk.p
  FROM tok tk
  LEFT JOIN spans s
    ON s.doc_id = tk.doc_id AND tk.p >= s.start_tok AND tk.p < s.end_tok
  WHERE s.doc_id IS NULL
),
ka AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok_after,
         string_agg(tok, ' ' ORDER BY p) AS clean
  FROM kept GROUP BY doc_id
),
ns AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans FROM spans GROUP BY doc_id)
SELECT c.doc_id,
       CAST(len(c.w) AS BIGINT) AS n_tok_before,
       coalesce(ka.n_tok_after, 0) AS n_tok_after,
       coalesce(ns.n_spans, 0) AS n_spans,
       md5(coalesce(ka.clean, '')) AS clean_md5
FROM corpus c
LEFT JOIN ka USING (doc_id)
LEFT JOIN ns USING (doc_id)
"""


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.4), banded-LSH
    blocked candidates + exact int8 verify (the scale path)."""
    return DD.embedding_near_dup(load_table(spark, sf_dir, "embeddings"), threshold=0.4)


def o_dedup_embedding() -> str:
    # mirrors the banded-LSH default path: per-band sign signatures over
    # the SAME seeded INTEGER hyperplanes applied to the int8 storage
    # vector (exact int64 dots -> order-free, no FP sign caveat), bucket
    # self-join candidates, then symmetric int8 scoring on the quantized
    # representation (exact integer dot/norms -> order-free, matches the
    # Arrow verifier bit-for-bit)
    from pythonvectordb_spark.operators.dedup import lsh_band_planes_int

    planes = lsh_band_planes_int()
    qv = O.sql_qvec("embedding")
    sig_exprs = []
    for band_planes in planes:
        terms = " + ".join(
            "(CASE WHEN ("
            + " + ".join(
                f"qv[{j + 1}]::BIGINT * ({int(h)})" for j, h in enumerate(plane)
            )
            + f") >= 0 THEN {1 << i} ELSE 0 END)"
            for i, plane in enumerate(band_planes)
        )
        sig_exprs.append(f"({terms})")
    sigs_list = ", ".join(sig_exprs)
    cos = (
        "CASE WHEN list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum') = 0"
        "       OR list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum') = 0"
        "  THEN 0.0"
        "  ELSE list_aggregate(list_transform(a.qv, (x, i) -> x::BIGINT * b.qv[i]::BIGINT), 'sum')::DOUBLE"
        "       / (sqrt(list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)"
        "          * sqrt(list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)) END"
    )
    return f"""
WITH q AS (SELECT vec_id, {qv} AS qv FROM embeddings),
sigs AS (SELECT vec_id, [{sigs_list}] AS sigs FROM q),
banded AS (
  SELECT vec_id, t.band, sigs[CAST(t.band AS INT) + 1] AS bkey
  FROM sigs CROSS JOIN range(0, {len(planes)}) t(band)
),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id
)
SELECT c.id_a, c.id_b, round({cos}, 9) AS cosine
FROM cand c JOIN q a ON c.id_a = a.vec_id JOIN q b ON c.id_b = b.vec_id
WHERE {cos} >= 0.4
"""


_EDGES_SQL = f"""
{_SH_KEPT_CTE.strip()},
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.shv, b.shv))::BIGINT AS n_common,
         len(a.sh)::BIGINT AS n_a, len(b.sh)::BIGINT AS n_b
  FROM shk a JOIN shk b ON a.doc_id < b.doc_id
),
edges AS (SELECT id_a, id_b FROM pairs WHERE {_JACCARD} >= 0.8)
"""


def q_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup resolution: connected components over the >=0.8 Jaccard pair
    graph (iterative min-label propagation), every doc labeled with its
    component and survivor flag."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.8, max_df=NGRAM_MAX_DF)
    return DD.resolve_duplicates(docs, pairs)


def o_dedup_resolve() -> str:
    # independent implementation: transitive closure via recursive CTE
    return f"""
WITH RECURSIVE {_SH_CTE},
{_EDGES_SQL},
sym(a, b) AS (SELECT id_a, id_b FROM edges UNION SELECT id_b, id_a FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a)
SELECT d.doc_id,
       coalesce(comp.component, d.doc_id) AS component,
       (d.doc_id = coalesce(comp.component, d.doc_id)) AS is_survivor
FROM documents d LEFT JOIN comp ON d.doc_id = comp.doc_id
"""


def q_pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline composition: quality-filter ->
    dedup (component survivors) -> join embeddings. The flagship
    demonstration that the operators compose as DataFrames."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    quality = TX.text_quality(docs).filter(F.col("quality_score") >= 0.5)
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.8, max_df=NGRAM_MAX_DF)
    resolved = DD.resolve_duplicates(docs, pairs).filter(F.col("is_survivor"))
    return (
        quality.join(resolved.select("doc_id"), "doc_id")
        .join(emb, quality.doc_id == emb.vec_id)
        .select(
            "doc_id",
            "label",
            "n_tokens",
            F.col("quality_score"),
        )
    )


def o_pipeline_clean_corpus() -> str:
    stop = O.sql_stopword_filter("toks", STOPWORDS)
    return f"""
WITH RECURSIVE {_SH_CTE},
{_EDGES_SQL},
sym(a, b) AS (SELECT id_a, id_b FROM edges UNION SELECT id_b, id_a FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a),
survivors AS (
  SELECT d.doc_id FROM documents d LEFT JOIN comp ON d.doc_id = comp.doc_id
  WHERE d.doc_id = coalesce(comp.component, d.doc_id)
),
q AS (
  SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
         len(toks)::DOUBLE AS n_tok,
         len({stop})::DOUBLE AS n_stop,
         len(list_distinct(toks))::DOUBLE AS n_uniq
  FROM (SELECT doc_id, {O.sql_tokens('text')} AS toks FROM documents)
),
scored AS (
  SELECT doc_id, n_tokens,
         round(least(n_tok / 50.0, 1.0) * 0.4 + (n_uniq / n_tok) * 0.4
               + (1.0 - n_stop / n_tok) * 0.2, 9) AS quality_score
  FROM q WHERE n_tok > 0
)
SELECT s.doc_id, e.label, s.n_tokens, s.quality_score
FROM scored s
JOIN survivors USING (doc_id)
JOIN embeddings e ON s.doc_id = e.vec_id
WHERE s.quality_score >= 0.5
"""


# --------------------------------------------------------------------------
# corpus curation (decontamination / PII / mixing — operators/curation.py)
# --------------------------------------------------------------------------

from pythonvectordb_spark.operators import curation as CU  # noqa: E402


def q_decontaminate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >=2 word-3-grams
    with the held-out set (doc_id % 97 == 0 stands in for an eval set)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return CU.decontaminate(corpus, bench, n=3, min_common=2)


def o_decontaminate_corpus() -> str:
    return f"""
WITH {_SH_CTE},
bench AS (
  SELECT list(DISTINCT shingle) AS bsh
  FROM (SELECT unnest(sh) AS shingle FROM sh WHERE doc_id % 97 = 0)
),
ov AS (
  SELECT s.doc_id, len(list_intersect(s.sh, b.bsh))::BIGINT AS n_shared
  FROM sh s CROSS JOIN bench b WHERE s.doc_id % 97 != 0
)
SELECT doc_id, n_shared FROM ov WHERE n_shared >= 2
"""


def q_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit: md5 of the scrubbed text + redaction count
    per document (the registered projection keeps rows small; the
    operator itself returns the full clean text)."""
    out = CU.pii_scrub(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"), "n_redacted"
    )


def o_pii_scrub_stats() -> str:
    from pythonvectordb_spark.operators.curation import PII_PATTERNS

    clean = "text"
    counts = []
    for _, pat, token in PII_PATTERNS:
        counts.append(f"len(regexp_extract_all(text, '{pat}'))")
        clean = f"regexp_replace({clean}, '{pat}', '{token}', 'g')"
    total = " + ".join(counts)
    return f"""
SELECT doc_id, md5({clean}) AS clean_md5, CAST({total} AS BIGINT) AS n_redacted
FROM documents
"""


def q_stratified_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replayable data mixing: per-language sampling rates applied by
    content hash (en 50%, de 25%, fr 10%, others 5%)."""
    docs = load_table(spark, sf_dir, "documents")
    out = CU.stratified_sample(
        docs, {"en": 0.5, "de": 0.25, "fr": 0.1}, strata_col="lang", default_rate=0.05
    )
    return out.select("doc_id", "lang")


def o_stratified_corpus_sample() -> str:
    bucket = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000)"
    return f"""
SELECT doc_id, lang FROM documents
WHERE {bucket} < (CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500
                            WHEN 'fr' THEN 1000 ELSE 500 END)
"""


def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram: how many clusters of each size
    the >=0.8 Jaccard graph resolves to (corpus-health metric)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.8, max_df=NGRAM_MAX_DF)
    resolved = DD.resolve_duplicates(docs, pairs)
    return CU.dup_cluster_stats(resolved)


def o_dup_cluster_sizes() -> str:
    return f"""
WITH RECURSIVE {_SH_CTE},
{_EDGES_SQL},
sym(a, b) AS (SELECT id_a, id_b FROM edges UNION SELECT id_b, id_a FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a),
labeled AS (
  SELECT d.doc_id, coalesce(comp.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp ON d.doc_id = comp.doc_id
),
sizes AS (SELECT component, count(*)::BIGINT AS cluster_size FROM labeled GROUP BY component)
SELECT cluster_size, count(*)::BIGINT AS n_clusters,
       (cluster_size * count(*))::BIGINT AS n_docs
FROM sizes GROUP BY cluster_size
"""


def q_corpus_token_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: per-language document and token counts with the
    language's share of all corpus tokens (window-free: the total joins
    in as a broadcast 1-row aggregate)."""
    from pythonvectordb_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.select("lang", F.size(tokens("text")).alias("n_tok")).groupBy(
        "lang"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    total = per_lang.select(F.sum("n_tokens").cast("double").alias("_total"))
    return (
        per_lang.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / F.col("_total"), 9).alias(
                "token_share"
            ),
        )
    )


def o_corpus_token_share() -> str:
    return f"""
WITH t AS (SELECT lang, len({O.sql_tokens('text')})::BIGINT AS n_tok FROM documents),
per AS (
  SELECT lang, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens
  FROM t GROUP BY lang
)
SELECT lang, n_docs, n_tokens,
       round(n_tokens::DOUBLE / (SELECT sum(n_tokens)::DOUBLE FROM per), 9) AS token_share
FROM per
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + distinct + chars)."""
    return TX.token_counts(load_table(spark, sf_dir, "documents"))


def o_token_counts() -> str:
    return f"""
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
       CAST(length(text) AS INT) AS n_chars_measured
FROM (SELECT doc_id, text, {O.sql_tokens('text')} AS toks FROM documents)
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, type-token ratio, composite score."""
    return TX.text_quality(load_table(spark, sf_dir, "documents"))


def o_text_quality() -> str:
    stop = O.sql_stopword_filter("toks", STOPWORDS)
    return f"""
WITH base AS (SELECT doc_id, text, {O.sql_tokens('text')} AS toks FROM documents),
c AS (
  SELECT doc_id, text,
         len(toks)::DOUBLE AS n_tok,
         len({stop})::DOUBLE AS n_stop,
         len(list_distinct(toks))::DOUBLE AS n_uniq,
         CAST(len(toks) AS INT) AS n_tokens
  FROM base
),
r AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_tok > 0 THEN n_uniq / n_tok ELSE 0.0 END AS ttr,
         CASE WHEN n_tok > 0 THEN (length(text)::DOUBLE - (n_tok - 1)) / n_tok ELSE 0.0 END AS avg_len,
         n_tok
  FROM c
)
SELECT doc_id, n_tokens,
       round(stop_ratio, 9) AS stopword_ratio,
       round(ttr, 9) AS type_token_ratio,
       round(avg_len, 9) AS avg_token_len,
       round(least(n_tok / 50.0, 1.0) * 0.4 + ttr * 0.4 + (1.0 - stop_ratio) * 0.2, 9) AS quality_score
FROM r
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-count language-ID heuristic."""
    return TX.lang_id(load_table(spark, sf_dir, "documents"))


def o_lang_id() -> str:
    score_cols = ", ".join(
        f"len({O.sql_stopword_filter('toks', markers)})::BIGINT AS s_{lang}"
        for lang, markers in LANG_MARKERS_SORTED
    )
    langs = [lang for lang, _ in LANG_MARKERS_SORTED]
    m = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    whens = " ".join(f"WHEN s_{lang} = m THEN '{lang}'" for lang in langs)
    return f"""
WITH base AS (SELECT doc_id, {O.sql_tokens('text')} AS toks FROM documents),
s AS (SELECT doc_id, {score_cols} FROM base),
g AS (SELECT *, {m} AS m FROM s)
SELECT doc_id,
       CASE WHEN m <= 0 THEN 'und' {whens} END AS lang_guess,
       CAST(m AS BIGINT) AS marker_hits
FROM g
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-text md5 fingerprint + normalized length."""
    return TX.doc_fingerprint(load_table(spark, sf_dir, "documents"))


def o_doc_fingerprint() -> str:
    n = O.sql_norm_text("text")
    return f"""
SELECT doc_id, md5({n}) AS fingerprint, CAST(length({n}) AS INT) AS norm_len
FROM documents
"""


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: Rabin-Karp rolling hash over
    the token-hash sequence, h = (h*131 + hash32(tok)) mod 1e9+7 — unlike
    the md5 content fingerprint this is incrementally maintainable (append
    = one fold step) and all arithmetic stays < 2^38, exact in BIGINT."""
    from pythonvectordb_spark.functions.text import hash32, tokens

    docs = load_table(spark, sf_dir, "documents")
    M = 1_000_000_007
    th = F.transform(tokens(F.col("text")), lambda t: hash32(t))
    rolling = F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda a, x: (a * F.lit(131) + x) % F.lit(M),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        rolling.alias("rolling_hash"),
        F.size(th).cast("int").alias("n_tokens"),
    )


def o_rolling_fingerprint() -> str:
    toks = O.sql_tokens("text")
    th = f"list_transform({toks}, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)"
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(list_reduce([0::BIGINT] || {th},
                        (a, x) -> (a * 131 + x) % 1000000007) AS BIGINT) AS rolling_hash,
       CAST(len({th}) AS INT) AS n_tokens
FROM documents
"""


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, term) with smoothed idf (exact tf/df ints)."""
    return TX.tfidf_terms(load_table(spark, sf_dir, "documents"))


def o_tfidf_terms() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({O.sql_tokens('text')}) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, token
),
dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
       round(tf.tf::DOUBLE * (ln((n.n_docs + 1) / (dfreq.df + 1)::DOUBLE) + 1.0), 6) AS tfidf
FROM tf JOIN dfreq USING (token) CROSS JOIN n
"""


def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings: one multimodal row (text + vector + scalars)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    joined = docs.join(emb, docs.doc_id == emb.vec_id)
    return joined.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "label",
        F.size(_tokens("text")).alias("n_tokens"),
        F.round(l2_norm("embedding"), 9).alias("emb_norm"),
    )


def o_multimodal_join() -> str:
    return f"""
SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label,
       CAST(len({O.sql_tokens('d.text')}) AS INT) AS n_tokens,
       round({O.sql_l2_norm('e.embedding')}, 9) AS emb_norm
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column -> Arrow-batched mapInPandas feature extraction
    (stub decode: byte length + md5), oracle-checked end to end."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_features(MM.text_as_media(docs))


def o_media_features() -> str:
    return """
SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, md5(text) AS content_md5
FROM documents
"""


def q_media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (new round 4): build genuine mono
    16-bit PCM WAV payloads from the closed-form sample definition
    (`media.value_as_wav` — lengths/rates vary per row so header
    parsing is load-bearing), then chunk-walk + parse them with the
    pure-stdlib codec (`functions/wav.py`) and report sample count /
    parsed rate / integer peak / exact sum of squares / PCM digest. The
    oracle recomputes the same stats straight from the sample
    DEFINITION, so a codec regression (chunk walk, header offsets,
    endianness) breaks the value hash — the audio half of the media
    stand-in retires for uncompressed formats."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_audio_stats(MM.value_as_wav(docs))


def o_media_audio_stats() -> str:
    n_max = MM.WAV_N_BASE + MM.WAV_N_MOD  # range upper bound covers all rows
    s = f"(doc_id * {MM.WAV_MUL_ID} + i * {MM.WAV_MUL_I}) % 65536 - 32768"
    # little-endian int16 hex: two's complement low byte then high byte
    u16 = "((s + 65536) % 65536)"
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST({MM.WAV_N_BASE} + doc_id % {MM.WAV_N_MOD} AS BIGINT) AS n_samples,
         CAST({MM.WAV_RATE_BASE} + (doc_id % 3) * {MM.WAV_RATE_STEP} AS INT)
           AS sample_rate
  FROM documents
),
smp AS (
  SELECT b.doc_id, r.i, {s} AS s
  FROM base b CROSS JOIN range(0, {n_max}) r(i)
  WHERE r.i < b.n_samples
),
agg AS (
  SELECT doc_id,
         CAST(max(abs(s)) AS INT) AS peak,
         CAST(sum(s * s) AS BIGINT) AS sum_sq,
         md5(string_agg(printf('%02x%02x',
                               CAST({u16} % 256 AS INT),
                               CAST({u16} // 256 AS INT)),
                        '' ORDER BY i)) AS pcm_md5
  FROM smp GROUP BY doc_id
)
SELECT base.doc_id, base.n_samples, base.sample_rate,
       agg.peak, agg.sum_sq, agg.pcm_md5
FROM base JOIN agg USING (doc_id)
"""


def q_media_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio resample round trip (new round 4): decode each WAV,
    2:1 integer box decimate (unsigned-domain floor mean — portable
    across engines, see `media.media_audio_resample`), re-encode at the
    halved rate, decode again, report stats. The oracle computes the
    identical decimation straight from the closed-form sample
    definition."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_audio_resample(MM.value_as_wav(docs), factor=2)


def o_media_audio_resample(factor: int = 2) -> str:
    n_out_max = (MM.WAV_N_BASE + MM.WAV_N_MOD) // factor + 1
    m = lambda i: f"((doc_id * {MM.WAV_MUL_ID} + ({i}) * {MM.WAV_MUL_I}) % 65536)"  # noqa: E731
    # unsigned box mean of the block, back to signed
    s = (
        "("
        + " + ".join(m(f"{factor} * r.j + {t}") for t in range(factor))
        + f") // {factor} - 32768"
    )
    u16 = "((s + 65536) % 65536)"
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(({MM.WAV_N_BASE} + doc_id % {MM.WAV_N_MOD}) // {factor} AS BIGINT)
           AS n_out,
         CAST(({MM.WAV_RATE_BASE} + (doc_id % 3) * {MM.WAV_RATE_STEP}) // {factor}
           AS INT) AS out_rate
  FROM documents
),
smp AS (
  SELECT b.doc_id, r.j, {s} AS s
  FROM base b CROSS JOIN range(0, {n_out_max}) r(j)
  WHERE r.j < b.n_out
),
agg AS (
  SELECT doc_id,
         CAST(sum(s * s) AS BIGINT) AS sum_sq,
         md5(string_agg(printf('%02x%02x',
                               CAST({u16} % 256 AS INT),
                               CAST({u16} // 256 AS INT)),
                        '' ORDER BY j)) AS pcm_md5
  FROM smp GROUP BY doc_id
)
SELECT base.doc_id, base.n_out AS n_samples, base.out_rate AS sample_rate,
       agg.sum_sq, agg.pcm_md5
FROM base JOIN agg USING (doc_id)
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (new round 4): for every anchor,
    the exact top-5 most-similar vectors with a DIFFERENT label, via one
    BLAS knn_join per class against the non-class corpus — the label
    constraint holds by construction, never by over-fetch-then-filter
    (`operators/search.hard_negatives`)."""
    return S.hard_negatives(_emb(spark, sf_dir), k=5)


def o_hard_negatives(k: int = 5) -> str:
    qv = O.sql_qvec("embedding")
    cos = (
        "(list_aggregate(list_transform(a.qv, (x, i) -> x::BIGINT * b.qv[i]::BIGINT), 'sum')::DOUBLE"
        " / (sqrt(list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)"
        " * sqrt(list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)))"
    )
    return f"""
WITH q AS (SELECT vec_id, label, {qv} AS qv FROM embeddings),
p AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neg_id, {cos} AS score
  FROM q a JOIN q b ON a.label != b.label
),
rk AS (
  SELECT query_id, neg_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, neg_id ASC) AS INT) AS rank
  FROM p
)
SELECT query_id, neg_id, round(score, 9) AS score, rank
FROM rk WHERE rank <= {k}
"""


def q_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplet mining (new round 4): per anchor the nearest
    same-label positive and nearest cross-label hard negative with the
    round-9 margin and violation flag — the rows a triplet/InfoNCE
    trainer consumes (`operators/search.contrastive_triplets`)."""
    return S.contrastive_triplets(_emb(spark, sf_dir))


def o_contrastive_triplets() -> str:
    qv = O.sql_qvec("embedding")
    cos = (
        "(list_aggregate(list_transform(a.qv, (x, i) -> x::BIGINT * b.qv[i]::BIGINT), 'sum')::DOUBLE"
        " / (sqrt(list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)"
        " * sqrt(list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)))"
    )
    return f"""
WITH q AS (SELECT vec_id, label, {qv} AS qv FROM embeddings),
pp AS (
  SELECT a.vec_id AS query_id, b.vec_id AS pos_id, {cos} AS score
  FROM q a JOIN q b ON a.label = b.label AND a.vec_id != b.vec_id
),
prk AS (
  SELECT query_id, pos_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, pos_id ASC) AS rn
  FROM pp
),
pos AS (SELECT query_id, pos_id, round(score, 9) AS pos_score
        FROM prk WHERE rn = 1),
np AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neg_id, {cos} AS score
  FROM q a JOIN q b ON a.label != b.label
),
nrk AS (
  SELECT query_id, neg_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neg_id ASC) AS rn
  FROM np
),
neg AS (SELECT query_id, neg_id, round(score, 9) AS neg_score
        FROM nrk WHERE rn = 1)
SELECT pos.query_id AS anchor_id, pos.pos_id, pos.pos_score,
       neg.neg_id, neg.neg_score,
       round(pos.pos_score - neg.neg_score, 9) AS margin,
       CAST(round(pos.pos_score - neg.neg_score, 9) <= 0.0 AS INT) AS violation
FROM pos JOIN neg ON pos.query_id = neg.query_id
"""


def q_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix (new round 4): the MinHash+LSH
    near-dup pairs folded with each side's source into a symmetric
    (source_a, source_b, n_pairs) matrix — the mirror-site / re-crawl
    detector that tells the mixture weights two sources are one feed
    (`operators/curation.cross_source_dup_matrix` over
    `dedup.minhash_lsh_pairs`)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_pairs(docs, threshold=0.8)
    return CU.cross_source_dup_matrix(pairs, docs)


def o_dup_source_matrix() -> str:
    # the verified near-dup pair report IS the existing minhash oracle;
    # wrap it as a derived table and fold in the source directory
    return f"""
WITH pairs AS (SELECT * FROM ({o_dedup_minhash_lsh()})),
src AS (SELECT doc_id, source FROM documents)
SELECT least(sa.source, sb.source) AS source_a,
       greatest(sa.source, sb.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs
JOIN src sa ON pairs.id_a = sa.doc_id
JOIN src sb ON pairs.id_b = sb.doc_id
GROUP BY 1, 2
"""


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out contamination audit (new round 4): deterministic
    md5-u32 train/val/test split (90/5/5, exact integer thresholds —
    append-stable, engine-portable) folded with the MinHash near-dup
    pair report into a symmetric (split_a, split_b, n_pairs, leak)
    matrix; off-diagonal cells are eval docs whose near-copy sits in
    train (`operators/curation.hash_split` + `split_leakage`)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_pairs(docs, threshold=0.8)
    return CU.split_leakage(pairs, docs)


def o_split_leakage() -> str:
    from pythonvectordb_spark.operators.curation import SPLIT_BOUNDS, SPLIT_LAST

    # split assignment mirrored as pure-integer CASE thresholds on the
    # same md5 u32; the verified minhash oracle is the pair source
    u = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    case = (
        "CASE "
        + " ".join(f"WHEN {u} < {b} THEN '{name}'" for name, b in SPLIT_BOUNDS)
        + f" ELSE '{SPLIT_LAST}' END"
    )
    return f"""
WITH pairs AS (SELECT * FROM ({o_dedup_minhash_lsh()})),
assigned AS (SELECT doc_id, {case} AS split FROM documents),
m AS (
  SELECT least(sa.split, sb.split) AS split_a,
         greatest(sa.split, sb.split) AS split_b,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM pairs
  JOIN assigned sa ON pairs.id_a = sa.doc_id
  JOIN assigned sb ON pairs.id_b = sb.doc_id
  GROUP BY 1, 2
)
SELECT split_a, split_b, n_pairs, CAST(split_a != split_b AS INT) AS leak FROM m
"""


def q_nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive Bayes language classifier confusion matrix (new round 4):
    add-one-smoothed multinomial NB trained on the doc_id-even half of
    the corpus, scored on the odd half, argmax on ROUNDED per-class
    scores with class tie-break — the deterministic stand-in for the
    fastText-style quality/domain gates (CCNet, GPT-3) every curation
    pipeline runs (`operators/curation.nb_classifier_confusion`)."""
    docs = load_table(spark, sf_dir, "documents")
    return CU.nb_classifier_confusion(docs, (F.col("doc_id") % 2) == 0)


def o_nb_lang_confusion() -> str:
    # mirror: every log argument an exact-integer ratio promoted to
    # double; per-(doc,class) score = round(prior + grouped sum, 6)
    # (the importance_weights float discipline); argmax via row_number
    # on the rounded score with class-name tie-break
    return f"""
WITH t AS (SELECT doc_id, lang, {O.sql_tokens('text')} AS w,
                  doc_id % 2 = 0 AS is_tr FROM documents),
tok AS (SELECT doc_id, lang, is_tr, unnest(w) AS tok FROM t),
tr AS (SELECT * FROM tok WHERE is_tr),
te AS (SELECT * FROM tok WHERE NOT is_tr),
cond AS (SELECT lang AS cls, tok, CAST(count(*) AS BIGINT) AS c_tc
         FROM tr GROUP BY 1, 2),
clstok AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS tok_c
           FROM tr GROUP BY 1),
vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS V FROM tr),
ndocs AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS N FROM ndocs),
classes AS (
  SELECT cls, ln(n_docs::DOUBLE / N::DOUBLE) AS prior_ln, tok_c + V AS denom
  FROM ndocs JOIN clstok USING (cls) CROSS JOIN vocab CROSS JOIN tot
),
sc AS (
  SELECT te.doc_id, te.lang, c.cls,
         round(c.prior_ln
               + sum(ln((coalesce(cond.c_tc, 0) + 1)::DOUBLE
                        / c.denom::DOUBLE)), 6) AS score
  FROM te CROSS JOIN classes c
  LEFT JOIN cond ON cond.cls = c.cls AND cond.tok = te.tok
  GROUP BY 1, 2, 3, c.prior_ln
),
rk AS (
  SELECT doc_id, lang, cls,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cls ASC) AS rn
  FROM sc
)
SELECT lang, cls AS predicted, CAST(count(*) AS BIGINT) AS n_docs
FROM rk WHERE rn = 1 GROUP BY 1, 2
"""


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language perplexity tertiles (new round 4):
    docs ranked within language by rounded unigram surprisal, ntile(3)
    head/middle/tail cut, per-bucket counts and surprisal ranges — the
    classic quality triage feeding mixture decisions
    (`operators/textops.perplexity_buckets`)."""
    return TX.perplexity_buckets(load_table(spark, sf_dir, "documents"))


def o_perplexity_buckets() -> str:
    # wraps the verified surprisal oracle as a derived table; ntile on
    # (rounded score, id) is deterministic on both engines
    return f"""
WITH s AS (SELECT * FROM ({o_unigram_surprisal()})),
j AS (SELECT d.lang, s.doc_id, s.avg_surprisal
      FROM s JOIN documents d USING (doc_id)),
b AS (SELECT lang, avg_surprisal,
             ntile(3) OVER (PARTITION BY lang
                            ORDER BY avg_surprisal ASC, doc_id ASC) AS bucket
      FROM j)
SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
       min(avg_surprisal) AS lo_surprisal,
       max(avg_surprisal) AS hi_surprisal
FROM b GROUP BY 1, 2
"""


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Zipf-law fit (new round 4): OLS of ln(freq) on
    ln(rank) over the top-1000 tokens — slope ≈ −1 on natural text;
    drift toward 0 flags token-soup/template contamination. The rank
    cut is TakeOrderedAndProject so no global vocab sort exists at any
    scale (`operators/textops.zipf_fit`)."""
    return TX.zipf_fit(load_table(spark, sf_dir, "documents"))


def o_zipf_fit(max_rank: int = 1000) -> str:
    # ranks from pure integer ordering; x/y are ln's of exact integers;
    # moment sums rounded at 6 after the closed-form division, and the
    # intercept reuses the ROUNDED slope (mirroring the operator), so
    # both engines compute the residual from identical slope values
    return f"""
WITH tok AS (SELECT unnest({O.sql_tokens('text')}) AS token FROM documents),
vocab AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab FROM vocab),
top AS (SELECT token, cnt FROM vocab ORDER BY cnt DESC, token ASC LIMIT {max_rank}),
ranked AS (
  SELECT ln((row_number() OVER (ORDER BY cnt DESC, token ASC))::DOUBLE) AS x,
         ln(cnt::DOUBLE) AS y
  FROM top
),
m AS (SELECT CAST(count(*) AS BIGINT) AS n_fit, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM ranked),
s AS (SELECT n_fit, sx, sy,
             round((n_fit * sxy - sx * sy) / (n_fit * sxx - sx * sx), 6) AS slope
      FROM m)
SELECT nv.n_vocab, s.n_fit, s.slope,
       round((s.sy - s.slope * s.sx) / s.n_fit, 6) AS intercept
FROM s CROSS JOIN nv
"""


def q_cluster_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware split, audited (new round 4): connected components
    over the >=0.8 Jaccard pair graph, split assigned by md5 of the
    COMPONENT id so whole dup clusters share a split, then the same
    leakage fold as `split_leakage` — every returned cell must be
    diagonal (leak = 0 by construction), and the oracle proves it
    independently via a recursive-CTE closure
    (`operators/curation.cluster_aware_split` + `split_leakage_matrix`).
    The pair frame feeds both the component build and the fold, and the
    assignment frame feeds both fold sides — each is lazily
    checkpointed (union-recompute discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        docs, threshold=0.8, max_df=NGRAM_MAX_DF
    ).localCheckpoint(eager=False)
    comps = DD.resolve_duplicates(docs, pairs)
    assigned = CU.cluster_aware_split(comps).localCheckpoint(eager=False)
    return CU.split_leakage_matrix(pairs, assigned)


def o_cluster_split_leakage() -> str:
    from pythonvectordb_spark.operators.curation import SPLIT_BOUNDS, SPLIT_LAST

    u = "('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8))::BIGINT"
    case = (
        "CASE "
        + " ".join(f"WHEN {u} < {b} THEN '{name}'" for name, b in SPLIT_BOUNDS)
        + f" ELSE '{SPLIT_LAST}' END"
    )
    return f"""
WITH RECURSIVE {_SH_CTE},
{_EDGES_SQL},
sym(a, b) AS (SELECT id_a, id_b FROM edges UNION SELECT id_b, id_a FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a),
allc AS (SELECT d.doc_id, coalesce(comp.component, d.doc_id) AS component
         FROM documents d LEFT JOIN comp ON d.doc_id = comp.doc_id),
assigned AS (SELECT doc_id, {case} AS split FROM allc),
m AS (
  SELECT least(sa.split, sb.split) AS split_a,
         greatest(sa.split, sb.split) AS split_b,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM edges
  JOIN assigned sa ON edges.id_a = sa.doc_id
  JOIN assigned sb ON edges.id_b = sb.doc_id
  GROUP BY 1, 2
)
SELECT split_a, split_b, n_pairs, CAST(split_a != split_b AS INT) AS leak FROM m
"""


EPOCH_BUDGET = 500_000


def q_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch planner (new round 4): at a 500k-token
    training budget under the sqrt temperature mixture, how many
    passes does each source make — the GPT-3 epochs column, with an
    `oversampled` flag on the rounded boundary
    (`operators/curation.epoch_plan`)."""
    return CU.epoch_plan(load_table(spark, sf_dir, "documents"), EPOCH_BUDGET)


def o_epoch_plan() -> str:
    # same sorted-fold S as the mixture oracle; epochs rounded at 6
    # BEFORE the >1 comparison so the flag boundary is engine-portable
    return f"""
WITH s AS (
  SELECT source,
         CAST(sum(len({O.sql_tokens('text')})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (
  SELECT list_aggregate(list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY source),
                        'sum') AS S
  FROM s
),
r AS (
  SELECT source, n_tokens,
         round(sqrt(CAST(n_tokens AS DOUBLE)) / S, 9) AS weight,
         round({float(EPOCH_BUDGET)!r} * sqrt(CAST(n_tokens AS DOUBLE))
               / (S * CAST(n_tokens AS DOUBLE)), 6) AS epochs
  FROM s CROSS JOIN tot
)
SELECT source, n_tokens, weight, epochs,
       CAST(epochs > 1.0 AS INT) AS oversampled
FROM r
"""


def q_dedup_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication inflation (new round 4): raw vs
    exact-unique doc/token counts and their ratio — the correction
    factor mixture weights need when a source is mostly self-copies
    (`operators/curation.dedup_inflation`)."""
    return CU.dedup_inflation(load_table(spark, sf_dir, "documents"))


def o_dedup_inflation() -> str:
    return f"""
WITH per_text AS (
  SELECT source, md5(text) AS h,
         CAST(count(*) AS BIGINT) AS n_copies,
         CAST(min(len({O.sql_tokens('text')})) AS BIGINT) AS n_tok
  FROM documents GROUP BY 1, 2
),
s AS (
  SELECT source,
         CAST(sum(n_copies) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS unique_docs,
         CAST(sum(n_tok * n_copies) AS BIGINT) AS n_tokens,
         CAST(sum(n_tok) AS BIGINT) AS unique_tokens
  FROM per_text GROUP BY 1
)
SELECT source, n_docs, unique_docs, n_tokens, unique_tokens,
       round(n_tokens::DOUBLE / unique_tokens::DOUBLE, 6) AS inflation
FROM s
"""


def q_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization recall audit (new round 4): per probe query
    (vec_id < 16), overlap@10 between the int8-cosine exact top-k and
    the float-cosine exact top-k — the measured price of the
    reference's 4x int8 compression
    (`operators/search.quantization_recall`)."""
    return S.quantization_recall(_emb(spark, sf_dir), k=10)


def o_quantization_recall(k: int = 10) -> str:
    qv = O.sql_qvec("embedding")
    icos = (
        "(list_aggregate(list_transform(q.qv, (x, i) -> x::BIGINT * b.qv[i]::BIGINT), 'sum')::DOUBLE"
        " / (sqrt(list_aggregate(list_transform(q.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)"
        " * sqrt(list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)))"
    )
    fcos = O.sql_cosine_float_cols("q.fv", "b.fv")
    return f"""
WITH base AS (SELECT vec_id, {qv} AS qv, embedding AS fv FROM embeddings),
qs AS (SELECT vec_id AS query_id, qv, fv FROM base WHERE vec_id < 16),
ip AS (
  SELECT q.query_id, b.vec_id, {icos} AS score
  FROM qs q CROSS JOIN base b
),
irk AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rn
  FROM ip
),
i8 AS (SELECT query_id, vec_id FROM irk
       WHERE rn <= {k + 1} AND query_id != vec_id),
fp AS (
  SELECT q.query_id, b.vec_id, round({fcos}, 9) AS score
  FROM qs q CROSS JOIN base b
  WHERE q.query_id != b.vec_id
),
frk AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rn
  FROM fp
),
fl AS (SELECT query_id, vec_id FROM frk WHERE rn <= {k}),
ov AS (
  SELECT i8.query_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM i8 JOIN fl ON i8.query_id = fl.query_id AND i8.vec_id = fl.vec_id
  GROUP BY 1
)
SELECT qs.query_id,
       coalesce(ov.n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
       round(coalesce(ov.n_overlap, 0)::DOUBLE / {float(k)!r}, 6) AS recall
FROM qs LEFT JOIN ov ON qs.query_id = ov.query_id
"""


def q_minhash_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding precision report (new round 4): candidate pairs
    emitted by the 4x3 banding vs pairs surviving exact verification —
    the measured knob for tuning banding parameters
    (`operators/dedup.minhash_banding_report`)."""
    return DD.minhash_banding_report(load_table(spark, sf_dir, "documents"))


def o_minhash_precision() -> str:
    from pythonvectordb_spark.functions.text import MINHASH_P, minhash_params

    params = minhash_params(12)
    sigs = ", ".join(
        f"min(({a}::BIGINT * h1 + {b}::BIGINT * h2) % {MINHASH_P}::BIGINT) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    bands_sql = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, md5(h{b * 3}::VARCHAR || '|' || h{b * 3 + 1}::VARCHAR || '|' || h{b * 3 + 2}::VARCHAR) AS bkey FROM sig"
        for b in range(4)
    )
    return f"""
WITH {_SH_CTE},
inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
hashed AS (SELECT doc_id,
                  ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h1,
                  ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS h2
           FROM inv),
sig AS (SELECT doc_id, {sigs} FROM hashed GROUP BY doc_id),
banded AS ({bands_sql}),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM banded x JOIN banded y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
),
ver AS (
  SELECT id_a, id_b,
         len(list_intersect(a.sh, b.sh))::BIGINT AS n_common,
         len(a.sh)::BIGINT AS n_a, len(b.sh)::BIGINT AS n_b
  FROM cand JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b
),
counts AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
         (SELECT CAST(count(*) AS BIGINT) FROM ver
          WHERE {_JACCARD} >= 0.8) AS n_verified
)
SELECT n_docs, n_candidates, n_verified,
       CASE WHEN n_candidates = 0 THEN 1.0
            ELSE round(n_verified::DOUBLE / n_candidates::DOUBLE, 6) END AS precision
FROM counts
"""


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift report (new round 4): the lang
    and source distributions of the doc_id-even half vs the doc_id-odd
    half (stand-ins for two crawl snapshots), add-half smoothed, one
    psi_term row per category (`operators/curation.distribution_drift`)
    — the pre-admission drift monitor for a new dump."""
    docs = load_table(spark, sf_dir, "documents")
    return CU.distribution_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )


def o_corpus_drift() -> str:
    p_a = "((CAST(n_a AS DOUBLE) + 0.5) / (CAST(sa AS DOUBLE) + 0.5 * k))"
    p_b = "((CAST(n_b AS DOUBLE) + 0.5) / (CAST(sb AS DOUBLE) + 0.5 * k))"
    return f"""
WITH dv AS (
  SELECT doc_id, 'lang' AS dim, lang AS value FROM documents
  UNION ALL
  SELECT doc_id, 'source', source FROM documents
),
a AS (
  SELECT dim, value, CAST(count(*) AS BIGINT) AS n_a
  FROM dv WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
b AS (
  SELECT dim, value, CAST(count(*) AS BIGINT) AS n_b
  FROM dv WHERE doc_id % 2 = 1 GROUP BY 1, 2
),
j AS (
  SELECT dim, value, coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
  FROM a FULL OUTER JOIN b USING (dim, value)
),
tot AS (
  SELECT dim, CAST(sum(n_a) AS BIGINT) AS sa, CAST(sum(n_b) AS BIGINT) AS sb,
         CAST(count(*) AS BIGINT) AS k
  FROM j GROUP BY 1
)
SELECT j.dim, j.value, j.n_a, j.n_b,
       round(({p_a} - {p_b}) * ln({p_a} / {p_b}), 6) AS psi_term
FROM j JOIN tot USING (dim)
"""


def q_media_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end-to-end (new round 4): build genuine PNG
    payloads whose 16x16 grey pixels are an md5 chain of the text
    (`media.text_as_png`), then zlib-decompress + unfilter them with the
    pure-stdlib codec (`functions/png.py`) and report dims / pixel sum /
    pixel digest. The oracle recomputes the same stats straight from the
    pixel DEFINITION, so a codec regression (filter math, scanline
    layout, chunk parsing) breaks the value hash — this retires the
    'decode is a stand-in' marker for images."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_image_stats(MM.text_as_png(docs))


def o_media_image_stats() -> str:
    side = 16  # MM.PNG_SIDE; 16 md5 digests of 16 bytes = 256 pixels
    n_digests = side * side // 16
    n_px = side * side
    return f"""
WITH px AS (
  SELECT doc_id,
         string_agg(md5(text || ':' || CAST(i AS VARCHAR)), '' ORDER BY i) AS hexpix
  FROM documents CROSS JOIN range(0, {n_digests}) r(i)
  GROUP BY doc_id
),
sums AS (
  SELECT doc_id,
         CAST(sum(('0x' || substr(hexpix, CAST(2 * j + 1 AS INT), 2))::BIGINT)
              AS BIGINT) AS pixel_sum
  FROM px CROSS JOIN range(0, {n_px}) s(j)
  GROUP BY doc_id
)
SELECT px.doc_id, CAST({side} AS INT) AS width, CAST({side} AS INT) AS height,
       CAST({n_px} AS BIGINT) AS n_pixels, sums.pixel_sum,
       md5(px.hexpix) AS pixel_md5
FROM px JOIN sums USING (doc_id)
"""


def q_media_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize (new round 4): decode each `text_as_png` PNG,
    2x2 box-downsample with integer-exact floor means, re-encode and
    decode again (both codec directions exercised per row), report
    resized dims / sum / digest. The oracle computes the identical
    downsample straight from the pixel definition."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_image_resize(MM.text_as_png(docs), factor=2)


def o_media_image_resize() -> str:
    def byte_at(idx_expr: str) -> str:
        return f"('0x' || substr(hexpix, 2 * ({idx_expr}) + 1, 2))::BIGINT"

    base = "32 * rc.r + 2 * cc.c"
    v = (
        "("
        + " + ".join(byte_at(f"{base} + {off}") for off in (0, 1, 16, 17))
        + ") // 4"
    )
    return f"""
WITH px AS (
  SELECT doc_id,
         string_agg(md5(text || ':' || CAST(i AS VARCHAR)), '' ORDER BY i) AS hexpix
  FROM documents CROSS JOIN range(0, 16) r(i)
  GROUP BY doc_id
),
rv AS (
  SELECT doc_id, rc.r AS r, cc.c AS c, {v} AS v
  FROM px CROSS JOIN range(0, 8) rc(r) CROSS JOIN range(0, 8) cc(c)
)
SELECT doc_id, CAST(8 AS INT) AS out_width, CAST(8 AS INT) AS out_height,
       CAST(sum(v) AS BIGINT) AS resized_sum,
       md5(string_agg(lpad(lower(hex(v)), 2, '0'), '' ORDER BY r, c)) AS resized_md5
FROM rv GROUP BY doc_id
"""


def q_media_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode end-to-end (new round 5): build genuine
    JPEG payloads — real DQT/DHT/SOF/SOS markers, canonical Huffman
    entropy coding, zigzag, DPCM — whose 16x16 grey image is a 2x2 grid
    of CONSTANT 8x8 blocks valued at bytes 0-3 of md5(text)
    (`media.text_as_jpeg`), then parse + entropy-decode + dequantize +
    IDCT them with the pure-stdlib codec (`functions/jpeg.py`) and
    report dims / pixel sum / pixel digest. Constant blocks make the
    lossy DCT path bit-exact (decoded value = clamp(3*round((v-128)/3)
    + 128), never a half-integer — jpeg.py module docstring), so the
    oracle recomputes the decoded pixels straight from that integer
    definition: a codec bug anywhere in the marker/Huffman/zigzag/DPCM/
    IDCT pipeline breaks the value hash. Retires the 'JPEG is a
    stand-in' marker (SURVEY §2.12 multimodal)."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_jpeg_stats(MM.text_as_jpeg(docs))


def o_media_jpeg_stats() -> str:
    # round(t/3) in pure integers: (|t|+1)//3 with the sign restored
    # (t = v-128 is never a half-multiple of 3, so no tie-break issue)
    def dec(v: str) -> str:
        return (
            f"GREATEST(0, LEAST(255, 128 + 3 * (CASE WHEN {v} >= 128 "
            f"THEN ({v} - 127) // 3 ELSE -((129 - {v}) // 3) END)))"
        )

    def hx(d: str) -> str:
        return f"lpad(lower(hex({d})), 2, '0')"

    return f"""
WITH v AS (
  SELECT doc_id,
         ('0x' || substr(md5(text), 1, 2))::BIGINT AS v0,
         ('0x' || substr(md5(text), 3, 2))::BIGINT AS v1,
         ('0x' || substr(md5(text), 5, 2))::BIGINT AS v2,
         ('0x' || substr(md5(text), 7, 2))::BIGINT AS v3
  FROM documents
),
dec AS (
  SELECT doc_id, {dec('v0')} AS d0, {dec('v1')} AS d1,
         {dec('v2')} AS d2, {dec('v3')} AS d3
  FROM v
)
SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(256 AS BIGINT) AS n_pixels,
       CAST(64 * (d0 + d1 + d2 + d3) AS BIGINT) AS pixel_sum,
       md5(repeat(repeat({hx('d0')}, 8) || repeat({hx('d1')}, 8), 8)
           || repeat(repeat({hx('d2')}, 8) || repeat({hx('d3')}, 8), 8)) AS pixel_md5
FROM dec
"""


def q_media_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy-codec reconstruction guarantee (the `approx_percentile_error`
    pattern, new round 5): full-noise 16x16 images from the md5 chain of
    the text — every pixel independent, the hardest case for a DCT
    codec — encoded then decoded through the REAL JPEG pipeline. Emits
    the original pixel sum (hash-matched against the oracle's own
    computation from the pixel definition, pinning WHAT was encoded)
    and a max-abs-reconstruction-error bound check (measured max 21 on
    the deterministic fixtures at sf0.01; bound 48) that the oracle asserts as
    constant 1."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_jpeg_roundtrip_error(docs)


def o_media_jpeg_roundtrip() -> str:
    return """
WITH px AS (
  SELECT doc_id,
         string_agg(md5(text || ':' || CAST(i AS VARCHAR)), '' ORDER BY i) AS hexpix
  FROM documents CROSS JOIN range(0, 16) r(i)
  GROUP BY doc_id
)
SELECT doc_id,
       CAST(sum(('0x' || substr(hexpix, CAST(2 * j + 1 AS INT), 2))::BIGINT)
            AS BIGINT) AS orig_sum,
       CAST(1 AS BIGINT) AS within_bound
FROM px CROSS JOIN range(0, 256) s(j)
GROUP BY doc_id
"""


def q_media_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow execution shape (raw RecordBatches, no pandas) —
    byte-identical to the mapInPandas path, same oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_features_arrow(MM.text_as_media(docs))


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: tile-and-truncate every payload to 64 bytes via
    mapInPandas (binary in/out), value-checked by md5."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_resize(MM.text_as_media(docs), target_bytes=64)


def o_media_resize() -> str:
    # ASCII corpus (verified): octet_length == length, so string repeat/
    # substr mirror the byte-level tile-and-truncate exactly.
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS INT) AS orig_bytes,
       md5(substr(repeat(text, CAST(ceil(64.0 / length(text)) AS INT)), 1, 64)) AS resized_md5
FROM documents
"""


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: every 2nd 64-byte frame per payload —
    one-to-many mapInPandas fan-out (the video-frame extraction shape).
    Frame/stride sized BELOW the corpus's document lengths (testdata
    docs are ~50-550 chars) so the oracle actually witnesses multi-frame
    fan-out per payload, not a degenerate one-frame-per-doc mapping."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_frame_sample(MM.text_as_media(docs), frame_bytes=64, stride=2)


def o_media_frame_sample() -> str:
    # the frame bound is derived from each payload's own length (lateral
    # range), not a fixed cap — no latent divergence if documents grow
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(t.i AS INT) AS frame_idx,
       CAST(length(substr(text, CAST(t.i AS BIGINT) * 128 + 1, 64)) AS INT) AS frame_len,
       md5(substr(text, CAST(t.i AS BIGINT) * 128 + 1, 64)) AS frame_md5
FROM documents
CROSS JOIN unnest(range(0, CAST(ceil(length(text) / 128.0) AS BIGINT))) t(i)
"""


# --------------------------------------------------------------------------
# round-2 text-pipeline additions: chunking, repetition, surprisal, filter
# --------------------------------------------------------------------------


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG / pretrain chunking: overlapping 16-token windows (step 12),
    one explode, no shuffle (textops.chunk_documents)."""
    return TX.chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=16, overlap=4
    )


def o_chunk_documents() -> str:
    # chunk count = 1 + ceildiv(n - 16, 12), clamped at 1; chunk i covers
    # 1-based tokens [i*12+1, i*12+16] — same integer arithmetic as Spark
    return f"""
WITH base AS (SELECT doc_id, {O.sql_tokens('text')} AS t FROM documents),
c AS (
  SELECT doc_id, t,
         CASE WHEN len(t) <= 0 THEN 0
              ELSE 1 + greatest(0, CAST(floor((len(t) - 16 + 11) / 12.0) AS INT))
         END AS n_chunks
  FROM base
),
e AS (SELECT doc_id, t, unnest(range(0, n_chunks)) AS chunk_idx FROM c)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       array_to_string(t[chunk_idx*12 + 1 : chunk_idx*12 + 16], ' ') AS chunk_text,
       CAST(len(t[chunk_idx*12 + 1 : chunk_idx*12 + 16]) AS INT) AS n_chunk_tokens
FROM e
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (dup-token fraction, top token /
    bigram share) via two map-side-combined doc-keyed aggregations."""
    return TX.repetition_stats(load_table(spark, sf_dir, "documents"))


def o_repetition_stats() -> str:
    return f"""
WITH base AS (SELECT doc_id, {O.sql_tokens('text')} AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS g FROM base),
tc AS (SELECT doc_id, g, count(*) AS c FROM tok GROUP BY doc_id, g),
ta AS (
  SELECT doc_id, max(c)::BIGINT AS top_token_count, sum(c)::BIGINT AS n_tokens,
         count(*)::BIGINT AS n_distinct
  FROM tc GROUP BY doc_id
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
  FROM base
),
bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
ba AS (
  SELECT doc_id, max(c)::BIGINT AS top_bigram_count, sum(c)::BIGINT AS n_bigrams
  FROM bc GROUP BY doc_id
)
SELECT ta.doc_id, n_tokens,
       round((n_tokens::DOUBLE - n_distinct) / n_tokens::DOUBLE, 9) AS dup_token_frac,
       round(top_token_count / n_tokens::DOUBLE, 9) AS top_token_share,
       round(coalesce(top_bigram_count, 0)::DOUBLE
             / greatest(coalesce(n_bigrams, 0), 1)::DOUBLE, 9) AS top_bigram_share
FROM ta LEFT JOIN ba ON ta.doc_id = ba.doc_id
"""


def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity proxy: avg/max -ln p(token) under the corpus unigram
    model (vocabulary aggregate re-joined on the token key)."""
    return TX.unigram_surprisal(load_table(spark, sf_dir, "documents"))


def o_unigram_surprisal() -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest({O.sql_tokens('text')}) AS token FROM documents),
vocab AS (SELECT token, count(*)::BIGINT AS cnt FROM tok GROUP BY token),
tot AS (SELECT sum(cnt)::DOUBLE AS total FROM vocab)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       round(avg(ln(total / cnt::DOUBLE)), 9) AS avg_surprisal,
       round(max(ln(total / cnt::DOUBLE)), 9) AS max_surprisal
FROM tok JOIN vocab USING (token) CROSS JOIN tot
GROUP BY doc_id
"""


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite keep/drop verdict with first-failing-rule reason
    (curation.quality_filter): single-pass expressions, no shuffle."""
    return CU.quality_filter(load_table(spark, sf_dir, "documents"))


def o_quality_filter() -> str:
    stop = O.sql_stopword_filter("t", STOPWORDS)
    return f"""
WITH base AS (SELECT doc_id, {O.sql_tokens('text')} AS t FROM documents),
c AS (
  SELECT doc_id,
         len(t) AS n_tok,
         len({stop})::DOUBLE AS n_stop,
         len(list_distinct(t))::DOUBLE AS n_uniq,
         coalesce(list_aggregate(
           list_transform(list_distinct(t), x -> len(list_filter(t, y -> y = x))),
           'max'), 0)::DOUBLE AS top_cnt
  FROM base
),
r AS (
  SELECT doc_id, n_tok,
         CASE WHEN n_tok > 0 THEN n_uniq / n_tok::DOUBLE ELSE 0.0 END AS ttr,
         CASE WHEN n_tok > 0 THEN n_stop / n_tok::DOUBLE ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_tok > 0 THEN top_cnt / n_tok::DOUBLE ELSE 0.0 END AS top_share
  FROM c
),
v AS (
  SELECT doc_id, n_tok, ttr, stop_ratio, top_share,
         CASE WHEN n_tok < 10 THEN 'short'
              WHEN ttr < 0.25 THEN 'low_diversity'
              WHEN stop_ratio > 0.6 THEN 'stopword_soup'
              WHEN top_share > 0.25 THEN 'repetitive'
              ELSE 'ok' END AS reject_reason
  FROM r
)
SELECT doc_id,
       reject_reason = 'ok' AS keep,
       reject_reason,
       CAST(n_tok AS INT) AS n_tokens,
       round(ttr, 9) AS type_token_ratio,
       round(stop_ratio, 9) AS stopword_ratio,
       round(top_share, 9) AS top_token_share
FROM v
"""


def q_boilerplate_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate: per-doc share of distinct 3-gram
    shingles that appear in at least one other document."""
    return TX.boilerplate_share(load_table(spark, sf_dir, "documents"))


def o_boilerplate_share() -> str:
    return f"""
WITH {_SH_CTE},
inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
cnt AS (SELECT shingle, count(*)::BIGINT AS df_count FROM inv GROUP BY shingle)
SELECT doc_id, count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN df_count > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
       round(sum(CASE WHEN df_count > 1 THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 9) AS boilerplate_share
FROM inv JOIN cnt USING (shingle)
GROUP BY doc_id
"""


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote label prediction (k=25, int8 cosine,
    deterministic tie-breaks at neighbor selection and vote)."""
    return S.knn_classify(_emb(spark, sf_dir), FX.QUERY_VEC, k=25)


def o_knn_classify() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
WITH q AS (SELECT vec_id, label, {qv} AS qvec FROM embeddings),
scored AS (
  SELECT vec_id, label, {O.sql_cosine_int8_lit(FX.QUERY_VEC, 'qvec')} AS score
  FROM q
),
top AS (SELECT label, score FROM scored ORDER BY score DESC, vec_id ASC LIMIT 25)
SELECT label AS pred_label, count(*)::BIGINT AS votes,
       round(max(score), 9) AS best_score
FROM top GROUP BY label
ORDER BY votes DESC, pred_label ASC LIMIT 1
"""


# --------------------------------------------------------------------------
# relational analytics (SURVEY §2.12: full Spark SQL surface on metadata)
# --------------------------------------------------------------------------

from pythonvectordb_spark.operators import relational as RL  # noqa: E402


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary (exact integer-cents aggregation)."""
    return RL.pricing_summary(load_table(spark, sf_dir, "lineitem"))


def o_pricing_summary() -> str:
    return """
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS e100,
         CAST(round(l_discount * 100) AS BIGINT) AS d100,
         CAST(round(l_tax * 100) AS BIGINT) AS t100
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(qty) AS BIGINT) AS sum_qty,
       CAST(sum(e100) AS BIGINT) AS sum_base_cents,
       CAST(sum(e100 * (100 - d100)) AS BIGINT) AS sum_disc_e4,
       CAST(sum(e100 * (100 - d100) * (100 + t100)) AS BIGINT) AS sum_charge_e6,
       round(sum(qty)::DOUBLE / count(*)::DOUBLE, 6) AS avg_qty,
       round(sum(e100)::DOUBLE / 100.0 / count(*)::DOUBLE, 6) AS avg_price,
       round(sum(d100)::DOUBLE / 100.0 / count(*)::DOUBLE, 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM li GROUP BY l_returnflag, l_linestatus
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shape: top-10 open orders by revenue, BUILDING segment."""
    return RL.shipping_priority(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


def o_shipping_priority() -> str:
    return """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, l_orderkey ASC LIMIT 10
"""


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape: per-nation revenue in ASIA (5-table join chain)."""
    return RL.regional_revenue(
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


def o_regional_revenue() -> str:
    return """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
GROUP BY n_name
"""


def q_part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand part stats incl. conditional aggregation (CASE inside
    SUM) and string predicates."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.round(F.col("p_retailprice") * 100).cast("long")).cast("long").alias(
            "retail_cents"
        ),
        F.min("p_size").cast("int").alias("min_size"),
        F.max("p_size").cast("int").alias("max_size"),
        F.sum(F.when(F.col("p_type").contains("BRASS"), 1).otherwise(0))
        .cast("long")
        .alias("n_brass"),
    )


def o_part_brand_stats() -> str:
    return """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS retail_cents,
       CAST(min(p_size) AS INT) AS min_size,
       CAST(max(p_size) AS INT) AS max_size,
       CAST(sum(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END) AS BIGINT) AS n_brass
FROM part GROUP BY p_brand
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shape single-pass filtered aggregate."""
    return RL.forecast_revenue(load_table(spark, sf_dir, "lineitem"))


def o_forecast_revenue() -> str:
    return """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND CAST(round(l_quantity) AS BIGINT) < 24
"""


def q_customer_order_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: per-customer order sequence + running spend."""
    return RL.customer_order_running(load_table(spark, sf_dir, "orders"))


def o_customer_order_running() -> str:
    return """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS INT) AS order_seq,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS running_cents,
       CAST(lag(o_orderkey, 1) OVER w AS BIGINT) AS prev_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shape: revenue by supplier nation x customer nation x year."""
    return RL.bilateral_trade(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def o_bilateral_trade() -> str:
    return """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
GROUP BY 1, 2, 3
"""


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shape: customers histogrammed by order count (left outer
    join keeps zero-order customers)."""
    return RL.customer_distribution(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def o_customer_distribution() -> str:
    return """
WITH per_cust AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
"""


def q_brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shape: one brand's revenue share (conditional agg +
    deterministic division)."""
    return RL.brand_revenue_share(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_brand_revenue_share() -> str:
    return """
WITH agg AS (
  SELECT CAST(sum(CASE WHEN p_brand = 'Brand#1'
                       THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       ELSE 0 END) AS BIGINT) AS brand_revenue_e4,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_revenue_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT brand_revenue_e4, total_revenue_e4,
       round(100.0 * brand_revenue_e4::DOUBLE / total_revenue_e4::DOUBLE, 6) AS brand_share_pct
FROM agg
"""


def q_mktsegment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate: per-segment + grand total."""
    return RL.mktsegment_rollup(load_table(spark, sf_dir, "customer"))


def o_mktsegment_rollup() -> str:
    return """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer GROUP BY ROLLUP(c_mktsegment)
"""


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shape: EXISTS semi-join + grouped counts."""
    return RL.order_priority_counts(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def o_order_priority_counts() -> str:
    return """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q_events_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event rollup with JSON prop extraction."""
    return RL.events_by_hour(load_table(spark, sf_dir, "events"))


def o_events_by_hour() -> str:
    return """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_epoch,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
"""


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window aggregate (batch twin of the streaming
    windowed aggregation)."""
    return RL.events_tumbling(load_table(spark, sf_dir, "events"))


def o_events_tumbling() -> str:
    return """
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS ws_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1
"""


def q_nation_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension join + per-nation customer aggregates."""
    return RL.nation_customer_stats(
        load_table(spark, sf_dir, "nation"), load_table(spark, sf_dir, "customer")
    )


def o_nation_customer_stats() -> str:
    return """
WITH j AS (
  SELECT n_name, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS acctbal_cents,
       round(sum(cents)::DOUBLE / 100.0 / count(*)::DOUBLE, 6) AS avg_acctbal
FROM j GROUP BY n_name
"""


def q_approx_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KMV distinct-user sketch (GRADUATED round 7 from
    rows-only HLL to a hash-matched oracle, VERDICT r6 task 3): the
    k-min md5-prefix hashes are expression-reproducible, so the sketch
    internals — k-th hash boundary, estimate, relative error — ARE the
    checked values (`kmv_distinct_users` precedent). The engine HLL
    path stays covered by the `approx_distinct_error` guarantee twin
    (`operators/sketch.kmv_distinct_grouped`)."""
    from pythonvectordb_spark.operators.sketch import kmv_distinct_grouped

    return kmv_distinct_grouped(
        load_table(spark, sf_dir, "events"), "user_id", "event_type", k=64
    )


def o_approx_distinct_events() -> str:
    from pythonvectordb_spark.operators.sketch import KMV_SPACE

    return f"""
WITH h AS (SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
           FROM events),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
      FROM h),
kth AS (SELECT event_type, CAST(max(h) AS BIGINT) AS kth_hash,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM r WHERE rn <= 64 GROUP BY 1),
ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_exact
       FROM events GROUP BY 1)
SELECT event_type, CAST(64 AS INT) AS k, n_distinct_exact, kth_hash,
       round(CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                  ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END, 6)
         AS estimate,
       round(abs((CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                       ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END)
                 - n_distinct_exact::DOUBLE)
             / n_distinct_exact::DOUBLE, 6) AS rel_error
FROM ex JOIN kth USING (event_type)
"""


def q_approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch with its error bound asserted as data (new round 4 —
    the GK `approx_percentile_error` pattern applied to the last
    sketch family): per event type, within_bound = 1 iff
    approx_count_distinct(user_id, rsd=0.05) lands within 15% of the
    exact distinct count. Max observed error on the testdata is 6.7%
    (sf0.1), so the bound has >2x margin while still being ~3-sigma for
    HLL++ at rsd 0.05 — a sketch regression breaks the value hash. The
    raw estimate stays rows-only (`approx_distinct_events`): the VALUE
    is engine-specific, the GUARANTEE is not."""
    ev = load_table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", 0.05)
    return ev.groupBy("event_type").agg(
        exact.cast("long").alias("n_exact_users"),
        (F.abs(approx - exact) <= 0.15 * exact).cast("long").alias("within_bound"),
    )


def o_approx_distinct_error() -> str:
    return """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users,
       CAST(1 AS BIGINT) AS within_bound
FROM events GROUP BY 1
"""


def q_approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type bottom-k-by-hash sample percentiles (GRADUATED
    round 7 from rows-only GK to a hash-matched oracle, VERDICT r6
    task 3): a mergeable quantile sketch — keep the 256 rows with
    smallest md5(event_id) hash per group (per-shard bottom-ks union
    exactly like KMV), exact interpolated p50/p99 over the sample —
    whose internals are expression-reproducible, so the sketch itself
    hash-matches DuckDB. The engine GK path stays covered by the
    `approx_percentile_error` guarantee twin; the bounded-state vs
    exact-twin contrast (`value_percentiles`) is unchanged
    (`operators/sketch.bottomk_sample_percentiles`)."""
    from pythonvectordb_spark.operators.sketch import bottomk_sample_percentiles

    return bottomk_sample_percentiles(
        load_table(spark, sf_dir, "events"), "value", "event_id", "event_type"
    )


def o_approx_value_percentiles() -> str:
    return """
WITH r AS (SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT ASC,
                        event_id ASC) AS rn
           FROM events),
s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS sample_n,
             round(quantile_cont(value::DOUBLE, 0.5), 6) AS ap50,
             round(quantile_cont(value::DOUBLE, 0.99), 6) AS ap99
      FROM r WHERE rn <= 256 GROUP BY 1),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1)
SELECT event_type, n, sample_n, ap50, ap99 FROM n JOIN s USING (event_type)
"""


def q_approx_percentile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK sketch percentiles with the error bound asserted as data:
    ``within_bound`` = 1 iff approx_percentile(value, p, 10000) lands
    inside the EXACT interpolated [p-0.02, p+0.02] band, per event type
    and probe. The oracle emits the constant 1 (DuckDB cannot replay the
    sketch but CAN assert its guarantee) — so a sketch regression breaks
    the value hash. Graduates the `approx_value_percentiles` family from
    rows-only to hash-matched (the CMS-family pattern)."""
    from pythonvectordb_spark.operators.sketch import gk_error_bound

    ev = load_table(spark, sf_dir, "events")
    return gk_error_bound(ev, "value", "event_type")


def o_approx_percentile_error() -> str:
    return """
SELECT event_type,
       CAST(p.probe_bp AS BIGINT) AS probe_bp,
       CAST(count(*) AS BIGINT) AS n,
       CAST(1 AS BIGINT) AS within_bound
FROM events CROSS JOIN (VALUES (5000), (9900)) AS p(probe_bp)
GROUP BY 1, 2
"""


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event values per event_type
    (SURVEY §2.9 latency-percentile analogue, exact `percentile` not the
    approx sketch)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def o_value_percentiles() -> str:
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(value::DOUBLE, 0.25), 6) AS p25,
       round(quantile_cont(value::DOUBLE, 0.5), 6) AS p50,
       round(quantile_cont(value::DOUBLE, 0.95), 6) AS p95,
       min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY event_type
"""


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all grouping-set combinations."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    return (
        ev.withColumn("day_epoch", day)
        .cube("event_type", "day_epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
        )
    )


def o_events_cube() -> str:
    return """
SELECT event_type,
       CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY CUBE(event_type, CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT))
"""


def q_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra (SURVEY §2.7): customers with orders in BOTH halves of
    the date range (intersect) and customers with NO orders (except)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    early = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    late = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = early.intersect(late).withColumn("kind", F.lit("both_periods"))
    never = (
        cust.select("c_custkey")
        .exceptAll(orders.select(F.col("o_custkey").alias("c_custkey")).distinct())
        .withColumn("kind", F.lit("no_orders"))
    )
    return both.unionByName(never)


def o_customer_set_ops() -> str:
    return """
SELECT c_custkey, 'both_periods' AS kind FROM (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
)
UNION ALL
SELECT c_custkey, 'no_orders' AS kind FROM (
  SELECT c_custkey FROM customer
  EXCEPT ALL
  SELECT DISTINCT o_custkey FROM orders
)
"""


def q_udtf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, §2.11): explodes each document into
    per-token rows with positions — deterministic string ops, so even the
    UDTF path is oracle-checked."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string, token_len int")
    class TokenStats:
        def eval(self, doc_id, text):
            pos = 0
            for tok in text.split(" "):
                if tok:
                    yield doc_id, pos, tok, len(tok)
                    pos += 1

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("token_stats", TokenStats)
    return spark.sql(
        "SELECT t.* FROM _udtf_docs d, LATERAL token_stats(d.doc_id, d.text) t"
    )


def o_udtf_token_stats() -> str:
    return f"""
SELECT doc_id,
       CAST(u.pos AS INT) AS pos,
       u.token AS token,
       CAST(length(u.token) AS INT) AS token_len
FROM (
  SELECT doc_id,
         unnest(list_transform({O.sql_tokens('text')}, (x, i) -> {{'pos': i - 1, 'token': x}})) AS u
  FROM documents
)
"""


def q_label_qsum_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (§2.11): per-label exact integer sum
    of per-row qvec sums, computed in numpy over Arrow batches."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def qsum_agg(qsums: pd.Series) -> "int":
        return int(np.asarray(qsums, dtype=np.int64).sum())

    df = _emb(spark, sf_dir)
    per_row = F.aggregate(F.col("qvec"), F.lit(0).cast("long"), lambda a, x: a + x.cast("long"))
    return (
        df.select("label", per_row.alias("q_sum"))
        .groupBy("label")
        .agg(qsum_agg(F.col("q_sum")).alias("label_qsum"))
        .select(F.col("label").cast("int").alias("label"), "label_qsum")
    )


def o_label_qsum_grouped_agg() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
SELECT CAST(label AS INT) AS label,
       CAST(sum(list_aggregate(list_transform({qv}, x -> x::BIGINT), 'sum')) AS BIGINT) AS label_qsum
FROM embeddings GROUP BY label
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-label centroid fingerprint (exact
    integer reduction, engine-reproducible)."""
    return ST.label_centroids(_emb(spark, sf_dir))


def o_label_centroids() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
WITH q AS (SELECT label, {qv} AS qvec FROM embeddings)
SELECT CAST(label AS INT) AS label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(list_aggregate(list_transform(qvec, (x, i) -> x::BIGINT * i), 'sum')) AS BIGINT) AS centroid_checksum
FROM q GROUP BY label
"""


def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shape: orders whose total quantity exceeds a threshold
    (agg-then-join; the grouped HAVING side streams through a partial
    aggregate before the join, so the join input is already reduced)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
            F.col("sum_qty"),
        )
    )


def o_large_volume_orders() -> str:
    return """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
       CAST(sum_qty AS BIGINT) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 180) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_brand_size_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shape: disjunctive multi-attribute predicates across a
    broadcast part join (OR-of-ANDs; Catalyst pushes the common join key
    and evaluates the residual disjunction post-join)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.round("l_quantity").cast("long")
    joined = lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50) & qty.between(20, 30))
    )
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    return joined.filter(cond).agg(
        F.sum(e100 * (F.lit(100) - d100)).cast("long").alias("revenue_e4"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


def o_brand_size_revenue() -> str:
    return """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shape: revenue from lineitems below half their part's
    average quantity (per-group scalar subquery decorrelated into an
    agg-then-join; the per-part average is a reduced table, so the join
    shuffles only |parts| rows on the build side).

    Exact parity: l_quantity is integral-valued, so sum/count are exact
    integers and the avg division is bit-identical IEEE double division
    in both engines.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    qty = F.round("l_quantity").cast("long")
    pa = lineitem.groupBy("l_partkey").agg(
        (F.sum(qty).cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_qty")
    ).withColumnRenamed("l_partkey", "pa_partkey")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        lineitem.join(pa, lineitem.l_partkey == pa.pa_partkey)
        .filter(qty.cast("double") < 0.5 * F.col("avg_qty"))
        .agg(
            F.sum(e100).cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def o_small_quantity_revenue() -> str:
    return """
WITH pa AS (
  SELECT l_partkey AS pa_partkey,
         sum(CAST(round(l_quantity) AS BIGINT))::DOUBLE / count(*)::DOUBLE AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN pa ON l_partkey = pa_partkey
WHERE CAST(round(l_quantity) AS BIGINT)::DOUBLE < 0.5 * avg_qty
"""


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shape: above-average-balance customers with no orders,
    by nation (global scalar aggregate broadcast + anti-join).

    The average is computed over exact integer cents so the threshold is
    bit-identical in both engines.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cust = customer.withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    avgdf = cust.filter(F.col("bal_cents") > 0).agg(
        (F.sum("bal_cents").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_cents"
        )
    )
    return (
        cust.crossJoin(F.broadcast(avgdf))
        .filter(F.col("bal_cents").cast("double") > F.col("avg_cents"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("bal_cents").cast("long").alias("acctbal_cents"),
        )
    )


def o_idle_rich_customers() -> str:
    return """
WITH cust AS (
  SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(bal_cents) AS BIGINT) AS acctbal_cents
FROM cust c
WHERE bal_cents::DOUBLE > (SELECT sum(bal_cents)::DOUBLE / count(*)::DOUBLE
                           FROM cust WHERE bal_cents > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
"""


def q_top_brands_by_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shape: groups whose revenue exceeds the all-groups
    average share (grouped aggregate + 1-row global re-aggregate
    broadcast back as the threshold). The compare is all-integer
    (``rev * 25 > total``) so no float threshold parity is involved;
    the share itself is a single exact-integer division."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    # lazy checkpoint: br feeds both the 1-row total and the main side
    # of the crossJoin; without it the lineitem join+agg runs twice
    br = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(e100 * (F.lit(100) - d100)).cast("long").alias("revenue_e4"))
        .localCheckpoint(eager=False)
    )
    total = br.agg(F.sum("revenue_e4").cast("long").alias("_total"))
    return (
        br.crossJoin(F.broadcast(total))
        .filter(F.col("revenue_e4") * 25 > F.col("_total"))
        .select(
            "p_brand",
            "revenue_e4",
            F.round(
                F.col("revenue_e4").cast("double") / F.col("_total").cast("double"), 9
            ).alias("share"),
        )
    )


def o_top_brands_by_share() -> str:
    return """
WITH br AS (
  SELECT p_brand,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1
), tot AS (SELECT sum(revenue_e4)::BIGINT AS total FROM br)
SELECT p_brand, revenue_e4,
       round(revenue_e4::DOUBLE / total::DOUBLE, 9) AS share
FROM br CROSS JOIN tot WHERE revenue_e4 * 25 > total
"""


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shape: conditional-aggregate percentage (promo-type
    revenue share of one ship-year). One scan, broadcast part dim, two
    exact-integer sums; only the final percentage divides."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    rev = e100 * (F.lit(100) - d100)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0)))
            .cast("long")
            .alias("promo_revenue_e4"),
            F.sum(rev).cast("long").alias("total_revenue_e4"),
        )
        .select(
            "promo_revenue_e4",
            "total_revenue_e4",
            F.round(
                F.lit(100.0)
                * F.col("promo_revenue_e4").cast("double")
                / F.col("total_revenue_e4").cast("double"),
                9,
            ).alias("promo_share_pct"),
        )
    )


def o_promo_revenue_share() -> str:
    return """
WITH a AS (
  SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                       THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       ELSE 0 END) AS BIGINT) AS promo_revenue_e4,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_revenue_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
)
SELECT promo_revenue_e4, total_revenue_e4,
       round(100.0 * promo_revenue_e4::DOUBLE / total_revenue_e4::DOUBLE, 9) AS promo_share_pct
FROM a
"""


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shape: the supplier(s) whose quarter revenue equals the
    maximum (the decorrelated revenue view + equal-to-max scalar). The
    global max re-aggregates the already-reduced |suppliers| rows — not
    lineitem — and broadcasts back as a 1-row join, so no global sort or
    single-partition window exists at any corpus scale."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    sr = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(e100 * (F.lit(100) - d100)).cast("long").alias("revenue_e4"))
    )
    mx = sr.agg(F.max("revenue_e4").alias("_mx"))
    best = sr.crossJoin(F.broadcast(mx)).filter(
        F.col("revenue_e4") == F.col("_mx")
    )
    return (
        best.join(F.broadcast(supplier), best.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "revenue_e4",
        )
    )


def o_top_supplier_revenue() -> str:
    return """
WITH sr AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, revenue_e4
FROM sr JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue_e4 = (SELECT max(revenue_e4) FROM sr)
"""


def q_heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shape: suppliers who shipped more than a threshold
    quantity of some single part (nested grouped HAVING -> distinct
    supplier keys -> semi-join into the dimension). The heavy fact
    aggregation reduces before any join; supplier/nation broadcast."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    qty = F.round("l_quantity").cast("long")
    heavy = (
        lineitem.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(qty).cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > 80)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(heavy, supplier.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "n_name")
    )


def o_heavy_part_suppliers() -> str:
    return """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem GROUP BY l_suppkey, l_partkey
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 80
)
"""


def q_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shape: suppliers who were the ONLY late shipper on a
    multi-supplier order ("late" = shipped >60 days after the order
    date; the reference columns Q21 uses don't exist in this schema).
    The exists / not-exists pair decorrelates into two grouped
    aggregates over the same (order, supplier) reduction — the fact
    table shuffles once on l_orderkey, then once on the reduced keys."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    per_supp = (
        lineitem.join(orders.select("o_orderkey", "o_orderdate"),
                      lineitem.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("is_late").alias("n_late"),
    )
    waits = (
        per_supp.join(per_order, "l_orderkey")
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_suppliers") >= 2)
            & (F.col("n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
    return waits.join(
        F.broadcast(supplier), waits.l_suppkey == supplier.s_suppkey
    ).select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "numwait")


def o_sole_late_suppliers() -> str:
    return """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
per_order AS (
  SELECT l_orderkey, count(*) AS n_suppliers, sum(is_late) AS n_late
  FROM per_supp GROUP BY 1
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(count(*) AS BIGINT) AS numwait
FROM per_supp JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE is_late = 1 AND n_suppliers >= 2 AND n_late = 1
GROUP BY 1, 2
"""


def q_nation_profit_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shape: profit by supplier nation x ship year, where
    profit = discounted revenue minus a retail-price cost proxy (the
    schema has no partsupp supplycost). Exact integer e4 units
    throughout; part/nation broadcast, one fact shuffle on the grouped
    keys."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    retail100 = F.round(F.col("p_retailprice") * 100).cast("long")
    qty = F.round("l_quantity").cast("long")
    profit = e100 * (F.lit(100) - d100) - retail100 * qty * F.lit(10)
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("l_shipdate").cast("int").alias("o_year"))
        .agg(F.sum(profit).cast("long").alias("profit_e4"))
    )


def o_nation_profit_trend() -> str:
    return """
SELECT n_name, CAST(year(l_shipdate) AS INT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - CAST(round(p_retailprice * 100) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT) * 10) AS BIGINT) AS profit_e4
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def q_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows: ntile quartile + percent_rank of balance WITHIN
    each nation (partitioned windows — no global single-partition sort,
    which would be the 100 TB anti-pattern). Deterministic via the
    (bal_cents, c_custkey) composite order."""
    customer = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("bal_cents"), F.col("c_custkey"))
    return (
        customer.withColumn("bal_cents", cents)
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            F.col("bal_cents"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        )
    )


def o_customer_quartiles() -> str:
    return """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 9) AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY CAST(round(c_acctbal * 100) AS BIGINT), c_custkey)
"""


def q_embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension stats of the quantized vectors via posexplode +
    re-aggregate (the standard columnar transpose; partial aggregation
    runs map-side so the shuffle carries dim-many partial rows per task,
    not row-count-many)."""
    emb = _emb(spark, sf_dir)
    return (
        emb.select(F.posexplode("qvec").alias("pos", "q"))
        .select((F.col("pos") + 1).cast("int").alias("dim_idx"), "q")
        .groupBy("dim_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("q").cast("long")).cast("long").alias("sum_q"),
            F.sum(F.col("q").cast("long") * F.col("q").cast("long")).cast("long").alias(
                "sumsq_q"
            ),
            F.min(F.col("q").cast("int")).cast("int").alias("min_q"),
            F.max(F.col("q").cast("int")).cast("int").alias("max_q"),
        )
    )


def o_embedding_dimension_stats() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
WITH q AS (SELECT {qv} AS qvec FROM embeddings)
SELECT CAST(t.i AS INT) AS dim_idx,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(qvec[t.i]::BIGINT) AS BIGINT) AS sum_q,
       CAST(sum(qvec[t.i]::BIGINT * qvec[t.i]::BIGINT) AS BIGINT) AS sumsq_q,
       CAST(min(qvec[t.i]) AS INT) AS min_q,
       CAST(max(qvec[t.i]) AS INT) AS max_q
FROM q CROSS JOIN range(1, {DIM + 1}) t(i)
GROUP BY 1
"""


_PRIORITY_PIVOT = [
    ("1-URGENT", "p1_urgent"),
    ("2-HIGH", "p2_high"),
    ("3-MEDIUM", "p3_medium"),
    ("4-NOT SPECIFIED", "p4_notspec"),
    ("5-LOW", "p5_low"),
]


def q_orders_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts by year x priority as wide columns (explicit
    pivot values — no extra distinct-values job, required at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .pivot("o_orderpriority", [v for v, _ in _PRIORITY_PIVOT])
        .count()
    )
    return piv.select(
        "o_year",
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(a) for v, a in _PRIORITY_PIVOT],
    )


def o_orders_priority_pivot() -> str:
    cases = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE o_orderpriority = '{v}') AS BIGINT) AS {a}"
        for v, a in _PRIORITY_PIVOT
    )
    return f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       {cases}
FROM orders GROUP BY 1
"""


def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shape: one nation's share of regional revenue per year
    (two roles for the nation table, conditional aggregation, exact-
    integer share numerator/denominator with one final double division)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.alias("n1")  # customer nation -> region filter
    n2 = nation.alias("n2")  # supplier nation -> the "share" nation
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    vol = e100 * (F.lit(100) - d100)
    df = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    return (
        df.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("n2.n_name") == "CHINA", vol).otherwise(F.lit(0)))
            .cast("long")
            .alias("nation_vol_e4"),
            F.sum(vol).cast("long").alias("total_vol_e4"),
        )
        .select(
            "o_year",
            "nation_vol_e4",
            "total_vol_e4",
            F.round(
                F.col("nation_vol_e4").cast("double") / F.col("total_vol_e4").cast("double"),
                9,
            ).alias("mkt_share"),
        )
    )


def o_nation_market_share() -> str:
    return """
WITH flat AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS vol,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
)
SELECT CAST(o_year AS INT) AS o_year,
       CAST(sum(CASE WHEN supp_nation = 'CHINA' THEN vol ELSE 0 END) AS BIGINT) AS nation_vol_e4,
       CAST(sum(vol) AS BIGINT) AS total_vol_e4,
       round(sum(CASE WHEN supp_nation = 'CHINA' THEN vol ELSE 0 END)::DOUBLE
             / sum(vol)::DOUBLE, 9) AS mkt_share
FROM flat GROUP BY 1
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shape: top-20 customers by revenue lost to returns
    (fact-fact shuffle join + broadcast dims + TakeOrderedAndProject)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("c_name"),
            F.col("n_name"),
        )
        .agg(F.sum(e100 * (F.lit(100) - d100)).cast("long").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("c_custkey"))
        .limit(20)
    )


def o_returned_items() -> str:
    return """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_e4 DESC, c_custkey ASC LIMIT 20
"""


def q_customer_order_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions: first_value / nth_value / last_value with
    an explicit full frame per customer (frame semantics, not just
    ranking)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.first_value(F.col("o_orderkey")).over(w).cast("long").alias("first_order"),
        F.nth_value(F.col("o_orderkey"), 2).over(w).cast("long").alias("second_order"),
        F.last_value(F.col("o_orderkey")).over(w).cast("long").alias("last_order"),
    )


def o_customer_order_frame() -> str:
    return """
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(first_value(o_orderkey) OVER w AS BIGINT) AS first_order,
       CAST(nth_value(o_orderkey, 2) OVER w AS BIGINT) AS second_order,
       CAST(last_value(o_orderkey) OVER w AS BIGINT) AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: from_json with an explicit schema (not
    get_json_object string-plucking) -> struct field -> grouped exact
    aggregates. Schema-on-read stays JVM-side and vectorized."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("k").cast("long")).cast("long").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
            F.count(F.when(F.col("k").isNull(), 1)).cast("long").alias("n_null_k"),
        )
    )


def o_props_json_stats() -> str:
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
       CAST(count(*) FILTER (WHERE json_extract_string(props, '$.k') IS NULL) AS BIGINT) AS n_null_k
FROM events GROUP BY 1
"""


def q_top_dims_per_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order surface: per-row top-3 quantized components via
    sort_array + element_at (all codegen'd; no explode, no shuffle)."""
    emb = _emb(spark, sf_dir)
    s = F.sort_array(F.col("qvec"), asc=False)
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.element_at(s, 1).cast("int").alias("d1"),
        F.element_at(s, 2).cast("int").alias("d2"),
        F.element_at(s, 3).cast("int").alias("d3"),
    )


def o_top_dims_per_vector() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
WITH q AS (SELECT vec_id, list_sort({qv}, 'DESC') AS s FROM embeddings)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(s[1] AS INT) AS d1, CAST(s[2] AS INT) AS d2, CAST(s[3] AS INT) AS d3
FROM q
"""


def q_orders_priority_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide year x priority counts back to long form
    — wide-table normalization without touching Python (stack/unpivot is
    a zero-shuffle projection op)."""
    wide = q_orders_priority_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            "o_year",
            [a for _, a in _PRIORITY_PIVOT],
            "priority_slot",
            "n_orders",
        )
        .filter(F.col("n_orders") > 0)
        .select("o_year", "priority_slot", F.col("n_orders").cast("long").alias("n_orders"))
    )


def o_orders_priority_unpivot() -> str:
    cases = " ".join(
        f"WHEN '{v}' THEN '{a}'" for v, a in _PRIORITY_PIVOT
    )
    return f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CASE o_orderpriority {cases} END AS priority_slot,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1, 2
"""


def q_event_type_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (interpolated) of integer cents per event type — both
    engines average the two middle values in exact double arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.withColumn("cents", cents)
        .groupBy("event_type")
        .agg(
            F.median("cents").alias("median_cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


def o_event_type_medians() -> str:
    return """
SELECT event_type,
       median(CAST(round(value * 100) AS BIGINT)) AS median_cents,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""


def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values (bucket arithmetic stays in
    whole-stage codegen; one partial-agg shuffle)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("bucket", F.floor(F.col("value") / 50).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
        )
    )


def o_events_value_histogram() -> str:
    return """
SELECT CAST(floor(value / 50) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1
"""


# GPT-2-style pre-tokenizer classes (letters / digits / other-symbol runs);
# the alternation is RE2- and Java-regex compatible so both engines split
# identically.
_BPE_SPLIT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: regex pre-tokenization into letter/digit/
    symbol runs (the unit BPE merges start from), plus the letters-only
    subtoken count. Pure JVM-side regexp — no Python in the loop."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_SPLIT), F.lit(0))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("int").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct_bpe"),
        F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))).cast("int").alias(
            "n_word_tokens"
        ),
    )


def o_bpe_token_counts() -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(toks) AS INT) AS n_bpe_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct_bpe,
       CAST(len(list_filter(toks, t -> regexp_matches(t, '^[A-Za-z]+$'))) AS INT) AS n_word_tokens
FROM (SELECT doc_id, regexp_extract_all(text, '{_BPE_SPLIT}') AS toks FROM documents)
"""


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max aggregation: each user's most recent event in ONE grouped
    pass (max_by — no self-join, no window; the cheapest per-key
    latest-record pattern at scale). ts is unique per user, so the pick
    is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    return ev.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.max(us).cast("long").alias("last_ts_us"),
        F.max_by("event_type", us).alias("last_type"),
        F.max_by(F.round(F.col("value") * 100).cast("long"), us).alias("last_cents"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def o_latest_event_per_user() -> str:
    return """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us,
       arg_max(event_type, epoch_us(ts)) AS last_type,
       CAST(arg_max(CAST(round(value * 100) AS BIGINT), epoch_us(ts)) AS BIGINT) AS last_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash sampling: keep documents whose md5 starts with 0 or 1
    (a reproducible ~12.5% sample — the scale-safe alternative to
    rng-based sampling: stable across retries, engines, and partition
    layouts, so downstream pipelines are replayable)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("h", F.substring(F.md5(F.col("text").cast("binary")), 1, 1))
        .filter(F.col("h").isin("0", "1"))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("lang"),
            F.col("h").alias("hash_prefix"),
        )
    )


def o_deterministic_sample() -> str:
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       substr(md5(text), 1, 1) AS hash_prefix
FROM documents
WHERE substr(md5(text), 1, 1) IN ('0', '1')
"""


def q_adjacent_doc_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity between successive same-language docs
    (levenshtein over 32-char prefixes; the candidate pairing is a
    broadcast-free equi-join on (lang, rank+1) — linear pair count, the
    way edit-distance ops must be fed at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    # lazy checkpoint: the ranked frame feeds both join sides; without
    # it the window (and its sort) executes once per side
    ranked = docs.select(
        "lang",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.substring("text", 1, 32).alias("prefix"),
        F.row_number().over(w).alias("rk"),
    ).localCheckpoint(eager=False)
    a = ranked.select("lang", F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa"), "rk")
    b = ranked.select(
        "lang", F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb"),
        (F.col("rk") - 1).alias("rk"),
    )
    return (
        a.join(b, ["lang", "rk"])
        .select(
            "lang", "id_a", "id_b",
            F.levenshtein("pa", "pb").cast("int").alias("edit_dist"),
        )
    )


def o_adjacent_doc_similarity() -> str:
    return """
WITH ranked AS (
  SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, substr(text, 1, 32) AS prefix,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
  FROM documents
)
SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.prefix, b.prefix) AS INT) AS edit_dist
FROM ranked a JOIN ranked b ON a.lang = b.lang AND a.rk = b.rk - 1
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-sequence transition counts (lag window per user
    then one grouped count — the Markov-chain feed for behavioral
    models; one shuffle on user_id, one on the pair)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"))
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


def o_event_transitions() -> str:
    return """
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# time-series surface (operators Spark lacks as built-ins; DuckDB's native
# ASOF JOIN / RANGE frames are the independent oracle)
# --------------------------------------------------------------------------


def q_purchase_click_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: purchases x same-user clicks within a
    60-minute look-back. Batch twin of streaming/joins — the identical
    operator runs as a watermarked stream-stream join (test_stream_join
    pins their equality)."""
    from pythonvectordb_spark.streaming.joins import purchase_click_interval_join

    ev = load_table(spark, sf_dir, "events")
    return purchase_click_interval_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )


def o_purchase_click_interval_join() -> str:
    return """
SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_ts_us,
       CAST(c.event_id AS BIGINT) AS click_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us,
       CAST(round(p.value * 100) AS BIGINT) AS value_cents
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 60 MINUTE
"""


def q_asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time as-of join: every purchase attributed to the user's
    most recent click at-or-before it (union + running-last, ONE shuffle;
    see operators/timeseries.asof_join for the scale rationale)."""
    from pythonvectordb_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = TS.asof_join(
        purchases, clicks, key="user_id", payload_cols=["click_id", "ts"],
        tiebreak="click_id",
    )
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros("ts").cast("long").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.col("click_id_asof").cast("long").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("ts_asof")).cast("long").alias("lag_us"),
    )


def o_asof_purchase_attribution() -> str:
    return """
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
       CAST(round(p.value * 100) AS BIGINT) AS value_cents,
       CAST(c.event_id AS BIGINT) AS click_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) — lag + running
    conditional sum, one shuffle on user_id."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)


def o_sessionize_events() -> str:
    return """
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS us, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
), tagged AS (
  SELECT user_id, us, value,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_seq
  FROM seq
)
SELECT user_id, session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(us) AS BIGINT) AS start_us,
       CAST(max(us) AS BIGINT) AS end_us,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM tagged GROUP BY user_id, session_seq
"""


def q_moving_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 60-minute per-user stats via an event-time RANGE frame."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.moving_window_stats(load_table(spark, sf_dir, "events"), window_minutes=60)


def o_moving_window_stats() -> str:
    return """
SELECT CAST(event_id AS BIGINT) AS event_id,
       user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_trailing
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade: raw -> minute -> hour -> day, each
    coarser level folding the finer level's partials. The oracle computes
    every level straight from raw rows — matching proves the cascade is
    lossless."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.hypertable_rollup(load_table(spark, sf_dir, "events"))


def o_hypertable_rollup() -> str:
    lvl = """
SELECT '{name}' AS granularity,
       CAST(floor(epoch_us(ts) / {span}) * {span} AS BIGINT) AS bucket_us,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2, 3"""
    m = 60_000_000
    parts = [
        lvl.format(name="minute", span=60 * m),
        lvl.format(name="hour", span=3600 * m),
        lvl.format(name="day", span=86400 * m),
    ]
    return "\nUNION ALL\n".join(parts)


_CMS_PROBE_KEYS = list(range(20))


def q_cms_user_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch estimates vs true per-user event counts (md5-
    derived, ANSI-reproducible; est >= true by construction)."""
    from pythonvectordb_spark.operators.sketch import cms_estimate

    ev = load_table(spark, sf_dir, "events")
    return cms_estimate(ev, "user_id", _CMS_PROBE_KEYS)


def o_cms_user_estimates() -> str:
    from pythonvectordb_spark.operators.sketch import CMS_DEPTH, CMS_WIDTH

    keys = ", ".join(str(k) for k in _CMS_PROBE_KEYS)
    return f"""
WITH pairs AS (
  SELECT d.d AS depth,
         CAST(('0x' || substr(md5(d.d || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
              % {CMS_WIDTH} AS INT) AS bucket
  FROM events CROSS JOIN range(0, {CMS_DEPTH}) d(d)
), sketch AS (
  SELECT depth, bucket, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY 1, 2
), probes AS (
  SELECT k.k AS key, d.d AS depth,
         CAST(('0x' || substr(md5(d.d || ':' || CAST(k.k AS VARCHAR)), 1, 8))::BIGINT
              % {CMS_WIDTH} AS INT) AS bucket
  FROM (SELECT unnest([{keys}]) AS k) k CROSS JOIN range(0, {CMS_DEPTH}) d(d)
), est AS (
  SELECT p.key, CAST(min(coalesce(s.n, 0)) AS BIGINT) AS est_n
  FROM probes p LEFT JOIN sketch s USING (depth, bucket) GROUP BY 1
), tru AS (
  SELECT CAST(user_id AS BIGINT) AS key, CAST(count(*) AS BIGINT) AS true_n
  FROM events WHERE user_id IN ({keys}) GROUP BY 1
)
SELECT CAST(est.key AS BIGINT) AS key, est_n,
       CAST(coalesce(tru.true_n, 0) AS BIGINT) AS true_n
FROM est LEFT JOIN tru ON est.key = tru.key
"""


def q_event_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window outlier detection: flag events > 2 sigma from the
    user's trailing-30-day mean. The 2-sigma test is algebraically
    rearranged to pure BIGINT arithmetic — (n*x - sum)^2 > 4*(n*sumsq -
    sum^2) — so there is no floating point anywhere in the decision
    (data-quality filters must be exactly reproducible across engines
    and reruns)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_us"))
        .rangeBetween(-2_592_000_000_000, 0)  # 30-day trailing window
    )
    base = (
        ev.withColumn("_us", us)
        .withColumn("cents", cents)
        .withColumn("n_trail", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("s1", F.sum("cents").over(w).cast("long"))
        .withColumn("s2", F.sum(F.col("cents") * F.col("cents")).over(w).cast("long"))
    )
    dev = F.col("n_trail") * F.col("cents") - F.col("s1")
    var4 = F.lit(4) * (F.col("n_trail") * F.col("s2") - F.col("s1") * F.col("s1"))
    return (
        base.filter((F.col("n_trail") >= 5) & (dev * dev > var4))
        .select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.col("cents"),
            F.col("n_trail"),
            (dev * dev).cast("long").alias("dev_sq"),
            var4.cast("long").alias("var4"),
        )
    )


def o_event_outliers() -> str:
    return """
WITH base AS (
  SELECT event_id, user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(count(*) OVER w AS BIGINT) AS n_trail,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s1,
         CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       cents, n_trail,
       CAST((n_trail * cents - s1) * (n_trail * cents - s1) AS BIGINT) AS dev_sq,
       CAST(4 * (n_trail * s2 - s1 * s1) AS BIGINT) AS var4
FROM base
WHERE n_trail >= 5
  AND (n_trail * cents - s1) * (n_trail * cents - s1) > 4 * (n_trail * s2 - s1 * s1)
"""


def q_distinct_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact DISTINCT aggregates in one pass (compiles to
    Spark's Expand operator — each distinct set gets its own expansion
    row; one shuffle, no self-joins)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).cast("long").alias("n_users"),
        F.count_distinct(F.floor(F.col("value") / 50)).cast("long").alias("n_buckets"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def o_distinct_agg_stats() -> str:
    return """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT floor(value / 50)) AS BIGINT) AS n_buckets,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def q_user_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered sequence aggregation: each user's first 10 event types as
    a '>' path. The per-user list is capped BEFORE collecting — a
    row_number window keeps only each user's first 10 events, so the
    collect_list state is bounded at 10 structs per key regardless of
    how heavy a power user is (the window's partition sort spills; a
    whole-history collect_list accumulates on the heap). Deterministic
    because rows are ranked and the collected structs sorted on the
    unique event timestamp."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us")
    ranked = (
        ev.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.unix_micros("ts").alias("us"),
            "event_type",
        )
        .withColumn("rn", F.row_number().over(w))
    )
    seq = F.sort_array(
        F.collect_list(F.struct(F.col("us"), F.col("event_type")))
    )
    path = F.concat_ws(">", F.transform(seq, lambda s: s["event_type"]))
    paths = (
        ranked.filter(F.col("rn") <= 10)
        .groupBy("user_id")
        .agg(path.alias("path10"))
    )
    counts = ranked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    return paths.join(counts, "user_id")


def o_user_event_paths() -> str:
    return """
SELECT CAST(user_id AS BIGINT) AS user_id,
       array_to_string(list_slice(list(event_type ORDER BY epoch_us(ts)), 1, 10), '>') AS path10,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD built from the event log: per-user event_type runs as
    validity intervals (consecutive duplicates collapsed, open current
    row)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.scd2_from_events(load_table(spark, sf_dir, "events"))


def o_scd2_user_state() -> str:
    return """
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
  FROM events
), changed AS (
  SELECT user_id, event_type, us FROM seq
  WHERE prev IS NULL OR prev != event_type
)
SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(us AS BIGINT) AS valid_from_us,
       CAST(lead(us) OVER (PARTITION BY user_id ORDER BY us) AS BIGINT) AS valid_to_us
FROM changed
"""


def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than cube/rollup: exactly the
    requested aggregation levels) with grouping_id disambiguation."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(
        """
SELECT event_type,
       CAST(user_id % 10 AS BIGINT) AS user_mod,
       CAST(grouping_id() AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events_gs
GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
"""
    )


def o_events_grouping_sets() -> str:
    return """
SELECT event_type,
       CAST(user_id % 10 AS BIGINT) AS user_mod,
       CAST(grouping(event_type) * 2 + grouping(user_id % 10) AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
"""


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven heavy hitters: top-5 users by CMS count estimate."""
    from pythonvectordb_spark.operators.sketch import cms_heavy_hitters

    return cms_heavy_hitters(load_table(spark, sf_dir, "events"), "user_id", k=5)


def o_cms_heavy_hitters() -> str:
    from pythonvectordb_spark.operators.sketch import CMS_DEPTH, CMS_WIDTH

    return f"""
WITH pairs AS (
  SELECT d.d AS depth,
         CAST(('0x' || substr(md5(d.d || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
              % {CMS_WIDTH} AS INT) AS bucket
  FROM events CROSS JOIN range(0, {CMS_DEPTH}) d(d)
), sketch AS (
  SELECT depth, bucket, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY 1, 2
), probes AS (
  SELECT k.user_id AS key, d.d AS depth,
         CAST(('0x' || substr(md5(d.d || ':' || CAST(k.user_id AS VARCHAR)), 1, 8))::BIGINT
              % {CMS_WIDTH} AS INT) AS bucket
  FROM (SELECT DISTINCT user_id FROM events) k CROSS JOIN range(0, {CMS_DEPTH}) d(d)
)
SELECT CAST(p.key AS BIGINT) AS key,
       CAST(min(coalesce(s.n, 0)) AS BIGINT) AS est_n
FROM probes p LEFT JOIN sketch s USING (depth, bucket)
GROUP BY 1 ORDER BY est_n DESC, key ASC LIMIT 5
"""


def q_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join: orders ⋈ customer routed through the salting
    utility (hot keys spread over 8 salt partitions); the oracle is the
    plain join — identical results prove salting is semantics-free."""
    from pythonvectordb_spark.sources.bucketing import salted_join

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    joined = salted_join(orders, customer, key="o_custkey", salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias(
            "total_cents"
        ),
    )


def o_salted_segment_revenue() -> str:
    return """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# MLlib batch indexing (rows-only checks: MLlib hashing is not
# DuckDB-reproducible; tests/test_indexing.py measures recall vs exact)
# --------------------------------------------------------------------------


def q_mllib_word2vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib Word2Vec batch embedding training, graduated from
    rows-only to a guarantee oracle (round 5, the
    `approx_percentile_error` pattern): negative-sampling math stays
    engine-specific, but the model CONTRACT does not — the trained
    vocabulary is exactly the token set with corpus frequency >=
    minCount under the same tokenizer (DuckDB recomputes n_vocab
    independently; verified equal at both SFs), and the probe word's
    top-5 synonym list must be full-length, vocabulary-only,
    probe-free, and similarity-sorted. A vocab-selection or
    synonym-query regression breaks the value hash."""
    from pythonvectordb_spark.indexing import word2vec_guarantee

    return word2vec_guarantee(load_table(spark, sf_dir, "documents"))


def o_mllib_word2vec() -> str:
    # RegexTokenizer(pattern='[^a-z]+', toLowercase=True) replicated:
    # lowercase, split on non-letter runs, drop empties; vocab = tokens
    # with corpus count >= 5 (Word2Vec minCount)
    return """
SELECT CAST((SELECT count(*) FROM (
         SELECT tok FROM (
           SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                     x -> len(x) > 0)) AS tok
           FROM documents) u
         GROUP BY tok HAVING count(*) >= 5) v) AS BIGINT) AS n_vocab,
       CAST(5 AS BIGINT) AS n_neighbors,
       CAST(1 AS BIGINT) AS all_in_vocab,
       CAST(1 AS BIGINT) AS probe_excluded,
       CAST(1 AS BIGINT) AS sims_monotone
"""


def q_mllib_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans-codebook IVF search, graduated from rows-only to a
    guarantee oracle (round 5): the MLlib-trained index is exercised on
    two paths — (a) FULL probe (nprobe = n_clusters): every cluster is
    scanned, so a lossless partition assignment must reproduce the
    exact float-cosine top-10 bit-for-bit (DuckDB recomputes that
    top-10 directly — a dropped or double-assigned row breaks the
    hash); (b) PRUNED probe (nprobe=4 of 8): recall@10 vs the same
    exact top-10, emitted as within-bound data (>= 0.2; measured
    0.3/0.5 at sf0.001/sf0.01 — uniform-random embeddings are ANN's
    worst case, the clustered-corpus curve lives in bench.py). The
    trained codebook itself stays engine-specific; both guarantees are
    invariant to it."""
    from pythonvectordb_spark.indexing import train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, n_clusters=8)
    full = (
        S.ann_ivf_search(emb, FX.QUERY_VEC, cents, k=10, nprobe=8)
        .select("vec_id", F.round("score", 9).alias("score"))
        .localCheckpoint(eager=False)  # output AND recall reference
    )
    pruned = S.ann_ivf_search(emb, FX.QUERY_VEC, cents, k=10, nprobe=4)
    hits = (
        pruned.join(
            F.broadcast(full.select(F.col("vec_id").alias("eid"))),
            F.col("vec_id") == F.col("eid"),
            "left_semi",
        )
        .agg((F.count(F.lit(1)) >= F.lit(2)).cast("long").alias("pruned_recall_ok"))
        .withColumn("_one", F.lit(1))
    )
    return (
        full.withColumn("_one", F.lit(1))
        .join(F.broadcast(hits), "_one")
        .select("vec_id", "score", "pruned_recall_ok")
    )


def o_mllib_ivf_search() -> str:
    return f"""
SELECT vec_id,
       round({O.sql_cosine_float_lit(FX.QUERY_VEC, 'embedding')}, 9) AS score,
       CAST(1 AS BIGINT) AS pruned_recall_ok
FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 10
"""


def q_mllib_brp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH near-dup join, graduated from
    rows-only to a guarantee oracle (round 5): the candidate
    generator's pair recall against the EXACT int8-cosine pair set
    (>= 0.45 on the quantized storage representation both engines
    share) is asserted as data — (n_exact_pairs, recall_ok) with
    recall bound 0.66 (measured 0.83 at sf0.001, 1.0 at sf0.01 with 6
    hash tables; seeds fixed). DuckDB recomputes n_exact_pairs by
    brute force over the probe table, which is bounded BY CONTRACT —
    at 100 TB this audit runs on a sample and the production path is
    the generator alone (the bench's dedup_pair_recall section is the
    same audit at scale)."""
    from pythonvectordb_spark.indexing import brp_lsh_near_dup

    emb = load_table(spark, sf_dir, "embeddings")
    exact = (
        DD.embedding_near_dup(emb, 0.45, method="pandas")
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)  # totals agg AND semi-join probe
    )
    brp = brp_lsh_near_dup(emb, cosine_threshold=0.45, num_hash_tables=6).select(
        "id_a", "id_b"
    )
    n_exact = exact.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_pairs")
    ).withColumn("_one", F.lit(1))
    n_hit = (
        exact.join(brp, ["id_a", "id_b"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
        .withColumn("_one", F.lit(1))
    )
    return (
        n_exact.join(F.broadcast(n_hit), "_one")
        .select(
            "n_exact_pairs",
            (
                F.col("n_hit").cast("double")
                >= F.lit(0.66) * F.col("n_exact_pairs").cast("double")
            )
            .cast("long")
            .alias("recall_ok"),
        )
    )


def o_mllib_brp_neardup() -> str:
    # brute-force exact int8-cosine pairs at >= 0.45 (the pandas
    # verifier's semantics: exact integer dots/norms in float64)
    qv = O.sql_qvec("embedding")
    cos = (
        "CASE WHEN list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum') = 0"
        "       OR list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum') = 0"
        "  THEN 0.0"
        "  ELSE list_aggregate(list_transform(a.qv, (x, i) -> x::BIGINT * b.qv[i]::BIGINT), 'sum')::DOUBLE"
        "       / (sqrt(list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)"
        "          * sqrt(list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)) END"
    )
    return f"""
WITH q AS (SELECT vec_id, {qv} AS qv FROM embeddings)
SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
       CAST(1 AS BIGINT) AS recall_ok
FROM q a JOIN q b ON a.vec_id < b.vec_id
WHERE {cos} >= 0.45
"""


def q_mllib_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH text near-dup join, graduated from rows-only to
    a guarantee oracle (round 5): pair recall against the EXACT
    word-3-gram Jaccard >= 0.7 pair set (the oracled
    `dedup_ngram_jaccard` semantics, df-capped) asserted as data —
    (n_exact_pairs, recall_ok) with bound 0.9 (measured 1.0 at both
    SFs; 8 single-hash OR-tables give collision probability
    1-(1-j)^8 ≈ 0.99993 at j=0.7, so the bound has enormous margin).
    DuckDB recomputes n_exact_pairs with the inverted-index pair SQL."""
    from pythonvectordb_spark.indexing import minhash_lsh_text_pairs

    docs = load_table(spark, sf_dir, "documents")
    exact = (
        DD.ngram_jaccard_pairs(docs, threshold=0.7, max_df=NGRAM_MAX_DF)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)  # totals agg AND semi-join probe
    )
    mh = minhash_lsh_text_pairs(docs, jaccard_threshold=0.7).select("id_a", "id_b")
    n_exact = exact.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_pairs")
    ).withColumn("_one", F.lit(1))
    n_hit = (
        exact.join(mh, ["id_a", "id_b"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
        .withColumn("_one", F.lit(1))
    )
    return (
        n_exact.join(F.broadcast(n_hit), "_one")
        .select(
            "n_exact_pairs",
            (
                F.col("n_hit").cast("double")
                >= F.lit(0.9) * F.col("n_exact_pairs").cast("double")
            )
            .cast("long")
            .alias("recall_ok"),
        )
    )


def o_mllib_minhash_dedup() -> str:
    return f"""
WITH {_SH_CTE},
{_SH_KEPT_CTE},
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.shv, b.shv))::BIGINT AS n_common,
         len(a.sh)::BIGINT AS n_a, len(b.sh)::BIGINT AS n_b
  FROM shk a JOIN shk b ON a.doc_id < b.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
       CAST(1 AS BIGINT) AS recall_ok
FROM pairs WHERE {_JACCARD} >= 0.7
"""


# --------------------------------------------------------------------------
# registry assembly
# --------------------------------------------------------------------------

def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed: coarse-centroid pruning (nprobe=4 of 8), ADC
    ranking over one-byte codes, exact re-rank of the top-100 — the
    billion-scale ANN layout as one operator."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.ann_ivf_pq_search(
        emb, FX.QUERY_VEC, FX.CENTROIDS, FX.PQ_CODEBOOKS, k=10, nprobe=4, rerank=100
    )
    return out.select("vec_id", F.round("score", 9).alias("score"))


def q_ann_ivf_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ with BOTH quantizers KMeans-trained (coarse centroids and
    sub-codebooks frozen from `indexing.train_*` on sf0.1): the layout a
    production billion-scale index actually ships. nprobe=6 of 8, ADC
    over one-byte codes, exact re-rank of the top-100. nprobe=6 is the
    ≥0.8-recall point on THIS testdata (uniform-random vectors, ANN's
    worst case — round-3 A/B: nprobe 4 → 0.69, 6 → 0.88, 8 → 1.0); a
    real clustered corpus reaches the same recall at a far smaller probe
    fraction, which is the entire IVF bet."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.ann_ivf_pq_search(
        emb,
        FX.QUERY_VEC,
        FT.CENTROIDS_TRAINED,
        FT.PQ_CODEBOOKS_TRAINED,
        k=10,
        nprobe=6,
        rerank=100,
    )
    return out.select("vec_id", F.round("score", 9).alias("score"))


def o_ann_ivf_pq_trained() -> str:
    return _o_ann_ivf_pq(FT.CENTROIDS_TRAINED, FT.PQ_CODEBOOKS_TRAINED, nprobe=6)


def o_ann_ivf_pq() -> str:
    return _o_ann_ivf_pq(FX.CENTROIDS, FX.PQ_CODEBOOKS)


def _o_ann_ivf_pq(centroids, codebooks, nprobe: int = 4, k: int = 10) -> str:
    probe = S.ivf_probe(FX.QUERY_VEC, centroids, nprobe=nprobe)
    sims = ", ".join(O.sql_cosine_float_lit(c, "embedding") for c in centroids)
    probe_list = ", ".join(str(p) for p in probe)
    dists, codes = _pq_sql_codes(codebooks)
    dists = dists.replace("FROM embeddings", "FROM cand")
    tables = S.pq_adc_tables(FX.QUERY_VEC, codebooks)
    lookups = " + ".join(
        f"list_extract([{', '.join(f'{float(x)!r}::DOUBLE' for x in row)}], code[{s + 1}] + 1)"
        for s, row in enumerate(tables)
    )
    cos = O.sql_cosine_float_lit(FX.QUERY_VEC, "embedding")
    return f"""
WITH assigned AS (SELECT *, [{sims}] AS sims FROM embeddings),
cand AS (
  SELECT vec_id, embedding FROM assigned
  WHERE (list_position(sims, list_aggregate(sims, 'max')) - 1) IN ({probe_list})
),
d AS ({dists}), c AS ({codes}),
adc AS (SELECT vec_id, embedding, ({lookups}) AS adc_dist FROM c),
short AS (SELECT * FROM adc ORDER BY adc_dist ASC, vec_id ASC LIMIT 100)
SELECT vec_id, round({cos}, 9) AS score
FROM short ORDER BY score DESC, vec_id ASC LIMIT {k}
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shape near-dup pairs: nearest-centroid blocking (the
    IVF codebook doubles as the clustering) + exact int8 verify within
    clusters only."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = DD.semantic_dedup_pairs(emb, FX.CENTROIDS, threshold=0.4)
    return out.select(
        "id_a", "id_b", "cluster_id", F.round("cosine", 9).alias("cosine")
    )


def o_semantic_dedup() -> str:
    sims = ", ".join(O.sql_cosine_float_lit(c, "embedding") for c in FX.CENTROIDS)
    cos = (
        "CASE WHEN list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum') = 0"
        "       OR list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum') = 0"
        "  THEN 0.0"
        "  ELSE list_aggregate(list_transform(a.qv, (x, i) -> x::BIGINT * b.qv[i]::BIGINT), 'sum')::DOUBLE"
        "       / (sqrt(list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)"
        "          * sqrt(list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)) END"
    )
    return f"""
WITH q AS (
  SELECT vec_id, {O.sql_qvec('embedding')} AS qv,
         (list_position([{sims}], list_aggregate([{sims}], 'max')) - 1) AS cid
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(a.cid AS INT) AS cluster_id, round({cos}, 9) AS cosine
FROM q a JOIN q b ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE ({cos}) >= 0.4
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of the corpus into 256-token training
    sequences (distributed prefix sum, no single-partition window)."""
    return TX.pack_sequences(load_table(spark, sf_dir, "documents"), seq_len=256)


def o_pack_sequences() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, len({O.sql_tokens('text')}) AS n_tok FROM documents
),
c AS (
  SELECT doc_id, n_tok,
         CAST(sum(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM t WHERE n_tok > 0
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       CAST((cum - n_tok) // 256 AS BIGINT) AS seq_first,
       CAST((cum - 1) // 256 AS BIGINT) AS seq_last,
       ((cum - n_tok) // 256) <> ((cum - 1) // 256) AS spans_boundary
FROM c
"""


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER first view,
    then purchased AFTER first qualifying click. Per-stage min
    timestamps chained through user-keyed joins (bounded per-user state
    — skew-safe for power users), then a one-row count rollup."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    base = events.select("user_id", "event_type", us.alias("t"))
    # Per-user state is a single min per stage — NO collect_list: a
    # power user with millions of events would make the list aggregate's
    # per-key state unbounded (round-2 VERDICT item 7). Each stage's
    # ordering predicate ("after the previous stage's first event") is
    # applied by re-scanning that stage's events against the previous
    # stage's per-user min via a user-keyed join; every aggregation and
    # join shares the user_id partitioning.
    #
    # Single-reference chain (advisor union-recompute clean, no
    # checkpoints needed): users -> clicks via one join, then the
    # purchase stage and the stage rollup fold into ONE right join +
    # grouped aggregate — per-user purchase events fan in against the
    # (user, t_view, t_click) spine, and the qualifying-purchase min is
    # taken inside the same aggregation that carries the stage flags.
    users = base.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("t"))).alias("t_view")
    )
    clicks = (
        base.filter(F.col("event_type") == "click")
        .join(users.filter(F.col("t_view").isNotNull()), "user_id")
        .filter(F.col("t") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    spine = users.join(clicks, "user_id", "left")
    per_user = (
        base.filter(F.col("event_type") == "purchase")
        .join(spine, "user_id", "right")
        .groupBy("user_id")
        .agg(
            F.min("t_view").alias("t_view"),
            F.min("t_click").alias("t_click"),
            F.min(F.when(F.col("t") > F.col("t_click"), F.col("t"))).alias(
                "t_purchase"
            ),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("long")).cast("long").alias("stage_view"),
        F.sum(F.col("t_click").isNotNull().cast("long")).cast("long").alias("stage_click"),
        F.sum(F.col("t_purchase").isNotNull().cast("long")).cast("long").alias("stage_purchase"),
    )


def o_event_funnel() -> str:
    return """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         list(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS clicks,
         list(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS purchases
  FROM events GROUP BY 1
),
staged AS (
  SELECT user_id, t_view,
         list_min(list_filter(clicks, c -> c > t_view)) AS t_click,
         list_min(list_filter(purchases,
             p -> p > list_min(list_filter(clicks, c -> c > t_view)))) AS t_purchase
  FROM per_user
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_view,
       CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
       CAST(sum(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
FROM staged
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day; for each
    (cohort day, day offset) the count of cohort users active that day.
    The first-seen day is a per-user min (one shuffle); the matrix is a
    distinct-then-count over (cohort, offset) — the standard two-shuffle
    retention plan, no self-join of the event table."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = events.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    active = events.select("user_id", day.alias("active_day")).distinct()
    return (
        active.join(firsts, "user_id")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("active_day", "cohort_day").cast("int").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


def o_retention_cohorts() -> str:
    return """
WITH firsts AS (
  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
  FROM events GROUP BY 1
),
active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM events
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', cohort_day, active_day) AS INT) AS day_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
FROM active JOIN firsts USING (user_id)
GROUP BY 1, 2
"""


def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order perplexity proxy: avg/max conditional bigram
    surprisal -ln p(w2|w1) under the corpus's own bigram model."""
    return TX.bigram_surprisal(load_table(spark, sf_dir, "documents"))


def o_bigram_surprisal() -> str:
    return f"""
WITH tok AS (SELECT doc_id, {O.sql_tokens('text')} AS tk FROM documents),
big AS (
  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
  FROM tok, unnest(range(1, len(tk))) AS r(i)
),
c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM big GROUP BY 1)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       round(avg(ln(c1::DOUBLE / c2::DOUBLE)), 9) AS avg_surprisal,
       round(max(ln(c1::DOUBLE / c2::DOUBLE)), 9) AS max_surprisal
FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY doc_id
"""


def q_weighted_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, 5 docs per language,
    weight = document length — the Efraimidis-Spirakis one-pass scheme
    (key = ln(u)/w, keep the k largest keys per stratum), with u derived
    from md5(doc_id) so the draw is deterministic, replayable, and
    reproducible by the oracle. The per-stratum top-k is a partitioned
    rank window: one shuffle on the stratum key, no global sort, no
    driver-side randomness — the shape that lets a 100 TB mixing job
    re-draw the same sample on every retry."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**32 + 1))
    key = F.log(u) / F.col("n_chars").cast("double")
    w = Window.partitionBy("lang").orderBy(F.desc("skey"), F.asc("doc_id"))
    return (
        docs.select(
            F.col("doc_id"),
            F.col("lang"),
            F.col("n_chars").cast("long").alias("n_chars"),
            key.alias("skey"),
        )
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "lang", "n_chars", F.round("skey", 9).alias("skey"), "rk")
    )


def o_weighted_sample_per_lang() -> str:
    return f"""
WITH keyed AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1)::DOUBLE
            / {float(2**32 + 1)!r}) / n_chars::DOUBLE AS skey
  FROM documents
)
SELECT doc_id, lang, n_chars, round(skey, 9) AS skey, CAST(rk AS INT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY skey DESC, doc_id ASC) AS rk
  FROM keyed
) WHERE rk <= 5
"""


def q_top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise top-k: each user's 3 highest-value events. A
    partitioned rank window (never a global sort); deterministic through
    value ties via the (value, event_id) composite order. At scale this
    is the one-shuffle pattern for per-entity leaderboards."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("v_cents"), F.asc("event_id")
    )
    return (
        events.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            cents.alias("v_cents"),
        )
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
    )


def o_top_events_per_user() -> str:
    return """
WITH v AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS event_id,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events
)
SELECT user_id, event_id, v_cents, CAST(rk AS INT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY v_cents DESC, event_id ASC) AS rk
  FROM v
) WHERE rk <= 3
"""


BM25_QUERY = ("vector", "join", "scan")
BM25_K1 = 1.2
BM25_B = 0.75


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval against a literal term query — the lexical-ranking
    complement of the embedding knn surface. ONE corpus scan: per-doc
    term frequencies and length project in the same pass; the corpus
    constants (N, per-term document frequencies, average doc length)
    reduce to a single broadcast row via conditional aggregation; the
    score is then a pure projection and top-k is TakeOrderedAndProject.
    No shuffle of the corpus at any point."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens("text")
    def _tf(term: str):
        # NB: a two-arg lambda would be treated as (element, index) by
        # F.filter — bind the term via closure, keep the lambda unary
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"tf_{i}") for i, t in enumerate(BM25_QUERY)]
    base = docs.select(F.col("doc_id"), F.size(toks).alias("dl"), *tf_cols)
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).cast("double").alias(f"df_{i}")
            for i in range(len(BM25_QUERY))
        ],
    )
    score = None
    for i in range(len(BM25_QUERY)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf = F.col(f"tf_{i}").cast("double")
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / (F.col("sum_dl") / F.col("n_docs"))
        )
        term = idf * (tf * F.lit(BM25_K1 + 1.0)) / denom
        score = term if score is None else score + term
    return (
        base.crossJoin(F.broadcast(stats))
        .select(F.col("doc_id"), F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


def o_bm25_rank() -> str:
    tf_exprs = ", ".join(
        f"len(list_filter(tk, x -> x = '{t}')) AS tf_{i}" for i, t in enumerate(BM25_QUERY)
    )
    df_exprs = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(BM25_QUERY))
    )
    terms = " + ".join(
        f"(ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i}::DOUBLE * {BM25_K1 + 1.0!r}) /"
        f" (tf_{i}::DOUBLE + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * dl::DOUBLE / (sum_dl / n_docs))))"
        for i in range(len(BM25_QUERY))
    )
    return f"""
WITH base AS (
  SELECT doc_id, len(tk) AS dl, {tf_exprs}
  FROM (SELECT doc_id, {O.sql_tokens('text')} AS tk FROM documents)
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, CAST(sum(dl) AS DOUBLE) AS sum_dl,
         {df_exprs}
  FROM base
)
SELECT doc_id, round({terms}, 6) AS bm25
FROM base, stats
WHERE ({terms}) > 0
ORDER BY bm25 DESC, doc_id ASC LIMIT 20
"""


def q_value_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning of event values: 8 bins with equal
    row counts, per-bin min/max/count/sum. The complement of the
    fixed-width `events_value_histogram`: bin EDGES derive from the data.
    ntile over a (value, event_id) composite order — deterministic
    through duplicate values — partitioned windows are impossible here
    (global quantiles are global), but the window carries only two
    columns and at scale would run on a range-partitioned sort, the same
    plan Spark uses for any global ORDER BY."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.orderBy(F.col("v_cents"), F.col("event_id"))
    return (
        events.select(F.col("event_id"), cents.alias("v_cents"))
        .withColumn("bin", F.ntile(8).over(w).cast("int"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("v_cents").cast("long").alias("lo_cents"),
            F.max("v_cents").cast("long").alias("hi_cents"),
            F.sum("v_cents").cast("long").alias("sum_cents"),
        )
    )


def o_value_equidepth_bins() -> str:
    return """
WITH v AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS v_cents FROM events
),
b AS (
  SELECT v_cents, CAST(ntile(8) OVER (ORDER BY v_cents, event_id) AS INT) AS bin FROM v
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       CAST(min(v_cents) AS BIGINT) AS lo_cents,
       CAST(max(v_cents) AS BIGINT) AS hi_cents,
       CAST(sum(v_cents) AS BIGINT) AS sum_cents
FROM b GROUP BY 1
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-shape dedup: documents with doc_id % 11 == 0 arrive as the
    new batch; the rest are the existing corpus. Bucket-collision
    candidates + exact-Jaccard verify, batch-vs-corpus only."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    batch = docs.filter(F.col("doc_id") % 11 == 0)
    return DD.incremental_minhash_dedup(corpus, batch, threshold=0.8)


def o_incremental_dedup() -> str:
    from pythonvectordb_spark.functions.text import MINHASH_P, minhash_params

    params = minhash_params(12)
    sigs = ", ".join(
        f"min(({a}::BIGINT * h1 + {b}::BIGINT * h2) % {MINHASH_P}::BIGINT) AS h{i}"
        for i, (a, b) in enumerate(params)
    )

    def chain(tag: str, pred: str) -> str:
        bands = "\nUNION ALL\n".join(
            f"SELECT doc_id, {b} AS band, md5(h{b * 3}::VARCHAR || '|' || h{b * 3 + 1}::VARCHAR || '|' || h{b * 3 + 2}::VARCHAR) AS bkey FROM sig_{tag}"
            for b in range(4)
        )
        return f"""
t_{tag} AS (SELECT doc_id, {O.sql_tokens('text')} AS w FROM documents WHERE {pred}),
sh_{tag} AS (SELECT doc_id, {O.sql_shingles_of('w')} AS sh FROM t_{tag}),
inv_{tag} AS (SELECT doc_id, unnest(sh) AS shingle FROM sh_{tag}),
hashed_{tag} AS (SELECT doc_id,
                  ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h1,
                  ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS h2
           FROM inv_{tag}),
sig_{tag} AS (SELECT doc_id, {sigs} FROM hashed_{tag} GROUP BY doc_id),
banded_{tag} AS ({bands})"""

    return f"""
WITH {chain('c', 'doc_id % 11 <> 0')},
{chain('b', 'doc_id % 11 = 0')},
cand AS (
  SELECT DISTINCT x.doc_id AS batch_id, y.doc_id AS corpus_id
  FROM banded_b x JOIN banded_c y ON x.band = y.band AND x.bkey = y.bkey
),
ver AS (
  SELECT batch_id, corpus_id,
         len(list_intersect(a.sh, b.sh))::BIGINT AS n_common,
         len(a.sh)::BIGINT AS n_a, len(b.sh)::BIGINT AS n_b
  FROM cand JOIN sh_b a ON a.doc_id = batch_id JOIN sh_c b ON b.doc_id = corpus_id
)
SELECT batch_id, corpus_id, round({_JACCARD}, 9) AS jaccard
FROM ver WHERE {_JACCARD} >= 0.8
"""


def q_build_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-512 tokens by frequency, dense 1-based ids,
    deterministic (count DESC, token ASC) ranking."""
    return TX.build_vocab(load_table(spark, sf_dir, "documents"), vocab_size=512)


def o_build_vocab() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {O.sql_tokens('text')} AS tk FROM documents),
counts AS (
  SELECT t.t AS token, count(*) AS token_count
  FROM toks, unnest(tk) AS t(t) GROUP BY 1
),
top AS (
  SELECT token, token_count FROM counts
  ORDER BY token_count DESC, token ASC LIMIT 512
)
SELECT token, CAST(token_count AS BIGINT) AS token_count,
       CAST(row_number() OVER (ORDER BY token_count DESC, token ASC) AS INT) AS token_id
FROM top
"""


def q_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-apply: encode every document as an integer-id array via
    a broadcast one-row vocabulary map (single corpus scan, no token
    explode/join); OOV -> 0.

    The id array is projected to a '-'-joined string for the driver:
    its pandas canonicalizer cannot sort/hash array cells (the round-2
    pq_encode lesson — same fix, applied before the first driver row
    this time). The operator itself still returns the real array."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = TX.build_vocab(docs, vocab_size=512)
    enc = TX.encode_tokens(docs, vocab)
    return enc.select(
        "doc_id",
        F.concat_ws("-", F.col("token_ids").cast("array<string>")).alias("token_ids_str"),
        "n_tok",
        "n_oov",
    )


def o_encode_tokens() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {O.sql_tokens('text')} AS tk FROM documents),
counts AS (
  SELECT t.t AS token, count(*) AS token_count
  FROM toks, unnest(tk) AS t(t) GROUP BY 1
),
vocab AS (
  SELECT token, CAST(row_number() OVER (ORDER BY token_count DESC, token ASC) AS INT) AS token_id
  FROM (SELECT * FROM counts ORDER BY token_count DESC, token ASC LIMIT 512)
),
m AS (
  SELECT map(list(token ORDER BY token_id), list(token_id ORDER BY token_id)) AS mp
  FROM vocab
)
SELECT doc_id,
       array_to_string(list_transform(tk, t -> CAST(coalesce(mp[t][1], 0) AS INT)), '-')
         AS token_ids_str,
       CAST(len(tk) AS INT) AS n_tok,
       CAST(len(list_filter(list_transform(tk, t -> CAST(coalesce(mp[t][1], 0) AS INT)),
                x -> x = 0)) AS INT) AS n_oov
FROM toks, m
"""


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus card: doc/token/char totals, language breadth,
    exact-duplicate rate."""
    return TX.corpus_stats(load_table(spark, sf_dir, "documents"))


def o_corpus_stats() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, len({O.sql_tokens('text')}) AS n_tok, length(text) AS n_chars,
         lang, md5(text) AS h
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts,
       round(sum(n_tok)::DOUBLE / count(*)::DOUBLE, 6) AS avg_doc_tokens
FROM t
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shape: cheapest EUROPE supplier per STANDARD size-15
    part. The reference Q2's correlated MIN subquery over partsupp
    decorrelates into a partitioned window rank; this schema has no
    partsupp, so the per-(part, supplier) offer price is the MIN
    lineitem extendedprice in exact integer cents. Scale shape: the
    fact table reduces to (part, supplier) BEFORE any dimension join
    (one shuffle on the composite key), then part/supplier/nation/
    region broadcast; the window partitions on p_partkey — never a
    global sort. Deterministic rank tiebreak on s_suppkey."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    offers = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(e100).alias("offer_e100")
    )
    eur_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    target_parts = part.filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_brand")
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("offer_e100").asc(), F.col("s_suppkey").asc()
    )
    return (
        offers.join(F.broadcast(target_parts), offers.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eur_supp), offers.l_suppkey == F.col("s_suppkey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_brand",
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("s_bal_cents"),
            "n_name",
            F.col("offer_e100").cast("long").alias("offer_e100"),
        )
    )


def o_min_cost_supplier() -> str:
    return """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS offer_e100
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name, offer_e100,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY offer_e100 ASC, s_suppkey ASC) AS rk
  FROM offers
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'STANDARD'
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand,
       CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(round(s_acctbal * 100) AS BIGINT) AS s_bal_cents, n_name,
       CAST(offer_e100 AS BIGINT) AS offer_e100
FROM ranked WHERE rk = 1
"""


def q_lateship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shape: for lines shipped late (>60 days after the
    order date — the schema has no commitdate/receiptdate/shipmode, so
    l_linestatus stands in for the ship-mode axis), count high-priority
    vs low-priority orders per status. One broadcast-joined projection
    of orders (two columns) against the fact table, then a two-value
    conditional aggregate — a single shuffle on the tiny group key."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ods = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        lineitem.join(ods, lineitem.l_orderkey == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).cast("long").alias("high_line_count"),
            F.sum(F.lit(1) - high).cast("long").alias("low_line_count"),
        )
    )


def o_lateship_priority_counts() -> str:
    return """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1
"""


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shape: distinct-supplier counts per (brand, size)
    part group, excluding one brand and excluding "complaint"
    suppliers (no comment column — negative account balance is the
    stand-in, expressed as the same NOT-IN anti-join shape Q16 uses).
    Scale shape: the (part, supplier) bridge is deduplicated BEFORE
    the dimension join (map-side combine on the composite key); part
    and the tiny exclusion set broadcast; count_distinct shuffles once
    on the small (brand, size) key space."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    bridge = lineitem.select("l_partkey", "l_suppkey").distinct()
    complaints = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(F.col("p_brand") != "Brand#45").select(
        "p_partkey", "p_brand", "p_size"
    )
    return (
        bridge.join(F.broadcast(parts), bridge.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(complaints),
            bridge.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def o_supplier_part_counts() -> str:
    return """
SELECT p_brand, CAST(p_size AS INT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


def q_event_value_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: per event type, the linear
    relationship between event value and hour-of-day — corr,
    regr_slope/intercept/r2, stddev_samp, var_pop. All six are
    single-pass partial-aggregable moments (sum, sum², cross-sum), so
    the plan is one map-side-combined shuffle on the 5-value key; no
    window, no second scan. Doubles rounded to 6 places on both sides
    (both engines compute the same moment formulas; bounded magnitudes
    keep float noise far below the rounding grain)."""
    events = load_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    y = F.col("value")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.corr(y, x), 6).alias("corr_vh"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.stddev_samp(y), 6).alias("stddev_v"),
            F.round(F.var_pop(y), 6).alias("varp_v"),
        )
    )


def o_event_value_regression() -> str:
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(corr(value, CAST(hour(ts) AS DOUBLE)), 6) AS corr_vh,
       round(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 6) AS slope,
       round(regr_intercept(value, CAST(hour(ts) AS DOUBLE)), 6) AS intercept,
       round(regr_r2(value, CAST(hour(ts) AS DOUBLE)), 6) AS r2,
       round(stddev_samp(value), 6) AS stddev_v,
       round(var_pop(value), 6) AS varp_v
FROM events GROUP BY 1
"""


def q_matview_user_spend_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the incrementally-maintained user-spend matview
    (streaming/matview.py): the events table is split into 4
    deterministic micro-batches (event_id mod 4) and folded through the
    EXACT merge function `start_user_spend_matview` runs per batch. The
    oracle is the one-shot GROUP BY — green means the incremental fold
    equals the full recompute (the matview's core correctness claim),
    witnessed by the driver instead of pytest alone."""
    from pythonvectordb_spark.streaming.matview import merge_user_spend

    ev = load_table(spark, sf_dir, "events")
    view: DataFrame | None = None
    for b in range(4):
        view = merge_user_spend(view, ev.filter(F.pmod(F.col("event_id"), F.lit(4)) == b))
    return view


def o_matview_user_spend_twin() -> str:
    return """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
"""


def q_dedup_gate_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming near-dup ingest gate
    (streaming/curation.py `start_dedup_gate`): corpus = docs with
    doc_id%7 <= 4; two arriving micro-batches (doc_id%7 == 5, then 6)
    fold through the EXACT per-batch gate function. Output is the final
    corpus membership tagged by admission stage (0 = initial corpus,
    1/2 = survived batch 1/2) — batch-2 survivors prove the gate checks
    against the GROWN corpus (corpus + batch-1 survivors), i.e. the
    sequential semantics, not just one-shot dedup."""
    from pythonvectordb_spark.operators.dedup import minhash_side
    from pythonvectordb_spark.streaming.curation import gate_batch

    docs = load_table(spark, sf_dir, "documents")
    corpus0 = docs.filter(F.col("doc_id") % 7 <= 4)
    b1 = docs.filter(F.col("doc_id") % 7 == 5)
    b2 = docs.filter(F.col("doc_id") % 7 == 6)
    # the streaming gate MATERIALIZES each batch's survivors (parquet
    # append in foreachBatch) before the next batch gates against them;
    # the lazy twin must mirror that or s1's whole dedup DAG re-executes
    # inside corpus1's banding AND the final union. localCheckpoint =
    # the in-session analogue of the gate's append: computed once,
    # lineage truncated. The corpus's MinHash side table is likewise
    # maintained INCREMENTALLY (side of corpus1 = stored side of
    # corpus0 + the admitted survivors' own side rows) — the corpus is
    # signed once, not once per batch; 20.2 s -> ~7 s at sf0.1.
    ckpt = lambda df: df.localCheckpoint(eager=False)  # noqa: E731
    sh0, banded0 = map(ckpt, minhash_side(corpus0))
    s1 = ckpt(gate_batch(corpus0, b1, threshold=0.8, corpus_side=(sh0, banded0)))
    corpus1 = corpus0.unionByName(s1)
    sh_s1, banded_s1 = minhash_side(s1)
    side1 = (sh0.unionByName(sh_s1), banded0.unionByName(banded_s1))
    s2 = gate_batch(corpus1, b2, threshold=0.8, corpus_side=side1)
    stage = lambda df, s: df.select(  # noqa: E731
        "doc_id", F.lit(s).cast("int").alias("stage")
    )
    return stage(corpus0, 0).unionByName(stage(s1, 1)).unionByName(stage(s2, 2))


def o_dedup_gate_twin() -> str:
    """Mirrors the gate fold: band the whole table once with the same
    12-hash / 4-band x 3 MinHash family, dup(a,b) iff band collision AND
    exact Jaccard >= 0.8, then stage the survivor sets sequentially."""
    from pythonvectordb_spark.functions.text import MINHASH_P, minhash_params

    params = minhash_params(12)
    sigs = ", ".join(
        f"min(({a}::BIGINT * h1 + {b}::BIGINT * h2) % {MINHASH_P}::BIGINT) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, md5(h{b * 3}::VARCHAR || '|' || h{b * 3 + 1}::VARCHAR || '|' || h{b * 3 + 2}::VARCHAR) AS bkey FROM sig"
        for b in range(4)
    )
    return f"""
WITH t AS (SELECT doc_id, {O.sql_tokens('text')} AS w FROM documents),
sh AS (SELECT doc_id, {O.sql_shingles_of('w')} AS sh FROM t),
inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
hashed AS (SELECT doc_id,
                  ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h1,
                  ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS h2
           FROM inv),
sig AS (SELECT doc_id, {sigs} FROM hashed GROUP BY doc_id),
banded AS ({bands}),
pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y ON x.band = y.band AND x.bkey = y.bkey
  WHERE x.doc_id <> y.doc_id
),
ver AS (
  SELECT a, b,
         len(list_intersect(pa.sh, pb.sh))::BIGINT AS n_common,
         len(pa.sh)::BIGINT AS n_a, len(pb.sh)::BIGINT AS n_b
  FROM pairs JOIN sh pa ON pa.doc_id = a JOIN sh pb ON pb.doc_id = b
),
dup AS (SELECT a, b FROM ver WHERE {_JACCARD} >= 0.8),
s1 AS (
  SELECT doc_id FROM documents WHERE doc_id % 7 = 5
  AND doc_id NOT IN (SELECT a FROM dup WHERE b % 7 <= 4)
),
s2 AS (
  SELECT doc_id FROM documents WHERE doc_id % 7 = 6
  AND doc_id NOT IN (
    SELECT a FROM dup WHERE b % 7 <= 4 OR b IN (SELECT doc_id FROM s1)
  )
)
SELECT doc_id, CAST(0 AS INT) AS stage FROM documents WHERE doc_id % 7 <= 4
UNION ALL SELECT doc_id, CAST(1 AS INT) AS stage FROM s1
UNION ALL SELECT doc_id, CAST(2 AS INT) AS stage FROM s2
"""


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


def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-20 and int8-cosine knn top-20
    fused by Reciprocal Rank Fusion (operators/search.py `rrf_fuse`) —
    the production hybrid-search combiner (no score calibration needed
    across retrievers). Documents pair with embeddings by doc_id ==
    vec_id (the corpus's multimodal keying). Both inputs are shortlists,
    so fusion cost is independent of corpus size; the knn shortlist cut
    AND the ranks are computed on the ROUNDED scores with id tie-breaks
    so both the shortlist boundary and the rank order are
    engine-portable."""
    bm25 = q_bm25_rank(spark, sf_dir)  # (doc_id, bm25) top-20
    knn = S.knn_search(_emb(spark, sf_dir), FX.QUERY_VEC, k=20, round_to=9).select(
        F.col("vec_id").alias("doc_id"), F.col("score")
    )
    return S.rrf_fuse(bm25, knn, "doc_id", "bm25", "score", k=10)


def o_hybrid_rrf_search() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
WITH bm AS ({o_bm25_rank()}),
knn AS (
  SELECT vec_id AS doc_id, round({O.sql_cosine_int8_lit(FX.QUERY_VEC, 'qvec')}, 9) AS score
  FROM (SELECT vec_id, {qv} AS qvec FROM embeddings) q
  ORDER BY score DESC, doc_id ASC LIMIT 20
),
ra AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INT) AS rank_a FROM bm),
rb AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank_b FROM knn)
SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
       round(coalesce(1.0 / (60 + rank_a), 0.0) + coalesce(1.0 / (60 + rank_b), 0.0), 9)
         AS rrf_score,
       rank_a, rank_b
FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
"""


def q_training_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export manifest: the corpus hash-assigned to 8 shards
    (md5(doc_id) mod 8 — `operators/export.py`), with per-shard doc and
    token counts plus the first/last within-shard order keys. The stats
    twin of `write_training_shards`; assignment is a pure projection, the
    manifest is one small-key aggregation."""
    from pythonvectordb_spark.operators import export as EX

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(_tokens("text")).cast("long")
    )
    return EX.shard_stats(docs, 8, token_col="n_tok")


def o_training_shard_stats() -> str:
    h = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8)"
    return f"""
SELECT CAST({h} AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(list_filter(string_split(text, ' '), t -> t != ''))) AS BIGINT)
         AS n_tokens,
       min(md5(CAST(doc_id AS VARCHAR))) AS first_key,
       max(md5(CAST(doc_id AS VARCHAR))) AS last_key
FROM documents GROUP BY 1
"""


def q_source_token_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budget (`curation.cap_per_source`): within each
    source, documents admit in content-hash order until the source's
    running token total reaches 700 — the RefinedWeb-style anti-dominance
    cap that stops any one crawl from owning the mixture. Deterministic
    and layout-independent (md5 order, not arrival order)."""
    docs = load_table(spark, sf_dir, "documents")
    return CU.cap_per_source(docs, 700)


def o_source_token_caps() -> str:
    return """
WITH d AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
r AS (
  SELECT doc_id, source, n_tok,
         CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tok
  FROM d
)
SELECT doc_id, source, n_tok, cum_tok FROM r WHERE cum_tok <= 700
"""


def q_event_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic over events.user_id
    (`sketch.key_skew_report`): one row with key counts, hottest-key
    share, per-key-count percentiles, and skew_factor = max/mean — the
    pre-flight check that decides plain shuffle vs AQE skew-split vs
    salting before a 100 TB join commits to a key."""
    from pythonvectordb_spark.operators import sketch as SK

    events = load_table(spark, sf_dir, "events")
    return SK.key_skew_report(events, "user_id")


def o_event_key_skew() -> str:
    return """
WITH counts AS (
  SELECT CAST(user_id AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
)
SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(cnt) AS BIGINT) AS max_cnt,
       (SELECT k FROM counts ORDER BY cnt DESC, k DESC LIMIT 1) AS top_key,
       round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 9) AS top_share,
       round(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
       round(quantile_cont(cnt, 0.9), 6) AS p90_cnt,
       round(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
       round(CAST(max(cnt) AS DOUBLE) / avg(cnt), 6) AS skew_factor
FROM counts
"""


def q_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-to-nation trade graph (supplier nation →
    customer nation, edge weight = exact integer revenue cents·e2):
    10 fixed power iterations, damping 0.85, dangling-mass
    redistribution (`operators/graph.py`). The second iterative family
    next to connected components — deterministic because the iteration
    count is fixed, so DuckDB replays the identical rounds unrolled.
    Ranks rounded to 6 (both engines sum the same ≤25 doubles)."""
    from pythonvectordb_spark.operators.graph import pagerank

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    ).cast("long")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    edges = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), customer.c_nationkey == F.col("c_nk"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(rev).cast("long").alias("w"))
    )
    pr = pagerank(edges, "supp_nation", "cust_nation", weight_col="w")
    return pr.select(
        F.col("node").alias("nation"), F.round("rank", 6).alias("rank")
    )


def o_trade_pagerank(iterations: int = 10, damping: float = 0.85) -> str:
    steps = []
    for i in range(1, iterations + 1):
        p = f"pr{i - 1}"
        # MATERIALIZED is load-bearing: pr{{i}} references pr{{i-1}}
        # twice (dangling mass + contributions); inlined CTEs would
        # expand the chain 2^iterations times
        steps.append(
            f"""d{i} AS MATERIALIZED (
  SELECT coalesce(sum(rank), 0.0) AS dmass FROM {p}
  WHERE node NOT IN (SELECT src FROM outw)
),
c{i} AS MATERIALIZED (
  SELECT t.dst AS node, sum(t.p * pp.rank) AS in_rank
  FROM trans t JOIN {p} pp ON t.src = pp.node GROUP BY 1
),
pr{i} AS MATERIALIZED (
  SELECT nd.node,
         (1.0 - {damping!r}) / n.nn
           + {damping!r} * (coalesce(c.in_rank, 0.0) + d.dmass / n.nn) AS rank
  FROM nodes nd CROSS JOIN n CROSS JOIN d{i} d LEFT JOIN c{i} c ON c.node = nd.node
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH agg AS MATERIALIZED (
  SELECT n1.n_name AS src, n2.n_name AS dst,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  GROUP BY 1, 2
),
outw AS MATERIALIZED (SELECT src, sum(w) AS out_w FROM agg GROUP BY 1),
trans AS MATERIALIZED (SELECT agg.src, agg.dst, agg.w / outw.out_w AS p FROM agg JOIN outw USING (src)),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM agg UNION ALL SELECT dst FROM agg)),
n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
pr0 AS MATERIALIZED (SELECT node, 1.0 / n.nn AS rank FROM nodes CROSS JOIN n),
{chain}
SELECT node AS nation, round(rank, 6) AS rank FROM pr{iterations}
"""


def q_fuzzy_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching as a join predicate: pairs of distinct
    source names within Levenshtein distance 2 — the entity-resolution
    shape (near-identical feed/crawl names) on the engine's native edit
    distance. The self-join runs on the DISTINCT key set (tiny relative
    to the corpus — the standard fuzzy-join reduction: dedupe to the key
    directory first, then pay O(|keys|^2) where |keys| << |rows|)."""
    docs = load_table(spark, sf_dir, "documents")
    # lazy checkpoint: the distinct key directory feeds both self-join
    # sides; without it the distinct aggregate runs once per side
    src = docs.select("source").distinct().localCheckpoint(eager=False)
    a = src.select(F.col("source").alias("src_a"))
    b = src.select(F.col("source").alias("src_b"))
    return (
        a.join(b, F.col("src_a") < F.col("src_b"))
        .withColumn("dist", F.levenshtein("src_a", "src_b").cast("int"))
        .filter(F.col("dist") <= 2)
    )


def o_fuzzy_source_pairs() -> str:
    return """
WITH s AS (SELECT DISTINCT source FROM documents)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(levenshtein(a.source, b.source) AS INT) AS dist
FROM s a JOIN s b ON a.source < b.source
WHERE levenshtein(a.source, b.source) <= 2
"""


def q_event_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per event type: median and MAD (median absolute
    deviation) of the value column — the outlier-resistant complement of
    `event_outliers`' mean/stddev fences. Two passes by construction
    (MAD needs the median first): pass 1 reduces to one 5-row median
    table (map-side combined percentile), pass 2 broadcasts it back and
    reduces the absolute deviations — the event table is scanned twice
    but shuffled never (both aggregations carry partial percentile state
    keyed by the 5-value type)."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad"),
        )
    )


def o_event_value_mad() -> str:
    return """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(any_value(med), 6) AS median_value,
       round(quantile_cont(abs(value - med), 0.5), 6) AS mad
FROM events e JOIN med USING (event_type)
GROUP BY 1
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


def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixture (new round 4, the GPT-3/Pile
    data-mixing rule): per-source sampling weights n_i^0.5 / S with
    hash-threshold admission at rate min(1, T*n_i^-0.5/S) — re-balances
    toward small sources without upsampling
    (`operators/curation.temperature_mixture`). alpha=0.5 keeps every
    float an IEEE-exact sqrt and S a sorted left-assoc fold, so the
    admit boundary is bit-identical across engines."""
    return CU.temperature_mixture(load_table(spark, sf_dir, "documents"), alpha=0.5)


def o_source_mixture() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len({O.sql_tokens('text')}) AS BIGINT) AS n_tok,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
),
s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM d GROUP BY 1
),
-- S: left-assoc fold over per-source sqrt terms in source order
-- (list_aggregate('sum') == Spark's sequential F.aggregate fold)
tot AS (
  SELECT list_aggregate(list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY source),
                        'sum') AS S,
         CAST(sum(n_tokens) AS BIGINT) AS T
  FROM s
),
r AS (
  SELECT source, n_docs, n_tokens,
         sqrt(CAST(n_tokens AS DOUBLE)) / S AS weight,
         least(1.0, CAST(T AS DOUBLE) * sqrt(CAST(n_tokens AS DOUBLE))
                      / (CAST(n_tokens AS DOUBLE) * S)) AS admit_rate
  FROM s CROSS JOIN tot
),
adm AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS admitted_docs,
         CAST(sum(d.n_tok) AS BIGINT) AS admitted_tokens
  FROM d JOIN r USING (source) WHERE d.u < r.admit_rate GROUP BY 1
)
SELECT r.source, r.n_docs, r.n_tokens,
       round(r.weight, 9) AS weight,
       round(r.admit_rate, 9) AS admit_rate,
       coalesce(adm.admitted_docs, 0) AS admitted_docs,
       coalesce(adm.admitted_tokens, 0) AS admitted_tokens
FROM r LEFT JOIN adm USING (source)
"""


def q_interleave_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixing audit of the deterministic export shuffle (new round 4):
    the md5 hash space sliced into 16 equal order-preserving ranges
    (each block = a contiguous run of `write_training_shards`'s
    shard-key order); per block, doc/token counts, distinct sources,
    and the largest single source's share — the pre-training check that
    a sequential reader's window sees the corpus mixture, not one crawl
    (`operators/export.interleave_audit`)."""
    from pythonvectordb_spark.operators import export as EX

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(_tokens("text")).cast("long")
    )
    return EX.interleave_audit(docs, 16, token_col="n_tok")


def o_interleave_audit(n_blocks: int = 16) -> str:
    return f"""
WITH d AS (
  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h32,
         source,
         CAST(len({O.sql_tokens('text')}) AS BIGINT) AS n_tok
  FROM documents
),
b AS (SELECT CAST((h32 * {n_blocks}) >> 32 AS INT) AS block, source, n_tok FROM d),
bs AS (
  SELECT block, source, CAST(count(*) AS BIGINT) AS n_bs,
         CAST(sum(n_tok) AS BIGINT) AS t_bs
  FROM b GROUP BY 1, 2
)
SELECT block, CAST(sum(n_bs) AS BIGINT) AS n_docs,
       CAST(sum(t_bs) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_sources,
       round(CAST(max(n_bs) AS DOUBLE) / CAST(sum(n_bs) AS DOUBLE), 9)
         AS top_source_share
FROM bs GROUP BY 1
"""


def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (new round 4): per-document unigram
    log-likelihood ratio of the lang='en' target model vs the corpus
    background model, add-one smoothed — positive score = more
    target-like than average (`operators/curation.importance_weights`).
    Integer count ratios promoted exactly to double on both engines;
    the grouped float sum rounds to 6 (the moment-aggregate
    discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    return CU.importance_weights(docs, F.col("lang") == "en")


def o_importance_weights() -> str:
    return f"""
WITH t AS (SELECT doc_id, lang, {O.sql_tokens('text')} AS w FROM documents),
tok AS (
  SELECT doc_id, CAST(lang = 'en' AS INT) AS is_t, unnest(w) AS tok FROM t
),
cnt AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c_c,
         CAST(sum(is_t) AS BIGINT) AS c_t
  FROM tok GROUP BY 1
),
tot AS (
  SELECT CAST(sum(c_c) AS BIGINT) AS N_c, CAST(sum(c_t) AS BIGINT) AS N_t,
         CAST(count(*) AS BIGINT) AS V
  FROM cnt
),
w AS (
  SELECT tok,
         ln(CAST((c_t + 1) * (N_c + V) AS DOUBLE)
            / CAST((c_c + 1) * (N_t + V) AS DOUBLE)) AS lw
  FROM cnt CROSS JOIN tot
),
ds AS (
  SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tok, sum(w.lw) AS s
  FROM tok JOIN w USING (tok) GROUP BY 1
)
SELECT t.doc_id,
       coalesce(ds.n_tok, 0) AS n_tok,
       round(coalesce(ds.s, 0.0), 6) AS lr_score,
       CAST(round(coalesce(ds.s, 0.0), 6) > 0.0 AS INT) AS selected
FROM t LEFT JOIN ds USING (doc_id)
"""


def q_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN graph density (new round 4): exact top-5 neighbors per
    vector (symmetric int8 cosine through the BLAS-batched knn_join),
    reciprocal edges kept, per-vector mutual degree returned — the
    embedding-quality / redundancy audit behind density-based curation
    (`operators/graph.mutual_knn_degrees`; scale path swaps the exact
    scorer for `dedup.embedding_near_dup`'s banded-LSH candidates)."""
    from pythonvectordb_spark.operators import graph as GR

    return GR.mutual_knn_degrees(_emb(spark, sf_dir), k=5)


def o_mutual_knn(k: int = 5) -> str:
    qv = O.sql_qvec("embedding")
    # symmetric int8 cosine: exact integer dot/norms (order-free), the
    # same arithmetic the BLAS verifier is pinned bit-equal to; testdata
    # vectors are non-zero so the zero-norm guard is a dead branch
    cos = (
        "(list_aggregate(list_transform(a.qv, (x, i) -> x::BIGINT * b.qv[i]::BIGINT), 'sum')::DOUBLE"
        " / (sqrt(list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)"
        " * sqrt(list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)))"
    )
    return f"""
WITH q AS (SELECT vec_id, {qv} AS qv FROM embeddings),
p AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb, {cos} AS score
  FROM q a CROSS JOIN q b
),
rk AS (
  SELECT qa, qb,
         row_number() OVER (PARTITION BY qa ORDER BY score DESC, qb ASC) AS rn
  FROM p
),
e AS (SELECT qa AS a, qb AS b FROM rk WHERE rn <= {k + 1} AND qa != qb),
m AS (
  SELECT e.a, CAST(count(*) AS BIGINT) AS mutual_degree
  FROM e JOIN e r ON e.a = r.b AND e.b = r.a GROUP BY e.a
)
SELECT q.vec_id, coalesce(m.mutual_degree, CAST(0 AS BIGINT)) AS mutual_degree
FROM q LEFT JOIN m ON q.vec_id = m.a
"""


def q_dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality validation suite (new round 4): the dbt-test / Deequ
    role — NOT-NULL + range rules as conditional sums inside ONE agg
    pass per table, PK uniqueness via count-minus-distinct, FK orphans
    via key-projected anti-joins (broadcast for the customer dim,
    shuffle for lineitem->orders). One row per rule
    (`operators/validate.dq_report`)."""
    from pythonvectordb_spark.operators import validate as V

    return V.dq_report(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
    )


def o_dq_violations() -> str:
    def intra(rule: str, table: str, pred: str) -> str:
        return (
            f"SELECT '{rule}' AS rule, CAST(count(*) AS BIGINT) AS n_checked,"
            f" CAST(coalesce(sum(CASE WHEN {pred} THEN 1 ELSE 0 END), 0) AS BIGINT)"
            f" AS n_violations FROM {table}"
        )

    def pk(rule: str, table: str, keys: str) -> str:
        return (
            f"SELECT '{rule}' AS rule, CAST(count(*) AS BIGINT) AS n_checked,"
            f" CAST(count(*) - count(DISTINCT ({keys})) AS BIGINT) AS n_violations"
            f" FROM {table}"
        )

    def fk(rule: str, fact: str, fkey: str, dim: str, dkey: str) -> str:
        # NULL fact keys are skipped on both sides (nullable FK is legal;
        # null-ness is covered by the NOT-NULL rules)
        return (
            f"SELECT '{rule}' AS rule, CAST(count(*) AS BIGINT) AS n_checked,"
            f" CAST(coalesce(sum(CASE WHEN NOT EXISTS"
            f" (SELECT 1 FROM {dim} d WHERE d.{dkey} = f.{fkey})"
            f" THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations FROM {fact} f"
            f" WHERE f.{fkey} IS NOT NULL"
        )

    parts = [
        intra("orders_custkey_null", "orders", "o_custkey IS NULL"),
        intra("orders_totalprice_nonpos", "orders", "o_totalprice <= 0"),
        intra("orders_orderdate_null", "orders", "o_orderdate IS NULL"),
        intra(
            "lineitem_qty_range", "lineitem", "l_quantity <= 0 OR l_quantity > 50"
        ),
        intra(
            "lineitem_discount_range", "lineitem", "l_discount < 0 OR l_discount > 1"
        ),
        intra("lineitem_price_nonpos", "lineitem", "l_extendedprice <= 0"),
        pk("orders_pk_unique", "orders", "o_orderkey"),
        pk("lineitem_pk_unique", "lineitem", "l_orderkey, l_linenumber"),
        pk("customer_pk_unique", "customer", "c_custkey"),
        fk("orders_fk_customer", "orders", "o_custkey", "customer", "c_custkey"),
        fk("lineitem_fk_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ]
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH r AS (
{body}
)
SELECT rule, n_checked, n_violations,
       CAST(n_violations = 0 AS INT) AS ok
FROM r
"""


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (new round 4): subwords-per-word
    and chars-per-subword under the GPT-2-style regex pre-tokenizer —
    the multilingual budget diagnostic that says which languages pay
    more tokens per word (`operators/textops.tokenizer_fertility`)."""
    return TX.tokenizer_fertility(
        load_table(spark, sf_dir, "documents"), pattern=_BPE_SPLIT
    )


def o_tokenizer_fertility() -> str:
    return f"""
WITH per_doc AS (
  SELECT lang,
         len({O.sql_tokens('text')}) AS n_words,
         len(regexp_extract_all(text, '{_BPE_SPLIT}')) AS n_subwords,
         len(text) AS n_chars
  FROM documents
),
g AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_words) AS BIGINT) AS n_words,
         CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
         CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM per_doc GROUP BY 1
)
SELECT lang, n_docs, n_words, n_subwords,
       round(CASE WHEN n_words > 0
                  THEN n_subwords::DOUBLE / n_words::DOUBLE ELSE 0.0 END, 6)
         AS fertility,
       round(CASE WHEN n_subwords > 0
                  THEN n_chars::DOUBLE / n_subwords::DOUBLE ELSE 0.0 END, 6)
         AS chars_per_subword
FROM g
"""


def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE trainer's first merge table (new round 4): top-20 adjacent
    character pairs, word-frequency weighted over distinct pre-tokenized
    words — the statistic byte-pair-encoding merges on
    (`operators/textops.bpe_merge_pairs`)."""
    return TX.bpe_merge_pairs(
        load_table(spark, sf_dir, "documents"), pattern=_BPE_SPLIT, top_n=20
    )


def o_bpe_merge_pairs(top_n: int = 20) -> str:
    return f"""
WITH wc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest(regexp_extract_all(text, '{_BPE_SPLIT}')) AS w
        FROM documents)
  GROUP BY 1
),
pairs AS (
  SELECT unnest(list_transform(range(1, length(w)), i -> w[i:i+1])) AS pair, wc
  FROM wc
),
agg AS (
  SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occurrences
  FROM pairs GROUP BY 1
  ORDER BY n_occurrences DESC, pair ASC LIMIT {top_n}
)
SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair ASC) AS INT)
         AS rank,
       pair, n_occurrences
FROM agg
"""


BPE_N_MERGES = 10


def _bpe_cte_chain(n_merges: int = BPE_N_MERGES) -> str:
    """Unrolled BPE trainer rounds as MATERIALIZED CTEs (the
    `o_trade_pagerank` pattern): w0 is the distinct-word frequency
    table with character-level symbol strings; each round r adds p{r}
    (weighted adjacent-pair counts), b{r} (the best pair, count DESC /
    pair ASC), and w{r} (every word rewritten by the same greedy
    left-to-right non-overlapping fold Spark runs — `list_reduce`
    replaying `textops._bpe_fold_rewrite`'s out||US||pending
    accumulator bit-for-bit)."""
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS wc,
         array_to_string(list_transform(range(1, length(w) + 1),
                         i -> substr(w, CAST(i AS INT), 1)), ' ') AS seq
  FROM (SELECT unnest(regexp_extract_all(text, '{_BPE_SPLIT}')) AS w
        FROM documents)
  GROUP BY 1
)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occurrences
  FROM (
    SELECT unnest(list_transform(range(1, len(syms)),
                  i -> syms[i] || ' ' || syms[i + 1])) AS pair, wc
    FROM (SELECT string_split(seq, ' ') AS syms, wc FROM w{r - 1})
  ) GROUP BY 1
),
b{r} AS MATERIALIZED (
  SELECT CAST({r} AS INT) AS merge_rank, pair,
         replace(pair, ' ', '') AS merged, n_occurrences
  FROM p{r} ORDER BY n_occurrences DESC, pair ASC LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT w, wc,
    substr(CASE WHEN split_part(acc, chr(31), 2) = ''
                THEN split_part(acc, chr(31), 1)
                ELSE split_part(acc, chr(31), 1) || ' ' ||
                     split_part(acc, chr(31), 2) END, 2) AS seq
  FROM (
    SELECT w, wc,
      list_reduce(list_prepend(chr(31), string_split(seq, ' ')),
        (acc, x) -> CASE
          WHEN split_part(acc, chr(31), 2) = ''
            THEN split_part(acc, chr(31), 1) || chr(31) || x
          WHEN split_part(acc, chr(31), 2) || ' ' || x = b.pair
            THEN split_part(acc, chr(31), 1) || ' ' || b.merged || chr(31)
          ELSE split_part(acc, chr(31), 1) || ' ' ||
               split_part(acc, chr(31), 2) || chr(31) || x
        END) AS acc
    FROM w{r - 1}, b{r} b
  )
)"""
        )
    return ",\n".join(parts)


def q_bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE trainer (new round 6; VERDICT r5 task 5): the
    top-10 learned merges by unrolled merge rounds over the
    distinct-word frequency table — `bpe_merge_pairs` computes only the
    FIRST merge; this is the full Sennrich-style trainer loop
    (`operators/textops.bpe_merge_table`; unit-tested against a
    pure-Python BPE reference in tests/test_textpipeline.py)."""
    return TX.bpe_merge_table(
        load_table(spark, sf_dir, "documents"),
        pattern=_BPE_SPLIT,
        n_merges=BPE_N_MERGES,
    )


def o_bpe_merge_table() -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT merge_rank, pair, merged, n_occurrences FROM b{r}"
        for r in range(1, BPE_N_MERGES + 1)
    )
    return f"""
WITH {_bpe_cte_chain()}
{selects}
"""


def q_bpe_trained_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility under the LEARNED merge table (new round 6):
    corpus-level pieces-per-word and compression after the 10 trained
    merges — the re-run of the fertility diagnostic on the trainer's
    output the round-5 VERDICT asked for
    (`operators/textops.bpe_trained_fertility`)."""
    return TX.bpe_trained_fertility(
        load_table(spark, sf_dir, "documents"),
        pattern=_BPE_SPLIT,
        n_merges=BPE_N_MERGES,
    )


def o_bpe_trained_fertility() -> str:
    return f"""
WITH {_bpe_cte_chain()}
SELECT CAST({BPE_N_MERGES} AS INT) AS n_merges,
       CAST(sum(wc) AS BIGINT) AS n_words,
       CAST(sum(length(w) * wc) AS BIGINT) AS n_chars,
       CAST(sum(len(string_split(seq, ' ')) * wc) AS BIGINT) AS n_pieces,
       round(sum(length(w) * wc)::DOUBLE / sum(wc)::DOUBLE, 6)
         AS fertility_chars,
       round(sum(len(string_split(seq, ' ')) * wc)::DOUBLE
             / sum(wc)::DOUBLE, 6) AS fertility_pieces,
       round(sum(len(string_split(seq, ' ')) * wc)::DOUBLE
             / sum(length(w) * wc)::DOUBLE, 6) AS compression
FROM w{BPE_N_MERGES}
"""


def _sql_sign_bits(col: str, base: int) -> str:
    """Mirror of `search.sign_bit_codes`' 32-bit word: sum of distinct
    powers of two over strictly-positive coordinates (exact int64)."""
    return (
        f"list_aggregate(list_transform(range(0, 32), i -> "
        f"CASE WHEN {col}[CAST(i + {base} + 1 AS INT)] > 0 "
        f"THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END), 'sum')"
    )


def _sql_int8_sym_cos(a: str, b: str) -> str:
    """Mirror of functions.vector.cosine_similarity_int8_sym for two
    int8 list columns (exact integer dot/norms, one double division)."""
    dot = (
        f"list_aggregate(list_transform(range(1, {FX.DIM} + 1), i -> "
        f"{a}[CAST(i AS INT)]::BIGINT * {b}[CAST(i AS INT)]::BIGINT), 'sum')"
    )
    return (
        f"({dot}::DOUBLE / ({O.sql_int8_norm(a)} * {O.sql_int8_norm(b)}))"
    )


def q_sign_bit_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit quantization recall audit (new round 6): hamming top-10
    over packed sign codes vs the exact symmetric-int8 top-10, per
    query — prices the binary pre-filter tier (8 bytes/vector, 64x
    compression) of a hamming-shortlist -> int8-rerank pipeline
    (`operators/search.sign_bit_recall`)."""
    return S.sign_bit_recall(load_table(spark, sf_dir, "embeddings"), k=10)


def o_sign_bit_recall() -> str:
    return f"""
WITH q AS (SELECT vec_id, {O.sql_qvec()} AS qv,
                  {_sql_sign_bits('embedding', 0)} AS sig_lo,
                  {_sql_sign_bits('embedding', 32)} AS sig_hi
           FROM embeddings),
qs AS (SELECT vec_id AS query_id, qv AS qq, sig_lo AS qlo, sig_hi AS qhi
       FROM q WHERE vec_id < 8),
pairs AS (SELECT qs.query_id, q.vec_id, q.qv, q.sig_lo, q.sig_hi,
                 qs.qq, qs.qlo, qs.qhi
          FROM q, qs WHERE q.vec_id != qs.query_id),
hk AS (SELECT query_id, vec_id FROM (
         SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY bit_count(xor(sig_lo, qlo))
                           + bit_count(xor(sig_hi, qhi)) ASC,
                           vec_id ASC) AS rn
         FROM pairs) WHERE rn <= 10),
ck AS (SELECT query_id, vec_id FROM (
         SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY round({_sql_int8_sym_cos('qq', 'qv')}, 9) DESC,
                           vec_id ASC) AS rn
         FROM pairs) WHERE rn <= 10),
ov AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_overlap
       FROM hk JOIN ck USING (query_id, vec_id) GROUP BY 1)
SELECT query_id, coalesce(n_overlap, 0) AS n_overlap,
       round(coalesce(n_overlap, 0)::DOUBLE / 10.0, 6) AS recall
FROM qs LEFT JOIN ov USING (query_id)
"""


MATRYOSHKA_PREFIXES = (8, 16, 32)


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation recall (new round 6): prefix-dimension
    cosine top-10 vs the full-dim exact top-10 for prefixes 8/16/32 of
    64 — the dimensions axis of the index-tuning surface
    (`operators/search.matryoshka_recall`)."""
    return S.matryoshka_recall(
        load_table(spark, sf_dir, "embeddings"),
        FX.QUERY_VEC,
        prefixes=MATRYOSHKA_PREFIXES,
        k=10,
    )


def o_matryoshka_recall() -> str:
    def prefix_cos(p: int) -> str:
        qp = [float(x) for x in FX.QUERY_VEC[:p]]
        cn = (
            f"sqrt(list_aggregate(list_transform(embedding[1:{p}], "
            f"y -> y::DOUBLE * y::DOUBLE), 'sum'))"
        )
        return (
            f"(({O.sql_dot_lit(qp, 'embedding', p)}) / "
            f"({O.sql_query_norm(qp)} * {cn}))"
        )

    points = "\nUNION ALL\n".join(
        f"""SELECT CAST({p} AS INT) AS prefix_dim,
       CAST(count(*) AS BIGINT) AS n_overlap,
       round(count(*)::DOUBLE / 10.0, 6) AS recall
FROM (SELECT vec_id FROM embeddings
      ORDER BY round({prefix_cos(p)}, 9) DESC, vec_id ASC LIMIT 10)
JOIN ex USING (vec_id)"""
        for p in MATRYOSHKA_PREFIXES
    )
    return f"""
WITH ex AS MATERIALIZED (
  SELECT vec_id FROM embeddings
  ORDER BY round({O.sql_cosine_float_lit(FX.QUERY_VEC, 'embedding')}, 9) DESC,
           vec_id ASC LIMIT 10
)
{points}
"""


def q_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy of the quantized store (new round 6): the EXACT mean
    pairwise int8 dot over all ordered pairs via the sum-vector
    identity ||sum q||^2 - sum ||q||^2 — no pair materializes, no
    sampling (`operators/search.embedding_anisotropy`)."""
    return S.embedding_anisotropy(load_table(spark, sf_dir, "embeddings"))


def o_embedding_anisotropy() -> str:
    return f"""
WITH q AS (SELECT vec_id, {O.sql_qvec()} AS qv FROM embeddings),
d AS (SELECT CAST(i AS INT) AS d, qv[CAST(i AS INT)]::BIGINT AS x
      FROM q, unnest(range(1, {FX.DIM} + 1)) r(i)),
s AS (SELECT d, CAST(sum(x) AS BIGINT) AS sd FROM d GROUP BY 1),
s2 AS (SELECT CAST(sum(sd * sd) AS BIGINT) AS s2 FROM s),
t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(list_aggregate(list_transform(qv,
                  x -> x::BIGINT * x::BIGINT), 'sum')) AS BIGINT) AS sum_self
      FROM q)
SELECT n AS n_vectors, sum_self, s2 AS sum_vector_sq,
       round((s2 - sum_self)::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0)), 6)
         AS mean_pair_dot,
       round(sum_self::DOUBLE / n::DOUBLE, 6) AS mean_self_dot,
       round(((s2 - sum_self)::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0)))
             / (sum_self::DOUBLE / n::DOUBLE), 6) AS anisotropy
FROM t CROSS JOIN s2
"""


def q_ndcg_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the IVF index against graded exact relevance (new
    round 6): recall counts hits, nDCG charges for order — rel = 11 -
    exact_rank, DCG weights 1/log2(rank+1) as repr literals shared by
    both engines (`operators/search.ndcg_ivf`)."""
    return S.ndcg_ivf(
        load_table(spark, sf_dir, "embeddings"),
        FX.QUERY_VEC,
        FX.CENTROIDS,
        k=10,
        nprobe=2,
    )


def o_ndcg_ivf() -> str:
    probe = S.ivf_probe(FX.QUERY_VEC, FX.CENTROIDS, nprobe=2)
    sims = ", ".join(O.sql_cosine_float_lit(c, "embedding") for c in FX.CENTROIDS)
    probe_list = ", ".join(str(p) for p in probe)
    weights = ", ".join(repr(float(w)) for w in S.DCG_WEIGHTS_10)
    cos = O.sql_cosine_float_lit(FX.QUERY_VEC, "embedding")
    return f"""
WITH assigned AS (
  SELECT *, [{sims}] AS sims FROM embeddings
),
cand AS (
  SELECT * FROM assigned
  WHERE (list_position(sims, list_aggregate(sims, 'max')) - 1) IN ({probe_list})
),
ivf AS (SELECT vec_id, round({cos}, 9) AS r9
        FROM cand ORDER BY r9 DESC, vec_id ASC LIMIT 10),
ranked AS (SELECT vec_id,
                  CAST(row_number() OVER (ORDER BY r9 DESC, vec_id ASC)
                       AS BIGINT) AS rank
           FROM ivf),
ex AS (SELECT vec_id,
              CAST(row_number() OVER (ORDER BY r9 DESC, vec_id ASC)
                   AS BIGINT) AS exact_rank
       FROM (SELECT vec_id, round({cos}, 9) AS r9
             FROM embeddings ORDER BY r9 DESC, vec_id ASC LIMIT 10)),
d AS (SELECT sum((CASE WHEN exact_rank IS NULL THEN 0
                       ELSE 11 - exact_rank END)::DOUBLE
                 * ([{weights}])[CAST(rank AS INT)]) AS dcg
      FROM ranked LEFT JOIN ex USING (vec_id))
SELECT CAST(10 AS INT) AS k, CAST(2 AS INT) AS nprobe,
       round(dcg, 6) AS dcg,
       round({float(S.IDCG_10)!r}::DOUBLE, 6) AS idcg,
       round(dcg / {float(S.IDCG_10)!r}, 6) AS ndcg
FROM d
"""


def q_mrr_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the true nearest neighbor in the registered
    LSH shortlist (new round 6, 20x5 band default): 1/rank when the
    exact top-1 surfaces, 0 on a bucket miss
    (`operators/search.mrr_at_k`)."""
    from pythonvectordb_spark.operators.dedup import lsh_band_planes

    emb = load_table(spark, sf_dir, "embeddings")
    ann = S.ann_lsh_multiprobe_search(emb, FX.QUERY_VEC, lsh_band_planes(20, 5), k=10)
    return S.mrr_at_k(emb, ann, FX.QUERY_VEC, k=10)


def o_mrr_lsh() -> str:
    from pythonvectordb_spark.operators.dedup import lsh_band_planes

    planes = lsh_band_planes(20, 5)
    or_terms = []
    for bp in planes:
        qsig = 0
        terms = []
        for i, h in enumerate(bp):
            dd = sum(float(a) * float(b) for a, b in zip(FX.QUERY_VEC, h))
            if dd >= 0:
                qsig |= 1 << i
            terms.append(
                f"(CASE WHEN ({O.sql_dot_lit(h, 'embedding')}) >= 0 "
                f"THEN {1 << i} ELSE 0 END)"
            )
        or_terms.append(f"(({' + '.join(terms)}) = {qsig})")
    cond = "\n   OR ".join(or_terms)
    cos = O.sql_cosine_float_lit(FX.QUERY_VEC, "embedding")
    return f"""
WITH gold AS (SELECT vec_id AS gold_id FROM embeddings
              ORDER BY round({cos}, 9) DESC, vec_id ASC LIMIT 1),
cand AS (SELECT * FROM embeddings WHERE {cond}),
lshk AS (SELECT vec_id, round({cos}, 9) AS r9
         FROM cand ORDER BY r9 DESC, vec_id ASC LIMIT 10),
ranked AS (SELECT vec_id,
                  CAST(row_number() OVER (ORDER BY r9 DESC, vec_id ASC)
                       AS BIGINT) AS rank
           FROM lshk)
SELECT CAST(10 AS INT) AS k, gold_id,
       coalesce(rank, 0) AS found_rank,
       round(coalesce(1.0 / rank::DOUBLE, 0.0), 6) AS rr
FROM gold LEFT JOIN ranked ON gold_id = vec_id
"""


def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch over event users (new round 6): k=64
    minimum md5-prefix hashes, estimate (k-1)*2^32/h_(k) next to the
    exact count and its relative error — the HLL-class cardinality
    sketch whose every number is expression-reproducible, so the
    SKETCH itself hash-matches the oracle (the two HLL entries are
    rows-only by design; this one is not)
    (`operators/sketch.kmv_distinct`)."""
    from pythonvectordb_spark.operators.sketch import kmv_distinct

    return kmv_distinct(load_table(spark, sf_dir, "events"), "user_id", k=64)


def o_kmv_distinct_users() -> str:
    from pythonvectordb_spark.operators.sketch import KMV_SPACE

    return f"""
WITH h AS (SELECT DISTINCT
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
           FROM events),
kth AS (SELECT CAST(max(h) AS BIGINT) AS kth_hash,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM (SELECT h FROM h ORDER BY h ASC LIMIT 64)),
ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_exact
       FROM events)
SELECT CAST(64 AS INT) AS k, n_distinct_exact, kth_hash,
       round(CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                  ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END, 6)
         AS estimate,
       round(abs((CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                       ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END)
                 - n_distinct_exact::DOUBLE)
             / n_distinct_exact::DOUBLE, 6) AS rel_error
FROM ex CROSS JOIN kth
"""


def q_bloom_fpr_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter measured FPR (new round 6): build the bit set from
    purchasing users, probe with never-purchased users (known absent),
    report measured vs load-expected FPR — the calibration behind
    `bloom_prune_join`'s IO-savings claim; md5 positions make the
    filter engine-reproducible (`operators/sketch.bloom_fpr`)."""
    from pythonvectordb_spark.operators.sketch import bloom_fpr

    ev = load_table(spark, sf_dir, "events")
    members = ev.filter(F.col("event_type") == "purchase").select("user_id")
    probes = (
        ev.select("user_id")
        .distinct()
        .join(members.distinct(), "user_id", "left_anti")
    )
    return bloom_fpr(members, probes, "user_id", m=4096, n_hashes=3)


def o_bloom_fpr_purchases() -> str:
    def pos(j: int) -> str:
        return (
            f"(('0x' || substr(md5('{j}:' || CAST(user_id AS VARCHAR)), 1, 8))"
            f"::BIGINT % 4096)"
        )

    return f"""
WITH members AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
probes AS (SELECT DISTINCT user_id FROM events
           WHERE user_id NOT IN (SELECT user_id FROM members)),
bits AS (SELECT DISTINCT pos FROM (
           SELECT unnest([{pos(0)}, {pos(1)}, {pos(2)}]) AS pos FROM members)),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM bits),
nm AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_members FROM members),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes),
pp AS (SELECT user_id AS pk, unnest([{pos(0)}, {pos(1)}, {pos(2)}]) AS pos
       FROM probes),
fp AS (SELECT CAST(count(*) AS BIGINT) AS n_false_positives FROM (
         SELECT pk FROM pp JOIN bits USING (pos)
         GROUP BY pk HAVING count(*) = 3))
SELECT CAST(4096 AS INT) AS m, CAST(3 AS INT) AS k_hashes,
       n_members, n_bits_set, n_probes, n_false_positives,
       CASE WHEN n_probes > 0 THEN
         round(n_false_positives::DOUBLE / n_probes::DOUBLE, 6)
       END AS fpr_measured,
       round((n_bits_set::DOUBLE / 4096.0) * (n_bits_set::DOUBLE / 4096.0)
             * (n_bits_set::DOUBLE / 4096.0), 6) AS fpr_expected
FROM nm CROSS JOIN nb CROSS JOIN np CROSS JOIN fp
"""


def q_trade_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hub/authority over the nation trade graph (new round 6):
    5 fixed L1-normalized power iterations on the same exact-cents
    edges as `trade_pagerank` — hubs = influence exporters, authorities
    = importers; the DuckDB oracle replays the identical unrolled
    rounds (`operators/graph.hits`)."""
    from pythonvectordb_spark.operators.graph import hits

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    ).cast("long")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    edges = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), customer.c_nationkey == F.col("c_nk"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(rev).cast("long").alias("w"))
    )
    out = hits(edges, iterations=5, src_col="supp_nation", dst_col="cust_nation")
    return out.select(F.col("node").alias("nation"), "hub", "auth")


def o_trade_hits(iterations: int = 5) -> str:
    steps = []
    for i in range(1, iterations + 1):
        steps.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(e.w * h.hub) AS raw
  FROM agg e JOIN h{i - 1} h ON e.src = h.node GROUP BY 1
),
asum{i} AS MATERIALIZED (SELECT sum(raw) AS s FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT nd.node, coalesce(r.raw, 0.0) / s.s AS auth
  FROM nodes nd CROSS JOIN asum{i} s LEFT JOIN ar{i} r ON r.node = nd.node
),
hr{i} AS MATERIALIZED (
  SELECT e.src AS node, sum(e.w * a.auth) AS raw
  FROM agg e JOIN a{i} a ON e.dst = a.node GROUP BY 1
),
hsum{i} AS MATERIALIZED (SELECT sum(raw) AS s FROM hr{i}),
h{i} AS MATERIALIZED (
  SELECT nd.node, coalesce(r.raw, 0.0) / s.s AS hub
  FROM nodes nd CROSS JOIN hsum{i} s LEFT JOIN hr{i} r ON r.node = nd.node
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH agg AS MATERIALIZED (
  SELECT n1.n_name AS src, n2.n_name AS dst,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  GROUP BY 1, 2
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (SELECT src AS node FROM agg
                             UNION ALL SELECT dst FROM agg)),
n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
h0 AS MATERIALIZED (SELECT node, 1.0 / n.nn AS hub FROM nodes CROSS JOIN n),
{chain}
SELECT nd.node AS nation, round(h.hub, 6) AS hub, round(a.auth, 6) AS auth
FROM nodes nd JOIN h{iterations} h ON h.node = nd.node
JOIN a{iterations} a ON a.node = nd.node
"""


def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between sources (new round
    6): z-scored top-20 function-word frequencies, Delta = mean |z gap|
    per source pair — near-zero Delta is the same-upstream-crawl
    signature (`operators/textops.burrows_delta`)."""
    return TX.burrows_delta(load_table(spark, sf_dir, "documents"), n_words=20)


def o_burrows_delta() -> str:
    return f"""
WITH tok AS (SELECT source AS g, unnest({O.sql_tokens('text')}) AS w
             FROM documents),
top AS MATERIALIZED (
  SELECT w FROM (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1)
  ORDER BY cnt DESC, w ASC LIMIT 20),
totals AS (SELECT g, CAST(count(*) AS BIGINT) AS nt FROM tok GROUP BY 1),
cells AS (SELECT g, w, CAST(count(*) AS BIGINT) AS c
          FROM tok JOIN top USING (w) GROUP BY 1, 2),
grid AS MATERIALIZED (
  SELECT t.g, tp.w, coalesce(c.c, 0)::DOUBLE / t.nt::DOUBLE AS f
  FROM totals t CROSS JOIN top tp
  LEFT JOIN cells c ON c.g = t.g AND c.w = tp.w),
stats AS (SELECT w, sum(f) / count(*)::DOUBLE AS mu,
                 sum(f * f) / count(*)::DOUBLE AS m2
          FROM grid GROUP BY 1),
z AS MATERIALIZED (
  SELECT g, grid.w, (f - mu) / sqrt(greatest(m2 - mu * mu, 0.0)) AS z
  FROM grid JOIN stats ON grid.w = stats.w
  WHERE sqrt(greatest(m2 - mu * mu, 0.0)) > 0)
SELECT a.g AS source_a, b.g AS source_b,
       CAST(count(*) AS BIGINT) AS n_words_used,
       round(sum(abs(a.z - b.z)) / count(*)::DOUBLE, 6) AS delta
FROM z a JOIN z b ON a.w = b.w AND a.g < b.g
GROUP BY 1, 2
"""


def q_nb_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest ROC AUC per class for the NB gate (new round 6):
    threshold-free ranking quality from the shared `_nb_doc_scores`
    pipeline — rounded-6 scores become exact micros, then the
    `mann_whitney` doubled-midrank machinery gives a tie-aware AUC
    with one promotion (`operators/curation.nb_auc`)."""
    docs = load_table(spark, sf_dir, "documents")
    return CU.nb_auc(docs, (F.col("doc_id") % 2) == 0)


def o_nb_auc() -> str:
    return f"""
WITH t AS (SELECT doc_id, lang, {O.sql_tokens('text')} AS w,
                  doc_id % 2 = 0 AS is_tr FROM documents),
tok AS (SELECT doc_id, lang, is_tr, unnest(w) AS tok FROM t),
tr AS (SELECT * FROM tok WHERE is_tr),
te AS (SELECT * FROM tok WHERE NOT is_tr),
cond AS (SELECT lang AS cls, tok, CAST(count(*) AS BIGINT) AS c_tc
         FROM tr GROUP BY 1, 2),
clstok AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS tok_c
           FROM tr GROUP BY 1),
vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS V FROM tr),
ndocs AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS N FROM ndocs),
classes AS (
  SELECT cls, ln(n_docs::DOUBLE / N::DOUBLE) AS prior_ln, tok_c + V AS denom
  FROM ndocs JOIN clstok USING (cls) CROSS JOIN vocab CROSS JOIN tot
),
sc AS (
  SELECT te.doc_id, te.lang, c.cls,
         round(c.prior_ln
               + sum(ln((coalesce(cond.c_tc, 0) + 1)::DOUBLE
                        / c.denom::DOUBLE)), 6) AS score
  FROM te CROSS JOIN classes c
  LEFT JOIN cond ON cond.cls = c.cls AND cond.tok = te.tok
  GROUP BY 1, 2, 3, c.prior_ln
),
base AS (SELECT cls, CAST(round(score * 1000000.0) AS BIGINT) AS v,
                CASE WHEN lang = cls THEN 1 ELSE 0 END AS pos
         FROM sc),
gv AS (SELECT cls, v, CAST(count(*) AS BIGINT) AS c,
              CAST(sum(pos) AS BIGINT) AS cp
       FROM base GROUP BY 1, 2),
mid AS (SELECT cls, cp, c,
               CAST(2 * (sum(c) OVER (PARTITION BY cls ORDER BY v ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
                    + c + 1 AS BIGINT) AS mr2
        FROM gv),
per AS (SELECT cls, CAST(sum(cp) AS BIGINT) AS n_pos,
               CAST(sum(c) - sum(cp) AS BIGINT) AS n_neg,
               CAST(sum(cp * mr2) AS BIGINT) AS s2p
        FROM mid GROUP BY 1)
SELECT cls, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         round((s2p::DOUBLE / 2.0
                - n_pos::DOUBLE * (n_pos::DOUBLE + 1.0) / 2.0)
               / (n_pos::DOUBLE * n_neg::DOUBLE), 6) END AS auc
FROM per
"""


def q_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Holt double exponential smoothing over daily revenue
    (new round 6): level/trend recurrences on exact cents with
    arithmetic shifts (floor semantics measured identical on both
    engines, including negative trends); one-step forecast per day
    (`operators/timeseries.holt_linear_forecast`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.holt_linear_forecast(load_table(spark, sf_dir, "events"))


def o_holt_linear_forecast() -> str:
    return """
WITH RECURSIVE daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
idx AS (SELECT di, cents,
               CAST(row_number() OVER (ORDER BY di ASC) AS BIGINT) AS i
        FROM daily),
r AS (
  SELECT i, di, cents, cents AS l, CAST(0 AS BIGINT) AS b FROM idx WHERE i = 1
  UNION ALL
  SELECT d.i, d.di, d.cents,
         CAST((d.cents + r.l + r.b) >> 1 AS BIGINT),
         CAST((r.b + ((d.cents + r.l + r.b) >> 1) - r.l) >> 1 AS BIGINT)
  FROM r JOIN idx d ON d.i = r.i + 1
)
SELECT di, cents, CAST(l AS BIGINT) AS level_cents,
       CAST(b AS BIGINT) AS trend_cents,
       CAST(l + b AS BIGINT) AS forecast_next_cents
FROM r
"""


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust daily-revenue trend (new round 6): median of
    all pairwise slopes over the calendar-bounded day frame — immune
    to ~29% corrupted days where OLS chases every outlier
    (`operators/timeseries.theil_sen_trend`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.theil_sen_trend(load_table(spark, sf_dir, "events"))


def o_theil_sen_trend() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
pairs AS (SELECT a.di AS di_a, b.di AS di_b,
                 (b.cents - a.cents)::DOUBLE / (b.di - a.di)::DOUBLE AS slope
          FROM daily a JOIN daily b ON a.di < b.di),
ranked AS (SELECT slope,
                  CAST(row_number() OVER (ORDER BY slope ASC, di_a ASC,
                                          di_b ASC) AS BIGINT) AS rn
           FROM pairs),
n AS (SELECT CAST(count(*) AS BIGINT) AS np FROM ranked),
med AS (SELECT CAST(max(np) AS BIGINT) AS n_pairs,
               sum(slope) / count(*)::DOUBLE AS med
        FROM ranked CROSS JOIN n
        WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
SELECT n_days, n_pairs,
       round(med, 6) AS slope_cents_per_day,
       round(med / 100.0, 6) AS slope_per_day
FROM nd CROSS JOIN med
"""


def q_label_centroid_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label centroids of the quantized
    store (new round 6): the class-confusability map — exact int8
    dimension sums, pair dots/norms exact integers, one double
    division per pair (`operators/search.label_centroid_affinity`)."""
    return S.label_centroid_affinity(load_table(spark, sf_dir, "embeddings"))


def o_label_centroid_affinity() -> str:
    return f"""
WITH q AS (SELECT label, {O.sql_qvec()} AS qv FROM embeddings),
d AS (SELECT label AS lbl, CAST(i AS INT) AS d, qv[CAST(i AS INT)]::BIGINT AS x
      FROM q, unnest(range(1, {FX.DIM} + 1)) r(i)),
s AS (SELECT lbl, d, CAST(sum(x) AS BIGINT) AS sd FROM d GROUP BY 1, 2),
counts AS (SELECT label AS lbl, CAST(count(*) AS BIGINT) AS n
           FROM embeddings GROUP BY 1),
pairs AS (SELECT a.lbl AS label_a, b.lbl AS label_b,
                 CAST(sum(a.sd * b.sd) AS BIGINT) AS dot,
                 CAST(sum(a.sd * a.sd) AS BIGINT) AS na2,
                 CAST(sum(b.sd * b.sd) AS BIGINT) AS nb2
          FROM s a JOIN s b ON a.d = b.d AND a.lbl < b.lbl
          GROUP BY 1, 2)
SELECT label_a, label_b, ca.n AS n_a, cb.n AS n_b,
       CASE WHEN na2 > 0 AND nb2 > 0 THEN
         round(dot::DOUBLE / (sqrt(na2::DOUBLE) * sqrt(nb2::DOUBLE)), 6)
       END AS cosine
FROM pairs
JOIN counts ca ON ca.lbl = label_a
JOIN counts cb ON cb.lbl = label_b
"""


def q_value_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-Wasserstein value drift per event type (new round 6):
    the earth-mover magnitude companion to `ks_drift`'s sup-norm —
    common-denominator DECIMAL(38,0) sum over the distinct-value
    frame, one division
    (`operators/timeseries.value_wasserstein_drift`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.value_wasserstein_drift(load_table(spark, sf_dir, "events"))


def o_value_wasserstein_drift() -> str:
    return """
WITH base AS (SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v,
                     event_id % 2 = 0 AS even
              FROM events),
pv AS (SELECT t, v,
              CAST(sum(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS ce,
              CAST(sum(CASE WHEN even THEN 0 ELSE 1 END) AS BIGINT) AS co
       FROM base GROUP BY 1, 2),
cur AS (SELECT t, v,
               CAST(sum(ce) OVER w AS BIGINT) AS cume,
               CAST(sum(co) OVER w AS BIGINT) AS cumo,
               CAST(sum(ce) OVER (PARTITION BY t) AS BIGINT) AS ne,
               CAST(sum(co) OVER (PARTITION BY t) AS BIGINT) AS no,
               lead(v) OVER (PARTITION BY t ORDER BY v ASC) AS vnext
        FROM pv
        WINDOW w AS (PARTITION BY t ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
g AS (SELECT t, CAST(max(ne) AS BIGINT) AS n_even,
             CAST(max(no) AS BIGINT) AS n_odd,
             sum(CASE WHEN vnext IS NOT NULL THEN
                   CAST(vnext - v AS HUGEINT)
                   * CAST(abs(no * cume - ne * cumo) AS HUGEINT)
                 END) AS num
      FROM cur GROUP BY 1)
SELECT t AS event_type, n_even, n_odd,
       CASE WHEN n_even > 0 AND n_odd > 0 THEN
         round(coalesce(num::DOUBLE / (n_even::DOUBLE * n_odd::DOUBLE), 0.0), 6)
       END AS w1_cents
FROM g
"""


def q_daily_max_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel EV-I fit of the daily maximum event value (new round 6):
    method-of-moments beta/mu from exact integer moments, 100-day
    return level with gamma/pi/ln-factor as repr literals
    (`operators/timeseries.daily_max_gumbel`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.daily_max_gumbel(load_table(spark, sf_dir, "events"), ret_days=100)


def o_daily_max_gumbel() -> str:
    import math

    from pythonvectordb_spark.operators.timeseries import GUMBEL_GAMMA, GUMBEL_PI

    gfac = -math.log(-math.log(1.0 - 1.0 / 100.0))
    return f"""
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mx
  FROM events GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(mx) AS BIGINT) AS s,
             CAST(sum(mx * mx) AS BIGINT) AS q
      FROM daily)
SELECT n_days,
       round(s::DOUBLE / n_days::DOUBLE, 6) AS mean_daily_max_cents,
       CASE WHEN n_days > 1
                 AND (q::DOUBLE / n_days::DOUBLE
                      - (s::DOUBLE / n_days::DOUBLE)
                        * (s::DOUBLE / n_days::DOUBLE)) > 0 THEN
         round(sqrt(6.0 * (q::DOUBLE / n_days::DOUBLE
                           - (s::DOUBLE / n_days::DOUBLE)
                             * (s::DOUBLE / n_days::DOUBLE)))
               / {GUMBEL_PI!r}, 6) END AS beta_cents,
       CASE WHEN n_days > 1
                 AND (q::DOUBLE / n_days::DOUBLE
                      - (s::DOUBLE / n_days::DOUBLE)
                        * (s::DOUBLE / n_days::DOUBLE)) > 0 THEN
         round(s::DOUBLE / n_days::DOUBLE
               - {GUMBEL_GAMMA!r}
                 * (sqrt(6.0 * (q::DOUBLE / n_days::DOUBLE
                                - (s::DOUBLE / n_days::DOUBLE)
                                  * (s::DOUBLE / n_days::DOUBLE)))
                    / {GUMBEL_PI!r}), 6) END AS mu_cents,
       CASE WHEN n_days > 1
                 AND (q::DOUBLE / n_days::DOUBLE
                      - (s::DOUBLE / n_days::DOUBLE)
                        * (s::DOUBLE / n_days::DOUBLE)) > 0 THEN
         round((s::DOUBLE / n_days::DOUBLE
                - {GUMBEL_GAMMA!r}
                  * (sqrt(6.0 * (q::DOUBLE / n_days::DOUBLE
                                 - (s::DOUBLE / n_days::DOUBLE)
                                   * (s::DOUBLE / n_days::DOUBLE)))
                     / {GUMBEL_PI!r}))
               + (sqrt(6.0 * (q::DOUBLE / n_days::DOUBLE
                              - (s::DOUBLE / n_days::DOUBLE)
                                * (s::DOUBLE / n_days::DOUBLE)))
                  / {GUMBEL_PI!r}) * {gfac!r}, 6) END AS level_100d_cents
FROM t
"""


def q_bpe_encode_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piece-frequency table under the TRAINED BPE merges (new round
    6): top-20 subword pieces by corpus-weighted frequency after the
    10 learned merges, with stream share — the encode leg of the BPE
    story (`operators/textops.bpe_encode_pieces`)."""
    return TX.bpe_encode_pieces(
        load_table(spark, sf_dir, "documents"),
        pattern=_BPE_SPLIT,
        n_merges=BPE_N_MERGES,
        top_n=20,
    )


def o_bpe_encode_pieces() -> str:
    return f"""
WITH {_bpe_cte_chain()},
pieces AS MATERIALIZED (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS n_occurrences
  FROM (SELECT unnest(string_split(seq, ' ')) AS piece, wc
        FROM w{BPE_N_MERGES})
  GROUP BY 1),
tot AS (SELECT CAST(sum(n_occurrences) AS BIGINT) AS nt FROM pieces),
top AS (SELECT piece, n_occurrences FROM pieces
        ORDER BY n_occurrences DESC, piece ASC LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, piece ASC)
            AS INT) AS rank,
       piece, n_occurrences,
       round(n_occurrences::DOUBLE / nt::DOUBLE, 6) AS share
FROM top CROSS JOIN tot
"""


def q_friedman_types_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test of event types blocked by day (new round 6): is
    the type revenue ORDERING stable across days — the
    repeated-measures rank test next to `kruskal_wallis`'s pooled one;
    doubled within-day midranks keep the tie-adjusted Q an exact
    integer ratio (`operators/timeseries.friedman_types_by_day`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.friedman_types_by_day(load_table(spark, sf_dir, "events"))


def o_friedman_types_by_day() -> str:
    return """
WITH cells AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         event_type AS ty,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM events GROUP BY 1, 2),
days AS (SELECT DISTINCT di FROM cells),
types AS (SELECT DISTINCT ty FROM cells),
grid AS (SELECT d.di, t.ty, coalesce(c.rev, 0) AS rev
         FROM days d CROSS JOIN types t
         LEFT JOIN cells c ON c.di = d.di AND c.ty = t.ty),
ranked AS (
  SELECT di, ty,
         CAST(2 * coalesce(sum(1) OVER (PARTITION BY di ORDER BY rev ASC
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + count(*) OVER (PARTITION BY di, rev) + 1 AS BIGINT) AS r2,
         CAST(count(*) OVER (PARTITION BY di) AS BIGINT) AS k
  FROM grid),
per_type AS (SELECT ty, CAST(sum(r2) AS BIGINT) AS r2j FROM ranked GROUP BY 1),
tots AS (SELECT CAST(sum(r2 * r2) AS BIGINT) AS sr22,
                CAST(max(k) AS BIGINT) AS k,
                CAST(count(DISTINCT di) AS BIGINT) AS n
         FROM ranked),
stat AS (SELECT CAST((r2j - n * (k + 1)) * (r2j - n * (k + 1)) AS BIGINT)
                  AS dev2, k, n, sr22
         FROM per_type CROSS JOIN tots)
SELECT CAST(max(k) AS BIGINT) AS n_types, CAST(max(n) AS BIGINT) AS n_days,
       CASE WHEN (max(sr22) - max(n) * max(k) * (max(k) + 1) * (max(k) + 1))
                 > 0 THEN
         round((max(k) - 1)::DOUBLE * sum(dev2)::DOUBLE
               / (max(sr22)
                  - max(n) * max(k) * (max(k) + 1) * (max(k) + 1))::DOUBLE, 6)
       END AS friedman_q
FROM stat
"""


def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily revenue (new round 6):
    S over all day pairs, tie-corrected variance, continuity-corrected
    z — alert on MK, size on `theil_sen_trend`
    (`operators/timeseries.mann_kendall_trend`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.mann_kendall_trend(load_table(spark, sf_dir, "events"))


def o_mann_kendall_trend() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
s AS (SELECT CAST(sum(CAST(sign(b.cents - a.cents) AS BIGINT)) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM daily a JOIN daily b ON a.di < b.di),
ties AS (SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
                CAST(sum(t) AS BIGINT) AS n_days
         FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily
               GROUP BY cents))
SELECT n_days, n_pairs, s AS mk_s,
       CASE WHEN (n_days::DOUBLE * (n_days::DOUBLE - 1.0)
                  * (2.0 * n_days::DOUBLE + 5.0)
                  - tie_term::DOUBLE) / 18.0 > 0 THEN
         round(CASE WHEN s > 0 THEN
                 (s::DOUBLE - 1.0)
                 / sqrt((n_days::DOUBLE * (n_days::DOUBLE - 1.0)
                         * (2.0 * n_days::DOUBLE + 5.0)
                         - tie_term::DOUBLE) / 18.0)
               WHEN s < 0 THEN
                 (s::DOUBLE + 1.0)
                 / sqrt((n_days::DOUBLE * (n_days::DOUBLE - 1.0)
                         * (2.0 * n_days::DOUBLE + 5.0)
                         - tie_term::DOUBLE) / 18.0)
               ELSE 0.0 END, 6) END AS z
FROM s CROSS JOIN ties
"""


def q_nb_class_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 for the NB gate (new round 6):
    the routing numbers derived from the same engine-portable argmax
    as the confusion matrix (`operators/curation.nb_class_f1`)."""
    docs = load_table(spark, sf_dir, "documents")
    return CU.nb_class_f1(docs, (F.col("doc_id") % 2) == 0)


def o_nb_class_f1() -> str:
    return f"""
WITH t AS (SELECT doc_id, lang, {O.sql_tokens('text')} AS w,
                  doc_id % 2 = 0 AS is_tr FROM documents),
tok AS (SELECT doc_id, lang, is_tr, unnest(w) AS tok FROM t),
tr AS (SELECT * FROM tok WHERE is_tr),
te AS (SELECT * FROM tok WHERE NOT is_tr),
cond AS (SELECT lang AS cls, tok, CAST(count(*) AS BIGINT) AS c_tc
         FROM tr GROUP BY 1, 2),
clstok AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS tok_c
           FROM tr GROUP BY 1),
vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS V FROM tr),
ndocs AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS N FROM ndocs),
classes0 AS (
  SELECT cls, ln(n_docs::DOUBLE / N::DOUBLE) AS prior_ln, tok_c + V AS denom
  FROM ndocs JOIN clstok USING (cls) CROSS JOIN vocab CROSS JOIN tot
),
sc AS (
  SELECT te.doc_id, te.lang, c.cls,
         round(c.prior_ln
               + sum(ln((coalesce(cond.c_tc, 0) + 1)::DOUBLE
                        / c.denom::DOUBLE)), 6) AS score
  FROM te CROSS JOIN classes0 c
  LEFT JOIN cond ON cond.cls = c.cls AND cond.tok = te.tok
  GROUP BY 1, 2, 3, c.prior_ln
),
pred AS (SELECT lang AS actual, cls AS pred FROM (
           SELECT doc_id, lang, cls,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cls ASC) AS rn
           FROM sc) WHERE rn = 1),
classes AS (SELECT DISTINCT cls FROM (
              SELECT actual AS cls FROM pred
              UNION ALL SELECT pred FROM pred)),
by_actual AS (SELECT actual AS cls, CAST(count(*) AS BIGINT) AS n_actual,
                     CAST(sum(CASE WHEN pred = actual THEN 1 ELSE 0 END)
                          AS BIGINT) AS tp
              FROM pred GROUP BY 1),
by_pred AS (SELECT pred AS cls, CAST(count(*) AS BIGINT) AS n_pred
            FROM pred GROUP BY 1)
SELECT c.cls,
       coalesce(n_actual, 0) AS n_actual,
       coalesce(n_pred, 0) AS n_pred,
       coalesce(tp, 0) AS tp,
       CASE WHEN coalesce(n_pred, 0) > 0 THEN
         round(coalesce(tp, 0)::DOUBLE / n_pred::DOUBLE, 6) END AS precision,
       CASE WHEN coalesce(n_actual, 0) > 0 THEN
         round(coalesce(tp, 0)::DOUBLE / n_actual::DOUBLE, 6) END AS recall,
       CASE WHEN coalesce(n_pred, 0) + coalesce(n_actual, 0) > 0 THEN
         round(2.0 * coalesce(tp, 0)::DOUBLE
               / (coalesce(n_pred, 0) + coalesce(n_actual, 0))::DOUBLE, 6)
       END AS f1
FROM classes c
LEFT JOIN by_actual ba ON ba.cls = c.cls
LEFT JOIN by_pred bp ON bp.cls = c.cls
"""


def q_wilcoxon_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank of daily revenue vs the same weekday one
    week back (new round 6): the PAIRED rank test — zero diffs drop,
    doubled midranks of |d| keep W2+ and the tie-corrected variance
    exact int64 (`operators/timeseries.wilcoxon_week_over_week`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.wilcoxon_week_over_week(load_table(spark, sf_dir, "events"))


def o_wilcoxon_week_over_week() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
diffs AS (SELECT abs(a.cents - b.cents) AS ad,
                 CASE WHEN a.cents - b.cents > 0 THEN 1 ELSE 0 END AS pos
          FROM daily a JOIN daily b ON a.di = b.di + 7
          WHERE a.cents != b.cents),
gv AS (SELECT ad, CAST(count(*) AS BIGINT) AS t,
              CAST(sum(pos) AS BIGINT) AS tp
       FROM diffs GROUP BY 1),
mid AS (SELECT ad, t, tp,
               CAST(2 * (sum(t) OVER (ORDER BY ad ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t)
                    + t + 1 AS BIGINT) AS mr2
        FROM gv),
agg AS (SELECT CAST(sum(t) AS BIGINT) AS n,
               CAST(sum(tp * mr2) AS BIGINT) AS w2p,
               CAST(sum(t * t * t - t) AS BIGINT) AS tie3
        FROM mid)
SELECT n AS n_nonzero_pairs, w2p AS w2_plus,
       CASE WHEN n > 0
                 AND (n::DOUBLE * (n::DOUBLE + 1.0)
                      * (2.0 * n::DOUBLE + 1.0) / 6.0
                      - tie3::DOUBLE / 12.0) > 0 THEN
         round((w2p::DOUBLE - n::DOUBLE * (n::DOUBLE + 1.0) / 2.0)
               / sqrt(n::DOUBLE * (n::DOUBLE + 1.0)
                      * (2.0 * n::DOUBLE + 1.0) / 6.0
                      - tie3::DOUBLE / 12.0), 6) END AS z
FROM agg
"""


def q_chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 unseen-vocabulary estimate + Good-Turing coverage (new
    round 6): the "is more data worth crawling" number from the
    singleton/doubleton counts
    (`operators/textops.chao1_vocab_richness`)."""
    return TX.chao1_vocab_richness(load_table(spark, sf_dir, "documents"))


def o_chao1_vocab_richness() -> str:
    return f"""
WITH freq AS (SELECT w, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT unnest({O.sql_tokens('text')}) AS w
                    FROM documents)
              GROUP BY 1),
agg AS (SELECT CAST(count(*) AS BIGINT) AS vocab,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        FROM freq)
SELECT n_tokens, vocab, f1, f2,
       round(vocab::DOUBLE
             + f1::DOUBLE * (f1::DOUBLE - 1.0)
               / (2.0 * (f2::DOUBLE + 1.0)), 6) AS chao1,
       CASE WHEN n_tokens > 0 THEN
         round(1.0 - f1::DOUBLE / n_tokens::DOUBLE, 6) END AS coverage
FROM agg
"""


UNIMAX_BUDGET = 100_000  # mixed capped/uncapped regime at the oracle SFs


def q_unimax_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget allocation (new round 4): spread a 100k-token budget
    uniformly across sources with a 4-epoch cap — the water-filling loop
    collapsed to its closed form (capped set = ascending-size prefix),
    so it's two window passes over the per-source aggregate
    (`operators/curation.unimax_epochs`)."""
    return CU.unimax_epochs(
        load_table(spark, sf_dir, "documents"), budget=UNIMAX_BUDGET, max_epochs=4
    )


def o_unimax_epochs(budget: int = UNIMAX_BUDGET, max_epochs: int = 4) -> str:
    # same closed form: j/cum_before/n_src from windows, fair share as a
    # division of exact integers (identical IEEE doubles), the prefix
    # boundary compared on the share ROUNDED at 6 on both sides
    return f"""
WITH s AS (
  SELECT source,
         CAST(sum(len({O.sql_tokens('text')})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
r AS (
  SELECT source, n_tokens,
         CAST({max_epochs} * n_tokens AS BIGINT) AS cap_tokens,
         CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS j,
         CAST(sum({max_epochs} * n_tokens) OVER (ORDER BY n_tokens, source
              ROWS UNBOUNDED PRECEDING) - {max_epochs} * n_tokens AS BIGINT)
           AS cum_before,
         CAST(count(*) OVER () AS BIGINT) AS n_src
  FROM s
),
f AS (
  SELECT *, ({budget} - cum_before)::DOUBLE / (n_src - j + 1)::DOUBLE AS fair,
         cap_tokens::DOUBLE >= round(({budget} - cum_before)::DOUBLE
                                     / (n_src - j + 1)::DOUBLE, 6) AS uncapped
  FROM r
),
t1 AS (
  SELECT *, min(CASE WHEN uncapped THEN j END) OVER () AS t_pos FROM f
),
t AS (
  SELECT *, max(CASE WHEN j = t_pos THEN fair END) OVER () AS fair_t FROM t1
)
SELECT source, n_tokens,
       round(CASE WHEN t_pos IS NULL OR j < t_pos
                  THEN cap_tokens::DOUBLE ELSE fair_t END, 6) AS alloc_tokens,
       round((CASE WHEN t_pos IS NULL OR j < t_pos
                   THEN cap_tokens::DOUBLE ELSE fair_t END)
             / n_tokens::DOUBLE, 6) AS epochs,
       CAST(t_pos IS NULL OR j < t_pos AS INT) AS capped
FROM t
"""


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified rerank (new round 4): greedy top-5 from the
    relevance top-20 maximizing `0.7*rel - 0.3*max_sim_to_selected` —
    the query-time diversity pass between retrieval and the context
    window (`operators/search.mmr_rerank`). Every selection boundary is
    on ROUNDED scores with id tie-break, so the greedy path is
    engine-portable step by step."""
    return S.mmr_rerank(_emb(spark, sf_dir), FX.QUERY_VEC, k=5, shortlist=20)


def o_mmr_rerank(k: int = 5, shortlist: int = 20, lam: float = 0.7) -> str:
    qv = O.sql_qvec("embedding")
    rel = O.sql_cosine_int8_lit(FX.QUERY_VEC, "qv")
    sym = (
        "(list_aggregate(list_transform(a.qv, (x, i) -> x::BIGINT * b.qv[i]::BIGINT), 'sum')::DOUBLE"
        " / (sqrt(list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)"
        " * sqrt(list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)))"
    )
    lam_l = f"{float(lam)!r}::DOUBLE"
    inv_l = f"{float(1.0 - lam)!r}::DOUBLE"
    ctes = [
        f"base AS (SELECT vec_id, {qv} AS qv FROM embeddings)",
        f"""short AS (
  SELECT vec_id, qv, round({rel}, 9) AS rel FROM base
  ORDER BY round({rel}, 9) DESC, vec_id ASC LIMIT {shortlist})""",
        f"""p AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, round({sym}, 9) AS sim
  FROM short a JOIN short b ON a.vec_id != b.vec_id)""",
        f"""s1 AS (
  SELECT 1 AS rank, vec_id, rel, round({lam_l} * rel, 6) AS mmr_score
  FROM short ORDER BY round({lam_l} * rel, 6) DESC, vec_id ASC LIMIT 1)""",
        "sel1 AS (SELECT * FROM s1)",
    ]
    for r in range(2, k + 1):
        ctes.append(
            f"""s{r} AS (
  SELECT {r} AS rank, c.vec_id, c.rel,
         round({lam_l} * c.rel - {inv_l} * (
           SELECT max(p.sim) FROM p
           WHERE p.ia = c.vec_id
             AND p.ib IN (SELECT vec_id FROM sel{r - 1})), 6) AS mmr_score
  FROM short c
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
  ORDER BY mmr_score DESC, vec_id ASC LIMIT 1)"""
        )
        ctes.append(
            f"sel{r} AS (SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM s{r})"
        )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT CAST(rank AS INT) AS rank, vec_id, rel, mmr_score FROM sel{k}
"""


def q_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall curve (new round 4): recall@{1,5,10,20} of the
    production trained IVF+PQ configuration (nprobe=6, rerank=100)
    against the exact float-cosine ground truth — the index-quality
    report behind the nprobe/rerank knobs, as a registered query
    (`operators/search.ann_recall_curve`)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = S.ann_ivf_pq_search(
        emb,
        FX.QUERY_VEC,
        FT.CENTROIDS_TRAINED,
        FT.PQ_CODEBOOKS_TRAINED,
        k=20,
        nprobe=6,
        rerank=100,
    )
    return S.ann_recall_curve(emb, ann, FX.QUERY_VEC, ks=(1, 5, 10, 20))


def o_ann_recall_curve() -> str:
    ann = _o_ann_ivf_pq(
        FT.CENTROIDS_TRAINED, FT.PQ_CODEBOOKS_TRAINED, nprobe=6, k=20
    ).strip()
    cos = O.sql_cosine_float_lit(FX.QUERY_VEC, "embedding")
    return f"""
WITH ann AS ({ann}),
ar AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY score DESC, vec_id ASC) AS ann_rank
  FROM ann
),
ex AS (
  SELECT vec_id, round({cos}, 9) AS r9 FROM embeddings
  ORDER BY r9 DESC, vec_id ASC LIMIT 20
),
er AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY r9 DESC, vec_id ASC) AS exact_rank
  FROM ex
),
j AS (SELECT ar.vec_id, ann_rank, exact_rank FROM ar JOIN er USING (vec_id)),
ks AS (SELECT unnest([1, 5, 10, 20]) AS k)
SELECT CAST(k AS INT) AS k,
       CAST((SELECT count(*) FROM j
             WHERE ann_rank <= ks.k AND exact_rank <= ks.k) AS BIGINT)
         AS n_overlap,
       round((SELECT count(*) FROM j
              WHERE ann_rank <= ks.k AND exact_rank <= ks.k)::DOUBLE
             / k::DOUBLE, 6) AS recall
FROM ks
"""


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity / l-diversity audit (new round 4): per event_type,
    how many (type, hour-of-day, value-bucket) quasi-identifier classes
    hold <5 rows or <3 distinct users — the re-identification-risk gate
    before exporting behavioral data
    (`operators/validate.k_anonymity_report`)."""
    from pythonvectordb_spark.operators import validate as V

    return V.k_anonymity_report(load_table(spark, sf_dir, "events"), k=5, l_div=3)


def o_k_anonymity(k: int = 5, l_div: int = 3) -> str:
    return f"""
WITH classes AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) % 24 AS BIGINT) AS hod,
         CAST(floor(value / 100) AS BIGINT) AS vbucket,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(coalesce(sum(CASE WHEN n_rows < {k} THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_risky_classes,
       CAST(coalesce(sum(CASE WHEN n_rows < {k} THEN n_rows ELSE 0 END), 0) AS BIGINT)
         AS n_risky_rows,
       CAST(coalesce(sum(CASE WHEN n_users < {l_div} THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_low_diversity,
       round(coalesce(sum(CASE WHEN n_rows < {k} THEN n_rows ELSE 0 END), 0)::DOUBLE
             / sum(n_rows)::DOUBLE, 6) AS risky_row_share
FROM classes GROUP BY 1
"""


def q_resolve_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-survivorship dedup resolution (new round 4): each >=0.8
    Jaccard near-dup component keeps its HIGHEST-quality copy (9-dp
    rounded `text_quality` score, id tie-break) instead of the
    smallest-id copy — the survivorship policy production dedup actually
    wants (`operators/dedup.resolve_keep_best`)."""
    docs = load_table(spark, sf_dir, "documents")
    quality = TX.text_quality(docs).select("doc_id", "quality_score")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.8, max_df=NGRAM_MAX_DF)
    return DD.resolve_keep_best(quality, pairs)


def o_resolve_keep_best() -> str:
    # closure oracle (the o_dedup_resolve pattern) + the verified
    # text_quality score wrapped as a derived table (WRAP pattern)
    quality_body = o_text_quality().strip()
    return f"""
WITH RECURSIVE {_SH_CTE},
{_EDGES_SQL},
sym(a, b) AS (SELECT id_a, id_b FROM edges UNION SELECT id_b, id_a FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a),
q AS (SELECT doc_id, quality_score FROM ({quality_body}) t),
j AS (
  SELECT q.doc_id, coalesce(comp.component, q.doc_id) AS component,
         q.quality_score
  FROM q LEFT JOIN comp ON q.doc_id = comp.doc_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY component
                               ORDER BY quality_score DESC, doc_id ASC) AS rn
  FROM j
)
SELECT doc_id, component, quality_score, (rn = 1) AS is_survivor FROM r
"""


def q_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap curve (new round 4): top-weighted agreement
    between the BM25 lexical top-20 and the int8-cosine knn top-20
    (p=0.9, geometric weights embedded as literals on both engines) —
    the retriever-agreement diagnostic behind `hybrid_rrf_search`'s
    fusion (`operators/search.rbo_curve`)."""
    bm25 = q_bm25_rank(spark, sf_dir)  # (doc_id, bm25) top-20, rounded
    knn = S.knn_search(_emb(spark, sf_dir), FX.QUERY_VEC, k=20, round_to=9).select(
        F.col("vec_id").alias("doc_id"), F.col("score")
    )
    return S.rbo_curve(bm25, knn, "doc_id", "bm25", "score", depth=20, p=0.9)


def o_rbo_overlap(depth: int = 20, p: float = 0.9) -> str:
    qv = O.sql_qvec("embedding")
    weights = [(d, (1.0 - p) * p ** (d - 1)) for d in range(1, depth + 1)]
    dw_rows = ", ".join(f"({d}, {w!r}::DOUBLE)" for d, w in weights)
    return f"""
WITH bm AS ({o_bm25_rank()}),
knn AS (
  SELECT vec_id AS doc_id, round({O.sql_cosine_int8_lit(FX.QUERY_VEC, 'qvec')}, 9) AS score
  FROM (SELECT vec_id, {qv} AS qvec FROM embeddings) q
  ORDER BY score DESC, doc_id ASC LIMIT 20
),
ra AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_a FROM bm),
rb AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank_b FROM knn),
j AS (SELECT ra.doc_id, rank_a, rank_b FROM ra JOIN rb USING (doc_id)),
dw(d, w) AS (VALUES {dw_rows}),
per AS (
  SELECT d, w,
         (SELECT count(*) FROM j WHERE rank_a <= dw.d AND rank_b <= dw.d)
           AS n_overlap
  FROM dw
)
SELECT CAST(d AS INT) AS d,
       CAST(n_overlap AS BIGINT) AS n_overlap,
       round(n_overlap::DOUBLE / d::DOUBLE, 6) AS agreement,
       round(sum(w * (n_overlap::DOUBLE / d::DOUBLE))
               OVER (ORDER BY d ROWS UNBOUNDED PRECEDING), 6) AS rbo_cum
FROM per
"""


def q_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out n-gram coverage (new round 4): per val/test doc, the
    share of its 3-gram shingles that also occur anywhere in the train
    split — the soft-memorization eval audit `split_leakage`'s pair
    report can't see (`operators/curation.ngram_coverage`)."""
    return CU.ngram_coverage(load_table(spark, sf_dir, "documents"), n=3)


def o_ngram_coverage() -> str:
    from pythonvectordb_spark.operators.curation import SPLIT_BOUNDS, SPLIT_LAST

    u = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    case = (
        "CASE "
        + " ".join(f"WHEN {u} < {b} THEN '{name}'" for name, b in SPLIT_BOUNDS)
        + f" ELSE '{SPLIT_LAST}' END"
    )
    return f"""
WITH {_SH_CTE},
sp AS (SELECT doc_id, {case} AS split FROM documents),
base AS (SELECT sh.doc_id, sp.split, sh.sh FROM sh JOIN sp USING (doc_id)),
ex AS (SELECT doc_id, split, unnest(sh) AS g FROM base),
vocab AS (SELECT DISTINCT g FROM ex WHERE split = 'train'),
cov AS (
  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_covered
  FROM ex e JOIN vocab v USING (g)
  WHERE e.split != 'train' GROUP BY 1
),
per AS (
  SELECT doc_id, split, CAST(len(sh) AS BIGINT) AS n_shingles
  FROM base WHERE split != 'train'
)
SELECT per.doc_id, per.split, per.n_shingles,
       CAST(coalesce(cov.n_covered, 0) AS BIGINT) AS n_covered,
       round(CASE WHEN per.n_shingles > 0
                  THEN coalesce(cov.n_covered, 0)::DOUBLE
                       / per.n_shingles::DOUBLE
                  ELSE 0.0 END, 6) AS coverage
FROM per LEFT JOIN cov ON per.doc_id = cov.doc_id
"""


def q_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold knob report (new round 4): pair and affected-doc
    counts at thresholds 0.5-0.9, computed from ONE low-threshold
    n-gram Jaccard pair report instead of five dedup runs
    (`operators/dedup.dedup_threshold_curve`)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.5, max_df=NGRAM_MAX_DF)
    return DD.dedup_threshold_curve(pairs)


def o_dedup_threshold_curve(thresholds=(0.5, 0.6, 0.7, 0.8, 0.9)) -> str:
    th_rows = ", ".join(f"({float(t)!r}::DOUBLE)" for t in thresholds)
    return f"""
WITH {_SH_CTE},
{_SH_KEPT_CTE.strip()},
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.shv, b.shv))::BIGINT AS n_common,
         len(a.sh)::BIGINT AS n_a, len(b.sh)::BIGINT AS n_b
  FROM shk a JOIN shk b ON a.doc_id < b.doc_id
),
pj AS (
  SELECT id_a, id_b, round({_JACCARD}, 9) AS j
  FROM cand WHERE {_JACCARD} >= 0.5
),
th(t) AS (VALUES {th_rows})
SELECT round(t, 2) AS threshold,
       CAST((SELECT count(*) FROM pj WHERE j >= th.t) AS BIGINT) AS n_pairs,
       CAST((SELECT count(DISTINCT d)
             FROM (SELECT unnest([id_a, id_b]) AS d, j FROM pj) u
             WHERE u.j >= th.t) AS BIGINT) AS n_docs_affected
FROM th
"""


def q_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration (new round 4): per exact >=0.5
    Jaccard pair, the 48-hash signature-agreement estimate next to the
    exact value — the how-many-hashes report; the estimator's
    "randomness" is the deterministic two-hash family, so even its
    errors hash-match an independent SQL replay
    (`operators/dedup.minhash_estimate_error`)."""
    return DD.minhash_estimate_error(
        load_table(spark, sf_dir, "documents"),
        n=3,
        num_hashes=48,
        base_threshold=0.5,
        max_df=NGRAM_MAX_DF,
    )


def o_minhash_estimate_error(num_hashes: int = 48) -> str:
    from pythonvectordb_spark.functions.text import MINHASH_P, minhash_params

    params = minhash_params(num_hashes)
    sigs = ", ".join(
        f"min(({a}::BIGINT * h1 + {b}::BIGINT * h2) % {MINHASH_P}::BIGINT) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    eq = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )
    return f"""
WITH {_SH_CTE},
{_SH_KEPT_CTE.strip()},
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.shv, b.shv))::BIGINT AS n_common,
         len(a.sh)::BIGINT AS n_a, len(b.sh)::BIGINT AS n_b
  FROM shk a JOIN shk b ON a.doc_id < b.doc_id
),
pj AS (
  SELECT id_a, id_b, round({_JACCARD}, 9) AS exact_jaccard
  FROM cand WHERE {_JACCARD} >= 0.5
),
hashed AS (SELECT doc_id,
                  ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h1,
                  ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS h2
           FROM (SELECT doc_id, unnest(sh) AS shingle FROM sh) i),
sig AS (SELECT doc_id, {sigs} FROM hashed GROUP BY doc_id)
SELECT pj.id_a, pj.id_b, pj.exact_jaccard,
       round(({eq})::DOUBLE / {float(num_hashes)!r}, 6) AS minhash_est,
       round(abs(({eq})::DOUBLE / {float(num_hashes)!r} - pj.exact_jaccard), 6)
         AS abs_error
FROM pj JOIN sig sa ON pj.id_a = sa.doc_id JOIN sig sb ON pj.id_b = sb.doc_id
"""


def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal stratified-sampling allocation (staged for the
    round-5 driver rotation — the front-50 is full): a 1000-row budget
    split across event-type strata by N_h*S_h, the minimum-variance
    allocation for estimating the population mean
    (`operators/curation.neyman_allocation`). Exact-integer-cents
    moments, deterministic sqrt, left-assoc sorted fold for the
    normalizing total."""
    return CU.neyman_allocation(load_table(spark, sf_dir, "events"), budget=1000)


def o_neyman_allocation(budget: int = 1000) -> str:
    return f"""
WITH g AS (
  SELECT event_type AS stratum,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sumsq_c
  FROM events GROUP BY 1
),
w AS (
  SELECT stratum, n_rows,
         sqrt(greatest(sumsq_c::DOUBLE / n_rows::DOUBLE
              - (sum_c::DOUBLE / n_rows::DOUBLE)
                * (sum_c::DOUBLE / n_rows::DOUBLE), 0.0)) / 100.0 AS std,
         n_rows::DOUBLE
           * (sqrt(greatest(sumsq_c::DOUBLE / n_rows::DOUBLE
                  - (sum_c::DOUBLE / n_rows::DOUBLE)
                    * (sum_c::DOUBLE / n_rows::DOUBLE), 0.0)) / 100.0) AS wt
  FROM g
),
t AS (
  SELECT list_aggregate(list(wt ORDER BY stratum), 'sum') AS T FROM w
)
SELECT stratum, n_rows, round(std, 6) AS value_std,
       round({float(budget)!r} * wt / T, 6) AS neyman_alloc,
       CAST(floor({float(budget)!r} * wt / T) AS BIGINT) AS alloc_n
FROM w CROSS JOIN t
"""


def q_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram entropy (staged for the round-5 rotation):
    the corpus-card diversity scalar plus its ln(vocab)-normalized
    form — low entropy flags template-dominated sources whose token
    counts overstate their diversity
    (`operators/curation.source_entropy`)."""
    return CU.source_entropy(load_table(spark, sf_dir, "documents"))


def o_source_entropy() -> str:
    return f"""
WITH tok AS (SELECT source, unnest({O.sql_tokens('text')}) AS tok FROM documents),
counts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
g AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_vocab,
         sum(c::DOUBLE * ln(c::DOUBLE)) AS s_clnc
  FROM counts GROUP BY 1
)
SELECT source, n_tokens, n_vocab,
       round(ln(n_tokens::DOUBLE) - s_clnc / n_tokens::DOUBLE, 6) AS entropy,
       round(CASE WHEN n_vocab > 1
                  THEN (ln(n_tokens::DOUBLE) - s_clnc / n_tokens::DOUBLE)
                       / ln(n_vocab::DOUBLE)
                  ELSE 0.0 END, 6) AS norm_entropy
FROM g
"""


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift audit (staged for the round-5 rotation):
    per label, the cosine between the int8 centroids of the even-id and
    odd-id halves — the representation-level companion to the PSI
    monitor; exact-integer component sums make it fold-order-free
    (`operators/stats.embedding_drift`)."""
    return ST.embedding_drift(_emb(spark, sf_dir), dim=DIM)


def o_embedding_drift(dim: int = DIM) -> str:
    qv = O.sql_qvec("embedding")
    a = ", ".join(
        f"CAST(sum(CASE WHEN vec_id % 2 = 0 THEN qv[{i + 1}] ELSE 0 END) AS BIGINT) AS a{i}"
        for i in range(dim)
    )
    b = ", ".join(
        f"CAST(sum(CASE WHEN vec_id % 2 != 0 THEN qv[{i + 1}] ELSE 0 END) AS BIGINT) AS b{i}"
        for i in range(dim)
    )
    dot = " + ".join(f"a{i} * b{i}" for i in range(dim))
    na = " + ".join(f"a{i} * a{i}" for i in range(dim))
    nb = " + ".join(f"b{i} * b{i}" for i in range(dim))
    return f"""
WITH q AS (SELECT vec_id, label, {qv} AS qv FROM embeddings),
g AS (
  SELECT label,
         CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN vec_id % 2 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         {a}, {b}
  FROM q GROUP BY 1
)
SELECT label, n_a, n_b,
       round(CASE WHEN ({na}) > 0 AND ({nb}) > 0
                  THEN ({dot})::DOUBLE / (sqrt(({na})::DOUBLE) * sqrt(({nb})::DOUBLE))
                  ELSE 0.0 END, 9) AS centroid_cosine
FROM g
"""


def q_dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-graph density audit (staged for the round-5 rotation): per
    document in the >=0.8 MinHash pair graph, its degree, triangle
    count, and local clustering coefficient — triangle-rich = genuine
    dup group, star/chain = transitive-merge risk
    (`operators/graph.pair_graph_triangles`)."""
    from pythonvectordb_spark.operators.graph import pair_graph_triangles

    docs = load_table(spark, sf_dir, "documents")
    return pair_graph_triangles(DD.minhash_lsh_pairs(docs, threshold=0.8))


def o_dedup_graph_triangles() -> str:
    return f"""
WITH p AS MATERIALIZED (SELECT id_a, id_b FROM ({o_dedup_minhash_lsh()})),
tri AS (
  SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
  FROM p e1
  JOIN p e2 ON e1.id_b = e2.id_a
  WHERE EXISTS (SELECT 1 FROM p e3
                WHERE e3.id_a = e1.id_a AND e3.id_b = e2.id_b)
),
tn AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
  FROM (SELECT unnest([x, y, z]) AS node FROM tri) u GROUP BY 1
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT unnest([id_a, id_b]) AS node FROM p) u GROUP BY 1
)
SELECT deg.node, deg.degree,
       CAST(coalesce(tn.n_triangles, 0) AS BIGINT) AS n_triangles,
       round(CASE WHEN deg.degree >= 2
                  THEN 2.0 * coalesce(tn.n_triangles, 0)::DOUBLE
                       / (deg.degree::DOUBLE * (deg.degree::DOUBLE - 1.0))
                  ELSE 0.0 END, 6) AS clustering_coeff
FROM deg LEFT JOIN tn ON deg.node = tn.node
"""


def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth (staged for the round-5 rotation):
    cumulative vocab vs cumulative tokens over ten doc_id-range
    prefixes plus the OLS fit of ln V on ln N — beta ≈ 0.4–0.6 on
    natural text; the growth-dynamics companion to `zipf_fit`'s static
    rank curve (`operators/textops.heaps_law`)."""
    return TX.heaps_law(load_table(spark, sf_dir, "documents"))


def o_heaps_law(n_points: int = 10) -> str:
    # integer bucket boundaries ((id-lo)*k // span), exact-integer
    # cumulative counts, ln's of exact integers; OLS moments follow the
    # zipf_fit discipline (single-group sums, ROUND 6 after the
    # closed-form, intercept from the ROUNDED slope)
    return f"""
WITH b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
tok AS (
  SELECT least({n_points - 1}, ((d.doc_id - b.lo) * {n_points}) // (b.hi - b.lo + 1)) AS bucket,
         unnest({O.sql_tokens('text')}) AS token
  FROM documents d CROSS JOIN b
),
pb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS toks FROM tok GROUP BY 1),
fs AS (SELECT min(bucket) AS bucket FROM tok GROUP BY token),
vb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS vnew FROM fs GROUP BY 1),
curve AS (
  SELECT pb.bucket,
         CAST(sum(pb.toks) OVER (ORDER BY pb.bucket) AS BIGINT) AS cum_tokens,
         CAST(sum(coalesce(vb.vnew, 0)) OVER (ORDER BY pb.bucket) AS BIGINT) AS cum_vocab
  FROM pb LEFT JOIN vb ON pb.bucket = vb.bucket
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM (SELECT ln(cum_tokens::DOUBLE) AS x, ln(cum_vocab::DOUBLE) AS y FROM curve)
),
s AS (SELECT n, sx, sy,
             round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta
      FROM m),
f AS (SELECT beta, round((sy - beta * sx) / n, 6) AS ln_k FROM s)
SELECT curve.bucket, curve.cum_tokens, curve.cum_vocab, f.beta, f.ln_k
FROM curve CROSS JOIN f
"""


def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing / Chao1 coverage per source (staged for the round-5
    rotation): singleton mass n1/N = P(next token unseen) and the
    bias-corrected Chao1 true-vocabulary estimate — which sources the
    crawl has saturated (`operators/textops.good_turing`)."""
    return TX.good_turing(load_table(spark, sf_dir, "documents"))


def o_good_turing() -> str:
    return f"""
WITH tok AS (SELECT source, unnest({O.sql_tokens('text')}) AS tok FROM documents),
counts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
g AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_vocab,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM counts GROUP BY 1
)
SELECT source, n_tokens, n_vocab, n1, n2,
       round(n1::DOUBLE / n_tokens::DOUBLE, 9) AS p_unseen,
       round(n_vocab::DOUBLE
             + n1::DOUBLE * (n1::DOUBLE - 1.0) / (2.0 * (n2::DOUBLE + 1.0)),
             6) AS chao1_vocab
FROM g
"""


def q_truncation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length utilization at max_len=32 (staged for the
    round-5 rotation): per source, tokens lost to truncation and
    wasted on padding under one-doc-one-row training — the decision
    input for max_len and for routing long sources through
    chunk/pack instead (`operators/textops.truncation_stats`)."""
    return TX.truncation_stats(load_table(spark, sf_dir, "documents"), max_len=32)


def o_truncation_stats(max_len: int = 32) -> str:
    return f"""
WITH base AS (
  SELECT source,
         CAST(len({O.sql_tokens('text')}) AS BIGINT) AS n
  FROM documents
),
b2 AS (SELECT source, n, least(n, {max_len}) AS kept FROM base),
g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN n > {max_len} THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
         CAST(sum(n) AS BIGINT) AS total_tokens,
         CAST(sum(kept) AS BIGINT) AS kept_tokens,
         CAST(sum(n - kept) AS BIGINT) AS lost_tokens,
         CAST(sum({max_len} - kept) AS BIGINT) AS pad_tokens
  FROM b2 GROUP BY 1
)
SELECT source, n_docs, n_truncated, total_tokens, kept_tokens, lost_tokens,
       pad_tokens,
       round(kept_tokens::DOUBLE / (n_docs::DOUBLE * {float(max_len)!r}), 9) AS utilization,
       round(n_truncated::DOUBLE / n_docs::DOUBLE, 9) AS trunc_rate
FROM g
"""


def q_source_kl_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise smoothed unigram KL between sources (staged for the
    round-5 rotation): the domain-distance matrix behind mixing
    decisions — distributional redundancy even without literal copies
    (`operators/curation.source_kl_matrix`)."""
    return CU.source_kl_matrix(load_table(spark, sf_dir, "documents"))


def o_source_kl_matrix() -> str:
    # KL factored so every ln is of an exact integer and the only float
    # fold is the grouped sum (ROUND 6 after the closed-form): with
    # P_s(w) = (c_s+1)/(N_s+V),
    # KL(s||t) = sum((c_s+1)(ln(c_s+1)-ln(c_t+1)))/(N_s+V) + ln(N_t+V) - ln(N_s+V)
    return f"""
WITH tok AS (SELECT source, unnest({O.sql_tokens('text')}) AS tok FROM documents),
counts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tok FROM counts GROUP BY 1),
vocab AS (SELECT DISTINCT tok FROM counts),
vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
grid AS (
  SELECT v.tok, t.source, t.n_tok,
         CAST(coalesce(c.c, 0) + 1 AS BIGINT) AS c1
  FROM vocab v CROSS JOIN totals t
  LEFT JOIN counts c ON c.source = t.source AND c.tok = v.tok
),
p AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.n_tok AS n_a, b.n_tok AS n_b,
         sum(a.c1::DOUBLE * (ln(a.c1::DOUBLE) - ln(b.c1::DOUBLE))) AS s_term
  FROM grid a JOIN grid b ON a.tok = b.tok AND a.source != b.source
  GROUP BY 1, 2, 3, 4
)
SELECT source_a, source_b, n_a, n_b,
       round(s_term / (n_a + vs.v)::DOUBLE
             + ln((n_b + vs.v)::DOUBLE) - ln((n_a + vs.v)::DOUBLE), 6) AS kl_ab
FROM p CROSS JOIN vs
"""


def q_source_lang_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source×language mutual information (staged for the round-5
    rotation): is language balance a per-source property? High NMI
    means language filtering silently reweights sources, so stratified
    sampling needs the joint key
    (`operators/curation.source_lang_mi`)."""
    return CU.source_lang_mi(load_table(spark, sf_dir, "documents"))


def o_source_lang_mi() -> str:
    return """
WITH cell AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
              FROM documents GROUP BY 1, 2),
cs AS (SELECT source, CAST(sum(c) AS BIGINT) AS c_s FROM cell GROUP BY 1),
cl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS c_l FROM cell GROUP BY 1),
n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
mi AS (
  SELECT round(sum((cell.c::DOUBLE / n.n::DOUBLE)
               * (ln(n.n::DOUBLE * cell.c::DOUBLE)
                  - ln(cs.c_s::DOUBLE * cl.c_l::DOUBLE))), 6) AS mi
  FROM cell JOIN cs USING (source) JOIN cl USING (lang) CROSS JOIN n
),
hs AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
              sum(c_s::DOUBLE * ln(c_s::DOUBLE)) AS t_s FROM cs),
hl AS (SELECT CAST(count(*) AS BIGINT) AS n_langs,
              sum(c_l::DOUBLE * ln(c_l::DOUBLE)) AS t_l FROM cl),
o AS (
  SELECT n.n AS n_docs, hs.n_sources, hl.n_langs,
         round(ln(n.n::DOUBLE) - hs.t_s / n.n::DOUBLE, 6) AS h_source,
         round(ln(n.n::DOUBLE) - hl.t_l / n.n::DOUBLE, 6) AS h_lang,
         mi.mi
  FROM n CROSS JOIN hs CROSS JOIN hl CROSS JOIN mi
)
SELECT n_docs, n_sources, n_langs, h_source, h_lang, mi,
       round(CASE WHEN h_source > 0 AND h_lang > 0
                  THEN mi / sqrt(h_source * h_lang) ELSE 0.0 END, 6) AS nmi
FROM o
"""


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations (staged for the round-5 rotation):
    adjacent-pair pointwise mutual information with a min-count floor —
    phrase mining / template detection; the association-score companion
    to `bpe_merge_pairs`' raw pair frequency
    (`operators/textops.pmi_collocations`)."""
    return TX.pmi_collocations(load_table(spark, sf_dir, "documents"))


def o_pmi_collocations(min_count: int = 5, top_n: int = 20) -> str:
    return f"""
WITH tok AS (SELECT {O.sql_tokens('text')} AS tk FROM documents),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(tk) AS w FROM tok) GROUP BY 1),
nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
big AS (SELECT tk[i] AS w1, tk[i + 1] AS w2
        FROM tok, unnest(range(1, len(tk))) AS r(i)),
pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
       FROM big GROUP BY 1, 2 HAVING count(*) >= {min_count}),
scored AS (
  SELECT w1, w2, n_pair,
         round(ln(n_pair::DOUBLE * nt.n::DOUBLE)
               - ln(u1.c::DOUBLE * u2.c::DOUBLE), 6) AS pmi
  FROM pc JOIN uni u1 ON pc.w1 = u1.w
          JOIN uni u2 ON pc.w2 = u2.w
          CROSS JOIN nt
),
top AS (SELECT * FROM scored ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT {top_n})
SELECT CAST(row_number() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC) AS INTEGER) AS rank,
       w1, w2, n_pair, pmi
FROM top
"""


def q_bootstrap_order_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap CI for the mean order value
    (staged for the round-5 rotation): 40 md5-replayable replicates in
    ONE pass, CI from the rank-trimmed replicate means — "is the mean
    shift real?" without collecting anything
    (`operators/stats.bootstrap_mean_ci`)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return ST.bootstrap_mean_ci(orders, "cents", "o_orderkey", n_boot=40)


def o_bootstrap_order_ci(n_boot: int = 40) -> str:
    from pythonvectordb_spark.operators.stats import _POISSON1_CDF_U32

    case = "CASE " + " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POISSON1_CDF_U32)
    ) + " ELSE 6 END"
    trim = int(0.025 * n_boot)
    return f"""
WITH base AS (SELECT CAST(o_orderkey AS VARCHAR) AS id,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS x
              FROM orders),
reps AS (
  SELECT b.b, base.x,
         ('0x' || substr(md5(base.id || '_' || CAST(b.b AS VARCHAR)), 1, 8))::BIGINT AS u
  FROM base CROSS JOIN (SELECT unnest(range(0, {n_boot})) AS b) b
),
sums AS (
  SELECT b, CAST(sum({case}) AS BIGINT) AS sw,
         CAST(sum(({case}) * x) AS BIGINT) AS swx
  FROM reps GROUP BY 1
),
means AS (SELECT b, round(swx::DOUBLE / sw::DOUBLE, 6) AS mean_b FROM sums),
ranked AS (SELECT mean_b,
                  row_number() OVER (ORDER BY mean_b ASC, b ASC) AS rn
           FROM means),
ci AS (SELECT max(CASE WHEN rn = {trim + 1} THEN mean_b END) AS ci_lo_cents,
              max(CASE WHEN rn = {n_boot - trim} THEN mean_b END) AS ci_hi_cents,
              CAST(count(*) AS BIGINT) AS n_boot
       FROM ranked),
f AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
             round(sum(x)::DOUBLE / count(*)::DOUBLE, 6) AS mean_cents
      FROM base)
SELECT f.n_rows, ci.n_boot, f.mean_cents, ci.ci_lo_cents, ci.ci_hi_cents
FROM ci CROSS JOIN f
"""


def q_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-IVF cluster-balance audit (staged for the round-5
    rotation): per-cell counts under the same nearest-centroid
    expression the ANN search path uses, summarized as empty cells,
    max/mean imbalance, and CV — the index-health number behind probe
    tail latency (`operators/stats.ivf_balance`)."""
    return ST.ivf_balance(
        load_table(spark, sf_dir, "embeddings"), FT.CENTROIDS_TRAINED
    )


def o_ivf_balance() -> str:
    sims = ", ".join(
        O.sql_cosine_float_lit(c, "embedding") for c in FT.CENTROIDS_TRAINED
    )
    k = len(FT.CENTROIDS_TRAINED)
    return f"""
WITH s AS (SELECT [{sims}] AS sims FROM embeddings),
assigned AS (
  SELECT (list_position(sims, list_aggregate(sims, 'max')) - 1) AS cluster FROM s
),
counts AS (SELECT cluster, CAST(count(*) AS BIGINT) AS c FROM assigned GROUP BY 1),
cells AS (SELECT unnest(range(0, {k})) AS cluster),
allc AS (SELECT CAST(coalesce(counts.c, 0) AS BIGINT) AS c
         FROM cells LEFT JOIN counts ON cells.cluster = counts.cluster),
g AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_vectors,
         CAST(count(*) AS BIGINT) AS n_centroids,
         CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
         CAST(min(c) AS BIGINT) AS min_count,
         CAST(max(c) AS BIGINT) AS max_count,
         CAST(sum(c * c) AS BIGINT) AS sc2
  FROM allc
)
SELECT n_vectors, n_centroids, n_empty, min_count, max_count,
       round(max_count::DOUBLE * n_centroids::DOUBLE / n_vectors::DOUBLE, 6) AS imbalance,
       round(sqrt((n_centroids * sc2 - n_vectors * n_vectors)::DOUBLE)
             / n_vectors::DOUBLE, 6) AS cv
FROM g
"""


def q_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per event series (staged for the round-5
    rotation): the peak of the exact-integer n-scaled CUSUM statistic
    localizes a mean shift in time — the batch twin of the streaming
    PSI drift monitor (`operators/timeseries.cusum_shift`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.cusum_shift(load_table(spark, sf_dir, "events"))


def o_cusum_shift() -> str:
    return """
WITH base AS (SELECT event_type AS t, ts, event_id,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events),
scored AS (
  SELECT t,
         CAST(row_number() OVER (PARTITION BY t ORDER BY ts, event_id) AS BIGINT) AS i,
         CAST(sum(cents) OVER (PARTITION BY t ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(cents) OVER (PARTITION BY t) AS BIGINT) AS total,
         CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS n
  FROM base
),
st AS (SELECT t, n, i, abs(n * cum - i * total) AS s FROM scored),
g AS (SELECT t, CAST(max(n) AS BIGINT) AS n_events, max(s) AS peak
      FROM st GROUP BY 1),
pk AS (SELECT st.t, g.n_events, CAST(min(st.i) AS BIGINT) AS peak_k, g.peak
       FROM st JOIN g ON st.t = g.t AND st.s = g.peak
       GROUP BY 1, 2, 4)
SELECT t AS event_type, n_events, peak_k,
       CAST(peak AS BIGINT) AS peak_cusum,
       round(peak::DOUBLE / (n_events::DOUBLE * n_events::DOUBLE * 100.0), 6) AS peak_dev
FROM pk
"""


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS test per event series (staged for the
    round-5 rotation): even-vs-odd event ids as the A/A null
    calibration; the statistic is maximized in scaled-integer form so
    peak and location need no float discipline
    (`operators/timeseries.ks_drift`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.ks_drift(load_table(spark, sf_dir, "events"))


def o_ks_drift() -> str:
    return """
WITH base AS (SELECT event_type AS t,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     (event_id % 2 = 0) AS even
              FROM events),
pv AS (SELECT t, cents,
              CAST(sum(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS c1,
              CAST(sum(CASE WHEN NOT even THEN 1 ELSE 0 END) AS BIGINT) AS c2
       FROM base GROUP BY 1, 2),
sc AS (SELECT t, cents,
              CAST(sum(c1) OVER (PARTITION BY t ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
              CAST(sum(c2) OVER (PARTITION BY t ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2,
              CAST(sum(c1) OVER (PARTITION BY t) AS BIGINT) AS n1,
              CAST(sum(c2) OVER (PARTITION BY t) AS BIGINT) AS n2
       FROM pv),
st AS (SELECT t, n1, n2, cents, abs(n2 * cum1 - n1 * cum2) AS s FROM sc),
g AS (SELECT t, CAST(max(n1) AS BIGINT) AS n_even,
             CAST(max(n2) AS BIGINT) AS n_odd, max(s) AS peak
      FROM st GROUP BY 1),
pk AS (SELECT st.t, g.n_even, g.n_odd,
              CAST(min(st.cents) AS BIGINT) AS peak_cents, g.peak
       FROM st JOIN g ON st.t = g.t AND st.s = g.peak
       GROUP BY 1, 2, 3, 5)
SELECT t AS event_type, n_even, n_odd, peak_cents,
       round(peak::DOUBLE / (n_even::DOUBLE * n_odd::DOUBLE), 6) AS ks
FROM pk
"""


def q_dedup_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the >=0.8 MinHash pair graph (staged for the round-5
    rotation): six rounds of synchronous degree peeling — chains and
    stars (the transitive-merge risk) peel away, surviving nodes sit in
    dense duplicate regions; the membership complement of
    `dedup_graph_triangles`'s per-neighborhood grading
    (`operators/graph.k_core`)."""
    from pythonvectordb_spark.operators.graph import k_core

    docs = load_table(spark, sf_dir, "documents")
    return k_core(DD.minhash_lsh_pairs(docs, threshold=0.8), k=2, rounds=6)


def o_dedup_kcore(k: int = 2, rounds: int = 6) -> str:
    # the WRAP pattern over the proven minhash-pairs oracle, then the
    # peeling rounds unrolled (the trade_pagerank replay discipline)
    parts = [
        f"WITH p AS MATERIALIZED (SELECT id_a, id_b FROM ({o_dedup_minhash_lsh()})),\n"
        "e0 AS (SELECT DISTINCT id_a AS a, id_b AS b FROM p WHERE id_a < id_b)"
    ]
    for r in range(rounds):
        parts.append(
            f""",
k{r} AS (SELECT node FROM (
           SELECT node, CAST(count(*) AS BIGINT) AS deg
           FROM (SELECT unnest([a, b]) AS node FROM e{r}) u GROUP BY 1)
         WHERE deg >= {k}),
e{r + 1} AS (SELECT e.a, e.b FROM e{r} e
             WHERE EXISTS (SELECT 1 FROM k{r} WHERE k{r}.node = e.a)
               AND EXISTS (SELECT 1 FROM k{r} WHERE k{r}.node = e.b))"""
        )
    parts.append(
        f"""
SELECT node, CAST(count(*) AS BIGINT) AS core_degree
FROM (SELECT unnest([a, b]) AS node FROM e{rounds}) u GROUP BY 1"""
    )
    return "".join(parts)


def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini of customer order spend (staged for the round-5
    rotation): the value-concentration scalar behind whale-account skew
    planning — rank identity on exact cents, window partitioned by
    nation so no global sort exists
    (`operators/relational.revenue_gini`)."""
    return RL.revenue_gini(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
    )


def o_revenue_gini() -> str:
    return """
WITH spend AS (
  SELECT n.n_name, c.c_custkey,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT n_name, cents,
         CAST(row_number() OVER (PARTITION BY n_name
                                 ORDER BY cents ASC, c_custkey ASC) AS BIGINT) AS i
  FROM spend
),
g AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(sum(i * cents) AS BIGINT) AS six
  FROM ranked GROUP BY 1
)
SELECT n_name, n_customers, total_cents,
       round(2.0 * six::DOUBLE / (n_customers::DOUBLE * total_cents::DOUBLE)
             - (n_customers::DOUBLE + 1.0) / n_customers::DOUBLE, 6) AS gini
FROM g
"""


def q_arrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor of hourly arrivals per event series (staged for the
    round-5 rotation): variance/mean over observed hours — ≈1 Poisson,
    >1 bursty, <1 scheduled-job metronome; all int64 until one final
    division (`operators/timeseries.arrival_burstiness`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.arrival_burstiness(load_table(spark, sf_dir, "events"))


def o_arrival_burstiness() -> str:
    return """
WITH c AS (
  SELECT event_type AS t, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(c) AS BIGINT) AS n_events,
         CAST(sum(c * c) AS BIGINT) AS q
  FROM c GROUP BY 1
)
SELECT t AS event_type, n_hours, n_events,
       round(n_events::DOUBLE / n_hours::DOUBLE, 6) AS mean_per_hour,
       round((n_hours * q - n_events * n_events)::DOUBLE
             / (n_hours::DOUBLE * n_events::DOUBLE), 6) AS fano
FROM g
"""


def q_event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence lift across users (staged for the
    round-5 rotation): market-basket over the behavior log — which
    behaviors travel together (funnel candidates); exact-integer
    support/lift (`operators/timeseries.event_type_affinity`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.event_type_affinity(load_table(spark, sf_dir, "events"))


def o_event_type_affinity() -> str:
    return """
WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS ty FROM events),
per_type AS (SELECT ty, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS nu FROM ut),
pr AS (
  SELECT a.ty AS type_a, b.ty AS type_b, CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.u = b.u AND a.ty < b.ty
  GROUP BY 1, 2
)
SELECT pr.type_a, pr.type_b, pa.n AS n_a, pb.n AS n_b, pr.n_both,
       round(n_both::DOUBLE / nu.nu::DOUBLE, 9) AS support,
       round(n_both::DOUBLE * nu.nu::DOUBLE / (pa.n::DOUBLE * pb.n::DOUBLE), 6) AS lift
FROM pr
JOIN per_type pa ON pr.type_a = pa.ty
JOIN per_type pb ON pr.type_b = pb.ty
CROSS JOIN nu
"""


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit on order values (staged for the
    round-5 rotation): observed vs log10(1+1/d) share per digit — the
    fabricated-feed detector; digit from the exact cents integer,
    expectation from ln's of exact integers
    (`operators/relational.benford_digits`)."""
    return RL.benford_digits(load_table(spark, sf_dir, "orders"))


def o_benford_digits() -> str:
    return """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
),
g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM g),
o AS (
  SELECT digit, n_obs,
         round(n_obs::DOUBLE / t.n::DOUBLE, 9) AS obs_share,
         round((ln(digit::DOUBLE + 1.0) - ln(digit::DOUBLE)) / ln(10.0), 9) AS benford_p
  FROM g CROSS JOIN t
)
SELECT digit, n_obs, obs_share, benford_p,
       round(obs_share - benford_p, 9) AS excess
FROM o
"""


def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the warehouse's seven fk edges
    (staged for the round-5 rotation): per edge, child rows pointing at
    a missing parent — the join-safety precondition
    (`operators/relational.fk_orphans`)."""
    return RL.fk_orphans(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
    )


def o_fk_orphans() -> str:
    edges = [
        ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    parts = [
        f"""SELECT '{name}' AS relationship,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM {child} c
LEFT JOIN (SELECT DISTINCT {pk} AS _pk FROM {parent}) p ON c.{ck} = p._pk"""
        for name, child, ck, parent, pk in edges
    ]
    return "\nUNION ALL\n".join(parts)


def q_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce audit per event type (staged for the round-5 rotation):
    events within 5s of the same user's previous same-type event —
    double-fire inflation; epoch-microsecond integer comparison, no
    timestamp arithmetic crosses the oracle boundary
    (`operators/timeseries.event_debounce`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.event_debounce(load_table(spark, sf_dir, "events"))


def o_event_debounce(gap_us: int = 5_000_000) -> str:
    return f"""
WITH f AS (
  SELECT event_type AS t,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id)
          < {gap_us}) AS dup
  FROM events
),
g AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced
  FROM f GROUP BY 1
)
SELECT t AS event_type, n_events, n_debounced,
       round(n_debounced::DOUBLE / n_events::DOUBLE, 9) AS debounce_rate
FROM g
"""


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion-lag distribution (staged for the
    round-5 rotation): rate plus interpolated lag percentiles from
    exact epoch-microsecond differences — the funnel's time axis and
    the attribution-window sizing input
    (`operators/timeseries.conversion_lag`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.conversion_lag(load_table(spark, sf_dir, "events"))


def o_conversion_lag() -> str:
    return """
WITH f AS (SELECT user_id AS u, CAST(min(epoch_us(ts)) AS BIGINT) AS t0
           FROM events WHERE event_type = 'signup' GROUP BY 1),
c AS (SELECT f.u, CAST(min(epoch_us(e.ts)) - f.t0 AS BIGINT) AS lag_us
      FROM f JOIN events e
        ON e.user_id = f.u AND e.event_type = 'purchase'
       AND epoch_us(e.ts) >= f.t0
      GROUP BY f.u, f.t0),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM f),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_converted,
             round(quantile_cont(lag_us::DOUBLE, 0.5) / 1000000.0, 6) AS p50_lag_s,
             round(quantile_cont(lag_us::DOUBLE, 0.9) / 1000000.0, 6) AS p90_lag_s,
             round(max(lag_us)::DOUBLE / 1000000.0, 6) AS max_lag_s
      FROM c)
SELECT n.n_candidates, s.n_converted,
       round(s.n_converted::DOUBLE / n.n_candidates::DOUBLE, 9) AS conversion_rate,
       s.p50_lag_s, s.p90_lag_s, s.max_lag_s
FROM n CROSS JOIN s
"""


def q_user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy, reduced to the corpus card (staged
    for the round-5 rotation): average Shannon entropy over each user's
    own event-type mix plus the single-behavior share — the bot/script
    detector (`operators/timeseries.user_behavior_entropy`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.user_behavior_entropy(load_table(spark, sf_dir, "events"))


def o_user_behavior_entropy() -> str:
    return """
WITH cell AS (SELECT user_id AS u, event_type AS ty,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2),
pu AS (
  SELECT u, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         sum(c::DOUBLE * ln(c::DOUBLE)) AS s_clnc
  FROM cell GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single_type,
       round(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 9) AS single_share,
       round(sum(ln(n::DOUBLE) - s_clnc / n::DOUBLE) / count(*)::DOUBLE, 6) AS avg_entropy
FROM pu
"""


def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of user lifetimes with right-censoring at
    the corpus horizon (staged for the round-5 rotation): the estimator
    `retention_cohorts` approximates without censoring — survival at
    day probes from the product-limit over exact-integer risk sets
    (`operators/timeseries.km_survival`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.km_survival(load_table(spark, sf_dir, "events"))


def o_km_survival() -> str:
    return """
WITH b AS (SELECT user_id AS u, CAST(min(epoch_us(ts)) AS BIGINT) AS t0,
                  CAST(max(epoch_us(ts)) AS BIGINT) AS t1
           FROM events GROUP BY 1),
h AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS tmax FROM events),
life AS (
  SELECT CASE WHEN t1 <= tmax - 86400000000 THEN t1 - t0 ELSE tmax - t0 END AS d,
         CASE WHEN t1 <= tmax - 86400000000 THEN 1 ELSE 0 END AS e
  FROM b CROSS JOIN h),
durs AS (SELECT d, CAST(count(*) AS BIGINT) AS c, CAST(sum(e) AS BIGINT) AS dd
         FROM life GROUP BY 1),
risk AS (SELECT d, dd,
                CAST(sum(c) OVER (ORDER BY d DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS n_risk
         FROM durs),
fac AS (SELECT d, dd, n_risk,
               ln((n_risk - dd)::DOUBLE) - ln(n_risk::DOUBLE) AS f
        FROM risk WHERE dd > 0),
probes AS (SELECT * FROM (VALUES (7), (14), (21), (28)) AS p(probe_days)),
agg AS (
  SELECT p.probe_days, sum(fac.dd) AS nd, min(n_risk - dd) AS mn, sum(f) AS sf
  FROM probes p LEFT JOIN fac ON fac.d <= CAST(p.probe_days AS BIGINT) * 86400000000
  GROUP BY 1)
SELECT CAST(probe_days AS INTEGER) AS probe_days,
       CAST(coalesce(nd, 0) AS BIGINT) AS n_deaths,
       CASE WHEN nd IS NULL THEN 1.0
            WHEN mn = 0 THEN 0.0
            ELSE round(exp(sf), 6) END AS survival
FROM agg
"""


def q_hourly_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of hourly arrivals (staged for the round-5
    rotation): the daily-seasonality / burst-persistence detector —
    Pearson over exact int64 moments at lags 1, 2, 3, 24
    (`operators/timeseries.hourly_acf`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.hourly_acf(load_table(spark, sf_dir, "events"))


def o_hourly_acf() -> str:
    return """
WITH hrs AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS hi,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
lags AS (SELECT * FROM (VALUES (1), (2), (3), (24)) AS l(lag_hours)),
pairs AS (
  SELECT l.lag_hours, a.c AS x, b.c AS y
  FROM lags l
  JOIN hrs a ON true
  JOIN hrs b ON b.hi = a.hi + CAST(l.lag_hours AS BIGINT)),
g AS (
  SELECT lag_hours, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1)
SELECT CAST(lag_hours AS INTEGER) AS lag_hours, n_pairs,
       round((n_pairs * sxy - sx * sy)::DOUBLE
             / (sqrt((n_pairs * sxx - sx * sx)::DOUBLE)
                * sqrt((n_pairs * syy - sy * sy)::DOUBLE)), 6) AS acf
FROM g
"""


def q_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank stability of brand revenue across the two exact
    halves of the order horizon (staged for the round-5 rotation): the
    popularity-drift scalar behind layout refresh cadence — exact
    integer d^2 from row_number ranks over e4-unit revenue, one final
    division (`operators/relational.rank_stability`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.rank_stability(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def o_rank_stability() -> str:
    return """
WITH piv AS (
  SELECT CAST(min(epoch_us(o_orderdate)) AS BIGINT)
         + (CAST(max(epoch_us(o_orderdate)) AS BIGINT)
            - CAST(min(epoch_us(o_orderdate)) AS BIGINT)) // 2 AS p
  FROM orders),
rev AS (
  SELECT CASE WHEN epoch_us(o.o_orderdate) <= piv.p THEN 1 ELSE 2 END AS half,
         p.p_brand,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  CROSS JOIN piv
  GROUP BY 1, 2),
rk AS (SELECT half, p_brand,
              CAST(row_number() OVER (PARTITION BY half
                    ORDER BY rev_e4 DESC, p_brand ASC) AS BIGINT) AS r
       FROM rev)
SELECT CAST(count(*) AS BIGINT) AS n_brands,
       CAST(sum((a.r - b.r) * (a.r - b.r)) AS BIGINT) AS sum_d2,
       round(1.0 - 6.0 * sum((a.r - b.r) * (a.r - b.r))::DOUBLE
             / (count(*)::DOUBLE
                * (count(*)::DOUBLE * count(*)::DOUBLE - 1.0)), 9) AS rho
FROM rk a JOIN rk b ON a.p_brand = b.p_brand AND a.half = 1 AND b.half = 2
"""


def q_trimmed_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed and winsorized means of event value per type (staged for
    the round-5 rotation): robust-location companions to
    `event_value_mad` — exact-integer cut-rank algebra, winsorized =
    trimmed + k*lo + k*hi (`operators/sketch.trimmed_stats`)."""
    from pythonvectordb_spark.operators import sketch as SK

    return SK.trimmed_stats(load_table(spark, sf_dir, "events"))


def o_trimmed_value_stats() -> str:
    return """
WITH r AS (
  SELECT event_type AS k, CAST(round(value * 100) AS BIGINT) AS c,
         CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY CAST(round(value * 100) AS BIGINT) ASC, event_id ASC)
              AS BIGINT) AS i,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM events),
r2 AS (SELECT *, CAST(floor((n * 10) / 100.0) AS BIGINT) AS kcut FROM r),
g AS (
  SELECT k, max(n) AS n, max(kcut) AS kcut,
         CAST(sum(c) AS BIGINT) AS s_all,
         CAST(sum(CASE WHEN i > kcut AND i <= n - kcut THEN c END) AS BIGINT) AS s_trim,
         max(CASE WHEN i = kcut + 1 THEN c END) AS lo,
         max(CASE WHEN i = n - kcut THEN c END) AS hi
  FROM r2 GROUP BY 1)
SELECT k AS event_type, n, kcut AS n_trimmed_each_side,
       round(s_all::DOUBLE / (100.0 * n::DOUBLE), 6) AS mean,
       round(s_trim::DOUBLE / (100.0 * (n - 2 * kcut)::DOUBLE), 6) AS trimmed_mean,
       round((s_trim + kcut * lo + kcut * hi)::DOUBLE / (100.0 * n::DOUBLE), 6)
           AS winsorized_mean,
       round(lo::DOUBLE / 100.0, 2) AS lo_cut,
       round(hi::DOUBLE / 100.0, 2) AS hi_cut
FROM g
"""


def q_twonn_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate over the embedding corpus
    (staged for the round-5 rotation): id = n / sum ln(r2/r1) on
    angular distances from the exact symmetric int8 cosine — the
    effective-dimensionality audit behind IVF/LSH parameter choices
    (`operators/stats.twonn_intrinsic_dim`)."""
    return ST.twonn_intrinsic_dim(_emb(spark, sf_dir))


def o_twonn_intrinsic_dim() -> str:
    qv = O.sql_qvec("embedding")
    cos = (
        "(list_aggregate(list_transform(a.qv, (x, i) -> x::BIGINT * b.qv[i]::BIGINT), 'sum')::DOUBLE"
        " / (sqrt(list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)"
        " * sqrt(list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)))"
    )
    return f"""
WITH q AS (SELECT vec_id, {qv} AS qv FROM embeddings),
p AS (
  SELECT a.vec_id AS qa, b.vec_id AS nbr, round(1.0 - {cos}, 9) AS d
  FROM q a CROSS JOIN q b
  WHERE a.vec_id != b.vec_id),
rk AS (
  SELECT qa, d, row_number() OVER (PARTITION BY qa ORDER BY d ASC, nbr ASC) AS rn
  FROM p WHERE d > 0),
per AS (
  SELECT qa, min(CASE WHEN rn = 1 THEN d END) AS r1,
         min(CASE WHEN rn = 2 THEN d END) AS r2
  FROM rk WHERE rn <= 2 GROUP BY qa),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vectors,
         round(sum(ln(r2 / r1)), 6) AS sum_log_mu
  FROM per WHERE r1 IS NOT NULL AND r2 IS NOT NULL)
SELECT n_vectors, sum_log_mu,
       round(n_vectors::DOUBLE / sum_log_mu, 6) AS id_twonn
FROM g
"""


def q_hourly_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-lag cross-correlation of hourly click vs purchase arrivals
    (staged for the round-5 rotation): the funnel lead/lag detector —
    pure int64 Pearson moments per lag, pairs only where both series
    observed the hour (`operators/timeseries.hourly_xcorr`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.hourly_xcorr(load_table(spark, sf_dir, "events"))


def o_hourly_xcorr() -> str:
    return """
WITH hrs AS (
  SELECT event_type AS t,
         CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS hi,
         CAST(count(*) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2),
lags AS (SELECT * FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) AS l(lag_hours)),
pairs AS (
  SELECT l.lag_hours, a.c AS x, b.c AS y
  FROM lags l
  JOIN hrs a ON a.t = 'click'
  JOIN hrs b ON b.t = 'purchase' AND b.hi = a.hi + CAST(l.lag_hours AS BIGINT)),
g AS (
  SELECT lag_hours, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1)
SELECT CAST(lag_hours AS INTEGER) AS lag_hours, n_pairs,
       round((n_pairs * sxy - sx * sy)::DOUBLE
             / (sqrt((n_pairs * sxx - sx * sx)::DOUBLE)
                * sqrt((n_pairs * syy - sy * sy)::DOUBLE)), 6) AS xcorr
FROM g
"""


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b concordance of brand revenue across the two exact
    horizon halves (staged for the round-5 rotation): the pairwise
    inversion companion to `rank_stability` — C/D/tie counts exact over
    the aggregated brand frame, K(K-1)/2 pairs never rows^2
    (`operators/relational.kendall_tau`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.kendall_tau(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def o_kendall_tau() -> str:
    return """
WITH piv AS (
  SELECT CAST(min(epoch_us(o_orderdate)) AS BIGINT)
         + (CAST(max(epoch_us(o_orderdate)) AS BIGINT)
            - CAST(min(epoch_us(o_orderdate)) AS BIGINT)) // 2 AS p
  FROM orders),
rev AS (
  SELECT CASE WHEN epoch_us(o.o_orderdate) <= piv.p THEN 1 ELSE 2 END AS half,
         p.p_brand,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  CROSS JOIN piv
  GROUP BY 1, 2),
wide AS (
  SELECT p_brand,
         max(CASE WHEN half = 1 THEN rev_e4 END) AS x,
         max(CASE WHEN half = 2 THEN rev_e4 END) AS y
  FROM rev GROUP BY 1
  HAVING max(CASE WHEN half = 1 THEN rev_e4 END) IS NOT NULL
     AND max(CASE WHEN half = 2 THEN rev_e4 END) IS NOT NULL),
pr AS (
  SELECT CAST(sign(a.x - b.x) AS BIGINT) AS sx,
         CAST(sign(a.y - b.y) AS BIGINT) AS sy
  FROM wide a JOIN wide b ON a.p_brand < b.p_brand),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM pr),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_brands FROM wide)
SELECT n_brands, n_pairs, concordant, discordant,
       round((concordant - discordant)::DOUBLE
             / sqrt((n_pairs - tx)::DOUBLE * (n_pairs - ty)::DOUBLE), 9) AS tau_b
FROM g CROSS JOIN nb
"""


def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl supplier-revenue concentration per nation (staged for
    the round-5 rotation): HHI and the effective supplier count 1/HHI —
    exact e4 revenue, DECIMAL(38)/HUGEINT squares, one final double
    division (`operators/relational.hhi_concentration`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.hhi_concentration(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def o_hhi_concentration() -> str:
    return """
WITH per AS (
  SELECT n.n_name, s.s_suppkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2),
g AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(rev_e4) AS BIGINT) AS total_e4,
         sum(rev_e4::HUGEINT * rev_e4::HUGEINT) AS sq_e8
  FROM per GROUP BY 1)
SELECT n_name, n_suppliers, total_e4,
       round(sq_e8::DOUBLE / (total_e4::DOUBLE * total_e4::DOUBLE), 9) AS hhi,
       round((total_e4::DOUBLE * total_e4::DOUBLE) / sq_e8::DOUBLE, 6) AS eff_suppliers
FROM g
"""


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest Mann-Whitney U per source over doc lengths (staged
    for the round-5 rotation): doubled midranks 2B+c+1 keep rank sums,
    U2, and the tie correction exact int64; z and rank-biserial r
    promote once (`operators/stats.mann_whitney`)."""
    return ST.mann_whitney(load_table(spark, sf_dir, "documents"))


def o_mann_whitney() -> str:
    return """
WITH sv AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS cg
            FROM documents GROUP BY 1, 2),
vc AS (SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
       FROM documents GROUP BY 1),
mid AS (SELECT v, c,
               CAST(2 * (sum(c) OVER (ORDER BY v ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
                    + c + 1 AS BIGINT) AS mr2
        FROM vc),
tots AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                CAST(sum(c * c * c - c) AS BIGINT) AS tie3
         FROM mid),
per AS (SELECT g, CAST(sum(cg) AS BIGINT) AS n1,
               CAST(sum(cg * mr2) AS BIGINT) AS s2
        FROM sv JOIN mid USING (v) GROUP BY 1)
SELECT g AS source, n1 AS n_group,
       CAST(n_total - n1 AS BIGINT) AS n_rest,
       CAST(s2 - n1 * (n1 + 1) AS BIGINT) AS u2,
       round(((s2 - n1 * (n1 + 1))::DOUBLE / 2.0
              - n1::DOUBLE * (n_total - n1)::DOUBLE / 2.0)
             / sqrt((n1::DOUBLE * (n_total - n1)::DOUBLE / 12.0)
                    * ((n_total::DOUBLE + 1.0)
                       - tie3::DOUBLE
                         / (n_total::DOUBLE * (n_total::DOUBLE - 1.0)))), 6) AS z,
       round(1.0 - (s2 - n1 * (n1 + 1))::DOUBLE
                   / (n1::DOUBLE * (n_total - n1)::DOUBLE), 6) AS rank_biserial
FROM per CROSS JOIN tots
"""


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across event types (new round 6): the k-group
    rank test that precedes the one-vs-rest `mann_whitney` sweep —
    doubled midranks keep rank sums and the tie correction exact int64;
    H and tie-corrected H' promote once, ROUNDED 6
    (`operators/stats.kruskal_wallis`)."""
    return ST.kruskal_wallis(load_table(spark, sf_dir, "events"))


def o_kruskal_wallis() -> str:
    return """
WITH sv AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS cg
            FROM events GROUP BY 1, 2),
vc AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
              CAST(count(*) AS BIGINT) AS c
       FROM events GROUP BY 1),
mid AS (SELECT v, c,
               CAST(2 * (sum(c) OVER (ORDER BY v ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
                    + c + 1 AS BIGINT) AS mr2
        FROM vc),
tots AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                CAST(sum(c * c * c - c) AS BIGINT) AS tie3
         FROM mid),
per AS (SELECT g, CAST(sum(cg) AS BIGINT) AS n1,
               CAST(sum(cg * mr2) AS BIGINT) AS s2
        FROM sv JOIN mid USING (v) GROUP BY 1),
agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
               sum(s2::DOUBLE * s2::DOUBLE / (4.0 * n1::DOUBLE)) AS rsum2n
        FROM per)
SELECT k AS n_groups, n_total AS n_rows,
       CASE WHEN k > 1 AND n_total > k THEN
         round(12.0 / (n_total::DOUBLE * (n_total::DOUBLE + 1.0)) * rsum2n
               - 3.0 * (n_total::DOUBLE + 1.0), 6) END AS h_raw,
       CASE WHEN k > 1 AND n_total > k
                 AND (1.0 - tie3::DOUBLE
                      / (n_total::DOUBLE * n_total::DOUBLE * n_total::DOUBLE
                         - n_total::DOUBLE)) > 0 THEN
         round((12.0 / (n_total::DOUBLE * (n_total::DOUBLE + 1.0)) * rsum2n
                - 3.0 * (n_total::DOUBLE + 1.0))
               / (1.0 - tie3::DOUBLE
                  / (n_total::DOUBLE * n_total::DOUBLE * n_total::DOUBLE
                     - n_total::DOUBLE)), 6) END AS h_stat
FROM agg CROSS JOIN tots
"""


def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test across event types (new
    round 6): ANOVA on |value - group median| with the doubled-median
    trick keeping every deviation exact int64 on the distinct-value
    frame; the F statistic assembles in `value_anova`'s pinned double
    order (`operators/stats.brown_forsythe`)."""
    return ST.brown_forsythe(load_table(spark, sf_dir, "events"))


def o_brown_forsythe() -> str:
    return """
WITH gv AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS cg
            FROM events GROUP BY 1, 2),
r AS (SELECT g, v, cg,
             CAST(sum(cg) OVER (PARTITION BY g ORDER BY v ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS hi,
             CAST(sum(cg) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM gv),
m AS (SELECT g,
             CAST(sum(v * ((CASE WHEN (n + 1) // 2
                                      BETWEEN hi - cg + 1 AND hi
                                 THEN 1 ELSE 0 END)
                           + (CASE WHEN (n + 2) // 2
                                        BETWEEN hi - cg + 1 AND hi
                                   THEN 1 ELSE 0 END))) AS BIGINT) AS med2
      FROM r GROUP BY 1),
per AS (SELECT r.g, CAST(max(n) AS BIGINT) AS ng,
               CAST(sum(cg * abs(2 * v - med2)) AS BIGINT) AS s,
               CAST(sum(cg * abs(2 * v - med2) * abs(2 * v - med2))
                    AS BIGINT) AS q
        FROM r JOIN m ON r.g = m.g GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS nn,
             CAST(sum(s) AS BIGINT) AS ss, CAST(sum(q) AS BIGINT) AS qq,
             sum(s::DOUBLE * s::DOUBLE / ng::DOUBLE) AS sg2n
      FROM per)
SELECT k AS n_groups, nn AS n_rows,
       CASE WHEN k > 1 AND nn > k AND (qq::DOUBLE - sg2n) > 0 THEN
         round(((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                / (k::DOUBLE - 1.0))
               / ((qq::DOUBLE - sg2n) / (nn::DOUBLE - k::DOUBLE)), 6)
       END AS bf_stat
FROM t
"""


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document gates (new
    round 6): chance-corrected agreement of the char-length gate
    (n_chars >= 200) with the token-count gate (>= 40 tokens) — exact
    2x2 cells in one corpus pass, kappa promotes once
    (`operators/stats.cohens_kappa`)."""
    docs = load_table(spark, sf_dir, "documents")
    return ST.cohens_kappa(
        docs,
        F.col("n_chars") >= 200,
        F.size(_tokens("text")) >= 40,
    )


def o_cohens_kappa() -> str:
    return f"""
WITH f AS (SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
                  CASE WHEN len({O.sql_tokens('text')}) >= 40
                       THEN 1 ELSE 0 END AS b
           FROM documents),
t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a * b) AS BIGINT) AS n11,
             CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
             CAST(sum((1 - a) * b) AS BIGINT) AS n01,
             CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      FROM f)
SELECT n AS n_rows, n11, n10, n01, n00,
       round((n11 + n00)::DOUBLE / n::DOUBLE, 6) AS p_observed,
       round(((n11 + n10)::DOUBLE * (n11 + n01)::DOUBLE
              + (n01 + n00)::DOUBLE * (n10 + n00)::DOUBLE)
             / (n::DOUBLE * n::DOUBLE), 6) AS p_expected,
       CASE WHEN ((n11 + n10)::DOUBLE * (n11 + n01)::DOUBLE
                  + (n01 + n00)::DOUBLE * (n10 + n00)::DOUBLE)
                 / (n::DOUBLE * n::DOUBLE) < 1.0 THEN
         round(((n11 + n00)::DOUBLE / n::DOUBLE
                - ((n11 + n10)::DOUBLE * (n11 + n01)::DOUBLE
                   + (n01 + n00)::DOUBLE * (n10 + n00)::DOUBLE)
                  / (n::DOUBLE * n::DOUBLE))
               / (1.0 - ((n11 + n10)::DOUBLE * (n11 + n01)::DOUBLE
                         + (n01 + n00)::DOUBLE * (n10 + n00)::DOUBLE)
                        / (n::DOUBLE * n::DOUBLE)), 6) END AS kappa
FROM t
"""


def q_ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer EWMA (alpha=1/2) over daily revenue (new round 6): the
    sequential recurrence ewma_t = (ewma_{t-1} + x_t) >> 1 on exact
    cents, run as an expression fold over the calendar-bounded day
    series — the state depends on previous OUTPUT, so no window can
    unroll it; the oracle replays the identical recurrence as a
    recursive CTE (`operators/timeseries.ewma_daily_value`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.ewma_daily_value(load_table(spark, sf_dir, "events"))


def o_ewma_daily_value() -> str:
    return """
WITH RECURSIVE daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
idx AS (SELECT di, cents,
               CAST(row_number() OVER (ORDER BY di ASC) AS BIGINT) AS i
        FROM daily),
r AS (
  SELECT i, di, cents, cents AS ewma FROM idx WHERE i = 1
  UNION ALL
  SELECT d.i, d.di, d.cents, CAST((r.ewma + d.cents) >> 1 AS BIGINT)
  FROM r JOIN idx d ON d.i = r.i + 1
)
SELECT di, cents, CAST(ewma AS BIGINT) AS ewma_cents,
       round(ewma::DOUBLE / 100.0, 6) AS ewma
FROM r
"""


def q_revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue drawdown below the running peak (new round 6):
    exact integer cents end to end — cumulative max window over the
    calendar-bounded daily frame
    (`operators/timeseries.revenue_drawdown`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.revenue_drawdown(load_table(spark, sf_dir, "events"))


def o_revenue_drawdown() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
p AS (SELECT di, cents,
             CAST(max(cents) OVER (ORDER BY di ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS peak_cents
      FROM daily)
SELECT di, cents, peak_cents,
       CAST(peak_cents - cents AS BIGINT) AS drawdown_cents
FROM p
"""


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily event arrivals (staged for the
    round-5 rotation): randomness of above/below-median days — doubled
    median m2 keeps every comparison int64, exact run count, z promotes
    once; NULL z when one side is empty (the orders table degenerates
    exactly that way at sf0.001 — every day >= the median of 1)
    (`operators/timeseries.runs_test`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.runs_test(load_table(spark, sf_dir, "events"))


def o_runs_test() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
nf AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM daily),
ranked AS (SELECT c, CAST(row_number() OVER (ORDER BY c ASC, di ASC) AS BIGINT) AS rn
           FROM daily),
m AS (SELECT CAST(sum(c * ((CASE WHEN rn = (nd + 1) // 2 THEN 1 ELSE 0 END)
                           + (CASE WHEN rn = (nd + 2) // 2 THEN 1 ELSE 0 END)))
             AS BIGINT) AS m2
      FROM ranked CROSS JOIN nf),
signs AS (SELECT di, CASE WHEN 2 * c > m2 THEN 1 WHEN 2 * c < m2 THEN -1 END AS s
          FROM daily CROSS JOIN m WHERE 2 * c != m2),
fl AS (SELECT s,
              CASE WHEN lag(s) OVER (ORDER BY di ASC) IS NULL THEN 1
                   WHEN lag(s) OVER (ORDER BY di ASC) != s THEN 1
                   ELSE 0 END AS new_run
       FROM signs),
g AS (SELECT CAST(coalesce(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_above,
             CAST(coalesce(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_below,
             CAST(coalesce(sum(new_run), 0) AS BIGINT) AS runs
      FROM fl)
SELECT n_above, n_below, runs,
       CASE WHEN n_above > 0 AND n_below > 0 THEN
         round(1.0 + 2.0 * n_above::DOUBLE * n_below::DOUBLE
                     / (n_above::DOUBLE + n_below::DOUBLE), 6) END AS expected_runs,
       CASE WHEN n_above > 0 AND n_below > 0 THEN
         round((runs::DOUBLE
                - (1.0 + 2.0 * n_above::DOUBLE * n_below::DOUBLE
                         / (n_above::DOUBLE + n_below::DOUBLE)))
               / sqrt(2.0 * n_above::DOUBLE * n_below::DOUBLE
                      * (2.0 * n_above::DOUBLE * n_below::DOUBLE
                         - n_above::DOUBLE - n_below::DOUBLE)
                      / ((n_above::DOUBLE + n_below::DOUBLE)
                         * (n_above::DOUBLE + n_below::DOUBLE)
                         * (n_above::DOUBLE + n_below::DOUBLE - 1.0))), 6) END AS z
FROM g
"""


def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index of order values at k = 50/100/200 (staged for
    the round-5 rotation): the heavy-tail / skew-posture scalar — one
    deterministic top-(kmax+1) shortlist, ln of exact cents, Hill-plot
    stability across k (`operators/sketch.hill_tail_index`)."""
    from pythonvectordb_spark.operators import sketch as SK

    return SK.hill_tail_index(load_table(spark, sf_dir, "orders"))


def o_hill_tail_index() -> str:
    return """
WITH top AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey AS k_
  FROM orders ORDER BY cents DESC, k_ ASC LIMIT 201),
ranked AS (SELECT cents,
                  CAST(row_number() OVER (ORDER BY cents DESC, k_ ASC) AS BIGINT) AS rn
           FROM top),
ks AS (SELECT * FROM (VALUES (50), (100), (200)) AS t(k)),
g AS (SELECT k,
             sum(CASE WHEN rn <= k THEN ln(cents::DOUBLE) END) AS s_log,
             max(CASE WHEN rn = k + 1 THEN cents END) AS xk1
      FROM ranked CROSS JOIN ks GROUP BY 1)
SELECT CAST(k AS INTEGER) AS k, CAST(xk1 AS BIGINT) AS xk1_cents,
       round(s_log - k::DOUBLE * ln(xk1::DOUBLE), 6) AS sum_log_excess,
       round(k::DOUBLE / (s_log - k::DOUBLE * ln(xk1::DOUBLE)), 6) AS alpha_hill
FROM g
"""


def q_ivf_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell simplified silhouette of the trained IVF codebook
    (staged for the round-5 rotation): boundary-mass audit from the
    SAME bound sims HOF the search path argmaxes over — the
    partition-quality companion to `ivf_balance`
    (`operators/stats.ivf_silhouette`)."""
    return ST.ivf_silhouette(
        load_table(spark, sf_dir, "embeddings"), FT.CENTROIDS_TRAINED
    )


def o_ivf_silhouette() -> str:
    sims = ", ".join(
        O.sql_cosine_float_lit(c, "embedding") for c in FT.CENTROIDS_TRAINED
    )
    return f"""
WITH s AS (SELECT [{sims}] AS sims FROM embeddings),
feat AS (
  SELECT (list_position(sims, list_aggregate(sims, 'max')) - 1) AS cluster,
         CASE WHEN greatest(1.0 - list_aggregate(sims, 'max'),
                            1.0 - list_sort(sims, 'DESC')[2]) > 0
              THEN round(((1.0 - list_sort(sims, 'DESC')[2])
                          - (1.0 - list_aggregate(sims, 'max')))
                         / greatest(1.0 - list_aggregate(sims, 'max'),
                                    1.0 - list_sort(sims, 'DESC')[2]), 9)
              ELSE 0.0 END AS sil
  FROM s)
SELECT CAST(cluster AS INTEGER) AS cluster,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(avg(sil), 6) AS mean_sil,
       round(min(sil), 9) AS min_sil
FROM feat GROUP BY 1
"""


def q_embedding_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation-ratio effective rank of the int8 Gram matrix
    (staged for the round-5 rotation): (tr C)^2/||C||_F^2 — exact int64
    per-partition BLAS Gram partials, DECIMAL(38)/HUGEINT squares, one
    final double division (`operators/stats.embedding_effective_rank`)."""
    return ST.embedding_effective_rank(load_table(spark, sf_dir, "embeddings"))


def o_embedding_effective_rank() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
WITH q AS (SELECT {qv} AS qv FROM embeddings),
pairs AS (SELECT t1.i AS i, t2.j AS j
          FROM generate_series(1, 64) t1(i)
          CROSS JOIN generate_series(1, 64) t2(j)
          WHERE t2.j >= t1.i),
c AS (SELECT i, j, CAST(sum(qv[i]::BIGINT * qv[j]::BIGINT) AS BIGINT) AS s
      FROM q CROSS JOIN pairs GROUP BY 1, 2),
g AS (SELECT CAST(max(j) AS INTEGER) AS dim,
             CAST(sum(CASE WHEN i = j THEN s END) AS BIGINT) AS trace,
             sum((CASE WHEN i = j THEN 1 ELSE 2 END)::HUGEINT
                 * s::HUGEINT * s::HUGEINT) AS frob2
      FROM c),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors FROM embeddings)
SELECT n_vectors, dim, trace,
       round((trace::HUGEINT * trace::HUGEINT)::DOUBLE / frob2::DOUBLE, 6)
           AS eff_rank
FROM g CROSS JOIN n
"""


def q_dedup_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the >=0.8 MinHash dup graph
    (staged for the round-5 rotation): template-farm (r>0) vs
    hub-and-spoke (r<0) duplication structure — doubled-orientation
    moment algebra, never materializing the 2m rows
    (`operators/graph.assortativity`)."""
    from pythonvectordb_spark.operators.graph import assortativity

    docs = load_table(spark, sf_dir, "documents")
    return assortativity(DD.minhash_lsh_pairs(docs, threshold=0.8))


def o_dedup_assortativity() -> str:
    return f"""
WITH p AS MATERIALIZED (SELECT id_a, id_b FROM ({o_dedup_minhash_lsh()})),
e AS (SELECT DISTINCT id_a AS a, id_b AS b FROM p WHERE id_a < id_b),
d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT unnest([a, b]) AS node FROM e) u GROUP BY 1),
j AS (SELECT da.deg AS da, db.deg AS db
      FROM e JOIN d da ON da.node = e.a JOIN d db ON db.node = e.b),
g AS (SELECT CAST(coalesce(count(*), 0) AS BIGINT) AS n_edges,
             CAST(coalesce(sum(da + db), 0) AS BIGINT) AS sx,
             CAST(coalesce(sum(da * da + db * db), 0) AS BIGINT) AS sxx,
             CAST(coalesce(sum(2 * da * db), 0) AS BIGINT) AS sxy
      FROM j),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM d)
SELECT n_nodes, n_edges,
       CASE WHEN 2 * n_edges * sxx - sx * sx > 0 THEN
         round((2 * n_edges * sxy - sx * sx)::DOUBLE
               / (2 * n_edges * sxx - sx * sx)::DOUBLE, 9) END AS assortativity
FROM g CROSS JOIN n
"""


def q_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket brand association (staged for the round-5
    rotation): support / co-occurrence / lift with the a-priori gates —
    frequent brands first, pair fan-out bounded by basket width
    (`operators/relational.copurchase_lift`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.copurchase_lift(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_copurchase_lift() -> str:
    return """
WITH ob AS (SELECT DISTINCT l.l_orderkey, p.p_brand
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
freq AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_brand
         FROM ob GROUP BY 1 HAVING count(*) >= 20),
obf AS (SELECT ob.l_orderkey, ob.p_brand FROM ob JOIN freq USING (p_brand)),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(count(*) AS BIGINT) AS n_cooc
  FROM obf a JOIN obf b ON a.l_orderkey = b.l_orderkey
                       AND a.p_brand < b.p_brand
  GROUP BY 1, 2 HAVING count(*) >= 3),
tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob)
SELECT p.brand_a, p.brand_b, p.n_cooc, fa.n_brand AS n_a, fb.n_brand AS n_b,
       round(p.n_cooc::DOUBLE / tot.n_orders::DOUBLE, 9) AS support,
       round((p.n_cooc * tot.n_orders)::DOUBLE
             / (fa.n_brand * fb.n_brand)::DOUBLE, 9) AS lift
FROM pairs p
JOIN freq fa ON fa.p_brand = p.brand_a
JOIN freq fb ON fb.p_brand = p.brand_b
CROSS JOIN tot
"""


def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate + memory coefficient of the behavioral event-type
    Markov chain (staged for the round-5 rotation): H(next|cur) and
    H(next) with every ln over an exact integer count — the scalar
    summary of `event_transitions`
    (`operators/timeseries.markov_entropy_rate`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.markov_entropy_rate(load_table(spark, sf_dir, "events"))


def o_markov_entropy_rate() -> str:
    return """
WITH seq AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS nxt
  FROM events),
tr AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS t
       FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
curm AS (SELECT cur, CAST(sum(t) AS BIGINT) AS tc FROM tr GROUP BY 1),
nxtm AS (SELECT nxt, CAST(sum(t) AS BIGINT) AS tn FROM tr GROUP BY 1),
tot AS (SELECT CAST(sum(t) AS BIGINT) AS tt FROM tr),
cond AS (SELECT sum(t::DOUBLE * (ln(tc::DOUBLE) - ln(t::DOUBLE))) AS s_cond
         FROM tr JOIN curm USING (cur)),
marg AS (SELECT sum(tn::DOUBLE * ln(tn::DOUBLE)) AS s_marg FROM nxtm)
SELECT tt AS n_transitions,
       round(s_cond / tt::DOUBLE, 6) AS h_cond,
       round(ln(tt::DOUBLE) - s_marg / tt::DOUBLE, 6) AS h_next,
       CASE WHEN ln(tt::DOUBLE) - s_marg / tt::DOUBLE > 0 THEN
         round(1.0 - (s_cond / tt::DOUBLE)
                     / (ln(tt::DOUBLE) - s_marg / tt::DOUBLE), 6) END AS memory_coef
FROM cond CROSS JOIN marg CROSS JOIN tot
"""


def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS slope of quantity on discount points (staged for
    the round-5 rotation): exact int64 moments, one double division,
    NULL on zero discount variance
    (`operators/relational.discount_quantity_elasticity`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.discount_quantity_elasticity(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_discount_elasticity() -> str:
    return """
WITH b AS (
  SELECT p.p_brand,
         CAST(round(l.l_discount * 100) AS BIGINT) AS x,
         CAST(round(l.l_quantity) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
g AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM b GROUP BY 1)
SELECT p_brand, n,
       CASE WHEN n * sxx - sx * sx > 0 THEN
         round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE, 9)
       END AS slope_per_point
FROM g
"""


def q_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand return rate with a 95% Wilson interval (staged for the
    round-5 rotation): exact k/n counts, one pinned double-op sequence
    mirrored token-for-token (z^2 only as the literal 3.8416)
    (`operators/relational.return_rate_wilson`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.return_rate_wilson(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_return_rate_wilson() -> str:
    return """
WITH g AS (
  SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1),
f AS (SELECT p_brand, n, k, k::DOUBLE / n::DOUBLE AS p FROM g)
SELECT p_brand, n, k, round(p, 9) AS return_rate,
       round(((p + 3.8416 / (2.0 * n::DOUBLE))
              - 1.96 * sqrt((p * (1.0 - p) + 3.8416 / (4.0 * n::DOUBLE))
                            / n::DOUBLE))
             / (1.0 + 3.8416 / n::DOUBLE), 9) AS wilson_lo,
       round(((p + 3.8416 / (2.0 * n::DOUBLE))
              + 1.96 * sqrt((p * (1.0 - p) + 3.8416 / (4.0 * n::DOUBLE))
                            / n::DOUBLE))
             / (1.0 + 3.8416 / n::DOUBLE), 9) AS wilson_hi
FROM f
"""


def q_priority_segment_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of order priority x customer market
    segment with Cramer's V (staged for the round-5 rotation):
    (N*o - r*c)^2/(N*r*c) per cell — HUGEINT/DECIMAL(38) squares, one
    double division per cell (`operators/stats.contingency_chisq`)."""
    base = (
        load_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(load_table(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderpriority", "c_mktsegment")
    )
    return ST.contingency_chisq(base, "o_orderpriority", "c_mktsegment")


def o_priority_segment_chisq() -> str:
    return """
WITH base AS (SELECT o.o_orderpriority AS r, c.c_mktsegment AS c
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
cells AS (SELECT r, c, CAST(count(*) AS BIGINT) AS o FROM base GROUP BY 1, 2),
rm AS (SELECT r, CAST(sum(o) AS BIGINT) AS rsum FROM cells GROUP BY 1),
cm AS (SELECT c, CAST(sum(o) AS BIGINT) AS csum FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
               CAST(count(DISTINCT r) AS BIGINT) AS nr,
               CAST(count(DISTINCT c) AS BIGINT) AS nc
        FROM cells),
grid AS (SELECT rm.r, cm.c, rm.rsum, cm.csum,
                CAST(coalesce(cells.o, 0) AS BIGINT) AS o
         FROM rm CROSS JOIN cm
         LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c),
t AS (SELECT nn, nr, nc,
             ((nn * o - rsum * csum)::HUGEINT
              * (nn * o - rsum * csum)::HUGEINT)::DOUBLE
             / (nn * rsum * csum)::DOUBLE AS term
      FROM grid CROSS JOIN tot),
g AS (SELECT max(nn) AS n_rows, max(nr) AS nr, max(nc) AS nc,
             sum(term) AS chi
      FROM t)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
       round(chi, 6) AS chisq,
       round(sqrt(chi / (n_rows::DOUBLE * (least(nr, nc) - 1)::DOUBLE)), 6)
           AS cramers_v
FROM g
"""


def q_interpurchase_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment inter-order gap distribution (staged for the round-5
    rotation): exact day gaps from a total-order lag window; doubled
    median + nearest-rank p90 located on the DISTINCT-gap frame
    (`operators/timeseries.interpurchase_gap`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.interpurchase_gap(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


def o_interpurchase_gap() -> str:
    return """
WITH o AS (SELECT o_custkey, o_orderkey,
                  CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d
           FROM orders),
gp AS (SELECT o_custkey,
              d - lag(d) OVER (PARTITION BY o_custkey
                               ORDER BY d ASC, o_orderkey ASC) AS gap
       FROM o),
gs AS (SELECT c.c_mktsegment AS seg, gp.gap
       FROM gp JOIN customer c ON gp.o_custkey = c.c_custkey
       WHERE gp.gap IS NOT NULL),
vc AS (SELECT seg, gap, CAST(count(*) AS BIGINT) AS c FROM gs GROUP BY 1, 2),
cu AS (SELECT seg, gap, c,
              CAST(sum(c) OVER (PARTITION BY seg ORDER BY gap ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
       FROM vc),
tot AS (SELECT seg, max(cum) AS n, (max(cum) + 1) // 2 AS r1,
               (max(cum) + 2) // 2 AS r2, (9 * max(cum) + 9) // 10 AS r90
        FROM cu GROUP BY 1),
j AS (SELECT cu.seg, tot.n, cum - c AS b, cum, gap, r1, r2, r90
      FROM cu JOIN tot USING (seg)),
g AS (SELECT seg, CAST(max(n) AS BIGINT) AS n_gaps,
             CAST(sum((CASE WHEN b < r1 AND r1 <= cum THEN gap ELSE 0 END)
                      + (CASE WHEN b < r2 AND r2 <= cum THEN gap ELSE 0 END))
                  AS BIGINT) AS m2,
             CAST(sum(CASE WHEN b < r90 AND r90 <= cum THEN gap ELSE 0 END)
                  AS BIGINT) AS p90_days
      FROM j GROUP BY 1)
SELECT seg AS c_mktsegment, n_gaps,
       round(m2::DOUBLE / 2.0, 1) AS median_days, p90_days
FROM g
"""


def q_source_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source type-token ratio and hapax share (staged for the
    round-5 rotation): the lexical-diversity corpus card — exact
    token/type/hapax counts from the pinned whitespace tokenizer
    (`operators/textops.source_ttr`)."""
    return TX.source_ttr(load_table(spark, sf_dir, "documents"))


def o_source_ttr() -> str:
    return f"""
WITH toks AS (SELECT source AS g, {O.sql_tokens('text')} AS tk FROM documents),
tt AS (SELECT g, t.t AS tok, CAST(count(*) AS BIGINT) AS c
       FROM toks, unnest(tk) AS t(t) GROUP BY 1, 2),
g AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      FROM tt GROUP BY 1)
SELECT g AS source, n_tokens, n_types, n_hapax,
       round(n_types::DOUBLE / n_tokens::DOUBLE, 9) AS ttr,
       round(n_hapax::DOUBLE / n_types::DOUBLE, 9) AS hapax_share
FROM g
"""


def q_source_decile_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Q-Q decile shift table of doc length vs the corpus
    (staged for the round-5 rotation): nearest-rank deciles located on
    DISTINCT-value frames — WHERE a source's length distribution
    deviates, completing `mann_whitney`'s whether
    (`operators/stats.source_decile_shift`)."""
    return ST.source_decile_shift(load_table(spark, sf_dir, "documents"))


def o_source_decile_shift() -> str:
    return """
WITH gvc AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
                    CAST(count(*) AS BIGINT) AS c
             FROM documents GROUP BY 1, 2),
gcu AS (SELECT g, v, c,
               CAST(sum(c) OVER (PARTITION BY g ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM gvc),
gtot AS (SELECT g, max(cum) AS n FROM gcu GROUP BY 1),
gks AS (SELECT g, n, k, (k * n + 9) // 10 AS r
        FROM gtot CROSS JOIN (SELECT unnest(range(1, 10)) AS k)),
gd AS (SELECT gcu.g, gks.k, CAST(max(v) AS BIGINT) AS source_value
       FROM gcu JOIN gks ON gcu.g = gks.g
       WHERE (cum - c) < r AND r <= cum GROUP BY 1, 2),
cvc AS (SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1),
ccu AS (SELECT v, c,
               CAST(sum(c) OVER (ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM cvc),
ctot AS (SELECT max(cum) AS n FROM ccu),
cks AS (SELECT n, k, (k * n + 9) // 10 AS r
        FROM ctot CROSS JOIN (SELECT unnest(range(1, 10)) AS k)),
cd AS (SELECT cks.k, CAST(max(v) AS BIGINT) AS corpus_value
       FROM ccu CROSS JOIN cks
       WHERE (cum - c) < r AND r <= cum GROUP BY 1)
SELECT gd.g AS source, CAST(gd.k AS INTEGER) AS decile,
       gd.source_value, cd.corpus_value,
       CAST(gd.source_value - cd.corpus_value AS BIGINT) AS shift
FROM gd JOIN cd ON gd.k = cd.k
"""


def q_session_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session depth histogram with bounce share and exact duration
    mass (staged for the round-5 rotation): the gap-parameter
    calibration view over `sessionize`'s output
    (`operators/timeseries.session_depth_hist`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.session_depth_hist(load_table(spark, sf_dir, "events"))


def o_session_depth_hist() -> str:
    # WRAP pattern over the proven sessionize oracle
    return f"""
WITH s AS MATERIALIZED (
  SELECT n_events, end_us - start_us AS dur_us
  FROM ({o_sessionize_events()})),
g AS (
  SELECT CASE WHEN n_events = 1 THEN '1'
              WHEN n_events <= 3 THEN '2-3'
              WHEN n_events <= 7 THEN '4-7'
              ELSE '8+' END AS depth_bucket,
         CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(n_events) AS BIGINT) AS n_events,
         CAST(sum(dur_us) AS BIGINT) AS sum_dur_us
  FROM s GROUP BY 1),
tot AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS t FROM g)
SELECT depth_bucket, n_sessions, n_events, sum_dur_us,
       round(n_sessions::DOUBLE / t::DOUBLE, 9) AS share,
       round(sum_dur_us::DOUBLE / (n_sessions::DOUBLE * 60000000.0), 6)
           AS mean_dur_min
FROM g CROSS JOIN tot
"""


def q_brand_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto coverage of revenue by brand at 50/80/90% thresholds
    (staged for the round-5 rotation): the hot-tier sizing curve —
    100*cum >= t*total compared in pure int64
    (`operators/relational.brand_pareto`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.brand_pareto(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_brand_pareto() -> str:
    return """
WITH rev AS (
  SELECT p.p_brand,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1),
cum AS (
  SELECT CAST(row_number() OVER (ORDER BY rev_e4 DESC, p_brand ASC) AS BIGINT) AS rk,
         CAST(sum(rev_e4) OVER (ORDER BY rev_e4 DESC, p_brand ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM rev),
tot AS (SELECT max(cum) AS total, max(rk) AS n_brands FROM cum),
th AS (SELECT * FROM (VALUES (50), (80), (90)) AS t(t)),
g AS (SELECT t, CAST(min(rk) AS BIGINT) AS brands_needed,
             CAST(max(n_brands) AS BIGINT) AS n_brands
      FROM cum CROSS JOIN tot CROSS JOIN th
      WHERE 100 * cum >= t * total GROUP BY 1)
SELECT CAST(t AS INTEGER) AS threshold_pct, brands_needed, n_brands,
       round(brands_needed::DOUBLE / n_brands::DOUBLE, 9) AS brand_fraction
FROM g
"""


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation census over the orders table (staged for the
    round-5 rotation): tercile cuts located on DISTINCT-value frames,
    value<=cut bucketing in int64 — no floats anywhere
    (`operators/relational.customer_rfm`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.customer_rfm(load_table(spark, sf_dir, "orders"))


def o_customer_rfm() -> str:
    cut = """
  SELECT max(CASE WHEN cum - c < (n + 2) // 3 AND (n + 2) // 3 <= cum THEN v END) AS c1,
         max(CASE WHEN cum - c < (2 * n + 2) // 3 AND (2 * n + 2) // 3 <= cum THEN v END) AS c2
  FROM (SELECT v, c,
               CAST(sum(c) OVER (ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(sum(c) OVER () AS BIGINT) AS n
        FROM (SELECT {col} AS v, CAST(count(*) AS BIGINT) AS c FROM cust GROUP BY 1))
"""
    return f"""
WITH cust AS (
  SELECT o_custkey,
         CAST(max(epoch_us(o_orderdate) // 86400000000) AS BIGINT) AS rec,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon
  FROM orders GROUP BY 1),
rc AS ({cut.format(col='rec')}),
fc AS ({cut.format(col='freq')}),
mc AS ({cut.format(col='mon')})
SELECT CAST(CASE WHEN rec <= rc.c1 THEN 1 WHEN rec <= rc.c2 THEN 2 ELSE 3 END AS INTEGER) AS r_bucket,
       CAST(CASE WHEN freq <= fc.c1 THEN 1 WHEN freq <= fc.c2 THEN 2 ELSE 3 END AS INTEGER) AS f_bucket,
       CAST(CASE WHEN mon <= mc.c1 THEN 1 WHEN mon <= mc.c2 THEN 2 ELSE 3 END AS INTEGER) AS m_bucket,
       CAST(count(*) AS BIGINT) AS n_customers
FROM cust CROSS JOIN rc CROSS JOIN fc CROSS JOIN mc
GROUP BY 1, 2, 3
"""


def q_fk_fanout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out distribution of the two fact FK edges (staged for the
    round-5 rotation): mean/p50/p99/max children per parent — the
    decide-before-you-shuffle join-planning numbers
    (`operators/relational.fk_fanout_stats`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.fk_fanout_stats(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


def o_fk_fanout_stats() -> str:
    edge = """
  SELECT '{name}' AS edge, CAST(max(n) AS BIGINT) AS n_parents,
         CAST(max(children) AS BIGINT) AS n_children,
         round(max(children)::DOUBLE / max(n)::DOUBLE, 6) AS mean_fanout,
         round(CAST(sum((CASE WHEN cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum THEN v ELSE 0 END)
                        + (CASE WHEN cum - c < (n + 2) // 2 AND (n + 2) // 2 <= cum THEN v ELSE 0 END))
               AS BIGINT)::DOUBLE / 2.0, 1) AS p50_fanout,
         CAST(max(CASE WHEN cum - c < (99 * n + 99) // 100 AND (99 * n + 99) // 100 <= cum THEN v END)
              AS BIGINT) AS p99_fanout,
         CAST(max(mx) AS BIGINT) AS max_fanout
  FROM (SELECT v, c,
               CAST(sum(c) OVER (ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(sum(c) OVER () AS BIGINT) AS n,
               CAST(sum(v * c) OVER () AS BIGINT) AS children,
               CAST(max(v) OVER () AS BIGINT) AS mx
        FROM (SELECT v, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT CAST(count(*) AS BIGINT) AS v FROM {table} GROUP BY {key})
              GROUP BY 1))
"""
    return (
        edge.format(name="orders_per_customer", table="orders", key="o_custkey")
        + " UNION ALL "
        + edge.format(name="lineitems_per_order", table="lineitem", key="l_orderkey")
    )


def q_source_js_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source token mixes
    (staged for the round-5 rotation): the symmetric bounded companion
    to `source_kl_matrix` — every ln over an exact int64 product,
    private-token mass pulled out analytically as (Np-C)*ln2
    (`operators/textops.source_js_matrix`)."""
    return TX.source_js_matrix(load_table(spark, sf_dir, "documents"))


def o_source_js_matrix() -> str:
    return f"""
WITH toks AS (SELECT source AS g, {O.sql_tokens('text')} AS tk FROM documents),
tt AS (SELECT g, t.t AS tok, CAST(count(*) AS BIGINT) AS c
       FROM toks, unnest(tk) AS t(t) GROUP BY 1, 2),
tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM tt GROUP BY 1),
pr AS (
  SELECT a.g AS ga, b.g AS gb, ta.n AS np_, tb.n AS nq_,
         a.c AS cp, b.c AS cq
  FROM tt a
  JOIN tt b ON a.tok = b.tok AND a.g < b.g
  JOIN tot ta ON ta.g = a.g
  JOIN tot tb ON tb.g = b.g),
g AS (
  SELECT ga, gb, np_, nq_,
         CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(cp) AS BIGINT) AS cp_common,
         CAST(sum(cq) AS BIGINT) AS cq_common,
         sum(cp::DOUBLE * (ln((2 * cp * nq_)::DOUBLE)
                           - ln((cp * nq_ + cq * np_)::DOUBLE))) AS sp,
         sum(cq::DOUBLE * (ln((2 * cq * np_)::DOUBLE)
                           - ln((cq * np_ + cp * nq_)::DOUBLE))) AS sq
  FROM pr GROUP BY 1, 2, 3, 4)
SELECT ga AS source_a, gb AS source_b, n_common,
       round(0.5 * ((((np_ - cp_common)::DOUBLE * ln(2.0) + sp) / np_::DOUBLE)
                    + (((nq_ - cq_common)::DOUBLE * ln(2.0) + sq) / nq_::DOUBLE)),
             6) AS js_divergence
FROM g
"""


def q_weekday_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square weekday uniformity of order arrivals (staged for the
    round-5 rotation): (7*sum(o^2) - N^2)/N — numerator exact int64,
    weekday = (epoch_day+4)%7 so no engine calendar is consulted
    (`operators/timeseries.weekday_uniformity`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.weekday_uniformity(load_table(spark, sf_dir, "orders"))


def o_weekday_uniformity() -> str:
    return """
WITH g AS (
  SELECT CAST((epoch_us(o_orderdate) // 86400000000 + 4) % 7 AS INTEGER) AS dow,
         CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY 1),
t AS (SELECT CAST(sum(o) AS BIGINT) AS n, CAST(sum(o * o) AS BIGINT) AS so2,
             CAST(min(o) AS BIGINT) AS min_day, CAST(max(o) AS BIGINT) AS max_day
      FROM g)
SELECT n AS n_rows,
       round((7 * so2 - n * n)::DOUBLE / n::DOUBLE, 6) AS chisq,
       round(min_day::DOUBLE / n::DOUBLE, 9) AS min_day_share,
       round(max_day::DOUBLE / n::DOUBLE, 9) AS max_day_share
FROM t
"""


def q_yearly_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year order-value quartiles (staged for the round-5
    rotation): nearest-rank quartile cents on per-year DISTINCT-value
    frames — banded drift the revenue trend can't show
    (`operators/timeseries.yearly_value_quartiles`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.yearly_value_quartiles(load_table(spark, sf_dir, "orders"))


def o_yearly_value_quartiles() -> str:
    return """
WITH vc AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2),
cu AS (SELECT y, v, c,
              CAST(sum(c) OVER (PARTITION BY y ORDER BY v ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
       FROM vc),
tot AS (SELECT y, max(cum) AS n FROM cu GROUP BY 1),
j AS (SELECT cu.y, cu.v, cu.c, cu.cum, tot.n FROM cu JOIN tot USING (y))
SELECT y AS order_year, CAST(max(n) AS BIGINT) AS n_orders,
       CAST(max(CASE WHEN cum - c < (1 * n + 3) // 4 AND (1 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q1_cents,
       CAST(max(CASE WHEN cum - c < (2 * n + 3) // 4 AND (2 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q2_cents,
       CAST(max(CASE WHEN cum - c < (3 * n + 3) // 4 AND (3 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q3_cents
FROM j GROUP BY 1
"""


def q_value_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types (staged for the
    round-5 rotation): F statistic + eta^2 from exact int64 moments,
    per-group S^2/n the only per-group float
    (`operators/stats.value_anova`)."""
    return ST.value_anova(load_table(spark, sf_dir, "events"))


def o_value_anova() -> str:
    return """
WITH g AS (
  SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
  FROM events GROUP BY 1),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(s) AS BIGINT) AS ss, CAST(sum(q) AS BIGINT) AS qq,
         sum(s::DOUBLE * s::DOUBLE / n::DOUBLE) AS sg2n
  FROM g)
SELECT k AS n_groups, nn AS n_rows,
       CASE WHEN k > 1 AND nn > k AND (qq::DOUBLE - sg2n) > 0 THEN
         round(((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                / (k::DOUBLE - 1.0))
               / ((qq::DOUBLE - sg2n) / (nn::DOUBLE - k::DOUBLE)), 6) END AS f_stat,
       CASE WHEN k > 1 AND nn > k
                 AND ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                      + (qq::DOUBLE - sg2n)) > 0 THEN
         round((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
               / ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                  + (qq::DOUBLE - sg2n)), 6) END AS eta_sq
FROM t
"""


def q_lognormal_jb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera lognormality test on order values (staged for the
    round-5 rotation): skewness/kurtosis/JB of ln(exact cents) via
    single-pass raw moments (`operators/stats.lognormal_jb`)."""
    return ST.lognormal_jb(load_table(spark, sf_dir, "orders"))


def o_lognormal_jb() -> str:
    return """
WITH x AS (SELECT ln(CAST(round(o_totalprice * 100) AS BIGINT)::DOUBLE) AS x
           FROM orders),
t AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS s1,
             sum(x * x) AS s2, sum(x * x * x) AS s3,
             sum(x * x * x * x) AS s4
      FROM x),
c AS (SELECT n,
             s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE) AS m2,
             s3 / n::DOUBLE - 3.0 * (s1 / n::DOUBLE) * (s2 / n::DOUBLE)
               + 2.0 * (s1 / n::DOUBLE) * (s1 / n::DOUBLE) * (s1 / n::DOUBLE) AS m3,
             s4 / n::DOUBLE - 4.0 * (s1 / n::DOUBLE) * (s3 / n::DOUBLE)
               + 6.0 * (s1 / n::DOUBLE) * (s1 / n::DOUBLE) * (s2 / n::DOUBLE)
               - 3.0 * (s1 / n::DOUBLE) * (s1 / n::DOUBLE)
                     * (s1 / n::DOUBLE) * (s1 / n::DOUBLE) AS m4
      FROM t)
SELECT n AS n_rows,
       round(m3 / (m2 * sqrt(m2)), 6) AS log_skewness,
       round(m4 / (m2 * m2) - 3.0, 6) AS log_excess_kurtosis,
       round(n::DOUBLE / 6.0
             * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0), 6)
           AS jarque_bera
FROM c
"""


def q_hour_profile_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R^2 of the day x hour-of-day seasonal decomposition of event
    arrivals (staged for the round-5 rotation): completed grid,
    HUGEINT/DECIMAL(38) scaled sums of squares, one double division
    (`operators/timeseries.hour_profile_fit`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.hour_profile_fit(load_table(spark, sf_dir, "events"))


def o_hour_profile_fit() -> str:
    return """
WITH cells AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS di,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hh,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2),
td AS (SELECT di, CAST(sum(o) AS BIGINT) AS t_d FROM cells GROUP BY 1),
hm AS (SELECT hh, CAST(sum(o) AS BIGINT) AS h_h FROM cells GROUP BY 1),
grid AS (
  SELECT td.di, h.hh, CAST(coalesce(cells.o, 0) AS BIGINT) AS o,
         td.t_d, CAST(coalesce(hm.h_h, 0) AS BIGINT) AS h_h
  FROM td CROSS JOIN (SELECT unnest(range(0, 24)) AS hh) h
  LEFT JOIN cells ON cells.di = td.di AND cells.hh = h.hh
  LEFT JOIN hm ON hm.hh = h.hh),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS cc,
               CAST(count(DISTINCT di) AS BIGINT) AS n_days
        FROM grid),
g AS (
  SELECT nn, cc, n_days,
         sum((nn * o - t_d * h_h)::HUGEINT * (nn * o - t_d * h_h)::HUGEINT)
             AS ssres_sc,
         sum((cc * o - nn)::HUGEINT * (cc * o - nn)::HUGEINT) AS sstot_sc
  FROM grid CROSS JOIN tot GROUP BY 1, 2, 3)
SELECT nn AS n_events, n_days, cc AS n_cells,
       CASE WHEN sstot_sc > 0 THEN
         round(1.0 - (cc::HUGEINT * cc::HUGEINT * ssres_sc)::DOUBLE
                     / (nn::HUGEINT * nn::HUGEINT * sstot_sc)::DOUBLE, 6)
       END AS r2_seasonal
FROM g
"""


def q_return_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-lag return probability curve over active user-days (staged
    for the round-5 rotation): lag-k retention with a horizon-
    conditioned base — the habit-period detector
    (`operators/timeseries.return_curve`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.return_curve(load_table(spark, sf_dir, "events"))


def o_return_curve() -> str:
    return """
WITH ud AS (SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS di
            FROM events),
mx AS (SELECT CAST(max(di) AS BIGINT) AS dmax FROM ud),
lags AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS k),
base AS (SELECT a.user_id, a.di AS da, l.k
         FROM ud a CROSS JOIN lags l CROSS JOIN mx
         WHERE a.di + l.k <= mx.dmax),
m AS (SELECT k, CAST(count(*) AS BIGINT) AS n_returned
      FROM base b
      WHERE EXISTS (SELECT 1 FROM ud u
                    WHERE u.user_id = b.user_id AND u.di = b.da + b.k)
      GROUP BY 1),
bg AS (SELECT k, CAST(count(*) AS BIGINT) AS n_base FROM base GROUP BY 1)
SELECT CAST(bg.k AS INTEGER) AS lag_days, bg.n_base,
       CAST(coalesce(m.n_returned, 0) AS BIGINT) AS n_returned,
       round(coalesce(m.n_returned, 0)::DOUBLE / bg.n_base::DOUBLE, 9)
           AS return_rate
FROM bg LEFT JOIN m ON bg.k = m.k
"""


def q_user_lifecycle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle-stage census (single-visit/new/active/dormant) at the
    corpus horizon (staged for the round-5 rotation): pinned CASE
    order, pure epoch-microsecond comparisons
    (`operators/timeseries.user_lifecycle_census`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.user_lifecycle_census(load_table(spark, sf_dir, "events"))


def o_user_lifecycle_census() -> str:
    return """
WITH per AS (SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS first_u,
                    CAST(max(epoch_us(ts)) AS BIGINT) AS last_u,
                    CAST(count(*) AS BIGINT) AS n_ev
             FROM events GROUP BY 1),
mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS tmax FROM events),
st AS (SELECT CASE WHEN n_ev = 1 THEN 'single_visit'
                   WHEN first_u >= tmax - 604800000000 THEN 'new'
                   WHEN last_u >= tmax - 604800000000 THEN 'active'
                   ELSE 'dormant' END AS stage
       FROM per CROSS JOIN mx),
g AS (SELECT stage, CAST(count(*) AS BIGINT) AS n_users FROM st GROUP BY 1),
tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS t FROM g)
SELECT stage, n_users, round(n_users::DOUBLE / t::DOUBLE, 9) AS share
FROM g CROSS JOIN tot
"""


def q_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation bands for orders (staged for the
    round-5 rotation): exact e6 charge recompute, int64 tolerance-band
    comparisons, orphan-header count
    (`operators/relational.order_reconciliation`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.order_reconciliation(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def o_order_reconciliation() -> str:
    return """
WITH lines AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
                  * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT) AS line_e6
  FROM lineitem GROUP BY 1),
j AS (SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000 AS hdr_e6,
             l.line_e6
      FROM orders o LEFT JOIN lines l ON o.o_orderkey = l.l_orderkey)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN line_e6 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orphan_headers,
       CAST(sum(CASE WHEN line_e6 IS NOT NULL
                      AND 100 * abs(hdr_e6 - line_e6) <= 1 * hdr_e6
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
       CAST(sum(CASE WHEN line_e6 IS NOT NULL
                      AND 100 * abs(hdr_e6 - line_e6) <= 10 * hdr_e6
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_10pct,
       CAST(sum(CASE WHEN line_e6 IS NOT NULL
                      AND 100 * abs(hdr_e6 - line_e6) <= 50 * hdr_e6
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_50pct,
       CAST(max(CASE WHEN line_e6 IS NOT NULL THEN abs(hdr_e6 - line_e6) END)
            AS BIGINT) AS max_abs_diff_e6
FROM j
"""


def q_user_activity_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional overdispersion of per-user event counts (staged
    for the round-5 rotation): var/mean = (n*Q - S^2)/(n*S) from exact
    int64 moments plus the top-1 user share
    (`operators/timeseries.user_activity_dispersion`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.user_activity_dispersion(load_table(spark, sf_dir, "events"))


def o_user_activity_dispersion() -> str:
    return """
WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS q, CAST(max(c) AS BIGINT) AS mx
      FROM per)
SELECT n AS n_users, s AS n_events,
       round(s::DOUBLE / n::DOUBLE, 6) AS mean_events,
       round((n * q - s * s)::DOUBLE / (n * s)::DOUBLE, 6) AS dispersion_index,
       round(mx::DOUBLE / s::DOUBLE, 9) AS top1_share
FROM t
"""


def q_coldstart_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold-start rates at the exact horizon midpoint for users and
    event types (staged for the round-5 rotation): second-half
    entities with no first-half history by anti-join
    (`operators/timeseries.coldstart_rates`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.coldstart_rates(load_table(spark, sf_dir, "events"))


def o_coldstart_rates() -> str:
    axis = """
  SELECT '{name}' AS entity,
         (SELECT CAST(count(DISTINCT {col}) AS BIGINT)
          FROM events CROSS JOIN piv WHERE epoch_us(ts) > piv.p) AS n_second,
         (SELECT CAST(count(*) AS BIGINT) FROM
            (SELECT DISTINCT {col} AS k FROM events CROSS JOIN piv
             WHERE epoch_us(ts) > piv.p) s
          WHERE NOT EXISTS
            (SELECT 1 FROM events e CROSS JOIN piv
             WHERE epoch_us(e.ts) <= piv.p AND e.{col} = s.k)) AS n_cold
"""
    return f"""
WITH piv AS (
  SELECT CAST(min(epoch_us(ts)) AS BIGINT)
         + (CAST(max(epoch_us(ts)) AS BIGINT)
            - CAST(min(epoch_us(ts)) AS BIGINT)) // 2 AS p
  FROM events),
u AS ({axis.format(name='user', col='user_id')}),
t AS ({axis.format(name='event_type', col='event_type')}),
b AS (SELECT * FROM u UNION ALL SELECT * FROM t)
SELECT entity, n_second, n_cold,
       round(n_cold::DOUBLE / n_second::DOUBLE, 9) AS cold_rate
FROM b
"""


def q_event_bigram_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-bigram OOV rate across the horizon split (staged for
    the round-5 rotation): second-half transition pairs unseen in the
    first half, unweighted and mass-weighted
    (`operators/timeseries.event_bigram_oov`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.event_bigram_oov(load_table(spark, sf_dir, "events"))


def o_event_bigram_oov() -> str:
    return """
WITH piv AS (
  SELECT CAST(min(epoch_us(ts)) AS BIGINT)
         + (CAST(max(epoch_us(ts)) AS BIGINT)
            - CAST(min(epoch_us(ts)) AS BIGINT)) // 2 AS p
  FROM events),
seq AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS nxt,
         CAST(epoch_us(ts) AS BIGINT) AS u
  FROM events),
tr AS (SELECT CASE WHEN u <= piv.p THEN 1 ELSE 2 END AS half, cur, nxt,
              CAST(count(*) AS BIGINT) AS t
       FROM seq CROSS JOIN piv WHERE nxt IS NOT NULL GROUP BY 1, 2, 3),
second AS (SELECT cur, nxt, t FROM tr WHERE half = 2),
tot2 AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs_second,
                CAST(sum(t) AS BIGINT) AS mass_second
         FROM second),
oov AS (SELECT CAST(coalesce(count(*), 0) AS BIGINT) AS n_pairs_oov,
               CAST(coalesce(sum(t), 0) AS BIGINT) AS mass_oov
        FROM second s
        WHERE NOT EXISTS (SELECT 1 FROM tr f
                          WHERE f.half = 1 AND f.cur = s.cur AND f.nxt = s.nxt))
SELECT n_pairs_second, n_pairs_oov, mass_second, mass_oov,
       round(n_pairs_oov::DOUBLE / n_pairs_second::DOUBLE, 9) AS pair_oov_rate,
       round(mass_oov::DOUBLE / mass_second::DOUBLE, 9) AS mass_oov_rate
FROM tot2 CROSS JOIN oov
"""


def q_hour_circular_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular concentration R of each event type's hour-of-day
    profile + modal hour (staged for the round-5 rotation): cos/sin
    enter BOTH engines as driver-computed double literals — no runtime
    libm anywhere
    (`operators/timeseries.hour_circular_concentration`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.hour_circular_concentration(load_table(spark, sf_dir, "events"))


def o_hour_circular_concentration() -> str:
    import math

    cosl = ", ".join(repr(float(math.cos(2.0 * math.pi * h / 24.0))) for h in range(24))
    sinl = ", ".join(repr(float(math.sin(2.0 * math.pi * h / 24.0))) for h in range(24))
    return f"""
WITH g AS (
  SELECT event_type AS t,
         CAST((epoch_us(ts) // 3600000000) % 24 AS INTEGER) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
r AS (SELECT t, h, c,
             [{cosl}][h + 1] AS ch,
             [{sinl}][h + 1] AS sh,
             row_number() OVER (PARTITION BY t ORDER BY c DESC, h ASC) AS rn
      FROM g),
o AS (SELECT t, CAST(sum(c) AS BIGINT) AS n_events,
             sum(c::DOUBLE * ch) AS cc, sum(c::DOUBLE * sh) AS ss,
             CAST(max(CASE WHEN rn = 1 THEN h END) AS INTEGER) AS peak_hour
      FROM r GROUP BY 1)
SELECT t AS event_type, n_events, peak_hour,
       round(sqrt(cc * cc + ss * ss) / n_events::DOUBLE, 6) AS resultant_length
FROM o
"""


def q_conversion_rate_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z of the purchase share across horizon halves
    (staged for the round-5 rotation): pooled-proportion A/B
    arithmetic on exact counts, pinned float order
    (`operators/timeseries.conversion_rate_shift`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.conversion_rate_shift(load_table(spark, sf_dir, "events"))


def o_conversion_rate_shift() -> str:
    return """
WITH piv AS (
  SELECT CAST(min(epoch_us(ts)) AS BIGINT)
         + (CAST(max(epoch_us(ts)) AS BIGINT)
            - CAST(min(epoch_us(ts)) AS BIGINT)) // 2 AS p
  FROM events),
g AS (
  SELECT CAST(sum(CASE WHEN epoch_us(ts) <= p THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN epoch_us(ts) <= p AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS k1,
         CAST(sum(CASE WHEN epoch_us(ts) > p THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN epoch_us(ts) > p AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS k2
  FROM events CROSS JOIN piv)
SELECT n1, k1, n2, k2,
       CASE WHEN n1 > 0 AND n2 > 0 THEN round(k1::DOUBLE / n1::DOUBLE, 9) END
           AS rate_first,
       CASE WHEN n1 > 0 AND n2 > 0 THEN round(k2::DOUBLE / n2::DOUBLE, 9) END
           AS rate_second,
       CASE WHEN n1 > 0 AND n2 > 0
             AND ((k1 + k2)::DOUBLE / (n1::DOUBLE + n2::DOUBLE))
                 * (1.0 - (k1 + k2)::DOUBLE / (n1::DOUBLE + n2::DOUBLE))
                 * (1.0 / n1::DOUBLE + 1.0 / n2::DOUBLE) > 0 THEN
         round((k2::DOUBLE / n2::DOUBLE - k1::DOUBLE / n1::DOUBLE)
               / sqrt(((k1 + k2)::DOUBLE / (n1::DOUBLE + n2::DOUBLE))
                      * (1.0 - (k1 + k2)::DOUBLE / (n1::DOUBLE + n2::DOUBLE))
                      * (1.0 / n1::DOUBLE + 1.0 / n2::DOUBLE)), 6) END AS z
FROM g
"""


def q_brand_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year brand revenue growth table (staged for the
    round-5 rotation): exact e4 revenue per (brand, year) self-joined
    on (brand, year-1) — the mover report behind `rank_stability`
    (`operators/relational.brand_yoy_growth`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.brand_yoy_growth(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
    )


def o_brand_yoy_growth() -> str:
    return """
WITH rev AS (
  SELECT p.p_brand, CAST(year(o.o_orderdate) AS INTEGER) AS yr,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2)
SELECT a.p_brand, a.yr, a.rev_e4, b.rev_e4 AS prev_e4,
       round((a.rev_e4 - b.rev_e4)::DOUBLE / b.rev_e4::DOUBLE, 6) AS yoy_growth
FROM rev a JOIN rev b ON a.p_brand = b.p_brand AND a.yr = b.yr + 1
"""


def q_dup_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source purity of resolved dup clusters (staged for the round-5
    rotation): per-cluster source entropy with every ln over an exact
    count, purity by the integer test max(c)=n — intra-source template
    reuse vs cross-source syndication
    (`operators/dedup.cluster_source_purity`)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.8, max_df=NGRAM_MAX_DF)
    return DD.cluster_source_purity(docs, pairs)


def o_dup_cluster_purity() -> str:
    return f"""
WITH r AS MATERIALIZED (
  SELECT doc_id, component FROM ({o_dedup_resolve()})),
cs AS (SELECT r.component, d.source, CAST(count(*) AS BIGINT) AS c
       FROM r JOIN documents d ON d.doc_id = r.doc_id GROUP BY 1, 2),
per AS (SELECT component, CAST(sum(c) AS BIGINT) AS n,
               CAST(max(c) AS BIGINT) AS cmax,
               sum(c::DOUBLE * ln(c::DOUBLE)) AS sclc
        FROM cs GROUP BY 1 HAVING sum(c) > 1),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(CASE WHEN cmax = n THEN 1 ELSE 0 END) AS BIGINT) AS n_pure,
             sum(ln(n::DOUBLE) - sclc / n::DOUBLE) AS hsum
      FROM per)
SELECT n_clusters, n_pure,
       round(n_pure::DOUBLE / n_clusters::DOUBLE, 9) AS pure_share,
       round(hsum / n_clusters::DOUBLE, 6) AS mean_entropy
FROM g
"""


def q_single_source_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-supplier part census over observed trade (staged for the
    round-5 rotation): exact 1/2/3+ supplier buckets — the
    part-grain supply-risk roll-up
    (`operators/relational.single_source_parts`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.single_source_parts(load_table(spark, sf_dir, "lineitem"))


def o_single_source_parts() -> str:
    return """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
per AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS k FROM ps GROUP BY 1),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single,
             CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_two,
             CAST(sum(CASE WHEN k >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_three_plus
      FROM per)
SELECT n_parts, n_single, n_two, n_three_plus,
       round(n_single::DOUBLE / n_parts::DOUBLE, 9) AS single_share
FROM g
"""


def q_basket_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-brand basket-width histogram (staged for the round-5
    rotation): the fan-out bound behind `copurchase_lift` — exact 1/2/3+
    buckets and mean brands per order
    (`operators/relational.basket_diversity`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.basket_diversity(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_basket_diversity() -> str:
    return """
WITH ob AS (SELECT DISTINCT l.l_orderkey, p.p_brand
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
per AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k FROM ob GROUP BY 1),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(k) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
             CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_2,
             CAST(sum(CASE WHEN k >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_3plus
      FROM per)
SELECT n_orders, round(nb::DOUBLE / n_orders::DOUBLE, 6) AS mean_brands,
       n_1, n_2, n_3plus,
       round(n_1::DOUBLE / n_orders::DOUBLE, 9) AS single_brand_share
FROM g
"""


def q_priority_leadtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship lead time by order priority (staged for the round-5
    rotation): mean/median/p95 exact-day gaps located on per-priority
    DISTINCT-gap frames — the SLA evidence for the priority flag
    (`operators/relational.priority_leadtime`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.priority_leadtime(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


def o_priority_leadtime() -> str:
    return """
WITH vc AS (
  SELECT o.o_orderpriority AS pr,
         CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT)
         - CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
cu AS (SELECT pr, v, c,
              CAST(sum(c) OVER (PARTITION BY pr ORDER BY v ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
       FROM vc),
tot AS (SELECT pr, max(cum) AS n, CAST(sum(v * c) AS BIGINT) AS sv
        FROM cu GROUP BY 1),
j AS (SELECT cu.pr, cu.v, cu.c, cu.cum, tot.n, tot.sv
      FROM cu JOIN tot USING (pr))
SELECT pr AS o_orderpriority, CAST(max(n) AS BIGINT) AS n_items,
       round(max(sv)::DOUBLE / max(n)::DOUBLE, 6) AS mean_days,
       round(CAST(sum((CASE WHEN cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
                            THEN v ELSE 0 END)
                      + (CASE WHEN cum - c < (n + 2) // 2 AND (n + 2) // 2 <= cum
                              THEN v ELSE 0 END)) AS BIGINT)::DOUBLE / 2.0, 1)
           AS median_days,
       CAST(max(CASE WHEN cum - c < (19 * n + 19) // 20
                      AND (19 * n + 19) // 20 <= cum THEN v END) AS BIGINT)
           AS p95_days
FROM j GROUP BY 1
"""


def q_tax_discount_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of tax point x discount point on
    lineitem (staged for the round-5 rotation): OPERATOR REUSE — the
    same `stats.contingency_chisq` registered for priority x segment,
    pointed at two pricing knobs; V near 0 certifies the generators
    are independent (`operators/stats.contingency_chisq`)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_pt"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pt"),
    )
    return ST.contingency_chisq(li, "tax_pt", "disc_pt")


def o_tax_discount_chisq() -> str:
    return """
WITH base AS (SELECT CAST(round(l_tax * 100) AS BIGINT) AS r,
                     CAST(round(l_discount * 100) AS BIGINT) AS c
              FROM lineitem),
cells AS (SELECT r, c, CAST(count(*) AS BIGINT) AS o FROM base GROUP BY 1, 2),
rm AS (SELECT r, CAST(sum(o) AS BIGINT) AS rsum FROM cells GROUP BY 1),
cm AS (SELECT c, CAST(sum(o) AS BIGINT) AS csum FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
               CAST(count(DISTINCT r) AS BIGINT) AS nr,
               CAST(count(DISTINCT c) AS BIGINT) AS nc
        FROM cells),
grid AS (SELECT rm.r, cm.c, rm.rsum, cm.csum,
                CAST(coalesce(cells.o, 0) AS BIGINT) AS o
         FROM rm CROSS JOIN cm
         LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c),
t AS (SELECT nn, nr, nc,
             ((nn * o - rsum * csum)::HUGEINT
              * (nn * o - rsum * csum)::HUGEINT)::DOUBLE
             / (nn * rsum * csum)::DOUBLE AS term
      FROM grid CROSS JOIN tot),
g AS (SELECT max(nn) AS n_rows, max(nr) AS nr, max(nc) AS nc,
             sum(term) AS chi
      FROM t)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
       round(chi, 6) AS chisq,
       round(sqrt(chi / (n_rows::DOUBLE * (least(nr, nc) - 1)::DOUBLE)), 6)
           AS cramers_v
FROM g
"""


def q_weekend_value_mw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U of order value, weekend vs weekday band (staged
    for the round-5 rotation): OPERATOR REUSE — `stats.mann_whitney`
    pointed at exact cents with a (epoch_day+4)%7 band label; answers
    "do weekend orders differ in size" without any normality
    assumption (`operators/stats.mann_whitney`)."""
    day = (F.unix_micros(F.col("o_orderdate")) / F.lit(86_400_000_000)).cast("long")
    dow = (day + F.lit(4)) % F.lit(7)
    proj = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when((dow == 0) | (dow == 6), F.lit("weekend"))
        .otherwise(F.lit("weekday"))
        .alias("band"),
    )
    return ST.mann_whitney(proj, value_col="cents", group_col="band")


def o_weekend_value_mw() -> str:
    return """
WITH base AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN (epoch_us(o_orderdate) // 86400000000 + 4) % 7 IN (0, 6)
              THEN 'weekend' ELSE 'weekday' END AS g
  FROM orders),
sv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cg FROM base GROUP BY 1, 2),
vc AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1),
mid AS (SELECT v, c,
               CAST(2 * (sum(c) OVER (ORDER BY v ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
                    + c + 1 AS BIGINT) AS mr2
        FROM vc),
tots AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                CAST(sum(c * c * c - c) AS BIGINT) AS tie3
         FROM mid),
per AS (SELECT g, CAST(sum(cg) AS BIGINT) AS n1,
               CAST(sum(cg * mr2) AS BIGINT) AS s2
        FROM sv JOIN mid USING (v) GROUP BY 1)
SELECT g AS band, n1 AS n_group,
       CAST(n_total - n1 AS BIGINT) AS n_rest,
       CAST(s2 - n1 * (n1 + 1) AS BIGINT) AS u2,
       round(((s2 - n1 * (n1 + 1))::DOUBLE / 2.0
              - n1::DOUBLE * (n_total - n1)::DOUBLE / 2.0)
             / sqrt((n1::DOUBLE * (n_total - n1)::DOUBLE / 12.0)
                    * ((n_total::DOUBLE + 1.0)
                       - tie3::DOUBLE
                         / (n_total::DOUBLE * (n_total::DOUBLE - 1.0)))), 6) AS z,
       round(1.0 - (s2 - n1 * (n1 + 1))::DOUBLE
                   / (n1::DOUBLE * (n_total - n1)::DOUBLE), 6) AS rank_biserial
FROM per CROSS JOIN tots
"""


def q_lang_length_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of doc length across languages (staged for the
    round-5 rotation): OPERATOR REUSE — `stats.value_anova` pointed at
    n_chars by lang; eta^2 says whether per-language chunking budgets
    are justified (`operators/stats.value_anova`)."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("double").alias("len_chars"),
        F.col("lang"),
    )
    return ST.value_anova(docs, value_col="len_chars", group_col="lang")


def o_lang_length_anova() -> str:
    return """
WITH g AS (
  SELECT lang AS g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(n_chars * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(n_chars * 100) AS BIGINT)
                  * CAST(round(n_chars * 100) AS BIGINT)) AS BIGINT) AS q
  FROM documents GROUP BY 1),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(s) AS BIGINT) AS ss, CAST(sum(q) AS BIGINT) AS qq,
         sum(s::DOUBLE * s::DOUBLE / n::DOUBLE) AS sg2n
  FROM g)
SELECT k AS n_groups, nn AS n_rows,
       CASE WHEN k > 1 AND nn > k AND (qq::DOUBLE - sg2n) > 0 THEN
         round(((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                / (k::DOUBLE - 1.0))
               / ((qq::DOUBLE - sg2n) / (nn::DOUBLE - k::DOUBLE)), 6) END AS f_stat,
       CASE WHEN k > 1 AND nn > k
                 AND ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                      + (qq::DOUBLE - sg2n)) > 0 THEN
         round((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
               / ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                  + (qq::DOUBLE - sg2n)), 6) END AS eta_sq
FROM t
"""


def q_shard_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square uniformity of the md5 export-shard assignment over
    doc ids (staged for the round-5 rotation): the self-check that the
    deterministic hash scatters THIS id population
    (`operators/sketch.shard_uniformity`)."""
    from pythonvectordb_spark.operators import sketch as SK

    return SK.shard_uniformity(load_table(spark, sf_dir, "documents"))


def o_shard_uniformity() -> str:
    h = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16)"
    return f"""
WITH g AS (SELECT CAST({h} AS INTEGER) AS s, CAST(count(*) AS BIGINT) AS o
           FROM documents GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS k_used, CAST(sum(o) AS BIGINT) AS n,
             CAST(sum(o * o) AS BIGINT) AS so2,
             CAST(min(o) AS BIGINT) AS mn, CAST(max(o) AS BIGINT) AS mx
      FROM g)
SELECT n AS n_rows, k_used AS n_shards_hit,
       round((16 * so2 - n * n)::DOUBLE / n::DOUBLE, 6) AS chisq,
       round(mn::DOUBLE / n::DOUBLE, 9) AS min_share,
       round(mx::DOUBLE / n::DOUBLE, 9) AS max_share
FROM t
"""


def q_price_ending_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cents endings of order totals (staged for the round-5
    rotation): the psychological-pricing / provenance fingerprint —
    exact counts, fully tie-broken ranking
    (`operators/relational.price_ending_profile`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.price_ending_profile(load_table(spark, sf_dir, "orders"))


def o_price_ending_profile() -> str:
    return """
WITH g AS (SELECT CAST(CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS INTEGER)
                      AS ending,
                  CAST(count(*) AS BIGINT) AS c
           FROM orders GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM g),
r AS (SELECT ending, c,
             CAST(row_number() OVER (ORDER BY c DESC, ending ASC) AS INTEGER)
                 AS rank
      FROM g)
SELECT rank, ending, c AS n_orders,
       round(c::DOUBLE / t::DOUBLE, 9) AS share
FROM r CROSS JOIN tot WHERE rank <= 10
"""


def q_realized_vs_retail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized-vs-list price ratio per brand (staged for the round-5
    rotation): ratio of two exact integer sums — markup/markdown depth
    with no per-row division
    (`operators/relational.realized_vs_retail`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.realized_vs_retail(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_realized_vs_retail() -> str:
    return """
WITH g AS (
  SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS realized_cents,
         CAST(sum(CAST(round(l.l_quantity) AS BIGINT)
                  * CAST(round(p.p_retailprice * 100) AS BIGINT)) AS BIGINT)
             AS list_cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1)
SELECT p_brand, n_items, realized_cents, list_cents,
       round(realized_cents::DOUBLE / list_cents::DOUBLE, 9)
           AS realization_ratio
FROM g
"""


def q_segment_acctbal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment account-balance solvency profile (staged for the
    round-5 rotation): negative share + nearest-rank quartiles on
    distinct-cents frames
    (`operators/relational.segment_acctbal_profile`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.segment_acctbal_profile(load_table(spark, sf_dir, "customer"))


def o_segment_acctbal_profile() -> str:
    return """
WITH vc AS (SELECT c_mktsegment AS seg,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS c
            FROM customer GROUP BY 1, 2),
cu AS (SELECT seg, v, c,
              CAST(sum(c) OVER (PARTITION BY seg ORDER BY v ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
       FROM vc),
tot AS (SELECT seg, max(cum) AS n,
               CAST(sum(CASE WHEN v < 0 THEN c ELSE 0 END) AS BIGINT) AS n_neg
        FROM cu GROUP BY 1),
j AS (SELECT cu.seg, cu.v, cu.c, cu.cum, tot.n, tot.n_neg
      FROM cu JOIN tot USING (seg))
SELECT seg AS c_mktsegment, CAST(max(n) AS BIGINT) AS n_customers,
       CAST(max(n_neg) AS BIGINT) AS n_negative,
       round(max(n_neg)::DOUBLE / max(n)::DOUBLE, 9) AS negative_share,
       CAST(max(CASE WHEN cum - c < (1 * n + 3) // 4 AND (1 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q1_cents,
       CAST(max(CASE WHEN cum - c < (2 * n + 3) // 4 AND (2 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q2_cents,
       CAST(max(CASE WHEN cum - c < (3 * n + 3) // 4 AND (3 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q3_cents
FROM j GROUP BY 1
"""


def q_supplier_balance_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r between supplier account balance and booked revenue
    (staged for the round-5 rotation): exact moments with DECIMAL(38)
    cross-products, one pinned double assembly
    (`operators/relational.supplier_balance_revenue_corr`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.supplier_balance_revenue_corr(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "supplier")
    )


def o_supplier_balance_corr() -> str:
    return """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
             AS rev_e4
  FROM lineitem GROUP BY 1),
j AS (SELECT CAST(round(s.s_acctbal * 100) AS BIGINT) AS x, rev.rev_e4 AS y
      FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey),
g AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(x::HUGEINT * y::HUGEINT) AS sxy,
             sum(x::HUGEINT * x::HUGEINT) AS sxx,
             sum(y::HUGEINT * y::HUGEINT) AS syy
      FROM j)
SELECT n AS n_suppliers,
       CASE WHEN (n::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE > 0
             AND (n::HUGEINT * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE > 0 THEN
         round((n::HUGEINT * sxy - sx::HUGEINT * sy::HUGEINT)::DOUBLE
               / (sqrt((n::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE)
                  * sqrt((n::HUGEINT * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE)),
               6) END AS balance_revenue_corr
FROM g
"""


def q_dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-set Jaccard between the MinHash>=0.8 and SimHash<=3
    detectors (staged for the round-5 rotation): the method-risk audit
    behind running one family or both
    (`operators/dedup.pair_method_agreement`)."""
    docs = load_table(spark, sf_dir, "documents")
    return DD.pair_method_agreement(
        DD.minhash_lsh_pairs(docs, threshold=0.8),
        DD.simhash_pairs(docs, max_hamming=3),
    )


def o_dedup_method_agreement() -> str:
    return f"""
WITH m AS MATERIALIZED (
  SELECT DISTINCT id_a, id_b FROM ({o_dedup_minhash_lsh()})),
s AS MATERIALIZED (
  SELECT DISTINCT id_a, id_b FROM ({o_dedup_simhash()})),
na AS (SELECT CAST(count(*) AS BIGINT) AS n_minhash FROM m),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_simhash FROM s),
nboth AS (SELECT CAST(count(*) AS BIGINT) AS n_both
          FROM m JOIN s USING (id_a, id_b))
SELECT n_minhash, n_simhash, n_both,
       CAST(n_minhash + n_simhash - n_both AS BIGINT) AS n_union,
       CASE WHEN n_minhash + n_simhash - n_both > 0 THEN
         round(n_both::DOUBLE
               / (n_minhash + n_simhash - n_both)::DOUBLE, 9) END AS agreement
FROM na CROSS JOIN nb CROSS JOIN nboth
"""


def q_basket_size_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean order value by lines-per-order bucket (staged for the
    round-5 rotation): the cross-sell payoff curve — exact cents sums,
    one division per bucket
    (`operators/relational.basket_size_value`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.basket_size_value(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def o_basket_size_value() -> str:
    return """
WITH lc AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
            FROM lineitem GROUP BY 1),
j AS (SELECT CASE WHEN k = 1 THEN '1' WHEN k = 2 THEN '2'
                  WHEN k = 3 THEN '3' ELSE '4+' END AS lines_bucket,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN lc ON o.o_orderkey = lc.l_orderkey),
g AS (SELECT lines_bucket, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM j GROUP BY 1)
SELECT lines_bucket, n_orders, sum_cents,
       round(sum_cents::DOUBLE / (n_orders::DOUBLE * 100.0), 6) AS mean_value
FROM g
"""


def q_anomalous_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 days by absolute deviation from their own weekday's mean
    arrivals (staged for the round-5 rotation): the seasonality-aware
    incident shortlist; rank cut on ROUNDED deviations
    (`operators/timeseries.anomalous_days`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.anomalous_days(load_table(spark, sf_dir, "events"))


def o_anomalous_days() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS di,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1),
d2 AS (SELECT di, o, CAST((di + 4) % 7 AS INTEGER) AS dow FROM daily),
wk AS (SELECT dow, CAST(sum(o) AS BIGINT) AS s_w,
              CAST(count(*) AS BIGINT) AS k_w
       FROM d2 GROUP BY 1),
j AS (SELECT d2.di, d2.dow, d2.o,
             round(wk.s_w::DOUBLE / wk.k_w::DOUBLE, 6) AS weekday_mean,
             round(abs(d2.o::DOUBLE - wk.s_w::DOUBLE / wk.k_w::DOUBLE), 6)
                 AS abs_dev
      FROM d2 JOIN wk USING (dow)),
r AS (SELECT *, CAST(row_number() OVER (ORDER BY abs_dev DESC, di ASC)
                     AS INTEGER) AS rank
      FROM j)
SELECT rank, di AS epoch_day, dow, o AS n_events, weekday_mean, abs_dev
FROM r WHERE rank <= 5
"""


def q_heldout_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out add-1 unigram cross-entropy, even-id train / odd-id
    test (staged for the round-5 rotation): the LM eval loop as one
    job — CE factors so every ln is over an exact integer
    (`operators/textops.heldout_cross_entropy`)."""
    return TX.heldout_cross_entropy(load_table(spark, sf_dir, "documents"))


def o_heldout_cross_entropy() -> str:
    return f"""
WITH toks AS (SELECT (doc_id % 2 = 0) AS is_train, {O.sql_tokens('text')} AS tk
              FROM documents),
tt AS (SELECT is_train, t.t AS tok, CAST(count(*) AS BIGINT) AS c
       FROM toks, unnest(tk) AS t(t) GROUP BY 1, 2),
t1 AS (SELECT CAST(sum(c) AS BIGINT) AS n1, CAST(count(*) AS BIGINT) AS v1
       FROM tt WHERE is_train),
t2 AS (SELECT CAST(sum(c) AS BIGINT) AS n2 FROM tt WHERE NOT is_train),
common AS (SELECT CAST(coalesce(sum(b.c), 0) AS BIGINT) AS c2_common,
                  coalesce(sum(b.c::DOUBLE * ln((a.c + 1)::DOUBLE)), 0.0) AS s_ln
           FROM tt a JOIN tt b ON a.tok = b.tok AND a.is_train AND NOT b.is_train)
SELECT n1 AS n_train_tokens, v1 AS v_train, n2 AS n_test_tokens,
       round(ln((n1 + v1 + 1)::DOUBLE) - s_ln / n2::DOUBLE, 6)
           AS cross_entropy_nats,
       round((n2 - c2_common)::DOUBLE / n2::DOUBLE, 9) AS oov_mass
FROM t1 CROSS JOIN t2 CROSS JOIN common
"""


def q_quality_pass_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-gate verdict census (staged for the round-5
    rotation): kept share + first-failing-rule breakdown — the
    supplier scorecard over the oracled gate
    (`operators/curation.quality_pass_by_source`)."""
    return CU.quality_pass_by_source(load_table(spark, sf_dir, "documents"))


def o_quality_pass_by_source() -> str:
    return f"""
WITH v AS MATERIALIZED (
  SELECT doc_id, keep, reject_reason FROM ({o_quality_filter()})),
j AS (SELECT d.source,
             CASE WHEN v.keep THEN 'kept' ELSE v.reject_reason END AS verdict
      FROM v JOIN documents d ON d.doc_id = v.doc_id),
g AS (SELECT source, verdict, CAST(count(*) AS BIGINT) AS n_docs
      FROM j GROUP BY 1, 2),
tot AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS t FROM g GROUP BY 1)
SELECT g.source, g.verdict, g.n_docs,
       round(g.n_docs::DOUBLE / tot.t::DOUBLE, 9) AS share
FROM g JOIN tot USING (source)
"""


def q_token_rank_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 token rank movement between the even/odd corpus halves
    (staged for the round-5 rotation): the token-level mover report
    behind `heldout_cross_entropy`'s scalar
    (`operators/textops.token_rank_drift`)."""
    return TX.token_rank_drift(load_table(spark, sf_dir, "documents"))


def o_token_rank_drift() -> str:
    return f"""
WITH toks AS (SELECT (doc_id % 2 = 0) AS is_train, {O.sql_tokens('text')} AS tk
              FROM documents),
tt AS (SELECT is_train, t.t AS tok, CAST(count(*) AS BIGINT) AS c
       FROM toks, unnest(tk) AS t(t) GROUP BY 1, 2),
r AS (SELECT is_train, tok, c,
             CAST(row_number() OVER (PARTITION BY is_train
                   ORDER BY c DESC, tok ASC) AS INTEGER) AS rnk
      FROM tt),
k AS (SELECT * FROM r WHERE rnk <= 20),
a AS (SELECT tok, rnk AS rank_even, c AS n_even FROM k WHERE is_train),
b AS (SELECT tok, rnk AS rank_odd, c AS n_odd FROM k WHERE NOT is_train)
SELECT coalesce(a.tok, b.tok) AS tok,
       CAST(a.rank_even AS INTEGER) AS rank_even,
       CAST(b.rank_odd AS INTEGER) AS rank_odd,
       CAST(a.n_even AS BIGINT) AS n_even,
       CAST(b.n_odd AS BIGINT) AS n_odd,
       CAST(a.rank_even - b.rank_odd AS INTEGER) AS rank_delta
FROM a FULL OUTER JOIN b ON a.tok = b.tok
"""


def q_priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year chi-square of the priority mix vs the all-years mix
    (staged for the round-5 rotation): localizes WHEN a categorical
    mix moved — completed grid, DECIMAL(38)/HUGEINT squares
    (`operators/relational.priority_mix_drift`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.priority_mix_drift(load_table(spark, sf_dir, "orders"))


def o_priority_mix_drift() -> str:
    return """
WITH cells AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS y, o_orderpriority AS p,
         CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2),
ym AS (SELECT y, CAST(sum(o) AS BIGINT) AS n_y FROM cells GROUP BY 1),
pm AS (SELECT p, CAST(sum(o) AS BIGINT) AS c_p FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells),
grid AS (SELECT ym.y, ym.n_y, pm.c_p, tot.nn,
                CAST(coalesce(cells.o, 0) AS BIGINT) AS o
         FROM ym CROSS JOIN pm CROSS JOIN tot
         LEFT JOIN cells ON cells.y = ym.y AND cells.p = pm.p)
SELECT y AS order_year, CAST(max(n_y) AS BIGINT) AS n_orders,
       round(sum(((nn * o - n_y * c_p)::HUGEINT
                  * (nn * o - n_y * c_p)::HUGEINT)::DOUBLE
                 / (nn * n_y * c_p)::DOUBLE), 6) AS chisq_vs_global
FROM grid GROUP BY 1
"""


def q_customer_brand_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime brand breadth per customer (staged for the round-5
    rotation): loyalty-vs-explorer census — exact 1-2/3-5/6+ buckets
    (`operators/relational.customer_brand_breadth`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.customer_brand_breadth(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
    )


def o_customer_brand_breadth() -> str:
    return """
WITH cb AS (SELECT DISTINCT o.o_custkey, p.p_brand
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p ON l.l_partkey = p.p_partkey),
per AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS k FROM cb GROUP BY 1),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(k) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN k <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_narrow,
             CAST(sum(CASE WHEN k >= 3 AND k <= 5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_mid,
             CAST(sum(CASE WHEN k >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_wide
      FROM per)
SELECT n_customers,
       round(n_pairs::DOUBLE / n_customers::DOUBLE, 6) AS mean_brands,
       n_narrow, n_mid, n_wide,
       round(n_wide::DOUBLE / n_customers::DOUBLE, 9) AS wide_share
FROM g
"""


def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation export vs import revenue and the balance ratio
    (staged for the round-5 rotation): the macro roll-up of
    `bilateral_trade` — two nation-grain exact sums off one
    checkpointed fact frame
    (`operators/relational.nation_trade_balance`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.nation_trade_balance(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def o_nation_trade_balance() -> str:
    return """
WITH base AS (
  SELECT s.s_nationkey AS snk, c.c_nationkey AS cnk,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS r_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey),
exp AS (SELECT snk, CAST(sum(r_e4) AS BIGINT) AS export_e4 FROM base GROUP BY 1),
imp AS (SELECT cnk, CAST(sum(r_e4) AS BIGINT) AS import_e4 FROM base GROUP BY 1)
SELECT n.n_name,
       CAST(coalesce(exp.export_e4, 0) AS BIGINT) AS export_e4,
       CAST(coalesce(imp.import_e4, 0) AS BIGINT) AS import_e4,
       CAST(coalesce(exp.export_e4, 0) - coalesce(imp.import_e4, 0) AS BIGINT)
           AS balance_e4,
       CASE WHEN coalesce(imp.import_e4, 0) > 0 THEN
         round(coalesce(exp.export_e4, 0)::DOUBLE
               / coalesce(imp.import_e4, 0)::DOUBLE, 6) END
           AS export_import_ratio
FROM nation n
LEFT JOIN exp ON n.n_nationkey = exp.snk
LEFT JOIN imp ON n.n_nationkey = imp.cnk
"""


def q_brand_market_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier vs customer nations per brand (staged for the
    round-5 rotation): the replication-policy reach table
    (`operators/relational.brand_market_presence`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.brand_market_presence(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
    )


def o_brand_market_presence() -> str:
    return """
WITH base AS (
  SELECT p.p_brand, s.s_nationkey AS snk, c.c_nationkey AS cnk
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN part p ON l.l_partkey = p.p_partkey),
sup AS (SELECT p_brand, CAST(count(DISTINCT snk) AS BIGINT) AS n_supplier_nations
        FROM base GROUP BY 1),
cus AS (SELECT p_brand, CAST(count(DISTINCT cnk) AS BIGINT) AS n_customer_nations
        FROM base GROUP BY 1)
SELECT coalesce(sup.p_brand, cus.p_brand) AS p_brand,
       CAST(coalesce(sup.n_supplier_nations, 0) AS BIGINT) AS n_supplier_nations,
       CAST(coalesce(cus.n_customer_nations, 0) AS BIGINT) AS n_customer_nations
FROM sup FULL OUTER JOIN cus ON sup.p_brand = cus.p_brand
"""


def q_returnflag_quantity_mw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U of line quantity, each return flag vs the rest
    (staged for the round-5 rotation): OPERATOR REUSE — do returned
    lines ship systematically bigger quantities? Distribution-free,
    exact doubled midranks (`operators/stats.mann_whitney`)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_quantity")).cast("long").alias("qty_units"),
        F.col("l_returnflag"),
    )
    return ST.mann_whitney(li, value_col="qty_units", group_col="l_returnflag")


def o_returnflag_quantity_mw() -> str:
    return """
WITH base AS (SELECT CAST(round(l_quantity) AS BIGINT) AS v, l_returnflag AS g
              FROM lineitem),
sv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cg FROM base GROUP BY 1, 2),
vc AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1),
mid AS (SELECT v, c,
               CAST(2 * (sum(c) OVER (ORDER BY v ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
                    + c + 1 AS BIGINT) AS mr2
        FROM vc),
tots AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                CAST(sum(c * c * c - c) AS BIGINT) AS tie3
         FROM mid),
per AS (SELECT g, CAST(sum(cg) AS BIGINT) AS n1,
               CAST(sum(cg * mr2) AS BIGINT) AS s2
        FROM sv JOIN mid USING (v) GROUP BY 1)
SELECT g AS l_returnflag, n1 AS n_group,
       CAST(n_total - n1 AS BIGINT) AS n_rest,
       CAST(s2 - n1 * (n1 + 1) AS BIGINT) AS u2,
       round(((s2 - n1 * (n1 + 1))::DOUBLE / 2.0
              - n1::DOUBLE * (n_total - n1)::DOUBLE / 2.0)
             / sqrt((n1::DOUBLE * (n_total - n1)::DOUBLE / 12.0)
                    * ((n_total::DOUBLE + 1.0)
                       - tie3::DOUBLE
                         / (n_total::DOUBLE * (n_total::DOUBLE - 1.0)))), 6) AS z,
       round(1.0 - (s2 - n1 * (n1 + 1))::DOUBLE
                   / (n1::DOUBLE * (n_total - n1)::DOUBLE), 6) AS rank_biserial
FROM per CROSS JOIN tots
"""


def q_daypart_value_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across day-parts (staged for the
    round-5 rotation): OPERATOR REUSE — `stats.value_anova` grouped by
    an integer-hour CASE band (night/morning/afternoon/evening); eta^2
    says whether time-of-day pricing is real
    (`operators/stats.value_anova`)."""
    hh = (F.unix_micros(F.col("ts")) / F.lit(3_600_000_000)).cast("long") % F.lit(24)
    band = (
        F.when(hh < 6, F.lit("night"))
        .when(hh < 12, F.lit("morning"))
        .when(hh < 18, F.lit("afternoon"))
        .otherwise(F.lit("evening"))
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.col("value"), band.alias("daypart")
    )
    return ST.value_anova(ev, value_col="value", group_col="daypart")


def o_daypart_value_anova() -> str:
    return """
WITH g AS (
  SELECT CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 6 THEN 'night'
              WHEN (epoch_us(ts) // 3600000000) % 24 < 12 THEN 'morning'
              WHEN (epoch_us(ts) // 3600000000) % 24 < 18 THEN 'afternoon'
              ELSE 'evening' END AS g,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
  FROM events GROUP BY 1),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(s) AS BIGINT) AS ss, CAST(sum(q) AS BIGINT) AS qq,
         sum(s::DOUBLE * s::DOUBLE / n::DOUBLE) AS sg2n
  FROM g)
SELECT k AS n_groups, nn AS n_rows,
       CASE WHEN k > 1 AND nn > k AND (qq::DOUBLE - sg2n) > 0 THEN
         round(((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                / (k::DOUBLE - 1.0))
               / ((qq::DOUBLE - sg2n) / (nn::DOUBLE - k::DOUBLE)), 6) END AS f_stat,
       CASE WHEN k > 1 AND nn > k
                 AND ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                      + (qq::DOUBLE - sg2n)) > 0 THEN
         round((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
               / ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                  + (qq::DOUBLE - sg2n)), 6) END AS eta_sq
FROM t
"""


def q_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 vs IVF probe width (new round 5): the latency/recall
    trade-off curve of the coarse quantizer — `ann_recall_curve` sweeps
    the cutoff k at fixed nprobe; this sweeps nprobe ∈ {1,2,4,8} at
    fixed k on the TRAINED codebooks, telling an operator the cheapest
    probe width that clears a recall target
    (`operators/search.ann_nprobe_curve`)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ann_nprobe_curve(
        emb,
        FX.QUERY_VEC,
        FT.CENTROIDS_TRAINED,
        FT.PQ_CODEBOOKS_TRAINED,
        nprobes=(1, 2, 4, 8),
        k=10,
        rerank=100,
    )


def o_ivf_nprobe_curve(k: int = 10) -> str:
    cos = O.sql_cosine_float_lit(FX.QUERY_VEC, "embedding")
    points = []
    for np_ in (1, 2, 4, 8):
        ann = _o_ann_ivf_pq(
            FT.CENTROIDS_TRAINED, FT.PQ_CODEBOOKS_TRAINED, nprobe=np_, k=k
        ).strip()
        points.append(
            f"""
SELECT CAST({np_} AS INT) AS nprobe,
       CAST(count(*) AS BIGINT) AS n_overlap,
       round(count(*)::DOUBLE / {float(k)!r}, 6) AS recall
FROM ({ann}) a JOIN ex USING (vec_id)"""
        )
    body = "\nUNION ALL\n".join(points)
    return f"""
WITH ex AS (
  SELECT vec_id FROM (
    SELECT vec_id, round({cos}, 9) AS r9 FROM embeddings
    ORDER BY r9 DESC, vec_id ASC LIMIT {k})
)
{body}
"""


def q_nb_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the NB curation gate (new round 5):
    scored docs binned by the margin between the top two per-class log
    scores, accuracy per bin — the calibration audit behind
    `nb_lang_confusion`'s aggregate matrix: can the gate's confidence
    gate harder, or is the margin noise?
    (`operators/curation.nb_calibration_bins`)."""
    docs = load_table(spark, sf_dir, "documents")
    return CU.nb_calibration_bins(docs, (F.col("doc_id") % 2) == 0)


def o_nb_calibration_bins(bin_micros: int = 2_500_000, n_bins: int = 10) -> str:
    # same verified NB scoring chain as o_nb_lang_confusion; margins in
    # exact micros (scores are rounded-6 so round(score*1e6) is the
    # same integer in both engines), integer-division bins clamped
    return f"""
WITH t AS (SELECT doc_id, lang, {O.sql_tokens('text')} AS w,
                  doc_id % 2 = 0 AS is_tr FROM documents),
tok AS (SELECT doc_id, lang, is_tr, unnest(w) AS tok FROM t),
tr AS (SELECT * FROM tok WHERE is_tr),
te AS (SELECT * FROM tok WHERE NOT is_tr),
cond AS (SELECT lang AS cls, tok, CAST(count(*) AS BIGINT) AS c_tc
         FROM tr GROUP BY 1, 2),
clstok AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS tok_c
           FROM tr GROUP BY 1),
vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS V FROM tr),
ndocs AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS N FROM ndocs),
classes AS (
  SELECT cls, ln(n_docs::DOUBLE / N::DOUBLE) AS prior_ln, tok_c + V AS denom
  FROM ndocs JOIN clstok USING (cls) CROSS JOIN vocab CROSS JOIN tot
),
sc AS (
  SELECT te.doc_id, te.lang, c.cls,
         round(c.prior_ln
               + sum(ln((coalesce(cond.c_tc, 0) + 1)::DOUBLE
                        / c.denom::DOUBLE)), 6) AS score
  FROM te CROSS JOIN classes c
  LEFT JOIN cond ON cond.cls = c.cls AND cond.tok = te.tok
  GROUP BY 1, 2, 3, c.prior_ln
),
rk AS (
  SELECT doc_id, lang, cls,
         CAST(round(score * 1000000.0) AS BIGINT) AS micro,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cls ASC) AS rn
  FROM sc
),
b AS (
  SELECT least((top.m1 - snd.m2) // {bin_micros}, {n_bins}) AS bin,
         (top.pred = top.lang) AS ok
  FROM (SELECT doc_id, lang, cls AS pred, micro AS m1 FROM rk WHERE rn = 1) top
  JOIN (SELECT doc_id, micro AS m2 FROM rk WHERE rn = 2) snd USING (doc_id)
)
SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       round(sum(CASE WHEN ok THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS accuracy
FROM b GROUP BY 1
"""


def q_discount_quantity_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between line discount and quantity
    (new round 5): the tie-aware monotone-association test — do bigger
    lines actually get bigger discounts? Completes the correlation
    family (Pearson `supplier_balance_corr`, concordance `kendall_tau`)
    with the midrank estimator; ranks never materialize per row
    (`operators/stats.spearman_corr`)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("long").alias("disc"),
        F.round("l_quantity").cast("long").alias("qty"),
    )
    return ST.spearman_corr(li, "disc", "qty", n_label="n_rows")


def o_discount_quantity_spearman() -> str:
    return """
WITH pairs AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
         CAST(round(l_quantity) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS cxy
  FROM lineitem GROUP BY 1, 2
),
mx AS (
  SELECT x, CAST(2 * (sum(c) OVER (ORDER BY x ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
               + c + 1 AS BIGINT) AS mr2x
  FROM (SELECT x, CAST(sum(cxy) AS BIGINT) AS c FROM pairs GROUP BY 1)
),
my AS (
  SELECT y, CAST(2 * (sum(c) OVER (ORDER BY y ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
               + c + 1 AS BIGINT) AS mr2y
  FROM (SELECT y, CAST(sum(cxy) AS BIGINT) AS c FROM pairs GROUP BY 1)
),
j AS (SELECT cxy, mr2x, mr2y FROM pairs JOIN mx USING (x) JOIN my USING (y)),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_cells, CAST(sum(cxy) AS BIGINT) AS n,
             CAST(sum(cxy * mr2x) AS BIGINT) AS sx,
             CAST(sum(cxy * mr2y) AS BIGINT) AS sy,
             sum(cxy::HUGEINT * mr2x::HUGEINT * mr2y::HUGEINT) AS sxy,
             sum(cxy::HUGEINT * mr2x::HUGEINT * mr2x::HUGEINT) AS sxx,
             sum(cxy::HUGEINT * mr2y::HUGEINT * mr2y::HUGEINT) AS syy
      FROM j)
SELECT n AS n_rows, n_cells,
       CASE WHEN (n::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE > 0
             AND (n::HUGEINT * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE > 0
       THEN round((n::HUGEINT * sxy - sx::HUGEINT * sy::HUGEINT)::DOUBLE
                  / (sqrt((n::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE)
                     * sqrt((n::HUGEINT * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE)),
                  6)
       END AS spearman_rho
FROM g
"""


def q_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney smoothed bigram LM over the corpus (new
    round 5): absolute discount 0.75 with the freed mass backed off to
    the CONTINUATION unigram — the estimator an n-gram LM pipeline
    actually trains (Kneser & Ney 1995), completing the LM family next
    to `unigram_surprisal` / `heldout_cross_entropy` / `pmi_collocations`.
    All count inputs exact integers; top-20 cut on integer-exact
    (count, w1, w2) boundaries (`operators/textops.kneser_ney_bigrams`)."""
    return TX.kneser_ney_bigrams(load_table(spark, sf_dir, "documents"))


def o_kneser_ney_bigrams(top_n: int = 20) -> str:
    return f"""
WITH tok AS (SELECT {O.sql_tokens('text')} AS tk FROM documents),
big AS (SELECT tk[i] AS w1, tk[i + 1] AS w2
        FROM tok, unnest(range(1, len(tk))) AS r(i)),
pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY 1, 2),
lt AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
              CAST(count(*) AS BIGINT) AS n1r
       FROM pc GROUP BY 1),
ct AS (SELECT w2, CAST(count(*) AS BIGINT) AS ncont FROM pc GROUP BY 1),
tt AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM pc),
top AS (SELECT * FROM pc ORDER BY c DESC, w1 ASC, w2 ASC LIMIT {top_n})
SELECT CAST(row_number() OVER (ORDER BY c DESC, w1 ASC, w2 ASC) AS INTEGER) AS rank,
       w1, w2, c, cw1, n1r, ncont,
       round((c::DOUBLE - 0.75) / cw1::DOUBLE
             + 0.75 * n1r::DOUBLE / cw1::DOUBLE * ncont::DOUBLE
               / n_types::DOUBLE, 6) AS p_kn
FROM top JOIN lt USING (w1) JOIN ct USING (w2) CROSS JOIN tt
"""


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-corpus novel-shingle rate (new round 5): the
    content-freshness admission metric for continual-crawl curation —
    `incremental_dedup` answers "have we seen THIS doc", this answers
    "how much of this doc's CONTENT is new". Same doc_id % 11 batch
    convention; one left-anti equi-join on the shingle key, never
    doc x doc (`operators/curation.ngram_novelty`)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    batch = docs.filter(F.col("doc_id") % 11 == 0)
    return CU.ngram_novelty(corpus, batch, n=3)


def o_ngram_novelty() -> str:
    grams = O.sql_shingles_of("w", 3)
    return f"""
WITH cg AS (
  SELECT DISTINCT unnest({grams}) AS g
  FROM (SELECT {O.sql_tokens('text')} AS w FROM documents WHERE doc_id % 11 != 0)
),
bs AS (
  SELECT doc_id, {grams} AS gs
  FROM (SELECT doc_id, {O.sql_tokens('text')} AS w
        FROM documents WHERE doc_id % 11 = 0)
),
be AS (SELECT doc_id, unnest(gs) AS g FROM bs),
nv AS (
  SELECT be.doc_id, CAST(count(*) AS BIGINT) AS n_novel
  FROM be LEFT JOIN cg USING (g)
  WHERE cg.g IS NULL
  GROUP BY 1
)
SELECT bs.doc_id, CAST(len(gs) AS BIGINT) AS n_shingles,
       coalesce(nv.n_novel, 0) AS n_novel,
       round(CASE WHEN len(gs) > 0
                  THEN coalesce(nv.n_novel, 0)::DOUBLE / len(gs)::DOUBLE
             END, 6) AS novelty
FROM bs LEFT JOIN nv USING (doc_id)
"""


def q_source_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-level entropy rate in bits/byte (new round
    5): the compression-ratio quality proxy — boilerplate and generated
    filler compress far below natural prose. `source_entropy` measures
    WORD diversity; this measures the byte stream a compressor would
    see. Exact-int ln args, ln2 as a repr literal
    (`operators/curation.source_compressibility`)."""
    return CU.source_compressibility(load_table(spark, sf_dir, "documents"))


def o_source_compressibility() -> str:
    from pythonvectordb_spark.operators.curation import LN2_LIT

    return f"""
WITH ch AS (
  SELECT source, substr(text, CAST(i AS INT), 1) AS ch
  FROM documents, unnest(range(1, length(text) + 1)) AS r(i)
),
cc AS (SELECT source, ch, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2),
g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_chars,
             CAST(count(*) AS BIGINT) AS n_alphabet,
             sum(c::DOUBLE * ln(c::DOUBLE)) AS s_clnc
      FROM cc GROUP BY 1),
b AS (SELECT source, CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
      FROM documents GROUP BY 1)
SELECT source, n_chars, n_bytes, n_alphabet,
       round((n_chars::DOUBLE * ln(n_chars::DOUBLE) - s_clnc)
             / {LN2_LIT!r} / n_chars::DOUBLE, 6) AS bits_per_byte
FROM g JOIN b USING (source)
"""


# --------------------------------------------------------------------------
# new round 7
# --------------------------------------------------------------------------


def q_mllib_logreg_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib LogisticRegression trained text gate (new round 7, VERDICT
    r6 task 6): hashed bag-of-words -> linear model learning the
    above-mean-length quality rule, held-out accuracy and positive
    recall asserted as within-bound data in the `mllib_*` guarantee
    pattern; DuckDB recomputes the exact md5 test split and label
    counts (`indexing.logreg_text_gate`)."""
    from pythonvectordb_spark.indexing import logreg_text_gate

    return logreg_text_gate(load_table(spark, sf_dir, "documents"))


def o_mllib_logreg_gate() -> str:
    return """
WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS cnt,
                    CAST(sum(n_chars) AS BIGINT) AS tot_chars
             FROM documents),
t AS (SELECT doc_id, n_chars * cnt > tot_chars AS pos
      FROM documents CROSS JOIN tot
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 32, 1))::BIGINT % 5 = 0)
SELECT CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_test,
       CAST(1 AS BIGINT) AS accuracy_ok,
       CAST(1 AS BIGINT) AS pos_recall_ok
FROM t
"""


def q_value_wasserstein_timecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-Wasserstein drift between first-half and second-half
    calendar days per event type (new round 7, VERDICT r6 task 7): the
    real before/after deployment cut of `value_wasserstein_drift`'s
    A/A split, same DECIMAL(38,0) exact arithmetic
    (`operators/timeseries.value_wasserstein_timecut`)."""
    from pythonvectordb_spark.operators import timeseries as TS2

    return TS2.value_wasserstein_timecut(load_table(spark, sf_dir, "events"))


def o_value_wasserstein_timecut() -> str:
    return """
WITH b0 AS (SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v,
                   CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di
            FROM events),
mid AS (SELECT CAST((min(di) + max(di) + 1) // 2 AS BIGINT) AS mid_di FROM b0),
base AS (SELECT t, v, di < mid_di AS even FROM b0 CROSS JOIN mid),
pv AS (SELECT t, v,
              CAST(sum(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS ce,
              CAST(sum(CASE WHEN even THEN 0 ELSE 1 END) AS BIGINT) AS co
       FROM base GROUP BY 1, 2),
cur AS (SELECT t, v,
               CAST(sum(ce) OVER w AS BIGINT) AS cume,
               CAST(sum(co) OVER w AS BIGINT) AS cumo,
               CAST(sum(ce) OVER (PARTITION BY t) AS BIGINT) AS ne,
               CAST(sum(co) OVER (PARTITION BY t) AS BIGINT) AS no,
               lead(v) OVER (PARTITION BY t ORDER BY v ASC) AS vnext
        FROM pv
        WINDOW w AS (PARTITION BY t ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
g AS (SELECT t, CAST(max(ne) AS BIGINT) AS n_before,
             CAST(max(no) AS BIGINT) AS n_after,
             sum(CASE WHEN vnext IS NOT NULL THEN
                   CAST(vnext - v AS HUGEINT)
                   * CAST(abs(no * cume - ne * cumo) AS HUGEINT)
                 END) AS num
      FROM cur GROUP BY 1)
SELECT t AS event_type, n_before, n_after,
       CASE WHEN n_before > 0 AND n_after > 0 THEN
         round(coalesce(num::DOUBLE / (n_before::DOUBLE * n_after::DOUBLE), 0.0), 6)
       END AS w1_cents
FROM g
"""


def q_kmv_custkey_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style KMV set operations (new round 7): union and
    intersection estimates for the URGENT-priority vs HIGH-priority
    customer bases from one combined bottom-64 hash sketch, exact
    counts and relative error beside them — md5-derived internals so
    the sketch itself hash-matches (`operators/sketch.kmv_set_ops`)."""
    from pythonvectordb_spark.operators.sketch import kmv_set_ops

    orders = load_table(spark, sf_dir, "orders")
    return kmv_set_ops(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        orders.filter(F.col("o_orderpriority") == "2-HIGH"),
        "o_custkey",
    )


def o_kmv_custkey_overlap() -> str:
    from pythonvectordb_spark.operators.sketch import KMV_SPACE

    return f"""
WITH a AS (SELECT DISTINCT o_custkey AS k_ FROM orders
           WHERE o_orderpriority = '1-URGENT'),
b AS (SELECT DISTINCT o_custkey AS k_ FROM orders
      WHERE o_orderpriority = '2-HIGH'),
m AS (SELECT coalesce(a.k_, b.k_) AS k_,
             CASE WHEN a.k_ IS NULL THEN 0 ELSE 1 END AS in_a,
             CASE WHEN b.k_ IS NULL THEN 0 ELSE 1 END AS in_b
      FROM a FULL OUTER JOIN b ON a.k_ = b.k_),
kept AS (SELECT CAST(max(h) AS BIGINT) AS kth_hash,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(sum(in_a * in_b) AS BIGINT) AS n_both_kept
         FROM (SELECT ('0x' || substr(md5(CAST(k_ AS VARCHAR)), 1, 8))::BIGINT AS h,
                      in_a, in_b
               FROM m ORDER BY h ASC LIMIT 64)),
ex AS (SELECT CAST(sum(in_a) AS BIGINT) AS n_a_exact,
              CAST(sum(in_b) AS BIGINT) AS n_b_exact,
              CAST(count(*) AS BIGINT) AS n_union_exact,
              CAST(sum(in_a * in_b) AS BIGINT) AS n_inter_exact
       FROM m)
SELECT CAST(64 AS INT) AS k, n_a_exact, n_b_exact, n_union_exact, n_inter_exact,
       kth_hash, n_both_kept,
       round(CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                  ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END, 6) AS union_est,
       round(n_both_kept::DOUBLE / n_kept::DOUBLE, 6) AS jaccard_est,
       round((n_both_kept::DOUBLE / n_kept::DOUBLE)
             * (CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                     ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END), 6) AS inter_est,
       round(abs((CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                       ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END)
                 - n_union_exact::DOUBLE) / n_union_exact::DOUBLE, 6)
         AS union_rel_error
FROM ex CROSS JOIN kept
"""


def q_welch_ttest_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Welch t / Welch-Satterthwaite df / Cohen's d / Hedges' g
    over source doc lengths (new round 7): the parametric companion to
    `mann_whitney` with the effect sizes a corpus report quotes
    (`operators/stats.welch_ttest_matrix`)."""
    return ST.welch_ttest_matrix(load_table(spark, sf_dir, "documents"))


def o_welch_ttest_sources() -> str:
    return """
WITH per AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(n_chars) AS BIGINT) AS s,
                    CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
             FROM documents GROUP BY 1),
j AS (SELECT a.g AS ga, a.n AS na, a.s AS sa, a.ss AS ssa,
             b.g AS gb, b.n AS nb, b.s AS sb, b.ss AS ssb
      FROM per a JOIN per b ON a.g < b.g),
c AS (SELECT ga, gb, na, nb,
             sa::DOUBLE / na::DOUBLE AS m1,
             sb::DOUBLE / nb::DOUBLE AS m2,
             (ssa::DOUBLE - sa::DOUBLE * sa::DOUBLE / na::DOUBLE)
               / (na::DOUBLE - 1.0) AS v1,
             (ssb::DOUBLE - sb::DOUBLE * sb::DOUBLE / nb::DOUBLE)
               / (nb::DOUBLE - 1.0) AS v2
      FROM j),
e AS (SELECT ga, gb, na, nb, m1, m2, v1, v2,
             v1 / na::DOUBLE AS se1, v2 / nb::DOUBLE AS se2
      FROM c)
SELECT ga AS source_a, gb AS source_b, na AS n_a, nb AS n_b,
       round(m1, 6) AS mean_a, round(m2, 6) AS mean_b,
       round((m1 - m2) / sqrt(se1 + se2), 6) AS t_welch,
       round(((se1 + se2) * (se1 + se2))
             / (se1 * se1 / (na::DOUBLE - 1.0)
                + se2 * se2 / (nb::DOUBLE - 1.0)), 6) AS df_welch,
       round((m1 - m2) / sqrt(((na::DOUBLE - 1.0) * v1 + (nb::DOUBLE - 1.0) * v2)
                              / (na::DOUBLE + nb::DOUBLE - 2.0)), 6) AS cohen_d,
       round((1.0 - 3.0 / (4.0 * (na::DOUBLE + nb::DOUBLE) - 9.0))
             * ((m1 - m2) / sqrt(((na::DOUBLE - 1.0) * v1 + (nb::DOUBLE - 1.0) * v2)
                                 / (na::DOUBLE + nb::DOUBLE - 2.0))), 6) AS hedges_g
FROM e
"""


def q_dedup_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar marginal-homogeneity test between the MinHash>=0.8 and
    SimHash<=3 duplicate detectors' per-document flags (new round 7):
    the significance companion to `dedup_method_agreement`'s Jaccard —
    symmetric disagreement means the families see different duplicates
    (`operators/dedup.method_mcnemar`)."""
    docs = load_table(spark, sf_dir, "documents")
    return DD.method_mcnemar(
        docs,
        DD.minhash_lsh_pairs(docs, threshold=0.8),
        DD.simhash_pairs(docs, max_hamming=3),
    )


def o_dedup_mcnemar() -> str:
    return f"""
WITH m AS MATERIALIZED (
  SELECT DISTINCT id_a, id_b FROM ({o_dedup_minhash_lsh()})),
s AS MATERIALIZED (
  SELECT DISTINCT id_a, id_b FROM ({o_dedup_simhash()})),
fa AS (SELECT DISTINCT node AS doc_id
       FROM (SELECT unnest([id_a, id_b]) AS node FROM m) u),
fb AS (SELECT DISTINCT node AS doc_id
       FROM (SELECT unnest([id_a, id_b]) AS node FROM s) u),
base AS (SELECT CASE WHEN fa.doc_id IS NULL THEN 0 ELSE 1 END AS a,
                CASE WHEN fb.doc_id IS NULL THEN 0 ELSE 1 END AS b
         FROM documents d
         LEFT JOIN fa ON d.doc_id = fa.doc_id
         LEFT JOIN fb ON d.doc_id = fb.doc_id),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(a * b) AS BIGINT) AS n11,
             CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
             CAST(sum((1 - a) * b) AS BIGINT) AS n01,
             CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      FROM base)
SELECT n_docs, n11, n10, n01, n00,
       CASE WHEN n10 + n01 > 0 THEN
         round(((n10 - n01)::DOUBLE * (n10 - n01)::DOUBLE)
               / (n10 + n01)::DOUBLE, 6) END AS mcnemar_chi2,
       CASE WHEN n10 + n01 > 0 THEN
         round((abs((n10 - n01)::DOUBLE) - 1.0) * (abs((n10 - n01)::DOUBLE) - 1.0)
               / (n10 + n01)::DOUBLE, 6) END AS mcnemar_chi2_cc
FROM g
"""


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain,
    12 fixed power-iteration rounds vs the empirical state share (new
    round 7): the long-run behavioral equilibrium read against where
    traffic actually is (`operators/graph.markov_stationary`)."""
    from pythonvectordb_spark.operators.graph import markov_stationary

    return markov_stationary(load_table(spark, sf_dir, "events"))


def o_markov_stationary() -> str:
    return """
WITH ordered AS (
  SELECT event_type AS to_s,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS from_s
  FROM events),
pairs AS (SELECT from_s, to_s, CAST(count(*) AS BIGINT) AS c
          FROM ordered WHERE from_s IS NOT NULL GROUP BY 1, 2),
outc AS (SELECT from_s, CAST(sum(c) AS BIGINT) AS ct FROM pairs GROUP BY 1),
trans AS MATERIALIZED (
  SELECT from_s, to_s, c::DOUBLE / ct::DOUBLE AS p
  FROM pairs JOIN outc USING (from_s)),
states AS MATERIALIZED (
  SELECT DISTINCT s FROM (SELECT from_s AS s FROM trans
                          UNION ALL SELECT to_s FROM trans) u),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM states),
v0 AS MATERIALIZED (SELECT s, 1.0 / ns.n AS v FROM states CROSS JOIN ns),
r1 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v0 v ON t.from_s = v.s GROUP BY 1
),
tot1 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r1),
v1 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot1 x LEFT JOIN r1 r ON r.s = st.s
),
r2 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v1 v ON t.from_s = v.s GROUP BY 1
),
tot2 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r2),
v2 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot2 x LEFT JOIN r2 r ON r.s = st.s
),
r3 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v2 v ON t.from_s = v.s GROUP BY 1
),
tot3 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r3),
v3 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot3 x LEFT JOIN r3 r ON r.s = st.s
),
r4 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v3 v ON t.from_s = v.s GROUP BY 1
),
tot4 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r4),
v4 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot4 x LEFT JOIN r4 r ON r.s = st.s
),
r5 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v4 v ON t.from_s = v.s GROUP BY 1
),
tot5 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r5),
v5 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot5 x LEFT JOIN r5 r ON r.s = st.s
),
r6 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v5 v ON t.from_s = v.s GROUP BY 1
),
tot6 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r6),
v6 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot6 x LEFT JOIN r6 r ON r.s = st.s
),
r7 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v6 v ON t.from_s = v.s GROUP BY 1
),
tot7 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r7),
v7 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot7 x LEFT JOIN r7 r ON r.s = st.s
),
r8 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v7 v ON t.from_s = v.s GROUP BY 1
),
tot8 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r8),
v8 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot8 x LEFT JOIN r8 r ON r.s = st.s
),
r9 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v8 v ON t.from_s = v.s GROUP BY 1
),
tot9 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r9),
v9 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot9 x LEFT JOIN r9 r ON r.s = st.s
),
r10 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v9 v ON t.from_s = v.s GROUP BY 1
),
tot10 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r10),
v10 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot10 x LEFT JOIN r10 r ON r.s = st.s
),
r11 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v10 v ON t.from_s = v.s GROUP BY 1
),
tot11 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r11),
v11 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot11 x LEFT JOIN r11 r ON r.s = st.s
),
r12 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v11 v ON t.from_s = v.s GROUP BY 1
),
tot12 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r12),
v12 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot12 x LEFT JOIN r12 r ON r.s = st.s
),
emp AS (SELECT event_type AS s, CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1),
tote AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM events)
SELECT st.s AS event_type, e.n_events,
       round(e.n_events::DOUBLE / t.nt::DOUBLE, 6) AS empirical_share,
       round(v.v, 6) AS stationary_p
FROM states st
JOIN v12 v ON v.s = st.s
JOIN emp e ON e.s = st.s
CROSS JOIN tote t
"""


def q_adamic_adar_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the mutual-kNN embedding graph
    (new round 7): non-adjacent vector pairs ranked by shared-neighbor
    evidence sum 1/ln(deg) plus neighborhood Jaccard — the missed-merge
    candidates of the reciprocal top-5 graph
    (`operators/graph.adamic_adar_links`, `.mutual_knn_pairs`)."""
    from pythonvectordb_spark.operators.graph import (
        adamic_adar_links,
        mutual_knn_pairs,
    )

    return adamic_adar_links(mutual_knn_pairs(_emb(spark, sf_dir), k=5))


def o_adamic_adar_mutual_knn(k: int = 5) -> str:
    qv = O.sql_qvec("embedding")
    cos = (
        "(list_aggregate(list_transform(a.qv, (x, i) -> x::BIGINT * b.qv[i]::BIGINT), 'sum')::DOUBLE"
        " / (sqrt(list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)"
        " * sqrt(list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)))"
    )
    return f"""
WITH q AS (SELECT vec_id, {qv} AS qv FROM embeddings),
p AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb, {cos} AS score
  FROM q a CROSS JOIN q b
),
rk AS (
  SELECT qa, qb,
         row_number() OVER (PARTITION BY qa ORDER BY score DESC, qb ASC) AS rn
  FROM p
),
tk AS (SELECT qa AS a, qb AS b FROM rk WHERE rn <= {k + 1} AND qa != qb),
mp AS MATERIALIZED (
  SELECT e.a, e.b FROM tk e JOIN tk r ON e.a = r.b AND e.b = r.a
  WHERE e.a < e.b),
sym AS MATERIALIZED (
  SELECT a, b FROM mp UNION ALL SELECT b, a FROM mp),
deg AS MATERIALIZED (
  SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
cand AS (
  SELECT w.x, w.z, CAST(count(*) AS BIGINT) AS n_common,
         sum(1.0 / ln(d.deg::DOUBLE)) AS aa
  FROM (SELECT l.a AS x, l.b AS y, r.a AS z
        FROM sym l JOIN sym r ON l.b = r.b AND l.a < r.a) w
  JOIN deg d ON d.node = w.y
  GROUP BY 1, 2
),
nc AS (
  SELECT c.x, c.z, c.n_common, c.aa
  FROM cand c
  LEFT JOIN mp ON mp.a = c.x AND mp.b = c.z
  WHERE mp.a IS NULL
)
SELECT nc.x AS id_a, nc.z AS id_b, nc.n_common,
       da.deg AS deg_x, db.deg AS deg_z,
       round(nc.aa, 6) AS adamic_adar,
       round(nc.n_common::DOUBLE
             / (da.deg + db.deg - nc.n_common)::DOUBLE, 6)
         AS neighborhood_jaccard
FROM nc
JOIN deg da ON da.node = nc.x
JOIN deg db ON db.node = nc.z
"""


def q_hellinger_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance between first-half and second-half day
    value-bucket distributions per event type (new round 7): the
    bounded [0,1] member of the drift family next to KS and W1
    (`operators/timeseries.hellinger_value_drift`)."""
    from pythonvectordb_spark.operators import timeseries as TS2

    return TS2.hellinger_value_drift(load_table(spark, sf_dir, "events"))


def o_hellinger_value_drift() -> str:
    return """
WITH b0 AS (SELECT event_type AS t,
                   CAST(round(value * 100) AS BIGINT) // 10000 AS bkt,
                   CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di
            FROM events),
mid AS (SELECT CAST((min(di) + max(di) + 1) // 2 AS BIGINT) AS mid_di FROM b0),
base AS (SELECT t, bkt, di < mid_di AS before FROM b0 CROSS JOIN mid),
per AS (SELECT t, bkt,
               CAST(sum(CASE WHEN before THEN 1 ELSE 0 END) AS BIGINT) AS cb,
               CAST(sum(CASE WHEN before THEN 0 ELSE 1 END) AS BIGINT) AS ca
        FROM base GROUP BY 1, 2),
g AS (SELECT t, CAST(sum(cb) AS BIGINT) AS n_before,
             CAST(sum(ca) AS BIGINT) AS n_after,
             sum(sqrt((cb * ca)::DOUBLE)) AS s,
             CAST(count(*) AS BIGINT) AS n_buckets
      FROM per GROUP BY 1)
SELECT t AS event_type, n_before, n_after, n_buckets,
       round(s / sqrt(n_before::DOUBLE * n_after::DOUBLE), 6) AS bhattacharyya,
       round(sqrt(greatest(0.0, 1.0 - s / sqrt(n_before::DOUBLE * n_after::DOUBLE))), 6)
         AS hellinger
FROM g
"""


def q_gpd_tail_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold GPD tail fit per event type (new round 7):
    method-of-moments xi/beta over q95 exceedances and the
    1000-observation return level — the exceedance companion to
    `daily_max_gumbel` (`operators/timeseries.gpd_tail_fit`)."""
    from pythonvectordb_spark.operators import timeseries as TS2

    return TS2.gpd_tail_fit(load_table(spark, sf_dir, "events"))


def o_gpd_tail_fit() -> str:
    return """
WITH base AS (SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v
              FROM events),
thr AS (SELECT t, quantile_cont(v::DOUBLE, 0.95) AS u,
               CAST(count(*) AS BIGINT) AS n
        FROM base GROUP BY 1),
exc AS (SELECT b.t, thr.n, thr.u, b.v::DOUBLE - thr.u AS y
        FROM base b JOIN thr ON b.t = thr.t WHERE b.v::DOUBLE > thr.u),
g AS (SELECT t, n, u, CAST(count(*) AS BIGINT) AS n_exc,
             sum(y) AS sy, sum(y * y) AS syy
      FROM exc GROUP BY 1, 2, 3),
c AS (SELECT t, n, u, n_exc,
             sy / n_exc::DOUBLE AS m,
             (syy - sy * sy / n_exc::DOUBLE) / (n_exc::DOUBLE - 1.0) AS s2
      FROM g),
e AS (SELECT t, n, u, n_exc, m, s2,
             0.5 * (1.0 - m * m / s2) AS xi,
             0.5 * m * (m * m / s2 + 1.0) AS beta,
             n_exc::DOUBLE / n::DOUBLE AS zeta
      FROM c)
SELECT t AS event_type, n, n_exc, round(u, 6) AS u_cents,
       CASE WHEN n_exc > 1 AND s2 > 0.0 AND xi != 0.0
            THEN round(xi, 6) END AS gpd_xi,
       CASE WHEN n_exc > 1 AND s2 > 0.0 AND xi != 0.0
            THEN round(beta, 6) END AS gpd_beta,
       CASE WHEN n_exc > 1 AND s2 > 0.0 AND xi != 0.0
            THEN round(u + (beta / xi) * (pow(1000.0 * zeta, xi) - 1.0), 6)
            END AS rl1000_cents
FROM e
"""


def q_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-covariance Mahalanobis (value, hour) joint-outlier
    census per event type vs the chi-squared(2, 99%) threshold (new
    round 7): the multivariate companion to `event_outliers`
    (`operators/stats.mahalanobis_outliers`)."""
    return ST.mahalanobis_outliers(load_table(spark, sf_dir, "events"))


def o_mahalanobis_outliers() -> str:
    return """
WITH base AS (SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v,
                     CAST(hour(ts) AS BIGINT) AS h
              FROM events),
mom AS (SELECT t, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS svv,
               CAST(sum(h) AS BIGINT) AS sh, CAST(sum(h * h) AS BIGINT) AS shh
        FROM base GROUP BY 1),
momx AS (SELECT t, n,
                sv::DOUBLE / n::DOUBLE AS mv,
                (svv::DOUBLE - sv::DOUBLE * sv::DOUBLE / n::DOUBLE)
                  / (n::DOUBLE - 1.0) AS vv,
                sh::DOUBLE / n::DOUBLE AS mh,
                (shh::DOUBLE - sh::DOUBLE * sh::DOUBLE / n::DOUBLE)
                  / (n::DOUBLE - 1.0) AS vh
         FROM mom),
scored AS (SELECT b.t, m.n,
                  (b.v::DOUBLE - m.mv) * (b.v::DOUBLE - m.mv) / m.vv
                  + (b.h::DOUBLE - m.mh) * (b.h::DOUBLE - m.mh) / m.vh AS z2
           FROM base b JOIN momx m ON b.t = m.t),
g AS (SELECT t, n,
             CAST(sum(CASE WHEN z2 > 9.21034 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
             max(z2) AS mz
      FROM scored GROUP BY 1, 2)
SELECT t AS event_type, n, n_outliers,
       round(n_outliers::DOUBLE / n::DOUBLE, 6) AS outlier_rate,
       round(mz, 6) AS max_z2
FROM g
"""





def q_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank changepoint on daily revenue (new round 7): exact
    doubled-midrank algebra collapses the O(n^2) sgn double sum to one
    cumulative window — U_t, K, the break day and the classic
    2*exp(-6K^2/(n^3+n^2)) approximation
    (`operators/timeseries.pettitt_changepoint`)."""
    from pythonvectordb_spark.operators import timeseries as TS7

    return TS7.pettitt_changepoint(load_table(spark, sf_dir, "events"))


def o_pettitt_changepoint() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
gv AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM daily GROUP BY 1),
mr AS (SELECT cents,
              CAST(2 * (sum(cnt) OVER (ORDER BY cents ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
                   + cnt + 1 AS BIGINT) AS mr2
       FROM gv),
cum AS (SELECT di,
               CAST(row_number() OVER (ORDER BY di ASC) AS BIGINT) AS t,
               CAST(sum(mr2) OVER (ORDER BY di ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_mr2,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM daily JOIN mr USING (cents)),
u AS (SELECT di, t, n, CAST(cum_mr2 - t * (n + 1) AS BIGINT) AS u_t
      FROM cum WHERE t < n),
best AS (SELECT * FROM u ORDER BY abs(u_t) DESC, di ASC LIMIT 1)
SELECT n AS n_days, CAST(abs(u_t) AS BIGINT) AS k_stat, di AS changepoint_di,
       u_t AS u_at_change,
       round(least(1.0, 2.0 * exp(-6.0 * abs(u_t)::DOUBLE * abs(u_t)::DOUBLE
                 / (n::DOUBLE * n::DOUBLE * n::DOUBLE + n::DOUBLE * n::DOUBLE))),
             6) AS p_approx
FROM best
"""


def q_dow_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of daily revenue (new round
    7): centered 7-day MA trend kept exact by never dividing
    (detr7 = 7*cents - sum7), per-dow seasonal means and within-dow
    spreads from exact integer moments
    (`operators/timeseries.dow_seasonal_decomposition`)."""
    from pythonvectordb_spark.operators import timeseries as TS7

    return TS7.dow_seasonal_decomposition(load_table(spark, sf_dir, "events"))


def o_dow_seasonal_decomposition() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
win AS (SELECT di, cents,
               CAST(sum(cents) OVER w7 AS BIGINT) AS sum7,
               CAST(count(*) OVER w7 AS BIGINT) AS cnt7,
               CAST(max(di) OVER w7 - min(di) OVER w7 AS BIGINT) AS span7
        FROM daily
        WINDOW w7 AS (ORDER BY di ASC ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
detr AS (SELECT CAST(di % 7 AS BIGINT) AS dow,
                CAST(7 * cents - sum7 AS BIGINT) AS d7
         FROM win WHERE cnt7 = 7 AND span7 = 6),
g AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(d7) AS BIGINT) AS s, CAST(sum(d7 * d7) AS BIGINT) AS ss
      FROM detr GROUP BY 1)
SELECT dow, n_days,
       round(s::DOUBLE / n_days::DOUBLE / 700.0, 6) AS seasonal,
       CASE WHEN n_days > 1 THEN
         round(sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n_days::DOUBLE)
                    / (n_days::DOUBLE - 1.0)) / 700.0, 6) END AS within_sd
FROM g
"""


def q_ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness test, lags 1..7, on daily
    revenue (new round 7): exact DECIMAL(38,0) autocovariances of the
    n-scaled centered series, one double division per lag, Q as a
    single 7-term expression (`operators/timeseries.ljung_box_daily`)."""
    from pythonvectordb_spark.operators import timeseries as TS7

    return TS7.ljung_box_daily(load_table(spark, sf_dir, "events"))


def o_ljung_box_daily() -> str:
    # zero-variance guard mirrors the Spark side (timeseries.py `live`):
    # a constant series has g0 = 0 -> every rho, q_lb and crossed_99 NULL
    rho = "\n".join(
        f"  CASE WHEN g0 > 0 THEN g{k}::DOUBLE / g0::DOUBLE END AS r{k},"
        for k in range(1, 8)
    )
    qterms = " + ".join(f"r{k} * r{k} / (nd - {float(k)!r})" for k in range(1, 8))
    lags = ",\n".join(
        f"       lag(z, {k}) OVER (ORDER BY di ASC) AS z{k}" for k in range(1, 8)
    )
    gsums = ",\n".join(
        f"       sum(z * z{k}) AS g{k}" for k in range(1, 8)
    )
    return f"""
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
base AS (SELECT di,
                CAST(count(*) OVER () AS BIGINT) AS n,
                CAST(CAST(count(*) OVER () AS BIGINT) * cents
                     - CAST(sum(cents) OVER () AS BIGINT) AS HUGEINT) AS z
         FROM daily),
lagged AS (SELECT di, n, z,
{lags}
           FROM base),
agg AS (SELECT n, sum(z * z) AS g0,
{gsums}
        FROM lagged GROUP BY 1),
r AS (SELECT n, n::DOUBLE AS nd,
{rho}
             g0
      FROM agg)
SELECT n AS n_days,
       {", ".join(f"round(r{k}, 6) AS rho{k}" for k in range(1, 8))},
       round(nd * (nd + 2.0) * (0.0 + {qterms}), 6) AS q_lb,
       CASE WHEN g0 > 0 THEN
         CAST(CASE WHEN nd * (nd + 2.0) * (0.0 + {qterms}) > 18.475307
              THEN 1 ELSE 0 END AS BIGINT)
       END AS crossed_99
FROM r
"""


def q_logrank_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test on time-to-second-order, BUILDING vs
    MACHINERY (new round 7): exact at-risk/death counts per event time
    by cumulative subtraction, per-time hypergeometric E and V summed
    to the chi2(1) statistic
    (`operators/timeseries.logrank_segments`)."""
    from pythonvectordb_spark.operators import timeseries as TS7

    return TS7.logrank_segments(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


def o_logrank_segments() -> str:
    def risk(seg: str, sfx: str) -> str:
        return f"""
byt_{sfx} AS (SELECT time, CAST(count(*) AS BIGINT) AS c_all,
                     CAST(sum(event) AS BIGINT) AS c_ev
              FROM subj WHERE g = '{seg}' GROUP BY 1),
grid_{sfx} AS (SELECT time FROM times UNION SELECT time FROM byt_{sfx}),
r_{sfx} AS (SELECT g.time,
                   coalesce(b.c_ev, 0)::BIGINT AS d_{sfx},
                   CAST(sum(coalesce(b.c_all, 0)) OVER ()
                        - (sum(coalesce(b.c_all, 0)) OVER (ORDER BY g.time ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - coalesce(b.c_all, 0)) AS BIGINT) AS r_{sfx}
            FROM grid_{sfx} g LEFT JOIN byt_{sfx} b USING (time)),
ev_{sfx} AS (SELECT r_{sfx}.* FROM r_{sfx} JOIN times USING (time))"""

    return f"""
WITH seg AS (SELECT c_custkey AS ck, c_mktsegment AS g FROM customer
             WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
f AS (SELECT o_custkey AS ck, o_orderdate AS d,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
      FROM orders),
firsts AS (SELECT ck, min(CASE WHEN rn = 1 THEN d END) AS d1,
                  min(CASE WHEN rn = 2 THEN d END) AS d2
           FROM f WHERE rn <= 2 GROUP BY 1),
hz AS (SELECT max(o_orderdate) AS dmax FROM orders),
subj AS (SELECT g,
                CAST(CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
                     ELSE date_diff('day', d1, dmax) END AS BIGINT) AS time,
                CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS event
         FROM seg JOIN firsts USING (ck) CROSS JOIN hz),
times AS (SELECT DISTINCT time FROM subj WHERE event = 1),{risk("BUILDING", "a")},{risk("MACHINERY", "b")},
joined AS (SELECT ev_a.time, d_a, r_a, d_b, r_b
           FROM ev_a JOIN ev_b USING (time)),
terms AS (SELECT d_a, d_b, r_a, r_b,
                 (d_a + d_b)::DOUBLE AS d, r_a::DOUBLE AS ra, r_b::DOUBLE AS rb
          FROM joined),
ncnt AS (SELECT CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
         FROM subj),
tot AS (SELECT CAST(sum(d_a) AS BIGINT) AS events_a,
               CAST(sum(d_b) AS BIGINT) AS events_b,
               sum(d_a::DOUBLE - d * ra / (ra + rb)) AS ome,
               sum(CASE WHEN ra + rb > 1.0 THEN
                     d * (ra / (ra + rb)) * (rb / (ra + rb))
                       * (ra + rb - d) / (ra + rb - 1.0)
                   ELSE 0.0 END) AS vs
        FROM terms)
SELECT 'BUILDING' AS segment_a, 'MACHINERY' AS segment_b, n_a, n_b,
       events_a, events_b,
       round(ome, 6) AS o_minus_e, round(vs, 6) AS var_logrank,
       CASE WHEN vs > 0 THEN round(ome * ome / vs, 6) END AS z2_logrank,
       CASE WHEN vs > 0 THEN
         CAST(CASE WHEN ome * ome / vs > 6.634897 THEN 1 ELSE 0 END AS BIGINT)
       END AS crossed_99
FROM tot CROSS JOIN ncnt
"""


def q_ks_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise two-sample KS distances over all source pairs with
    Benjamini-Hochberg FDR control (new round 7): exact integer ECDF
    lattice, one-term asymptotic p from an exact rational ne*D^2, BH
    ranking over the pair frame (`operators/stats.ks_bh_fdr_matrix`)."""
    return ST.ks_bh_fdr_matrix(load_table(spark, sf_dir, "documents"))


def o_ks_bh_fdr() -> str:
    return """
WITH base AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v FROM documents),
counts AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
grid AS (SELECT DISTINCT v FROM base),
groups AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1),
filled AS (SELECT gr.g, gd.v, gr.n, coalesce(c.c, 0)::BIGINT AS c
           FROM grid gd CROSS JOIN groups gr
           LEFT JOIN counts c ON c.g = gr.g AND c.v = gd.v),
ecdf AS (SELECT g, v, n,
                CAST(sum(c) OVER (PARTITION BY g ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS cume
         FROM filled),
pairs AS (SELECT a.g AS source_a, b.g AS source_b, a.n AS n_a, b.n AS n_b,
                 CAST(max(abs(a.cume * b.n - b.cume * a.n)) AS BIGINT) AS d_num
          FROM ecdf a JOIN ecdf b ON a.v = b.v AND a.g < b.g
          GROUP BY 1, 2, 3, 4),
scored AS (SELECT source_a, source_b, n_a, n_b,
                  round(d_num::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE), 6) AS d_stat,
                  least(1.0, 2.0 * exp(-2.0 * (d_num::DOUBLE * d_num::DOUBLE
                        / ((n_a::DOUBLE + n_b::DOUBLE)
                           * n_a::DOUBLE * n_b::DOUBLE)))) AS p
           FROM pairs),
ranked AS (SELECT *,
                  CAST(row_number() OVER (ORDER BY p ASC, source_a ASC,
                                          source_b ASC) AS BIGINT) AS p_rank,
                  CAST(count(*) OVER () AS BIGINT) AS m
           FROM scored),
flagged AS (SELECT *,
                   p <= p_rank::DOUBLE * 0.05 / m::DOUBLE AS under
            FROM ranked),
kst AS (SELECT *,
               CAST(max(CASE WHEN under THEN p_rank ELSE 0 END) OVER ()
                    AS BIGINT) AS kstar
        FROM flagged)
SELECT source_a, source_b, n_a, n_b, d_stat,
       round(p, 6) AS p_ks, p_rank,
       round(p_rank::DOUBLE * 0.05 / m::DOUBLE, 6) AS bh_cut,
       CAST(CASE WHEN p_rank <= kstar THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM kst
"""


def q_stratification_deff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design effect of source-stratified sampling for mean document
    length (new round 7): exact per-stratum integer moments, within /
    total variance ratio under proportional allocation
    (`operators/stats.stratification_design_effect`)."""
    return ST.stratification_design_effect(load_table(spark, sf_dir, "documents"))


def o_stratification_deff() -> str:
    return """
WITH per AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS n_h,
                    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS s_h,
                    CAST(sum(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
                         AS BIGINT) AS ss_h
             FROM documents GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
               CAST(sum(n_h) AS BIGINT) AS n,
               CAST(sum(s_h) AS BIGINT) AS s,
               CAST(sum(ss_h) AS BIGINT) AS ss,
               sum(n_h::DOUBLE * (CASE WHEN n_h > 1 THEN
                     (ss_h::DOUBLE - s_h::DOUBLE * s_h::DOUBLE / n_h::DOUBLE)
                       / (n_h::DOUBLE - 1.0) END)) AS w_num
        FROM per)
SELECT n AS n_rows, n_strata,
       round(sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                  / (n::DOUBLE - 1.0)), 6) AS sd_total,
       round(sqrt(w_num / n::DOUBLE), 6) AS sd_within,
       CASE WHEN (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                 / (n::DOUBLE - 1.0) > 0.0 THEN
         round((w_num / n::DOUBLE)
               / ((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                  / (n::DOUBLE - 1.0)), 6) END AS deff,
       CASE WHEN (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                 / (n::DOUBLE - 1.0) > 0.0 THEN
         round((1.0 - (w_num / n::DOUBLE)
                / ((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                   / (n::DOUBLE - 1.0))) * 100.0, 6) END AS var_reduction_pct
FROM tot
"""


def q_quantization_saturation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 clamp/saturation audit of the K3 quantizer
    (new round 7): exact counts of boundary and high-half codes per
    dimension after normalize+quantize
    (`operators/stats.quantization_saturation`)."""
    return ST.quantization_saturation(load_table(spark, sf_dir, "embeddings"))


def o_quantization_saturation() -> str:
    qv = O.sql_qvec("embedding")
    return f"""
WITH q AS (SELECT {qv} AS qvec FROM embeddings),
px AS (SELECT unnest(list_transform(qvec, (x, i) ->
                {{'dim': i - 1, 'q': x}})) AS s
       FROM q),
flat AS (SELECT CAST(s.dim AS INTEGER) AS dim, CAST(s.q AS BIGINT) AS q
         FROM px),
g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN abs(q) = 127 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sat,
             CAST(sum(CASE WHEN abs(q) >= 64 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_high,
             CAST(min(q) AS INTEGER) AS min_q,
             CAST(max(q) AS INTEGER) AS max_q,
             CAST(sum(q) AS BIGINT) AS s_q
      FROM flat GROUP BY 1)
SELECT dim, n, n_sat,
       round(n_sat::DOUBLE / n::DOUBLE, 6) AS sat_rate,
       n_high,
       round(n_high::DOUBLE / n::DOUBLE, 6) AS high_rate,
       min_q, max_q,
       round(s_q::DOUBLE / n::DOUBLE, 6) AS mean_q
FROM g
"""


def q_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise word-3-gram vocabulary Jaccard + directed containments
    between sources (new round 7): exact distinct-set sizes and
    intersections via one equi-join on the shingle
    (`operators/textops.source_vocab_jaccard`)."""
    return TX.source_vocab_jaccard(load_table(spark, sf_dir, "documents"))


def o_source_vocab_jaccard() -> str:
    return f"""
WITH t AS (SELECT source, {O.sql_tokens('text')} AS w FROM documents),
sh AS (SELECT DISTINCT source AS g, unnest({O.sql_shingles_of('w', 3)}) AS tok
       FROM t),
sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS vocab FROM sh GROUP BY 1),
inter AS (SELECT a.g AS source_a, b.g AS source_b,
                 CAST(count(*) AS BIGINT) AS n_common
          FROM sh a JOIN sh b ON a.tok = b.tok AND a.g < b.g
          GROUP BY 1, 2),
grid AS (SELECT sa.g AS source_a, sa.vocab AS vocab_a,
                sb.g AS source_b, sb.vocab AS vocab_b
         FROM sizes sa JOIN sizes sb ON sa.g < sb.g),
out AS (SELECT source_a, source_b, vocab_a, vocab_b,
               coalesce(n_common, 0)::BIGINT AS n_common
        FROM grid LEFT JOIN inter USING (source_a, source_b))
SELECT source_a, source_b, vocab_a, vocab_b, n_common,
       round(n_common::DOUBLE
             / (vocab_a::DOUBLE + vocab_b::DOUBLE - n_common::DOUBLE), 6)
         AS jaccard,
       round(n_common::DOUBLE / vocab_a::DOUBLE, 6) AS containment_a,
       round(n_common::DOUBLE / vocab_b::DOUBLE, 6) AS containment_b
FROM out
"""


def q_nb_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest average precision (PR-AUC) per class for the NB gate
    (new round 7): the prevalence-aware twin of `nb_auc` from the same
    shared scores — exact tie-block cumulative counts, AP as the
    recall-weighted precision sum
    (`operators/curation.nb_average_precision`)."""
    docs = load_table(spark, sf_dir, "documents")
    return CU.nb_average_precision(docs, (F.col("doc_id") % 2) == 0)


def o_nb_average_precision() -> str:
    return f"""
WITH t AS (SELECT doc_id, lang, {O.sql_tokens('text')} AS w,
                  doc_id % 2 = 0 AS is_tr FROM documents),
tok AS (SELECT doc_id, lang, is_tr, unnest(w) AS tok FROM t),
tr AS (SELECT * FROM tok WHERE is_tr),
te AS (SELECT * FROM tok WHERE NOT is_tr),
cond AS (SELECT lang AS cls, tok, CAST(count(*) AS BIGINT) AS c_tc
         FROM tr GROUP BY 1, 2),
clstok AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS tok_c
           FROM tr GROUP BY 1),
vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS V FROM tr),
ndocs AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS N FROM ndocs),
classes AS (
  SELECT cls, ln(n_docs::DOUBLE / N::DOUBLE) AS prior_ln, tok_c + V AS denom
  FROM ndocs JOIN clstok USING (cls) CROSS JOIN vocab CROSS JOIN tot
),
sc AS (
  SELECT te.doc_id, te.lang, c.cls,
         round(c.prior_ln
               + sum(ln((coalesce(cond.c_tc, 0) + 1)::DOUBLE
                        / c.denom::DOUBLE)), 6) AS score
  FROM te CROSS JOIN classes c
  LEFT JOIN cond ON cond.cls = c.cls AND cond.tok = te.tok
  GROUP BY 1, 2, 3, c.prior_ln
),
base AS (SELECT cls, CAST(round(score * 1000000.0) AS BIGINT) AS v,
                CASE WHEN lang = cls THEN 1 ELSE 0 END AS pos
         FROM sc),
gv AS (SELECT cls, v, CAST(count(*) AS BIGINT) AS c,
              CAST(sum(pos) AS BIGINT) AS cp
       FROM base GROUP BY 1, 2),
cum AS (SELECT cls, c, cp,
               CAST(sum(c) OVER wd AS BIGINT) AS cum_n,
               CAST(sum(cp) OVER wd AS BIGINT) AS cum_tp
        FROM gv
        WINDOW wd AS (PARTITION BY cls ORDER BY v DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
per AS (SELECT cls, CAST(sum(cp) AS BIGINT) AS n_pos,
               CAST(sum(c) - sum(cp) AS BIGINT) AS n_neg,
               sum(cp::DOUBLE * cum_tp::DOUBLE / cum_n::DOUBLE) AS ap_num
        FROM cum GROUP BY 1)
SELECT cls, n_pos, n_neg,
       CASE WHEN n_pos > 0 THEN round(ap_num / n_pos::DOUBLE, 6) END
         AS average_precision,
       round(n_pos::DOUBLE / (n_pos::DOUBLE + n_neg::DOUBLE), 6) AS prevalence
FROM per
"""


def q_mllib_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib IsotonicRegression calibrating the char-length proxy into
    P(above-mean token count) (new round 7, the estimator step past
    `mllib_logreg_gate`): monotonicity and beats-base-rate Brier
    asserted as within-bound data in the `mllib_*` guarantee pattern;
    DuckDB recomputes the exact md5 test split and label counts
    (`indexing.isotonic_length_calibration`)."""
    from pythonvectordb_spark.indexing import isotonic_length_calibration

    return isotonic_length_calibration(load_table(spark, sf_dir, "documents"))


def o_mllib_isotonic_calibration() -> str:
    return f"""
WITH t AS (SELECT doc_id,
                  CAST(len({O.sql_tokens('text')}) AS BIGINT) AS ntok
           FROM documents),
tot AS (SELECT CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(ntok) AS BIGINT) AS tt FROM t),
te AS (SELECT doc_id, ntok * cnt > tt AS pos
       FROM t CROSS JOIN tot
       WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 32, 1))::BIGINT
             % 5 = 0)
SELECT CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_test,
       CAST(1 AS BIGINT) AS monotone_ok,
       CAST(1 AS BIGINT) AS brier_beats_base_ok
FROM te
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- round-7 front block (driver CORRECTNESS checks the FIRST 50
    # entries). Rotation per VERDICT r6 task 1: the 28 round-6 additions
    # (never driver-witnessed; all 28 hash-matched the judge's own sf0.01
    # sweep) lead; new round-7 queries enter BEHIND them (witness-ordering
    # contract, tests/test_registry_contract.py); the remainder of the
    # front-50 is the oldest-witnessed tail below. ---------------------
    "bpe_merge_table": q_bpe_merge_table,
    "bpe_trained_fertility": q_bpe_trained_fertility,
    "kruskal_wallis": q_kruskal_wallis,
    "brown_forsythe": q_brown_forsythe,
    "cohens_kappa": q_cohens_kappa,
    "ewma_daily_value": q_ewma_daily_value,
    "revenue_drawdown": q_revenue_drawdown,
    "sign_bit_recall": q_sign_bit_recall,
    "matryoshka_recall": q_matryoshka_recall,
    "embedding_anisotropy": q_embedding_anisotropy,
    "ndcg_ivf": q_ndcg_ivf,
    "mrr_lsh": q_mrr_lsh,
    "kmv_distinct_users": q_kmv_distinct_users,
    "bloom_fpr_purchases": q_bloom_fpr_purchases,
    "trade_hits": q_trade_hits,
    "burrows_delta": q_burrows_delta,
    "nb_auc": q_nb_auc,
    "holt_linear_forecast": q_holt_linear_forecast,
    "theil_sen_trend": q_theil_sen_trend,
    "label_centroid_affinity": q_label_centroid_affinity,
    "value_wasserstein_drift": q_value_wasserstein_drift,
    "daily_max_gumbel": q_daily_max_gumbel,
    "bpe_encode_pieces": q_bpe_encode_pieces,
    "friedman_types_by_day": q_friedman_types_by_day,
    "mann_kendall_trend": q_mann_kendall_trend,
    "nb_class_f1": q_nb_class_f1,
    "wilcoxon_week_over_week": q_wilcoxon_week_over_week,
    "chao1_vocab_richness": q_chao1_vocab_richness,
    # --- graduated round 7 (rows-only -> hash-matched sketch-internal
    # oracles, VERDICT r6 task 3): output schema changed, so they need
    # a fresh driver witness and sit in the never-witnessed prefix
    # (stale_until=7 in tests/test_registry_contract.py) -------------
    "approx_value_percentiles": q_approx_value_percentiles,
    "approx_distinct_events": q_approx_distinct_events,
    # --- new round 7 (enter at the BACK of the never-witnessed prefix,
    # per the witness-ordering contract; 28 + 2 graduated + 20 new fill
    # the round-7 front-50 exactly) ----------------------------------
    "mllib_logreg_gate": q_mllib_logreg_gate,
    "value_wasserstein_timecut": q_value_wasserstein_timecut,
    "kmv_custkey_overlap": q_kmv_custkey_overlap,
    "welch_ttest_sources": q_welch_ttest_sources,
    "dedup_mcnemar": q_dedup_mcnemar,
    "markov_stationary": q_markov_stationary,
    "adamic_adar_mutual_knn": q_adamic_adar_mutual_knn,
    "hellinger_value_drift": q_hellinger_value_drift,
    "gpd_tail_fit": q_gpd_tail_fit,
    "mahalanobis_outliers": q_mahalanobis_outliers,
    "pettitt_changepoint": q_pettitt_changepoint,
    "dow_seasonal_decomposition": q_dow_seasonal_decomposition,
    "ljung_box_daily": q_ljung_box_daily,
    "logrank_segments": q_logrank_segments,
    "ks_bh_fdr": q_ks_bh_fdr,
    "stratification_deff": q_stratification_deff,
    "quantization_saturation": q_quantization_saturation,
    "source_vocab_jaccard": q_source_vocab_jaccard,
    "nb_average_precision": q_nb_average_precision,
    "mllib_isotonic_calibration": q_mllib_isotonic_calibration,
    # --- previously driver-witnessed entries, ordered by the round of
    # their LATEST green CORRECTNESS row ascending (oldest witness first),
    # so any front-50 slots left over re-witness the stalest entries.
    # All remain covered every round by tests/test_oracle_parity.py at
    # sf0.001. --------------------------------------------------------
    # -- latest driver witness: round 1 --
    "knn_search": q_knn_search,
    "knn_search_filtered": q_knn_search_filtered,
    "knn_search_float": q_knn_search_float,
    "get_vector": q_get_vector,
    "get_vectors": q_get_vectors,
    "quantize_vectors": q_quantize_vectors,
    "knn_join": q_knn_join,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_filtered": q_ann_ivf_filtered,
    "knn_l2": q_knn_l2,
    "knn_mips": q_knn_mips,
    "add_vectors": q_add_vectors,
    "delete_vectors": q_delete_vectors,
    "upsert_vectors": q_upsert_vectors,
    "normalize_vectors": q_normalize_vectors,
    "vector_stats": q_vector_stats,
    "label_centroids": q_label_centroids,
    "udtf_token_stats": q_udtf_token_stats,
    "label_qsum_grouped_agg": q_label_qsum_grouped_agg,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "simhash_fingerprints": q_simhash_fingerprints,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "dedup_resolve": q_dedup_resolve,
    "pipeline_clean_corpus": q_pipeline_clean_corpus,
    "token_counts": q_token_counts,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "rolling_fingerprint": q_rolling_fingerprint,
    "tfidf_terms": q_tfidf_terms,
    "multimodal_join": q_multimodal_join,
    "media_features": q_media_features,
    "media_features_arrow": q_media_features_arrow,
    "media_resize": q_media_resize,
    "media_frame_sample": q_media_frame_sample,
    "pricing_summary": q_pricing_summary,
    "part_brand_stats": q_part_brand_stats,
    "forecast_revenue": q_forecast_revenue,
    "shipping_priority": q_shipping_priority,
    "regional_revenue": q_regional_revenue,
    "bilateral_trade": q_bilateral_trade,
    "customer_distribution": q_customer_distribution,
    "brand_revenue_share": q_brand_revenue_share,
    "customer_order_running": q_customer_order_running,
    "mktsegment_rollup": q_mktsegment_rollup,
    "order_priority_counts": q_order_priority_counts,
    # -- latest driver witness: round 2 --
    "ann_lsh_multiprobe": q_ann_lsh_multiprobe,
    "distinct_agg_stats": q_distinct_agg_stats,
    "salted_segment_revenue": q_salted_segment_revenue,
    "events_tumbling": q_events_tumbling,
    "large_volume_orders": q_large_volume_orders,
    "brand_size_revenue": q_brand_size_revenue,
    "orders_priority_pivot": q_orders_priority_pivot,
    "orders_priority_unpivot": q_orders_priority_unpivot,
    "props_json_stats": q_props_json_stats,
    "top_dims_per_vector": q_top_dims_per_vector,
    "nation_market_share": q_nation_market_share,
    "returned_items": q_returned_items,
    "customer_order_frame": q_customer_order_frame,
    "event_type_medians": q_event_type_medians,
    "events_value_histogram": q_events_value_histogram,
    "small_quantity_revenue": q_small_quantity_revenue,
    "idle_rich_customers": q_idle_rich_customers,
    "customer_quartiles": q_customer_quartiles,
    "embedding_dimension_stats": q_embedding_dimension_stats,
    "bpe_token_counts": q_bpe_token_counts,
    "latest_event_per_user": q_latest_event_per_user,
    "deterministic_sample": q_deterministic_sample,
    "adjacent_doc_similarity": q_adjacent_doc_similarity,
    "event_transitions": q_event_transitions,
    "purchase_click_interval_join": q_purchase_click_interval_join,
    "moving_window_stats": q_moving_window_stats,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "scd2_user_state": q_scd2_user_state,
    "user_event_paths": q_user_event_paths,
    "event_outliers": q_event_outliers,
    "events_grouping_sets": q_events_grouping_sets,
    "decontaminate_corpus": q_decontaminate_corpus,
    "pii_scrub_stats": q_pii_scrub_stats,
    "stratified_corpus_sample": q_stratified_corpus_sample,
    "dup_cluster_sizes": q_dup_cluster_sizes,
    "corpus_token_share": q_corpus_token_share,
    "ann_pq": q_ann_pq,
    # -- latest driver witness: round 3 --
    "event_value_regression": q_event_value_regression,
    "ann_ivf_pq": q_ann_ivf_pq,
    "semantic_dedup": q_semantic_dedup,
    "pack_sequences": q_pack_sequences,
    "build_vocab": q_build_vocab,
    "encode_tokens": q_encode_tokens,
    "corpus_stats": q_corpus_stats,
    "incremental_dedup": q_incremental_dedup,
    "value_equidepth_bins": q_value_equidepth_bins,
    "bm25_rank": q_bm25_rank,
    "top_events_per_user": q_top_events_per_user,
    "weighted_sample_per_lang": q_weighted_sample_per_lang,
    "bigram_surprisal": q_bigram_surprisal,
    "event_funnel": q_event_funnel,
    "retention_cohorts": q_retention_cohorts,
    "pq_encode": q_pq_encode,
    "ann_lsh": q_ann_lsh,
    "ann_pq_trained": q_ann_pq_trained,
    "ann_ivf_pq_trained": q_ann_ivf_pq_trained,
    "matview_user_spend_twin": q_matview_user_spend_twin,
    "dedup_gate_twin": q_dedup_gate_twin,
    "events_by_hour": q_events_by_hour,
    "nation_customer_stats": q_nation_customer_stats,
    "value_percentiles": q_value_percentiles,
    "events_cube": q_events_cube,
    "customer_set_ops": q_customer_set_ops,
    "asof_purchase_attribution": q_asof_purchase_attribution,
    "sessionize_events": q_sessionize_events,
    "hypertable_rollup": q_hypertable_rollup,
    "cms_user_estimates": q_cms_user_estimates,
    "zorder_pruning": q_zorder_pruning,
    "snapshot_diff": q_snapshot_diff,
    "bloom_prune_join": q_bloom_prune_join,
    "boilerplate_share": q_boilerplate_share,
    "repetition_stats": q_repetition_stats,
    "chunk_documents": q_chunk_documents,
    "quality_filter": q_quality_filter,
    "unigram_surprisal": q_unigram_surprisal,
    "lateship_priority_counts": q_lateship_priority_counts,
    "knn_classify": q_knn_classify,
    "top_brands_by_share": q_top_brands_by_share,
    "promo_revenue_share": q_promo_revenue_share,
    "top_supplier_revenue": q_top_supplier_revenue,
    "heavy_part_suppliers": q_heavy_part_suppliers,
    "sole_late_suppliers": q_sole_late_suppliers,
    "nation_profit_trend": q_nation_profit_trend,
    "min_cost_supplier": q_min_cost_supplier,
    # -- latest driver witness: round 4 --
    "hybrid_rrf_search": q_hybrid_rrf_search,
    "training_shard_stats": q_training_shard_stats,
    "source_token_caps": q_source_token_caps,
    "event_key_skew": q_event_key_skew,
    "trade_pagerank": q_trade_pagerank,
    "fuzzy_source_pairs": q_fuzzy_source_pairs,
    "event_value_mad": q_event_value_mad,
    "zone_pruned_scan": q_zone_pruned_scan,
    "approx_percentile_error": q_approx_percentile_error,
    "media_image_stats": q_media_image_stats,
    "dedup_simhash_wide": q_dedup_simhash_wide,
    "duplicate_spans": q_duplicate_spans,
    "media_image_resize": q_media_image_resize,
    "approx_distinct_error": q_approx_distinct_error,
    "contamination_spans": q_contamination_spans,
    "scrub_spans": q_scrub_spans,
    "source_mixture": q_source_mixture,
    "interleave_audit": q_interleave_audit,
    "mutual_knn": q_mutual_knn,
    "importance_weights": q_importance_weights,
    "media_audio_stats": q_media_audio_stats,
    "media_audio_resample": q_media_audio_resample,
    "corpus_drift": q_corpus_drift,
    "hard_negatives": q_hard_negatives,
    "dup_source_matrix": q_dup_source_matrix,
    "containment_pairs": q_containment_pairs,
    "split_leakage": q_split_leakage,
    "nb_lang_confusion": q_nb_lang_confusion,
    "perplexity_buckets": q_perplexity_buckets,
    "zipf_fit": q_zipf_fit,
    "cluster_split_leakage": q_cluster_split_leakage,
    "epoch_plan": q_epoch_plan,
    "dedup_inflation": q_dedup_inflation,
    "quantization_recall": q_quantization_recall,
    "minhash_precision": q_minhash_precision,
    "contrastive_triplets": q_contrastive_triplets,
    "dq_violations": q_dq_violations,
    "tokenizer_fertility": q_tokenizer_fertility,
    "bpe_merge_pairs": q_bpe_merge_pairs,
    "unimax_epochs": q_unimax_epochs,
    "mmr_rerank": q_mmr_rerank,
    "ann_recall_curve": q_ann_recall_curve,
    "k_anonymity": q_k_anonymity,
    "resolve_keep_best": q_resolve_keep_best,
    "rbo_overlap": q_rbo_overlap,
    "ngram_coverage": q_ngram_coverage,
    "dedup_threshold_curve": q_dedup_threshold_curve,
    "minhash_estimate_error": q_minhash_estimate_error,
    "supplier_part_counts": q_supplier_part_counts,
    # -- latest driver witness: round 5 --
    "neyman_allocation": q_neyman_allocation,
    "source_entropy": q_source_entropy,
    "embedding_drift": q_embedding_drift,
    "dedup_graph_triangles": q_dedup_graph_triangles,
    "heaps_law": q_heaps_law,
    "good_turing": q_good_turing,
    "truncation_stats": q_truncation_stats,
    "source_kl_matrix": q_source_kl_matrix,
    "source_lang_mi": q_source_lang_mi,
    "pmi_collocations": q_pmi_collocations,
    "bootstrap_order_ci": q_bootstrap_order_ci,
    "ivf_balance": q_ivf_balance,
    "cusum_shift": q_cusum_shift,
    "ks_drift": q_ks_drift,
    "dedup_kcore": q_dedup_kcore,
    "revenue_gini": q_revenue_gini,
    "arrival_burstiness": q_arrival_burstiness,
    "event_type_affinity": q_event_type_affinity,
    "benford_digits": q_benford_digits,
    "fk_orphans": q_fk_orphans,
    "event_debounce": q_event_debounce,
    "conversion_lag": q_conversion_lag,
    "user_behavior_entropy": q_user_behavior_entropy,
    "km_survival": q_km_survival,
    "hourly_acf": q_hourly_acf,
    "rank_stability": q_rank_stability,
    "trimmed_value_stats": q_trimmed_value_stats,
    "twonn_intrinsic_dim": q_twonn_intrinsic_dim,
    "hourly_xcorr": q_hourly_xcorr,
    "kendall_tau": q_kendall_tau,
    "hhi_concentration": q_hhi_concentration,
    "mann_whitney": q_mann_whitney,
    "runs_test": q_runs_test,
    "hill_tail_index": q_hill_tail_index,
    "ivf_silhouette": q_ivf_silhouette,
    "embedding_effective_rank": q_embedding_effective_rank,
    "dedup_assortativity": q_dedup_assortativity,
    "copurchase_lift": q_copurchase_lift,
    "markov_entropy_rate": q_markov_entropy_rate,
    "discount_elasticity": q_discount_elasticity,
    "return_rate_wilson": q_return_rate_wilson,
    "priority_segment_chisq": q_priority_segment_chisq,
    "interpurchase_gap": q_interpurchase_gap,
    "source_ttr": q_source_ttr,
    "source_decile_shift": q_source_decile_shift,
    "session_depth_hist": q_session_depth_hist,
    "brand_pareto": q_brand_pareto,
    "customer_rfm": q_customer_rfm,
    "fk_fanout_stats": q_fk_fanout_stats,
    "token_rank_drift": q_token_rank_drift,
    # -- latest driver witness: round 6 --
    "source_js_matrix": q_source_js_matrix,
    "weekday_uniformity": q_weekday_uniformity,
    "yearly_value_quartiles": q_yearly_value_quartiles,
    "value_anova": q_value_anova,
    "lognormal_jb": q_lognormal_jb,
    "hour_profile_fit": q_hour_profile_fit,
    "return_curve": q_return_curve,
    "user_lifecycle_census": q_user_lifecycle_census,
    "order_reconciliation": q_order_reconciliation,
    "user_activity_dispersion": q_user_activity_dispersion,
    "coldstart_rates": q_coldstart_rates,
    "event_bigram_oov": q_event_bigram_oov,
    "hour_circular_concentration": q_hour_circular_concentration,
    "conversion_rate_shift": q_conversion_rate_shift,
    "brand_yoy_growth": q_brand_yoy_growth,
    "dup_cluster_purity": q_dup_cluster_purity,
    "single_source_parts": q_single_source_parts,
    "basket_diversity": q_basket_diversity,
    "priority_leadtime": q_priority_leadtime,
    "tax_discount_chisq": q_tax_discount_chisq,
    "weekend_value_mw": q_weekend_value_mw,
    "lang_length_anova": q_lang_length_anova,
    "shard_uniformity": q_shard_uniformity,
    "price_ending_profile": q_price_ending_profile,
    "realized_vs_retail": q_realized_vs_retail,
    "segment_acctbal_profile": q_segment_acctbal_profile,
    "supplier_balance_corr": q_supplier_balance_corr,
    "dedup_method_agreement": q_dedup_method_agreement,
    "basket_size_value": q_basket_size_value,
    "anomalous_days": q_anomalous_days,
    "heldout_cross_entropy": q_heldout_cross_entropy,
    "quality_pass_by_source": q_quality_pass_by_source,
    "priority_mix_drift": q_priority_mix_drift,
    "customer_brand_breadth": q_customer_brand_breadth,
    "nation_trade_balance": q_nation_trade_balance,
    "brand_market_presence": q_brand_market_presence,
    "returnflag_quantity_mw": q_returnflag_quantity_mw,
    "daypart_value_anova": q_daypart_value_anova,
    "mllib_word2vec": q_mllib_word2vec,
    "mllib_ivf_search": q_mllib_ivf_search,
    "mllib_brp_neardup": q_mllib_brp_neardup,
    "mllib_minhash_dedup": q_mllib_minhash_dedup,
    "media_jpeg_stats": q_media_jpeg_stats,
    "media_jpeg_roundtrip": q_media_jpeg_roundtrip,
    "kneser_ney_bigrams": q_kneser_ney_bigrams,
    "ngram_novelty": q_ngram_novelty,
    "source_compressibility": q_source_compressibility,
    "ivf_nprobe_curve": q_ivf_nprobe_curve,
    "discount_quantity_spearman": q_discount_quantity_spearman,
    "nb_calibration_bins": q_nb_calibration_bins,
}

ORACLES: dict[str, str] = {
    "knn_search": o_knn_search(),
    "knn_search_filtered": o_knn_search_filtered(),
    "knn_search_float": o_knn_search_float(),
    "get_vector": o_get_vector(),
    "get_vectors": o_get_vectors(),
    "quantize_vectors": o_quantize_vectors(),
    "knn_join": o_knn_join(),
    "ann_lsh": o_ann_lsh(),
    "ann_lsh_multiprobe": o_ann_lsh_multiprobe(),
    "decontaminate_corpus": o_decontaminate_corpus(),
    "pii_scrub_stats": o_pii_scrub_stats(),
    "stratified_corpus_sample": o_stratified_corpus_sample(),
    "dup_cluster_sizes": o_dup_cluster_sizes(),
    "corpus_token_share": o_corpus_token_share(),
    "pq_encode": o_pq_encode(),
    "ann_pq": o_ann_pq(),
    "ann_pq_trained": o_ann_pq_trained(),
    "ann_ivf_pq_trained": o_ann_ivf_pq_trained(),
    "matview_user_spend_twin": o_matview_user_spend_twin(),
    "dedup_gate_twin": o_dedup_gate_twin(),
    "chunk_documents": o_chunk_documents(),
    "repetition_stats": o_repetition_stats(),
    "unigram_surprisal": o_unigram_surprisal(),
    "quality_filter": o_quality_filter(),
    "boilerplate_share": o_boilerplate_share(),
    "knn_classify": o_knn_classify(),
    "top_brands_by_share": o_top_brands_by_share(),
    "promo_revenue_share": o_promo_revenue_share(),
    "top_supplier_revenue": o_top_supplier_revenue(),
    "heavy_part_suppliers": o_heavy_part_suppliers(),
    "sole_late_suppliers": o_sole_late_suppliers(),
    "nation_profit_trend": o_nation_profit_trend(),
    "min_cost_supplier": o_min_cost_supplier(),
    "lateship_priority_counts": o_lateship_priority_counts(),
    "supplier_part_counts": o_supplier_part_counts(),
    "event_value_regression": o_event_value_regression(),
    "ann_ivf_pq": o_ann_ivf_pq(),
    "semantic_dedup": o_semantic_dedup(),
    "pack_sequences": o_pack_sequences(),
    "build_vocab": o_build_vocab(),
    "encode_tokens": o_encode_tokens(),
    "corpus_stats": o_corpus_stats(),
    "incremental_dedup": o_incremental_dedup(),
    "value_equidepth_bins": o_value_equidepth_bins(),
    "bm25_rank": o_bm25_rank(),
    "top_events_per_user": o_top_events_per_user(),
    "weighted_sample_per_lang": o_weighted_sample_per_lang(),
    "bigram_surprisal": o_bigram_surprisal(),
    "event_funnel": o_event_funnel(),
    "retention_cohorts": o_retention_cohorts(),
    "ann_ivf": o_ann_ivf(),
    "ann_ivf_filtered": o_ann_ivf_filtered(),
    "knn_l2": o_knn_l2(),
    "knn_mips": o_knn_mips(),
    "add_vectors": o_add_vectors(),
    "delete_vectors": o_delete_vectors(),
    "upsert_vectors": o_upsert_vectors(),
    "normalize_vectors": o_normalize_vectors(),
    "vector_stats": o_vector_stats(),
    "label_centroids": o_label_centroids(),
    "udtf_token_stats": o_udtf_token_stats(),
    "label_qsum_grouped_agg": o_label_qsum_grouped_agg(),
    "dedup_exact": o_dedup_exact(),
    "dedup_ngram_jaccard": o_dedup_ngram_jaccard(),
    "dedup_minhash_lsh": o_dedup_minhash_lsh(),
    "simhash_fingerprints": o_simhash_fingerprints(),
    "dedup_simhash": o_dedup_simhash(),
    "dedup_embedding": o_dedup_embedding(),
    "dedup_resolve": o_dedup_resolve(),
    "pipeline_clean_corpus": o_pipeline_clean_corpus(),
    "token_counts": o_token_counts(),
    "text_quality": o_text_quality(),
    "lang_id": o_lang_id(),
    "doc_fingerprint": o_doc_fingerprint(),
    "rolling_fingerprint": o_rolling_fingerprint(),
    "tfidf_terms": o_tfidf_terms(),
    "multimodal_join": o_multimodal_join(),
    "media_features": o_media_features(),
    "media_features_arrow": o_media_features(),  # byte-identical paths, same oracle
    "media_resize": o_media_resize(),
    "media_frame_sample": o_media_frame_sample(),
    "pricing_summary": o_pricing_summary(),
    "part_brand_stats": o_part_brand_stats(),
    "forecast_revenue": o_forecast_revenue(),
    "shipping_priority": o_shipping_priority(),
    "regional_revenue": o_regional_revenue(),
    "bilateral_trade": o_bilateral_trade(),
    "customer_distribution": o_customer_distribution(),
    "brand_revenue_share": o_brand_revenue_share(),
    "customer_order_running": o_customer_order_running(),
    "mktsegment_rollup": o_mktsegment_rollup(),
    "order_priority_counts": o_order_priority_counts(),
    "events_by_hour": o_events_by_hour(),
    "events_tumbling": o_events_tumbling(),
    "nation_customer_stats": o_nation_customer_stats(),
    "value_percentiles": o_value_percentiles(),
    "approx_percentile_error": o_approx_percentile_error(),
    "media_image_stats": o_media_image_stats(),
    "dedup_simhash_wide": o_dedup_simhash_wide(),
    "duplicate_spans": o_duplicate_spans(),
    "media_image_resize": o_media_image_resize(),
    "media_jpeg_stats": o_media_jpeg_stats(),
    "media_jpeg_roundtrip": o_media_jpeg_roundtrip(),
    "kneser_ney_bigrams": o_kneser_ney_bigrams(),
    "ngram_novelty": o_ngram_novelty(),
    "source_compressibility": o_source_compressibility(),
    "ivf_nprobe_curve": o_ivf_nprobe_curve(),
    "discount_quantity_spearman": o_discount_quantity_spearman(),
    "nb_calibration_bins": o_nb_calibration_bins(),
    "approx_distinct_error": o_approx_distinct_error(),
    "contamination_spans": o_contamination_spans(),
    "scrub_spans": o_scrub_spans(),
    "source_mixture": o_source_mixture(),
    "interleave_audit": o_interleave_audit(),
    "mutual_knn": o_mutual_knn(),
    "importance_weights": o_importance_weights(),
    "media_audio_stats": o_media_audio_stats(),
    "media_audio_resample": o_media_audio_resample(),
    "corpus_drift": o_corpus_drift(),
    "hard_negatives": o_hard_negatives(),
    "dup_source_matrix": o_dup_source_matrix(),
    "containment_pairs": o_containment_pairs(),
    "split_leakage": o_split_leakage(),
    "nb_lang_confusion": o_nb_lang_confusion(),
    "perplexity_buckets": o_perplexity_buckets(),
    "zipf_fit": o_zipf_fit(),
    "cluster_split_leakage": o_cluster_split_leakage(),
    "epoch_plan": o_epoch_plan(),
    "dedup_inflation": o_dedup_inflation(),
    "quantization_recall": o_quantization_recall(),
    "minhash_precision": o_minhash_precision(),
    "contrastive_triplets": o_contrastive_triplets(),
    "dq_violations": o_dq_violations(),
    "tokenizer_fertility": o_tokenizer_fertility(),
    "bpe_merge_pairs": o_bpe_merge_pairs(),
    "bpe_merge_table": o_bpe_merge_table(),
    "bpe_trained_fertility": o_bpe_trained_fertility(),
    "kruskal_wallis": o_kruskal_wallis(),
    "brown_forsythe": o_brown_forsythe(),
    "cohens_kappa": o_cohens_kappa(),
    "ewma_daily_value": o_ewma_daily_value(),
    "revenue_drawdown": o_revenue_drawdown(),
    "sign_bit_recall": o_sign_bit_recall(),
    "matryoshka_recall": o_matryoshka_recall(),
    "embedding_anisotropy": o_embedding_anisotropy(),
    "ndcg_ivf": o_ndcg_ivf(),
    "mrr_lsh": o_mrr_lsh(),
    "kmv_distinct_users": o_kmv_distinct_users(),
    "bloom_fpr_purchases": o_bloom_fpr_purchases(),
    "trade_hits": o_trade_hits(),
    "burrows_delta": o_burrows_delta(),
    "nb_auc": o_nb_auc(),
    "holt_linear_forecast": o_holt_linear_forecast(),
    "theil_sen_trend": o_theil_sen_trend(),
    "label_centroid_affinity": o_label_centroid_affinity(),
    "value_wasserstein_drift": o_value_wasserstein_drift(),
    "daily_max_gumbel": o_daily_max_gumbel(),
    "bpe_encode_pieces": o_bpe_encode_pieces(),
    "friedman_types_by_day": o_friedman_types_by_day(),
    "mann_kendall_trend": o_mann_kendall_trend(),
    "nb_class_f1": o_nb_class_f1(),
    "wilcoxon_week_over_week": o_wilcoxon_week_over_week(),
    "chao1_vocab_richness": o_chao1_vocab_richness(),
    "unimax_epochs": o_unimax_epochs(),
    "mmr_rerank": o_mmr_rerank(),
    "ann_recall_curve": o_ann_recall_curve(),
    "k_anonymity": o_k_anonymity(),
    "resolve_keep_best": o_resolve_keep_best(),
    "rbo_overlap": o_rbo_overlap(),
    "ngram_coverage": o_ngram_coverage(),
    "dedup_threshold_curve": o_dedup_threshold_curve(),
    "minhash_estimate_error": o_minhash_estimate_error(),
    "neyman_allocation": o_neyman_allocation(),
    "source_entropy": o_source_entropy(),
    "embedding_drift": o_embedding_drift(),
    "dedup_graph_triangles": o_dedup_graph_triangles(),
    "heaps_law": o_heaps_law(),
    "good_turing": o_good_turing(),
    "truncation_stats": o_truncation_stats(),
    "source_kl_matrix": o_source_kl_matrix(),
    "source_lang_mi": o_source_lang_mi(),
    "pmi_collocations": o_pmi_collocations(),
    "bootstrap_order_ci": o_bootstrap_order_ci(),
    "ivf_balance": o_ivf_balance(),
    "cusum_shift": o_cusum_shift(),
    "ks_drift": o_ks_drift(),
    "dedup_kcore": o_dedup_kcore(),
    "revenue_gini": o_revenue_gini(),
    "arrival_burstiness": o_arrival_burstiness(),
    "event_type_affinity": o_event_type_affinity(),
    "benford_digits": o_benford_digits(),
    "fk_orphans": o_fk_orphans(),
    "event_debounce": o_event_debounce(),
    "conversion_lag": o_conversion_lag(),
    "user_behavior_entropy": o_user_behavior_entropy(),
    "km_survival": o_km_survival(),
    "hourly_acf": o_hourly_acf(),
    "rank_stability": o_rank_stability(),
    "trimmed_value_stats": o_trimmed_value_stats(),
    "twonn_intrinsic_dim": o_twonn_intrinsic_dim(),
    "hourly_xcorr": o_hourly_xcorr(),
    "kendall_tau": o_kendall_tau(),
    "hhi_concentration": o_hhi_concentration(),
    "mann_whitney": o_mann_whitney(),
    "runs_test": o_runs_test(),
    "hill_tail_index": o_hill_tail_index(),
    "ivf_silhouette": o_ivf_silhouette(),
    "embedding_effective_rank": o_embedding_effective_rank(),
    "dedup_assortativity": o_dedup_assortativity(),
    "copurchase_lift": o_copurchase_lift(),
    "markov_entropy_rate": o_markov_entropy_rate(),
    "discount_elasticity": o_discount_elasticity(),
    "return_rate_wilson": o_return_rate_wilson(),
    "priority_segment_chisq": o_priority_segment_chisq(),
    "interpurchase_gap": o_interpurchase_gap(),
    "source_ttr": o_source_ttr(),
    "source_decile_shift": o_source_decile_shift(),
    "session_depth_hist": o_session_depth_hist(),
    "brand_pareto": o_brand_pareto(),
    "customer_rfm": o_customer_rfm(),
    "fk_fanout_stats": o_fk_fanout_stats(),
    "source_js_matrix": o_source_js_matrix(),
    "weekday_uniformity": o_weekday_uniformity(),
    "yearly_value_quartiles": o_yearly_value_quartiles(),
    "value_anova": o_value_anova(),
    "lognormal_jb": o_lognormal_jb(),
    "hour_profile_fit": o_hour_profile_fit(),
    "return_curve": o_return_curve(),
    "user_lifecycle_census": o_user_lifecycle_census(),
    "order_reconciliation": o_order_reconciliation(),
    "user_activity_dispersion": o_user_activity_dispersion(),
    "coldstart_rates": o_coldstart_rates(),
    "event_bigram_oov": o_event_bigram_oov(),
    "hour_circular_concentration": o_hour_circular_concentration(),
    "conversion_rate_shift": o_conversion_rate_shift(),
    "brand_yoy_growth": o_brand_yoy_growth(),
    "dup_cluster_purity": o_dup_cluster_purity(),
    "single_source_parts": o_single_source_parts(),
    "basket_diversity": o_basket_diversity(),
    "priority_leadtime": o_priority_leadtime(),
    "tax_discount_chisq": o_tax_discount_chisq(),
    "weekend_value_mw": o_weekend_value_mw(),
    "lang_length_anova": o_lang_length_anova(),
    "shard_uniformity": o_shard_uniformity(),
    "price_ending_profile": o_price_ending_profile(),
    "realized_vs_retail": o_realized_vs_retail(),
    "segment_acctbal_profile": o_segment_acctbal_profile(),
    "supplier_balance_corr": o_supplier_balance_corr(),
    "dedup_method_agreement": o_dedup_method_agreement(),
    "basket_size_value": o_basket_size_value(),
    "anomalous_days": o_anomalous_days(),
    "heldout_cross_entropy": o_heldout_cross_entropy(),
    "quality_pass_by_source": o_quality_pass_by_source(),
    "token_rank_drift": o_token_rank_drift(),
    "priority_mix_drift": o_priority_mix_drift(),
    "customer_brand_breadth": o_customer_brand_breadth(),
    "nation_trade_balance": o_nation_trade_balance(),
    "brand_market_presence": o_brand_market_presence(),
    "returnflag_quantity_mw": o_returnflag_quantity_mw(),
    "daypart_value_anova": o_daypart_value_anova(),
    # round-5 guarantee oracles for the graduated MLlib entries
    "mllib_word2vec": o_mllib_word2vec(),
    "mllib_ivf_search": o_mllib_ivf_search(),
    "mllib_brp_neardup": o_mllib_brp_neardup(),
    "mllib_minhash_dedup": o_mllib_minhash_dedup(),
    "events_cube": o_events_cube(),
    "customer_set_ops": o_customer_set_ops(),
    "large_volume_orders": o_large_volume_orders(),
    "brand_size_revenue": o_brand_size_revenue(),
    "orders_priority_pivot": o_orders_priority_pivot(),
    "orders_priority_unpivot": o_orders_priority_unpivot(),
    "props_json_stats": o_props_json_stats(),
    "top_dims_per_vector": o_top_dims_per_vector(),
    "nation_market_share": o_nation_market_share(),
    "returned_items": o_returned_items(),
    "customer_order_frame": o_customer_order_frame(),
    "event_type_medians": o_event_type_medians(),
    "events_value_histogram": o_events_value_histogram(),
    "small_quantity_revenue": o_small_quantity_revenue(),
    "idle_rich_customers": o_idle_rich_customers(),
    "customer_quartiles": o_customer_quartiles(),
    "embedding_dimension_stats": o_embedding_dimension_stats(),
    "bpe_token_counts": o_bpe_token_counts(),
    "latest_event_per_user": o_latest_event_per_user(),
    "deterministic_sample": o_deterministic_sample(),
    "adjacent_doc_similarity": o_adjacent_doc_similarity(),
    "event_transitions": o_event_transitions(),
    "purchase_click_interval_join": o_purchase_click_interval_join(),
    "asof_purchase_attribution": o_asof_purchase_attribution(),
    "sessionize_events": o_sessionize_events(),
    "moving_window_stats": o_moving_window_stats(),
    "hypertable_rollup": o_hypertable_rollup(),
    "cms_user_estimates": o_cms_user_estimates(),
    "cms_heavy_hitters": o_cms_heavy_hitters(),
    "scd2_user_state": o_scd2_user_state(),
    "user_event_paths": o_user_event_paths(),
    "distinct_agg_stats": o_distinct_agg_stats(),
    "event_outliers": o_event_outliers(),
    "events_grouping_sets": o_events_grouping_sets(),
    "salted_segment_revenue": o_salted_segment_revenue(),
    "zorder_pruning": o_zorder_pruning(),
    "snapshot_diff": o_snapshot_diff(),
    "bloom_prune_join": o_bloom_prune_join(),
    "hybrid_rrf_search": o_hybrid_rrf_search(),
    "training_shard_stats": o_training_shard_stats(),
    "source_token_caps": o_source_token_caps(),
    "event_key_skew": o_event_key_skew(),
    "trade_pagerank": o_trade_pagerank(),
    "fuzzy_source_pairs": o_fuzzy_source_pairs(),
    "event_value_mad": o_event_value_mad(),
    "zone_pruned_scan": o_zone_pruned_scan(),
    # round 7: the last two rows-only entries graduated to hash-matched
    # sketch-internal oracles (KMV / bottom-k sample) — every registered
    # query is now DuckDB-oracled
    "approx_value_percentiles": o_approx_value_percentiles(),
    "approx_distinct_events": o_approx_distinct_events(),
    # new round 7
    "mllib_logreg_gate": o_mllib_logreg_gate(),
    "value_wasserstein_timecut": o_value_wasserstein_timecut(),
    "kmv_custkey_overlap": o_kmv_custkey_overlap(),
    "welch_ttest_sources": o_welch_ttest_sources(),
    "dedup_mcnemar": o_dedup_mcnemar(),
    "markov_stationary": o_markov_stationary(),
    "adamic_adar_mutual_knn": o_adamic_adar_mutual_knn(),
    "hellinger_value_drift": o_hellinger_value_drift(),
    "gpd_tail_fit": o_gpd_tail_fit(),
    "mahalanobis_outliers": o_mahalanobis_outliers(),
    "pettitt_changepoint": o_pettitt_changepoint(),
    "dow_seasonal_decomposition": o_dow_seasonal_decomposition(),
    "ljung_box_daily": o_ljung_box_daily(),
    "logrank_segments": o_logrank_segments(),
    "ks_bh_fdr": o_ks_bh_fdr(),
    "stratification_deff": o_stratification_deff(),
    "quantization_saturation": o_quantization_saturation(),
    "source_vocab_jaccard": o_source_vocab_jaccard(),
    "nb_average_precision": o_nb_average_precision(),
    "mllib_isotonic_calibration": o_mllib_isotonic_calibration(),
}
