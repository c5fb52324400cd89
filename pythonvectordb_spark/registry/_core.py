"""Shared imports, fixtures-derived constants and SQL helper builders used across the registry family modules.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""



from __future__ import annotations

# Schema-change ledger for the witness pipeline (single source of
# truth — the registry-contract test and tools/rotation_plan.py both
# import it): a driver CORRECTNESS row only counts as a witness for a
# query if its round is >= the round that last changed the query's
# OUTPUT SCHEMA; until then the query is treated as never-witnessed
# and must sit in the registry's front prefix.
STALE_UNTIL: dict[str, int] = {
    # mllib_* graduated to guarantee oracles in round 5 (commit
    # 2cf1439) — re-witnessed by the round-6 window
    "mllib_word2vec": 6,
    "mllib_ivf_search": 6,
    "mllib_brp_neardup": 6,
    "mllib_minhash_dedup": 6,
    # raw sketches graduated from rows-only to hashable sketch-internal
    # oracles in round 7 (KMV precedent)
    "approx_value_percentiles": 7,
    "approx_distinct_events": 7,
    # round 9: extended with the GBT arm + topic-label columns
    # (VERDICT r8 tasks 3/4) — needs a fresh witness
    "gate_champion_challenger": 9,
}


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


_LOOKUP_IDS = (3, 7, 11, 400)  # 400 beyond sf0.001's 100 rows: miss path


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


from pythonvectordb_spark.operators import curation as CU  # noqa: E402


EPOCH_BUDGET = 500_000


from pythonvectordb_spark.operators import relational as RL  # noqa: E402


_PRIORITY_PIVOT = [
    ("1-URGENT", "p1_urgent"),
    ("2-HIGH", "p2_high"),
    ("3-MEDIUM", "p3_medium"),
    ("4-NOT SPECIFIED", "p4_notspec"),
    ("5-LOW", "p5_low"),
]


# GPT-2-style pre-tokenizer classes (letters / digits / other-symbol runs);
# the alternation is RE2- and Java-regex compatible so both engines split
# identically.
_BPE_SPLIT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


_CMS_PROBE_KEYS = list(range(20))


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


BM25_QUERY = ("vector", "join", "scan")


BM25_K1 = 1.2


BM25_B = 0.75


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


MATRYOSHKA_PREFIXES = (8, 16, 32)


UNIMAX_BUDGET = 100_000  # mixed capped/uncapped regime at the oracle SFs
