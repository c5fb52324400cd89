"""LLM-corpus curation: decontamination, PII, sampling, mixtures, splits/leakage, quality gates and classifiers.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import (
    CU,
    DD,
    DataFrame,
    EPOCH_BUDGET,
    F,
    NGRAM_MAX_DF,
    O,
    SparkSession,
    UNIMAX_BUDGET,
    Window,
    _EDGES_SQL,
    _SH_CTE,
    load_table,
)


from pythonvectordb_spark.registry.text import o_quality_filter


from pythonvectordb_spark.registry.dedup import o_dedup_minhash_lsh


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


def q_gate_champion_challenger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Champion-challenger report over the four quality gates (round 8
    + round-9 GBT/topic extension, VERDICT r8 tasks 3/4): rule / Naive
    Bayes / trained LogisticRegression / trained GBTClassifier
    evaluated on one shared md5 held-out split against TWO reference
    labels (above-mean length; above-mean topic-term mentions) — exact
    accuracies and McNemar discordant-correctness counts for the
    expression-exact gates on both labels, integer-count champion
    verdicts, guarantee flags for the two trained arms
    (`operators.curation.gate_champion_challenger`)."""
    return CU.gate_champion_challenger(load_table(spark, sf_dir, "documents"))


def o_gate_champion_challenger() -> str:
    from pythonvectordb_spark.functions.text import STOPWORDS
    from pythonvectordb_spark.operators.curation import TOPIC_TERM

    stop = O.sql_stopword_filter("t", STOPWORDS)
    # rule arm: o_quality_filter's CTE chain reduced to (doc_id, keep);
    # NB arms: o_nb_lang_confusion's model SQL with the binary length
    # label (arm 1) and the binary above-mean-topic-term label (arm 2)
    # on the md5 split; logreg + GBT columns are guarantee literals
    # (the o_mllib_logreg_gate precedent; measured margins live in the
    # operator docstring)
    return f"""
WITH qb AS (SELECT doc_id, {O.sql_tokens('text')} AS t FROM documents),
tc AS (SELECT doc_id,
              CAST(len(list_filter(t, x -> x = '{TOPIC_TERM}')) AS BIGINT) AS n_term
       FROM qb),
tot AS (SELECT CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(n_chars) AS BIGINT) AS tot_chars
        FROM documents),
tott AS (SELECT CAST(sum(n_term) AS BIGINT) AS tot_term FROM tc),
lbl AS (SELECT d.doc_id, d.text, d.n_chars * cnt > tot_chars AS pos,
               tc.n_term * cnt > tot_term AS pos_topic,
               ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 32, 1))::BIGINT
                 % 5 = 0 AS is_test
        FROM documents d JOIN tc ON d.doc_id = tc.doc_id
        CROSS JOIN tot CROSS JOIN tott),
qc AS (
  SELECT doc_id,
         len(t) AS n_tok,
         len({stop})::DOUBLE AS n_stop,
         len(list_distinct(t))::DOUBLE AS n_uniq,
         coalesce(list_aggregate(
           list_transform(list_distinct(t), x -> len(list_filter(t, y -> y = x))),
           'max'), 0)::DOUBLE AS top_cnt
  FROM qb
),
qr AS (
  SELECT doc_id, n_tok,
         CASE WHEN n_tok > 0 THEN n_uniq / n_tok::DOUBLE ELSE 0.0 END AS ttr,
         CASE WHEN n_tok > 0 THEN n_stop / n_tok::DOUBLE ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_tok > 0 THEN top_cnt / n_tok::DOUBLE ELSE 0.0 END AS top_share
  FROM qc
),
rule AS (
  SELECT doc_id,
         NOT (n_tok < 10 OR ttr < 0.25 OR stop_ratio > 0.6 OR top_share > 0.25)
           AS rule_pred
  FROM qr
),
t2 AS (SELECT l.doc_id,
              CASE WHEN l.pos THEN 'long' ELSE 'short' END AS qlbl,
              CASE WHEN l.pos_topic THEN 'mod' ELSE 'oth' END AS tlbl,
              {O.sql_tokens('l.text')} AS w,
              NOT l.is_test AS is_tr
       FROM lbl l),
tok AS (SELECT doc_id, qlbl, tlbl, is_tr, unnest(w) AS tok FROM t2),
tr AS (SELECT * FROM tok WHERE is_tr),
te AS (SELECT * FROM tok WHERE NOT is_tr),
cond AS (SELECT qlbl AS cls, tok, CAST(count(*) AS BIGINT) AS c_tc
         FROM tr GROUP BY 1, 2),
clstok AS (SELECT qlbl AS cls, CAST(count(*) AS BIGINT) AS tok_c
           FROM tr GROUP BY 1),
vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS V FROM tr),
ndocs AS (SELECT CASE WHEN pos THEN 'long' ELSE 'short' END AS cls,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM lbl WHERE NOT is_test GROUP BY 1),
ntot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS N FROM ndocs),
classes AS (
  SELECT cls, ln(n_docs::DOUBLE / N::DOUBLE) AS prior_ln, tok_c + V AS denom
  FROM ndocs JOIN clstok USING (cls) CROSS JOIN vocab CROSS JOIN ntot
),
sc AS (
  SELECT te.doc_id, te.qlbl, c.cls,
         round(c.prior_ln
               + sum(ln((coalesce(cond.c_tc, 0) + 1)::DOUBLE
                        / c.denom::DOUBLE)), 6) AS score
  FROM te CROSS JOIN classes c
  LEFT JOIN cond ON cond.cls = c.cls AND cond.tok = te.tok
  GROUP BY 1, 2, 3, c.prior_ln
),
rk AS (
  SELECT doc_id, cls,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cls ASC) AS rn
  FROM sc
),
nb AS (SELECT doc_id, cls = 'long' AS nb_pred FROM rk WHERE rn = 1),
cond2 AS (SELECT tlbl AS cls, tok, CAST(count(*) AS BIGINT) AS c_tc
          FROM tr GROUP BY 1, 2),
clstok2 AS (SELECT tlbl AS cls, CAST(count(*) AS BIGINT) AS tok_c
            FROM tr GROUP BY 1),
ndocs2 AS (SELECT CASE WHEN pos_topic THEN 'mod' ELSE 'oth' END AS cls,
                  CAST(count(*) AS BIGINT) AS n_docs
           FROM lbl WHERE NOT is_test GROUP BY 1),
classes2 AS (
  SELECT cls, ln(n_docs::DOUBLE / N::DOUBLE) AS prior_ln, tok_c + V AS denom
  FROM ndocs2 JOIN clstok2 USING (cls) CROSS JOIN vocab CROSS JOIN ntot
),
sc2 AS (
  SELECT te.doc_id, c.cls,
         round(c.prior_ln
               + sum(ln((coalesce(cond2.c_tc, 0) + 1)::DOUBLE
                        / c.denom::DOUBLE)), 6) AS score
  FROM te CROSS JOIN classes2 c
  LEFT JOIN cond2 ON cond2.cls = c.cls AND cond2.tok = te.tok
  GROUP BY 1, 2, c.prior_ln
),
rk2 AS (
  SELECT doc_id, cls,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cls ASC) AS rn
  FROM sc2
),
nb2 AS (SELECT doc_id, cls = 'mod' AS nb_topic_pred FROM rk2 WHERE rn = 1),
spine AS (SELECT l.doc_id, l.pos, l.pos_topic
          FROM lbl l JOIN qc USING (doc_id)
          WHERE l.is_test AND qc.n_tok > 0),
per AS (SELECT CASE WHEN s.pos THEN 1 ELSE 0 END AS p,
               CASE WHEN r.rule_pred = s.pos THEN 1 ELSE 0 END AS rc,
               CASE WHEN n.nb_pred = s.pos THEN 1 ELSE 0 END AS nc,
               CASE WHEN r.rule_pred = s.pos_topic THEN 1 ELSE 0 END AS rc2,
               CASE WHEN n2.nb_topic_pred = s.pos_topic THEN 1 ELSE 0 END AS nc2
        FROM spine s JOIN rule r USING (doc_id) JOIN nb n USING (doc_id)
        JOIN nb2 n2 USING (doc_id)),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(p) AS BIGINT) AS n_pos_test,
             CAST(sum(rc) AS BIGINT) AS cr,
             CAST(sum(nc) AS BIGINT) AS cn,
             CAST(sum(rc2) AS BIGINT) AS cr2,
             CAST(sum(nc2) AS BIGINT) AS cn2,
             CAST(sum(rc * (1 - nc)) AS BIGINT) AS n10,
             CAST(sum((1 - rc) * nc) AS BIGINT) AS n01
      FROM per)
SELECT n_test, n_pos_test,
       round(cr::DOUBLE / n_test::DOUBLE, 6) AS acc_rule,
       round(cn::DOUBLE / n_test::DOUBLE, 6) AS acc_nb,
       n10 AS mcnemar_rule_nb_n10,
       n01 AS mcnemar_rule_nb_n01,
       CASE WHEN n10 + n01 > 0 THEN
         round((abs((n10 - n01)::DOUBLE) - 1.0) * (abs((n10 - n01)::DOUBLE) - 1.0)
               / (n10 + n01)::DOUBLE, 6) END AS mcnemar_rule_nb_chi2_cc,
       CASE WHEN cn >= cr THEN 'nb' ELSE 'rule' END AS exact_champion,
       CAST(1 AS BIGINT) AS logreg_acc_ok,
       CAST(1 AS BIGINT) AS logreg_beats_rule_ok,
       round(cr2::DOUBLE / n_test::DOUBLE, 6) AS acc_rule_topic,
       round(cn2::DOUBLE / n_test::DOUBLE, 6) AS acc_nb_topic,
       CASE WHEN cn2 >= cr2 THEN 'nb' ELSE 'rule' END AS exact_champion_topic,
       CAST(1 AS BIGINT) AS gbt_acc_ok,
       CAST(1 AS BIGINT) AS gbt_beats_rule_ok
FROM g
"""
