"""MLlib-trained estimators exposed as queries: Word2Vec, IVF KMeans, BRP/MinHash LSH, LogReg gate, isotonic calibration.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import (
    DD,
    DataFrame,
    F,
    FX,
    NGRAM_MAX_DF,
    O,
    S,
    SparkSession,
    _JACCARD,
    _SH_CTE,
    _SH_KEPT_CTE,
    load_table,
)


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


def q_mllib_als_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib ALS implicit-feedback retrieval on the customer x part
    purchase matrix (new round 8, VERDICT r7 task 4): the third
    trained-estimator family — exact interaction/split census checked
    bit-for-bit, held-out hit-rate@20 of ALS and the popularity
    baseline asserted against the data-derived chance floor
    (`indexing.als_purchase_retrieval`; the `mllib_*` guarantee
    pattern)."""
    from pythonvectordb_spark.indexing import als_purchase_retrieval

    return als_purchase_retrieval(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def o_mllib_als_retrieval() -> str:
    # Contract notes (ADVICE r8):
    # * the registered binding pins test_mod=5 (the operator default);
    #   the `% 5` below IS that value — change both together.
    # * the two *_ok literals are guarantee flags with measured margins
    #   (chance floor 0.4*k/n_items): ALS hit-rate 0.125749 = 3.1x floor
    #   at sf0.001, 0.009738 = 2.4x at sf0.01; popularity 0.112275 =
    #   2.8x / 0.010880 = 2.7x. Cold-start exposure (test users with
    #   zero TRAIN interactions stay in the denominator but can never
    #   be hit by ALS's coldStartStrategy="drop"): measured 0/150 and
    #   0/1498 such users at sf0.001/sf0.01 — every TPC-H customer has
    #   many interactions, so the md5 pair split strands nobody; a
    #   data shape with single-interaction users would need the floor
    #   rescaled by the non-cold share.
    # * CAST(... AS INT) errors on >int32 keys in DuckDB, matching the
    #   Spark side's guarded cast (indexing._int32) — both engines fail
    #   loudly rather than silently wrapping.
    return """
WITH inter AS (SELECT CAST(o_custkey AS INT) AS u, CAST(l_partkey AS INT) AS i
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               GROUP BY 1, 2),
s AS (SELECT u, i,
             ('0x' || substr(md5(u::VARCHAR || '-' || i::VARCHAR), 32, 1))::BIGINT
               % 5 = 0 AS is_test
      FROM inter)
SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users,
       CAST(count(DISTINCT i) AS BIGINT) AS n_items,
       CAST(count(*) AS BIGINT) AS n_interactions,
       CAST(sum(CASE WHEN is_test THEN 0 ELSE 1 END) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
       CAST(count(DISTINCT CASE WHEN is_test THEN u END) AS BIGINT) AS n_test_users,
       CAST(1 AS BIGINT) AS als_hit_rate_ok,
       CAST(1 AS BIGINT) AS pop_hit_rate_ok
FROM s
"""


def q_mllib_fpgrowth_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib FPGrowth association rules over per-order brand baskets
    (new round 10, VERDICT r9 task 3): every rule with antecedent size
    <= 2 from the mined frequent itemsets — confidence / lift / support
    as exact int64-count ratios, FULLY exact-oracled by DuckDB
    self-join recomputation of the frequent 1/2/3-sets
    (`indexing.fpgrowth_brand_rules`; the copurchase_lift precedent)."""
    from pythonvectordb_spark.indexing import fpgrowth_brand_rules

    return fpgrowth_brand_rules(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_mllib_fpgrowth_rules() -> str:
    # Contract notes:
    # * the registered binding pins min_support=0.005 (the operator
    #   default); the `0.005` literals below ARE that value — change
    #   both together. minCount = ceil(0.005 * n_baskets) is the exact
    #   double multiply-then-ceil MLlib's FPGrowth applies, bit-equal
    #   across engines.
    # * rules are single-consequent (MLlib's AssociationRules contract);
    #   the operator's max_antecedent=2 filter makes pair+triple
    #   itemsets the COMPLETE rule source, which f2/f3 enumerate.
    # * a frequent triple's 2-subsets are frequent (a-priori), so the
    #   f2 joins for triple antecedents never drop a rule.
    return """
WITH ob AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM ob),
mc AS (SELECT CAST(ceil(0.005 * n) AS BIGINT) AS m, n FROM tot),
f1 AS (SELECT b, CAST(count(*) AS BIGINT) AS f FROM ob GROUP BY 1
       HAVING count(*) >= (SELECT m FROM mc)),
f2 AS (SELECT a.b AS b1, c.b AS b2, CAST(count(*) AS BIGINT) AS f
       FROM ob a JOIN ob c ON a.ok = c.ok AND a.b < c.b
       GROUP BY 1, 2 HAVING count(*) >= (SELECT m FROM mc)),
f3 AS (SELECT a.b AS b1, c.b AS b2, d.b AS b3, CAST(count(*) AS BIGINT) AS f
       FROM ob a JOIN ob c ON a.ok = c.ok AND a.b < c.b
                 JOIN ob d ON a.ok = d.ok AND c.b < d.b
       GROUP BY 1, 2, 3 HAVING count(*) >= (SELECT m FROM mc)),
r2 AS (
  SELECT b1 AS antecedent, b2 AS consequent, f2.f AS fu, fa.f AS fan, fc.f AS fcon
  FROM f2 JOIN f1 fa ON fa.b = f2.b1 JOIN f1 fc ON fc.b = f2.b2
  UNION ALL
  SELECT b2, b1, f2.f, fb.f, fc.f
  FROM f2 JOIN f1 fb ON fb.b = f2.b2 JOIN f1 fc ON fc.b = f2.b1),
r3 AS (
  SELECT f3.b1 || ',' || f3.b2 AS antecedent, f3.b3 AS consequent,
         f3.f AS fu, p2.f AS fan, c1.f AS fcon
  FROM f3 JOIN f2 p2 ON p2.b1 = f3.b1 AND p2.b2 = f3.b2
          JOIN f1 c1 ON c1.b = f3.b3
  UNION ALL
  SELECT f3.b1 || ',' || f3.b3, f3.b2, f3.f, p2.f, c1.f
  FROM f3 JOIN f2 p2 ON p2.b1 = f3.b1 AND p2.b2 = f3.b3
          JOIN f1 c1 ON c1.b = f3.b2
  UNION ALL
  SELECT f3.b2 || ',' || f3.b3, f3.b1, f3.f, p2.f, c1.f
  FROM f3 JOIN f2 p2 ON p2.b1 = f3.b2 AND p2.b2 = f3.b3
          JOIN f1 c1 ON c1.b = f3.b1),
allr AS (SELECT * FROM r2 UNION ALL SELECT * FROM r3)
SELECT antecedent, consequent,
       round(fu::DOUBLE / fan::DOUBLE, 9) AS confidence,
       round((fu::DOUBLE / fan::DOUBLE)
             / (fcon::DOUBLE / (SELECT n FROM mc)::DOUBLE), 9) AS lift,
       round(fu::DOUBLE / (SELECT n FROM mc)::DOUBLE, 9) AS support
FROM allr
"""


def q_mllib_pca_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib PCA embedding compaction audit (new round 10, VERDICT r9
    task 4): project the normalized store to 16 of its dimensions and
    assert the captured variance (>= the mathematical k/dim floor) and
    recall@10 of compacted-space scoring vs the exact int8 ground truth
    (>= 10x the k/n chance floor) as data — the learned-projection twin
    of `matryoshka_recall` (`indexing.pca_compaction_audit`; the
    `mllib_*` guarantee pattern)."""
    from pythonvectordb_spark.indexing import pca_compaction_audit

    return pca_compaction_audit(load_table(spark, sf_dir, "embeddings"))


def o_mllib_pca_compaction() -> str:
    # Contract notes: the registered binding pins k_dims=16, k=10,
    # n_queries=32, recall_floor_mult=10 (operator defaults); the
    # literals below ARE those values — change both together. The two
    # *_ok literals are guarantee flags with measured margins:
    # explained variance 0.3759/0.3763 at sf0.001/sf0.01 vs the 0.25 =
    # 16/64 mathematical floor; recall@10 0.375/0.353 vs the 0.2 =
    # 10 * 10/500 chance-derived floor (uniform-random testdata is the
    # near-flat-spectrum worst case for PCA, so both are floors).
    return """
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(max(len(embedding)) AS INT) AS dim,
       CAST(16 AS INT) AS k_dims,
       CAST(10 AS INT) AS k,
       CAST(sum(CASE WHEN vec_id < 32 THEN 1 ELSE 0 END) AS BIGINT) AS n_queries,
       CAST(1 AS BIGINT) AS explained_variance_ok,
       CAST(1 AS BIGINT) AS recall_ok
FROM embeddings
"""


def q_mllib_model_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic model selection via MLlib TrainValidationSplit
    (new round 10, VERDICT r9 task 5): a GBT maxDepth grid on the
    above-mean-length label with n_chars as the only feature — the
    parsimony rule over validationMetrics must recover the generating
    rule's minimal depth (1), asserted as data beside the exact md5
    test-split census (`indexing.tvs_depth_selection`; the `mllib_*`
    guarantee pattern)."""
    from pythonvectordb_spark.indexing import tvs_depth_selection

    return tvs_depth_selection(load_table(spark, sf_dir, "documents"))


def o_mllib_model_selection() -> str:
    # Contract notes: the registered binding pins test_mod=5 and the
    # (1,2,3) depth grid (operator defaults); the `% 5` and the
    # grid_size=3 literal below ARE those values — change both
    # together. The three *_ok literals are guarantee flags with
    # measured margins: validation accuracy identical across all three
    # depths (1.0 at sf0.001, 0.9857 at sf0.01 — so the parsimony pick
    # is depth 1 by tie, the minimal-depth contract), held-out accuracy
    # 1.0 at both SFs vs the 0.95 bounds.
    return """
WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS cnt,
                    CAST(sum(n_chars) AS BIGINT) AS tot_chars
             FROM documents),
t AS (SELECT doc_id, n_chars * cnt > tot_chars AS pos
      FROM documents CROSS JOIN tot
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 32, 1))::BIGINT % 5 = 0)
SELECT CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_test,
       CAST(3 AS INT) AS grid_size,
       CAST(1 AS BIGINT) AS selected_depth_minimal,
       CAST(1 AS BIGINT) AS validation_metric_ok,
       CAST(1 AS BIGINT) AS heldout_accuracy_ok
FROM t
"""


def q_mllib_prefixspan_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib PrefixSpan sequential-pattern mining over each user's
    first-8-event journey prefix (new round 10): frequent subsequences
    (gaps allowed) up to length 3 at min_support 0.2 — FULLY
    exact-oracled by DuckDB row_number-ordered self-join recomputation
    of every pattern support (`indexing.prefixspan_event_paths`; the
    order-aware sibling of mllib_fpgrowth_rules)."""
    from pythonvectordb_spark.indexing import prefixspan_event_paths

    return prefixspan_event_paths(load_table(spark, sf_dir, "events"))


def o_mllib_prefixspan_paths() -> str:
    # Contract notes: the registered binding pins min_support=0.2,
    # max_pattern_length=3, first_n=8 (operator defaults); the `0.2`,
    # the p1/p2/p3 enumeration depth, and the `rn <= 8` below ARE those
    # values — change both together. minCount = ceil(0.2 * n_sequences)
    # is the exact double multiply-then-ceil MLlib's PrefixSpan
    # applies; sequence order ties break on event_id on both engines.
    return """
WITH seq AS (SELECT user_id, event_type,
                    row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC) AS rn
             FROM events),
pref AS (SELECT user_id, event_type, rn FROM seq WHERE rn <= 8),
nseq AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM pref),
mc AS (SELECT CAST(ceil(0.2 * n) AS BIGINT) AS m, n FROM nseq),
p1 AS (SELECT event_type AS pattern, 1 AS length,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM pref GROUP BY 1
       HAVING count(DISTINCT user_id) >= (SELECT m FROM mc)),
p2 AS (SELECT a.event_type || ',' || b.event_type AS pattern, 2 AS length,
              CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
       FROM pref a JOIN pref b ON a.user_id = b.user_id AND a.rn < b.rn
       GROUP BY 1
       HAVING count(DISTINCT a.user_id) >= (SELECT m FROM mc)),
p3 AS (SELECT a.event_type || ',' || b.event_type || ',' || c.event_type
                AS pattern, 3 AS length,
              CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
       FROM pref a JOIN pref b ON a.user_id = b.user_id AND a.rn < b.rn
                   JOIN pref c ON a.user_id = c.user_id AND b.rn < c.rn
       GROUP BY 1
       HAVING count(DISTINCT a.user_id) >= (SELECT m FROM mc)),
allp AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3)
SELECT pattern, CAST(length AS INT) AS length, n_users,
       round(n_users::DOUBLE / (SELECT n FROM mc)::DOUBLE, 9) AS support
FROM allp
"""


def q_mllib_linreg_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib LinearRegression (exact normal-equation solver) beside the
    closed-form regression aggregates on event value vs hour-of-day
    (new round 10): the hash-checked columns are the exact moment
    formulas (regr_slope / regr_intercept / regr_r2, the
    event_value_regression parity surface) and the estimator's
    agreement with that closed form asserted as data
    (`indexing.linreg_hour_value_twin`)."""
    from pythonvectordb_spark.indexing import linreg_hour_value_twin

    return linreg_hour_value_twin(load_table(spark, sf_dir, "events"))


def o_mllib_linreg_twin() -> str:
    # Contract notes: the two agreement literals are guarantee flags
    # with measured margins — |coef - regr_slope| and |intercept -
    # regr_intercept| ~1e-12 at both SFs vs the 1e-6 tolerance
    # (solver="normal" solves the identical least-squares system).
    return """
SELECT CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 6) AS slope,
       round(regr_intercept(value, CAST(hour(ts) AS DOUBLE)), 6) AS intercept,
       round(regr_r2(value, CAST(hour(ts) AS DOUBLE)), 6) AS r2,
       CAST(1 AS BIGINT) AS mllib_coef_agrees,
       CAST(1 AS BIGINT) AS mllib_intercept_agrees
FROM events
"""


def q_mllib_chisq_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.stat.ChiSquareTest beside the exact-integer contingency chi²
    on order priority x market segment (new round 10): the hash-checked
    columns are the exact statistic surface (the priority_segment_chisq
    parity formula) plus MLlib's dof equality and statistic agreement
    asserted as data (`indexing.chisq_mllib_twin`)."""
    from pythonvectordb_spark.indexing import chisq_mllib_twin

    return chisq_mllib_twin(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


def o_mllib_chisq_twin() -> str:
    # Contract notes: the two agreement literals are guarantee flags
    # with measured margins — MLlib's dof is exactly (r-1)(c-1) and its
    # statistic differs from the exact-arithmetic chi² by ~1e-12 at
    # both SFs vs the 1e-4 tolerance (which only absorbs the round-6
    # grain of the hash-checked chisq column).
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
           AS cramers_v,
       CAST(1 AS BIGINT) AS mllib_dof_agrees,
       CAST(1 AS BIGINT) AS mllib_statistic_agrees
FROM g
"""


def q_mllib_summarizer_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.stat.Summarizer beside the exact-integer per-dimension census
    of the quantized store (new round 10): one row per dimension with
    the exact int64 sum/sumsq/min/max (hash-checked — the
    embedding_dimension_stats parity surface) plus Summarizer's
    mean/variance/min/max agreement asserted as data
    (`indexing.summarizer_int8_twin`)."""
    from pythonvectordb_spark.indexing import summarizer_int8_twin

    return summarizer_int8_twin(load_table(spark, sf_dir, "embeddings"))


def o_mllib_summarizer_twin() -> str:
    # Contract notes: the three agreement literals are guarantee flags
    # with measured margins — Summarizer accumulates running moments,
    # so mean/variance agreement vs the exact integer forms is ~1e-12
    # against the 1e-9 tolerance, and min/max equal exactly; all 64
    # dimensions agree at both SFs.
    qv = O.sql_qvec("embedding")
    return f"""
WITH q AS (SELECT {qv} AS qvec FROM embeddings)
SELECT CAST(t.i AS INT) AS dim_idx,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(qvec[t.i]::BIGINT) AS BIGINT) AS sum_q,
       CAST(sum(qvec[t.i]::BIGINT * qvec[t.i]::BIGINT) AS BIGINT) AS sumsq_q,
       CAST(min(qvec[t.i]) AS INT) AS min_q,
       CAST(max(qvec[t.i]) AS INT) AS max_q,
       CAST(1 AS BIGINT) AS mllib_mean_agrees,
       CAST(1 AS BIGINT) AS mllib_var_agrees,
       CAST(1 AS BIGINT) AS mllib_minmax_agrees
FROM q CROSS JOIN generate_series(1, 64) AS t(i)
GROUP BY t.i
"""


def q_mllib_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.feature.MinMaxScaler over event values (new round 10): the
    fitted [0,1] rescale with per-row BIT-EQUALITY to the
    reciprocal-multiply closed form asserted as data, beside exact
    per-type counts, exact raw min/max, and the round-6 scaled mean
    DuckDB recomputes (`indexing.minmax_scale_events`)."""
    from pythonvectordb_spark.indexing import minmax_scale_events

    return minmax_scale_events(load_table(spark, sf_dir, "events"))


def o_mllib_minmax_scale() -> str:
    # Contract notes: MLlib's transform is (x - min) * (1 / (max -
    # min)) — a reciprocal MULTIPLY (measured 1 ULP off the plain
    # division on real rows), so the avg below uses the identical op
    # order; the identity literal is a guarantee flag measured
    # zero-mismatch at both SFs.
    return """
WITH tot AS (SELECT min(value) AS gmin, max(value) AS gmax FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       min(value) AS min_value,
       max(value) AS max_value,
       round(avg((value - gmin) * (1.0 / (gmax - gmin))), 6) AS mean_scaled,
       CAST(1 AS BIGINT) AS mllib_identity_exact
FROM events CROSS JOIN tot
GROUP BY event_type
"""


def q_mllib_standard_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.feature.StandardScaler over event values (new round 10): the
    fitted standardization with per-row BIT-EQUALITY to the
    reciprocal-multiply closed form (x - mean) * (1 / std) asserted as
    data, beside exact per-type counts and the round-6 mean / sample
    std DuckDB recomputes (`indexing.standard_scaler_twin`)."""
    from pythonvectordb_spark.indexing import standard_scaler_twin

    return standard_scaler_twin(load_table(spark, sf_dir, "events"))


def o_mllib_standard_scaler() -> str:
    # Contract notes: like MinMaxScaler, the transform is a reciprocal
    # MULTIPLY against the MODEL's fitted mean/std — measured bit-equal
    # on every row at both SFs (the plain division differs by 1 ULP on
    # ~4% of rows). The three literals are guarantee flags: identity
    # mismatches counted per type (zero), and the fitted mean/std each
    # within 1e-9 relative of the exact aggregate forms (measured
    # ~1e-12 — Summarizer's running moments are never bit-equal
    # contracts across partitionings).
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(value), 6) AS mean_value,
       round(stddev_samp(value), 6) AS std_value,
       CAST(1 AS BIGINT) AS mllib_identity_exact,
       CAST(1 AS BIGINT) AS mllib_mean_agrees,
       CAST(1 AS BIGINT) AS mllib_std_agrees
FROM events
GROUP BY event_type
"""


def q_mllib_imputer_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.feature.Imputer (strategy mean) over deterministically masked
    event values (new round 10): event_id % 7 == 0 rows are nulled, the
    fill's exact identity (masked rows bit-equal the surrogate,
    surviving rows bit-equal their originals) is asserted as data, and
    DuckDB recomputes the exact null census and the closed-form
    post-fill mean (`indexing.imputer_mean_twin`)."""
    from pythonvectordb_spark.indexing import imputer_mean_twin

    return imputer_mean_twin(load_table(spark, sf_dir, "events"))


def o_mllib_imputer_twin() -> str:
    # Contract notes: the registered binding pins null_mod=7 (operator
    # default); the `% 7` below IS that value — change both together.
    # mean_imputed's closed form (sum_nonnull + n_null * mean_nonnull)
    # / n matches Spark's avg over the filled column at the round-6
    # grain (~1e-13 apart). The two literals are guarantee flags:
    # fill identity measured zero-mismatch, surrogate within 1e-9 of
    # Spark's own exact avg (measured diff 0.0).
    return """
WITH b AS (
  SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value_n
  FROM events
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN value_n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       round(avg(value_n), 6) AS mean_nonnull,
       round((sum(value_n)
              + sum(CASE WHEN value_n IS NULL THEN 1 ELSE 0 END) * avg(value_n))
             / count(*), 6) AS mean_imputed,
       CAST(1 AS BIGINT) AS fill_identity_exact,
       CAST(1 AS BIGINT) AS surrogate_agrees
FROM b
"""


def q_mllib_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.feature.QuantileDiscretizer rank-guarantee audit (new round
    10): 4 equi-probability buckets over event values; the
    Greenwald-Khanna sketch's published contract — each interior
    split's exact rank within relativeError * n + 1 of p * n — and the
    resulting bucket balance are asserted as data
    (`indexing.quantile_buckets_audit`)."""
    from pythonvectordb_spark.indexing import quantile_buckets_audit

    return quantile_buckets_audit(load_table(spark, sf_dir, "events"))


def o_mllib_quantile_buckets() -> str:
    # Contract notes: the registered binding pins num_buckets=4,
    # relative_error=0.001, share_tol=0.01 (operator defaults); the
    # generate_series(0, 3) and /4.0 below ARE those values — change
    # both together. The two literals are guarantee flags with measured
    # margins: rank error 1.0 vs the 0.001 * n + 1 bound, bucket-share
    # deviation 0.002 vs the 0.01 tolerance (both sf0.001).
    return """
SELECT CAST(t.i AS INT) AS bucket,
       t.i / 4.0 AS p_lo,
       (t.i + 1) / 4.0 AS p_hi,
       (SELECT CAST(count(*) AS BIGINT) FROM events) AS n,
       CAST(1 AS BIGINT) AS rank_ok,
       CAST(1 AS BIGINT) AS share_ok
FROM generate_series(0, 3) AS t(i)
"""


def q_mllib_bisecting_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.clustering.BisectingKMeans census (new round 10): the
    hierarchical twin of the KMeans IVF trainer — k=4 clusters over the
    embedding store with the algorithm's structural invariants (sizes
    sum to n, all non-empty, k-cluster cost <= the exact
    single-centroid cost, no cluster above 60% of points) asserted as
    data (`indexing.bisecting_kmeans_census`)."""
    from pythonvectordb_spark.indexing import bisecting_kmeans_census

    return bisecting_kmeans_census(load_table(spark, sf_dir, "embeddings"))


def o_mllib_bisecting_kmeans() -> str:
    # Contract notes: the registered binding pins k=4, max_share=0.6
    # (operator defaults); the k literal below IS that value — change
    # both together. The four literals are guarantee flags with
    # measured margins: cost ratio 0.96 vs the <= 1 variance-
    # decomposition bound (bisecting starts from the global centroid,
    # so the k-cluster cost can only fall), max cluster share 0.298 vs
    # 0.6, on this near-worst-case uniform corpus.
    return """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(max(len(embedding)) AS INT) AS dim,
       CAST(4 AS INT) AS k,
       CAST(1 AS BIGINT) AS sizes_sum_ok,
       CAST(1 AS BIGINT) AS all_nonempty_ok,
       CAST(1 AS BIGINT) AS cost_le_global_ok,
       CAST(1 AS BIGINT) AS balance_ok
FROM embeddings
"""


def q_mllib_countvec_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.feature.CountVectorizer + IDF beside the exact document-
    frequency census (new round 10): per term with df >= ceil(0.05 * m)
    the exact df and the round-6 of Spark's published IDF formula
    ln((m + 1) / (df + 1)) are hash-checked; vocabulary membership and
    the IDFModel value's agreement ride as flags
    (`indexing.countvec_idf_twin`)."""
    from pythonvectordb_spark.indexing import countvec_idf_twin

    return countvec_idf_twin(load_table(spark, sf_dir, "documents"))


def o_mllib_countvec_idf() -> str:
    # Contract notes: the registered binding pins min_df_frac=0.05
    # (operator default); the 0.05 below IS that value — change both
    # together. The idf column is the EXPRESSION ln((m+1)/(df+1)) on
    # both sides (round-6); the two literals are guarantee flags with
    # measured margins: every qualifying term in the fitted vocabulary
    # and IDFModel.idf at diff 0.0 vs the 1e-9 tolerance (same formula,
    # same doubles).
    return f"""
WITH toks AS (SELECT {O.sql_tokens('text')} AS tk FROM documents),
tot AS (SELECT CAST(count(*) AS BIGINT) AS m FROM toks),
census AS (
  SELECT t.t AS term, CAST(count(*) AS BIGINT) AS df
  FROM toks, unnest(list_distinct(tk)) AS t(t)
  GROUP BY 1
)
SELECT term, df,
       round(ln((m + 1.0) / (df + 1.0)), 6) AS idf,
       CAST(1 AS BIGINT) AS in_vocab_ok,
       CAST(1 AS BIGINT) AS mllib_idf_agrees
FROM census CROSS JOIN tot
WHERE df >= ceil(0.05 * m)
"""


def q_mllib_multiclass_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.evaluation.MulticlassClassificationEvaluator beside the exact
    confusion-derived metrics of the NB language gate (new round 10):
    accuracy / weighted precision / weighted recall / weighted F1
    computed from the oracled confusion matrix's exact integers
    (Spark's published MulticlassMetrics definitions, per true class),
    with the evaluator's four readings agreeing within 1e-9 as flags
    (`indexing.multiclass_eval_twin`)."""
    from pythonvectordb_spark.indexing import multiclass_eval_twin

    return multiclass_eval_twin(load_table(spark, sf_dir, "documents"))


def o_mllib_multiclass_eval() -> str:
    # Contract notes: the confusion CTE IS o_nb_lang_confusion() —
    # single-sourced, so the two queries can never drift; the metric
    # terms mirror Spark's MulticlassMetrics exactly (weights from TRUE
    # class counts, precision 0 when a class is never predicted, f1
    # 0 when P+R == 0). The four literals are guarantee flags with
    # measured margins: all evaluator readings within 1e-9 of the
    # exact forms at both SFs.
    from pythonvectordb_spark.registry.curation import o_nb_lang_confusion

    return f"""
WITH conf AS ({o_nb_lang_confusion()}),
n AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_test FROM conf),
truec AS (SELECT lang AS cls, CAST(sum(n_docs) AS BIGINT) AS n_true
          FROM conf GROUP BY 1),
predc AS (SELECT predicted AS cls, CAST(sum(n_docs) AS BIGINT) AS n_pred
          FROM conf GROUP BY 1),
tpc AS (SELECT lang AS cls, CAST(sum(n_docs) AS BIGINT) AS tp
        FROM conf WHERE lang = predicted GROUP BY 1),
per AS (
  SELECT t.cls, t.n_true,
         COALESCE(p.n_pred, 0) AS n_pred,
         COALESCE(x.tp, 0) AS tp
  FROM truec t
  LEFT JOIN predc p ON t.cls = p.cls
  LEFT JOIN tpc x ON t.cls = x.cls
),
terms AS (
  SELECT per.cls,
         per.tp,
         (per.n_true::DOUBLE / n.n_test) AS w_c,
         (CASE WHEN per.n_pred > 0
               THEN per.tp::DOUBLE / per.n_pred ELSE 0.0 END) AS prec,
         (per.tp::DOUBLE / per.n_true) AS rec
  FROM per CROSS JOIN n
)
SELECT n.n_test,
       round(sum(tp)::DOUBLE / n.n_test, 6) AS accuracy,
       round(sum(w_c * prec), 6) AS weighted_precision,
       round(sum(w_c * rec), 6) AS weighted_recall,
       round(sum(w_c * (CASE WHEN prec + rec > 0.0
                             THEN 2 * prec * rec / (prec + rec)
                             ELSE 0.0 END)), 6) AS f1,
       CAST(1 AS BIGINT) AS acc_agrees,
       CAST(1 AS BIGINT) AS wp_agrees,
       CAST(1 AS BIGINT) AS wr_agrees,
       CAST(1 AS BIGINT) AS f1_agrees
FROM terms CROSS JOIN n
GROUP BY n.n_test
"""
