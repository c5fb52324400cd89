"""Deduplication families: exact, n-gram Jaccard, MinHash-LSH, SimHash, spans, semantic/embedding near-dup, resolution.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import (
    CU,
    DD,
    DataFrame,
    F,
    FX,
    NGRAM_MAX_DF,
    O,
    STOPWORDS,
    SparkSession,
    TX,
    Window,
    _EDGES_SQL,
    _JACCARD,
    _SH_CTE,
    _SH_KEPT_CTE,
    _SIMHASH_CTE,
    _simhash_cte,
    load_table,
)


from pythonvectordb_spark.registry.text import o_text_quality


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


def q_dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-set Jaccard between the MinHash>=0.8 and SimHash<=3
    detectors (staged for the round-5 rotation): the method-risk audit
    behind running one family or both
    (`operators/dedup.pair_method_agreement`)."""
    docs = load_table(spark, sf_dir, "documents")
    return DD.pair_method_agreement(
        *DD.method_pair_sets(docs, threshold=0.8, max_hamming=3)
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


def q_dedup_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar marginal-homogeneity test between the MinHash>=0.8 and
    SimHash<=3 duplicate detectors' per-document flags (new round 7):
    the significance companion to `dedup_method_agreement`'s Jaccard —
    symmetric disagreement means the families see different duplicates
    (`operators/dedup.method_mcnemar`)."""
    docs = load_table(spark, sf_dir, "documents")
    return DD.method_mcnemar(
        docs, *DD.method_pair_sets(docs, threshold=0.8, max_hamming=3)
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
