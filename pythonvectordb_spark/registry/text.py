"""Text analysis: tokens, quality, BPE, vocabulary, language models, surprisal, fingerprints and corpus text statistics.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import (
    BPE_N_MERGES,
    CU,
    DataFrame,
    F,
    LANG_MARKERS_SORTED,
    M,
    O,
    STOPWORDS,
    SparkSession,
    TX,
    _BPE_SPLIT,
    _SH_CTE,
    _bpe_cte_chain,
    load_table,
)


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
