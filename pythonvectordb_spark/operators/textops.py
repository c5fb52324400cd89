"""Text-analysis operators for training-data pipelines (driver mandate,
SURVEY.md §2.12): language ID, quality scoring, token counting, document
fingerprinting. Pure column expressions — no Python in the row path, so
every operator whole-stage-codegens and scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pythonvectordb_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    normalize_text,
    tokens,
)


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + distinct token counts and char length (all exact ints)."""
    t = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.length(F.col(text_col)).alias("n_chars_measured"),
    )


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality signals: token stats, stopword ratio, type-token ratio, and
    a composite quality score. All ratios are exact-integer divisions
    (deterministic doubles), rounded for output stability."""
    t = tokens(text_col)
    n_tok = F.size(t).cast("double")
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))).cast("double")
    n_uniq = F.size(F.array_distinct(t)).cast("double")
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    ttr = F.when(n_tok > 0, n_uniq / n_tok).otherwise(F.lit(0.0))
    avg_len = F.when(
        n_tok > 0,
        (F.length(F.col(text_col)).cast("double") - (n_tok - 1)) / n_tok,
    ).otherwise(F.lit(0.0))
    # composite: long-enough, diverse, not stopword-soup
    score = (
        F.least(n_tok / F.lit(50.0), F.lit(1.0)) * F.lit(0.4)
        + ttr * F.lit(0.4)
        + (F.lit(1.0) - stop_ratio) * F.lit(0.2)
    )
    return df.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.round(stop_ratio, 9).alias("stopword_ratio"),
        F.round(ttr, 9).alias("type_token_ratio"),
        F.round(avg_len, 9).alias("avg_token_len"),
        F.round(score, 9).alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-count language heuristic: score each language by marker-token
    hits, argmax with deterministic tie-break (lexicographic language
    code); 'und' when nothing matches."""
    t = tokens(text_col)
    scores = {
        lang: F.size(F.filter(t, lambda x: x.isin(*markers))).cast("long")
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    # iterate in reverse-lexicographic order so that on ties the
    # lexicographically-smallest language wins (>= replaces)
    for lang in sorted(scores, reverse=True):
        s = scores[lang]
        improved = (s > F.lit(0)) & (s >= best_score)
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(improved, s).otherwise(best_score)
    return df.select(
        F.col(id_col),
        best_lang.alias("lang_guess"),
        best_score.alias("marker_hits"),
    )


def tfidf_terms(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """TF-IDF per (document, term): tf * (ln((N+1)/(df+1)) + 1) — the
    smoothed-idf formula, computed with exact integer tf/df so only the
    final ln/multiply are floating point (deterministic, rounded).

    Plan shape: one explode + two grouped aggregations + a broadcast-able
    term-dimension join; no Python, scales linearly in corpus size. The
    corpus size N joins in as a broadcast 1-row aggregate, so the whole
    computation is ONE lazy job (no separate driver-blocking count()).
    """
    from pythonvectordb_spark.util import ensure_parallelism

    # 1-row, column-pruned count — broadcast into the plan instead of a
    # separate eager count() job (integer counts < 2^53 are exact doubles)
    n_docs = df.select(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    toks = ensure_parallelism(df).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(
        (F.col("_n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1)).cast("double")
    ) + F.lit(1.0)
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            "tf",
            "df",
            F.round(F.col("tf").cast("double") * idf, 6).alias("tfidf"),
        )
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical-text fingerprint: md5 over normalized text + byte length.

    The md5 is the content-defined dedup key used by dedup_exact; byte
    length is a cheap secondary check."""
    norm = normalize_text(text_col)
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("int").alias("norm_len"),
    )
