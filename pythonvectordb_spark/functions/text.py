"""Text primitives shared by dedup and text-analysis operators.

All deterministic, engine-portable constructions:
  * tokens    — whitespace split, empties dropped;
  * shingles  — word n-grams (order-sensitive; the dedup unit — token
    *sets* are degenerate when the vocabulary is small);
  * md5-based hashing — md5 is available and identical in Spark and
    DuckDB, so MinHash/SimHash built on it are oracle-checkable, unlike
    engine-private hash functions (xxhash64/murmur differ across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny english-ish stopword list over the testdata vocabulary
STOPWORDS = ("the", "a", "of", "and", "to")

# deterministic marker lists for the marker-count language heuristic.
# Real deployments swap in real frequency tables; the operator shape
# (score-per-language -> argmax with deterministic tie-break) is what
# matters for the engine.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "de": ("group", "window", "order"),
    "es": ("data", "row", "value"),
    "fr": ("join", "merge", "filter"),
    "zh": ("spark", "query", "batch"),
}
LANG_MARKERS_SORTED = sorted(LANG_MARKERS.items())


def tokens(text: Column | str) -> Column:
    """Whitespace tokens with empties removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda t: t != "")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams, joined by single spaces.

    Built with ``transform(sequence(...))`` — pure expressions, identical
    1-based indexing to the DuckDB mirror (oracle.sql_shingles).
    """
    w = tokens(text)
    # guard: Spark's sequence(1, x) with x<1 generates a *descending*
    # sequence, so short documents must short-circuit to no shingles
    idx = F.when(
        F.size(w) >= F.lit(n), F.sequence(F.lit(1), F.size(w) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(gram)


def shingles_fast(text: Column | str, n: int = 3) -> Column:
    """Arrow-batched Pandas-UDF twin of :func:`shingles` — identical output
    (pure string concatenation, first-occurrence distinct order), ~10x
    faster than the interpreted higher-order-function expression on large
    corpora. Used by the dedup operators; equality with the expression
    version is pinned by tests/test_properties.py.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    nn = n

    @pandas_udf(ArrayType(StringType()))
    def _shingle(texts):
        out = []
        for t in texts:
            w = [] if t is None else [x for x in t.split(" ") if x]
            if len(w) < nn:
                out.append([])
            else:
                out.append(
                    list(dict.fromkeys(" ".join(w[i : i + nn]) for i in range(len(w) - nn + 1)))
                )
        return pd.Series(out)

    c = F.col(text) if isinstance(text, str) else text
    return _shingle(c)


def minhash_value(seed: int, token_col: Column) -> Column:
    """One MinHash family member: md5('<seed>:' || token), compared
    lexicographically (hex strings order identically in both engines).
    (Kept for reference/tests; the production minhash uses the two-hash
    family below — one md5 per token instead of one per family member.)"""
    return F.md5(F.concat(F.lit(f"{seed}:"), token_col))


# two-hash MinHash family: h_i = (A_i*h1 + B_i*h2) mod P, with h1/h2 the
# two 32-bit halves of one md5. P = 2^61-1 (Mersenne); A_i < 2^28 keeps
# A_i*h1 < 2^60, so the sum stays inside a signed 64-bit long.
MINHASH_P = (1 << 61) - 1


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (A_i, B_i) constants for the two-hash family."""
    import numpy as np

    rng = np.random.default_rng(20240813)
    return [
        (int(rng.integers(1, 1 << 28)), int(rng.integers(0, 1 << 28)))
        for _ in range(num_hashes)
    ]


def hash32(token_col: Column) -> Column:
    """Deterministic 32-bit token hash: first 8 hex chars of md5 -> long."""
    return F.conv(F.substring(F.md5(token_col), 1, 8), 16, 10).cast("long")


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: trim, collapse whitespace, lower."""
    c = F.col(text) if isinstance(text, str) else text
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
