"""Observability: the reference's ``get_stats`` (pythonvectordb.py:512-555)
as a one-row DataFrame aggregation (SURVEY.md §2.9).

Capacity/utilization drop out (no pre-allocation in Spark); the memory
estimate mirrors the reference's ``vector_count * dimension`` bytes
(pythonvectordb.py:520) for the int8 payload. Latency percentiles come
from a latency log table when one is supplied (the reference keeps a
100-entry ring buffer, :234).
"""

from __future__ import annotations

import time
from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_LATENCIES = 100  # the reference's ring-buffer size (pythonvectordb.py:21)


class LatencyLog:
    """Driver-side search-latency ring buffer (reference search timing,
    pythonvectordb.py:234,399-400): the last MAX_LATENCIES wall times.

    Spark jobs are driver-coordinated, so per-query wall time is a
    driver-side measurement; stats over the log run as a (tiny) DataFrame
    aggregation so the percentile machinery is the engine's own.
    """

    def __init__(self, maxlen: int = MAX_LATENCIES) -> None:
        self._buf: deque[float] = deque(maxlen=maxlen)

    def time(self, df: DataFrame) -> list:
        """Execute (collect) a query DataFrame, recording wall time."""
        t0 = time.time()
        rows = df.collect()
        self._buf.append((time.time() - t0) * 1000.0)
        return rows

    def stats(self, spark: SparkSession) -> DataFrame:
        """Latency percentiles as a one-row DataFrame (get_stats
        analogue, pythonvectordb.py:543-553)."""
        data = [(float(x),) for x in self._buf] or [(0.0,)]
        return latency_stats(spark.createDataFrame(data, "ms double"))


def vector_stats(table: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """One-row stats: count, distinct ids, dimension, int8 memory bytes."""
    return table.agg(
        F.count(F.lit(1)).alias("vector_count"),
        F.countDistinct(F.col(id_col)).alias("distinct_ids"),
        F.min(F.size(F.col(vec_col))).alias("min_dim"),
        F.max(F.size(F.col(vec_col))).alias("max_dim"),
        (F.count(F.lit(1)) * F.min(F.size(F.col(vec_col)))).cast("long").alias(
            "memory_bytes_int8"
        ),
    )


def label_centroids(table: DataFrame, id_col: str = "vec_id", qvec_col: str = "qvec") -> DataFrame:
    """Per-label centroid of quantized vectors via applyInPandas (grouped-
    map, SURVEY §2.11): each group's int8 matrix is reduced with one numpy
    integer sum — exact, so the output is engine-reproducible.

    Output: (label, n_vectors, centroid_checksum) where the checksum is
    sum_j (j+1) * sum_i qvec[i][j] — an exact-integer fingerprint of the
    (unnormalized) centroid numerator.
    """
    import numpy as np
    import pandas as pd

    qv = qvec_col

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        M = np.vstack(pdf[qv].to_numpy()).astype(np.int64)
        col_sums = M.sum(axis=0)
        weights = np.arange(1, M.shape[1] + 1, dtype=np.int64)
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vectors": [len(pdf)],
                "centroid_checksum": [int((weights * col_sums).sum())],
            }
        )

    return table.select("label", qv).groupBy("label").applyInPandas(
        centroid, schema="label int, n_vectors long, centroid_checksum long"
    )


def latency_stats(latency_df: DataFrame, ms_col: str = "ms") -> DataFrame:
    """avg/p50/p95/p99/qps over a latency log (reference get_stats
    percentiles, pythonvectordb.py:543-553)."""
    c = F.col(ms_col)
    return latency_df.agg(
        F.round(F.mean(c), 3).alias("avg_ms"),
        F.round(F.expr(f"percentile_approx({ms_col}, 0.5)"), 3).alias("p50_ms"),
        F.round(F.expr(f"percentile_approx({ms_col}, 0.95)"), 3).alias("p95_ms"),
        F.round(F.expr(f"percentile_approx({ms_col}, 0.99)"), 3).alias("p99_ms"),
        F.round(F.lit(1000.0) / F.mean(c), 1).alias("qps_est"),
    )


def embedding_drift(
    emb: DataFrame,
    dim: int,
    label_col: str = "label",
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Embedding-space drift audit: per label, the cosine between the
    int8 CENTROIDS of the even-id and odd-id halves of the table — the
    embedding-side companion to `curation.distribution_drift` (PSI sees
    categorical shift; this sees the representation itself moving:
    re-embedding with a new model version, ingest corruption, or a label
    whose population changed meaning). Cosine ~1 = the halves agree;
    a drop localizes WHICH label moved.

    Everything before the final cosine is EXACT integer arithmetic:
    per-dimension centroid sums are int8-component sums (longs,
    order-free — no float-fold discipline needed), and the cosine's
    dot/norms are products of those longs promoted to double only for
    the final division. One grouped aggregation computes both halves'
    counts and 2*dim component sums in a single pass (the shuffle
    carries labels x 2*dim longs); output is label-count-sized.

    At 100 TB, swap the id-parity split for a snapshot-version column —
    the plan is unchanged. The 2*dim+2 aggregate columns are the same
    shape the 48-hash MinHash signature agg uses; Catalyst handles
    hundreds of agg expressions in one pass.
    """
    half = (F.col(id_col) % 2 == 0).alias("is_a")
    g = emb.select(F.col(label_col).alias("label"), half, F.col(qvec_col)).groupBy(
        "label"
    ).agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("long").alias("n_b"),
        *[
            F.sum(
                F.when(F.col("is_a"), F.col(qvec_col)[i].cast("long")).otherwise(0)
            ).alias(f"a{i}")
            for i in range(dim)
        ],
        *[
            F.sum(
                F.when(~F.col("is_a"), F.col(qvec_col)[i].cast("long")).otherwise(0)
            ).alias(f"b{i}")
            for i in range(dim)
        ],
    )
    dot = None
    na = None
    nb = None
    for i in range(dim):
        t = F.col(f"a{i}") * F.col(f"b{i}")
        dot = t if dot is None else dot + t
        ta = F.col(f"a{i}") * F.col(f"a{i}")
        na = ta if na is None else na + ta
        tb = F.col(f"b{i}") * F.col(f"b{i}")
        nb = tb if nb is None else nb + tb
    cos = F.when(
        (na > 0) & (nb > 0),
        dot.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))),
    ).otherwise(F.lit(0.0))
    return g.select("label", "n_a", "n_b", F.round(cos, 9).alias("centroid_cosine"))


# Poisson(1) CDF thresholds scaled to [0, 2^32) — the md5-u32 inverse-CDF
# table for the deterministic Poisson bootstrap (weights 0..5, capped 6).
# Integer thresholds make the replicate weights BIT-IDENTICAL in any
# engine: no float literal ever crosses the oracle boundary.
import math as _math

_POISSON1_CDF_U32: list[int] = []
_acc = 0.0
for _k in range(6):
    _acc += _math.exp(-1.0) / _math.factorial(_k)
    _POISSON1_CDF_U32.append(int(_acc * 2.0**32))
del _acc, _k


def bootstrap_mean_ci(
    df: DataFrame,
    cents_col: str,
    id_col: str,
    n_boot: int = 40,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for a mean, via the
    deterministic Poisson bootstrap (Chamandy et al.'s sharded-bootstrap
    trick): replicate ``b`` weights each row Poisson(1)-distributed by
    inverting the CDF on an md5-derived uniform of (id, b) — no
    resampling shuffle, no RNG state, bit-replayable anywhere. The
    pipeline's answer to "is this week's mean shift real or noise?"
    without collecting anything.

    Determinism: the uniform is the md5-prefix exact integer in
    [0, 2^32) compared against PRECOMPUTED INTEGER thresholds
    (floor(CDF·2^32)) — weights are bit-identical across engines;
    replicate sums are exact integers (``cents_col`` must be an exact
    long); the CI bounds are selected by rank over (ROUNDED replicate
    mean, replicate id) — the portable-boundary discipline.

    Scale shape: ONE pass over the data — explode ``n_boot`` replicate
    ids per row, map-side combine collapses each partition to
    ``n_boot`` partial sums, the shuffle carries n_boot×partitions tiny
    rows, and everything after is ``n_boot`` rows. The base projection
    is lazily checkpointed (it feeds the replicas and the full-data
    mean).

    Returns one row: (n_rows, n_boot, mean_cents, ci_lo_cents,
    ci_hi_cents) — the CI trims floor(0.025·n_boot) replicates per
    side (1 of 40 = the 2.5% trim).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(cents_col).cast("long").alias("_x"),
    ).localCheckpoint(eager=False)
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("_id"), F.lit("_"), F.col("b").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(6)
    for k in range(len(_POISSON1_CDF_U32) - 1, -1, -1):
        w = F.when(F.col("_u") < _POISSON1_CDF_U32[k], F.lit(k)).otherwise(w)
    reps = (
        base.select("*", F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("b"))
        .withColumn("_u", u)
        .select("b", w.cast("long").alias("w"), "_x")
        .groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("sw"),
            F.sum(F.col("w") * F.col("_x")).cast("long").alias("swx"),
        )
        .select(
            "b",
            F.round(
                F.col("swx").cast("double") / F.col("sw").cast("double"), 6
            ).alias("mean_b"),
        )
    )
    trim = int(0.025 * n_boot)
    lo_rank, hi_rank = trim + 1, n_boot - trim
    rn = F.row_number().over(Window.orderBy(F.asc("mean_b"), F.asc("b")))
    ci = reps.select(rn.alias("rn"), "mean_b").agg(
        F.max(F.when(F.col("rn") == lo_rank, F.col("mean_b"))).alias("ci_lo_cents"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("mean_b"))).alias("ci_hi_cents"),
        F.count(F.lit(1)).cast("long").alias("n_boot"),
    )
    full = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(
            F.sum("_x").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mean_cents"),
    ).withColumn("_one", F.lit(1))
    return (
        ci.withColumn("_one", F.lit(1))
        .join(F.broadcast(full), "_one")
        .select("n_rows", "n_boot", "mean_cents", "ci_lo_cents", "ci_hi_cents")
    )


def ivf_balance(df: DataFrame, centroids, vec_col: str = "embedding") -> DataFrame:
    """IVF index-health audit: assign every vector to its nearest
    centroid (the same argmax expression the IVF search path uses) and
    summarize the cluster-size distribution — empty cells, max/mean
    imbalance, and the coefficient of variation. The number that
    predicts probe-time tail latency: a skewed codebook makes nprobe
    recall cheap on small cells and blows the 99th percentile on the
    hot one, and partition-pruned ANN inherits exactly this skew as
    task skew at 100 TB (`event_key_skew`'s decide-before-you-shuffle
    role, applied to the vector index).

    All statistics are exact-integer algebra promoted to double only at
    the final division: imbalance = max·k/n and cv = sqrt(k·Σc²−n²)/n
    (population CV; Σc² stays within int64 for per-cell counts up to
    ~1e9). One narrow aggregation over the assignment expression; the
    centroid grid joins in as a broadcast k-row frame so empty cells
    are counted.
    """
    from pythonvectordb_spark.operators.search import ivf_cluster_id

    k = len(centroids)
    spark = df.sparkSession
    cells = spark.range(k).select(F.col("id").cast("int").alias("cluster"))
    counts = (
        df.select(ivf_cluster_id(vec_col, centroids).alias("cluster"))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    allc = cells.join(counts, "cluster", "left").select(
        F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    g = allc.agg(
        F.sum("c").cast("long").alias("n_vectors"),
        F.count(F.lit(1)).cast("long").alias("n_centroids"),
        F.sum(F.when(F.col("c") == 0, 1).otherwise(0)).cast("long").alias("n_empty"),
        F.min("c").cast("long").alias("min_count"),
        F.max("c").cast("long").alias("max_count"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("_sc2"),
    )
    n = F.col("n_vectors").cast("double")
    imb = F.col("max_count").cast("double") * F.col("n_centroids").cast("double") / n
    cv = (
        F.sqrt(
            (
                F.col("n_centroids") * F.col("_sc2")
                - F.col("n_vectors") * F.col("n_vectors")
            ).cast("double")
        )
        / n
    )
    return g.select(
        "n_vectors",
        "n_centroids",
        "n_empty",
        "min_count",
        "max_count",
        F.round(imb, 6).alias("imbalance"),
        F.round(cv, 6).alias("cv"),
    )
