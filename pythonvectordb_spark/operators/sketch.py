"""Count-min sketch built relationally (the "novel sketch" extension
surface; no reference analogue — the reference keeps exact state only).

A CMS is ``depth`` hash rows x ``width`` counters; the point estimate for
a key is the MIN of its ``depth`` counters and is always >= the true
count (collisions only inflate).  Everything here is md5-derived and
expression-only, so — unlike Spark's built-in ``count_min_sketch`` whose
binary is engine-private — the sketch AND its estimates are
deterministically reproducible in ANSI SQL and oracle-checked.

Scale posture: the build is one explode (depth rows per input row) + one
grouped count — partial aggregation makes the shuffle carry at most
``depth x width`` rows per task regardless of input size, and the
finished sketch is ``depth x width`` counters total: constant-size state
for unbounded keys, the entire point of a sketch at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256


def _bucket(key_col, d: int):
    """Row-d hash bucket: md5("d:" + key) first 8 hex digits mod width."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{d}:"), key_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return (h % CMS_WIDTH).cast("int")


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build the (depth, bucket, n) counter table in one pass."""
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(F.lit(d).alias("depth"), _bucket(key, d).alias("bucket"))
            for d in range(CMS_DEPTH)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cms_heavy_hitters(df: DataFrame, key_col: str, k: int = 5) -> DataFrame:
    """Top-k frequent keys by CMS estimate (sketch-driven heavy hitters).

    At 100 TB the distinct-key probe side is the stream's key directory
    (small relative to events); the sketch stays depth x width counters.
    Estimates only ever over-count, so no true heavy hitter can be pushed
    out by an under-estimate — the classic CMS top-k guarantee.
    """
    key = F.col(key_col)
    sketch = cms_build(df, key_col)
    probes = df.select(key.alias("key")).distinct().select(
        "key",
        F.posexplode(
            F.array(*[_bucket(F.col("key"), d) for d in range(CMS_DEPTH)])
        ).alias("depth", "bucket"),
    )
    est = (
        probes.join(sketch, ["depth", "bucket"], "left")
        # group on the key's ORIGINAL type: casting to long would NULL out
        # non-numeric keys and silently collapse them into one group
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("est_n"))
    )
    return est.orderBy(F.desc("est_n"), F.asc("key")).limit(k)


def cms_estimate(df: DataFrame, key_col: str, probe_keys: list) -> DataFrame:
    """Point estimates for ``probe_keys`` against the sketch of ``df``,
    next to the true counts (estimate >= true always; equality when the
    key's buckets are collision-free)."""
    sketch = cms_build(df, key_col)
    # probe literals adopt the key column's own type so the hash's string
    # rendering and the final join/group key match the data exactly for
    # any key type (string keys included)
    key_type = df.schema[key_col].dataType
    probes = []
    for k in probe_keys:
        kl = F.lit(k).cast(key_type)
        probes.append(
            F.struct(
                kl.alias("key"),
                F.array(
                    *[_bucket(kl, d) for d in range(CMS_DEPTH)]
                ).alias("buckets"),
            )
        )
    probe_df = df.sparkSession.range(1).select(
        F.explode(F.array(*probes)).alias("p")
    ).select(
        F.col("p.key").alias("key"),
        F.posexplode("p.buckets").alias("depth", "bucket"),
    )
    est = (
        probe_df.join(sketch, ["depth", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("est_n"))
    )
    true = (
        df.filter(F.col(key_col).isin(probe_keys))
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("true_n"))
    )
    return est.join(true, "key", "left").select(
        "key", "est_n", F.coalesce("true_n", F.lit(0)).cast("long").alias("true_n")
    )


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """One-row shuffle-key skew diagnostic: before committing a 100 TB
    join/agg to a key, measure how lopsided its distribution is — the
    number that decides between a plain shuffle, AQE skew-split, and
    explicit salting (``relational.salted_agg``'s whole reason to exist).

    Reports row/key counts, the max and hottest-key share, exact
    interpolated p50/p90/p99 of the per-key count distribution, and
    ``skew_factor`` = max_cnt / mean_cnt — the multiple by which the
    hottest reducer outweighs the average one (1.0 = perfectly even;
    >> shuffle-partition head-room = salt or split).

    Two aggregations: per-key counts (map-side combined — the shuffle
    carries one row per distinct key), then a single-row reduce over the
    (much smaller) key-count table. Percentiles are exact here because
    the reduce input is |keys| rows, not |rows|; at extreme key
    cardinality swap stage 2's percentile for approx_percentile — the
    report's consumers only need order-of-magnitude quantiles.
    """
    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    top = F.max(F.struct(F.col("cnt"), F.col("_k").cast("string").alias("k")))
    return counts.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_cnt"),
        top.getField("k").alias("top_key"),
        F.round(F.max("cnt") / F.sum("cnt"), 9).alias("top_share"),
        F.round(F.expr("percentile(cnt, 0.5)"), 6).alias("p50_cnt"),
        F.round(F.expr("percentile(cnt, 0.9)"), 6).alias("p90_cnt"),
        F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("p99_cnt"),
        F.round(F.max("cnt") / F.avg("cnt"), 6).alias("skew_factor"),
    )


def gk_error_bound(
    df: DataFrame,
    value_col: str,
    group_col: str,
    probes: tuple[float, ...] = (0.5, 0.99),
    accuracy: int = 10000,
    slack: float = 0.02,
) -> DataFrame:
    """Per-group GK approx-percentile with its error bound asserted as
    data: for each probe p, emit ``within_bound`` = 1 iff the sketch
    value lies inside the EXACT percentile band [p - slack, p + slack].

    This turns the engine-specific sketch into an oracle-checkable
    contract (the CMS-family pattern): DuckDB cannot replay Spark's GK
    summary, but it can assert the guarantee — GK with ``accuracy`` a
    has rank error <= n/a, far inside a ``slack`` band of interpolated
    exact percentiles for any non-degenerate group — so the oracle emits
    the constant 1 and a sketch regression breaks the value hash.

    Scale posture: one grouped aggregation; GK state is O(accuracy)
    per group with partial merge (the whole point vs the exact twin
    ``value_percentiles``, whose state is the group's values). The exact
    band here is the verification harness, not the production path.
    """
    probes = tuple(probes)
    band = []
    for p in probes:
        band.append(max(0.0, p - slack))
        band.append(min(1.0, p + slack))
    ap_sql = ", ".join(repr(float(p)) + "D" for p in probes)
    band_sql = ", ".join(repr(float(b)) + "D" for b in band)
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"approx_percentile({value_col}, array({ap_sql}), {accuracy})").alias("ap"),
        F.expr(f"percentile({value_col}, array({band_sql}))").alias("ex"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(int(round(p * 10000))).cast("long").alias("probe_bp"),
                (
                    (F.col("ap")[i] >= F.col("ex")[2 * i])
                    & (F.col("ap")[i] <= F.col("ex")[2 * i + 1])
                )
                .cast("long")
                .alias("within_bound"),
            )
            for i, p in enumerate(probes)
        ]
    )
    return agg.select(
        F.col(group_col), F.col("n"), F.explode(rows).alias("r")
    ).select(
        group_col,
        F.col("r.probe_bp").alias("probe_bp"),
        "n",
        F.col("r.within_bound").alias("within_bound"),
    )


def trimmed_stats(
    df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    trim_pct: int = 10,
) -> DataFrame:
    """Trimmed and winsorized means per group — the robust-location
    companions to `event_value_mad`'s robust scale: the trimmed mean
    drops the top/bottom ``trim_pct``% outright (what a revenue metric
    should report when a few whale rows would otherwise own it), the
    winsorized mean clamps them to the cut values (keeps mass, caps
    leverage). The plain mean is emitted beside them; mean >>
    trimmed_mean IS the outlier alarm.

    Exactness: values become exact integer cents; with per-group n and
    k = floor(n*pct/100), the row_number cut (value, id tie-break)
    makes the kept set deterministic; trimmed/winsorized sums are
    integer algebra (winsorized = trimmed + k*lo + k*hi with lo/hi the
    exact order statistics at ranks k+1 and n-k), each divided once at
    the end, ROUNDED 6.

    Scale shape: one window shuffle on the group key (rank and count
    share the partitioning), one grouped aggregate; nothing global.
    """
    from pyspark.sql import Window

    cents = F.round(F.col(val_col) * 100).cast("long")
    wp = Window.partitionBy(key_col)
    wr = wp.orderBy(cents.asc(), F.col(id_col).asc())
    r = df.select(
        F.col(key_col).alias("k"),
        cents.alias("c"),
        F.row_number().over(wr).cast("long").alias("i"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
    ).withColumn("kcut", F.floor((F.col("n") * F.lit(int(trim_pct))) / F.lit(100.0)).cast("long"))
    keep = (F.col("i") > F.col("kcut")) & (F.col("i") <= F.col("n") - F.col("kcut"))
    g = r.groupBy("k").agg(
        F.max("n").alias("n"),
        F.max("kcut").alias("kcut"),
        F.sum("c").cast("long").alias("s_all"),
        F.sum(F.when(keep, F.col("c"))).cast("long").alias("s_trim"),
        F.max(F.when(F.col("i") == F.col("kcut") + 1, F.col("c"))).alias("lo"),
        F.max(F.when(F.col("i") == F.col("n") - F.col("kcut"), F.col("c"))).alias("hi"),
    )
    s_wins = F.col("s_trim") + F.col("kcut") * F.col("lo") + F.col("kcut") * F.col("hi")
    return g.select(
        F.col("k").alias(key_col),
        F.col("n").alias("n"),
        F.col("kcut").alias("n_trimmed_each_side"),
        F.round(F.col("s_all").cast("double") / (F.lit(100.0) * F.col("n").cast("double")), 6).alias("mean"),
        F.round(
            F.col("s_trim").cast("double")
            / (F.lit(100.0) * (F.col("n") - F.lit(2) * F.col("kcut")).cast("double")),
            6,
        ).alias("trimmed_mean"),
        F.round(s_wins.cast("double") / (F.lit(100.0) * F.col("n").cast("double")), 6).alias(
            "winsorized_mean"
        ),
        F.round(F.col("lo").cast("double") / 100.0, 2).alias("lo_cut"),
        F.round(F.col("hi").cast("double") / 100.0, 2).alias("hi_cut"),
    )


def hill_tail_index(
    df: DataFrame,
    value_col: str = "o_totalprice",
    key_col: str = "o_orderkey",
    ks: tuple = (50, 100, 200),
) -> DataFrame:
    """Hill estimator of the right-tail index of the order-value
    distribution at several tail depths k — the "how heavy is the
    tail" scalar that decides skew posture: alpha <= 2 means the
    biggest keys dominate any sum (salt / isolate heavy hitters;
    `event_key_skew`'s remedies), alpha large means the tail dies fast
    and uniform partitioning is safe. Reading alpha across k values is
    the standard Hill-plot stability check — estimates that agree
    across k are trustworthy.

    Determinism: values are exact integer cents; the tail is the top
    max(ks)+1 rows under (cents DESC, key ASC) — a deterministic
    TakeOrderedAndProject shortlist; alpha_k = k / sum_{i<=k}
    ln(x_(i)/x_(k+1)) where every ln argument is an exact integer
    ratio's components (ln(cents_i) - ln(cents_k+1) summed as doubles
    over k <= 200 terms — the `twonn_intrinsic_dim` discipline),
    ROUNDED 6.

    Scale shape: ONE top-(kmax+1) selection over the table (partial
    top-k per partition, no global sort); every window and join after
    runs on the (kmax+1)-row shortlist crossed with |ks| probe depths.
    """
    from pyspark.sql import Window

    kmax = max(int(k) for k in ks)
    cents = F.round(F.col(value_col) * 100).cast("long")
    top = (
        df.select(cents.alias("cents"), F.col(key_col).alias("k_"))
        .orderBy(F.col("cents").desc(), F.col("k_").asc())
        .limit(kmax + 1)
        .localCheckpoint(eager=False)
    )
    rn = F.row_number().over(
        Window.orderBy(F.col("cents").desc(), F.col("k_").asc())
    )
    ranked = top.select("cents", rn.cast("long").alias("rn"))
    kf = (
        df.sparkSession.range(1)
        .select(F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k"))
        .withColumn("_one", F.lit(1))
    )
    g = (
        ranked.withColumn("_one", F.lit(1))
        .join(F.broadcast(kf), "_one")
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.col("rn") <= F.col("k"), F.log(F.col("cents").cast("double")))
            ).alias("s_log"),
            F.max(F.when(F.col("rn") == F.col("k") + 1, F.col("cents")))
            .cast("long")
            .alias("xk1_cents"),
        )
    )
    excess = F.col("s_log") - F.col("k").cast("double") * F.log(
        F.col("xk1_cents").cast("double")
    )
    return g.select(
        F.col("k").cast("int").alias("k"),
        "xk1_cents",
        F.round(excess, 6).alias("sum_log_excess"),
        F.round(F.col("k").cast("double") / excess, 6).alias("alpha_hill"),
    )


def shard_uniformity(df: DataFrame, id_col: str = "doc_id", n_shards: int = 16) -> DataFrame:
    """Chi-square uniformity audit of the md5 shard assignment the
    export/sampling paths rely on (`export._shard_col`'s exact
    expression): the self-check that the deterministic hash really
    scatters THIS id population evenly — a skewed id space (all-even
    ids, range-clustered ids) would silently unbalance training shards
    and salted joins. chi^2 >> k says re-key.

    Determinism: shard = conv(md5[0:8]) % k mirrored by DuckDB's
    ('0x'||substr)::BIGINT % k; chi^2 = (k*sum(o^2) - N^2)/N with an
    exact int64 numerator and ONE double division, ROUNDED 6; min/max
    shard shares ROUNDED 9.

    Scale shape: one grouped count on a k-value key (map-side
    combined); a k-row aggregate after.
    """
    from pythonvectordb_spark.operators.export import _shard_col

    g = (
        df.select(_shard_col(id_col, n_shards).alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.sum("o").cast("long").alias("n"),
        F.sum(F.col("o") * F.col("o")).cast("long").alias("so2"),
        F.min("o").cast("long").alias("min_shard"),
        F.max("o").cast("long").alias("max_shard"),
    )
    num = (F.lit(int(n_shards)) * F.col("so2") - F.col("n") * F.col("n")).cast("long")
    return t.select(
        F.col("n").alias("n_rows"),
        F.col("k_used").alias("n_shards_hit"),
        F.round(num.cast("double") / F.col("n").cast("double"), 6).alias("chisq"),
        F.round(F.col("min_shard").cast("double") / F.col("n").cast("double"), 9).alias(
            "min_share"
        ),
        F.round(F.col("max_shard").cast("double") / F.col("n").cast("double"), 9).alias(
            "max_share"
        ),
    )


KMV_K = 64
KMV_SPACE = float(2**32)  # md5 8-hex-digit prefix hash space


def kmv_distinct(df: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """K-minimum-values distinct-count sketch, estimate AND exact side
    in one query: hash every key to a 32-bit md5 prefix, keep the k
    smallest DISTINCT hash values, estimate D = (k-1) * 2^32 / h_(k)
    (Bar-Yossef et al. 2002). Constant state (k hashes) for unbounded
    keys — the mergeable cardinality sketch whose per-shard top-k
    min-heaps union by keeping the k smallest of the union, exactly a
    TakeOrdered at 100 TB.

    Unlike HLL (engine-private binary, rows-only checkable), every
    number here is md5-derived and expression-reproducible, so the
    sketch itself is oracle-hashable. Fewer than k distinct hashes
    means the sketch IS the exact set: estimate = that count.

    Determinism: hashes are exact int64; the k-th order statistic is a
    TakeOrdered boundary on distinct integers; the estimate is one
    double division, ROUNDED 6.

    Scale shape: one distinct-key aggregation (map-side combined) to
    the hash directory, one TakeOrdered(k); everything after is
    one-row algebra.
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    hashes = df.select(h.alias("h")).distinct().localCheckpoint(eager=False)
    kth = (
        hashes.orderBy(F.asc("h"))
        .limit(int(k))
        .agg(
            F.max("h").cast("long").alias("kth_hash"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
        .withColumn("_one", F.lit(1))
    )
    exact = df.agg(
        F.countDistinct(key_col).cast("long").alias("n_distinct_exact")
    ).withColumn("_one", F.lit(1))
    j = exact.join(F.broadcast(kth), "_one")
    est = F.when(
        F.col("n_kept") < F.lit(int(k)), F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.col("kth_hash").cast("double")
    )
    return j.select(
        F.lit(int(k)).cast("int").alias("k"),
        "n_distinct_exact",
        "kth_hash",
        F.round(est, 6).alias("estimate"),
        F.round(
            F.abs(est - F.col("n_distinct_exact").cast("double"))
            / F.col("n_distinct_exact").cast("double"),
            6,
        ).alias("rel_error"),
    )


BLOOM_M = 4096
BLOOM_K = 3


def bloom_fpr(
    members: DataFrame,
    probes: DataFrame,
    key_col: str,
    m: int = BLOOM_M,
    n_hashes: int = BLOOM_K,
) -> DataFrame:
    """Bloom filter with MEASURED false-positive rate: build the bit
    set from ``members``' keys (md5-derived positions, so the filter is
    engine-reproducible, unlike the engine-private built-in), probe it
    with keys known absent, and report measured vs expected FPR
    (1 - e^{-kn/m})^k ~ (bits_set/m)^k — the calibration that tells a
    Bloom-pruned semi-join (`bloom_prune_join`) what fraction of
    pruned-side IO the filter actually saves.

    Determinism: bit positions are exact md5 arithmetic; a probe is a
    false positive iff ALL its k positions are set — an integer count
    over an equi-join; expected FPR is one pinned double expression,
    ROUNDED 6.

    Scale shape: the bit set is at most m rows (distinct positions —
    map-side combined); probes explode to k positions and semi-join the
    broadcast bit set; one grouped count per probe then one global
    aggregate. The filter state is m bits regardless of member count.
    Both key directories are deduped ONCE and lazily checkpointed —
    each feeds two consumers (positions + count), and recomputing the
    upstream scan per consumer is the union-recompute anti-pattern the
    advisor rejects.
    """
    members = (
        members.select(F.col(key_col).alias("mk"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    probes = (
        probes.select(F.col(key_col).alias("pk"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def positions(col):
        return F.array(
            *[
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{j}:"), col.cast("string"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.lit(int(m))
                )
                for j in range(int(n_hashes))
            ]
        )

    bits = (
        members.select(F.explode(positions(F.col("mk"))).alias("pos"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_bits = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set")).withColumn(
        "_one", F.lit(1)
    )
    n_mem = members.agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    ).withColumn("_one", F.lit(1))
    probe_pos = probes.select(
        "pk", F.explode(positions(F.col("pk"))).alias("pos")
    )
    hits = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_set"))
        .filter(F.col("n_set") == int(n_hashes))
        .agg(F.count(F.lit(1)).cast("long").alias("n_false_positives"))
        .withColumn("_one", F.lit(1))
    )
    n_probe = probes.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes")
    ).withColumn("_one", F.lit(1))
    j = (
        n_mem.join(F.broadcast(n_bits), "_one")
        .join(F.broadcast(n_probe), "_one")
        .join(F.broadcast(hits), "_one")
    )
    load = F.col("n_bits_set").cast("double") / F.lit(float(m))
    # an exhaustive member set leaves nothing to probe (sf0.001's
    # every-user-purchased degenerate): measured FPR is undefined, NULL
    fpr_m = F.when(
        F.col("n_probes") > 0,
        F.col("n_false_positives").cast("double") / F.col("n_probes").cast("double"),
    )
    expected = load * load * load if n_hashes == 3 else F.pow(load, float(n_hashes))
    return j.select(
        F.lit(int(m)).cast("int").alias("m"),
        F.lit(int(n_hashes)).cast("int").alias("k_hashes"),
        "n_members",
        "n_bits_set",
        "n_probes",
        "n_false_positives",
        F.round(fpr_m, 6).alias("fpr_measured"),
        F.round(expected, 6).alias("fpr_expected"),
    )


def kmv_distinct_grouped(
    df: DataFrame, key_col: str, group_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group K-minimum-values distinct-count sketch (the grouped
    twin of :func:`kmv_distinct`): for every ``group_col`` value, hash
    each key to a 32-bit md5 prefix, keep the k smallest DISTINCT hash
    values, estimate D = (k-1) * 2^32 / h_(k), and report it next to
    the exact distinct count and relative error.

    Round-7 graduation of the last rows-only cardinality surface
    (``approx_distinct_events``): HLL registers are engine-private, but
    the KMV sketch's internals — the k-th hash boundary, the kept-hash
    count, the estimate — are all md5-derived and expression-
    reproducible, so the SKETCH ITSELF hash-matches a DuckDB oracle
    (VERDICT r6 task 3; ``kmv_distinct_users`` precedent). The HLL
    engine path stays exercised by the ``approx_distinct_error``
    guarantee twin.

    Determinism: hashes are exact int64; the per-group k-th order
    statistic ranks DISTINCT integers (no ties); the estimate is one
    double division, ROUNDED 6.

    Scale shape: one distinct aggregation to the per-group hash
    directory (map-side combined — same cost class as the exact
    count-distinct it sits beside), then a per-group bottom-k via a
    ranked window over that directory. In production the bottom-k
    merges as per-shard min-heaps (keep the k smallest of a union);
    the window here is the verification-friendly spelling of that
    TakeOrdered-per-group.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    hashes = (
        df.select(F.col(group_col), h.alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy(group_col).orderBy(F.asc("h"))
    kth = (
        hashes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(k))
        .groupBy(group_col)
        .agg(
            F.max("h").cast("long").alias("kth_hash"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
    )
    exact = df.groupBy(group_col).agg(
        F.countDistinct(key_col).cast("long").alias("n_distinct_exact")
    )
    est = F.when(
        F.col("n_kept") < F.lit(int(k)), F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.col("kth_hash").cast("double")
    )
    return exact.join(kth, group_col).select(
        group_col,
        F.lit(int(k)).cast("int").alias("k"),
        "n_distinct_exact",
        "kth_hash",
        F.round(est, 6).alias("estimate"),
        F.round(
            F.abs(est - F.col("n_distinct_exact").cast("double"))
            / F.col("n_distinct_exact").cast("double"),
            6,
        ).alias("rel_error"),
    )


SAMPLE_PCT_K = 256


def bottomk_sample_percentiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str,
    k: int = SAMPLE_PCT_K,
    probes: tuple[float, ...] = (0.5, 0.99),
) -> DataFrame:
    """Per-group bottom-k-by-hash sample percentiles — a mergeable,
    engine-reproducible quantile sketch: keep the ``k`` rows whose
    unique-id md5 hash is smallest (a deterministic uniform
    without-replacement sample; bottom-k of a union is the k smallest
    of the per-shard bottom-ks, so the state merges exactly like KMV),
    then take EXACT interpolated percentiles of the sampled values.

    Round-7 graduation of the last rows-only percentile surface
    (``approx_value_percentiles``): Spark's GK summary is
    engine-private, but this sketch's internals — which rows the
    sample keeps, hence every output number — are md5-derived and
    expression-reproducible, so the sketch itself hash-matches a
    DuckDB oracle (VERDICT r6 task 3; KMV precedent). The GK engine
    path stays exercised by the ``approx_percentile_error`` guarantee
    twin.

    Determinism: the sample is fixed by md5 over the unique id (ties on
    the 32-bit prefix broken by the id itself); the interpolated
    percentile over a fixed multiset is exact arithmetic, ROUNDED 6.

    Scale shape: one ranked window over (group, hash) picks the sample
    — in production the bottom-k merges as per-shard min-heaps
    (TakeOrdered per group, state k rows/group regardless of input) —
    then one grouped exact percentile over k rows per group and a
    broadcast join against the per-group row counts.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = Window.partitionBy(group_col).orderBy(F.asc("h"), F.asc(id_col))
    p_sql = ", ".join(repr(float(p)) + "D" for p in probes)
    samp = (
        df.select(F.col(group_col), F.col(value_col), h.alias("h"), F.col(id_col))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(k))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("sample_n"),
            F.expr(f"percentile({value_col}, array({p_sql}))").alias("sp"),
        )
    )
    full = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n"))
    cols = [group_col, "n", "sample_n"]
    out = full.join(F.broadcast(samp), group_col).select(
        *cols,
        *[
            F.round(F.col("sp")[i], 6).alias(f"ap{int(round(p * 100))}")
            for i, p in enumerate(probes)
        ],
    )
    return out


def kmv_set_ops(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on two KMV sketches (new round
    7 — the set-algebra completion of the KMV family): estimate
    |A ∪ B| from the combined bottom-k of the union's hash directory
    and |A ∩ B| as jaccard_est * union_est, where jaccard_est is the
    fraction of the union's k minimum hashes that belong to BOTH sides
    (the standard KMV/theta intersection estimator). Exact counts ride
    along, so the estimate, its machinery, and its relative error are
    all in one row.

    Like :func:`kmv_distinct`, every number is md5-derived and
    expression-reproducible, so the sketch itself hash-matches a
    DuckDB oracle — the engine-private alternative (HLL union via
    register max) cannot be checked this way.

    Determinism: membership flags are exact; the bottom-k boundary
    ranks distinct int64 hashes; the two estimates are single double
    expressions, ROUNDED 6.

    Scale shape: each side dedups to its key directory (map-side
    combined), a full outer join aligns membership flags, one
    TakeOrdered(k) picks the union's minimum hashes; everything after
    is one-row algebra. Sketch state is k hashes + 2 flags regardless
    of input size, and per-shard bottom-ks merge by keeping the k
    smallest of the union.
    """
    a = df_a.select(F.col(key_col).alias("k_")).distinct()
    b = df_b.select(F.col(key_col).alias("k_")).distinct()
    m = (
        a.withColumn("in_a", F.lit(1))
        .join(b.withColumn("in_b", F.lit(1)), "k_", "full_outer")
        .select(
            "k_",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
        .localCheckpoint(eager=False)  # exact totals AND the bottom-k
    )
    h = F.conv(
        F.substring(F.md5(F.col("k_").cast("string")), 1, 8), 16, 10
    ).cast("long")
    kept = (
        m.select(h.alias("h"), "in_a", "in_b")
        .orderBy(F.asc("h"))
        .limit(int(k))
        .agg(
            F.max("h").cast("long").alias("kth_hash"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both_kept"),
        )
        .withColumn("_one", F.lit(1))
    )
    exact = m.agg(
        F.sum("in_a").cast("long").alias("n_a_exact"),
        F.sum("in_b").cast("long").alias("n_b_exact"),
        F.count(F.lit(1)).cast("long").alias("n_union_exact"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_inter_exact"),
    ).withColumn("_one", F.lit(1))
    j = exact.join(F.broadcast(kept), "_one")
    union_est = F.when(
        F.col("n_kept") < F.lit(int(k)), F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.col("kth_hash").cast("double")
    )
    jacc_est = F.col("n_both_kept").cast("double") / F.col("n_kept").cast("double")
    inter_est = jacc_est * union_est
    return j.select(
        F.lit(int(k)).cast("int").alias("k"),
        "n_a_exact",
        "n_b_exact",
        "n_union_exact",
        "n_inter_exact",
        "kth_hash",
        "n_both_kept",
        F.round(union_est, 6).alias("union_est"),
        F.round(jacc_est, 6).alias("jaccard_est"),
        F.round(inter_est, 6).alias("inter_est"),
        F.round(
            F.abs(union_est - F.col("n_union_exact").cast("double"))
            / F.col("n_union_exact").cast("double"),
            6,
        ).alias("union_rel_error"),
    )
