"""Time-series operators Spark lacks as built-ins, composed scalably.

The reference engine has no time-series surface at all (SURVEY.md §2.10);
these are extension operators for the events table (TESTDATA.md), designed
for the 100 TB regime:

* ``asof_join`` — point-in-time join. NOT implemented as a range join
  (which explodes to |L|x|R| candidate pairs per key before filtering) but
  as the union+running-last trick: tag both sides, sort-merge them in ONE
  shuffle on the key, and carry the latest right-side payload forward with
  a running ``last(ignorenulls)`` window.  O(n log n) per key, one
  exchange, no broadcast requirement on either side — this is the shape
  that survives 1000 executors; DuckDB's native ASOF JOIN is the oracle.
* ``sessionize`` — gap-based sessions via lag + running conditional sum
  (the standard scalable sessionization; one shuffle on user_id).
* ``moving_window_stats`` — event-time RANGE-frame windows (true
  time-based frames, not row counts); Spark evaluates the frame
  incrementally per partition.

All numeric outputs are exact integers (micros / cents) so the DuckDB
hash-match is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_MIN = 60_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    payload_cols: list[str],
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the newest right row with
    ``right.ts <= left.ts`` on the same key (inclusive, like DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts``); left rows with no prior right row
    keep NULL payloads (left-outer semantics).

    ``payload_cols`` are the right-side columns to carry; they are
    delivered as ``<name>_asof``.  ``tiebreak`` orders equal-timestamp
    right rows (the larger value wins), making the pick deterministic.
    """
    payload = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    r = right.select(
        F.col(key).alias(key),
        F.col(ts_col).alias(ts_col),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *([F.col(tiebreak).alias(tiebreak)] if tiebreak else []),
    )
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(r.schema["_payload"].dataType)
    )
    injected_tiebreak = tiebreak is not None and tiebreak not in left.columns
    if injected_tiebreak:
        l = l.withColumn(tiebreak, F.lit(None).cast(r.schema[tiebreak].dataType))
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).drop("_side", "_payload")
    if injected_tiebreak:
        # the all-null sort helper must not leak into the output contract
        out = out.drop(tiebreak)
    for c in payload_cols:
        out = out.withColumn(f"{c}_asof", F.col("_asof")[c])
    return out.drop("_asof")


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_minutes``.

    Returns one row per (user, session) with exact-integer stats.  One
    shuffle on ``user_col``; the running sum is evaluated incrementally.
    """
    gap_us = gap_minutes * US_PER_MIN
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(us)
    prev = F.lag(us).over(w)
    new_session = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    seq = F.sum(new_session).over(
        Window.partitionBy(user_col)
        .orderBy(us)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = events.withColumn("_us", us).withColumn("session_seq", seq.cast("int"))
    return tagged.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("_us").cast("long").alias("start_us"),
        F.max("_us").cast("long").alias("end_us"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
    )


def hypertable_rollup(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    persist_levels: bool = True,
) -> DataFrame:
    """Hypertable-style continuous aggregate cascade: raw -> 1-minute ->
    1-hour -> 1-day buckets, where each coarser level aggregates the
    FINER level's partials rather than rescanning raw rows (count and
    integer-cent sums are decomposable, so the cascade is lossless — the
    oracle proves it by computing every level directly from raw).

    At 100 TB this is the materialized-rollup maintenance pattern: the
    raw scan happens once per refresh; day-level queries touch 1/1440th
    of the minute data. Returns all three levels unioned with a
    ``granularity`` tag.

    The persisted intermediate levels are exposed on the result as
    ``_persisted_levels``; call :func:`release_rollup_levels` on the
    result once it has been materialized (collected / written) to free
    the cached partitions — repeated rollup builds would otherwise
    accumulate cache entries until LRU eviction.
    """
    us = F.unix_micros(F.col(ts_col))
    minute_us = 60 * US_PER_MIN

    def level_agg(df, bucket_expr, n_col, cents_col):
        return df.groupBy(
            bucket_expr.alias("bucket_us"), F.col(group_col)
        ).agg(
            F.sum(n_col).cast("long").alias("n_events"),
            F.sum(cents_col).cast("long").alias("value_cents"),
        )

    base = events.select(
        (F.floor(us / minute_us) * minute_us).cast("long").alias("m_bucket"),
        group_col,
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    minute = level_agg(base, F.col("m_bucket"), F.lit(1), F.col("cents"))
    if persist_levels:
        # Without this, each union branch re-derives its full lineage and
        # the raw table is scanned once per level; persisting the finer
        # levels makes the cascade genuinely incremental (raw is read
        # exactly once — in production these levels are written tables).
        minute = minute.persist()
    hour = level_agg(
        minute,
        (F.floor(F.col("bucket_us") / (60 * minute_us)) * (60 * minute_us)).cast("long"),
        F.col("n_events"),
        F.col("value_cents"),
    )
    if persist_levels:
        hour = hour.persist()
    day = level_agg(
        hour,
        (F.floor(F.col("bucket_us") / (1440 * minute_us)) * (1440 * minute_us)).cast("long"),
        F.col("n_events"),
        F.col("value_cents"),
    )
    out = (
        minute.withColumn("granularity", F.lit("minute"))
        .unionByName(hour.withColumn("granularity", F.lit("hour")))
        .unionByName(day.withColumn("granularity", F.lit("day")))
        .select("granularity", "bucket_us", group_col, "n_events", "value_cents")
    )
    out._persisted_levels = [minute, hour] if persist_levels else []
    return out


def release_rollup_levels(rollup: DataFrame) -> None:
    """Unpersist the cached intermediate levels of a
    :func:`hypertable_rollup` result (no-op for uncached results)."""
    for level in getattr(rollup, "_persisted_levels", []):
        level.unpersist()


def scd2_from_events(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from an event log: one
    validity interval per (key, attribute-run), consecutive duplicates
    collapsed, the current row open-ended (NULL valid_to).

    Two windows over ONE partitioning on the key (change detection via
    lag, interval close via lead on the change rows) — the standard
    scalable SCD2 derivation; the as-of join (``asof_join``) is its
    point-in-time query twin.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us)
    changed = (
        events.withColumn("_us", us)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col("_us"))
    return changed.select(
        F.col(key_col).cast("long").alias(key_col),
        F.col(attr_col),
        F.col("_us").cast("long").alias("valid_from_us"),
        F.lead("_us").over(w2).cast("long").alias("valid_to_us"),
    )


def moving_window_stats(
    events: DataFrame,
    window_minutes: int = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-event trailing-window stats over a TIME range frame (all events
    of the same user within the preceding ``window_minutes``, inclusive).
    """
    span_us = window_minutes * US_PER_MIN
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col("_us"))
        .rangeBetween(-span_us, 0)
    )
    return (
        events.withColumn("_us", us)
        .select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col(user_col),
            F.col("_us").cast("long").alias("ts_us"),
            F.count(F.lit(1)).over(w).cast("long").alias("n_trailing"),
            F.sum(F.round(F.col("value") * 100).cast("long")).over(w).cast("long").alias(
                "cents_trailing"
            ),
        )
    )


def cusum_shift(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """CUSUM level-shift detector per series: for each event type, the
    peak of |S_i| where S_i = n·cum_i − i·total is the n-scaled CUSUM
    deviation of the value stream from its own mean — the classic
    change-point statistic (Page). A peak near the middle with large
    magnitude means the series' mean SHIFTED at that point (the batch
    twin of the streaming PSI drift monitor, localized in time instead
    of binned). Returns where (peak_k of n_events) and how big
    (peak_dev, the mean per-event deviation at the peak, currency
    units).

    Determinism: values go through the cents trick (round(value·100) →
    long), so cum/total/S_i are EXACT INTEGERS — the argmax peak and
    its first-occurrence index need no float discipline at all;
    only the final normalized magnitude divides (rounded 6).

    Scale shape: one shuffle on the series key, one per-partition
    ordered pass (running sum + row_number share the same window
    sort), then a grouped argmax via struct max. S_i = n·cum_i −
    i·total keeps within int64 for n·Σ|cents| < 2^63 (≈9e16 cent-rows
    per series); beyond that, window the series by day first
    (`hypertable_rollup`) and CUSUM the daily means.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        cents.alias("cents"),
    )
    w_ord = (
        Window.partitionBy("t")
        .orderBy(F.asc("_ts"), F.asc("_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("t")
    scored = base.select(
        "t",
        F.row_number()
        .over(Window.partitionBy("t").orderBy(F.asc("_ts"), F.asc("_id")))
        .cast("long")
        .alias("i"),
        F.sum("cents").over(w_ord).cast("long").alias("cum"),
        F.sum("cents").over(w_all).cast("long").alias("total"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    stat = F.abs(F.col("n") * F.col("cum") - F.col("i") * F.col("total"))
    peaked = scored.select(
        "t",
        "n",
        F.struct(stat.alias("s"), (-F.col("i")).alias("ni")).alias("p"),
    )
    g = peaked.groupBy("t").agg(
        F.max("n").cast("long").alias("n_events"), F.max("p").alias("peak")
    )
    nd = F.col("n_events").cast("double")
    return g.select(
        F.col("t").alias("event_type"),
        "n_events",
        (-F.col("peak.ni")).cast("long").alias("peak_k"),
        F.col("peak.s").cast("long").alias("peak_cusum"),
        F.round(F.col("peak.s").cast("double") / (nd * nd * F.lit(100.0)), 6).alias(
            "peak_dev"
        ),
    )


def ks_drift(
    df: DataFrame,
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov test per series: the value
    distribution of even-``id_col`` rows against odd ones (an A/A split
    — the null calibration for the drift stack; swap the side
    predicate for a real before/after cut). KS = max |F_even − F_odd|
    over observed values; `cusum_shift` localizes a MEAN shift in time,
    this detects any DISTRIBUTIONAL difference, mean-shifted or not.

    Exactness: the statistic is maximized in scaled integer form —
    |n_odd·cum_even − n_even·cum_odd| with cents counts — so the
    argmax, its location, and the tie-break (smallest value at the
    peak) need no float discipline; only the final KS value divides
    (rounded 6).

    Scale shape: one (series, value) aggregation with map-side
    combine (the shuffle carries distinct values per series, not
    rows), then one window sort per series over those distinct values
    and a grouped struct-argmax. Same int64 envelope as `cusum_shift`.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(type_col).alias("t"),
        cents.alias("cents"),
        (F.col(id_col) % 2 == 0).alias("even"),
    )
    per_val = base.groupBy("t", "cents").agg(
        F.sum(F.when(F.col("even"), 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(~F.col("even"), 1).otherwise(0)).cast("long").alias("c2"),
    )
    w_ord = (
        Window.partitionBy("t")
        .orderBy(F.asc("cents"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("t")
    scored = per_val.select(
        "t",
        "cents",
        F.sum("c1").over(w_ord).cast("long").alias("cum1"),
        F.sum("c2").over(w_ord).cast("long").alias("cum2"),
        F.sum("c1").over(w_all).cast("long").alias("n1"),
        F.sum("c2").over(w_all).cast("long").alias("n2"),
    )
    stat = F.abs(F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2"))
    peaked = scored.select(
        "t",
        "n1",
        "n2",
        F.struct(stat.alias("s"), (-F.col("cents")).alias("nc")).alias("p"),
    )
    g = peaked.groupBy("t").agg(
        F.max("n1").cast("long").alias("n_even"),
        F.max("n2").cast("long").alias("n_odd"),
        F.max("p").alias("peak"),
    )
    ks = F.col("peak.s").cast("double") / (
        F.col("n_even").cast("double") * F.col("n_odd").cast("double")
    )
    return g.select(
        F.col("t").alias("event_type"),
        "n_even",
        "n_odd",
        (-F.col("peak.nc")).cast("long").alias("peak_cents"),
        F.round(ks, 6).alias("ks"),
    )


def arrival_burstiness(
    df: DataFrame, type_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Fano factor of hourly arrival counts per series (variance/mean
    over observed hours): ≈1 is Poisson traffic, >1 is bursty (thundering
    herds — provision the ingest path for peaks, not means), <1 is
    metronomic (scheduled jobs pretending to be organic traffic — a
    data-quality smell in behavioral logs). Observed-hour scope: hours
    with zero events don't enter the window (document the difference
    from a calendar-span Fano, which would need a generated hour spine).

    Exactness: with H observed hours, S = Σc, Q = Σc², Fano =
    (H·Q − S²)/(H·S) — all int64 until the single final division
    (rounded 6).

    Scale shape: two map-side-combined aggregations ((series, hour)
    counts, then per series); the shuffle carries distinct hours per
    series, not events.
    """
    c = (
        df.select(
            F.col(type_col).alias("t"), F.date_trunc("hour", F.col(ts_col)).alias("h")
        )
        .groupBy("t", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    g = c.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("c").cast("long").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("_q"),
    )
    h = F.col("n_hours").cast("double")
    s = F.col("n_events").cast("double")
    fano = (F.col("n_hours") * F.col("_q") - F.col("n_events") * F.col("n_events")).cast(
        "double"
    ) / (h * s)
    return g.select(
        F.col("t").alias("event_type"),
        "n_hours",
        "n_events",
        F.round(s / h, 6).alias("mean_per_hour"),
        F.round(fano, 6).alias("fano"),
    )


def event_type_affinity(
    df: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Event-type co-occurrence lift across users (market-basket over
    the behavior log): for each unordered type pair, how many users did
    BOTH, and lift = P(both)/(P(a)·P(b)) — lift >1 means the behaviors
    travel together (funnel candidates for `event_funnel`), <1 means
    the segments are disjoint. Support and lift are exact-integer
    ratios (n_both·N/(n_a·n_b)) promoted once.

    Scale shape: one distinct (user, type) projection (map-side
    combined — the shuffle carries user×type, bounded by users times
    the small type vocabulary), checkpointed to feed the per-type
    counts and both sides of the user-keyed self-join; pair rows are
    |types|² per user at worst, grouped immediately.
    """
    ut = (
        df.select(F.col(user_col).alias("u"), F.col(type_col).alias("ty"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    per_type = (
        ut.groupBy("ty").agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    n_users = ut.select("u").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("nu")
    ).withColumn("_one", F.lit(1))
    a, b = ut.alias("a"), ut.alias("b")
    both = (
        a.join(b, (F.col("a.u") == F.col("b.u")) & (F.col("a.ty") < F.col("b.ty")))
        .groupBy(F.col("a.ty").alias("type_a"), F.col("b.ty").alias("type_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    out = (
        both.join(
            F.broadcast(per_type.select(F.col("ty").alias("type_a"), F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(per_type.select(F.col("ty").alias("type_b"), F.col("n").alias("n_b"))),
            "type_b",
        )
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(n_users), "_one")
    )
    nu = F.col("nu").cast("double")
    return out.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "n_both",
        F.round(F.col("n_both").cast("double") / nu, 9).alias("support"),
        F.round(
            F.col("n_both").cast("double") * nu
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            6,
        ).alias("lift"),
    )


def event_debounce(
    df: DataFrame,
    gap_us: int = 5_000_000,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Debounce audit: per event type, how many events arrive within
    ``gap_us`` microseconds of the SAME user's previous event of the
    same type — double-fires from retries, duplicate webhooks, or
    UI double-clicks that inflate behavioral counts (the batch
    diagnostic twin of the streaming dedup gate's time-bounded state).
    Emits the debounce rate per type; feed the flagged share into the
    ingest dedup window choice.

    Exactness: timestamps compare as epoch-microsecond integers
    (unix_micros / epoch_us), so the gap predicate is pure int64 — no
    timestamp arithmetic semantics cross the oracle boundary.

    One shuffle on (user, type); lag + flag share the window sort;
    then a map-side-combined per-type aggregate.
    """
    w = Window.partitionBy(user_col, type_col).orderBy(
        F.asc(ts_col), F.asc(id_col)
    )
    us = F.unix_micros(F.col(ts_col))
    flagged = df.select(
        F.col(type_col).alias("t"),
        (us - F.lag(us).over(w) < gap_us).alias("dup"),
    )
    g = flagged.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("dup"), 1).otherwise(0)).cast("long").alias("n_debounced"),
    )
    return g.select(
        F.col("t").alias("event_type"),
        "n_events",
        "n_debounced",
        F.round(
            F.col("n_debounced").cast("double") / F.col("n_events").cast("double"), 9
        ).alias("debounce_rate"),
    )


def conversion_lag(
    df: DataFrame,
    from_type: str = "signup",
    to_type: str = "purchase",
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Conversion-lag distribution: for each user whose first
    ``from_type`` event is at t0, the time to their first ``to_type``
    event at or after t0 — the funnel's missing time axis
    (`event_funnel` counts who converts, this says how long it takes;
    the p90 lag is what sets attribution-window and as-of-join
    tolerance choices). Emits the conversion rate and interpolated
    lag percentiles in one row.

    Determinism: lags are exact epoch-microsecond int64 differences;
    percentiles use the exact interpolated `percentile`/`quantile_cont`
    pair (the `value_percentiles` discipline), divided once to seconds
    and rounded 6.

    Scale shape: two filtered user-keyed aggregations and one
    user-keyed equi-join (the candidate frame is lazily checkpointed —
    it feeds the join and the candidate count); the final summary is
    one row.
    """
    us = F.unix_micros(F.col(ts_col))
    cand = (
        df.where(F.col(type_col) == from_type)
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(us).alias("t0"))
        .localCheckpoint(eager=False)
    )
    hits = df.where(F.col(type_col) == to_type).select(
        F.col(user_col).alias("u"), us.alias("tp")
    )
    conv = (
        cand.join(hits, "u")
        .where(F.col("tp") >= F.col("t0"))
        .groupBy("u", "t0")
        .agg(F.min("tp").alias("tp"))
        .select((F.col("tp") - F.col("t0")).alias("lag_us"))
    )
    n = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates")).withColumn(
        "_one", F.lit(1)
    )
    sec = lambda c: F.round(c / F.lit(1000000.0), 6)  # noqa: E731
    s = conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        sec(F.expr("percentile(lag_us, 0.5)")).alias("p50_lag_s"),
        sec(F.expr("percentile(lag_us, 0.9)")).alias("p90_lag_s"),
        sec(F.max("lag_us").cast("double")).alias("max_lag_s"),
    ).withColumn("_one", F.lit(1))
    return (
        n.join(F.broadcast(s), "_one")
        .select(
            "n_candidates",
            "n_converted",
            F.round(
                F.col("n_converted").cast("double")
                / F.col("n_candidates").cast("double"),
                9,
            ).alias("conversion_rate"),
            "p50_lag_s",
            "p90_lag_s",
            "max_lag_s",
        )
    )


def user_behavior_entropy(
    df: DataFrame, type_col: str = "event_type", user_col: str = "user_id"
) -> DataFrame:
    """Behavioral-diversity summary: each user's Shannon entropy over
    their own event-type distribution, reduced to the corpus card —
    average entropy and the share of single-behavior users. Bots and
    scripted accounts sit at H=0 (one behavior) or at ln(k) (uniform
    cycling); organic users sit between — the behavior-log sibling of
    `source_entropy`'s token-level diversity.

    Per-user H = ln(n) − Σc·ln(c)/n is exact-integer inputs through
    ln (identical IEEE terms per user in any engine); the cross-user
    mean is the single grouped float sum, ROUNDED at 6 (the NB/DSIR
    recipe).

    Two map-side-combined aggregations ((user, type) counts → per
    user) and a one-row reduce; the shuffle carries the contingency
    keys, not events.
    """
    cell = df.groupBy(F.col(user_col).alias("u"), F.col(type_col).alias("ty")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_user = cell.groupBy("u").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "s_clnc"
        ),
    )
    h = F.log(F.col("n").cast("double")) - F.col("s_clnc") / F.col("n").cast("double")
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).cast("long").alias("n_single_type"),
        F.round(
            F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("single_share"),
        F.round(F.sum(h) / F.count(F.lit(1)).cast("double"), 6).alias("avg_entropy"),
    )


def km_survival(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 1,
    probe_days: tuple = (7, 14, 21, 28),
) -> DataFrame:
    """Kaplan-Meier product-limit survival of user lifetimes with
    right-censoring — `retention_cohorts` counts who is still active per
    calendar week, this estimates the survival FUNCTION itself while
    correctly crediting users the corpus horizon cut off mid-life
    (censored users leave the risk set without counting as churn; a
    naive churn rate over a finite log always overstates death).

    A user "dies" at lifetime t1-t0 if their last event predates the
    corpus horizon by more than ``censor_days`` (they had room to act
    and didn't); otherwise they are censored at horizon-t0. S(t) =
    prod_{t_i<=t} (1 - d_i/n_i) over distinct death times, emitted at
    ``probe_days`` probes.

    Determinism: lifetimes are exact epoch-microsecond int64; the risk
    set n_i is an integer running sum over distinct durations; each
    factor is ln(n_i-d_i)-ln(n_i) with both logs taken of exact
    integers (identical IEEE terms in any engine), summed per probe and
    exp'd once, ROUNDED 6 (the KL/Good-Turing discipline). The
    degenerate n_i=d_i step (risk set dies out) pins S=0 exactly
    rather than passing 0 into ln.

    Scale shape: one user-keyed aggregation; everything after operates
    on distinct lifetime durations (rows <= users, typically tiny) —
    the global DESC running sum and the probe join are summary-side,
    not data-side. The horizon is a broadcast one-row frame, never a
    driver collect.
    """
    us = F.unix_micros(F.col(ts_col))
    per_user = df.groupBy(F.col(user_col).alias("u")).agg(
        F.min(us).alias("t0"), F.max(us).alias("t1")
    )
    horizon = df.agg(F.max(us).alias("tmax")).withColumn("_one", F.lit(1))
    w_us = censor_days * 86_400_000_000
    life = (
        per_user.withColumn("_one", F.lit(1))
        .join(F.broadcast(horizon), "_one")
        .select(
            F.when(F.col("t1") <= F.col("tmax") - F.lit(w_us), F.col("t1") - F.col("t0"))
            .otherwise(F.col("tmax") - F.col("t0"))
            .alias("d"),
            F.when(F.col("t1") <= F.col("tmax") - F.lit(w_us), F.lit(1))
            .otherwise(F.lit(0))
            .alias("e"),
        )
    )
    # distinct-duration frame feeds both the risk running sum and the
    # death counts: checkpoint once (union-recompute discipline)
    durs = (
        life.groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("e").cast("long").alias("dd"),
        )
        .localCheckpoint(eager=False)
    )
    # n_at_risk(d) = count of lifetimes >= d: DESC running sum over the
    # distinct durations (summary-sized single partition by construction)
    w = Window.orderBy(F.col("d").desc()).rowsBetween(Window.unboundedPreceding, 0)
    risk = durs.select("d", "dd", F.sum("c").over(w).cast("long").alias("n_risk")).where(
        F.col("dd") > 0
    )
    fac = risk.select(
        "d",
        "dd",
        "n_risk",
        (
            F.log((F.col("n_risk") - F.col("dd")).cast("double"))
            - F.log(F.col("n_risk").cast("double"))
        ).alias("f"),
    )
    probes = (
        df.sparkSession.range(1)
        .select(F.explode(F.array(*[F.lit(int(p)) for p in probe_days])).alias("probe_days"))
    )
    agg = (
        probes.join(
            F.broadcast(fac),
            fac["d"] <= probes["probe_days"].cast("long") * F.lit(86_400_000_000),
            "left",
        )
        .groupBy("probe_days")
        .agg(
            F.sum("dd").alias("nd"),
            F.min(F.col("n_risk") - F.col("dd")).alias("mn"),
            F.sum("f").alias("sf"),
        )
    )
    return agg.select(
        F.col("probe_days").cast("int").alias("probe_days"),
        F.coalesce(F.col("nd"), F.lit(0)).cast("long").alias("n_deaths"),
        F.when(F.col("nd").isNull(), F.lit(1.0))
        .when(F.col("mn") == 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("sf")), 6))
        .alias("survival"),
    )


def hourly_acf(
    df: DataFrame, ts_col: str = "ts", lags: tuple = (1, 2, 3, 24)
) -> DataFrame:
    """Lag-k autocorrelation of the hourly arrival series — the
    seasonality detector `arrival_burstiness` can't see: a strong
    lag-24 peak means daily periodicity (size streaming watermarks and
    autoscaling to the cycle, not the mean); lag-1..3 measure
    short-range burst persistence. Pairs are formed only where both
    hours were observed (no zero-filled spine; document the scope).

    Determinism: hour index = epoch_micros/3.6e9 by exact integer
    division; per lag the Pearson moments (n, Sx, Sy, Sxy, Sxx, Syy)
    are all int64, promoted to double for the single final
    (n*Sxy-Sx*Sy)/(sqrt(..)*sqrt(..)) — IEEE sqrt of exact integers is
    correctly rounded, so the result is engine-portable, ROUNDED 6.

    Scale shape: one grouped count per hour (map-side combined), then
    an equi-join of the tiny hour-count frame to itself shifted by the
    exploded lag — everything past the first aggregate is
    hours x lags sized. The hour frame is checkpointed once (it feeds
    both join sides).
    """
    hrs = (
        df.select(
            (F.unix_micros(F.date_trunc("hour", F.col(ts_col))) / F.lit(3_600_000_000))
            .cast("long")
            .alias("hi")
        )
        .groupBy("hi")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    lagf = (
        df.sparkSession.range(1)
        .select(F.explode(F.array(*[F.lit(int(k)) for k in lags])).alias("lag_hours"))
    )
    a = hrs.select(F.col("hi").alias("hia"), F.col("c").alias("x")).withColumn(
        "_one", F.lit(1)
    )
    b = hrs.select(F.col("hi").alias("hib"), F.col("c").alias("y"))
    pairs = a.join(F.broadcast(lagf.withColumn("_one", F.lit(1))), "_one").join(
        F.broadcast(b),
        F.col("hib") == F.col("hia") + F.col("lag_hours").cast("long"),
    )
    g = pairs.groupBy("lag_hours").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n = F.col("n_pairs")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    deny = F.sqrt((n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return g.select(
        F.col("lag_hours").cast("int").alias("lag_hours"),
        "n_pairs",
        F.round(num / (denx * deny), 6).alias("acf"),
    )


def hourly_xcorr(
    df: DataFrame,
    type_a: str = "click",
    type_b: str = "purchase",
    ts_col: str = "ts",
    type_col: str = "event_type",
    lags: tuple = (-3, -2, -1, 0, 1, 2, 3),
) -> DataFrame:
    """Signed-lag cross-correlation between the hourly arrival series of
    two event types — the lead/lag detector `hourly_acf` can't express:
    a peak at lag +1 means clicks LEAD purchases by an hour (size the
    attribution join window and the stream-stream join watermark to the
    peak lag, not to a guess); a flat curve says the funnel has no
    hourly-scale memory. Pairs are formed only where both series
    observed the hour (no zero-filled spine; same scope contract as
    `hourly_acf`).

    Determinism: hour index = epoch_micros/3.6e9 by exact integer
    division; per lag the Pearson moments (n, Sx, Sy, Sxy, Sxx, Syy)
    are all int64 over exact counts, promoted to double only for the
    single final (n*Sxy-Sx*Sy)/(sqrt*sqrt) — engine-portable, ROUNDED 6.

    Scale shape: ONE grouped count per (type, hour) over the filtered
    pair of types (map-side combined), then an equi-join of the two
    tiny hour-count frames shifted by the exploded lag — everything
    past the first aggregate is hours x lags sized. The per-type hour
    frame is checkpointed once (it feeds both sides of the lag join).
    """
    hrs = (
        df.where(F.col(type_col).isin([type_a, type_b]))
        .select(
            F.col(type_col).alias("t"),
            (F.unix_micros(F.date_trunc("hour", F.col(ts_col))) / F.lit(3_600_000_000))
            .cast("long")
            .alias("hi"),
        )
        .groupBy("t", "hi")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    lagf = (
        df.sparkSession.range(1)
        .select(F.explode(F.array(*[F.lit(int(k)) for k in lags])).alias("lag_hours"))
        .withColumn("_one", F.lit(1))
    )
    a = (
        hrs.where(F.col("t") == type_a)
        .select(F.col("hi").alias("hia"), F.col("c").alias("x"))
        .withColumn("_one", F.lit(1))
    )
    b = hrs.where(F.col("t") == type_b).select(
        F.col("hi").alias("hib"), F.col("c").alias("y")
    )
    pairs = a.join(F.broadcast(lagf), "_one").join(
        F.broadcast(b),
        F.col("hib") == F.col("hia") + F.col("lag_hours").cast("long"),
    )
    g = pairs.groupBy("lag_hours").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n = F.col("n_pairs")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    deny = F.sqrt((n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return g.select(
        F.col("lag_hours").cast("int").alias("lag_hours"),
        "n_pairs",
        F.round(num / (denx * deny), 6).alias("xcorr"),
    )


def ewma_daily_value(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Integer EWMA (alpha = 1/2) of daily revenue: the smoothed
    baseline a drift monitor compares today against — the sequential
    recurrence ewma_t = (ewma_{t-1} + x_t) >> 1 that no window
    expression can unroll (each step depends on the previous OUTPUT,
    not the previous input).

    Determinism: the recurrence runs on exact integer cents with an
    arithmetic right shift as the halving (both engines' ``>>`` agrees
    on nonnegative int64), so every step is exact — no float state
    drifts across 365 steps. The DuckDB oracle replays the identical
    recurrence as a recursive CTE over the day index.

    Scale shape: ONE map-side-combined grouped sum to the day-grain
    frame (calendar-bounded, not row-bounded), then a single
    expression fold over the collected day series — the fold runs on
    one executor over at most a few thousand struct elements (the
    `bpe_merge_table` fold discipline: sequential state stays in the
    plan, never in a driver loop).

    Returns one row per day: (di, cents, ewma_cents, ewma).
    """
    daily = (
        df.select(
            (
                F.unix_micros(F.date_trunc("day", F.col(ts_col)))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("di"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("di")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("di", "cents"))).alias("s")
    )
    zero = F.expr(
        "CAST(array() AS array<struct<di:bigint,cents:bigint,ewma:bigint>>)"
    )

    def step(acc, x):
        prev = F.element_at(acc, -1)["ewma"]
        ew = F.when(F.size(acc) == 0, x["cents"]).otherwise(
            F.shiftright(prev + x["cents"], 1)
        )
        return F.concat(
            acc,
            F.array(
                F.struct(
                    x["di"].alias("di"),
                    x["cents"].alias("cents"),
                    ew.cast("long").alias("ewma"),
                )
            ),
        )

    folded = series.select(F.explode(F.aggregate("s", zero, step)).alias("r"))
    return folded.select(
        F.col("r.di").alias("di"),
        F.col("r.cents").alias("cents"),
        F.col("r.ewma").alias("ewma_cents"),
        F.round(F.col("r.ewma").cast("double") / F.lit(100.0), 6).alias("ewma"),
    )


def revenue_drawdown(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Daily-revenue drawdown series: each day's gap below the running
    peak, plus the running peak itself — the "how bad is the slump"
    view a revenue health dashboard reads next to `cusum_shift` (which
    says WHERE the level moved; this says how deep below the best day
    the stream currently sits).

    Determinism: all exact integer cents — the running peak is a
    cumulative max window, the drawdown a subtraction; nothing
    promotes to float.

    Scale shape: one map-side-combined grouped sum to the day grain;
    the cumulative-max window runs over the calendar-bounded daily
    frame. No fold needed — unlike `ewma_daily_value`, the running
    peak depends only on INPUTS, so a window expression unrolls it.
    """
    daily = (
        df.select(
            (
                F.unix_micros(F.date_trunc("day", F.col(ts_col)))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("di"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("di")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    wpk = Window.orderBy(F.col("di").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    peaked = daily.select(
        "di", "cents", F.max("cents").over(wpk).cast("long").alias("peak_cents")
    )
    return peaked.select(
        "di",
        "cents",
        "peak_cents",
        (F.col("peak_cents") - F.col("cents")).cast("long").alias("drawdown_cents"),
    )


def runs_test(df: DataFrame, date_col: str = "ts") -> DataFrame:
    """Wald-Wolfowitz runs test on the daily arrival series: are
    above-median and below-median days randomly interleaved, or do they
    clump (momentum / regime switching) or alternate (overcorrection)?
    The distribution-free randomness check that `cusum_shift` (one level
    shift) and `hourly_acf` (linear memory) don't cover — too FEW runs
    means persistent regimes, too MANY means oscillation.

    Determinism: daily counts are exact; the median comparison uses the
    DOUBLED median m2 = q_lo + q_hi (the two middle order statistics of
    the count distribution, row_number-ranked with day tie-break), so
    2c vs m2 is pure int64 and days exactly AT the median are dropped
    (the standard treatment, documented); the run count and the
    n_above/n_below totals are exact integers; E[R], Var[R], and z
    promote once to double, ROUNDED 6.

    Scale shape: one grouped count per day (map-side combined), then
    every window (median rank, lag for run boundaries) runs over the
    DAY-cardinality frame — bounded by the calendar, not by rows. The
    daily frame is checkpointed once (it feeds the median and the sign
    pass).
    """
    daily = (
        df.select(
            (F.unix_micros(F.date_trunc("day", F.col(date_col))) / F.lit(86_400_000_000))
            .cast("long")
            .alias("di")
        )
        .groupBy("di")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    ranked = daily.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").asc(), F.col("di").asc()))
        .cast("long")
        .alias("rn"),
    )
    nf = daily.agg(F.count(F.lit(1)).cast("long").alias("nd")).select(
        "nd",
        F.floor((F.col("nd") + 1) / 2).cast("long").alias("r1"),
        F.floor((F.col("nd") + 2) / 2).cast("long").alias("r2"),
    ).withColumn("_one", F.lit(1))
    m2f = (
        ranked.withColumn("_one", F.lit(1))
        .join(F.broadcast(nf), "_one")
        .agg(
            F.sum(
                F.col("c")
                * (
                    F.when(F.col("rn") == F.col("r1"), 1).otherwise(0)
                    + F.when(F.col("rn") == F.col("r2"), 1).otherwise(0)
                )
            )
            .cast("long")
            .alias("m2")
        )
        .withColumn("_one", F.lit(1))
    )
    s = (
        F.when(F.lit(2) * F.col("c") > F.col("m2"), F.lit(1))
        .when(F.lit(2) * F.col("c") < F.col("m2"), F.lit(-1))
        .otherwise(F.lit(None).cast("int"))
    )
    signs = (
        daily.withColumn("_one", F.lit(1))
        .join(F.broadcast(m2f), "_one")
        .select("di", s.alias("s"))
        .where(F.col("s").isNotNull())
    )
    lagw = Window.orderBy(F.col("di").asc())
    flagged = signs.select(
        "s",
        F.when(F.lag("s").over(lagw).isNull(), F.lit(1))
        .when(F.lag("s").over(lagw) != F.col("s"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_run"),
    )
    g = flagged.agg(
        F.coalesce(F.sum(F.when(F.col("s") == 1, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_above"),
        F.coalesce(F.sum(F.when(F.col("s") == -1, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_below"),
        F.coalesce(F.sum("new_run"), F.lit(0)).cast("long").alias("runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    nn = n1 + n2
    er = F.lit(1.0) + F.lit(2.0) * n1 * n2 / nn
    vr = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / (nn * nn * (nn - F.lit(1.0)))
    )
    # one-sided series (n1 or n2 = 0) has Var[R] = 0: the test is
    # undefined — emit NULL rather than divide by zero (ANSI mode)
    ok = (F.col("n_above") > 0) & (F.col("n_below") > 0)
    return g.select(
        "n_above",
        "n_below",
        "runs",
        F.when(ok, F.round(er, 6)).alias("expected_runs"),
        F.when(ok, F.round((F.col("runs").cast("double") - er) / F.sqrt(vr), 6)).alias("z"),
    )


def markov_entropy_rate(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Entropy rate of the first-order behavioral Markov chain: the
    conditional entropy H(next | current) over per-user event-type
    transitions, next to the marginal H(next) and the memory
    coefficient 1 - H(next|cur)/H(next). The scalar summary of
    `event_transitions`' count matrix: memory ~0 means the next action
    is independent of the current one (sessionization and next-event
    prefetch buy nothing), memory near 1 means the chain is nearly
    deterministic (prefetch the argmax transition).

    Determinism: transitions order by (ts, event_id) — a total order,
    unlike a bare timestamp sort under ties; every ln argument is an
    exact integer count (the `source_kl_matrix` discipline):
    H(next|cur) = ln T - (1/T) sum t_cn (ln t_cn - ln t_c + ln t_c -
    ... ) factored as (sum over pairs of t_cn*(ln t_c. - ln t_cn))/T
    where t_c. is the current-state marginal; H(next) likewise from
    next-state marginals. Grouped double sums ROUNDED 6.

    Scale shape: one user-partitioned window (the sessionize shuffle),
    one grouped count on the (cur, next) pair — a |types|^2 frame that
    every later step runs on; marginals join back broadcast-small.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    tr = (
        df.select(
            F.col(user_col),
            F.col(type_col).alias("cur"),
            F.col(ts_col),
            F.col(id_col),
        )
        .withColumn("nxt", F.lead("cur").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .localCheckpoint(eager=False)
    )
    curm = tr.groupBy("cur").agg(F.sum("t").cast("long").alias("tc"))
    nxtm = tr.groupBy("nxt").agg(F.sum("t").cast("long").alias("tn"))
    j = tr.join(F.broadcast(curm), "cur")
    tot = tr.agg(F.sum("t").cast("long").alias("tt")).withColumn("_one", F.lit(1))
    cond = j.agg(
        F.sum(
            F.col("t").cast("double")
            * (F.log(F.col("tc").cast("double")) - F.log(F.col("t").cast("double")))
        ).alias("s_cond")
    ).withColumn("_one", F.lit(1))
    marg = nxtm.agg(
        F.sum(
            F.col("tn").cast("double") * F.log(F.col("tn").cast("double"))
        ).alias("s_marg")
    ).withColumn("_one", F.lit(1))
    out = cond.join(F.broadcast(marg), "_one").join(F.broadcast(tot), "_one")
    tt = F.col("tt").cast("double")
    h_cond = F.col("s_cond") / tt
    h_next = F.log(tt) - F.col("s_marg") / tt
    return out.select(
        F.col("tt").alias("n_transitions"),
        F.round(h_cond, 6).alias("h_cond"),
        F.round(h_next, 6).alias("h_next"),
        # single-type chains have H(next) = 0: memory is undefined, NULL
        F.when(h_next > 0, F.round(F.lit(1.0) - h_cond / h_next, 6)).alias(
            "memory_coef"
        ),
    )


def interpurchase_gap(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Per-market-segment distribution of customer inter-order gaps
    (days between consecutive orders): the re-engagement clock that
    sizes churn windows and reorder-nudge timing per segment — the
    behavioral complement of `retention_cohorts` (which buckets by
    calendar cohort; this measures the customer's OWN cadence).

    Determinism: gaps are exact integer day differences from a
    (customer, epoch-day) lag window ordered by (day, orderkey) — a
    total order; the median uses the DOUBLED m2 = q_lo + q_hi trick and
    p90 the nearest-rank ceil(9n/10) = (9n+9)//10, both located on the
    DISTINCT-gap-value frame by cumulative-count range checks (the
    `mann_whitney` discipline — ranks never materialize per row), so
    every output but the final median halving is exact int64.

    Scale shape: one orderkey->custkey window (customer-partitioned —
    the natural key, no skew), one grouped count per (segment, gap),
    then every window runs over the segment x distinct-gap frame
    (calendar-bounded). The value frame is checkpointed once (it feeds
    the rank location and the totals).
    """
    day = (F.unix_micros(F.col("o_orderdate")) / F.lit(86_400_000_000)).cast("long")
    w = Window.partitionBy("o_custkey").orderBy(F.col("d").asc(), F.col("o_orderkey").asc())
    gaps = (
        orders.select("o_custkey", "o_orderkey", day.alias("d"))
        .withColumn("gap", F.col("d") - F.lag("d").over(w))
        .where(F.col("gap").isNotNull())
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(F.col("c_mktsegment").alias("seg"), "gap")
    )
    vc = (
        gaps.groupBy("seg", "gap")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn(
            "cum",
            F.sum("c").over(
                Window.partitionBy("seg")
                .orderBy(F.col("gap").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .localCheckpoint(eager=False)
    )
    tot = vc.groupBy("seg").agg(F.max("cum").cast("long").alias("n")).select(
        "seg",
        "n",
        F.floor((F.col("n") + 1) / 2).cast("long").alias("r1"),
        F.floor((F.col("n") + 2) / 2).cast("long").alias("r2"),
        F.floor((F.lit(9) * F.col("n") + 9) / 10).cast("long").alias("r90"),
    )
    j = vc.join(F.broadcast(tot), "seg").select(
        "seg",
        "n",
        (F.col("cum") - F.col("c")).alias("b"),
        "cum",
        "gap",
        "r1",
        "r2",
        "r90",
    )
    hit = lambda r: F.when((F.col("b") < F.col(r)) & (F.col(r) <= F.col("cum")), F.col("gap")).otherwise(F.lit(0))  # noqa: E731
    g = j.groupBy("seg").agg(
        F.max("n").alias("n_gaps"),
        F.sum(hit("r1") + hit("r2")).cast("long").alias("m2"),
        F.sum(hit("r90")).cast("long").alias("p90_days"),
    )
    return g.select(
        F.col("seg").alias("c_mktsegment"),
        "n_gaps",
        F.round(F.col("m2").cast("double") / F.lit(2.0), 1).alias("median_days"),
        "p90_days",
    )


def session_depth_hist(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session depth histogram + bounce profile over the gap-based
    sessions `sessionize` produces: how many sessions are single-event
    bounces, short visits, or long engaged runs, with exact duration
    mass per bucket — the shape that calibrates session-gap choice
    (a fat '1' bucket at gap=30min means the gap is too short or the
    surface genuinely bounces) and sizes stateful-streaming timeout
    state per depth class.

    Determinism: bucket edges are integer comparisons on exact event
    counts; session durations are exact microsecond integers; the only
    doubles are the share and mean-duration divisions, ROUNDED 9 / 6.

    Scale shape: everything downstream of `sessionize`'s one user
    shuffle is a grouped aggregate on a 4-row bucket key; the totals
    frame joins back broadcast.
    """
    s = sessionize(events, gap_minutes=gap_minutes)
    bucket = (
        F.when(F.col("n_events") == 1, F.lit("1"))
        .when(F.col("n_events") <= 3, F.lit("2-3"))
        .when(F.col("n_events") <= 7, F.lit("4-7"))
        .otherwise(F.lit("8+"))
    )
    g = s.select(
        bucket.alias("depth_bucket"),
        (F.col("end_us") - F.col("start_us")).alias("dur_us"),
        "n_events",
    ).groupBy("depth_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("dur_us").cast("long").alias("sum_dur_us"),
    )
    tot = g.agg(F.sum("n_sessions").cast("long").alias("t")).withColumn(
        "_one", F.lit(1)
    )
    return (
        g.withColumn("_one", F.lit(1))
        .join(F.broadcast(tot), "_one")
        .select(
            "depth_bucket",
            "n_sessions",
            "n_events",
            "sum_dur_us",
            F.round(F.col("n_sessions").cast("double") / F.col("t").cast("double"), 9).alias(
                "share"
            ),
            F.round(
                F.col("sum_dur_us").cast("double")
                / (F.col("n_sessions").cast("double") * F.lit(60000000.0)),
                6,
            ).alias("mean_dur_min"),
        )
    )


def weekday_uniformity(df: DataFrame, date_col: str = "o_orderdate") -> DataFrame:
    """Chi-square uniformity of arrivals across the seven weekdays —
    the weekly-seasonality scalar that decides whether ingest
    autoscaling and compaction windows need a day-of-week schedule at
    all. Weekday is computed as (epoch_day + 4) % 7 (1970-01-01 was a
    Thursday; 0 = Sunday), a pure integer expression no engine's
    calendar/locale settings can bend.

    Determinism: with e = N/7, chi^2 = sum (o - e)^2/e collapses to
    (7*sum(o^2) - N^2)/N — numerator exact int64, ONE double division,
    ROUNDED 6; the min/max day shares are exact-count ratios ROUNDED 9.

    Scale shape: one grouped count on a 7-value key (map-side
    combined); everything after is a 7-row aggregate.
    """
    day = (F.unix_micros(F.col(date_col)) / F.lit(86_400_000_000)).cast("long")
    dow = ((day + F.lit(4)) % F.lit(7)).cast("int")
    g = df.select(dow.alias("dow")).groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    t = g.agg(
        F.sum("o").cast("long").alias("n"),
        F.sum(F.col("o") * F.col("o")).cast("long").alias("so2"),
        F.min("o").cast("long").alias("min_day"),
        F.max("o").cast("long").alias("max_day"),
    )
    num = (F.lit(7) * F.col("so2") - F.col("n") * F.col("n")).cast("long")
    return t.select(
        F.col("n").alias("n_rows"),
        F.round(num.cast("double") / F.col("n").cast("double"), 6).alias("chisq"),
        F.round(F.col("min_day").cast("double") / F.col("n").cast("double"), 9).alias(
            "min_day_share"
        ),
        F.round(F.col("max_day").cast("double") / F.col("n").cast("double"), 9).alias(
            "max_day_share"
        ),
    )


def yearly_value_quartiles(df: DataFrame, date_col: str = "o_orderdate") -> DataFrame:
    """Per-year quartiles of order value — the banded drift view that
    says whether this year's orders are bigger or just more numerous
    (revenue trends alone can't tell). The windowed-quantile pattern
    every freshness-partitioned table needs, with quartile values
    located on per-year DISTINCT-value frames (nearest-rank ceil(k*n/4)
    = (k*n+3)//4) so every output is exact integer cents.

    Scale shape: one grouped count per (year, cents) — map-side
    combined — then windows over the year x distinct-value frame only.
    """
    yr = F.year(F.col(date_col)).cast("int")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    vc = (
        df.select(yr.alias("y"), cents.alias("v"))
        .groupBy("y", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wcum = (
        Window.partitionBy("y")
        .orderBy(F.col("v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cu = vc.select(
        "y", "v", "c", F.sum("c").over(wcum).cast("long").alias("cum")
    ).localCheckpoint(eager=False)
    tot = cu.groupBy("y").agg(F.max("cum").cast("long").alias("n"))
    j = cu.join(F.broadcast(tot), "y")
    b = F.col("cum") - F.col("c")

    def at(k: int):
        r = F.floor((F.lit(k) * F.col("n") + 3) / 4).cast("long")
        return F.max(F.when((b < r) & (r <= F.col("cum")), F.col("v"))).cast("long")

    return (
        j.groupBy("y")
        .agg(
            F.max("n").alias("n_orders"),
            at(1).alias("q1_cents"),
            at(2).alias("q2_cents"),
            at(3).alias("q3_cents"),
        )
        .select(
            F.col("y").alias("order_year"),
            "n_orders",
            "q1_cents",
            "q2_cents",
            "q3_cents",
        )
    )


def hour_profile_fit(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Variance explained (R^2) by the day x hour-of-day seasonal
    decomposition of the arrival series: predicted count for cell
    (day d, hour h) = T_d * H_h / N (day volume times the global
    hour-of-day profile). The "is traffic just a daily rhythm" scalar
    that closes the loop `hourly_acf` opens: acf says lag-24 memory
    exists, this says how much of the cell-level variance the profile
    model actually removes — R^2 near 1 licenses profile-based
    autoscaling; low R^2 means bursts dominate (`arrival_burstiness`).

    Determinism: the grid is COMPLETED (observed days x all 24 hours —
    empty cells are real residuals); with C cells, SSres and SStot
    scale to Σ(N*o - T_d*H_h)^2 and Σ(C*o - N)^2 — exact DECIMAL(38)
    (HUGEINT in the oracle; the squares pass int64 once N*o grows),
    and R^2 = 1 - (C^2 * SSres_sc)/(N^2 * SStot_sc) is ONE double
    division of exact integers, ROUNDED 6; NULL when SStot is zero.
    Day and hour indexes are pure epoch integer arithmetic.

    Scale shape: one grouped count per (day, hour) cell (map-side
    combined); the grid completion is a days x 24 frame (calendar
    bounded) with the day/hour/total marginals joined back broadcast;
    one final aggregate over the grid.
    """
    us = F.unix_micros(F.col(ts_col))
    cells = (
        df.select(
            (us / F.lit(86_400_000_000)).cast("long").alias("di"),
            ((us / F.lit(3_600_000_000)).cast("long") % F.lit(24)).alias("hh"),
        )
        .groupBy("di", "hh")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    td = cells.groupBy("di").agg(F.sum("o").cast("long").alias("t_d"))
    hh = cells.groupBy("hh").agg(F.sum("o").cast("long").alias("h_h"))
    spark = df.sparkSession
    hours = spark.range(24).select(F.col("id").cast("long").alias("hh"))
    grid = (
        td.crossJoin(F.broadcast(hours))
        .join(cells, ["di", "hh"], "left")
        .join(F.broadcast(hh), "hh", "left")
        .select(
            "di",
            "hh",
            F.coalesce("o", F.lit(0)).cast("long").alias("o"),
            "t_d",
            F.coalesce("h_h", F.lit(0)).cast("long").alias("h_h"),
        )
    )
    tot = grid.agg(
        F.sum("o").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("cc"),
        F.countDistinct("di").cast("long").alias("n_days"),
    ).withColumn("_one", F.lit(1))
    j = grid.withColumn("_one", F.lit(1)).join(F.broadcast(tot), "_one")
    dres = (F.col("nn") * F.col("o") - F.col("t_d") * F.col("h_h")).cast(
        "decimal(38,0)"
    )
    dtot = (F.col("cc") * F.col("o") - F.col("nn")).cast("decimal(38,0)")
    g = j.groupBy("nn", "cc", "n_days").agg(
        F.sum(dres * dres).cast("decimal(38,0)").alias("ssres_sc"),
        F.sum(dtot * dtot).cast("decimal(38,0)").alias("sstot_sc"),
    )
    c2 = F.col("cc").cast("decimal(38,0)") * F.col("cc").cast("decimal(38,0)")
    n2 = F.col("nn").cast("decimal(38,0)") * F.col("nn").cast("decimal(38,0)")
    r2 = F.lit(1.0) - (c2 * F.col("ssres_sc")).cast("double") / (
        n2 * F.col("sstot_sc")
    ).cast("double")
    return g.select(
        F.col("nn").alias("n_events"),
        "n_days",
        F.col("cc").alias("n_cells"),
        F.when(F.col("sstot_sc") > 0, F.round(r2, 6)).alias("r2_seasonal"),
    )


def return_curve(df: DataFrame, max_lag_days: int = 7, ts_col: str = "ts") -> DataFrame:
    """Day-lag return probability: for each lag k, the share of active
    user-days with activity again exactly k days later — the
    retention curve at day granularity that `retention_cohorts`
    (calendar cohorts) can't resolve: a lag-1 plateau means a daily
    habit; a lag-7 bump means weekly cadence (schedule win-back pushes
    at the natural period, not arbitrarily).

    Determinism: active user-days are exact DISTINCT (user, epoch_day)
    pairs; the base for lag k is conditioned on d + k <= horizon (days
    that COULD return); matched and base counts are exact int64, the
    rate one double division ROUNDED 9.

    Scale shape: one distinct (user, day) projection (checkpointed —
    both join sides and the horizon derive from it), an equi-join on
    (user, day+k) per exploded lag (fan-out = per-user activity days x
    lags, never events x lags), a lag-keyed aggregate.
    """
    ud = (
        df.select(
            F.col("user_id"),
            (F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000))
            .cast("long")
            .alias("di"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    mx = ud.agg(F.max("di").cast("long").alias("dmax")).withColumn("_one", F.lit(1))
    lags = (
        df.sparkSession.range(1, max_lag_days + 1)
        .select(F.col("id").cast("long").alias("k"))
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(mx), "_one")
    )
    a = ud.select("user_id", F.col("di").alias("da")).withColumn("_one", F.lit(1))
    base = (
        a.join(F.broadcast(lags), "_one")
        .where(F.col("da") + F.col("k") <= F.col("dmax"))
        .localCheckpoint(eager=False)
    )
    b = ud.select(F.col("user_id"), F.col("di").alias("db"))
    matched = base.join(
        b,
        (base.user_id == b.user_id) & (F.col("db") == F.col("da") + F.col("k")),
        "left_semi",
    )
    bg = base.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_base"))
    mg = matched.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_returned"))
    return (
        bg.join(mg, "k", "left")
        .select(
            F.col("k").cast("int").alias("lag_days"),
            "n_base",
            F.coalesce("n_returned", F.lit(0)).cast("long").alias("n_returned"),
            F.round(
                F.coalesce("n_returned", F.lit(0)).cast("double")
                / F.col("n_base").cast("double"),
                9,
            ).alias("return_rate"),
        )
    )


def user_lifecycle_census(df: DataFrame, window_days: int = 7, ts_col: str = "ts") -> DataFrame:
    """Lifecycle-stage census of the user base at the corpus horizon:
    single-visit / new / active / dormant counts and shares — the
    population view that retention campaigns and per-stage sampling
    quotas start from, classified with pure epoch-microsecond integer
    comparisons against the horizon (no calendar, no floats until the
    share division, ROUNDED 9). Stage order is pinned: single-visit
    wins over new/active (one event says nothing about cadence).

    Scale shape: one grouped aggregate per user (map-side combined),
    the one-row horizon broadcast back, a 4-row stage count.
    """
    us = F.unix_micros(F.col(ts_col))
    per = df.select(F.col("user_id"), us.alias("u")).groupBy("user_id").agg(
        F.min("u").cast("long").alias("first_u"),
        F.max("u").cast("long").alias("last_u"),
        F.count(F.lit(1)).cast("long").alias("n_ev"),
    )
    mx = df.agg(F.max(us).cast("long").alias("tmax")).withColumn("_one", F.lit(1))
    w_us = F.lit(int(window_days) * 86_400_000_000).cast("long")
    stage = (
        F.when(F.col("n_ev") == 1, F.lit("single_visit"))
        .when(F.col("first_u") >= F.col("tmax") - w_us, F.lit("new"))
        .when(F.col("last_u") >= F.col("tmax") - w_us, F.lit("active"))
        .otherwise(F.lit("dormant"))
    )
    g = (
        per.withColumn("_one", F.lit(1))
        .join(F.broadcast(mx), "_one")
        .select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        # the 4-row stage frame feeds the total AND the share join —
        # checkpoint once so the per-user aggregate runs once
        .localCheckpoint(eager=False)
    )
    tot = g.agg(F.sum("n_users").cast("long").alias("t")).withColumn("_one", F.lit(1))
    return (
        g.withColumn("_one", F.lit(1))
        .join(F.broadcast(tot), "_one")
        .select(
            "stage",
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("t").cast("double"), 9).alias(
                "share"
            ),
        )
    )


def user_activity_dispersion(df: DataFrame) -> DataFrame:
    """Overdispersion of per-user event counts: the variance/mean
    (index of dispersion) of how many events each user generates, plus
    the top-1 user's share — the cross-SECTIONAL skew audit that
    `arrival_burstiness` (temporal) and `event_key_skew` (shuffle keys)
    bracket: D >> 1 means a power-user tail (per-user state stores and
    user-keyed shuffles need skew handling), D ~ 1 is Poisson-like.

    Determinism: per-user counts are exact; n, S = sum(c), Q =
    sum(c^2), and max(c) are int64; mean = S/n and the dispersion
    index D = var/mean = (n*Q - S^2)/(n*S) (population variance over
    the mean — the n^2 factors cancel) are each ONE pinned double
    division, ROUNDED 6; top-1 share ROUNDED 9.

    Scale shape: one grouped count on user_id (map-side combined), one
    global aggregate over the user frame.
    """
    per = df.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("c"))
    t = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
        F.max("c").cast("long").alias("max_c"),
    )
    n = F.col("n_users")
    disp_num = (n * F.col("q") - F.col("s") * F.col("s")).cast("long")
    return t.select(
        "n_users",
        F.col("s").alias("n_events"),
        F.round(F.col("s").cast("double") / n.cast("double"), 6).alias("mean_events"),
        F.round(
            disp_num.cast("double") / (n * F.col("s")).cast("double"), 6
        ).alias("dispersion_index"),
        F.round(F.col("max_c").cast("double") / F.col("s").cast("double"), 9).alias(
            "top1_share"
        ),
    )


def coldstart_rates(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Cold-start rate at the exact horizon midpoint: the share of
    users active in the SECOND half of the window with no first-half
    history — the number that sizes a recommender's fallback path and
    a per-user state store's churn. Emitted for users and (second
    half) event types so the same query audits both axes.

    Determinism: the split point is exact integer epoch-microsecond
    arithmetic (`rank_stability`'s midpoint discipline, <= goes left);
    cold entities are an exact anti-join count; rates are one double
    division, ROUNDED 9.

    Scale shape: two DISTINCT key projections per axis (filtered scans
    of the same table), one left-anti join on the key, a two-row
    union.
    """
    us = F.unix_micros(F.col(ts_col))
    piv = (
        df.agg(F.min(us).alias("t0"), F.max(us).alias("t1"))
        .select(
            (F.col("t0") + F.floor((F.col("t1") - F.col("t0")) / F.lit(2)).cast("long")).alias("p")
        )
        .withColumn("_one", F.lit(1))
    )
    base = (
        df.select(F.col("user_id"), F.col("event_type"), us.alias("u"))
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(piv), "_one")
        .localCheckpoint(eager=False)
    )

    def axis(col: str, name: str) -> DataFrame:
        first = base.where(F.col("u") <= F.col("p")).select(F.col(col).alias("k")).distinct()
        second = base.where(F.col("u") > F.col("p")).select(F.col(col).alias("k")).distinct()
        second = second.localCheckpoint(eager=False)
        n2 = second.agg(F.count(F.lit(1)).cast("long").alias("n_second"))
        cold = second.join(first, "k", "left_anti").agg(
            F.count(F.lit(1)).cast("long").alias("n_cold")
        )
        return (
            n2.withColumn("_one", F.lit(1))
            .join(F.broadcast(cold.withColumn("_one", F.lit(1))), "_one")
            .select(
                F.lit(name).alias("entity"),
                "n_second",
                "n_cold",
                F.round(
                    F.col("n_cold").cast("double") / F.col("n_second").cast("double"),
                    9,
                ).alias("cold_rate"),
            )
        )

    return axis("user_id", "user").unionByName(axis("event_type", "event_type"))


def event_bigram_oov(df: DataFrame, ts_col: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Out-of-vocabulary rate of behavioral bigrams across the horizon
    split: the share of second-half (current, next) event-type
    transitions whose TYPE PAIR never occurred in the first half —
    unweighted (pair types) and mass-weighted (transition volume). The
    language-model-style eval for the behavior chain: high OOV means
    the first half can't train a usable next-action model
    (`markov_entropy_rate` then says whether ANY half can).

    Determinism: transitions order by (ts, event_id) per user (total
    order); a transition belongs to the half of its EARLIER event
    (<= midpoint goes left, the split discipline everywhere); counts
    are exact int64, rates one double division, ROUNDED 9.

    Scale shape: one user-window pass tags transitions, one grouped
    count per (half, pair), a pair-keyed anti-join of two
    |types|^2-bounded frames.
    """
    w = Window.partitionBy("user_id").orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    us = F.unix_micros(F.col(ts_col))
    piv = (
        df.agg(F.min(us).alias("t0"), F.max(us).alias("t1"))
        .select(
            (F.col("t0") + F.floor((F.col("t1") - F.col("t0")) / F.lit(2)).cast("long")).alias("p")
        )
        .withColumn("_one", F.lit(1))
    )
    tr = (
        df.select(
            "user_id",
            F.col("event_type").alias("cur"),
            F.col(ts_col),
            F.col(id_col),
            us.alias("u"),
        )
        .withColumn("nxt", F.lead("cur").over(w))
        .where(F.col("nxt").isNotNull())
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(piv), "_one")
        .select(
            F.when(F.col("u") <= F.col("p"), F.lit(1)).otherwise(F.lit(2)).alias("half"),
            "cur",
            "nxt",
        )
        .groupBy("half", "cur", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .localCheckpoint(eager=False)
    )
    first = tr.where(F.col("half") == 1).select("cur", "nxt")
    second = tr.where(F.col("half") == 2).select("cur", "nxt", "t").localCheckpoint(
        eager=False
    )
    tot2 = second.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs_second"),
        F.sum("t").cast("long").alias("mass_second"),
    )
    oov = second.join(first, ["cur", "nxt"], "left_anti").agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("long").alias("n_pairs_oov"),
        F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("mass_oov"),
    )
    return (
        tot2.withColumn("_one", F.lit(1))
        .join(F.broadcast(oov.withColumn("_one", F.lit(1))), "_one")
        .select(
            "n_pairs_second",
            "n_pairs_oov",
            "mass_second",
            "mass_oov",
            F.round(
                F.col("n_pairs_oov").cast("double")
                / F.col("n_pairs_second").cast("double"),
                9,
            ).alias("pair_oov_rate"),
            F.round(
                F.col("mass_oov").cast("double") / F.col("mass_second").cast("double"),
                9,
            ).alias("mass_oov_rate"),
        )
    )


def hour_circular_concentration(
    df: DataFrame, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """Circular concentration of each event type's hour-of-day profile:
    the mean resultant length R in [0,1] over hours mapped to the unit
    circle — the statistic that says "this type happens at A time of
    day" (R near 1) vs "around the clock" (R near 0) WITHOUT the
    wrap-around bias a linear mean-hour has (23h and 1h average to
    midnight, not noon). Plus the modal hour by exact count argmax.

    Determinism: the 24 cos/sin values are DRIVER-COMPUTED double
    literals injected into BOTH engines (the RBO no-runtime-libm
    discipline — cos/sin never execute in either engine, so libm
    differences can't leak in); per-type C = sum(cnt * cos_h) and S
    likewise are 24-term double sums over exact counts, and R =
    sqrt(C*C + S*S)/n promotes once, ROUNDED 6. The modal hour is an
    exact-count argmax with hour tie-break — no floats at all.

    Scale shape: one grouped count per (type, hour) — map-side
    combined; everything after runs on the types x 24 frame.
    """
    import math

    cosl = [float(math.cos(2.0 * math.pi * h / 24.0)) for h in range(24)]
    sinl = [float(math.sin(2.0 * math.pi * h / 24.0)) for h in range(24)]
    hh = (
        (F.unix_micros(F.col(ts_col)) / F.lit(3_600_000_000)).cast("long") % F.lit(24)
    ).cast("int")
    g = (
        df.select(F.col(type_col).alias("t"), hh.alias("h"))
        .groupBy("t", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cos_arr = F.array(*[F.lit(v) for v in cosl])
    sin_arr = F.array(*[F.lit(v) for v in sinl])
    w = Window.partitionBy("t").orderBy(F.col("c").desc(), F.col("h").asc())
    ranked = g.select(
        "t",
        "h",
        "c",
        F.element_at(cos_arr, F.col("h") + 1).alias("ch"),
        F.element_at(sin_arr, F.col("h") + 1).alias("sh"),
        F.row_number().over(w).alias("rn"),
    )
    out = ranked.groupBy("t").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.sum(F.col("c").cast("double") * F.col("ch")).alias("cc"),
        F.sum(F.col("c").cast("double") * F.col("sh")).alias("ss"),
        F.max(F.when(F.col("rn") == 1, F.col("h"))).cast("int").alias("peak_hour"),
    )
    r = (
        F.sqrt(F.col("cc") * F.col("cc") + F.col("ss") * F.col("ss"))
        / F.col("n_events").cast("double")
    )
    return out.select(
        F.col("t").alias(type_col),
        "n_events",
        "peak_hour",
        F.round(r, 6).alias("resultant_length"),
    )


def conversion_rate_shift(
    df: DataFrame,
    target_type: str = "purchase",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Two-proportion z-test of the target event's share of all events
    across the exact horizon halves — did the conversion MIX shift, not
    just the volume? The pooled-proportion z is the standard A/B
    arithmetic, run as a before/after drift gate: |z| > 3 pages a
    human, the sign says which way.

    Determinism: all four counts are exact int64 at the epoch-midpoint
    split (<= goes left, the split discipline everywhere); p1, p2, the
    pooled p, and z assemble in ONE pinned double operation order,
    ROUNDED 6; NULL when either half is empty or the pooled variance
    is zero (target absent or universal).

    Scale shape: one filtered-conditional global aggregate after the
    broadcast midpoint hookup. Nothing else.
    """
    us = F.unix_micros(F.col(ts_col))
    piv = (
        df.agg(F.min(us).alias("t0"), F.max(us).alias("t1"))
        .select(
            (F.col("t0") + F.floor((F.col("t1") - F.col("t0")) / F.lit(2)).cast("long")).alias("p")
        )
        .withColumn("_one", F.lit(1))
    )
    is1 = F.col("u") <= F.col("p")
    hit = F.col("t") == F.lit(target_type)
    g = (
        df.select(F.col(type_col).alias("t"), us.alias("u"))
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(piv), "_one")
        .agg(
            F.sum(F.when(is1, 1).otherwise(0)).cast("long").alias("n1"),
            F.sum(F.when(is1 & hit, 1).otherwise(0)).cast("long").alias("k1"),
            F.sum(F.when(~is1, 1).otherwise(0)).cast("long").alias("n2"),
            F.sum(F.when((~is1) & hit, 1).otherwise(0)).cast("long").alias("k2"),
        )
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    p1 = F.col("k1").cast("double") / n1
    p2 = F.col("k2").cast("double") / n2
    pp = (F.col("k1") + F.col("k2")).cast("double") / (n1 + n2)
    varz = pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1 + F.lit(1.0) / n2)
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    return g.select(
        "n1",
        "k1",
        "n2",
        "k2",
        F.when(ok, F.round(p1, 9)).alias("rate_first"),
        F.when(ok, F.round(p2, 9)).alias("rate_second"),
        F.when(ok & (varz > 0), F.round((p2 - p1) / F.sqrt(varz), 6)).alias("z"),
    )


def anomalous_days(df: DataFrame, top_k: int = 5, ts_col: str = "ts") -> DataFrame:
    """The top-k days whose arrival count deviates most from their own
    WEEKDAY's mean — the incident shortlist a seasonality-aware
    monitor pages on (a quiet Sunday is normal; a quiet Tuesday is an
    outage). Complements `cusum_shift` (one sustained level change)
    with point anomalies under the weekly profile.

    Determinism: daily counts and weekday sums are exact; the weekday
    mean S_w/k_w and the absolute deviation are doubles both engines
    assemble identically from those integers, ROUNDED 6; ranking
    orders by (ROUNDED deviation DESC, day ASC) so the cut is
    engine-portable (the `hybrid_rrf_search` rounded-boundary rule).

    Scale shape: one grouped count per day, a 7-row weekday aggregate
    broadcast back, one window over the day-cardinality frame.
    """
    from pyspark.sql import Window

    day = (F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000)).cast("long")
    daily = (
        df.select(day.alias("di"))
        .groupBy("di")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .withColumn("dow", ((F.col("di") + F.lit(4)) % F.lit(7)).cast("int"))
        .localCheckpoint(eager=False)
    )
    wk = daily.groupBy("dow").agg(
        F.sum("o").cast("long").alias("s_w"),
        F.count(F.lit(1)).cast("long").alias("k_w"),
    )
    j = daily.join(F.broadcast(wk), "dow")
    mean_w = F.col("s_w").cast("double") / F.col("k_w").cast("double")
    dev = F.round(F.abs(F.col("o").cast("double") - mean_w), 6)
    ranked = j.select(
        "di", "dow", "o", F.round(mean_w, 6).alias("weekday_mean"), dev.alias("abs_dev")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("abs_dev").desc(), F.col("di").asc())
        ),
    )
    return ranked.where(F.col("rank") <= F.lit(int(top_k))).select(
        "rank",
        F.col("di").alias("epoch_day"),
        "dow",
        F.col("o").alias("n_events"),
        "weekday_mean",
        "abs_dev",
    )


def holt_linear_forecast(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Integer Holt double exponential smoothing (alpha = beta = 1/2)
    over daily revenue: level l_t = (x_t + l_{t-1} + b_{t-1}) >> 1,
    trend b_t = (b_{t-1} + l_t - l_{t-1}) >> 1, one-step forecast
    l_t + b_t — the trend-aware upgrade of `ewma_daily_value` (EWMA
    lags a trending series by design; Holt tracks the slope). Same
    sequential-fold shape: state depends on previous OUTPUTS.

    Determinism: exact integer cents with arithmetic right shifts —
    measured on BOTH engines that ``>>`` floors negatives identically
    (-7 >> 1 = -4 in Spark shiftright and DuckDB), so negative trends
    replay bit-for-bit; the DuckDB oracle is the same recurrence as a
    recursive CTE.

    Scale shape: one map-side-combined grouped sum to the
    calendar-bounded day grain, then one expression fold.

    Returns per day: (di, cents, level_cents, trend_cents,
    forecast_next_cents).
    """
    daily = (
        df.select(
            (
                F.unix_micros(F.date_trunc("day", F.col(ts_col)))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("di"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("di")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("di", "cents"))).alias("s")
    )
    zero = F.expr(
        "CAST(array() AS array<struct<di:bigint,cents:bigint,l:bigint,b:bigint>>)"
    )

    def step(acc, x):
        prev = F.element_at(acc, -1)
        first = F.size(acc) == 0
        l_new = F.when(first, x["cents"]).otherwise(
            F.shiftright(x["cents"] + prev["l"] + prev["b"], 1)
        )
        b_new = F.when(first, F.lit(0).cast("long")).otherwise(
            F.shiftright(prev["b"] + l_new - prev["l"], 1)
        )
        return F.concat(
            acc,
            F.array(
                F.struct(
                    x["di"].alias("di"),
                    x["cents"].alias("cents"),
                    l_new.cast("long").alias("l"),
                    b_new.cast("long").alias("b"),
                )
            ),
        )

    folded = series.select(F.explode(F.aggregate("s", zero, step)).alias("r"))
    return folded.select(
        F.col("r.di").alias("di"),
        F.col("r.cents").alias("cents"),
        F.col("r.l").alias("level_cents"),
        F.col("r.b").alias("trend_cents"),
        (F.col("r.l") + F.col("r.b")).cast("long").alias("forecast_next_cents"),
    )


def theil_sen_trend(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: the MEDIAN of all
    pairwise day-to-day slopes — up to ~29% of days can be corrupted
    (outages, backfills, promo spikes) without moving the estimate,
    where the OLS slope (`event_value_regression` shape) chases every
    outlier. The robust companion to `cusum_shift` (is there a shift?)
    and `ewma_daily_value` (what's the level?): what's the TREND,
    ignoring the junk days.

    Determinism: slopes are exact-integer cent differences over exact
    day gaps, one double division each; the median picks positions
    (n+1)//2 and (n+2)//2 of the slope multiset by row_number with a
    full (slope, di, dj) tie-break — positional selection over
    identical double multisets is engine-portable; the midpoint
    averages two doubles, ROUNDED 6.

    Scale shape: the pair frame is day-grain squared (calendar-bounded:
    365 days -> 66k pairs, NOT corpus-sized); one window rank over that
    bounded frame. At multi-year grain, switch the input to the weekly
    rollup — the operator is grain-agnostic.
    """
    daily = (
        df.select(
            (
                F.unix_micros(F.date_trunc("day", F.col(ts_col)))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("di"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("di")
        .agg(F.sum("c").cast("long").alias("cents"))
        .localCheckpoint(eager=False)
    )
    a = daily.select(F.col("di").alias("di_a"), F.col("cents").alias("ca"))
    b = daily.select(F.col("di").alias("di_b"), F.col("cents").alias("cb"))
    pairs = a.join(b, F.col("di_a") < F.col("di_b")).select(
        "di_a",
        "di_b",
        (
            (F.col("cb") - F.col("ca")).cast("double")
            / (F.col("di_b") - F.col("di_a")).cast("double")
        ).alias("slope"),
    )
    w = Window.orderBy(F.asc("slope"), F.asc("di_a"), F.asc("di_b"))
    ranked = pairs.select(
        "slope", F.row_number().over(w).cast("long").alias("rn")
    ).localCheckpoint(eager=False)
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("np")).withColumn(
        "_one", F.lit(1)
    )
    med = (
        ranked.withColumn("_one", F.lit(1))
        .join(F.broadcast(n), "_one")
        .filter(
            (F.col("rn") == F.floor((F.col("np") + 1) / F.lit(2.0)))
            | (F.col("rn") == F.floor((F.col("np") + 2) / F.lit(2.0)))
        )
        .agg(
            F.max("np").cast("long").alias("n_pairs"),
            (F.sum("slope") / F.count(F.lit(1)).cast("double")).alias("med"),
        )
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days")).withColumn(
        "_one", F.lit(1)
    )
    return (
        nd.join(F.broadcast(med.withColumn("_one", F.lit(1))), "_one")
        .select(
            "n_days",
            "n_pairs",
            F.round(F.col("med"), 6).alias("slope_cents_per_day"),
            F.round(F.col("med") / F.lit(100.0), 6).alias("slope_per_day"),
        )
    )


def value_wasserstein_drift(
    df: DataFrame,
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance per series between
    the even-``id_col`` and odd-``id_col`` value distributions — the
    magnitude companion to `ks_drift`: KS reports the LARGEST CDF gap
    (sensitive to one sharp difference), W1 integrates ALL of it in
    currency units ("how many cents would it cost to morph one
    distribution into the other"). The same A/A null-calibration split;
    swap the side predicate for a real before/after cut.

    Exactness: W1 = sum over consecutive distinct values of
    gap * |F_even - F_odd| is computed with the common-denominator
    trick — gap * |n_odd*cum_even - n_even*cum_odd| summed as exact
    DECIMAL(38,0) (HUGEINT in the oracle; the per-term product can
    pass int64 at corpus scale), ONE double division by n_even*n_odd
    at the end, ROUNDED 6.

    Scale shape: one (series, value) grouped count (map-side combined
    — the shuffle carries distinct values per series, not rows); the
    cumulative window and the lead() gap run over that distinct-value
    frame; one grouped decimal sum per series.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(type_col).alias("t"),
        cents.alias("v"),
        (F.col(id_col) % 2 == 0).alias("even"),
    )
    return _wasserstein_core(base, "n_even", "n_odd")


def value_wasserstein_timecut(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Exact 1-Wasserstein distance per series between the FIRST-half
    and SECOND-half days of the observed calendar range — the real
    before/after deployment cut that `value_wasserstein_drift`'s A/A
    null-calibration split documents as the production swap (round-7
    follow-through, VERDICT r6 task 7): same exact DECIMAL(38,0)
    common-denominator arithmetic, but the side predicate is
    day < (min_day + max_day + 1) / 2, so the number now measures
    actual temporal drift in cents instead of the sampling-noise floor.
    Read the two together: timecut >> A/A floor means the shift is
    real.

    Determinism and scale shape are inherited from the shared core
    (one distinct-value grouped count per series, cumulative window,
    one decimal sum); the calendar midpoint is a one-row global min/max
    broadcast, exact integer arithmetic.
    """
    di = (
        F.unix_micros(F.date_trunc("day", F.col(ts_col)))
        / F.lit(86_400_000_000)
    ).cast("long")
    bounds = (
        df.agg(
            F.min(di).cast("long").alias("min_di"),
            F.max(di).cast("long").alias("max_di"),
        )
        .select(
            ((F.col("min_di") + F.col("max_di") + 1) / 2)
            .cast("long")
            .alias("mid_di")
        )
        .withColumn("_one", F.lit(1))
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = (
        df.select(
            F.col(type_col).alias("t"),
            cents.alias("v"),
            di.alias("di"),
        )
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(bounds), "_one")
        .select("t", "v", (F.col("di") < F.col("mid_di")).alias("even"))
    )
    return _wasserstein_core(base, "n_before", "n_after")


def _wasserstein_core(
    base: DataFrame, n_true_name: str, n_false_name: str
) -> DataFrame:
    """Shared exact-W1 engine over a (t, v, even) frame: distinct-value
    grouped counts, cumulative CDF window, DECIMAL(38,0) terms, one
    double division (docstring on `value_wasserstein_drift`)."""
    per_val = base.groupBy("t", "v").agg(
        F.sum(F.col("even").cast("long")).cast("long").alias("ce"),
        F.sum((~F.col("even")).cast("long")).cast("long").alias("co"),
    )
    wv = Window.partitionBy("t").orderBy(F.asc("v"))
    wcum = wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("t")
    cur = per_val.select(
        "t",
        "v",
        F.sum("ce").over(wcum).cast("long").alias("cume"),
        F.sum("co").over(wcum).cast("long").alias("cumo"),
        F.sum("ce").over(wall).cast("long").alias("ne"),
        F.sum("co").over(wall).cast("long").alias("no"),
        F.lead("v").over(wv).alias("vnext"),
    )
    term = (
        (F.col("vnext") - F.col("v")).cast("decimal(38,0)")
        * F.abs(
            F.col("no") * F.col("cume") - F.col("ne") * F.col("cumo")
        ).cast("decimal(38,0)")
    )
    g = cur.groupBy("t").agg(
        F.max("ne").cast("long").alias("n_even"),
        F.max("no").cast("long").alias("n_odd"),
        F.sum(F.when(F.col("vnext").isNotNull(), term)).alias("num"),
    )
    w1 = F.col("num").cast("double") / (
        F.col("n_even").cast("double") * F.col("n_odd").cast("double")
    )
    return g.select(
        F.col("t").alias("event_type"),
        F.col("n_even").alias(n_true_name),
        F.col("n_odd").alias(n_false_name),
        F.when(
            (F.col("n_even") > 0) & (F.col("n_odd") > 0),
            F.round(F.coalesce(w1, F.lit(0.0)), 6),
        ).alias("w1_cents"),
    )


# Gumbel fit constants as repr literals (no engine transcendentals
# beyond sqrt/ln of data values enter the plan)
GUMBEL_GAMMA = 0.5772156649015329  # Euler-Mascheroni
GUMBEL_PI = 3.141592653589793


def daily_max_gumbel(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value", ret_days: int = 100
) -> DataFrame:
    """Gumbel (EV-I) fit of the DAILY MAXIMUM event value by method of
    moments, with the ``ret_days``-day return level — "how big an event
    should capacity planning expect once per N days", the
    extreme-value counterpart of the mean-field stats (`cusum_shift`
    tracks the level; this prices the tail): beta = sqrt(6*var)/pi,
    mu = mean - gamma*beta, level_N = mu - beta*ln(-ln(1 - 1/N)).

    Determinism: daily maxima are exact integer cents; mean and
    population variance assemble from the exact (n, sum, sum-of-
    squares) integers in one pinned double order; gamma, pi, and the
    return-level ln factor are repr literals on both engines,
    ROUNDED 6.

    Scale shape: one map-side-combined grouped max to the
    calendar-bounded day frame, one global moment aggregate, one-row
    algebra after.
    """
    import math

    daily = (
        df.select(
            (
                F.unix_micros(F.date_trunc("day", F.col(ts_col)))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("di"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("di")
        .agg(F.max("c").cast("long").alias("mx"))
    )
    t = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("mx").cast("long").alias("s"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("q"),
    )
    n = F.col("n_days").cast("double")
    mean = F.col("s").cast("double") / n
    var = F.col("q").cast("double") / n - mean * mean
    beta = F.sqrt(F.lit(6.0) * var) / F.lit(GUMBEL_PI)
    mu = mean - F.lit(GUMBEL_GAMMA) * beta
    gfac = -math.log(-math.log(1.0 - 1.0 / float(ret_days)))
    level = mu + beta * F.lit(float(gfac))
    ok = (F.col("n_days") > 1) & (var > 0)
    return t.select(
        "n_days",
        F.round(mean, 6).alias("mean_daily_max_cents"),
        F.when(ok, F.round(beta, 6)).alias("beta_cents"),
        F.when(ok, F.round(mu, 6)).alias("mu_cents"),
        F.when(ok, F.round(level, 6)).alias(f"level_{int(ret_days)}d_cents"),
    )


def friedman_types_by_day(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Friedman test of event types blocked by day: within each day,
    rank the types by daily revenue, then ask whether the type ORDERING
    is consistent across days — the repeated-measures member of the
    rank family (`kruskal_wallis` pools all rows; this blocks out the
    day effect, so a global weekend surge can't masquerade as a type
    difference). Large Q: the type ranking is stable day after day —
    per-type capacity plans are meaningful.

    Determinism: the (day x type) revenue grid is COMPLETED (absent
    cells owe revenue 0 — required for balanced blocks) in exact
    cents; within-day DOUBLED midranks r2 are exact int64, so the
    tie-adjusted statistic
    Q = (k-1) * sum_j (R2_j - n(k+1))^2 / (sum r2^2 - n*k*(k+1)^2)
    is an exact integer ratio with ONE promotion, ROUNDED 6 (the
    doubled-rank algebra absorbs the usual /4 factors). NULL when the
    denominator is 0 (all types tied every day).

    Scale shape: one map-side-combined grouped sum to the (day, type)
    grain; the grid completion is day-frame x type-frame (calendar x
    small vocabulary); the within-day rank window runs over k rows per
    day. Everything after is k-row algebra.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    di = (
        F.unix_micros(F.date_trunc("day", F.col(ts_col)))
        / F.lit(86_400_000_000)
    ).cast("long")
    cells = (
        df.select(di.alias("di"), F.col(type_col).alias("ty"), cents.alias("c"))
        .groupBy("di", "ty")
        .agg(F.sum("c").cast("long").alias("rev"))
        .localCheckpoint(eager=False)
    )
    days = cells.select("di").distinct()
    types = cells.select("ty").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(cells, ["di", "ty"], "left")
        .select("di", "ty", F.coalesce("rev", F.lit(0).cast("long")).alias("rev"))
    )
    # doubled midrank of rev within its day: 2*(count below) + ties + 1
    wd = Window.partitionBy("di")
    below = F.sum(F.lit(1)).over(
        Window.partitionBy("di").orderBy(F.asc("rev")).rangeBetween(
            Window.unboundedPreceding, -1
        )
    )
    ties = F.count(F.lit(1)).over(Window.partitionBy("di", "rev"))
    ranked = grid.select(
        "di",
        "ty",
        (F.lit(2) * F.coalesce(below, F.lit(0)) + ties + F.lit(1))
        .cast("long")
        .alias("r2"),
        F.count(F.lit(1)).over(wd).cast("long").alias("k"),
    ).localCheckpoint(eager=False)
    per_type = ranked.groupBy("ty").agg(
        F.sum("r2").cast("long").alias("r2j"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("k").cast("long").alias("k"),
    )
    tots = ranked.agg(
        F.sum(F.col("r2") * F.col("r2")).cast("long").alias("sr22"),
        F.max("k").cast("long").alias("k"),
        F.countDistinct("di").cast("long").alias("n"),
    ).withColumn("_one", F.lit(1))
    # join per-type rank sums with the one-row totals (per_type's own
    # k/n_days columns are dropped to avoid name ambiguity with tots)
    stat = (
        per_type.select("ty", "r2j")
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(tots), "_one")
        .select(
            "ty",
            "r2j",
            "sr22",
            F.col("k"),
            F.col("n"),
            ((F.col("r2j") - F.col("n") * (F.col("k") + 1))
             * (F.col("r2j") - F.col("n") * (F.col("k") + 1)))
            .cast("long")
            .alias("dev2"),
        )
    )
    agg = stat.groupBy().agg(
        F.max("k").cast("long").alias("n_types"),
        F.max("n").cast("long").alias("n_days"),
        F.sum("dev2").cast("long").alias("sdev2"),
        F.max("sr22").cast("long").alias("sr22"),
    )
    denom = (
        F.col("sr22")
        - F.col("n_days") * F.col("n_types")
        * (F.col("n_types") + 1) * (F.col("n_types") + 1)
    ).cast("long")
    q = (
        (F.col("n_types") - 1).cast("double")
        * F.col("sdev2").cast("double")
        / denom.cast("double")
    )
    return agg.select(
        "n_types",
        "n_days",
        F.when(denom > 0, F.round(q, 6)).alias("friedman_q"),
    )


def mann_kendall_trend(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily revenue: S = sum of
    sign(later - earlier) over all day pairs — the significance
    companion to `theil_sen_trend` (TS says how big the robust slope
    is; MK says whether a monotone trend EXISTS, distribution-free).
    The standard pairing in ops monitoring: alert on MK, size the
    response on TS.

    Determinism: S and the tie-corrected variance
    var = (n(n-1)(2n+5) - sum_t t(t-1)(2t+5)) / 18 are exact integers
    (the /18 stays rational until the single z promotion); the
    continuity-corrected z = (S -/+ 1)/sqrt(var) is ROUNDED 6, NULL
    when var = 0 (all days tied).

    Scale shape: one grouped sum to the calendar-bounded day grain;
    the pair frame is day-grain squared (bounded by the calendar, like
    `theil_sen_trend`); ties come from a grouped count on the distinct
    daily values. Everything after is one-row algebra.
    """
    daily = (
        df.select(
            (
                F.unix_micros(F.date_trunc("day", F.col(ts_col)))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("di"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("di")
        .agg(F.sum("c").cast("long").alias("cents"))
        .localCheckpoint(eager=False)
    )
    a = daily.select(F.col("di").alias("di_a"), F.col("cents").alias("ca"))
    b = daily.select(F.col("di").alias("di_b"), F.col("cents").alias("cb"))
    s = (
        a.join(b, F.col("di_a") < F.col("di_b"))
        .agg(
            F.sum(F.signum((F.col("cb") - F.col("ca")).cast("double")).cast("long"))
            .cast("long")
            .alias("s"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
        .withColumn("_one", F.lit(1))
    )
    ties = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (F.lit(2) * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term"),
            F.sum("t").cast("long").alias("n_days"),
        )
        .withColumn("_one", F.lit(1))
    )
    j = s.join(F.broadcast(ties), "_one")
    n = F.col("n_days").cast("double")
    var = (
        n * (n - F.lit(1.0)) * (F.lit(2.0) * n + F.lit(5.0))
        - F.col("tie_term").cast("double")
    ) / F.lit(18.0)
    z = F.when(F.col("s") > 0, (F.col("s").cast("double") - F.lit(1.0)) / F.sqrt(var)).when(
        F.col("s") < 0, (F.col("s").cast("double") + F.lit(1.0)) / F.sqrt(var)
    ).otherwise(F.lit(0.0))
    return j.select(
        "n_days",
        "n_pairs",
        F.col("s").alias("mk_s"),
        F.when(var > 0, F.round(z, 6)).alias("z"),
    )


def wilcoxon_week_over_week(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value", lag_days: int = 7
) -> DataFrame:
    """Wilcoxon signed-rank test of daily revenue against the same
    weekday one week earlier — the PAIRED member of the rank family
    (`mann_whitney` compares two groups; this pairs each day with its
    own weekday twin, removing the day-of-week effect entirely): is
    this week's revenue distribution shifted vs last week's, judged on
    within-pair differences only.

    Determinism: differences are exact cents; zero differences drop
    (the standard Wilcoxon convention); DOUBLED midranks of |d| are
    exact int64, so W2+ (doubled positive-rank sum), its expectation
    n(n+1)/2, and the tie-corrected variance 4*Var(W) =
    (n(n+1)(2n+1) - sum(t^3-t)/2) / 6 assemble from exact integers
    with ONE promotion, ROUNDED 6. NULL z when no nonzero pairs or
    zero variance.

    Scale shape: one grouped sum to the day grain; the lag join is a
    self-join on di = di + lag (calendar-bounded); ranks ride the
    distinct-|d| frame.
    """
    daily = (
        df.select(
            (
                F.unix_micros(F.date_trunc("day", F.col(ts_col)))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("di"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("di")
        .agg(F.sum("c").cast("long").alias("cents"))
        .localCheckpoint(eager=False)
    )
    cur = daily.select(F.col("di"), F.col("cents").alias("c_now"))
    prev = daily.select(
        (F.col("di") + F.lit(int(lag_days))).alias("di"),
        F.col("cents").alias("c_prev"),
    )
    diffs = (
        cur.join(prev, "di")
        .select((F.col("c_now") - F.col("c_prev")).alias("d"))
        .filter(F.col("d") != 0)
        .select(F.abs("d").alias("ad"), (F.col("d") > 0).cast("long").alias("pos"))
        .localCheckpoint(eager=False)
    )
    gv = diffs.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("pos").cast("long").alias("tp"),
    )
    wcum = Window.orderBy(F.asc("ad")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    mid = gv.select(
        "ad",
        "t",
        "tp",
        (F.lit(2) * (F.sum("t").over(wcum) - F.col("t")) + F.col("t") + F.lit(1))
        .cast("long")
        .alias("mr2"),
    )
    agg = mid.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("tp") * F.col("mr2")).cast("long").alias("w2p"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie3"),
    )
    n = F.col("n").cast("double")
    # 4*Var(W): n(n+1)(2n+1)/6 - tie3/12, assembled in one pinned order
    var4 = n * (n + F.lit(1.0)) * (F.lit(2.0) * n + F.lit(1.0)) / F.lit(6.0) - F.col(
        "tie3"
    ).cast("double") / F.lit(12.0)
    z = (F.col("w2p").cast("double") - n * (n + F.lit(1.0)) / F.lit(2.0)) / F.sqrt(
        var4
    )
    return agg.select(
        F.col("n").alias("n_nonzero_pairs"),
        F.col("w2p").alias("w2_plus"),
        F.when((F.col("n") > 0) & (var4 > 0), F.round(z, 6)).alias("z"),
    )


def hellinger_value_drift(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_cents: int = 10_000,
) -> DataFrame:
    """Hellinger distance between the first-half and second-half
    calendar days' value-bucket distributions per event type (new
    round 7): the bounded [0,1] drift metric that completes the
    divergence family — KS reports the largest CDF gap
    (`ks_drift`), W1 the transport cost (`value_wasserstein_timecut`),
    Hellinger the geometric overlap sqrt(1 - BC), symmetric and finite
    even when a bucket empties (where KL blows up).

    Determinism: bucket counts are exact int64; each Bhattacharyya
    term sqrt(cb_i * ca_i) is a deterministic double OF AN EXACT
    INTEGER PRODUCT (no per-engine p*q float products), the per-type
    sum adds <= |buckets| such terms (float-order noise ~1e-15), and
    BC normalizes by sqrt(nb*na) once — ROUNDED 6, far above the
    noise.

    Scale shape: one (type, half, bucket) grouped count (map-side
    combined — the shuffle carries buckets, not rows), a pivot to
    (before, after) counts per bucket, one grouped sum per type; the
    calendar midpoint is a one-row broadcast.
    """
    di = (
        F.unix_micros(F.date_trunc("day", F.col(ts_col))) / F.lit(86_400_000_000)
    ).cast("long")
    bounds = (
        df.agg(F.min(di).alias("mn"), F.max(di).alias("mx"))
        .select(((F.col("mn") + F.col("mx") + 1) / 2).cast("long").alias("mid_di"))
        .withColumn("_one", F.lit(1))
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = (
        df.select(
            F.col(type_col).alias("t"),
            (cents / F.lit(int(bucket_cents))).cast("long").alias("bkt"),
            di.alias("di"),
        )
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(bounds), "_one")
        .select("t", "bkt", (F.col("di") < F.col("mid_di")).alias("before"))
    )
    per = base.groupBy("t", "bkt").agg(
        F.sum(F.col("before").cast("long")).cast("long").alias("cb"),
        F.sum((~F.col("before")).cast("long")).cast("long").alias("ca"),
    )
    g = per.groupBy("t").agg(
        F.sum("cb").cast("long").alias("n_before"),
        F.sum("ca").cast("long").alias("n_after"),
        F.sum(F.sqrt((F.col("cb") * F.col("ca")).cast("double"))).alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    bc = F.col("s") / F.sqrt(
        F.col("n_before").cast("double") * F.col("n_after").cast("double")
    )
    return g.select(
        F.col("t").alias("event_type"),
        "n_before",
        "n_after",
        "n_buckets",
        F.round(bc, 6).alias("bhattacharyya"),
        F.round(F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc)), 6).alias("hellinger"),
    )


def gpd_tail_fit(
    df: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    threshold_q: float = 0.95,
    return_obs: int = 1000,
) -> DataFrame:
    """Peaks-over-threshold Generalized Pareto tail fit per event type
    (new round 7): the EXCEEDANCE companion to `daily_max_gumbel`'s
    block-maxima fit — u = exact interpolated q95 of the value,
    exceedances y = v - u, method-of-moments GPD shape/scale
    xi = (1 - m^2/s^2)/2, beta = m(m^2/s^2 + 1)/2 (Hosking & Wallis
    1987), and the N-observation return level
    u + beta/xi * ((N * zeta_u)^xi - 1) with zeta_u the exceedance
    rate — the "how bad is the 1-in-1000 event" number a pipeline
    SLO quotes.

    Determinism: cents are exact int64 and the threshold is one
    interpolated exact percentile (the `value_percentiles` parity
    precedent); exceedance moments are sums of deterministic doubles
    (noise ~1e-15 under ROUND 6); every downstream number is a pinned
    double expression. Degenerate tails (n_exc < 2 or zero variance)
    emit NULL fits.

    Scale shape: one exact-percentile aggregation per type, one
    broadcast of the per-type thresholds, one filtered grouped moment
    aggregation — the exceedance frame is quantile-bounded at ~5% of
    rows by construction.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(F.col(type_col).alias("t"), cents.alias("v"))
    thr = base.groupBy("t").agg(
        F.expr(f"percentile(v, {float(threshold_q)!r}D)").alias("u"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    exc = (
        base.join(F.broadcast(thr), "t")
        .filter(F.col("v").cast("double") > F.col("u"))
        .select("t", "n", "u", (F.col("v").cast("double") - F.col("u")).alias("y"))
    )
    g = exc.groupBy("t", "n", "u").agg(
        F.count(F.lit(1)).cast("long").alias("n_exc"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    ne = F.col("n_exc").cast("double")
    m = F.col("sy") / ne
    s2 = (F.col("syy") - F.col("sy") * F.col("sy") / ne) / (ne - F.lit(1.0))
    ratio = m * m / s2
    xi = F.lit(0.5) * (F.lit(1.0) - ratio)
    beta = F.lit(0.5) * m * (ratio + F.lit(1.0))
    zeta = ne / F.col("n").cast("double")
    rl = F.col("u") + (beta / xi) * (
        F.pow(F.lit(float(return_obs)) * zeta, xi) - F.lit(1.0)
    )
    ok = (F.col("n_exc") > 1) & (s2 > 0.0) & (xi != 0.0)
    return g.select(
        F.col("t").alias("event_type"),
        "n",
        "n_exc",
        F.round(F.col("u"), 6).alias("u_cents"),
        F.when(ok, F.round(xi, 6)).alias("gpd_xi"),
        F.when(ok, F.round(beta, 6)).alias("gpd_beta"),
        F.when(ok, F.round(rl, 6)).alias(f"rl{int(return_obs)}_cents"),
    )


def pettitt_changepoint(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Pettitt rank-based changepoint test on daily revenue (new round
    7): the nonparametric "did the level shift, and WHEN" companion to
    `cusum_shift` (which assumes a known in-control mean) and
    `mann_kendall_trend` (which tests monotone drift, not a step).
    U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j); K = max|U_t| locates the
    most probable break day and p ~= 2*exp(-6K^2/(n^3+n^2)) is the
    classic approximation.

    Determinism: the O(n^2) double sum is NEVER materialized — with
    doubled midranks mr2 = 2*rank (the `mann_whitney` machinery),
    sgn-row-sums collapse to 2r_i - n - 1 exactly (ties included), and
    the within-prefix part cancels by antisymmetry, so
    U_t = cumsum(mr2)_t - t*(n+1) is EXACT int64 end to end; only the
    final exp() is floating point, ROUNDED 6. Argmax tie-break:
    earliest day.

    Scale shape: one map-side-combined grouped sum to the
    calendar-bounded day grain, one value-grouped midrank window, one
    cumulative window over days — no self-join, no n^2 anywhere.
    """
    daily = (
        df.select(
            (
                F.unix_micros(F.date_trunc("day", F.col(ts_col)))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("di"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("di")
        .agg(F.sum("c").cast("long").alias("cents"))
        .localCheckpoint(eager=False)  # feeds the midrank frame AND the join
    )
    gv = daily.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wv = Window.orderBy(F.asc("cents")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # doubled midrank of each distinct value: 2*(below) + cnt + 1
    mr = gv.select(
        "cents",
        (F.lit(2) * (F.sum("cnt").over(wv) - F.col("cnt")) + F.col("cnt") + F.lit(1))
        .cast("long")
        .alias("mr2"),
    )
    wd = Window.orderBy(F.asc("di")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = (
        daily.join(mr, "cents")
        .select(
            "di",
            F.row_number().over(Window.orderBy(F.asc("di"))).alias("t"),
            F.sum("mr2").over(wd).cast("long").alias("cum_mr2"),
            F.count(F.lit(1)).over(wall).cast("long").alias("n"),
        )
        # U_t = sum_{i<=t}(2 r_i) - t(n+1); mr2 = 2r exactly (ties ok)
        .select(
            "di",
            "t",
            "n",
            (F.col("cum_mr2") - F.col("t") * (F.col("n") + F.lit(1)))
            .cast("long")
            .alias("u_t"),
        )
        .filter(F.col("t") < F.col("n"))  # U_n = 0 by construction
    )
    best = cum.orderBy(F.abs(F.col("u_t")).desc(), F.asc("di")).limit(1)
    n = F.col("n").cast("double")
    k = F.abs(F.col("u_t")).cast("double")
    p = F.lit(2.0) * F.exp(F.lit(-6.0) * k * k / (n * n * n + n * n))
    return best.select(
        F.col("n").alias("n_days"),
        F.abs(F.col("u_t")).cast("long").alias("k_stat"),
        F.col("di").alias("changepoint_di"),
        F.col("u_t").alias("u_at_change"),
        F.round(F.least(F.lit(1.0), p), 6).alias("p_approx"),
    )


def dow_seasonal_decomposition(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Day-of-week seasonal decomposition of daily revenue (new round
    7): classic moving-average decomposition — trend = centered 7-day
    MA, seasonal = per-weekday mean of the detrended series — the
    "which weekday carries the week" profile `weekday_uniformity` only
    chi-squares. Kept EXACT by never dividing the MA: detr7 =
    7*cents - sum7 is int64, so the per-dow mean is one integer-sum
    division (seasonal in currency units divides by 700: 7 for the MA,
    100 for cents), and the within-dow spread comes from exact integer
    moments of detr7.

    Windows are guarded to FULL calendar weeks (7 rows spanning exactly
    6 day-indices) so a gap in the day series disqualifies its windows
    rather than silently biasing the MA. dow = di % 7 — a fixed,
    engine-agnostic weekday labeling (di is the unix day index).

    Scale shape: one grouped sum to the day grain, one 7-row window,
    one 7-group aggregation — report-sized output.
    """
    daily = (
        df.select(
            (
                F.unix_micros(F.date_trunc("day", F.col(ts_col)))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("di"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("di")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    w7 = Window.orderBy(F.asc("di")).rowsBetween(-3, 3)
    win = daily.select(
        "di",
        "cents",
        F.sum("cents").over(w7).cast("long").alias("sum7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("cnt7"),
        (F.max("di").over(w7) - F.min("di").over(w7)).cast("long").alias("span7"),
    ).filter((F.col("cnt7") == 7) & (F.col("span7") == 6))
    detr = win.select(
        (F.col("di") % 7).cast("long").alias("dow"),
        (F.lit(7) * F.col("cents") - F.col("sum7")).cast("long").alias("d7"),
    )
    g = detr.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("d7").cast("long").alias("s"),
        F.sum(F.col("d7") * F.col("d7")).cast("long").alias("ss"),
    )
    nd = F.col("n_days").cast("double")
    mean7 = F.col("s").cast("double") / nd
    var7 = F.when(
        F.col("n_days") > 1,
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s").cast("double") / nd)
        / (nd - F.lit(1.0)),
    )
    return g.select(
        "dow",
        "n_days",
        F.round(mean7 / F.lit(700.0), 6).alias("seasonal"),
        F.round(F.sqrt(var7) / F.lit(700.0), 6).alias("within_sd"),
    ).orderBy("dow")


def ljung_box_daily(
    df: DataFrame, max_lag: int = 7, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Ljung-Box portmanteau whiteness test on daily revenue (new round
    7): Q = n(n+2) * sum_{k=1..7} rho_k^2/(n-k) asks whether ANY of the
    first 7 autocorrelations is live — the single-number gate on top of
    `hourly_acf`'s per-lag curve (and the formal cousin of `runs_test`).
    Q above chi2(7, 99%) = 18.475 means "not white noise, look at the
    lags".

    Determinism: with S = sum(cents) exact, the centered series scaled
    by n — z_t = n*x_t - S — is exact DECIMAL(38,0) (the
    `value_wasserstein_drift` discipline), so every lag-k autocovariance
    numerator sum(z_t * z_{t-k}) is exact decimal (|z| ~ 1e12, products
    ~ 1e24, sums well under 1e38); rho_k = that / sum(z^2) is ONE double
    division per lag, and Q is a single 7-term expression over those
    doubles — no float accumulation anywhere.

    Scale shape: one grouped sum to the day grain, one 7-lag window
    pass, one global aggregation to a single row.
    """
    kk = int(max_lag)
    daily = (
        df.select(
            (
                F.unix_micros(F.date_trunc("day", F.col(ts_col)))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("di"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("di")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    wall = Window.partitionBy()
    wd = Window.orderBy(F.asc("di"))
    base = daily.select(
        "di",
        "cents",
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
        F.sum("cents").over(wall).cast("long").alias("s"),
    ).select(
        "di",
        "n",
        (F.col("n") * F.col("cents") - F.col("s")).cast("decimal(38,0)").alias("z"),
    )
    lagged = base.select(
        "di",
        "n",
        "z",
        *[F.lag("z", k).over(wd).alias(f"z{k}") for k in range(1, kk + 1)],
    )
    agg = lagged.groupBy("n").agg(
        F.sum(F.col("z") * F.col("z")).alias("g0"),
        *[
            F.sum(F.col("z") * F.col(f"z{k}")).alias(f"g{k}")
            for k in range(1, kk + 1)
        ],
    )
    nd = F.col("n").cast("double")
    # constant series guard: zero total variance (g0 = 0) has no
    # defined autocorrelation — emit NULLs rather than engine-specific
    # division-by-zero behavior
    live = F.col("g0") > F.lit(0).cast("decimal(38,0)")
    rhos = [
        F.when(live, F.col(f"g{k}").cast("double") / F.col("g0").cast("double"))
        for k in range(1, kk + 1)
    ]
    q = nd * (nd + F.lit(2.0)) * sum(
        (r * r / (nd - F.lit(float(k))) for k, r in zip(range(1, kk + 1), rhos)),
        start=F.lit(0.0),
    )
    return agg.select(
        F.col("n").alias("n_days"),
        *[F.round(r, 6).alias(f"rho{k}") for k, r in zip(range(1, kk + 1), rhos)],
        F.round(q, 6).alias("q_lb"),
        F.when(live, (q > F.lit(18.475307)).cast("long")).alias("crossed_99"),
    )


def logrank_segments(
    orders: DataFrame,
    customer: DataFrame,
    seg_a: str = "BUILDING",
    seg_b: str = "MACHINERY",
) -> DataFrame:
    """Two-sample log-rank test on time-to-second-order (new round 7):
    `km_survival` DRAWS the curves; this is the test that says whether
    two market segments' repeat-purchase hazards actually differ.
    Subjects are first-time buyers; the event is the second order
    (time = days between first and second order date, first-date /
    orderkey tie-broken), censored at the corpus horizon (max order
    date). At each distinct event time: O_a observed events in A,
    E_a = d * r_a / r expected under the null, hypergeometric variance
    V = d*(r_a/r)*(r_b/r)*(r-d)/(r-1); the statistic is
    (sum O_a - sum E_a)^2 / sum V ~ chi2(1).

    Determinism: death and at-risk counts are exact int64 from grouped
    windows (at-risk by cumulative subtraction, never a per-subject
    scan per time); E and V are per-time double expressions over four
    integers, summed over the event-time frame and ROUNDED 6 (the
    `value_anova` cross-group float-sum discipline — the frame is
    calendar-gap-bounded, hundreds of rows).

    Scale shape: one window over orders per customer (shuffle on
    custkey), one broadcast of the 1-row horizon, grouped counts to the
    (segment, time) grain, two cumulative windows, one 1-row verdict.
    """
    seg = customer.filter(
        F.col("c_mktsegment").isin([seg_a, seg_b])
    ).select(F.col("c_custkey").alias("ck"), F.col("c_mktsegment").alias("g"))
    wo = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    firsts = (
        orders.select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").alias("d"),
            F.row_number().over(wo).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .groupBy("ck")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
            F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
        )
    )
    horizon = orders.agg(F.max("o_orderdate").alias("dmax")).withColumn(
        "_one", F.lit(1)
    )
    subj = (
        seg.join(firsts, "ck")
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(horizon), "_one")
        .select(
            "g",
            F.when(F.col("d2").isNotNull(), F.datediff("d2", "d1"))
            .otherwise(F.datediff("dmax", "d1"))
            .cast("long")
            .alias("time"),
            F.col("d2").isNotNull().cast("long").alias("event"),
        )
        .localCheckpoint(eager=False)  # feeds the grid and both groups
    )
    times = (
        subj.filter(F.col("event") == 1)
        .select("time")
        .distinct()
        .localCheckpoint(eager=False)  # read per group grid + final restrict
    )
    ga = subj.filter(F.col("g") == seg_a)
    gb = subj.filter(F.col("g") == seg_b)

    # at-risk must come from each group's FULL time list (censored
    # subjects between event-grid points still count), so cumulate on
    # the union of the event grid and the group's own times, then
    # restrict back to event times:
    def risk_at(s: DataFrame, suffix: str) -> DataFrame:
        byt = s.groupBy("time").agg(
            F.count(F.lit(1)).cast("long").alias("c_all"),
            F.sum("event").cast("long").alias("c_ev"),
        )
        grid = (
            times.select("time")
            .unionByName(byt.select("time"))
            .distinct()
        )
        j = grid.join(byt, "time", "left").select(
            "time",
            F.coalesce("c_all", F.lit(0)).cast("long").alias("c_all"),
            F.coalesce("c_ev", F.lit(0)).cast("long").alias("d"),
        )
        wt = Window.orderBy(F.asc("time")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        wn = Window.partitionBy()
        return (
            j.select(
                "time",
                F.col("d").alias(f"d_{suffix}"),
                (
                    F.sum("c_all").over(wn)
                    - (F.sum("c_all").over(wt) - F.col("c_all"))
                )
                .cast("long")
                .alias(f"r_{suffix}"),
            )
            .join(times, "time")  # back to event times only
        )

    joined = risk_at(ga, "a").join(risk_at(gb, "b"), "time")
    d = (F.col("d_a") + F.col("d_b")).cast("double")
    ra = F.col("r_a").cast("double")
    rb = F.col("r_b").cast("double")
    r = ra + rb
    e_a = d * ra / r
    v = F.when(
        r > 1.0, d * (ra / r) * (rb / r) * (r - d) / (r - F.lit(1.0))
    ).otherwise(F.lit(0.0))
    # n_a/n_b are DIRECT subject counts per group (a subject censored
    # before the first event time is still in the cohort; max(at-risk)
    # would drop it — ADVICE r7), as a broadcast 1-row frame:
    ncnt = subj.agg(
        F.sum((F.col("g") == seg_a).cast("long")).alias("n_a"),
        F.sum((F.col("g") == seg_b).cast("long")).alias("n_b"),
    ).withColumn("_one", F.lit(1))
    tot = (
        joined.agg(
            F.sum("d_a").cast("long").alias("events_a"),
            F.sum("d_b").cast("long").alias("events_b"),
            F.sum(F.col("d_a").cast("double") - e_a).alias("ome"),
            F.sum(v).alias("vs"),
        )
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(ncnt), "_one")
    )
    z2 = F.col("ome") * F.col("ome") / F.col("vs")
    return tot.select(
        F.lit(seg_a).alias("segment_a"),
        F.lit(seg_b).alias("segment_b"),
        "n_a",
        "n_b",
        "events_a",
        "events_b",
        F.round(F.col("ome"), 6).alias("o_minus_e"),
        F.round(F.col("vs"), 6).alias("var_logrank"),
        F.when(F.col("vs") > 0, F.round(z2, 6)).alias("z2_logrank"),
        F.when(F.col("vs") > 0, (z2 > F.lit(6.634897)).cast("long")).alias(
            "crossed_99"
        ),
    )
