"""Time-series: sessionization, as-of joins, funnels, retention, trend/drift/changepoint/survival statistics.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import (
    DataFrame,
    F,
    RL,
    SparkSession,
    Window,
    load_table,
)


def q_events_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event rollup with JSON prop extraction."""
    return RL.events_by_hour(load_table(spark, sf_dir, "events"))


def o_events_by_hour() -> str:
    return """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_epoch,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
"""


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window aggregate (batch twin of the streaming
    windowed aggregation)."""
    return RL.events_tumbling(load_table(spark, sf_dir, "events"))


def o_events_tumbling() -> str:
    return """
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS ws_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1
"""


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max aggregation: each user's most recent event in ONE grouped
    pass (max_by — no self-join, no window; the cheapest per-key
    latest-record pattern at scale). ts is unique per user, so the pick
    is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    return ev.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.max(us).cast("long").alias("last_ts_us"),
        F.max_by("event_type", us).alias("last_type"),
        F.max_by(F.round(F.col("value") * 100).cast("long"), us).alias("last_cents"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def o_latest_event_per_user() -> str:
    return """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us,
       arg_max(event_type, epoch_us(ts)) AS last_type,
       CAST(arg_max(CAST(round(value * 100) AS BIGINT), epoch_us(ts)) AS BIGINT) AS last_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-sequence transition counts (lag window per user
    then one grouped count — the Markov-chain feed for behavioral
    models; one shuffle on user_id, one on the pair)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"))
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


def o_event_transitions() -> str:
    return """
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def q_purchase_click_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: purchases x same-user clicks within a
    60-minute look-back. Batch twin of streaming/joins — the identical
    operator runs as a watermarked stream-stream join (test_stream_join
    pins their equality)."""
    from pythonvectordb_spark.streaming.joins import purchase_click_interval_join

    ev = load_table(spark, sf_dir, "events")
    return purchase_click_interval_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )


def o_purchase_click_interval_join() -> str:
    return """
SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_ts_us,
       CAST(c.event_id AS BIGINT) AS click_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us,
       CAST(round(p.value * 100) AS BIGINT) AS value_cents
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 60 MINUTE
"""


def q_asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time as-of join: every purchase attributed to the user's
    most recent click at-or-before it (union + running-last, ONE shuffle;
    see operators/timeseries.asof_join for the scale rationale)."""
    from pythonvectordb_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = TS.asof_join(
        purchases, clicks, key="user_id", payload_cols=["click_id", "ts"],
        tiebreak="click_id",
    )
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros("ts").cast("long").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.col("click_id_asof").cast("long").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("ts_asof")).cast("long").alias("lag_us"),
    )


def o_asof_purchase_attribution() -> str:
    return """
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
       CAST(round(p.value * 100) AS BIGINT) AS value_cents,
       CAST(c.event_id AS BIGINT) AS click_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) — lag + running
    conditional sum, one shuffle on user_id."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)


def o_sessionize_events() -> str:
    return """
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS us, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
), tagged AS (
  SELECT user_id, us, value,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_seq
  FROM seq
)
SELECT user_id, session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(us) AS BIGINT) AS start_us,
       CAST(max(us) AS BIGINT) AS end_us,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM tagged GROUP BY user_id, session_seq
"""


def q_moving_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 60-minute per-user stats via an event-time RANGE frame."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.moving_window_stats(load_table(spark, sf_dir, "events"), window_minutes=60)


def o_moving_window_stats() -> str:
    return """
SELECT CAST(event_id AS BIGINT) AS event_id,
       user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_trailing
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade: raw -> minute -> hour -> day, each
    coarser level folding the finer level's partials. The oracle computes
    every level straight from raw rows — matching proves the cascade is
    lossless."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.hypertable_rollup(load_table(spark, sf_dir, "events"))


def o_hypertable_rollup() -> str:
    lvl = """
SELECT '{name}' AS granularity,
       CAST(floor(epoch_us(ts) / {span}) * {span} AS BIGINT) AS bucket_us,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2, 3"""
    m = 60_000_000
    parts = [
        lvl.format(name="minute", span=60 * m),
        lvl.format(name="hour", span=3600 * m),
        lvl.format(name="day", span=86400 * m),
    ]
    return "\nUNION ALL\n".join(parts)


def q_event_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window outlier detection: flag events > 2 sigma from the
    user's trailing-30-day mean. The 2-sigma test is algebraically
    rearranged to pure BIGINT arithmetic — (n*x - sum)^2 > 4*(n*sumsq -
    sum^2) — so there is no floating point anywhere in the decision
    (data-quality filters must be exactly reproducible across engines
    and reruns)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_us"))
        .rangeBetween(-2_592_000_000_000, 0)  # 30-day trailing window
    )
    base = (
        ev.withColumn("_us", us)
        .withColumn("cents", cents)
        .withColumn("n_trail", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("s1", F.sum("cents").over(w).cast("long"))
        .withColumn("s2", F.sum(F.col("cents") * F.col("cents")).over(w).cast("long"))
    )
    dev = F.col("n_trail") * F.col("cents") - F.col("s1")
    var4 = F.lit(4) * (F.col("n_trail") * F.col("s2") - F.col("s1") * F.col("s1"))
    return (
        base.filter((F.col("n_trail") >= 5) & (dev * dev > var4))
        .select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.col("cents"),
            F.col("n_trail"),
            (dev * dev).cast("long").alias("dev_sq"),
            var4.cast("long").alias("var4"),
        )
    )


def o_event_outliers() -> str:
    return """
WITH base AS (
  SELECT event_id, user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(count(*) OVER w AS BIGINT) AS n_trail,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s1,
         CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       cents, n_trail,
       CAST((n_trail * cents - s1) * (n_trail * cents - s1) AS BIGINT) AS dev_sq,
       CAST(4 * (n_trail * s2 - s1 * s1) AS BIGINT) AS var4
FROM base
WHERE n_trail >= 5
  AND (n_trail * cents - s1) * (n_trail * cents - s1) > 4 * (n_trail * s2 - s1 * s1)
"""


def q_user_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered sequence aggregation: each user's first 10 event types as
    a '>' path. The per-user list is capped BEFORE collecting — a
    row_number window keeps only each user's first 10 events, so the
    collect_list state is bounded at 10 structs per key regardless of
    how heavy a power user is (the window's partition sort spills; a
    whole-history collect_list accumulates on the heap). Deterministic
    because rows are ranked and the collected structs sorted on the
    unique event timestamp."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us")
    ranked = (
        ev.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.unix_micros("ts").alias("us"),
            "event_type",
        )
        .withColumn("rn", F.row_number().over(w))
    )
    seq = F.sort_array(
        F.collect_list(F.struct(F.col("us"), F.col("event_type")))
    )
    path = F.concat_ws(">", F.transform(seq, lambda s: s["event_type"]))
    paths = (
        ranked.filter(F.col("rn") <= 10)
        .groupBy("user_id")
        .agg(path.alias("path10"))
    )
    counts = ranked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    return paths.join(counts, "user_id")


def o_user_event_paths() -> str:
    return """
SELECT CAST(user_id AS BIGINT) AS user_id,
       array_to_string(list_slice(list(event_type ORDER BY epoch_us(ts)), 1, 10), '>') AS path10,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD built from the event log: per-user event_type runs as
    validity intervals (consecutive duplicates collapsed, open current
    row)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.scd2_from_events(load_table(spark, sf_dir, "events"))


def o_scd2_user_state() -> str:
    return """
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
  FROM events
), changed AS (
  SELECT user_id, event_type, us FROM seq
  WHERE prev IS NULL OR prev != event_type
)
SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(us AS BIGINT) AS valid_from_us,
       CAST(lead(us) OVER (PARTITION BY user_id ORDER BY us) AS BIGINT) AS valid_to_us
FROM changed
"""


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER first view,
    then purchased AFTER first qualifying click. Per-stage min
    timestamps chained through user-keyed joins (bounded per-user state
    — skew-safe for power users), then a one-row count rollup."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    base = events.select("user_id", "event_type", us.alias("t"))
    # Per-user state is a single min per stage — NO collect_list: a
    # power user with millions of events would make the list aggregate's
    # per-key state unbounded (round-2 VERDICT item 7). Each stage's
    # ordering predicate ("after the previous stage's first event") is
    # applied by re-scanning that stage's events against the previous
    # stage's per-user min via a user-keyed join; every aggregation and
    # join shares the user_id partitioning.
    #
    # Single-reference chain (advisor union-recompute clean, no
    # checkpoints needed): users -> clicks via one join, then the
    # purchase stage and the stage rollup fold into ONE right join +
    # grouped aggregate — per-user purchase events fan in against the
    # (user, t_view, t_click) spine, and the qualifying-purchase min is
    # taken inside the same aggregation that carries the stage flags.
    users = base.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("t"))).alias("t_view")
    )
    clicks = (
        base.filter(F.col("event_type") == "click")
        .join(users.filter(F.col("t_view").isNotNull()), "user_id")
        .filter(F.col("t") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    spine = users.join(clicks, "user_id", "left")
    per_user = (
        base.filter(F.col("event_type") == "purchase")
        .join(spine, "user_id", "right")
        .groupBy("user_id")
        .agg(
            F.min("t_view").alias("t_view"),
            F.min("t_click").alias("t_click"),
            F.min(F.when(F.col("t") > F.col("t_click"), F.col("t"))).alias(
                "t_purchase"
            ),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("long")).cast("long").alias("stage_view"),
        F.sum(F.col("t_click").isNotNull().cast("long")).cast("long").alias("stage_click"),
        F.sum(F.col("t_purchase").isNotNull().cast("long")).cast("long").alias("stage_purchase"),
    )


def o_event_funnel() -> str:
    return """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         list(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS clicks,
         list(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS purchases
  FROM events GROUP BY 1
),
staged AS (
  SELECT user_id, t_view,
         list_min(list_filter(clicks, c -> c > t_view)) AS t_click,
         list_min(list_filter(purchases,
             p -> p > list_min(list_filter(clicks, c -> c > t_view)))) AS t_purchase
  FROM per_user
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_view,
       CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
       CAST(sum(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
FROM staged
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day; for each
    (cohort day, day offset) the count of cohort users active that day.
    The first-seen day is a per-user min (one shuffle); the matrix is a
    distinct-then-count over (cohort, offset) — the standard two-shuffle
    retention plan, no self-join of the event table."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = events.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    active = events.select("user_id", day.alias("active_day")).distinct()
    return (
        active.join(firsts, "user_id")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("active_day", "cohort_day").cast("int").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


def o_retention_cohorts() -> str:
    return """
WITH firsts AS (
  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
  FROM events GROUP BY 1
),
active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM events
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', cohort_day, active_day) AS INT) AS day_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
FROM active JOIN firsts USING (user_id)
GROUP BY 1, 2
"""


def q_top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise top-k: each user's 3 highest-value events. A
    partitioned rank window (never a global sort); deterministic through
    value ties via the (value, event_id) composite order. At scale this
    is the one-shuffle pattern for per-entity leaderboards."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("v_cents"), F.asc("event_id")
    )
    return (
        events.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            cents.alias("v_cents"),
        )
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
    )


def o_top_events_per_user() -> str:
    return """
WITH v AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS event_id,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events
)
SELECT user_id, event_id, v_cents, CAST(rk AS INT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY v_cents DESC, event_id ASC) AS rk
  FROM v
) WHERE rk <= 3
"""


def q_event_value_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: per event type, the linear
    relationship between event value and hour-of-day — corr,
    regr_slope/intercept/r2, stddev_samp, var_pop. All six are
    single-pass partial-aggregable moments (sum, sum², cross-sum), so
    the plan is one map-side-combined shuffle on the 5-value key; no
    window, no second scan. Doubles rounded to 6 places on both sides
    (both engines compute the same moment formulas; bounded magnitudes
    keep float noise far below the rounding grain)."""
    events = load_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    y = F.col("value")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.corr(y, x), 6).alias("corr_vh"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.stddev_samp(y), 6).alias("stddev_v"),
            F.round(F.var_pop(y), 6).alias("varp_v"),
        )
    )


def o_event_value_regression() -> str:
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(corr(value, CAST(hour(ts) AS DOUBLE)), 6) AS corr_vh,
       round(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 6) AS slope,
       round(regr_intercept(value, CAST(hour(ts) AS DOUBLE)), 6) AS intercept,
       round(regr_r2(value, CAST(hour(ts) AS DOUBLE)), 6) AS r2,
       round(stddev_samp(value), 6) AS stddev_v,
       round(var_pop(value), 6) AS varp_v
FROM events GROUP BY 1
"""


def q_event_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic over events.user_id
    (`sketch.key_skew_report`): one row with key counts, hottest-key
    share, per-key-count percentiles, and skew_factor = max/mean — the
    pre-flight check that decides plain shuffle vs AQE skew-split vs
    salting before a 100 TB join commits to a key."""
    from pythonvectordb_spark.operators import sketch as SK

    events = load_table(spark, sf_dir, "events")
    return SK.key_skew_report(events, "user_id")


def o_event_key_skew() -> str:
    return """
WITH counts AS (
  SELECT CAST(user_id AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
)
SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(cnt) AS BIGINT) AS max_cnt,
       (SELECT k FROM counts ORDER BY cnt DESC, k DESC LIMIT 1) AS top_key,
       round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 9) AS top_share,
       round(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
       round(quantile_cont(cnt, 0.9), 6) AS p90_cnt,
       round(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
       round(CAST(max(cnt) AS DOUBLE) / avg(cnt), 6) AS skew_factor
FROM counts
"""


def q_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Holt double exponential smoothing over daily revenue
    (new round 6): level/trend recurrences on exact cents with
    arithmetic shifts (floor semantics measured identical on both
    engines, including negative trends); one-step forecast per day
    (`operators/timeseries.holt_linear_forecast`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.holt_linear_forecast(load_table(spark, sf_dir, "events"))


def o_holt_linear_forecast() -> str:
    return """
WITH RECURSIVE daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
idx AS (SELECT di, cents,
               CAST(row_number() OVER (ORDER BY di ASC) AS BIGINT) AS i
        FROM daily),
r AS (
  SELECT i, di, cents, cents AS l, CAST(0 AS BIGINT) AS b FROM idx WHERE i = 1
  UNION ALL
  SELECT d.i, d.di, d.cents,
         CAST((d.cents + r.l + r.b) >> 1 AS BIGINT),
         CAST((r.b + ((d.cents + r.l + r.b) >> 1) - r.l) >> 1 AS BIGINT)
  FROM r JOIN idx d ON d.i = r.i + 1
)
SELECT di, cents, CAST(l AS BIGINT) AS level_cents,
       CAST(b AS BIGINT) AS trend_cents,
       CAST(l + b AS BIGINT) AS forecast_next_cents
FROM r
"""


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust daily-revenue trend (new round 6): median of
    all pairwise slopes over the calendar-bounded day frame — immune
    to ~29% corrupted days where OLS chases every outlier
    (`operators/timeseries.theil_sen_trend`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.theil_sen_trend(load_table(spark, sf_dir, "events"))


def o_theil_sen_trend() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
pairs AS (SELECT a.di AS di_a, b.di AS di_b,
                 (b.cents - a.cents)::DOUBLE / (b.di - a.di)::DOUBLE AS slope
          FROM daily a JOIN daily b ON a.di < b.di),
ranked AS (SELECT slope,
                  CAST(row_number() OVER (ORDER BY slope ASC, di_a ASC,
                                          di_b ASC) AS BIGINT) AS rn
           FROM pairs),
n AS (SELECT CAST(count(*) AS BIGINT) AS np FROM ranked),
med AS (SELECT CAST(max(np) AS BIGINT) AS n_pairs,
               sum(slope) / count(*)::DOUBLE AS med
        FROM ranked CROSS JOIN n
        WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
SELECT n_days, n_pairs,
       round(med, 6) AS slope_cents_per_day,
       round(med / 100.0, 6) AS slope_per_day
FROM nd CROSS JOIN med
"""


def q_value_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-Wasserstein value drift per event type (new round 6):
    the earth-mover magnitude companion to `ks_drift`'s sup-norm —
    common-denominator DECIMAL(38,0) sum over the distinct-value
    frame, one division
    (`operators/timeseries.value_wasserstein_drift`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.value_wasserstein_drift(load_table(spark, sf_dir, "events"))


def o_value_wasserstein_drift() -> str:
    return """
WITH base AS (SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v,
                     event_id % 2 = 0 AS even
              FROM events),
pv AS (SELECT t, v,
              CAST(sum(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS ce,
              CAST(sum(CASE WHEN even THEN 0 ELSE 1 END) AS BIGINT) AS co
       FROM base GROUP BY 1, 2),
cur AS (SELECT t, v,
               CAST(sum(ce) OVER w AS BIGINT) AS cume,
               CAST(sum(co) OVER w AS BIGINT) AS cumo,
               CAST(sum(ce) OVER (PARTITION BY t) AS BIGINT) AS ne,
               CAST(sum(co) OVER (PARTITION BY t) AS BIGINT) AS no,
               lead(v) OVER (PARTITION BY t ORDER BY v ASC) AS vnext
        FROM pv
        WINDOW w AS (PARTITION BY t ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
g AS (SELECT t, CAST(max(ne) AS BIGINT) AS n_even,
             CAST(max(no) AS BIGINT) AS n_odd,
             sum(CASE WHEN vnext IS NOT NULL THEN
                   CAST(vnext - v AS HUGEINT)
                   * CAST(abs(no * cume - ne * cumo) AS HUGEINT)
                 END) AS num
      FROM cur GROUP BY 1)
SELECT t AS event_type, n_even, n_odd,
       CASE WHEN n_even > 0 AND n_odd > 0 THEN
         round(coalesce(num::DOUBLE / (n_even::DOUBLE * n_odd::DOUBLE), 0.0), 6)
       END AS w1_cents
FROM g
"""


def q_daily_max_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel EV-I fit of the daily maximum event value (new round 6):
    method-of-moments beta/mu from exact integer moments, 100-day
    return level with gamma/pi/ln-factor as repr literals
    (`operators/timeseries.daily_max_gumbel`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.daily_max_gumbel(load_table(spark, sf_dir, "events"), ret_days=100)


def o_daily_max_gumbel() -> str:
    import math

    from pythonvectordb_spark.operators.timeseries import GUMBEL_GAMMA, GUMBEL_PI

    gfac = -math.log(-math.log(1.0 - 1.0 / 100.0))
    return f"""
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mx
  FROM events GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(mx) AS BIGINT) AS s,
             CAST(sum(mx * mx) AS BIGINT) AS q
      FROM daily)
SELECT n_days,
       round(s::DOUBLE / n_days::DOUBLE, 6) AS mean_daily_max_cents,
       CASE WHEN n_days > 1
                 AND (q::DOUBLE / n_days::DOUBLE
                      - (s::DOUBLE / n_days::DOUBLE)
                        * (s::DOUBLE / n_days::DOUBLE)) > 0 THEN
         round(sqrt(6.0 * (q::DOUBLE / n_days::DOUBLE
                           - (s::DOUBLE / n_days::DOUBLE)
                             * (s::DOUBLE / n_days::DOUBLE)))
               / {GUMBEL_PI!r}, 6) END AS beta_cents,
       CASE WHEN n_days > 1
                 AND (q::DOUBLE / n_days::DOUBLE
                      - (s::DOUBLE / n_days::DOUBLE)
                        * (s::DOUBLE / n_days::DOUBLE)) > 0 THEN
         round(s::DOUBLE / n_days::DOUBLE
               - {GUMBEL_GAMMA!r}
                 * (sqrt(6.0 * (q::DOUBLE / n_days::DOUBLE
                                - (s::DOUBLE / n_days::DOUBLE)
                                  * (s::DOUBLE / n_days::DOUBLE)))
                    / {GUMBEL_PI!r}), 6) END AS mu_cents,
       CASE WHEN n_days > 1
                 AND (q::DOUBLE / n_days::DOUBLE
                      - (s::DOUBLE / n_days::DOUBLE)
                        * (s::DOUBLE / n_days::DOUBLE)) > 0 THEN
         round((s::DOUBLE / n_days::DOUBLE
                - {GUMBEL_GAMMA!r}
                  * (sqrt(6.0 * (q::DOUBLE / n_days::DOUBLE
                                 - (s::DOUBLE / n_days::DOUBLE)
                                   * (s::DOUBLE / n_days::DOUBLE)))
                     / {GUMBEL_PI!r}))
               + (sqrt(6.0 * (q::DOUBLE / n_days::DOUBLE
                              - (s::DOUBLE / n_days::DOUBLE)
                                * (s::DOUBLE / n_days::DOUBLE)))
                  / {GUMBEL_PI!r}) * {gfac!r}, 6) END AS level_100d_cents
FROM t
"""


def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily revenue (new round 6):
    S over all day pairs, tie-corrected variance, continuity-corrected
    z — alert on MK, size on `theil_sen_trend`
    (`operators/timeseries.mann_kendall_trend`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.mann_kendall_trend(load_table(spark, sf_dir, "events"))


def o_mann_kendall_trend() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
s AS (SELECT CAST(sum(CAST(sign(b.cents - a.cents) AS BIGINT)) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM daily a JOIN daily b ON a.di < b.di),
ties AS (SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
                CAST(sum(t) AS BIGINT) AS n_days
         FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily
               GROUP BY cents))
SELECT n_days, n_pairs, s AS mk_s,
       CASE WHEN (n_days::DOUBLE * (n_days::DOUBLE - 1.0)
                  * (2.0 * n_days::DOUBLE + 5.0)
                  - tie_term::DOUBLE) / 18.0 > 0 THEN
         round(CASE WHEN s > 0 THEN
                 (s::DOUBLE - 1.0)
                 / sqrt((n_days::DOUBLE * (n_days::DOUBLE - 1.0)
                         * (2.0 * n_days::DOUBLE + 5.0)
                         - tie_term::DOUBLE) / 18.0)
               WHEN s < 0 THEN
                 (s::DOUBLE + 1.0)
                 / sqrt((n_days::DOUBLE * (n_days::DOUBLE - 1.0)
                         * (2.0 * n_days::DOUBLE + 5.0)
                         - tie_term::DOUBLE) / 18.0)
               ELSE 0.0 END, 6) END AS z
FROM s CROSS JOIN ties
"""


def q_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per event series (staged for the round-5
    rotation): the peak of the exact-integer n-scaled CUSUM statistic
    localizes a mean shift in time — the batch twin of the streaming
    PSI drift monitor (`operators/timeseries.cusum_shift`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.cusum_shift(load_table(spark, sf_dir, "events"))


def o_cusum_shift() -> str:
    return """
WITH base AS (SELECT event_type AS t, ts, event_id,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events),
scored AS (
  SELECT t,
         CAST(row_number() OVER (PARTITION BY t ORDER BY ts, event_id) AS BIGINT) AS i,
         CAST(sum(cents) OVER (PARTITION BY t ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(cents) OVER (PARTITION BY t) AS BIGINT) AS total,
         CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS n
  FROM base
),
st AS (SELECT t, n, i, abs(n * cum - i * total) AS s FROM scored),
g AS (SELECT t, CAST(max(n) AS BIGINT) AS n_events, max(s) AS peak
      FROM st GROUP BY 1),
pk AS (SELECT st.t, g.n_events, CAST(min(st.i) AS BIGINT) AS peak_k, g.peak
       FROM st JOIN g ON st.t = g.t AND st.s = g.peak
       GROUP BY 1, 2, 4)
SELECT t AS event_type, n_events, peak_k,
       CAST(peak AS BIGINT) AS peak_cusum,
       round(peak::DOUBLE / (n_events::DOUBLE * n_events::DOUBLE * 100.0), 6) AS peak_dev
FROM pk
"""


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS test per event series (staged for the
    round-5 rotation): even-vs-odd event ids as the A/A null
    calibration; the statistic is maximized in scaled-integer form so
    peak and location need no float discipline
    (`operators/timeseries.ks_drift`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.ks_drift(load_table(spark, sf_dir, "events"))


def o_ks_drift() -> str:
    return """
WITH base AS (SELECT event_type AS t,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     (event_id % 2 = 0) AS even
              FROM events),
pv AS (SELECT t, cents,
              CAST(sum(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS c1,
              CAST(sum(CASE WHEN NOT even THEN 1 ELSE 0 END) AS BIGINT) AS c2
       FROM base GROUP BY 1, 2),
sc AS (SELECT t, cents,
              CAST(sum(c1) OVER (PARTITION BY t ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
              CAST(sum(c2) OVER (PARTITION BY t ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2,
              CAST(sum(c1) OVER (PARTITION BY t) AS BIGINT) AS n1,
              CAST(sum(c2) OVER (PARTITION BY t) AS BIGINT) AS n2
       FROM pv),
st AS (SELECT t, n1, n2, cents, abs(n2 * cum1 - n1 * cum2) AS s FROM sc),
g AS (SELECT t, CAST(max(n1) AS BIGINT) AS n_even,
             CAST(max(n2) AS BIGINT) AS n_odd, max(s) AS peak
      FROM st GROUP BY 1),
pk AS (SELECT st.t, g.n_even, g.n_odd,
              CAST(min(st.cents) AS BIGINT) AS peak_cents, g.peak
       FROM st JOIN g ON st.t = g.t AND st.s = g.peak
       GROUP BY 1, 2, 3, 5)
SELECT t AS event_type, n_even, n_odd, peak_cents,
       round(peak::DOUBLE / (n_even::DOUBLE * n_odd::DOUBLE), 6) AS ks
FROM pk
"""


def q_arrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor of hourly arrivals per event series (staged for the
    round-5 rotation): variance/mean over observed hours — ≈1 Poisson,
    >1 bursty, <1 scheduled-job metronome; all int64 until one final
    division (`operators/timeseries.arrival_burstiness`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.arrival_burstiness(load_table(spark, sf_dir, "events"))


def o_arrival_burstiness() -> str:
    return """
WITH c AS (
  SELECT event_type AS t, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(c) AS BIGINT) AS n_events,
         CAST(sum(c * c) AS BIGINT) AS q
  FROM c GROUP BY 1
)
SELECT t AS event_type, n_hours, n_events,
       round(n_events::DOUBLE / n_hours::DOUBLE, 6) AS mean_per_hour,
       round((n_hours * q - n_events * n_events)::DOUBLE
             / (n_hours::DOUBLE * n_events::DOUBLE), 6) AS fano
FROM g
"""


def q_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce audit per event type (staged for the round-5 rotation):
    events within 5s of the same user's previous same-type event —
    double-fire inflation; epoch-microsecond integer comparison, no
    timestamp arithmetic crosses the oracle boundary
    (`operators/timeseries.event_debounce`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.event_debounce(load_table(spark, sf_dir, "events"))


def o_event_debounce(gap_us: int = 5_000_000) -> str:
    return f"""
WITH f AS (
  SELECT event_type AS t,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id)
          < {gap_us}) AS dup
  FROM events
),
g AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced
  FROM f GROUP BY 1
)
SELECT t AS event_type, n_events, n_debounced,
       round(n_debounced::DOUBLE / n_events::DOUBLE, 9) AS debounce_rate
FROM g
"""


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion-lag distribution (staged for the
    round-5 rotation): rate plus interpolated lag percentiles from
    exact epoch-microsecond differences — the funnel's time axis and
    the attribution-window sizing input
    (`operators/timeseries.conversion_lag`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.conversion_lag(load_table(spark, sf_dir, "events"))


def o_conversion_lag() -> str:
    return """
WITH f AS (SELECT user_id AS u, CAST(min(epoch_us(ts)) AS BIGINT) AS t0
           FROM events WHERE event_type = 'signup' GROUP BY 1),
c AS (SELECT f.u, CAST(min(epoch_us(e.ts)) - f.t0 AS BIGINT) AS lag_us
      FROM f JOIN events e
        ON e.user_id = f.u AND e.event_type = 'purchase'
       AND epoch_us(e.ts) >= f.t0
      GROUP BY f.u, f.t0),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM f),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_converted,
             round(quantile_cont(lag_us::DOUBLE, 0.5) / 1000000.0, 6) AS p50_lag_s,
             round(quantile_cont(lag_us::DOUBLE, 0.9) / 1000000.0, 6) AS p90_lag_s,
             round(max(lag_us)::DOUBLE / 1000000.0, 6) AS max_lag_s
      FROM c)
SELECT n.n_candidates, s.n_converted,
       round(s.n_converted::DOUBLE / n.n_candidates::DOUBLE, 9) AS conversion_rate,
       s.p50_lag_s, s.p90_lag_s, s.max_lag_s
FROM n CROSS JOIN s
"""


def q_user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy, reduced to the corpus card (staged
    for the round-5 rotation): average Shannon entropy over each user's
    own event-type mix plus the single-behavior share — the bot/script
    detector (`operators/timeseries.user_behavior_entropy`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.user_behavior_entropy(load_table(spark, sf_dir, "events"))


def o_user_behavior_entropy() -> str:
    return """
WITH cell AS (SELECT user_id AS u, event_type AS ty,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2),
pu AS (
  SELECT u, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         sum(c::DOUBLE * ln(c::DOUBLE)) AS s_clnc
  FROM cell GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single_type,
       round(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 9) AS single_share,
       round(sum(ln(n::DOUBLE) - s_clnc / n::DOUBLE) / count(*)::DOUBLE, 6) AS avg_entropy
FROM pu
"""


def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of user lifetimes with right-censoring at
    the corpus horizon (staged for the round-5 rotation): the estimator
    `retention_cohorts` approximates without censoring — survival at
    day probes from the product-limit over exact-integer risk sets
    (`operators/timeseries.km_survival`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.km_survival(load_table(spark, sf_dir, "events"))


def o_km_survival() -> str:
    return """
WITH b AS (SELECT user_id AS u, CAST(min(epoch_us(ts)) AS BIGINT) AS t0,
                  CAST(max(epoch_us(ts)) AS BIGINT) AS t1
           FROM events GROUP BY 1),
h AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS tmax FROM events),
life AS (
  SELECT CASE WHEN t1 <= tmax - 86400000000 THEN t1 - t0 ELSE tmax - t0 END AS d,
         CASE WHEN t1 <= tmax - 86400000000 THEN 1 ELSE 0 END AS e
  FROM b CROSS JOIN h),
durs AS (SELECT d, CAST(count(*) AS BIGINT) AS c, CAST(sum(e) AS BIGINT) AS dd
         FROM life GROUP BY 1),
risk AS (SELECT d, dd,
                CAST(sum(c) OVER (ORDER BY d DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS n_risk
         FROM durs),
fac AS (SELECT d, dd, n_risk,
               ln((n_risk - dd)::DOUBLE) - ln(n_risk::DOUBLE) AS f
        FROM risk WHERE dd > 0),
probes AS (SELECT * FROM (VALUES (7), (14), (21), (28)) AS p(probe_days)),
agg AS (
  SELECT p.probe_days, sum(fac.dd) AS nd, min(n_risk - dd) AS mn, sum(f) AS sf
  FROM probes p LEFT JOIN fac ON fac.d <= CAST(p.probe_days AS BIGINT) * 86400000000
  GROUP BY 1)
SELECT CAST(probe_days AS INTEGER) AS probe_days,
       CAST(coalesce(nd, 0) AS BIGINT) AS n_deaths,
       CASE WHEN nd IS NULL THEN 1.0
            WHEN mn = 0 THEN 0.0
            ELSE round(exp(sf), 6) END AS survival
FROM agg
"""


def q_hourly_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of hourly arrivals (staged for the round-5
    rotation): the daily-seasonality / burst-persistence detector —
    Pearson over exact int64 moments at lags 1, 2, 3, 24
    (`operators/timeseries.hourly_acf`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.hourly_acf(load_table(spark, sf_dir, "events"))


def o_hourly_acf() -> str:
    return """
WITH hrs AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS hi,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
lags AS (SELECT * FROM (VALUES (1), (2), (3), (24)) AS l(lag_hours)),
pairs AS (
  SELECT l.lag_hours, a.c AS x, b.c AS y
  FROM lags l
  JOIN hrs a ON true
  JOIN hrs b ON b.hi = a.hi + CAST(l.lag_hours AS BIGINT)),
g AS (
  SELECT lag_hours, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1)
SELECT CAST(lag_hours AS INTEGER) AS lag_hours, n_pairs,
       round((n_pairs * sxy - sx * sy)::DOUBLE
             / (sqrt((n_pairs * sxx - sx * sx)::DOUBLE)
                * sqrt((n_pairs * syy - sy * sy)::DOUBLE)), 6) AS acf
FROM g
"""


def q_hourly_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-lag cross-correlation of hourly click vs purchase arrivals
    (staged for the round-5 rotation): the funnel lead/lag detector —
    pure int64 Pearson moments per lag, pairs only where both series
    observed the hour (`operators/timeseries.hourly_xcorr`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.hourly_xcorr(load_table(spark, sf_dir, "events"))


def o_hourly_xcorr() -> str:
    return """
WITH hrs AS (
  SELECT event_type AS t,
         CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS hi,
         CAST(count(*) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2),
lags AS (SELECT * FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) AS l(lag_hours)),
pairs AS (
  SELECT l.lag_hours, a.c AS x, b.c AS y
  FROM lags l
  JOIN hrs a ON a.t = 'click'
  JOIN hrs b ON b.t = 'purchase' AND b.hi = a.hi + CAST(l.lag_hours AS BIGINT)),
g AS (
  SELECT lag_hours, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1)
SELECT CAST(lag_hours AS INTEGER) AS lag_hours, n_pairs,
       round((n_pairs * sxy - sx * sy)::DOUBLE
             / (sqrt((n_pairs * sxx - sx * sx)::DOUBLE)
                * sqrt((n_pairs * syy - sy * sy)::DOUBLE)), 6) AS xcorr
FROM g
"""


def q_ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer EWMA (alpha=1/2) over daily revenue (new round 6): the
    sequential recurrence ewma_t = (ewma_{t-1} + x_t) >> 1 on exact
    cents, run as an expression fold over the calendar-bounded day
    series — the state depends on previous OUTPUT, so no window can
    unroll it; the oracle replays the identical recurrence as a
    recursive CTE (`operators/timeseries.ewma_daily_value`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.ewma_daily_value(load_table(spark, sf_dir, "events"))


def o_ewma_daily_value() -> str:
    return """
WITH RECURSIVE daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
idx AS (SELECT di, cents,
               CAST(row_number() OVER (ORDER BY di ASC) AS BIGINT) AS i
        FROM daily),
r AS (
  SELECT i, di, cents, cents AS ewma FROM idx WHERE i = 1
  UNION ALL
  SELECT d.i, d.di, d.cents, CAST((r.ewma + d.cents) >> 1 AS BIGINT)
  FROM r JOIN idx d ON d.i = r.i + 1
)
SELECT di, cents, CAST(ewma AS BIGINT) AS ewma_cents,
       round(ewma::DOUBLE / 100.0, 6) AS ewma
FROM r
"""


def q_revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue drawdown below the running peak (new round 6):
    exact integer cents end to end — cumulative max window over the
    calendar-bounded daily frame
    (`operators/timeseries.revenue_drawdown`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.revenue_drawdown(load_table(spark, sf_dir, "events"))


def o_revenue_drawdown() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
p AS (SELECT di, cents,
             CAST(max(cents) OVER (ORDER BY di ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS peak_cents
      FROM daily)
SELECT di, cents, peak_cents,
       CAST(peak_cents - cents AS BIGINT) AS drawdown_cents
FROM p
"""


def q_interpurchase_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment inter-order gap distribution (staged for the round-5
    rotation): exact day gaps from a total-order lag window; doubled
    median + nearest-rank p90 located on the DISTINCT-gap frame
    (`operators/timeseries.interpurchase_gap`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.interpurchase_gap(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


def o_interpurchase_gap() -> str:
    return """
WITH o AS (SELECT o_custkey, o_orderkey,
                  CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d
           FROM orders),
gp AS (SELECT o_custkey,
              d - lag(d) OVER (PARTITION BY o_custkey
                               ORDER BY d ASC, o_orderkey ASC) AS gap
       FROM o),
gs AS (SELECT c.c_mktsegment AS seg, gp.gap
       FROM gp JOIN customer c ON gp.o_custkey = c.c_custkey
       WHERE gp.gap IS NOT NULL),
vc AS (SELECT seg, gap, CAST(count(*) AS BIGINT) AS c FROM gs GROUP BY 1, 2),
cu AS (SELECT seg, gap, c,
              CAST(sum(c) OVER (PARTITION BY seg ORDER BY gap ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
       FROM vc),
tot AS (SELECT seg, max(cum) AS n, (max(cum) + 1) // 2 AS r1,
               (max(cum) + 2) // 2 AS r2, (9 * max(cum) + 9) // 10 AS r90
        FROM cu GROUP BY 1),
j AS (SELECT cu.seg, tot.n, cum - c AS b, cum, gap, r1, r2, r90
      FROM cu JOIN tot USING (seg)),
g AS (SELECT seg, CAST(max(n) AS BIGINT) AS n_gaps,
             CAST(sum((CASE WHEN b < r1 AND r1 <= cum THEN gap ELSE 0 END)
                      + (CASE WHEN b < r2 AND r2 <= cum THEN gap ELSE 0 END))
                  AS BIGINT) AS m2,
             CAST(sum(CASE WHEN b < r90 AND r90 <= cum THEN gap ELSE 0 END)
                  AS BIGINT) AS p90_days
      FROM j GROUP BY 1)
SELECT seg AS c_mktsegment, n_gaps,
       round(m2::DOUBLE / 2.0, 1) AS median_days, p90_days
FROM g
"""


def q_session_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session depth histogram with bounce share and exact duration
    mass (staged for the round-5 rotation): the gap-parameter
    calibration view over `sessionize`'s output
    (`operators/timeseries.session_depth_hist`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.session_depth_hist(load_table(spark, sf_dir, "events"))


def o_session_depth_hist() -> str:
    # WRAP pattern over the proven sessionize oracle
    return f"""
WITH s AS MATERIALIZED (
  SELECT n_events, end_us - start_us AS dur_us
  FROM ({o_sessionize_events()})),
g AS (
  SELECT CASE WHEN n_events = 1 THEN '1'
              WHEN n_events <= 3 THEN '2-3'
              WHEN n_events <= 7 THEN '4-7'
              ELSE '8+' END AS depth_bucket,
         CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(n_events) AS BIGINT) AS n_events,
         CAST(sum(dur_us) AS BIGINT) AS sum_dur_us
  FROM s GROUP BY 1),
tot AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS t FROM g)
SELECT depth_bucket, n_sessions, n_events, sum_dur_us,
       round(n_sessions::DOUBLE / t::DOUBLE, 9) AS share,
       round(sum_dur_us::DOUBLE / (n_sessions::DOUBLE * 60000000.0), 6)
           AS mean_dur_min
FROM g CROSS JOIN tot
"""


def q_hour_profile_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R^2 of the day x hour-of-day seasonal decomposition of event
    arrivals (staged for the round-5 rotation): completed grid,
    HUGEINT/DECIMAL(38) scaled sums of squares, one double division
    (`operators/timeseries.hour_profile_fit`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.hour_profile_fit(load_table(spark, sf_dir, "events"))


def o_hour_profile_fit() -> str:
    return """
WITH cells AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS di,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hh,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2),
td AS (SELECT di, CAST(sum(o) AS BIGINT) AS t_d FROM cells GROUP BY 1),
hm AS (SELECT hh, CAST(sum(o) AS BIGINT) AS h_h FROM cells GROUP BY 1),
grid AS (
  SELECT td.di, h.hh, CAST(coalesce(cells.o, 0) AS BIGINT) AS o,
         td.t_d, CAST(coalesce(hm.h_h, 0) AS BIGINT) AS h_h
  FROM td CROSS JOIN (SELECT unnest(range(0, 24)) AS hh) h
  LEFT JOIN cells ON cells.di = td.di AND cells.hh = h.hh
  LEFT JOIN hm ON hm.hh = h.hh),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS cc,
               CAST(count(DISTINCT di) AS BIGINT) AS n_days
        FROM grid),
g AS (
  SELECT nn, cc, n_days,
         sum((nn * o - t_d * h_h)::HUGEINT * (nn * o - t_d * h_h)::HUGEINT)
             AS ssres_sc,
         sum((cc * o - nn)::HUGEINT * (cc * o - nn)::HUGEINT) AS sstot_sc
  FROM grid CROSS JOIN tot GROUP BY 1, 2, 3)
SELECT nn AS n_events, n_days, cc AS n_cells,
       CASE WHEN sstot_sc > 0 THEN
         round(1.0 - (cc::HUGEINT * cc::HUGEINT * ssres_sc)::DOUBLE
                     / (nn::HUGEINT * nn::HUGEINT * sstot_sc)::DOUBLE, 6)
       END AS r2_seasonal
FROM g
"""


def q_return_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-lag return probability curve over active user-days (staged
    for the round-5 rotation): lag-k retention with a horizon-
    conditioned base — the habit-period detector
    (`operators/timeseries.return_curve`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.return_curve(load_table(spark, sf_dir, "events"))


def o_return_curve() -> str:
    return """
WITH ud AS (SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS di
            FROM events),
mx AS (SELECT CAST(max(di) AS BIGINT) AS dmax FROM ud),
lags AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS k),
base AS (SELECT a.user_id, a.di AS da, l.k
         FROM ud a CROSS JOIN lags l CROSS JOIN mx
         WHERE a.di + l.k <= mx.dmax),
m AS (SELECT k, CAST(count(*) AS BIGINT) AS n_returned
      FROM base b
      WHERE EXISTS (SELECT 1 FROM ud u
                    WHERE u.user_id = b.user_id AND u.di = b.da + b.k)
      GROUP BY 1),
bg AS (SELECT k, CAST(count(*) AS BIGINT) AS n_base FROM base GROUP BY 1)
SELECT CAST(bg.k AS INTEGER) AS lag_days, bg.n_base,
       CAST(coalesce(m.n_returned, 0) AS BIGINT) AS n_returned,
       round(coalesce(m.n_returned, 0)::DOUBLE / bg.n_base::DOUBLE, 9)
           AS return_rate
FROM bg LEFT JOIN m ON bg.k = m.k
"""


def q_user_lifecycle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle-stage census (single-visit/new/active/dormant) at the
    corpus horizon (staged for the round-5 rotation): pinned CASE
    order, pure epoch-microsecond comparisons
    (`operators/timeseries.user_lifecycle_census`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.user_lifecycle_census(load_table(spark, sf_dir, "events"))


def o_user_lifecycle_census() -> str:
    return """
WITH per AS (SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS first_u,
                    CAST(max(epoch_us(ts)) AS BIGINT) AS last_u,
                    CAST(count(*) AS BIGINT) AS n_ev
             FROM events GROUP BY 1),
mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS tmax FROM events),
st AS (SELECT CASE WHEN n_ev = 1 THEN 'single_visit'
                   WHEN first_u >= tmax - 604800000000 THEN 'new'
                   WHEN last_u >= tmax - 604800000000 THEN 'active'
                   ELSE 'dormant' END AS stage
       FROM per CROSS JOIN mx),
g AS (SELECT stage, CAST(count(*) AS BIGINT) AS n_users FROM st GROUP BY 1),
tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS t FROM g)
SELECT stage, n_users, round(n_users::DOUBLE / t::DOUBLE, 9) AS share
FROM g CROSS JOIN tot
"""


def q_user_activity_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional overdispersion of per-user event counts (staged
    for the round-5 rotation): var/mean = (n*Q - S^2)/(n*S) from exact
    int64 moments plus the top-1 user share
    (`operators/timeseries.user_activity_dispersion`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.user_activity_dispersion(load_table(spark, sf_dir, "events"))


def o_user_activity_dispersion() -> str:
    return """
WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS q, CAST(max(c) AS BIGINT) AS mx
      FROM per)
SELECT n AS n_users, s AS n_events,
       round(s::DOUBLE / n::DOUBLE, 6) AS mean_events,
       round((n * q - s * s)::DOUBLE / (n * s)::DOUBLE, 6) AS dispersion_index,
       round(mx::DOUBLE / s::DOUBLE, 9) AS top1_share
FROM t
"""


def q_coldstart_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold-start rates at the exact horizon midpoint for users and
    event types (staged for the round-5 rotation): second-half
    entities with no first-half history by anti-join
    (`operators/timeseries.coldstart_rates`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.coldstart_rates(load_table(spark, sf_dir, "events"))


def o_coldstart_rates() -> str:
    axis = """
  SELECT '{name}' AS entity,
         (SELECT CAST(count(DISTINCT {col}) AS BIGINT)
          FROM events CROSS JOIN piv WHERE epoch_us(ts) > piv.p) AS n_second,
         (SELECT CAST(count(*) AS BIGINT) FROM
            (SELECT DISTINCT {col} AS k FROM events CROSS JOIN piv
             WHERE epoch_us(ts) > piv.p) s
          WHERE NOT EXISTS
            (SELECT 1 FROM events e CROSS JOIN piv
             WHERE epoch_us(e.ts) <= piv.p AND e.{col} = s.k)) AS n_cold
"""
    return f"""
WITH piv AS (
  SELECT CAST(min(epoch_us(ts)) AS BIGINT)
         + (CAST(max(epoch_us(ts)) AS BIGINT)
            - CAST(min(epoch_us(ts)) AS BIGINT)) // 2 AS p
  FROM events),
u AS ({axis.format(name='user', col='user_id')}),
t AS ({axis.format(name='event_type', col='event_type')}),
b AS (SELECT * FROM u UNION ALL SELECT * FROM t)
SELECT entity, n_second, n_cold,
       round(n_cold::DOUBLE / n_second::DOUBLE, 9) AS cold_rate
FROM b
"""


def q_hour_circular_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular concentration R of each event type's hour-of-day
    profile + modal hour (staged for the round-5 rotation): cos/sin
    enter BOTH engines as driver-computed double literals — no runtime
    libm anywhere
    (`operators/timeseries.hour_circular_concentration`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.hour_circular_concentration(load_table(spark, sf_dir, "events"))


def o_hour_circular_concentration() -> str:
    import math

    cosl = ", ".join(repr(float(math.cos(2.0 * math.pi * h / 24.0))) for h in range(24))
    sinl = ", ".join(repr(float(math.sin(2.0 * math.pi * h / 24.0))) for h in range(24))
    return f"""
WITH g AS (
  SELECT event_type AS t,
         CAST((epoch_us(ts) // 3600000000) % 24 AS INTEGER) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
r AS (SELECT t, h, c,
             [{cosl}][h + 1] AS ch,
             [{sinl}][h + 1] AS sh,
             row_number() OVER (PARTITION BY t ORDER BY c DESC, h ASC) AS rn
      FROM g),
o AS (SELECT t, CAST(sum(c) AS BIGINT) AS n_events,
             sum(c::DOUBLE * ch) AS cc, sum(c::DOUBLE * sh) AS ss,
             CAST(max(CASE WHEN rn = 1 THEN h END) AS INTEGER) AS peak_hour
      FROM r GROUP BY 1)
SELECT t AS event_type, n_events, peak_hour,
       round(sqrt(cc * cc + ss * ss) / n_events::DOUBLE, 6) AS resultant_length
FROM o
"""


def q_conversion_rate_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z of the purchase share across horizon halves
    (staged for the round-5 rotation): pooled-proportion A/B
    arithmetic on exact counts, pinned float order
    (`operators/timeseries.conversion_rate_shift`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.conversion_rate_shift(load_table(spark, sf_dir, "events"))


def o_conversion_rate_shift() -> str:
    return """
WITH piv AS (
  SELECT CAST(min(epoch_us(ts)) AS BIGINT)
         + (CAST(max(epoch_us(ts)) AS BIGINT)
            - CAST(min(epoch_us(ts)) AS BIGINT)) // 2 AS p
  FROM events),
g AS (
  SELECT CAST(sum(CASE WHEN epoch_us(ts) <= p THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN epoch_us(ts) <= p AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS k1,
         CAST(sum(CASE WHEN epoch_us(ts) > p THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN epoch_us(ts) > p AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS k2
  FROM events CROSS JOIN piv)
SELECT n1, k1, n2, k2,
       CASE WHEN n1 > 0 AND n2 > 0 THEN round(k1::DOUBLE / n1::DOUBLE, 9) END
           AS rate_first,
       CASE WHEN n1 > 0 AND n2 > 0 THEN round(k2::DOUBLE / n2::DOUBLE, 9) END
           AS rate_second,
       CASE WHEN n1 > 0 AND n2 > 0
             AND ((k1 + k2)::DOUBLE / (n1::DOUBLE + n2::DOUBLE))
                 * (1.0 - (k1 + k2)::DOUBLE / (n1::DOUBLE + n2::DOUBLE))
                 * (1.0 / n1::DOUBLE + 1.0 / n2::DOUBLE) > 0 THEN
         round((k2::DOUBLE / n2::DOUBLE - k1::DOUBLE / n1::DOUBLE)
               / sqrt(((k1 + k2)::DOUBLE / (n1::DOUBLE + n2::DOUBLE))
                      * (1.0 - (k1 + k2)::DOUBLE / (n1::DOUBLE + n2::DOUBLE))
                      * (1.0 / n1::DOUBLE + 1.0 / n2::DOUBLE)), 6) END AS z
FROM g
"""


def q_anomalous_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 days by absolute deviation from their own weekday's mean
    arrivals (staged for the round-5 rotation): the seasonality-aware
    incident shortlist; rank cut on ROUNDED deviations
    (`operators/timeseries.anomalous_days`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.anomalous_days(load_table(spark, sf_dir, "events"))


def o_anomalous_days() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS di,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1),
d2 AS (SELECT di, o, CAST((di + 4) % 7 AS INTEGER) AS dow FROM daily),
wk AS (SELECT dow, CAST(sum(o) AS BIGINT) AS s_w,
              CAST(count(*) AS BIGINT) AS k_w
       FROM d2 GROUP BY 1),
j AS (SELECT d2.di, d2.dow, d2.o,
             round(wk.s_w::DOUBLE / wk.k_w::DOUBLE, 6) AS weekday_mean,
             round(abs(d2.o::DOUBLE - wk.s_w::DOUBLE / wk.k_w::DOUBLE), 6)
                 AS abs_dev
      FROM d2 JOIN wk USING (dow)),
r AS (SELECT *, CAST(row_number() OVER (ORDER BY abs_dev DESC, di ASC)
                     AS INTEGER) AS rank
      FROM j)
SELECT rank, di AS epoch_day, dow, o AS n_events, weekday_mean, abs_dev
FROM r WHERE rank <= 5
"""


def q_value_wasserstein_timecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-Wasserstein drift between first-half and second-half
    calendar days per event type (new round 7, VERDICT r6 task 7): the
    real before/after deployment cut of `value_wasserstein_drift`'s
    A/A split, same DECIMAL(38,0) exact arithmetic
    (`operators/timeseries.value_wasserstein_timecut`)."""
    from pythonvectordb_spark.operators import timeseries as TS2

    return TS2.value_wasserstein_timecut(load_table(spark, sf_dir, "events"))


def o_value_wasserstein_timecut() -> str:
    return """
WITH b0 AS (SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v,
                   CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di
            FROM events),
mid AS (SELECT CAST((min(di) + max(di) + 1) // 2 AS BIGINT) AS mid_di FROM b0),
base AS (SELECT t, v, di < mid_di AS even FROM b0 CROSS JOIN mid),
pv AS (SELECT t, v,
              CAST(sum(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS ce,
              CAST(sum(CASE WHEN even THEN 0 ELSE 1 END) AS BIGINT) AS co
       FROM base GROUP BY 1, 2),
cur AS (SELECT t, v,
               CAST(sum(ce) OVER w AS BIGINT) AS cume,
               CAST(sum(co) OVER w AS BIGINT) AS cumo,
               CAST(sum(ce) OVER (PARTITION BY t) AS BIGINT) AS ne,
               CAST(sum(co) OVER (PARTITION BY t) AS BIGINT) AS no,
               lead(v) OVER (PARTITION BY t ORDER BY v ASC) AS vnext
        FROM pv
        WINDOW w AS (PARTITION BY t ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
g AS (SELECT t, CAST(max(ne) AS BIGINT) AS n_before,
             CAST(max(no) AS BIGINT) AS n_after,
             sum(CASE WHEN vnext IS NOT NULL THEN
                   CAST(vnext - v AS HUGEINT)
                   * CAST(abs(no * cume - ne * cumo) AS HUGEINT)
                 END) AS num
      FROM cur GROUP BY 1)
SELECT t AS event_type, n_before, n_after,
       CASE WHEN n_before > 0 AND n_after > 0 THEN
         round(coalesce(num::DOUBLE / (n_before::DOUBLE * n_after::DOUBLE), 0.0), 6)
       END AS w1_cents
FROM g
"""


def q_hellinger_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance between first-half and second-half day
    value-bucket distributions per event type (new round 7): the
    bounded [0,1] member of the drift family next to KS and W1
    (`operators/timeseries.hellinger_value_drift`)."""
    from pythonvectordb_spark.operators import timeseries as TS2

    return TS2.hellinger_value_drift(load_table(spark, sf_dir, "events"))


def o_hellinger_value_drift() -> str:
    return """
WITH b0 AS (SELECT event_type AS t,
                   CAST(round(value * 100) AS BIGINT) // 10000 AS bkt,
                   CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di
            FROM events),
mid AS (SELECT CAST((min(di) + max(di) + 1) // 2 AS BIGINT) AS mid_di FROM b0),
base AS (SELECT t, bkt, di < mid_di AS before FROM b0 CROSS JOIN mid),
per AS (SELECT t, bkt,
               CAST(sum(CASE WHEN before THEN 1 ELSE 0 END) AS BIGINT) AS cb,
               CAST(sum(CASE WHEN before THEN 0 ELSE 1 END) AS BIGINT) AS ca
        FROM base GROUP BY 1, 2),
g AS (SELECT t, CAST(sum(cb) AS BIGINT) AS n_before,
             CAST(sum(ca) AS BIGINT) AS n_after,
             sum(sqrt((cb * ca)::DOUBLE)) AS s,
             CAST(count(*) AS BIGINT) AS n_buckets
      FROM per GROUP BY 1)
SELECT t AS event_type, n_before, n_after, n_buckets,
       round(s / sqrt(n_before::DOUBLE * n_after::DOUBLE), 6) AS bhattacharyya,
       round(sqrt(greatest(0.0, 1.0 - s / sqrt(n_before::DOUBLE * n_after::DOUBLE))), 6)
         AS hellinger
FROM g
"""


def q_gpd_tail_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold GPD tail fit per event type (new round 7):
    method-of-moments xi/beta over q95 exceedances and the
    1000-observation return level — the exceedance companion to
    `daily_max_gumbel` (`operators/timeseries.gpd_tail_fit`)."""
    from pythonvectordb_spark.operators import timeseries as TS2

    return TS2.gpd_tail_fit(load_table(spark, sf_dir, "events"))


def o_gpd_tail_fit() -> str:
    return """
WITH base AS (SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v
              FROM events),
thr AS (SELECT t, quantile_cont(v::DOUBLE, 0.95) AS u,
               CAST(count(*) AS BIGINT) AS n
        FROM base GROUP BY 1),
exc AS (SELECT b.t, thr.n, thr.u, b.v::DOUBLE - thr.u AS y
        FROM base b JOIN thr ON b.t = thr.t WHERE b.v::DOUBLE > thr.u),
g AS (SELECT t, n, u, CAST(count(*) AS BIGINT) AS n_exc,
             sum(y) AS sy, sum(y * y) AS syy
      FROM exc GROUP BY 1, 2, 3),
c AS (SELECT t, n, u, n_exc,
             sy / n_exc::DOUBLE AS m,
             (syy - sy * sy / n_exc::DOUBLE) / (n_exc::DOUBLE - 1.0) AS s2
      FROM g),
e AS (SELECT t, n, u, n_exc, m, s2,
             0.5 * (1.0 - m * m / s2) AS xi,
             0.5 * m * (m * m / s2 + 1.0) AS beta,
             n_exc::DOUBLE / n::DOUBLE AS zeta
      FROM c)
SELECT t AS event_type, n, n_exc, round(u, 6) AS u_cents,
       CASE WHEN n_exc > 1 AND s2 > 0.0 AND xi != 0.0
            THEN round(xi, 6) END AS gpd_xi,
       CASE WHEN n_exc > 1 AND s2 > 0.0 AND xi != 0.0
            THEN round(beta, 6) END AS gpd_beta,
       CASE WHEN n_exc > 1 AND s2 > 0.0 AND xi != 0.0
            THEN round(u + (beta / xi) * (pow(1000.0 * zeta, xi) - 1.0), 6)
            END AS rl1000_cents
FROM e
"""


def q_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank changepoint on daily revenue (new round 7): exact
    doubled-midrank algebra collapses the O(n^2) sgn double sum to one
    cumulative window — U_t, K, the break day and the classic
    2*exp(-6K^2/(n^3+n^2)) approximation
    (`operators/timeseries.pettitt_changepoint`)."""
    from pythonvectordb_spark.operators import timeseries as TS7

    return TS7.pettitt_changepoint(load_table(spark, sf_dir, "events"))


def o_pettitt_changepoint() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
gv AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM daily GROUP BY 1),
mr AS (SELECT cents,
              CAST(2 * (sum(cnt) OVER (ORDER BY cents ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
                   + cnt + 1 AS BIGINT) AS mr2
       FROM gv),
cum AS (SELECT di,
               CAST(row_number() OVER (ORDER BY di ASC) AS BIGINT) AS t,
               CAST(sum(mr2) OVER (ORDER BY di ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_mr2,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM daily JOIN mr USING (cents)),
u AS (SELECT di, t, n, CAST(cum_mr2 - t * (n + 1) AS BIGINT) AS u_t
      FROM cum WHERE t < n),
best AS (SELECT * FROM u ORDER BY abs(u_t) DESC, di ASC LIMIT 1)
SELECT n AS n_days, CAST(abs(u_t) AS BIGINT) AS k_stat, di AS changepoint_di,
       u_t AS u_at_change,
       round(least(1.0, 2.0 * exp(-6.0 * abs(u_t)::DOUBLE * abs(u_t)::DOUBLE
                 / (n::DOUBLE * n::DOUBLE * n::DOUBLE + n::DOUBLE * n::DOUBLE))),
             6) AS p_approx
FROM best
"""


def q_dow_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of daily revenue (new round
    7): centered 7-day MA trend kept exact by never dividing
    (detr7 = 7*cents - sum7), per-dow seasonal means and within-dow
    spreads from exact integer moments
    (`operators/timeseries.dow_seasonal_decomposition`)."""
    from pythonvectordb_spark.operators import timeseries as TS7

    return TS7.dow_seasonal_decomposition(load_table(spark, sf_dir, "events"))


def o_dow_seasonal_decomposition() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
win AS (SELECT di, cents,
               CAST(sum(cents) OVER w7 AS BIGINT) AS sum7,
               CAST(count(*) OVER w7 AS BIGINT) AS cnt7,
               CAST(max(di) OVER w7 - min(di) OVER w7 AS BIGINT) AS span7
        FROM daily
        WINDOW w7 AS (ORDER BY di ASC ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
detr AS (SELECT CAST(di % 7 AS BIGINT) AS dow,
                CAST(7 * cents - sum7 AS BIGINT) AS d7
         FROM win WHERE cnt7 = 7 AND span7 = 6),
g AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(d7) AS BIGINT) AS s, CAST(sum(d7 * d7) AS BIGINT) AS ss
      FROM detr GROUP BY 1)
SELECT dow, n_days,
       round(s::DOUBLE / n_days::DOUBLE / 700.0, 6) AS seasonal,
       CASE WHEN n_days > 1 THEN
         round(sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n_days::DOUBLE)
                    / (n_days::DOUBLE - 1.0)) / 700.0, 6) END AS within_sd
FROM g
"""


def q_ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness test, lags 1..7, on daily
    revenue (new round 7): exact DECIMAL(38,0) autocovariances of the
    n-scaled centered series, one double division per lag, Q as a
    single 7-term expression (`operators/timeseries.ljung_box_daily`)."""
    from pythonvectordb_spark.operators import timeseries as TS7

    return TS7.ljung_box_daily(load_table(spark, sf_dir, "events"))


def o_ljung_box_daily() -> str:
    # zero-variance guard mirrors the Spark side (timeseries.py `live`):
    # a constant series has g0 = 0 -> every rho, q_lb and crossed_99 NULL
    rho = "\n".join(
        f"  CASE WHEN g0 > 0 THEN g{k}::DOUBLE / g0::DOUBLE END AS r{k},"
        for k in range(1, 8)
    )
    qterms = " + ".join(f"r{k} * r{k} / (nd - {float(k)!r})" for k in range(1, 8))
    lags = ",\n".join(
        f"       lag(z, {k}) OVER (ORDER BY di ASC) AS z{k}" for k in range(1, 8)
    )
    gsums = ",\n".join(
        f"       sum(z * z{k}) AS g{k}" for k in range(1, 8)
    )
    return f"""
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
base AS (SELECT di,
                CAST(count(*) OVER () AS BIGINT) AS n,
                CAST(CAST(count(*) OVER () AS BIGINT) * cents
                     - CAST(sum(cents) OVER () AS BIGINT) AS HUGEINT) AS z
         FROM daily),
lagged AS (SELECT di, n, z,
{lags}
           FROM base),
agg AS (SELECT n, sum(z * z) AS g0,
{gsums}
        FROM lagged GROUP BY 1),
r AS (SELECT n, n::DOUBLE AS nd,
{rho}
             g0
      FROM agg)
SELECT n AS n_days,
       {", ".join(f"round(r{k}, 6) AS rho{k}" for k in range(1, 8))},
       round(nd * (nd + 2.0) * (0.0 + {qterms}), 6) AS q_lb,
       CASE WHEN g0 > 0 THEN
         CAST(CASE WHEN nd * (nd + 2.0) * (0.0 + {qterms}) > 18.475307
              THEN 1 ELSE 0 END AS BIGINT)
       END AS crossed_99
FROM r
"""


def q_logrank_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test on time-to-second-order, BUILDING vs
    MACHINERY (new round 7): exact at-risk/death counts per event time
    by cumulative subtraction, per-time hypergeometric E and V summed
    to the chi2(1) statistic
    (`operators/timeseries.logrank_segments`)."""
    from pythonvectordb_spark.operators import timeseries as TS7

    return TS7.logrank_segments(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


def o_logrank_segments() -> str:
    def risk(seg: str, sfx: str) -> str:
        return f"""
byt_{sfx} AS (SELECT time, CAST(count(*) AS BIGINT) AS c_all,
                     CAST(sum(event) AS BIGINT) AS c_ev
              FROM subj WHERE g = '{seg}' GROUP BY 1),
grid_{sfx} AS (SELECT time FROM times UNION SELECT time FROM byt_{sfx}),
r_{sfx} AS (SELECT g.time,
                   coalesce(b.c_ev, 0)::BIGINT AS d_{sfx},
                   CAST(sum(coalesce(b.c_all, 0)) OVER ()
                        - (sum(coalesce(b.c_all, 0)) OVER (ORDER BY g.time ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - coalesce(b.c_all, 0)) AS BIGINT) AS r_{sfx}
            FROM grid_{sfx} g LEFT JOIN byt_{sfx} b USING (time)),
ev_{sfx} AS (SELECT r_{sfx}.* FROM r_{sfx} JOIN times USING (time))"""

    return f"""
WITH seg AS (SELECT c_custkey AS ck, c_mktsegment AS g FROM customer
             WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
f AS (SELECT o_custkey AS ck, o_orderdate AS d,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
      FROM orders),
firsts AS (SELECT ck, min(CASE WHEN rn = 1 THEN d END) AS d1,
                  min(CASE WHEN rn = 2 THEN d END) AS d2
           FROM f WHERE rn <= 2 GROUP BY 1),
hz AS (SELECT max(o_orderdate) AS dmax FROM orders),
subj AS (SELECT g,
                CAST(CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
                     ELSE date_diff('day', d1, dmax) END AS BIGINT) AS time,
                CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS event
         FROM seg JOIN firsts USING (ck) CROSS JOIN hz),
times AS (SELECT DISTINCT time FROM subj WHERE event = 1),{risk("BUILDING", "a")},{risk("MACHINERY", "b")},
joined AS (SELECT ev_a.time, d_a, r_a, d_b, r_b
           FROM ev_a JOIN ev_b USING (time)),
terms AS (SELECT d_a, d_b, r_a, r_b,
                 (d_a + d_b)::DOUBLE AS d, r_a::DOUBLE AS ra, r_b::DOUBLE AS rb
          FROM joined),
ncnt AS (SELECT CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
         FROM subj),
tot AS (SELECT CAST(sum(d_a) AS BIGINT) AS events_a,
               CAST(sum(d_b) AS BIGINT) AS events_b,
               sum(d_a::DOUBLE - d * ra / (ra + rb)) AS ome,
               sum(CASE WHEN ra + rb > 1.0 THEN
                     d * (ra / (ra + rb)) * (rb / (ra + rb))
                       * (ra + rb - d) / (ra + rb - 1.0)
                   ELSE 0.0 END) AS vs
        FROM terms)
SELECT 'BUILDING' AS segment_a, 'MACHINERY' AS segment_b, n_a, n_b,
       events_a, events_b,
       round(ome, 6) AS o_minus_e, round(vs, 6) AS var_logrank,
       CASE WHEN vs > 0 THEN round(ome * ome / vs, 6) END AS z2_logrank,
       CASE WHEN vs > 0 THEN
         CAST(CASE WHEN ome * ome / vs > 6.634897 THEN 1 ELSE 0 END AS BIGINT)
       END AS crossed_99
FROM tot CROSS JOIN ncnt
"""
