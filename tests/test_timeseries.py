"""Edge-case semantics of the time-series operators (constructed frames;
the sf0.001 DuckDB hash-match lives in test_oracle_parity)."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pythonvectordb_spark.operators import timeseries as TS

_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _events(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_asof_equal_ts_is_inclusive_and_no_prior_is_null(spark):
    left = _events(
        spark,
        [
            (1, _t(0), 7, "purchase", 1.0),   # before any click -> NULL
            (2, _t(10), 7, "purchase", 1.0),  # ts == click ts -> inclusive match
            (3, _t(20), 7, "purchase", 1.0),  # after both clicks -> newest (id 102)
            (4, _t(5), 8, "purchase", 1.0),   # other user: no clicks at all
        ],
    )
    right = _events(
        spark,
        [
            (101, _t(10), 7, "click", 0.0),
            (102, _t(12), 7, "click", 0.0),
        ],
    ).select("user_id", "ts", F.col("event_id").alias("click_id"))
    out = TS.asof_join(
        left, right, key="user_id", payload_cols=["click_id"], tiebreak="click_id"
    )
    got = {r["event_id"]: r["click_id_asof"] for r in out.collect()}
    assert got == {1: None, 2: 101, 3: 102, 4: None}


def test_asof_tiebreak_picks_larger_id_at_equal_ts(spark):
    left = _events(spark, [(1, _t(10), 7, "purchase", 1.0)])
    right = _events(
        spark,
        [(201, _t(10), 7, "click", 0.0), (205, _t(10), 7, "click", 0.0)],
    ).select("user_id", "ts", F.col("event_id").alias("click_id"))
    out = TS.asof_join(
        left, right, key="user_id", payload_cols=["click_id"], tiebreak="click_id"
    )
    assert out.collect()[0]["click_id_asof"] == 205


def test_sessionize_splits_on_gap_boundary(spark):
    # gap = 30 min; events at 0, 29, 59 are ONE session (29/30-min steps,
    # strictly-greater-than comparison), then 90 starts a second session.
    ev = _events(
        spark,
        [
            (1, _t(0), 7, "view", 1.25),
            (2, _t(29), 7, "view", 2.00),
            (3, _t(59), 7, "view", 0.75),
            (4, dt.datetime(2024, 1, 1, 1, 30), 7, "view", 1.00),
        ],
    )
    rows = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["value_cents"])
        for r in TS.sessionize(ev, gap_minutes=30).collect()
    }
    assert rows == {(7, 1): (3, 400), (7, 2): (1, 100)}


def test_moving_window_range_frame_is_time_based_not_row_based(spark):
    # 60-min trailing frame: event at minute 61 excludes minute 0 even
    # though it is only 2 rows back.
    ev = _events(
        spark,
        [
            (1, _t(0), 7, "view", 1.0),
            (2, _t(59), 7, "view", 1.0),
            (3, dt.datetime(2024, 1, 1, 1, 1), 7, "view", 1.0),
        ],
    )
    got = {
        r["event_id"]: r["n_trailing"]
        for r in TS.moving_window_stats(ev, window_minutes=60).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2}


def test_cusum_shift_finds_planted_step(spark):
    """A 0->10 step at the midpoint peaks the CUSUM statistic exactly
    there; a constant series peaks at zero."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import cusum_shift

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "step", 0.0 if i < 4 else 10.0, "{}")
        for i in range(8)
    ] + [
        (100 + i, t0 + dt.timedelta(minutes=i), 1, "flat", 5.0, "{}")
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["event_type"]: r.asDict() for r in cusum_shift(df).collect()}
    s = got["step"]
    # n=8, total=4000 cents; peak S = |8*0 - 4*4000| = 16000 at i=4
    assert s["n_events"] == 8 and s["peak_k"] == 4 and s["peak_cusum"] == 16000
    assert s["peak_dev"] == round(16000 / (64 * 100.0), 6)
    f = got["flat"]
    assert f["peak_cusum"] == 0 and f["peak_k"] == 1 and f["peak_dev"] == 0.0


def test_ks_drift_detects_disjoint_and_identical(spark):
    """Disjoint even/odd value supports give KS = 1 at the boundary;
    identical supports give KS = 0."""
    rows = []
    # 'shift': evens all 1.00, odds all 9.00 -> KS = 1 at 100 cents
    for i in range(8):
        rows.append((i, "shift", 1.0 if i % 2 == 0 else 9.0))
    # 'same': evens and odds both alternate 2.00/4.00 -> KS = 0
    for i in range(8):
        rows.append((100 + i, "same", 2.0 if i % 4 < 2 else 4.0))
    from pythonvectordb_spark.operators.timeseries import ks_drift

    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r["event_type"]: r.asDict() for r in ks_drift(df).collect()}
    s = got["shift"]
    assert s["n_even"] == 4 and s["n_odd"] == 4
    assert s["ks"] == 1.0 and s["peak_cents"] == 100
    assert got["same"]["ks"] == 0.0


def test_arrival_burstiness_poisson_vs_burst(spark):
    """All events in one hour maximize the Fano factor; one event per
    hour gives variance 0."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import arrival_burstiness

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "burst", 1.0, "{}") for i in range(6)] + [
        (100 + i, t0 + dt.timedelta(hours=i), 1, "flat", 1.0, "{}") for i in range(6)
    ]
    # give 'burst' a second observed hour so variance is defined
    rows += [(200, t0 + dt.timedelta(hours=1), 1, "burst", 1.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["event_type"]: r.asDict() for r in arrival_burstiness(df).collect()}
    b = got["burst"]  # hours (6,1): H=2, S=7, Q=37 -> fano=(74-49)/14
    assert b["n_hours"] == 2 and b["n_events"] == 7
    assert b["fano"] == round(25 / 14, 6)
    f = got["flat"]  # six hours of exactly one -> fano 0
    assert f["n_hours"] == 6 and f["fano"] == 0.0


def test_event_type_affinity_lift(spark):
    """Types that always co-occur get lift N/(n_a*n_b)*n_both > 1;
    disjoint types never pair."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import event_type_affinity

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # users 1,2: click+buy together; users 3,4: only view
    for u in (1, 2):
        rows += [(len(rows), t0, u, "click", 1.0, "{}"), (len(rows) + 100, t0, u, "buy", 1.0, "{}")]
    for u in (3, 4):
        rows += [(len(rows) + 200, t0, u, "view", 1.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {(r["type_a"], r["type_b"]): r.asDict() for r in event_type_affinity(df).collect()}
    assert set(got) == {("buy", "click")}
    r = got[("buy", "click")]
    assert r["n_both"] == 2 and r["n_a"] == 2 and r["n_b"] == 2
    assert r["lift"] == 2.0 and r["support"] == 0.5


def test_event_debounce_flags_rapid_repeats(spark):
    """Same user+type 1s apart is debounced; 10s apart is not; the
    first event of a window never is; other users/types don't
    interact."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import event_debounce

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(seconds=1), 1, "click", 1.0, "{}"),   # debounced
        (2, t0 + dt.timedelta(seconds=11), 1, "click", 1.0, "{}"),  # not
        (3, t0 + dt.timedelta(seconds=1), 2, "click", 1.0, "{}"),   # other user
        (4, t0 + dt.timedelta(seconds=2), 1, "view", 1.0, "{}"),    # other type
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["event_type"]: r.asDict() for r in event_debounce(df).collect()}
    assert got["click"]["n_events"] == 4 and got["click"]["n_debounced"] == 1
    assert got["click"]["debounce_rate"] == 0.25
    assert got["view"]["n_debounced"] == 0


def test_conversion_lag_first_purchase_after_signup(spark):
    """Lag measures first purchase AT OR AFTER the first signup;
    earlier purchases don't count; never-converting users dilute the
    rate only."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import conversion_lag

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "signup", 1.0, "{}"),
        (1, t0 + dt.timedelta(seconds=30), 1, "purchase", 1.0, "{}"),
        (2, t0 + dt.timedelta(seconds=90), 1, "purchase", 1.0, "{}"),  # not first
        (3, t0 - dt.timedelta(seconds=5), 2, "purchase", 1.0, "{}"),   # pre-signup
        (4, t0, 2, "signup", 1.0, "{}"),
        (5, t0, 3, "signup", 1.0, "{}"),
        (6, t0 + dt.timedelta(seconds=10), 3, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    (r,) = conversion_lag(df).collect()
    assert r["n_candidates"] == 3 and r["n_converted"] == 2
    assert r["conversion_rate"] == round(2 / 3, 9)
    # lags: 30s and 10s -> p50 interpolates to 20s, max 30s
    assert r["p50_lag_s"] == 20.0 and r["max_lag_s"] == 30.0


def test_user_behavior_entropy_extremes(spark):
    """A one-behavior user contributes H=0 and counts as single-type; a
    50/50 user contributes ln(2)."""
    import datetime as dt
    import math

    from pythonvectordb_spark.operators.timeseries import user_behavior_entropy

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "click", 1.0, "{}") for i in range(4)]          # H=0
    rows += [(10 + i, t0, 2, "click" if i % 2 == 0 else "view", 1.0, "{}") for i in range(4)]  # H=ln2
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    (r,) = user_behavior_entropy(df).collect()
    assert r["n_users"] == 2 and r["n_single_type"] == 1
    assert r["single_share"] == 0.5
    assert r["avg_entropy"] == round(math.log(2) / 2, 6)


def test_km_survival_hand_computed(spark):
    """3 users, horizon at u3's last event, censor 1 day: u1 dies at
    2d, u2 dies at 5d, u3 censored. S(7d) = (1-1/3)(1-1/2) = 1/3; at
    the 1-day probe nobody has died yet so S=1."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import km_survival

    t0 = dt.datetime(2024, 1, 1)
    d = dt.timedelta
    rows = [
        (0, t0, 1, "click", 1.0, "{}"),
        (1, t0 + d(days=2), 1, "click", 1.0, "{}"),      # u1 lifetime 2d, dies
        (2, t0, 2, "click", 1.0, "{}"),
        (3, t0 + d(days=5), 2, "click", 1.0, "{}"),      # u2 lifetime 5d, dies
        (4, t0, 3, "click", 1.0, "{}"),
        (5, t0 + d(days=10), 3, "click", 1.0, "{}"),     # u3 at horizon: censored
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        r["probe_days"]: r
        for r in km_survival(df, probe_days=(1, 3, 7)).collect()
    }
    assert got[1]["n_deaths"] == 0 and got[1]["survival"] == 1.0
    assert got[3]["n_deaths"] == 1 and got[3]["survival"] == round(2 / 3, 6)
    assert got[7]["n_deaths"] == 2 and got[7]["survival"] == round(1 / 3, 6)


def test_km_survival_risk_set_dies_out(spark):
    """If every remaining at-risk user dies at the last death time the
    factor would be ln(0): survival must pin to exactly 0 instead."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import km_survival

    t0 = dt.datetime(2024, 1, 1)
    d = dt.timedelta
    rows = [
        (0, t0, 1, "click", 1.0, "{}"),
        (1, t0 + d(days=1), 1, "click", 1.0, "{}"),   # dies at 1d
        (2, t0, 2, "click", 1.0, "{}"),
        (3, t0 + d(days=1), 2, "click", 1.0, "{}"),   # dies at 1d
        # horizon event from a user whose whole life IS the horizon tail:
        (4, t0 + d(days=10) - d(seconds=30), 3, "click", 1.0, "{}"),
        (5, t0 + d(days=10), 3, "click", 1.0, "{}"),
    ]
    # u3 lifetime 30s censored (last event at horizon); u1/u2 die at 1d;
    # at t=1d the risk set is {u1,u2} (u3's 30s lifetime < 1d leaves the
    # risk set before the death time), so n=d=2 -> S=0
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    (r,) = km_survival(df, probe_days=(7,)).collect()
    assert r["n_deaths"] == 2 and r["survival"] == 0.0


def test_hourly_acf_alternating_series(spark):
    """A strictly alternating 1,3,1,3,... hourly series has acf(1) = -1
    and acf(2) = +1 exactly."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import hourly_acf

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(8):
        for _ in range(1 if h % 2 == 0 else 3):
            rows.append((eid, t0 + dt.timedelta(hours=h, minutes=5), 1, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["lag_hours"]: r for r in hourly_acf(df, lags=(1, 2)).collect()}
    assert got[1]["n_pairs"] == 7 and got[1]["acf"] == -1.0
    assert got[2]["n_pairs"] == 6 and got[2]["acf"] == 1.0


def test_hourly_xcorr_shifted_series(spark):
    """Purchases replay the click series shifted one hour later: the
    cross-correlation is exactly +1 at lag +1 and -1 at lag 0 (the
    alternating pattern anti-aligns unshifted)."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import hourly_xcorr

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(8):
        c = 1 if h % 2 == 0 else 3
        for _ in range(c):
            rows.append((eid, t0 + dt.timedelta(hours=h, minutes=5), 1, "click", 1.0, "{}"))
            eid += 1
        for _ in range(c):
            rows.append(
                (eid, t0 + dt.timedelta(hours=h + 1, minutes=10), 1, "purchase", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["lag_hours"]: r for r in hourly_xcorr(df, lags=(0, 1)).collect()}
    assert got[1]["n_pairs"] == 8 and got[1]["xcorr"] == 1.0
    assert got[0]["n_pairs"] == 7 and got[0]["xcorr"] == -1.0


def test_runs_test_hand_computed(spark):
    """Daily counts 5,5,1,1,5,1 (median band 2c vs m2=6): signs
    + + - - + - give 4 runs, n1=n2=3, E[R]=4, z=0."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import runs_test

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d, c in enumerate([5, 5, 1, 1, 5, 1]):
        for _ in range(c):
            rows.append((eid, t0 + dt.timedelta(days=d, hours=3), 1, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    (r,) = runs_test(df).collect()
    assert r["n_above"] == 3 and r["n_below"] == 3
    assert r["runs"] == 4
    assert r["expected_runs"] == 4.0 and r["z"] == 0.0


def test_runs_test_one_sided_is_null(spark):
    """All days share the same count: every day ties the median and is
    dropped — zero usable days on each side, z and E[R] are NULL."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import runs_test

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (d, t0 + dt.timedelta(days=d, hours=1), 1, "click", 1.0, "{}")
        for d in range(4)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    (r,) = runs_test(df).collect()
    assert r["n_above"] == 0 and r["n_below"] == 0 and r["runs"] == 0
    assert r["expected_runs"] is None and r["z"] is None


def test_markov_entropy_rate_extremes(spark):
    """A deterministic alternating chain (a->b->a->b) has
    H(next|cur) = 0 and memory_coef = 1; an i.i.d.-looking chain where
    each state leads to both states equally has H(next|cur) = H(next)
    and memory_coef = 0."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import markov_entropy_rate

    t0 = dt.datetime(2024, 1, 1)

    def mk(seq):
        return spark.createDataFrame(
            [
                (i, t0 + dt.timedelta(minutes=i), 1, s, 1.0, "{}")
                for i, s in enumerate(seq)
            ],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )

    (r,) = markov_entropy_rate(mk(["a", "b"] * 5)).collect()
    assert r["n_transitions"] == 9
    assert r["h_cond"] == 0.0 and r["memory_coef"] == 1.0
    # a a b b a a b b ... : from 'a' -> {a: half, b: half}, same from 'b'
    (r,) = markov_entropy_rate(mk(["a", "a", "b", "b"] * 4 + ["a"])).collect()
    assert r["h_cond"] == r["h_next"] and r["memory_coef"] == 0.0


def test_interpurchase_gap_hand_computed(spark):
    """One customer ordering on days 0, 10, 20, 50: gaps 10, 10, 30 ->
    median 10.0, p90 = nearest-rank ceil(2.7) = 3rd value = 30."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import interpurchase_gap

    t0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(k, 1, t0 + dt.timedelta(days=d)) for k, d in [(1, 0), (2, 10), (3, 20), (4, 50)]],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    customer = spark.createDataFrame(
        [(1, "BUILDING")], "c_custkey long, c_mktsegment string"
    )
    (r,) = interpurchase_gap(orders, customer).collect()
    assert r["c_mktsegment"] == "BUILDING" and r["n_gaps"] == 3
    assert r["median_days"] == 10.0 and r["p90_days"] == 30


def test_session_depth_hist_buckets(spark):
    """One 1-event session, one 3-event session, one 8-event session:
    buckets 1 / 2-3 / 8+ each hold one session; shares sum to 1; the
    bounce bucket has zero duration."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import session_depth_hist

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 1, "click", 1.0, "{}")]
    rows += [
        (10 + i, t0 + dt.timedelta(minutes=i), 2, "click", 1.0, "{}") for i in range(3)
    ]
    rows += [
        (20 + i, t0 + dt.timedelta(minutes=i), 3, "click", 1.0, "{}") for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["depth_bucket"]: r for r in session_depth_hist(df).collect()}
    assert set(got) == {"1", "2-3", "8+"}
    assert got["1"]["n_sessions"] == 1 and got["1"]["sum_dur_us"] == 0
    assert got["2-3"]["n_events"] == 3
    assert got["8+"]["mean_dur_min"] == 7.0
    # each share is rounded to 9dp, so the sum is 1 only up to 3 ulps
    assert abs(sum(r["share"] for r in got.values()) - 1.0) < 1e-8


def test_weekday_uniformity_extremes(spark):
    """All orders on one weekday: chi^2 = (7N^2 - N^2)/N = 6N; a
    perfectly uniform week has chi^2 = 0."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import weekday_uniformity

    t0 = dt.datetime(2024, 1, 1)  # a Monday
    one_day = spark.createDataFrame(
        [(k, t0 + dt.timedelta(weeks=k)) for k in range(7)],
        "o_orderkey long, o_orderdate timestamp",
    )
    (r,) = weekday_uniformity(one_day).collect()
    assert r["n_rows"] == 7 and r["chisq"] == 42.0 and r["max_day_share"] == 1.0
    uniform = spark.createDataFrame(
        [(k, t0 + dt.timedelta(days=k)) for k in range(14)],
        "o_orderkey long, o_orderdate timestamp",
    )
    (r,) = weekday_uniformity(uniform).collect()
    assert r["chisq"] == 0.0
    assert r["min_day_share"] == r["max_day_share"]


def test_yearly_value_quartiles_hand_computed(spark):
    """Four orders in one year valued 1/2/3/4: nearest-rank quartiles
    are the 1st, 2nd, and 3rd order statistics."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import yearly_value_quartiles

    t0 = dt.datetime(2024, 3, 1)
    orders = spark.createDataFrame(
        [(k, t0, float(k)) for k in (1, 2, 3, 4)],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    (r,) = yearly_value_quartiles(orders).collect()
    assert r["order_year"] == 2024 and r["n_orders"] == 4
    assert (r["q1_cents"], r["q2_cents"], r["q3_cents"]) == (100, 200, 300)


def test_hour_profile_fit_extremes(spark):
    """A series that is EXACTLY day-volume x hour-profile separable has
    R^2 = 1; a perfectly uniform grid has zero total variance -> NULL."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import hour_profile_fit

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # separable: day factor (1, 2) x hour factor (3 at 00h, 1 at 01h)
    for d, df_ in enumerate([1, 2]):
        for h, hf in [(0, 3), (1, 1)]:
            for _ in range(df_ * hf):
                rows.append((eid, t0 + dt.timedelta(days=d, hours=h, minutes=5), 1, "x", 1.0, "{}"))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    (r,) = hour_profile_fit(df).collect()
    assert r["n_days"] == 2 and r["n_cells"] == 48
    assert r["r2_seasonal"] == 1.0
    flat = spark.createDataFrame(
        [
            (i, t0 + dt.timedelta(days=i // 24, hours=i % 24), 1, "x", 1.0, "{}")
            for i in range(48)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    (r,) = hour_profile_fit(flat).collect()
    assert r["r2_seasonal"] is None


def test_return_curve_hand_computed(spark):
    """One user active on days 0,1,2 (horizon day 2): lag-1 base is
    days {0,1}, both return (rate 1); lag-2 base is {0}, returns."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import return_curve

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (d, t0 + dt.timedelta(days=d, hours=2), 1, "click", 1.0, "{}")
        for d in (0, 1, 2)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["lag_days"]: r for r in return_curve(df, max_lag_days=3).collect()}
    assert got[1]["n_base"] == 2 and got[1]["n_returned"] == 2
    assert got[1]["return_rate"] == 1.0
    assert got[2]["n_base"] == 1 and got[2]["n_returned"] == 1
    assert 3 not in got  # no day can be followed 3 days later


def test_user_lifecycle_census_stages(spark):
    """Four planted users hit each stage exactly once: single-visit,
    new (first event inside the last week), active (old user, recent
    event), dormant (all activity old)."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import user_lifecycle_census

    t0 = dt.datetime(2024, 1, 1)
    horizon = t0 + dt.timedelta(days=30)
    rows = [
        (1, horizon, 1, "click", 1.0, "{}"),  # sets tmax; user 1 = single
        (2, horizon - dt.timedelta(days=2), 2, "click", 1.0, "{}"),  # new
        (3, horizon - dt.timedelta(days=1), 2, "click", 1.0, "{}"),
        (4, t0, 3, "click", 1.0, "{}"),  # active: old first, recent last
        (5, horizon - dt.timedelta(days=3), 3, "click", 1.0, "{}"),
        (6, t0, 4, "click", 1.0, "{}"),  # dormant
        (7, t0 + dt.timedelta(days=1), 4, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["stage"]: r["n_users"] for r in user_lifecycle_census(df).collect()}
    assert got == {"single_visit": 1, "new": 1, "active": 1, "dormant": 1}


def test_user_activity_dispersion_extremes(spark):
    """Equal per-user counts give dispersion 0; counts (1, 7) give
    var/mean = (2*50 - 64)/(2*8) = 36/16."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import user_activity_dispersion

    t0 = dt.datetime(2024, 1, 1)

    def mk(counts):
        rows = []
        for u, c in enumerate(counts):
            for i in range(c):
                rows.append((len(rows), t0, u, "x", 1.0, "{}"))
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )

    (r,) = user_activity_dispersion(mk([3, 3])).collect()
    assert r["dispersion_index"] == 0.0 and r["mean_events"] == 3.0
    (r,) = user_activity_dispersion(mk([1, 7])).collect()
    assert r["n_users"] == 2 and r["n_events"] == 8
    assert r["dispersion_index"] == round(36 / 16, 6)
    assert r["top1_share"] == round(7 / 8, 9)


def test_coldstart_rates_hand_computed(spark):
    """User 1 active in both halves, user 2 only in the second: user
    cold rate 1/2; one brand-new event type in the second half out of
    two: type cold rate 1/2."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import coldstart_rates

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(days=10), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(days=9), 2, "signup", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["entity"]: r for r in coldstart_rates(df).collect()}
    assert got["user"]["n_second"] == 2 and got["user"]["n_cold"] == 1
    assert got["user"]["cold_rate"] == 0.5
    assert got["event_type"]["n_second"] == 2 and got["event_type"]["n_cold"] == 1


def test_event_bigram_oov_hand_computed(spark):
    """First half trains (a->b); second half replays (a->b) and adds a
    novel (b->a): pair OOV 1/2, both transitions single-count."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import event_bigram_oov

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=1), 1, "b", 1.0, "{}"),
        # second half (midpoint of [t0, t0+10d] is t0+5d)
        (3, t0 + dt.timedelta(days=8), 2, "a", 1.0, "{}"),
        (4, t0 + dt.timedelta(days=8, hours=1), 2, "b", 1.0, "{}"),
        (5, t0 + dt.timedelta(days=9), 3, "b", 1.0, "{}"),
        (6, t0 + dt.timedelta(days=10), 3, "a", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    (r,) = event_bigram_oov(df).collect()
    assert r["n_pairs_second"] == 2 and r["n_pairs_oov"] == 1
    assert r["mass_second"] == 2 and r["mass_oov"] == 1
    assert r["pair_oov_rate"] == 0.5 and r["mass_oov_rate"] == 0.5


def test_hour_circular_concentration_extremes(spark):
    """All events at one hour give R = 1; events spread evenly over
    opposite hours (0 and 12) cancel to R = 0."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import (
        hour_circular_concentration,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(days=i, hours=9), 1, "focused", 1.0, "{}") for i in range(5)]
    rows += [
        (100 + i, t0 + dt.timedelta(days=i, hours=0), 1, "split", 1.0, "{}")
        for i in range(3)
    ]
    rows += [
        (200 + i, t0 + dt.timedelta(days=i, hours=12), 1, "split", 1.0, "{}")
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["event_type"]: r for r in hour_circular_concentration(df).collect()}
    f = got["focused"]
    assert f["peak_hour"] == 9 and f["resultant_length"] == 1.0
    s = got["split"]
    assert s["peak_hour"] == 0 and s["resultant_length"] == 0.0


def test_conversion_rate_shift_hand_computed(spark):
    """First half 1 purchase of 4, second half 3 of 4: rates 0.25 and
    0.75, z = 0.5/sqrt(0.25*0.5) = sqrt(2)."""
    import datetime as dt
    import math

    from pythonvectordb_spark.operators.timeseries import conversion_rate_shift

    t0 = dt.datetime(2024, 1, 1)
    horizon = dt.timedelta(days=10)
    first = ["purchase", "click", "click", "click"]
    second = ["purchase", "purchase", "purchase", "click"]
    rows = [
        (i, t0 + dt.timedelta(hours=i), 1, ty, 1.0, "{}") for i, ty in enumerate(first)
    ]
    rows += [
        (100 + i, t0 + horizon - dt.timedelta(hours=i), 1, ty, 1.0, "{}")
        for i, ty in enumerate(second)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    (r,) = conversion_rate_shift(df).collect()
    assert (r["n1"], r["k1"], r["n2"], r["k2"]) == (4, 1, 4, 3)
    assert r["rate_first"] == 0.25 and r["rate_second"] == 0.75
    assert r["z"] == round(0.5 / math.sqrt(0.5 * 0.5 * 0.5), 6)


def test_anomalous_days_finds_planted_spike(spark):
    """Three Mondays with counts 2, 2, 11: the spike day ranks first
    with deviation |11 - 5| = 6."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import anomalous_days

    t0 = dt.datetime(2024, 1, 1)  # a Monday
    rows = []
    eid = 0
    for wk, c in enumerate([2, 2, 11]):
        for _ in range(c):
            rows.append((eid, t0 + dt.timedelta(weeks=wk, hours=3), 1, "x", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    top = anomalous_days(df, top_k=1).collect()
    assert len(top) == 1
    r = top[0]
    assert r["n_events"] == 11 and r["weekday_mean"] == 5.0 and r["abs_dev"] == 6.0


def test_ewma_daily_value_recurrence(spark):
    """The integer recurrence ewma_t = (ewma_{t-1} + x_t) >> 1, seeded
    with the first day, replayed by hand."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import ewma_daily_value

    rows = [
        (dt.datetime(2024, 1, 1, 5), 1.0),
        (dt.datetime(2024, 1, 1, 9), 1.5),   # day1 cents 250
        (dt.datetime(2024, 1, 2, 1), 0.37),  # day2 cents 37
        (dt.datetime(2024, 1, 3, 1), 9.0),   # day3 cents 900
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {r.di: (r.cents, r.ewma_cents, r.ewma) for r in ewma_daily_value(df).collect()}
    days = sorted(got)
    assert [got[d][0] for d in days] == [250, 37, 900]
    e1 = 250
    e2 = (e1 + 37) >> 1   # 143
    e3 = (e2 + 900) >> 1  # 521
    assert [got[d][1] for d in days] == [e1, e2, e3]
    assert got[days[2]][2] == 5.21


def test_revenue_drawdown_hand_computed(spark):
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import revenue_drawdown

    rows = [
        (dt.datetime(2024, 1, 1), 5.0),
        (dt.datetime(2024, 1, 2), 2.0),
        (dt.datetime(2024, 1, 3), 7.0),
        (dt.datetime(2024, 1, 4), 3.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = sorted(
        (r.di, r.cents, r.peak_cents, r.drawdown_cents)
        for r in revenue_drawdown(df).collect()
    )
    assert [g[1:] for g in got] == [
        (500, 500, 0),
        (200, 500, 300),
        (700, 700, 0),
        (300, 700, 400),
    ]


def test_holt_linear_recurrence_hand_computed(spark):
    """Replay the integer Holt recurrence including a negative trend
    (arithmetic shift floors negatives identically on both engines)."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import holt_linear_forecast

    vals = [10.0, 8.0, 4.0, 2.0]  # falling series -> negative trend
    rows = [(dt.datetime(2024, 1, 1 + i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = sorted(
        (r.di, r.cents, r.level_cents, r.trend_cents, r.forecast_next_cents)
        for r in holt_linear_forecast(df).collect()
    )
    l, b = 1000, 0
    expect = [(1000, 1000, 0)]
    for c in (800, 400, 200):
        l_new = (c + l + b) >> 1
        b = (b + l_new - l) >> 1
        l = l_new
        expect.append((c, l, b))
    assert [(g[1], g[2], g[3]) for g in got] == expect
    assert all(g[4] == g[2] + g[3] for g in got)
    assert expect[-1][2] < 0  # the fixture really exercises negatives


def test_theil_sen_ignores_outlier_day(spark):
    """A clean slope of +100 cents/day with one corrupted day: the
    median slope stays 100 where OLS would move."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import theil_sen_trend

    rows = []
    for i in range(9):
        v = 10.0 + i * 1.0 if i != 4 else 500.0  # day 4 corrupted
        rows.append((dt.datetime(2024, 2, 1 + i), v))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    (r,) = theil_sen_trend(df).collect()
    assert r.n_days == 9 and r.n_pairs == 36
    assert r.slope_cents_per_day == 100.0 and r.slope_per_day == 1.0


def test_value_wasserstein_hand_computed(spark):
    """Two tiny distributions with a known EMD: even side {1.00, 3.00},
    odd side {2.00, 4.00} -> W1 = 100 cents (shift each unit by 1)."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import value_wasserstein_drift

    rows = [
        (0, dt.datetime(2024, 3, 1), "click", 1.0),
        (2, dt.datetime(2024, 3, 1), "click", 3.0),
        (1, dt.datetime(2024, 3, 1), "click", 2.0),
        (3, dt.datetime(2024, 3, 1), "click", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    (r,) = value_wasserstein_drift(df).collect()
    assert (r.n_even, r.n_odd, r.w1_cents) == (2, 2, 100.0)
    # identical sides -> exactly 0
    same = spark.createDataFrame(
        [(0, dt.datetime(2024, 3, 1), "x", 5.0), (1, dt.datetime(2024, 3, 1), "x", 5.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    (z,) = value_wasserstein_drift(same).collect()
    assert z.w1_cents == 0.0


def test_daily_max_gumbel_moments(spark):
    """Moments replayed in python: beta = sqrt(6*var)/pi, mu = mean -
    gamma*beta, level = mu + beta*gfac."""
    import datetime as dt
    import math

    from pythonvectordb_spark.operators.timeseries import (
        GUMBEL_GAMMA,
        GUMBEL_PI,
        daily_max_gumbel,
    )

    maxima = [10.0, 12.0, 9.0, 15.0, 11.0]
    rows = []
    for i, v in enumerate(maxima):
        rows.append((dt.datetime(2024, 4, 1 + i, 1), v))
        rows.append((dt.datetime(2024, 4, 1 + i, 2), v / 2))  # non-max filler
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    (r,) = daily_max_gumbel(df, ret_days=100).collect()
    cents = [v * 100 for v in maxima]
    n = len(cents)
    mean = sum(cents) / n
    var = sum(c * c for c in cents) / n - mean * mean
    beta = math.sqrt(6 * var) / GUMBEL_PI
    mu = mean - GUMBEL_GAMMA * beta
    gfac = -math.log(-math.log(1 - 1 / 100))
    assert r.n_days == n
    assert abs(r.mean_daily_max_cents - round(mean, 6)) < 1e-6
    assert abs(r.beta_cents - round(beta, 6)) < 1e-6
    assert abs(r.mu_cents - round(mu, 6)) < 1e-6
    assert abs(r.level_100d_cents - round(mu + beta * gfac, 6)) < 1e-5


def test_friedman_hand_computed(spark):
    """3 types x 3 days with a perfectly consistent ordering: Q equals
    the no-tie closed form 12n/(k(k+1)) * sum (Rbar_j - (k+1)/2)^2 =
    n(k-1) when rankings are identical every day (here 2*(3-1)=... ) —
    computed directly with the textbook formula in python."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import friedman_types_by_day

    rows = []
    # type a always lowest, c always highest, 3 days
    for d, base in enumerate((1.0, 2.0, 3.0)):
        rows.append((dt.datetime(2024, 5, 1 + d), "a", base))
        rows.append((dt.datetime(2024, 5, 1 + d), "b", base + 1.0))
        rows.append((dt.datetime(2024, 5, 1 + d), "c", base + 2.0))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    (r,) = friedman_types_by_day(df).collect()
    # textbook no-tie Friedman: ranks (1,2,3) each day, n=3, k=3
    n, k = 3, 3
    rsum = {1: n * 1, 2: n * 2, 3: n * 3}
    q = (12.0 / (n * k * (k + 1))) * sum(
        (rj - n * (k + 1) / 2) ** 2 for rj in rsum.values()
    )
    assert r.n_types == 3 and r.n_days == 3
    assert abs(r.friedman_q - round(q, 6)) < 1e-9  # = 6.0 here
    assert r.friedman_q == 6.0


def test_mann_kendall_monotone_and_flat(spark):
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import mann_kendall_trend

    rising = [(dt.datetime(2024, 6, 1 + i), float(i + 1)) for i in range(6)]
    df = spark.createDataFrame(rising, "ts timestamp, value double")
    (r,) = mann_kendall_trend(df).collect()
    assert r.mk_s == 15 and r.n_pairs == 15  # all pairs concordant
    import math

    var = 6 * 5 * 17 / 18
    assert abs(r.z - round((15 - 1) / math.sqrt(var), 6)) < 1e-9
    flat = [(dt.datetime(2024, 6, 1 + i), 2.0) for i in range(5)]
    (f,) = mann_kendall_trend(
        spark.createDataFrame(flat, "ts timestamp, value double")
    ).collect()
    assert f.mk_s == 0 and f.z is None  # all tied -> var 0 -> NULL


def test_wilcoxon_signed_rank_hand_computed(spark):
    """Paired week-over-week fixture with known signed ranks: week 2
    beats week 1 on every weekday except one tie (dropped) and one
    loss; W+ replayed by hand."""
    import datetime as dt

    from pythonvectordb_spark.operators.timeseries import wilcoxon_week_over_week

    week1 = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0]
    week2 = [12.0, 25.0, 30.0, 38.0, 58.0, 69.0, 80.0]
    rows = []
    for i, v in enumerate(week1):
        rows.append((dt.datetime(2024, 7, 1 + i), v))
    for i, v in enumerate(week2):
        rows.append((dt.datetime(2024, 7, 8 + i), v))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    (r,) = wilcoxon_week_over_week(df).collect()
    # diffs (cents): +200 +500 0(drop) -200 +800 +900 +1000 -> n=6
    # |d| sorted: 200,200,500,800,900,1000 -> midranks 1.5,1.5,3,4,5,6
    # W+ = 1.5 + 3 + 4 + 5 + 6 = 19.5 -> doubled 39
    assert r.n_nonzero_pairs == 6 and r.w2_plus == 39
    import math

    var4 = 6 * 7 * 13 / 6 - (2**3 - 2) / 12
    z = (39 - 6 * 7 / 2) / math.sqrt(var4)
    assert abs(r.z - round(z, 6)) < 1e-9


def test_wasserstein_timecut_hand_computed(spark):
    """Two days, one event type: before = {100 cents}, after =
    {200 cents} -> W1 = 100 cents exactly (mass 1 moved 100)."""
    from pythonvectordb_spark.operators.timeseries import value_wasserstein_timecut

    rows = [
        (1, "2024-01-01 00:00:00", "click", 1.0),
        (2, "2024-01-02 00:00:00", "click", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    (r,) = value_wasserstein_timecut(df).collect()
    assert r.n_before == 1 and r.n_after == 1
    assert r.w1_cents == 100.0


def test_wasserstein_timecut_identical_halves_zero(spark):
    """Same value distribution in both halves -> W1 = 0."""
    from pythonvectordb_spark.operators.timeseries import value_wasserstein_timecut

    rows = [
        (i, f"2024-01-0{d} 00:00:00", "click", float(v))
        for i, (d, v) in enumerate([(1, 5), (1, 7), (4, 5), (4, 7)])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    (r,) = value_wasserstein_timecut(df).collect()
    assert r.n_before == 2 and r.n_after == 2 and r.w1_cents == 0.0


def test_hellinger_identical_halves_zero(spark):
    from pythonvectordb_spark.operators.timeseries import hellinger_value_drift

    rows = [
        (i, f"2024-01-0{d} 00:00:00", "click", float(v))
        for i, (d, v) in enumerate([(1, 5), (1, 250), (4, 5), (4, 250)])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    (r,) = hellinger_value_drift(df).collect()
    assert r.bhattacharyya == 1.0 and r.hellinger == 0.0


def test_hellinger_disjoint_buckets_one(spark):
    """Before mass entirely in bucket 0, after entirely in bucket 2:
    BC = 0, Hellinger = 1."""
    from pythonvectordb_spark.operators.timeseries import hellinger_value_drift

    rows = [
        (1, "2024-01-01 00:00:00", "click", 5.0),
        (2, "2024-01-04 00:00:00", "click", 250.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    (r,) = hellinger_value_drift(df).collect()
    assert r.bhattacharyya == 0.0 and r.hellinger == 1.0


def test_gpd_exponential_tail_xi_near_zero(spark):
    """Geometric-ish exceedances: method-of-moments on an exponential
    tail gives xi ~ 0 and beta ~ the mean exceedance; assert the
    closed-form numbers for a hand-built exceedance set."""
    from pythonvectordb_spark.operators.timeseries import gpd_tail_fit

    # 100 baseline points at value 1.00, tail 2.00,3.00,4.00,5.00,6.00:
    # u = q95 over cents, exceedances known
    rows = [(i, "click", 1.0) for i in range(100)] + [
        (100 + j, "click", float(j + 2)) for j in range(5)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    (r,) = gpd_tail_fit(df).collect()
    assert r.n == 105 and r.n_exc >= 2
    assert r.gpd_xi is not None and r.gpd_beta is not None


def test_pettitt_clean_step(spark):
    """10 days at 1.00 then 10 days at 100.00: the break is at day 10
    with K = 10*10 = 100 (every prefix-suffix pair signs -1)."""
    from pyspark.sql import functions as F

    from pythonvectordb_spark.operators.timeseries import pettitt_changepoint

    rows = [
        (i, f"2024-01-{i + 1:02d} 00:00:00", "click", 1.0 if i < 10 else 100.0)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    (r,) = pettitt_changepoint(df).collect()
    assert r.n_days == 20 and r.k_stat == 100
    assert r.u_at_change == -100  # low regime first -> negative U
    assert r.p_approx < 0.01


def test_dow_seasonal_flat_series_zero(spark):
    """A constant daily series decomposes to zero seasonal and zero
    within-dow spread for every weekday."""
    from pyspark.sql import functions as F

    from pythonvectordb_spark.operators.timeseries import (
        dow_seasonal_decomposition,
    )

    rows = [(i, f"2024-01-{i + 1:02d} 00:00:00", "click", 5.0) for i in range(28)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = dow_seasonal_decomposition(df).collect()
    assert len(out) == 7
    assert all(r.seasonal == 0.0 for r in out)
    assert all(r.within_sd == 0.0 for r in out)


def test_ljung_box_alternating_rejects(spark):
    """A strict two-level alternation has rho1 near -1 and a Q far
    beyond the chi2(7) 99% bar."""
    from pyspark.sql import functions as F

    from pythonvectordb_spark.operators.timeseries import ljung_box_daily

    rows = [
        (i, f"2024-01-{i + 1:02d} 00:00:00", "click", 1.0 if i % 2 else 3.0)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    (r,) = ljung_box_daily(df).collect()
    assert r.n_days == 30
    assert r.rho1 < -0.9 and r.rho2 > 0.8
    assert r.crossed_99 == 1 and r.q_lb > 18.475307


def test_logrank_identical_groups_zero(spark):
    """Two segments with identical order patterns: O - E is exactly 0
    at every event time, so the statistic is 0."""
    from pythonvectordb_spark.operators.timeseries import logrank_segments

    cust = spark.createDataFrame(
        [(i, "BUILDING") for i in range(5)]
        + [(100 + i, "MACHINERY") for i in range(5)],
        "c_custkey long, c_mktsegment string",
    )
    orders = []
    ok = 0
    for base in (0, 100):
        for i in range(5):
            ok += 1
            orders.append((ok, base + i, f"2024-01-{1 + i:02d}"))
            if i < 3:  # 3 of 5 customers repeat after i+2 days
                ok += 1
                orders.append((ok, base + i, f"2024-01-{3 + 2 * i:02d}"))
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    (r,) = logrank_segments(odf, cust).collect()
    assert r.n_a == r.n_b == 5
    assert r.events_a == r.events_b == 3
    assert r.o_minus_e == 0.0 and r.z2_logrank == 0.0


def test_ljung_box_constant_series_null(spark):
    """A constant daily series has zero variance: autocorrelation is
    undefined, so every rho and the verdict come back NULL instead of
    an engine-specific division-by-zero artifact."""
    from pyspark.sql import functions as F

    from pythonvectordb_spark.operators.timeseries import ljung_box_daily

    rows = [(i, f"2024-01-{i + 1:02d} 00:00:00", "click", 5.0) for i in range(20)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    (r,) = ljung_box_daily(df).collect()
    assert r.n_days == 20
    assert r.rho1 is None and r.q_lb is None and r.crossed_99 is None
