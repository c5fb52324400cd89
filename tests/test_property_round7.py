"""Brute-force cross-checks for the round-7 statistical operators: the
clever algebra (doubled-midrank Pettitt, cumulative-subtraction at-risk
counts, integer-lattice KS with BH ranking) must agree with a naive
O(n^2) / per-subject Python model on arbitrary small inputs, ties and
censoring included."""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


def _mk_events(spark, values):
    rows = [
        (i, f"2024-01-{i + 1:02d} 00:00:00", "click", float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


@settings(max_examples=10, deadline=None)
@given(
    values=st.lists(st.integers(min_value=0, max_value=5), min_size=3, max_size=12)
)
def test_pettitt_matches_bruteforce(spark, values):
    """U_t from doubled midranks == the literal double sum, for every
    prefix, on tie-heavy series."""
    from pythonvectordb_spark.operators.timeseries import pettitt_changepoint

    n = len(values)
    us = []
    for t in range(1, n):
        u = sum(
            (values[i] > values[j]) - (values[i] < values[j])
            for i in range(t)
            for j in range(t, n)
        )
        us.append(u)
    k = max(abs(u) for u in us)
    t_star = min(i for i, u in enumerate(us) if abs(u) == k)  # earliest day
    p = min(1.0, 2.0 * math.exp(-6.0 * k * k / (n**3 + n**2)))

    (r,) = pettitt_changepoint(_mk_events(spark, values)).collect()
    assert r.n_days == n
    assert r.k_stat == k
    assert r.u_at_change == us[t_star]
    assert abs(r.p_approx - round(p, 6)) < 1e-9


@settings(max_examples=8, deadline=None)
@given(
    ga=st.lists(st.integers(min_value=0, max_value=6), min_size=2, max_size=10),
    gb=st.lists(st.integers(min_value=0, max_value=6), min_size=2, max_size=10),
)
def test_ks_d_matches_bruteforce(spark, ga, gb):
    """The integer-lattice max|cume_a*n_b - cume_b*n_a| equals the
    classic sup-distance between the two ECDFs."""
    from pythonvectordb_spark.operators.stats import ks_bh_fdr_matrix

    rows = [(i, "a", v) for i, v in enumerate(ga)] + [
        (100 + i, "b", v) for i, v in enumerate(gb)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    (r,) = ks_bh_fdr_matrix(df).collect()

    grid = sorted(set(ga) | set(gb))
    na, nb = len(ga), len(gb)
    d = max(
        abs(sum(1 for x in ga if x <= v) / na - sum(1 for x in gb if x <= v) / nb)
        for v in grid
    )
    assert abs(r.d_stat - round(d, 6)) < 1e-9
    ne_d2 = (na * nb / (na + nb)) * d * d
    p = min(1.0, 2.0 * math.exp(-2.0 * ne_d2))
    assert abs(r.p_ks - round(p, 6)) < 1e-6


@settings(max_examples=8, deadline=None)
@given(
    subj_a=st.lists(
        st.tuples(st.integers(min_value=1, max_value=8), st.booleans()),
        min_size=2,
        max_size=6,
    ),
    subj_b=st.lists(
        st.tuples(st.integers(min_value=1, max_value=8), st.booleans()),
        min_size=2,
        max_size=6,
    ),
)
def test_logrank_matches_per_subject_model(spark, subj_a, subj_b):
    """The cumulative-subtraction at-risk counts reproduce the naive
    per-subject definition (at-risk = time >= t) at every event time,
    censoring included."""
    from pythonvectordb_spark.operators.timeseries import logrank_segments

    # need at least one event somewhere or the operator returns an
    # empty frame (no event times) — force subject 0 of group A to be
    # an event
    subj_a = [(subj_a[0][0], True)] + list(subj_a[1:])

    HORIZON = 50  # anchor day index for dmax
    cust, orders, ok = [], [], 0
    for gi, (seg, subs) in enumerate(
        (("BUILDING", subj_a), ("MACHINERY", subj_b))
    ):
        for si, (t, ev) in enumerate(subs):
            ck = gi * 100 + si
            cust.append((ck, seg))
            if ev:  # event: first order day 1, second day 1 + t
                ok += 1
                orders.append((ok, ck, 1))
                ok += 1
                orders.append((ok, ck, 1 + t))
            else:  # censored at horizon: first order at HORIZON - t
                ok += 1
                orders.append((ok, ck, HORIZON - t))
    # horizon anchor: a customer in NEITHER segment sets max(o_orderdate)
    cust.append((999, "FURNITURE"))
    ok += 1
    orders.append((ok, 999, HORIZON))

    cdf = spark.createDataFrame(cust, "c_custkey long, c_mktsegment string")
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, d int"
    ).select(
        "o_orderkey",
        "o_custkey",
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("d")).alias(
            "o_orderdate"
        ),
    )

    out = logrank_segments(odf, cdf).collect()
    times = sorted({t for t, ev in subj_a if ev} | {t for t, ev in subj_b if ev})
    o_minus_e = var = 0.0
    ev_a = sum(1 for _, e in subj_a if e)
    ev_b = sum(1 for _, e in subj_b if e)
    for t in times:
        da = sum(1 for tt, e in subj_a if e and tt == t)
        db = sum(1 for tt, e in subj_b if e and tt == t)
        ra = sum(1 for tt, _ in subj_a if tt >= t)
        rb = sum(1 for tt, _ in subj_b if tt >= t)
        d, r = da + db, ra + rb
        o_minus_e += da - d * ra / r
        if r > 1:
            var += d * (ra / r) * (rb / r) * (r - d) / (r - 1)

    (row,) = out
    assert row.events_a == ev_a and row.events_b == ev_b
    assert abs(row.o_minus_e - round(o_minus_e, 6)) < 1e-6
    assert abs(row.var_logrank - round(var, 6)) < 1e-6
