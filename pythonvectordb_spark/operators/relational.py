"""Relational analytics over the metadata tables (SURVEY.md §2.12: "the
full Spark SQL surface on the TPC-H-ish tables"). The reference has no
joins/aggregation framework at all (SURVEY §2.4-2.5); this module is the
Spark-native replacement a user gets for free, shaped like the TPC-H
queries the testdata mirrors.

Determinism technique (oracle hash-parity): monetary columns are exact
2-decimal values, so every SUM is computed over per-row *integer* cents
(or 1e-4/1e-6 fixed-point for discount/tax products) — order-free exact
arithmetic identical in any engine and under any partitioning. Averages
are derived by dividing the exact sums (one deterministic double op).
Floating-point SUM over shuffled doubles would NOT hash-match — its
result depends on reduction order.

Scale notes: dimension joins carry explicit ``broadcast()`` hints;
fact-fact joins shuffle on their keys with AQE handling skew; every
aggregate here is partial-aggregatable (map-side combine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cents(col) -> F.Column:
    """Exact integer cents from a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: grouped pricing aggregates over lineitem.

    disc_price = E*(1-D) and charge = E*(1-D)*(1+T) are exact integers at
    scale 1e4 / 1e6 respectively (2dp x 2dp [x 2dp]), so the sums are
    exact longs; averages derive from the sums.
    """
    e100 = _cents("l_extendedprice")
    d100 = _cents("l_discount")
    t100 = _cents("l_tax")
    qty = F.round(F.col("l_quantity")).cast("long")
    disc_price_e4 = e100 * (F.lit(100).cast("long") - d100)
    charge_e6 = disc_price_e4 * (F.lit(100).cast("long") + t100)
    agg = (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(e100).alias("sum_base_cents"),
            F.sum(disc_price_e4).alias("sum_disc_e4"),
            F.sum(charge_e6).alias("sum_charge_e6"),
            F.sum(d100).alias("sum_disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    n = F.col("count_order").cast("double")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("long").alias("sum_qty"),
        F.col("sum_base_cents").cast("long").alias("sum_base_cents"),
        F.col("sum_disc_e4").cast("long").alias("sum_disc_e4"),
        F.col("sum_charge_e6").cast("long").alias("sum_charge_e6"),
        F.round(F.col("sum_qty").cast("double") / n, 6).alias("avg_qty"),
        F.round(F.col("sum_base_cents").cast("double") / F.lit(100.0) / n, 6).alias("avg_price"),
        F.round(F.col("sum_disc_cents").cast("double") / F.lit(100.0) / n, 6).alias("avg_disc"),
        F.col("count_order").cast("long").alias("count_order"),
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k open orders by revenue for one segment.

    customer is a broadcast dimension; orders⋈lineitem shuffles on
    orderkey; top-k via TakeOrderedAndProject.
    """
    e100 = _cents("l_extendedprice")
    d100 = _cents("l_discount")
    revenue_e4 = e100 * (F.lit(100).cast("long") - d100)
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < F.lit(date).cast("timestamp"))
    items = lineitem.filter(F.col("l_shipdate") > F.lit(date).cast("timestamp"))
    joined = items.join(
        ords, items.l_orderkey == ords.o_orderkey
    ).join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
    out = (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_e4).cast("long").alias("revenue_e4"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue_e4",
        )
    )
    return out.orderBy(F.desc("revenue_e4"), F.asc("l_orderkey")).limit(k)


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the lineitem's supplier and
    the order's customer share the nation, within one region.

    region/nation/supplier/customer broadcast; the fact join shuffles once
    on orderkey and once on suppkey.
    """
    e100 = _cents("l_extendedprice")
    d100 = _cents("l_discount")
    revenue_e4 = e100 * (F.lit(100).cast("long") - d100)
    dims = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == region_name)
        .select("n_nationkey", "n_name")
    )
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(dims), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(revenue_e4).cast("long").alias("revenue_e4"))
        .select("n_name", "revenue_e4")
    )


def forecast_revenue(lineitem: DataFrame, year: str = "1996") -> DataFrame:
    """TPC-H Q6 shape: one-pass filtered global aggregate. The discount
    band compares on integer cents (doubles at band edges are exact 2dp
    but integer comparison removes any doubt)."""
    e100 = _cents("l_extendedprice")
    d100 = _cents("l_discount")
    qty = F.round(F.col("l_quantity")).cast("long")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{int(year) + 1}-01-01").cast("timestamp"))
            & d100.between(5, 7)
            & (qty < 24)
        )
        .agg(
            F.sum(e100 * d100).cast("long").alias("revenue_e4"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def bilateral_trade(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7 shape: revenue by (supplier nation, customer nation, year)
    — two aliased broadcast joins of the same dimension."""
    e100 = _cents("l_extendedprice")
    d100 = _cents("l_discount")
    revenue_e4 = e100 * (F.lit(100).cast("long") - d100)
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(revenue_e4).cast("long").alias("revenue_e4"))
    )


def customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by order count, including
    zero-order customers (left outer join + double aggregation)."""
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


def brand_revenue_share(lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1") -> DataFrame:
    """TPC-H Q14 shape: one brand's share of total revenue — conditional
    aggregation with an exact-integer numerator/denominator and a single
    deterministic division."""
    e100 = _cents("l_extendedprice")
    d100 = _cents("l_discount")
    revenue_e4 = e100 * (F.lit(100).cast("long") - d100)
    j = lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
    agg = j.agg(
        F.sum(F.when(F.col("p_brand") == brand, revenue_e4).otherwise(F.lit(0).cast("long")))
        .cast("long")
        .alias("brand_revenue_e4"),
        F.sum(revenue_e4).cast("long").alias("total_revenue_e4"),
    )
    return agg.withColumn(
        "brand_share_pct",
        F.round(
            F.lit(100.0) * F.col("brand_revenue_e4").cast("double")
            / F.col("total_revenue_e4").cast("double"),
            6,
        ),
    )


def customer_order_running(orders: DataFrame) -> DataFrame:
    """Window functions: per-customer order sequence + running spend.

    One shuffle on custkey; the window sort is deterministic
    ((o_orderdate, o_orderkey) is a total order).
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    total_cents = _cents("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("int").alias("order_seq"),
        F.sum(total_cents).over(w).cast("long").alias("running_cents"),
        F.lag("o_orderkey", 1).over(w).cast("long").alias("prev_orderkey"),
    )


def mktsegment_rollup(customer: DataFrame) -> DataFrame:
    """ROLLUP(c_mktsegment): per-segment + grand-total customer stats."""
    return (
        customer.rollup("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(_cents("c_acctbal")).cast("long").alias("acctbal_cents"),
        )
        .select("c_mktsegment", "n_customers", "acctbal_cents")
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: orders having >=1 late-shipped lineitem, counted by
    priority. The EXISTS is a left-semi join (no row multiplication)."""
    late = lineitem.select("l_orderkey", "l_shipdate")
    sem = orders.join(
        late,
        (orders.o_orderkey == late.l_orderkey) & (late.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


def events_by_hour(events: DataFrame) -> DataFrame:
    """Hourly event aggregates incl. JSON prop extraction (from_json path).

    Epoch-second bucket keys (exact longs) rather than timestamps keep the
    output engine-portable."""
    hour_epoch = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy(
        hour_epoch.alias("hour_epoch"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(_cents("value")).cast("long").alias("value_cents"),
        F.sum(k).cast("long").alias("sum_k"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


def events_tumbling(events: DataFrame, minutes: int = 10) -> DataFrame:
    """Tumbling-window aggregate via F.window — the batch twin of the
    Structured Streaming windowed aggregation (streaming.windows)."""
    w = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(w.alias("win"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(_cents("value")).cast("long").alias("value_cents"),
        )
        .select(
            F.unix_timestamp("win.start").cast("long").alias("ws_epoch"),
            "n_events",
            "value_cents",
        )
    )


def nation_customer_stats(nation: DataFrame, customer: DataFrame) -> DataFrame:
    """Broadcast dim join + exact aggregates per nation."""
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(_cents("c_acctbal")).cast("long").alias("acctbal_cents"),
        )
        .withColumn(
            "avg_acctbal",
            F.round(
                F.col("acctbal_cents").cast("double")
                / F.lit(100.0)
                / F.col("n_customers").cast("double"),
                6,
            ),
        )
    )


def approx_distinct_events(events: DataFrame) -> DataFrame:
    """HLL approximate distincts — the 100 TB cardinality path
    (sketch-based, not oracle-matchable by construction)."""
    return events.agg(
        F.approx_count_distinct("user_id").cast("long").alias("approx_users"),
        F.approx_count_distinct("event_type").cast("long").alias("approx_types"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def revenue_gini(
    customer: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """Per-nation Gini coefficient of customer order spend — the
    inequality scalar behind per-key skew planning: a nation whose
    revenue Gini approaches 1 is a few whale accounts (salt THEIR join
    keys; `event_key_skew` decides the same question for raw key
    counts, this grades the VALUE concentration), near 0 is uniform
    spend. Customers with no orders are out of scope (inner join).

    Gini via the rank identity G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n with
    x sorted ascending and ties broken by customer key — ranks are
    integers, spend is exact cents, so Σ(i·x_i) and Σx are exact
    int64 and only the final identity divides (rounded 6).

    Scale shape: spend aggregates per customer (map-side combined),
    the rank window partitions BY NATION — no global sort, each
    nation's customers sort within their shuffle partition; the nation
    dimension broadcasts.
    """
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum(_cents("o_totalprice")).cast("long").alias("cents"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "cents")
    )
    w = Window.partitionBy("n_name").orderBy(F.asc("cents"), F.asc("c_custkey"))
    ranked = spend.select(
        "n_name", "cents", F.row_number().over(w).cast("long").alias("i")
    )
    g = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("_six"),
    )
    n = F.col("n_customers").cast("double")
    gini = (
        F.lit(2.0) * F.col("_six").cast("double")
        / (n * F.col("total_cents").cast("double"))
        - (n + F.lit(1.0)) / n
    )
    return g.select(
        "n_name", "n_customers", "total_cents", F.round(gini, 6).alias("gini")
    )


def benford_digits(orders: DataFrame, price_col: str = "o_totalprice") -> DataFrame:
    """Benford's-law first-digit audit over order values — the classic
    fabricated-data detector for a warehouse feed: organically-grown
    amounts follow P(d) = log10(1 + 1/d); uniform or spiky first-digit
    histograms flag synthetic/backfilled/defaulted records upstream
    (the value-distribution sibling of `dq_violations`' rule checks).
    Emits one row per digit with the observed share, the Benford
    expectation, and their difference.

    Determinism: the digit comes from the leading character of the
    exact cents integer (prices ≥ 1 keep the leading digit invariant
    under the ×100 scaling); shares are exact-integer ratios; the
    Benford expectation is (ln(d+1) − ln(d))/ln(10) — every ln of an
    exact integer — and the excess subtracts the two ROUNDED values so
    both engines difference identical doubles.

    One map-side-combined aggregation on a 9-value key; everything
    after is 9 rows.
    """
    cents = F.round(F.col(price_col) * 100).cast("long")
    d = F.substring(cents.cast("string"), 1, 1).cast("int")
    g = (
        orders.select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
        .localCheckpoint(eager=False)  # feeds the total AND the output join
    )
    tot = g.agg(F.sum("n_obs").cast("long").alias("n")).withColumn("_one", F.lit(1))
    dd = F.col("digit").cast("double")
    benford = (F.log(dd + F.lit(1.0)) - F.log(dd)) / F.log(F.lit(10.0))
    out = (
        g.withColumn("_one", F.lit(1))
        .join(F.broadcast(tot), "_one")
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n").cast("double"), 9).alias(
                "obs_share"
            ),
            F.round(benford, 9).alias("benford_p"),
        )
    )
    return out.withColumn(
        "excess", F.round(F.col("obs_share") - F.col("benford_p"), 9)
    )


def fk_orphans(
    orders: DataFrame,
    customer: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Referential-integrity audit across the warehouse's seven
    foreign-key edges: per relationship, the child row count and how
    many children point at a missing parent — the join-safety
    precondition every downstream equi-join silently assumes (an
    orphaned fk drops rows in inner joins and fabricates nulls in
    outer ones). Complements `dq_violations`' single-table rules with
    the cross-table contract.

    Each edge is ONE left join + aggregate (n_child = count, orphans =
    parents-null count) — the parent side reduced to its distinct key
    column first, so small dimensions broadcast and the fact-fact
    edges shuffle on the join key only. The seven one-row results
    union into a 7-row frame; each branch reads different tables, so
    there is no shared subtree to checkpoint.
    """
    def edge(name: str, child: DataFrame, ck: str, pkeys: DataFrame) -> DataFrame:
        return (
            child.select(F.col(ck).alias("_ck"))
            .join(pkeys, F.col("_ck") == F.col("_pk"), "left")
            .agg(
                F.lit(name).alias("relationship"),
                F.count(F.lit(1)).cast("long").alias("n_child"),
                F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
            )
        )

    def keys(parent: DataFrame, pk: str) -> DataFrame:
        return parent.select(F.col(pk).alias("_pk")).distinct()

    # nation's key set serves TWO edges — build it once (checkpointed)
    nation_keys = keys(nation, "n_nationkey").localCheckpoint(eager=False)
    edges = [
        edge("orders.custkey->customer", orders, "o_custkey", keys(customer, "c_custkey")),
        edge("lineitem.orderkey->orders", lineitem, "l_orderkey", keys(orders, "o_orderkey")),
        edge("lineitem.partkey->part", lineitem, "l_partkey", keys(part, "p_partkey")),
        edge("lineitem.suppkey->supplier", lineitem, "l_suppkey", keys(supplier, "s_suppkey")),
        edge("customer.nationkey->nation", customer, "c_nationkey", nation_keys),
        edge("supplier.nationkey->nation", supplier, "s_nationkey", nation_keys),
        edge("nation.regionkey->region", nation, "n_regionkey", keys(region, "r_regionkey")),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out


def rank_stability(orders: DataFrame, lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Spearman rank stability of brand revenue across time halves — is
    the popularity ordering a stable property of the catalog or churn?
    `rbo_overlap` compares two retrieval rankings top-weighted; this is
    the full-population rank correlation over an exact revenue measure,
    the drift scalar that decides whether popularity-keyed layouts
    (Z-order keys, cache tiers, bucketing) survive between refresh
    windows. rho near 1: yesterday's hot brands are tomorrow's — layout
    decisions persist. rho near 0: re-cluster every window.

    The order horizon is split at its exact midpoint (epoch-microsecond
    integer arithmetic on a broadcast one-row frame); revenue per
    (half, brand) is the e4-unit exact-integer measure
    (`regional_revenue` discipline); ranks are row_number with brand
    tie-break, so d^2 and its sum are exact int64 and rho =
    1 - 6*sum_d2/(n*(n^2-1)) is a single final division, ROUNDED 9.

    Scale shape: the fact table shuffles once on orderkey (part
    broadcasts); everything after the (half, brand) aggregate is
    brand-cardinality-sized; the ranked frame feeds both self-join
    sides and is checkpointed once (union-recompute discipline).
    """
    ous = F.unix_micros(F.col("o_orderdate"))
    piv = (
        orders.agg(F.min(ous).alias("t0"), F.max(ous).alias("t1"))
        .select(
            (F.col("t0") + F.floor((F.col("t1") - F.col("t0")) / F.lit(2)).cast("long")).alias("p")
        )
        .withColumn("_one", F.lit(1))
    )
    e100 = _cents("l_extendedprice")
    d100 = _cents("l_discount")
    rev_e4 = e100 * (F.lit(100).cast("long") - d100)
    half = F.when(ous <= F.col("p"), F.lit(1)).otherwise(F.lit(2)).alias("half")
    rev = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(piv), "_one")
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(half, "p_brand", rev_e4.alias("r_e4"))
        .groupBy("half", "p_brand")
        .agg(F.sum("r_e4").cast("long").alias("rev_e4"))
    )
    w = Window.partitionBy("half").orderBy(F.col("rev_e4").desc(), F.col("p_brand").asc())
    ranked = rev.select(
        "half", "p_brand", F.row_number().over(w).cast("long").alias("r")
    ).localCheckpoint(eager=False)
    a = ranked.where(F.col("half") == 1).select(F.col("p_brand"), F.col("r").alias("r1"))
    b = ranked.where(F.col("half") == 2).select(F.col("p_brand"), F.col("r").alias("r2"))
    j = a.join(b, "p_brand")
    n = F.count(F.lit(1)).cast("long")
    d2 = F.sum((F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))).cast("long")
    return j.agg(n.alias("n_brands"), d2.alias("sum_d2")).select(
        "n_brands",
        "sum_d2",
        F.round(
            F.lit(1.0)
            - F.lit(6.0)
            * F.col("sum_d2").cast("double")
            / (
                F.col("n_brands").cast("double")
                * (
                    F.col("n_brands").cast("double") * F.col("n_brands").cast("double")
                    - F.lit(1.0)
                )
            ),
            9,
        ).alias("rho"),
    )


def kendall_tau(orders: DataFrame, lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Kendall tau-b between brand revenue across the two exact halves
    of the order horizon — the concordance companion to
    `rank_stability`: Spearman squares rank displacement (one brand
    teleporting hurts quadratically), tau-b counts pairwise order
    inversions (every swap costs the same), so together they separate
    "one breakout brand" drift from "whole-catalog reshuffle" drift.
    Unlike rank_stability's tie-broken row_number ranks, tau-b works on
    the RAW exact-integer revenue measure and accounts for ties
    explicitly (tau_b = (C-D)/sqrt((n0-Tx)(n0-Ty))).

    Determinism: revenue per (half, brand) is the e4-unit exact
    integer (`regional_revenue` discipline); concordant / discordant /
    tied pair counts are exact int64 over sign comparisons of integer
    differences; the single final division is double, ROUNDED 9.

    Scale shape: the fact table shuffles once on orderkey (part and the
    midpoint frame broadcast); the brand-pair self-join runs on the
    AGGREGATED brand frame — K(K-1)/2 pairs for K brands, never rows² —
    and that frame is checkpointed once across both sides
    (union-recompute discipline). At 100 TB K is catalog-sized (10^3-4),
    so the pair frame stays broadcast-small.
    """
    ous = F.unix_micros(F.col("o_orderdate"))
    piv = (
        orders.agg(F.min(ous).alias("t0"), F.max(ous).alias("t1"))
        .select(
            (F.col("t0") + F.floor((F.col("t1") - F.col("t0")) / F.lit(2)).cast("long")).alias("p")
        )
        .withColumn("_one", F.lit(1))
    )
    e100 = _cents("l_extendedprice")
    d100 = _cents("l_discount")
    rev_e4 = e100 * (F.lit(100).cast("long") - d100)
    half = F.when(ous <= F.col("p"), F.lit(1)).otherwise(F.lit(2)).alias("half")
    rev = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(piv), "_one")
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(half, "p_brand", rev_e4.alias("r_e4"))
        .groupBy("half", "p_brand")
        .agg(F.sum("r_e4").cast("long").alias("rev_e4"))
    )
    wide = (
        rev.groupBy("p_brand")
        .agg(
            F.max(F.when(F.col("half") == 1, F.col("rev_e4"))).alias("x"),
            F.max(F.when(F.col("half") == 2, F.col("rev_e4"))).alias("y"),
        )
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .localCheckpoint(eager=False)
    )
    a = wide.select(
        F.col("p_brand").alias("ba"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = wide.select(
        F.col("p_brand").alias("bb"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    sx = F.signum((F.col("xa") - F.col("xb")).cast("double")).cast("long")
    sy = F.signum((F.col("ya") - F.col("yb")).cast("double")).cast("long")
    pairs = a.join(F.broadcast(b), F.col("ba") < F.col("bb")).select(
        sx.alias("sx"), sy.alias("sy")
    )
    g = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when((F.col("sx") * F.col("sy")) > 0, 1).otherwise(0))
        .cast("long")
        .alias("concordant"),
        F.sum(F.when((F.col("sx") * F.col("sy")) < 0, 1).otherwise(0))
        .cast("long")
        .alias("discordant"),
        F.sum(F.when(F.col("sx") == 0, 1).otherwise(0)).cast("long").alias("ties_x"),
        F.sum(F.when(F.col("sy") == 0, 1).otherwise(0)).cast("long").alias("ties_y"),
    )
    nb = wide.agg(F.count(F.lit(1)).cast("long").alias("n_brands")).withColumn(
        "_one", F.lit(1)
    )
    num = (F.col("concordant") - F.col("discordant")).cast("double")
    den = F.sqrt(
        (F.col("n_pairs") - F.col("ties_x")).cast("double")
        * (F.col("n_pairs") - F.col("ties_y")).cast("double")
    )
    return (
        g.withColumn("_one", F.lit(1))
        .join(F.broadcast(nb), "_one")
        .select(
            "n_brands",
            "n_pairs",
            "concordant",
            "discordant",
            F.round(num / den, 9).alias("tau_b"),
        )
    )


def hhi_concentration(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation — the "how many suppliers actually matter" audit that
    `revenue_gini` (customer spend inequality) doesn't answer: HHI =
    sum(share_i^2) and its reciprocal 1/HHI is the EFFECTIVE number of
    suppliers, the number a procurement or shard-balancing decision
    actually sees. HHI -> 1: a monopoly supplier (that nation's supply
    chain is one failure domain); HHI -> 1/K: perfectly balanced.

    Determinism: per-supplier revenue is the e4-unit exact integer;
    the sum of squares is exact DECIMAL(38,0) (e4 values square past
    int64 — ~1e11 revenue squares to 1e22), mirrored by HUGEINT in the
    oracle; both engines promote the exact integer to double once for
    the single final sq_sum/total^2 division, ROUNDED 9.

    Scale shape: one grouped sum per (nation, supplier) with the
    supplier->nation dim broadcast (map-side combined on l_suppkey);
    everything after is nation x supplier sized, and the second
    aggregate to nation level is a K-row shuffle. No window, no join
    after the dim hookup.
    """
    per = (
        lineitem.join(
            F.broadcast(
                supplier.join(
                    F.broadcast(nation),
                    supplier.s_nationkey == nation.n_nationkey,
                ).select("s_suppkey", "n_name")
            ),
            lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            "n_name",
            "s_suppkey",
            (_cents("l_extendedprice") * (F.lit(100).cast("long") - _cents("l_discount"))).alias(
                "r_e4"
            ),
        )
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum("r_e4").cast("long").alias("rev_e4"))
    )
    dec = F.col("rev_e4").cast("decimal(38,0)")
    g = per.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("rev_e4").cast("long").alias("total_e4"),
        F.sum(dec * dec).cast("decimal(38,0)").alias("sq_e8"),
    )
    tot2 = F.col("total_e4").cast("double") * F.col("total_e4").cast("double")
    sq = F.col("sq_e8").cast("double")
    return g.select(
        "n_name",
        "n_suppliers",
        "total_e4",
        F.round(sq / tot2, 9).alias("hhi"),
        F.round(tot2 / sq, 6).alias("eff_suppliers"),
    )


def copurchase_lift(
    lineitem: DataFrame,
    part: DataFrame,
    min_brand_orders: int = 20,
    min_cooc: int = 3,
) -> DataFrame:
    """Market-basket association over brands within an order: support,
    co-occurrence, and lift for every brand pair that clears the
    a-priori gates — the classic training signal for product
    recommendation and the warehouse-side analogue of
    `event_type_affinity` (which lifts event types over USERS; this
    lifts catalog brands over ORDERS, where the basket is the unit).
    lift > 1: the pair co-sells beyond chance (bundle/cache them
    together); lift < 1: substitutes.

    Determinism: all counts are exact distinct-order counts (a brand
    twice in one order counts once — the DISTINCT basket contract);
    support and lift are single double divisions of int64 products,
    ROUNDED 9; pair identity is ordered (brand_a < brand_b).

    Scale shape: the a-priori discipline — frequent brands (>=
    min_brand_orders baskets) are filtered FIRST and broadcast back, so
    the per-order pair fan-out only sees surviving brands; the pair
    self-join is per-orderkey over the deduped (order, brand) frame
    (fan-out bounded by basket width squared, never catalog squared);
    the co-occurrence gate cuts the output before the lift join.
    """
    ob = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    freq = (
        ob.groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_brand"))
        .where(F.col("n_brand") >= F.lit(int(min_brand_orders)))
        .localCheckpoint(eager=False)
    )
    obf = ob.join(F.broadcast(freq.select("p_brand")), "p_brand").localCheckpoint(
        eager=False
    )
    a = obf.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_a"))
    b = obf.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cooc"))
        .where(F.col("n_cooc") >= F.lit(int(min_cooc)))
    )
    tot = ob.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    ).withColumn("_one", F.lit(1))
    out = (
        pairs.join(
            F.broadcast(freq.withColumnsRenamed({"p_brand": "brand_a", "n_brand": "n_a"})),
            "brand_a",
        )
        .join(
            F.broadcast(freq.withColumnsRenamed({"p_brand": "brand_b", "n_brand": "n_b"})),
            "brand_b",
        )
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(tot), "_one")
    )
    return out.select(
        "brand_a",
        "brand_b",
        "n_cooc",
        "n_a",
        "n_b",
        F.round(F.col("n_cooc").cast("double") / F.col("n_orders").cast("double"), 9).alias(
            "support"
        ),
        F.round(
            (F.col("n_cooc") * F.col("n_orders")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
            9,
        ).alias("lift"),
    )


def discount_quantity_elasticity(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per-brand OLS slope of quantity on discount — does discounting
    move volume for THIS brand? The grouped-regression companion to
    `event_value_regression` (global moments) with the exact-integer
    discipline: slope_e2 is reported in units/discount-point so every
    moment stays int64. Brands where the slope is ~0 are discount-inert
    (stop funding promotions); steep positive slopes identify elastic
    lines (where promo budget actually buys volume).

    Determinism: x = discount in exact integer points (0..10), y =
    quantity in exact integer units; the five moments (n, Sx, Sy, Sxy,
    Sxx) are int64 and slope = (n*Sxy - Sx*Sy)/(n*Sxx - Sx*Sx) is ONE
    double division, ROUNDED 9; brands with zero discount variance
    (den = 0) emit NULL rather than a fake slope.

    Scale shape: one grouped aggregate on brand after the broadcast dim
    hookup (map-side combined); no window, no self-join.
    """
    x = F.round(F.col("l_discount") * 100).cast("long")
    y = F.round(F.col("l_quantity")).cast("long")
    g = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select("p_brand", x.alias("x"), y.alias("y"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("long")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("long")
    return g.select(
        "p_brand",
        "n",
        F.when(den > 0, F.round(num.cast("double") / den.cast("double"), 9)).alias(
            "slope_per_point"
        ),
    )


def return_rate_wilson(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per-brand return rate with a 95% Wilson score interval — the
    inference-grade version of a naive returns/total ratio: Wilson
    bounds stay inside [0,1] and stay honest at small n, so a brand
    with 2 returns of 3 items doesn't outrank one with 200 of 1000 in
    a "worst returners" triage. The interval IS the decision artifact:
    flag brands whose LOWER bound clears the fleet rate.

    Determinism: k (returned) and n (total) are exact counts; p, the
    z=1.96 constant, and every derived term are doubles computed in ONE
    pinned operation order mirrored token-for-token by the oracle
    (z^2 appears only as the literal 3.8416 on both sides), ROUNDED 9.

    Scale shape: one grouped count per brand after the broadcast dim
    hookup (map-side combined). Nothing else.
    """
    g = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
    )
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    denom = F.lit(1.0) + F.lit(3.8416) / nd
    center = p + F.lit(3.8416) / (F.lit(2.0) * nd)
    half = F.lit(1.96) * F.sqrt(
        (p * (F.lit(1.0) - p) + F.lit(3.8416) / (F.lit(4.0) * nd)) / nd
    )
    return g.select(
        "p_brand",
        "n",
        "k",
        F.round(p, 9).alias("return_rate"),
        F.round((center - half) / denom, 9).alias("wilson_lo"),
        F.round((center + half) / denom, 9).alias("wilson_hi"),
    )


def brand_pareto(
    lineitem: DataFrame, part: DataFrame, thresholds: tuple = (50, 80, 90)
) -> DataFrame:
    """Pareto coverage of revenue by brand: the smallest number of
    brands whose cumulative revenue reaches 50/80/90% of the total —
    the catalog-concentration curve that decides hot-tier sizing (cache
    / premium placement the brands inside the 80% knee; archive the
    tail). The curve-point complement to `hhi_concentration`'s single
    scalar.

    Determinism: brand revenue is the e4-unit exact integer; brands
    rank by (revenue DESC, brand ASC) row_number over the K-brand
    frame; "reaches t%" compares 100*cum >= t*total in pure int64
    (no percentage ever floats); the reported share is one final
    double division, ROUNDED 9.

    Scale shape: the fact table shuffles once for the brand aggregate
    (part broadcast); the rank window, running sum, and threshold
    probes all run on the K-row brand frame crossed with |thresholds|.
    """
    from pyspark.sql import Window

    rev = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            (_cents("l_extendedprice") * (F.lit(100).cast("long") - _cents("l_discount"))).alias(
                "r_e4"
            ),
        )
        .groupBy("p_brand")
        .agg(F.sum("r_e4").cast("long").alias("rev_e4"))
    )
    w = Window.orderBy(F.col("rev_e4").desc(), F.col("p_brand").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rev.select(
        F.row_number()
        .over(Window.orderBy(F.col("rev_e4").desc(), F.col("p_brand").asc()))
        .cast("long")
        .alias("rk"),
        F.sum("rev_e4").over(w).cast("long").alias("cum"),
    ).localCheckpoint(eager=False)
    tot = cum.agg(
        F.max("cum").cast("long").alias("total"),
        F.max("rk").cast("long").alias("n_brands"),
    ).withColumn("_one", F.lit(1))
    th = (
        lineitem.sparkSession.range(1)
        .select(F.explode(F.array(*[F.lit(int(t)) for t in thresholds])).alias("t"))
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(tot), "_one")
    )
    j = cum.withColumn("_one", F.lit(1)).join(F.broadcast(th), "_one")
    g = (
        j.where(F.lit(100) * F.col("cum") >= F.col("t") * F.col("total"))
        .groupBy("t")
        .agg(
            F.min("rk").cast("long").alias("brands_needed"),
            F.max("n_brands").cast("long").alias("n_brands"),
        )
    )
    return g.select(
        F.col("t").cast("int").alias("threshold_pct"),
        "brands_needed",
        "n_brands",
        F.round(
            F.col("brands_needed").cast("double") / F.col("n_brands").cast("double"),
            9,
        ).alias("brand_fraction"),
    )


def customer_rfm(orders: DataFrame, terciles: int = 3) -> DataFrame:
    """RFM segmentation census: every customer scored 1-3 on Recency
    (latest order day), Frequency (order count), and Monetary (total
    spend), counted per (r,f,m) cell — the marketing-ops workhorse
    behind win-back and VIP targeting, and at pipeline scale the
    stratification key for behavior-balanced training samples. Cell
    (1,3,3) is "lapsed whale" — the list every retention campaign
    starts from.

    Determinism: all three metrics are exact integers (epoch day,
    count, cents); tercile cuts are nearest-rank values ceil(k*n/3) =
    (k*n+2)//3 located on DISTINCT-value frames (`mann_whitney`
    discipline); bucket assignment compares value <= cut in int64, so
    ties share a bucket identically in any engine. No floats anywhere.

    Scale shape: ONE orders aggregate to the customer frame
    (checkpointed — it feeds three cut derivations and the final
    bucketing), three distinct-value windows (value-cardinality
    bounded), three one-row cut frames broadcast back, one grouped
    count on the 27-cell key.
    """
    from pyspark.sql import Window

    day = (F.unix_micros(F.col("o_orderdate")) / F.lit(86_400_000_000)).cast("long")
    cust = (
        orders.select("o_custkey", day.alias("d"), _cents("o_totalprice").alias("cts"))
        .groupBy("o_custkey")
        .agg(
            F.max("d").cast("long").alias("rec"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("cts").cast("long").alias("mon"),
        )
        .localCheckpoint(eager=False)
    )

    def cuts(col: str) -> DataFrame:
        vc = cust.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        wcum = Window.orderBy(F.col("v").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cu = vc.select("v", "c", F.sum("c").over(wcum).cast("long").alias("cum"))
        tot = cu.agg(F.max("cum").cast("long").alias("n")).withColumn("_one", F.lit(1))
        j = cu.withColumn("_one", F.lit(1)).join(F.broadcast(tot), "_one")
        r1 = F.floor((F.col("n") + 2) / 3).cast("long")
        r2 = F.floor((F.lit(2) * F.col("n") + 2) / 3).cast("long")
        b = F.col("cum") - F.col("c")
        return j.agg(
            F.max(F.when((b < r1) & (r1 <= F.col("cum")), F.col("v")))
            .cast("long")
            .alias(f"{col}_c1"),
            F.max(F.when((b < r2) & (r2 <= F.col("cum")), F.col("v")))
            .cast("long")
            .alias(f"{col}_c2"),
        ).withColumn("_one", F.lit(1))

    allcuts = cuts("rec").join(cuts("freq"), "_one").join(cuts("mon"), "_one")

    def bucket(col: str) -> F.Column:
        return (
            F.when(F.col(col) <= F.col(f"{col}_c1"), F.lit(1))
            .when(F.col(col) <= F.col(f"{col}_c2"), F.lit(2))
            .otherwise(F.lit(3))
            .cast("int")
        )

    return (
        cust.withColumn("_one", F.lit(1))
        .join(F.broadcast(allcuts), "_one")
        .select(
            bucket("rec").alias("r_bucket"),
            bucket("freq").alias("f_bucket"),
            bucket("mon").alias("m_bucket"),
        )
        .groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


def fk_fanout_stats(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-FK-edge fan-out distribution (children per parent) for the
    two fact edges: orders per customer and lineitems per order — the
    join-planning numbers that decide shuffle posture BEFORE the job
    runs: mean drives size estimates, p99/max flag the skewed keys that
    need salting (`event_key_skew`'s role, measured on the warehouse
    FKs), and p50 vs mean exposes the long tail.

    Determinism: fan-outs are exact counts; p50 is the DOUBLED median
    m2 = q_lo + q_hi and p99 the nearest-rank (99n+99)//100, both
    located on the DISTINCT-fanout frame by cumulative-count range
    checks. Mean is the one double division, ROUNDED 6.

    Scale shape: per edge, one grouped count on the parent key
    (map-side combined), one grouped count on the DISTINCT fan-out
    value, one window over that bounded frame. The two edges union as
    two-row output.
    """
    from pyspark.sql import Window

    def edge(df: DataFrame, key: str, name: str) -> DataFrame:
        fo = df.groupBy(F.col(key)).agg(F.count(F.lit(1)).cast("long").alias("f"))
        vc = fo.groupBy(F.col("f").alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        wcum = Window.orderBy(F.col("v").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cu = vc.select(
            "v", "c", F.sum("c").over(wcum).cast("long").alias("cum")
        ).localCheckpoint(eager=False)
        tot = cu.agg(
            F.max("cum").cast("long").alias("n"),
            F.sum(F.col("v") * F.col("c")).cast("long").alias("children"),
            F.max("v").cast("long").alias("max_fanout"),
        ).withColumn("_one", F.lit(1))
        j = cu.withColumn("_one", F.lit(1)).join(F.broadcast(tot), "_one")
        b = F.col("cum") - F.col("c")
        r1 = F.floor((F.col("n") + 1) / 2).cast("long")
        r2 = F.floor((F.col("n") + 2) / 2).cast("long")
        r99 = F.floor((F.lit(99) * F.col("n") + 99) / 100).cast("long")
        hit1 = F.when((b < r1) & (r1 <= F.col("cum")), F.col("v")).otherwise(F.lit(0))
        hit2 = F.when((b < r2) & (r2 <= F.col("cum")), F.col("v")).otherwise(F.lit(0))
        hit99 = F.when((b < r99) & (r99 <= F.col("cum")), F.col("v"))
        return j.agg(
            F.max("n").alias("n_parents"),
            F.max("children").alias("n_children"),
            F.round(
                F.max("children").cast("double") / F.max("n").cast("double"), 6
            ).alias("mean_fanout"),
            F.round(
                F.sum(hit1 + hit2).cast("double") / F.lit(2.0), 1
            ).alias("p50_fanout"),
            F.max(hit99).cast("long").alias("p99_fanout"),
            F.max("max_fanout").alias("max_fanout"),
        ).select(
            F.lit(name).alias("edge"),
            "n_parents",
            "n_children",
            "mean_fanout",
            "p50_fanout",
            "p99_fanout",
            "max_fanout",
        )

    return edge(orders, "o_custkey", "orders_per_customer").unionByName(
        edge(lineitem, "l_orderkey", "lineitems_per_order")
    )


def order_reconciliation(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Header-vs-detail reconciliation of the orders fact: compare each
    order's header total against the charge recomputed from its line
    items (E*(100-D)*(100+T) in exact e6 units) and band the relative
    error — the classic warehouse closing audit. On THIS synthetic
    testdata the header is generated independently of the lines, so
    the report documents that disagreement deterministically (every
    band count is an exact integer contract); on a real warehouse the
    same query is the invariant gate.

    Determinism: both sides are exact e6-unit integers; band
    membership compares 100*|diff| <= k*header_e6 in pure int64;
    orphan headers (no lines) are counted by the anti-join.

    Scale shape: one orderkey-grouped sum over lineitem, one
    orderkey-keyed join to headers (the natural co-partitioned key),
    one global aggregate. No window.
    """
    charge_e6 = (
        _cents("l_extendedprice")
        * (F.lit(100).cast("long") - _cents("l_discount"))
        * (F.lit(100).cast("long") + _cents("l_tax"))
    )
    lines = lineitem.groupBy("l_orderkey").agg(
        F.sum(charge_e6).cast("long").alias("line_e6")
    )
    hdr = orders.select(
        "o_orderkey", (_cents("o_totalprice") * F.lit(10_000).cast("long")).alias("hdr_e6")
    )
    j = hdr.join(lines, hdr.o_orderkey == lines.l_orderkey, "left")
    diff = F.abs(F.col("hdr_e6") - F.col("line_e6"))
    has = F.col("line_e6").isNotNull()
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(~has, 1).otherwise(0)).cast("long").alias("n_orphan_headers"),
        F.sum(F.when(has & (F.lit(100) * diff <= F.lit(1) * F.col("hdr_e6")), 1).otherwise(0))
        .cast("long")
        .alias("n_within_1pct"),
        F.sum(F.when(has & (F.lit(100) * diff <= F.lit(10) * F.col("hdr_e6")), 1).otherwise(0))
        .cast("long")
        .alias("n_within_10pct"),
        F.sum(F.when(has & (F.lit(100) * diff <= F.lit(50) * F.col("hdr_e6")), 1).otherwise(0))
        .cast("long")
        .alias("n_within_50pct"),
        F.max(F.when(has, diff)).cast("long").alias("max_abs_diff_e6"),
    )


def brand_yoy_growth(lineitem: DataFrame, orders: DataFrame, part: DataFrame) -> DataFrame:
    """Year-over-year brand revenue growth table: per (brand, year)
    exact e4 revenue joined to the SAME brand's prior year — the mover
    report behind `rank_stability`'s single drift scalar (rho says the
    ordering churned; this names the brands and years that did it).
    Growth is emitted in basis points of the prior year so the column
    is an exact-integer-derived ratio, ROUNDED 6.

    Scale shape: the fact table shuffles once on orderkey (part
    broadcast), one grouped sum on (brand, year), then a self-join of
    the brand-year frame on (brand, year-1) — K x years rows,
    checkpointed once across both sides.
    """
    rev = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            F.year(F.col("o_orderdate")).cast("int").alias("yr"),
            (_cents("l_extendedprice") * (F.lit(100).cast("long") - _cents("l_discount"))).alias(
                "r_e4"
            ),
        )
        .groupBy("p_brand", "yr")
        .agg(F.sum("r_e4").cast("long").alias("rev_e4"))
        .localCheckpoint(eager=False)
    )
    prev = rev.select(
        F.col("p_brand").alias("pb"),
        (F.col("yr") + 1).alias("py"),
        F.col("rev_e4").alias("prev_e4"),
    )
    j = rev.join(
        prev, (rev.p_brand == prev.pb) & (rev.yr == prev.py), "inner"
    )
    return j.select(
        "p_brand",
        "yr",
        "rev_e4",
        "prev_e4",
        F.round(
            (F.col("rev_e4") - F.col("prev_e4")).cast("double")
            / F.col("prev_e4").cast("double"),
            6,
        ).alias("yoy_growth"),
    )


def single_source_parts(lineitem: DataFrame) -> DataFrame:
    """Supply-chain concentration census over OBSERVED part-supplier
    pairs: how many traded parts have exactly one supplier (a
    single-point-of-failure), two, or three-plus — the risk roll-up
    `hhi_concentration` (revenue-weighted, per nation) doesn't answer
    at the part grain. All counts exact; shares one division each,
    ROUNDED 9.

    Scale shape: one DISTINCT (part, supplier) projection, one grouped
    count per part, one 3-bucket aggregate.
    """
    ps = lineitem.select("l_partkey", "l_suppkey").distinct()
    per = ps.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("k"))
    g = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).cast("long").alias("n_single"),
        F.sum(F.when(F.col("k") == 2, 1).otherwise(0)).cast("long").alias("n_two"),
        F.sum(F.when(F.col("k") >= 3, 1).otherwise(0)).cast("long").alias("n_three_plus"),
    )
    return g.select(
        "n_parts",
        "n_single",
        "n_two",
        "n_three_plus",
        F.round(
            F.col("n_single").cast("double") / F.col("n_parts").cast("double"), 9
        ).alias("single_share"),
    )


def basket_diversity(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Distinct-brand diversity of order baskets: how many distinct
    brands an order touches (1 / 2 / 3+ histogram and the exact mean)
    — the basket-width number that bounds `copurchase_lift`'s pair
    fan-out and tells merchandising whether cross-brand bundles even
    have raw material. All counts exact; mean and shares one division
    each, ROUNDED 6/9.

    Scale shape: one DISTINCT (order, brand) projection after the
    broadcast dim hookup, one grouped count per order, one 3-bucket
    aggregate.
    """
    ob = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    per = ob.groupBy("l_orderkey").agg(F.count(F.lit(1)).cast("long").alias("k"))
    g = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("k").cast("long").alias("n_order_brands"),
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).cast("long").alias("n_1"),
        F.sum(F.when(F.col("k") == 2, 1).otherwise(0)).cast("long").alias("n_2"),
        F.sum(F.when(F.col("k") >= 3, 1).otherwise(0)).cast("long").alias("n_3plus"),
    )
    return g.select(
        "n_orders",
        F.round(
            F.col("n_order_brands").cast("double") / F.col("n_orders").cast("double"),
            6,
        ).alias("mean_brands"),
        "n_1",
        "n_2",
        "n_3plus",
        F.round(F.col("n_1").cast("double") / F.col("n_orders").cast("double"), 9).alias(
            "single_brand_share"
        ),
    )


def priority_leadtime(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Ship lead time by order priority: does the priority flag
    actually move the warehouse? Per priority class, the exact-day
    distribution of (ship date - order date) as mean, doubled-median,
    and nearest-rank p95 — the SLA evidence behind promising 1-URGENT
    customers anything. Equal medians across classes mean the flag is
    decorative.

    Determinism: lead times are exact integer day differences; median
    and p95 are located on the per-priority DISTINCT-gap frame by
    cumulative-count range checks (the `mann_whitney` discipline);
    mean is the one double division, ROUNDED 6.

    Scale shape: the fact join shuffles once on orderkey; one grouped
    count per (priority, gap); windows over the priority x distinct-gap
    frame only.
    """
    from pyspark.sql import Window

    d = (
        (F.unix_micros(F.col("l_shipdate")) / F.lit(86_400_000_000)).cast("long")
        - (F.unix_micros(F.col("o_orderdate")) / F.lit(86_400_000_000)).cast("long")
    )
    vc = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(F.col("o_orderpriority").alias("pr"), d.alias("v"))
        .groupBy("pr", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wcum = (
        Window.partitionBy("pr")
        .orderBy(F.col("v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cu = vc.select(
        "pr", "v", "c", F.sum("c").over(wcum).cast("long").alias("cum")
    ).localCheckpoint(eager=False)
    tot = cu.groupBy("pr").agg(
        F.max("cum").cast("long").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("sv"),
    )
    j = cu.join(F.broadcast(tot), "pr")
    b = F.col("cum") - F.col("c")
    r1 = F.floor((F.col("n") + 1) / 2).cast("long")
    r2 = F.floor((F.col("n") + 2) / 2).cast("long")
    r95 = F.floor((F.lit(19) * F.col("n") + 19) / 20).cast("long")
    hit1 = F.when((b < r1) & (r1 <= F.col("cum")), F.col("v")).otherwise(F.lit(0))
    hit2 = F.when((b < r2) & (r2 <= F.col("cum")), F.col("v")).otherwise(F.lit(0))
    hit95 = F.when((b < r95) & (r95 <= F.col("cum")), F.col("v"))
    return (
        j.groupBy("pr")
        .agg(
            F.max("n").alias("n_items"),
            F.round(F.max("sv").cast("double") / F.max("n").cast("double"), 6).alias(
                "mean_days"
            ),
            F.round(F.sum(hit1 + hit2).cast("double") / F.lit(2.0), 1).alias(
                "median_days"
            ),
            F.max(hit95).cast("long").alias("p95_days"),
        )
        .select(
            F.col("pr").alias("o_orderpriority"),
            "n_items",
            "mean_days",
            "median_days",
            "p95_days",
        )
    )


def price_ending_profile(orders: DataFrame, top_k: int = 10) -> DataFrame:
    """Psychological-pricing audit: the cents endings (total mod 100)
    that dominate order totals, top-k by count — generated/synthetic
    price books are UNIFORM over endings while human price books pile
    onto .99/.95/.00, so the profile is both a data-provenance
    fingerprint and a retail-pricing dashboard staple. All counts
    exact; share is one division, ROUNDED 9; ranking is
    (count DESC, ending ASC) — fully tie-broken.

    Scale shape: one grouped count on a <=100-value key (map-side
    combined), one window over the 100-row frame, one broadcast total.
    """
    from pyspark.sql import Window

    e = (_cents("o_totalprice") % F.lit(100)).cast("int")
    g = (
        orders.select(e.alias("ending"))
        .groupBy("ending")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # the <=100-row ending frame feeds the total AND the ranked
        # output — checkpoint once so the corpus count runs once
        .localCheckpoint(eager=False)
    )
    tot = g.agg(F.sum("c").cast("long").alias("t")).withColumn("_one", F.lit(1))
    w = Window.orderBy(F.col("c").desc(), F.col("ending").asc())
    return (
        g.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(top_k)))
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(tot), "_one")
        .select(
            "rank",
            "ending",
            F.col("c").alias("n_orders"),
            F.round(F.col("c").cast("double") / F.col("t").cast("double"), 9).alias(
                "share"
            ),
        )
    )


def realized_vs_retail(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Realized-vs-list price ratio per brand: the revenue actually
    booked against what the catalog's retail price would have billed
    for the same units — the aggregate markup/markdown depth that
    `discount_elasticity` (does discounting move volume) presumes but
    never states. Ratio < 1: the brand sells below list (promo-heavy);
    ratio > 1: premium realization.

    Determinism: both sides of the ratio are exact integer sums —
    realized = sum(extendedprice cents), list = sum(qty * retail
    cents) — so the ratio is ONE double division of int64 totals,
    ROUNDED 9. No per-row division ever happens.

    Scale shape: one grouped sum per brand after the broadcast dim
    hookup (map-side combined). Nothing else.
    """
    qty = F.round(F.col("l_quantity")).cast("long")
    g = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            _cents("l_extendedprice").alias("e100"),
            (qty * _cents("p_retailprice")).alias("list_e2"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("e100").cast("long").alias("realized_cents"),
            F.sum("list_e2").cast("long").alias("list_cents"),
        )
    )
    return g.select(
        "p_brand",
        "n_items",
        "realized_cents",
        "list_cents",
        F.round(
            F.col("realized_cents").cast("double") / F.col("list_cents").cast("double"),
            9,
        ).alias("realization_ratio"),
    )


def segment_acctbal_profile(customer: DataFrame) -> DataFrame:
    """Account-balance solvency profile per market segment: the share
    of customers in the red and the exact-cents quartiles — the credit
    posture behind per-segment payment terms. A segment with a fat
    negative tail needs prepayment rules its median customer doesn't.

    Determinism: balances are exact (possibly negative) integer cents;
    quartiles are nearest-rank values located on the per-segment
    DISTINCT-value frame (`mann_whitney` rank discipline); the
    negative share is one double division, ROUNDED 9.

    Scale shape: one grouped count per (segment, cents) — map-side
    combined; windows over the segment x distinct-value frame only.
    """
    from pyspark.sql import Window

    vc = (
        customer.select(
            F.col("c_mktsegment").alias("seg"), _cents("c_acctbal").alias("v")
        )
        .groupBy("seg", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wcum = (
        Window.partitionBy("seg")
        .orderBy(F.col("v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cu = vc.select(
        "seg", "v", "c", F.sum("c").over(wcum).cast("long").alias("cum")
    ).localCheckpoint(eager=False)
    tot = cu.groupBy("seg").agg(
        F.max("cum").cast("long").alias("n"),
        F.sum(F.when(F.col("v") < 0, F.col("c")).otherwise(0)).cast("long").alias("n_neg"),
    )
    j = cu.join(F.broadcast(tot), "seg")
    b = F.col("cum") - F.col("c")

    def at(k: int):
        r = F.floor((F.lit(k) * F.col("n") + 3) / 4).cast("long")
        return F.max(F.when((b < r) & (r <= F.col("cum")), F.col("v"))).cast("long")

    return (
        j.groupBy("seg")
        .agg(
            F.max("n").alias("n_customers"),
            F.max("n_neg").alias("n_negative"),
            at(1).alias("q1_cents"),
            at(2).alias("q2_cents"),
            at(3).alias("q3_cents"),
        )
        .select(
            F.col("seg").alias("c_mktsegment"),
            "n_customers",
            "n_negative",
            F.round(
                F.col("n_negative").cast("double") / F.col("n_customers").cast("double"),
                9,
            ).alias("negative_share"),
            "q1_cents",
            "q2_cents",
            "q3_cents",
        )
    )


def supplier_balance_revenue_corr(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """Pearson correlation between a supplier's account balance and the
    revenue it actually books — do healthy balance sheets trade more?
    A near-zero r says acctbal is stale bookkeeping, not a capacity
    signal; planners should stop weighting it.

    Determinism: per-supplier revenue is the e4-unit exact integer and
    balances exact cents; the five Pearson moments are exact —
    cross-products ride DECIMAL(38,0) (HUGEINT in the oracle; e4
    revenue x cents products pass int64 at scale) — and r is assembled
    from those integers in ONE pinned double operation order,
    ROUNDED 6; NULL on zero variance.

    Scale shape: one grouped sum per supplier (map-side combined on
    l_suppkey), the supplier dim broadcast in, one global aggregate
    over the supplier frame.
    """
    rev = (
        lineitem.select(
            "l_suppkey",
            (_cents("l_extendedprice") * (F.lit(100).cast("long") - _cents("l_discount"))).alias(
                "r_e4"
            ),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("r_e4").cast("long").alias("rev_e4"))
    )
    j = rev.join(
        F.broadcast(supplier.select("s_suppkey", _cents("s_acctbal").alias("bal"))),
        rev.l_suppkey == F.col("s_suppkey"),
    ).select(F.col("bal").alias("x"), F.col("rev_e4").alias("y"))
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    g = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = (nd * F.col("sxy") - F.col("sx").cast("decimal(38,0)") * F.col("sy").cast("decimal(38,0)")).cast("double")
    vx = (nd * F.col("sxx") - F.col("sx").cast("decimal(38,0)") * F.col("sx").cast("decimal(38,0)")).cast("double")
    vy = (nd * F.col("syy") - F.col("sy").cast("decimal(38,0)") * F.col("sy").cast("decimal(38,0)")).cast("double")
    return g.select(
        F.col("n").alias("n_suppliers"),
        F.when((vx > 0) & (vy > 0), F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6)).alias(
            "balance_revenue_corr"
        ),
    )


def basket_size_value(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Mean order value by basket size (lines per order, bucketed
    1/2/3/4+): does a bigger basket mean a bigger ticket, and by how
    much — the cross-sell payoff curve that decides whether
    add-to-cart nudges are worth screen space. All sums exact cents;
    per-bucket mean is one division, ROUNDED 6.

    Scale shape: one orderkey-grouped line count, one orderkey join to
    headers (the natural co-partitioned key), one 4-bucket aggregate.
    """
    lc = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    j = orders.select("o_orderkey", _cents("o_totalprice").alias("cents")).join(
        lc, F.col("o_orderkey") == F.col("l_orderkey")
    )
    bucket = (
        F.when(F.col("k") == 1, F.lit("1"))
        .when(F.col("k") == 2, F.lit("2"))
        .when(F.col("k") == 3, F.lit("3"))
        .otherwise(F.lit("4+"))
    )
    g = j.select(bucket.alias("lines_bucket"), "cents").groupBy("lines_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    return g.select(
        "lines_bucket",
        "n_orders",
        "sum_cents",
        F.round(
            F.col("sum_cents").cast("double")
            / (F.col("n_orders").cast("double") * F.lit(100.0)),
            6,
        ).alias("mean_value"),
    )


def priority_mix_drift(orders: DataFrame) -> DataFrame:
    """Per-year chi-square of the order-priority mix against the
    all-years mix — is the priority distribution stationary, or did
    some year's customers (or intake form) shift it? The categorical
    drift gate for any dimension whose mix downstream models assume
    static; the per-year statistic localizes WHEN it moved, which the
    global `priority_segment_chisq` association number can't.

    Determinism: with year total N_y, priority total C_p, and grand
    total N, each cell's term is (N*o - N_y*C_p)^2 / (N*N_y*C_p) —
    numerator squares ride DECIMAL(38,0)/HUGEINT, denominator exact
    int64, one double division per cell and a years x priorities
    double sum, ROUNDED 6. The grid is COMPLETED (missing cells owe
    their expected mass).

    Scale shape: one grouped count per (year, priority); the grid and
    all marginals are category-cardinality frames; one year-keyed
    aggregate.
    """
    yr = F.year(F.col("o_orderdate")).cast("int")
    cells = (
        orders.select(yr.alias("y"), F.col("o_orderpriority").alias("p"))
        .groupBy("y", "p")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    ym = cells.groupBy("y").agg(F.sum("o").cast("long").alias("n_y"))
    pm = cells.groupBy("p").agg(F.sum("o").cast("long").alias("c_p"))
    tot = cells.agg(F.sum("o").cast("long").alias("nn")).withColumn("_one", F.lit(1))
    grid = (
        ym.withColumn("_one", F.lit(1))
        .join(F.broadcast(pm.withColumn("_one", F.lit(1))), "_one")
        .join(F.broadcast(cells), ["y", "p"], "left")
        .join(F.broadcast(tot), "_one")
        .select(
            "y",
            "n_y",
            "c_p",
            "nn",
            F.coalesce("o", F.lit(0)).cast("long").alias("o"),
        )
    )
    dev = (F.col("nn") * F.col("o") - F.col("n_y") * F.col("c_p")).cast("decimal(38,0)")
    term = (dev * dev).cast("double") / (
        F.col("nn") * F.col("n_y") * F.col("c_p")
    ).cast("double")
    return (
        grid.groupBy("y")
        .agg(
            F.max("n_y").alias("n_orders"),
            F.round(F.sum(term), 6).alias("chisq_vs_global"),
        )
        .select(F.col("y").alias("order_year"), "n_orders", "chisq_vs_global")
    )


def customer_brand_breadth(lineitem: DataFrame, orders: DataFrame, part: DataFrame) -> DataFrame:
    """Lifetime brand breadth per customer, bucketed (1-2 / 3-5 / 6+):
    how many distinct brands a customer ever buys — the loyalty-vs-
    explorer census that `basket_diversity` measures per ORDER and
    this measures per RELATIONSHIP; wide-breadth customers are the
    cross-sell audience, narrow ones the brand-loyalty one. All counts
    exact; mean and shares one division each, ROUNDED 6/9.

    Scale shape: one DISTINCT (customer, brand) projection (fact join
    shuffles on orderkey, part broadcast), one grouped count per
    customer, one 3-bucket aggregate.
    """
    cb = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select("o_custkey", "p_brand")
        .distinct()
    )
    per = cb.groupBy("o_custkey").agg(F.count(F.lit(1)).cast("long").alias("k"))
    g = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("k").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("k") <= 2, 1).otherwise(0)).cast("long").alias("n_narrow"),
        F.sum(F.when((F.col("k") >= 3) & (F.col("k") <= 5), 1).otherwise(0))
        .cast("long")
        .alias("n_mid"),
        F.sum(F.when(F.col("k") >= 6, 1).otherwise(0)).cast("long").alias("n_wide"),
    )
    return g.select(
        "n_customers",
        F.round(
            F.col("n_pairs").cast("double") / F.col("n_customers").cast("double"), 6
        ).alias("mean_brands"),
        "n_narrow",
        "n_mid",
        "n_wide",
        F.round(
            F.col("n_wide").cast("double") / F.col("n_customers").cast("double"), 9
        ).alias("wide_share"),
    )


def nation_trade_balance(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Per-nation trade balance: revenue its suppliers EXPORT (book as
    the selling side) vs what its customers IMPORT (spend as the
    buying side), and the export/import ratio — the macro roll-up of
    `bilateral_trade`'s pair matrix. Ratio >> 1: a producer nation;
    << 1: a consumer nation; the imbalance drives where warehouse
    co-location actually pays.

    Determinism: both sides are exact e4-unit integer sums computed by
    two independent aggregations of the same fact join; the full-outer
    nation join coalesces missing sides to 0; the ratio is one double
    division, NULL when imports are zero, ROUNDED 6.

    Scale shape: the fact table shuffles once on orderkey; supplier /
    customer / nation broadcast; each side is one grouped sum at
    nation grain; the final join is 25x25-bounded.
    """
    rev_e4 = (
        _cents("l_extendedprice") * (F.lit(100).cast("long") - _cents("l_discount"))
    )
    base = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supplier.select("s_suppkey", F.col("s_nationkey").alias("snk"))),
            lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", F.col("c_nationkey").alias("cnk"))),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select("snk", "cnk", rev_e4.alias("r_e4"))
        .localCheckpoint(eager=False)
    )
    exp = base.groupBy("snk").agg(F.sum("r_e4").cast("long").alias("export_e4"))
    imp = base.groupBy("cnk").agg(F.sum("r_e4").cast("long").alias("import_e4"))
    n = nation.select(F.col("n_nationkey").alias("nk"), "n_name")
    # broadcast the RIGHT sides: Spark cannot build-left for a
    # left-outer broadcast join, and the nation-grain sums are tiny
    j = (
        n.join(F.broadcast(exp), F.col("nk") == F.col("snk"), "left")
        .join(F.broadcast(imp), F.col("nk") == F.col("cnk"), "left")
        .select(
            "n_name",
            F.coalesce("export_e4", F.lit(0)).cast("long").alias("export_e4"),
            F.coalesce("import_e4", F.lit(0)).cast("long").alias("import_e4"),
        )
    )
    return j.select(
        "n_name",
        "export_e4",
        "import_e4",
        (F.col("export_e4") - F.col("import_e4")).cast("long").alias("balance_e4"),
        F.when(
            F.col("import_e4") > 0,
            F.round(
                F.col("export_e4").cast("double") / F.col("import_e4").cast("double"), 6
            ),
        ).alias("export_import_ratio"),
    )


def brand_market_presence(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """Geographic presence per brand: how many distinct supplier
    nations produce it and how many distinct customer nations buy it —
    the reach table behind replication policy (a brand bought
    everywhere but made in one nation is a routing hotspot;
    `single_source_parts` lifted to nation grain). All values exact
    distinct counts over the traded fact.

    Scale shape: one fact join (orderkey shuffle, dims broadcast), the
    (brand, nation) frame checkpointed once, two DISTINCT projections,
    one brand-grain aggregate.
    """
    base = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supplier.select("s_suppkey", F.col("s_nationkey").alias("snk"))),
            lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", F.col("c_nationkey").alias("cnk"))),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select("p_brand", "snk", "cnk")
        .localCheckpoint(eager=False)
    )
    sup = base.select("p_brand", "snk").distinct().groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_supplier_nations")
    )
    cus = base.select("p_brand", "cnk").distinct().groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_customer_nations")
    )
    return sup.join(cus, "p_brand", "full_outer").select(
        "p_brand",
        F.coalesce("n_supplier_nations", F.lit(0)).cast("long").alias(
            "n_supplier_nations"
        ),
        F.coalesce("n_customer_nations", F.lit(0)).cast("long").alias(
            "n_customer_nations"
        ),
    )
