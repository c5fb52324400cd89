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
