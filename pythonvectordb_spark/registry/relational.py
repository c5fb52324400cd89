"""Relational analytics: TPC-H-shaped queries, warehouse statistics, pivots/rollups/grouping sets, DQ checks.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import (
    DataFrame,
    F,
    RL,
    SparkSession,
    Window,
    _PRIORITY_PIVOT,
    load_table,
)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary (exact integer-cents aggregation)."""
    return RL.pricing_summary(load_table(spark, sf_dir, "lineitem"))


def o_pricing_summary() -> str:
    return """
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS e100,
         CAST(round(l_discount * 100) AS BIGINT) AS d100,
         CAST(round(l_tax * 100) AS BIGINT) AS t100
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(qty) AS BIGINT) AS sum_qty,
       CAST(sum(e100) AS BIGINT) AS sum_base_cents,
       CAST(sum(e100 * (100 - d100)) AS BIGINT) AS sum_disc_e4,
       CAST(sum(e100 * (100 - d100) * (100 + t100)) AS BIGINT) AS sum_charge_e6,
       round(sum(qty)::DOUBLE / count(*)::DOUBLE, 6) AS avg_qty,
       round(sum(e100)::DOUBLE / 100.0 / count(*)::DOUBLE, 6) AS avg_price,
       round(sum(d100)::DOUBLE / 100.0 / count(*)::DOUBLE, 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM li GROUP BY l_returnflag, l_linestatus
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shape: top-10 open orders by revenue, BUILDING segment."""
    return RL.shipping_priority(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


def o_shipping_priority() -> str:
    return """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, l_orderkey ASC LIMIT 10
"""


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape: per-nation revenue in ASIA (5-table join chain)."""
    return RL.regional_revenue(
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


def o_regional_revenue() -> str:
    return """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
GROUP BY n_name
"""


def q_part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand part stats incl. conditional aggregation (CASE inside
    SUM) and string predicates."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.round(F.col("p_retailprice") * 100).cast("long")).cast("long").alias(
            "retail_cents"
        ),
        F.min("p_size").cast("int").alias("min_size"),
        F.max("p_size").cast("int").alias("max_size"),
        F.sum(F.when(F.col("p_type").contains("BRASS"), 1).otherwise(0))
        .cast("long")
        .alias("n_brass"),
    )


def o_part_brand_stats() -> str:
    return """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS retail_cents,
       CAST(min(p_size) AS INT) AS min_size,
       CAST(max(p_size) AS INT) AS max_size,
       CAST(sum(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END) AS BIGINT) AS n_brass
FROM part GROUP BY p_brand
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shape single-pass filtered aggregate."""
    return RL.forecast_revenue(load_table(spark, sf_dir, "lineitem"))


def o_forecast_revenue() -> str:
    return """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND CAST(round(l_quantity) AS BIGINT) < 24
"""


def q_customer_order_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: per-customer order sequence + running spend."""
    return RL.customer_order_running(load_table(spark, sf_dir, "orders"))


def o_customer_order_running() -> str:
    return """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS INT) AS order_seq,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS running_cents,
       CAST(lag(o_orderkey, 1) OVER w AS BIGINT) AS prev_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shape: revenue by supplier nation x customer nation x year."""
    return RL.bilateral_trade(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def o_bilateral_trade() -> str:
    return """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
GROUP BY 1, 2, 3
"""


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shape: customers histogrammed by order count (left outer
    join keeps zero-order customers)."""
    return RL.customer_distribution(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def o_customer_distribution() -> str:
    return """
WITH per_cust AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
"""


def q_brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shape: one brand's revenue share (conditional agg +
    deterministic division)."""
    return RL.brand_revenue_share(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_brand_revenue_share() -> str:
    return """
WITH agg AS (
  SELECT CAST(sum(CASE WHEN p_brand = 'Brand#1'
                       THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       ELSE 0 END) AS BIGINT) AS brand_revenue_e4,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_revenue_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT brand_revenue_e4, total_revenue_e4,
       round(100.0 * brand_revenue_e4::DOUBLE / total_revenue_e4::DOUBLE, 6) AS brand_share_pct
FROM agg
"""


def q_mktsegment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate: per-segment + grand total."""
    return RL.mktsegment_rollup(load_table(spark, sf_dir, "customer"))


def o_mktsegment_rollup() -> str:
    return """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer GROUP BY ROLLUP(c_mktsegment)
"""


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shape: EXISTS semi-join + grouped counts."""
    return RL.order_priority_counts(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def o_order_priority_counts() -> str:
    return """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q_nation_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension join + per-nation customer aggregates."""
    return RL.nation_customer_stats(
        load_table(spark, sf_dir, "nation"), load_table(spark, sf_dir, "customer")
    )


def o_nation_customer_stats() -> str:
    return """
WITH j AS (
  SELECT n_name, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS acctbal_cents,
       round(sum(cents)::DOUBLE / 100.0 / count(*)::DOUBLE, 6) AS avg_acctbal
FROM j GROUP BY n_name
"""


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event values per event_type
    (SURVEY §2.9 latency-percentile analogue, exact `percentile` not the
    approx sketch)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def o_value_percentiles() -> str:
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(value::DOUBLE, 0.25), 6) AS p25,
       round(quantile_cont(value::DOUBLE, 0.5), 6) AS p50,
       round(quantile_cont(value::DOUBLE, 0.95), 6) AS p95,
       min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY event_type
"""


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all grouping-set combinations."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    return (
        ev.withColumn("day_epoch", day)
        .cube("event_type", "day_epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
        )
    )


def o_events_cube() -> str:
    return """
SELECT event_type,
       CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY CUBE(event_type, CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT))
"""


def q_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra (SURVEY §2.7): customers with orders in BOTH halves of
    the date range (intersect) and customers with NO orders (except)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    early = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    late = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = early.intersect(late).withColumn("kind", F.lit("both_periods"))
    never = (
        cust.select("c_custkey")
        .exceptAll(orders.select(F.col("o_custkey").alias("c_custkey")).distinct())
        .withColumn("kind", F.lit("no_orders"))
    )
    return both.unionByName(never)


def o_customer_set_ops() -> str:
    return """
SELECT c_custkey, 'both_periods' AS kind FROM (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
)
UNION ALL
SELECT c_custkey, 'no_orders' AS kind FROM (
  SELECT c_custkey FROM customer
  EXCEPT ALL
  SELECT DISTINCT o_custkey FROM orders
)
"""


def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shape: orders whose total quantity exceeds a threshold
    (agg-then-join; the grouped HAVING side streams through a partial
    aggregate before the join, so the join input is already reduced)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
            F.col("sum_qty"),
        )
    )


def o_large_volume_orders() -> str:
    return """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
       CAST(sum_qty AS BIGINT) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 180) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_brand_size_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shape: disjunctive multi-attribute predicates across a
    broadcast part join (OR-of-ANDs; Catalyst pushes the common join key
    and evaluates the residual disjunction post-join)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.round("l_quantity").cast("long")
    joined = lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50) & qty.between(20, 30))
    )
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    return joined.filter(cond).agg(
        F.sum(e100 * (F.lit(100) - d100)).cast("long").alias("revenue_e4"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


def o_brand_size_revenue() -> str:
    return """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shape: revenue from lineitems below half their part's
    average quantity (per-group scalar subquery decorrelated into an
    agg-then-join; the per-part average is a reduced table, so the join
    shuffles only |parts| rows on the build side).

    Exact parity: l_quantity is integral-valued, so sum/count are exact
    integers and the avg division is bit-identical IEEE double division
    in both engines.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    qty = F.round("l_quantity").cast("long")
    pa = lineitem.groupBy("l_partkey").agg(
        (F.sum(qty).cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_qty")
    ).withColumnRenamed("l_partkey", "pa_partkey")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        lineitem.join(pa, lineitem.l_partkey == pa.pa_partkey)
        .filter(qty.cast("double") < 0.5 * F.col("avg_qty"))
        .agg(
            F.sum(e100).cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def o_small_quantity_revenue() -> str:
    return """
WITH pa AS (
  SELECT l_partkey AS pa_partkey,
         sum(CAST(round(l_quantity) AS BIGINT))::DOUBLE / count(*)::DOUBLE AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN pa ON l_partkey = pa_partkey
WHERE CAST(round(l_quantity) AS BIGINT)::DOUBLE < 0.5 * avg_qty
"""


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shape: above-average-balance customers with no orders,
    by nation (global scalar aggregate broadcast + anti-join).

    The average is computed over exact integer cents so the threshold is
    bit-identical in both engines.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cust = customer.withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    avgdf = cust.filter(F.col("bal_cents") > 0).agg(
        (F.sum("bal_cents").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_cents"
        )
    )
    return (
        cust.crossJoin(F.broadcast(avgdf))
        .filter(F.col("bal_cents").cast("double") > F.col("avg_cents"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("bal_cents").cast("long").alias("acctbal_cents"),
        )
    )


def o_idle_rich_customers() -> str:
    return """
WITH cust AS (
  SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(bal_cents) AS BIGINT) AS acctbal_cents
FROM cust c
WHERE bal_cents::DOUBLE > (SELECT sum(bal_cents)::DOUBLE / count(*)::DOUBLE
                           FROM cust WHERE bal_cents > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
"""


def q_top_brands_by_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shape: groups whose revenue exceeds the all-groups
    average share (grouped aggregate + 1-row global re-aggregate
    broadcast back as the threshold). The compare is all-integer
    (``rev * 25 > total``) so no float threshold parity is involved;
    the share itself is a single exact-integer division."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    # lazy checkpoint: br feeds both the 1-row total and the main side
    # of the crossJoin; without it the lineitem join+agg runs twice
    br = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(e100 * (F.lit(100) - d100)).cast("long").alias("revenue_e4"))
        .localCheckpoint(eager=False)
    )
    total = br.agg(F.sum("revenue_e4").cast("long").alias("_total"))
    return (
        br.crossJoin(F.broadcast(total))
        .filter(F.col("revenue_e4") * 25 > F.col("_total"))
        .select(
            "p_brand",
            "revenue_e4",
            F.round(
                F.col("revenue_e4").cast("double") / F.col("_total").cast("double"), 9
            ).alias("share"),
        )
    )


def o_top_brands_by_share() -> str:
    return """
WITH br AS (
  SELECT p_brand,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1
), tot AS (SELECT sum(revenue_e4)::BIGINT AS total FROM br)
SELECT p_brand, revenue_e4,
       round(revenue_e4::DOUBLE / total::DOUBLE, 9) AS share
FROM br CROSS JOIN tot WHERE revenue_e4 * 25 > total
"""


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shape: conditional-aggregate percentage (promo-type
    revenue share of one ship-year). One scan, broadcast part dim, two
    exact-integer sums; only the final percentage divides."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    rev = e100 * (F.lit(100) - d100)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0)))
            .cast("long")
            .alias("promo_revenue_e4"),
            F.sum(rev).cast("long").alias("total_revenue_e4"),
        )
        .select(
            "promo_revenue_e4",
            "total_revenue_e4",
            F.round(
                F.lit(100.0)
                * F.col("promo_revenue_e4").cast("double")
                / F.col("total_revenue_e4").cast("double"),
                9,
            ).alias("promo_share_pct"),
        )
    )


def o_promo_revenue_share() -> str:
    return """
WITH a AS (
  SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                       THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       ELSE 0 END) AS BIGINT) AS promo_revenue_e4,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_revenue_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
)
SELECT promo_revenue_e4, total_revenue_e4,
       round(100.0 * promo_revenue_e4::DOUBLE / total_revenue_e4::DOUBLE, 9) AS promo_share_pct
FROM a
"""


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shape: the supplier(s) whose quarter revenue equals the
    maximum (the decorrelated revenue view + equal-to-max scalar). The
    global max re-aggregates the already-reduced |suppliers| rows — not
    lineitem — and broadcasts back as a 1-row join, so no global sort or
    single-partition window exists at any corpus scale."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    sr = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(e100 * (F.lit(100) - d100)).cast("long").alias("revenue_e4"))
    )
    mx = sr.agg(F.max("revenue_e4").alias("_mx"))
    best = sr.crossJoin(F.broadcast(mx)).filter(
        F.col("revenue_e4") == F.col("_mx")
    )
    return (
        best.join(F.broadcast(supplier), best.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "revenue_e4",
        )
    )


def o_top_supplier_revenue() -> str:
    return """
WITH sr AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, revenue_e4
FROM sr JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue_e4 = (SELECT max(revenue_e4) FROM sr)
"""


def q_heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shape: suppliers who shipped more than a threshold
    quantity of some single part (nested grouped HAVING -> distinct
    supplier keys -> semi-join into the dimension). The heavy fact
    aggregation reduces before any join; supplier/nation broadcast."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    qty = F.round("l_quantity").cast("long")
    heavy = (
        lineitem.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(qty).cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > 80)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(heavy, supplier.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "n_name")
    )


def o_heavy_part_suppliers() -> str:
    return """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem GROUP BY l_suppkey, l_partkey
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 80
)
"""


def q_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shape: suppliers who were the ONLY late shipper on a
    multi-supplier order ("late" = shipped >60 days after the order
    date; the reference columns Q21 uses don't exist in this schema).
    The exists / not-exists pair decorrelates into two grouped
    aggregates over the same (order, supplier) reduction — the fact
    table shuffles once on l_orderkey, then once on the reduced keys."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    per_supp = (
        lineitem.join(orders.select("o_orderkey", "o_orderdate"),
                      lineitem.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("is_late").alias("n_late"),
    )
    waits = (
        per_supp.join(per_order, "l_orderkey")
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_suppliers") >= 2)
            & (F.col("n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
    return waits.join(
        F.broadcast(supplier), waits.l_suppkey == supplier.s_suppkey
    ).select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "numwait")


def o_sole_late_suppliers() -> str:
    return """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
per_order AS (
  SELECT l_orderkey, count(*) AS n_suppliers, sum(is_late) AS n_late
  FROM per_supp GROUP BY 1
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(count(*) AS BIGINT) AS numwait
FROM per_supp JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE is_late = 1 AND n_suppliers >= 2 AND n_late = 1
GROUP BY 1, 2
"""


def q_nation_profit_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shape: profit by supplier nation x ship year, where
    profit = discounted revenue minus a retail-price cost proxy (the
    schema has no partsupp supplycost). Exact integer e4 units
    throughout; part/nation broadcast, one fact shuffle on the grouped
    keys."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    retail100 = F.round(F.col("p_retailprice") * 100).cast("long")
    qty = F.round("l_quantity").cast("long")
    profit = e100 * (F.lit(100) - d100) - retail100 * qty * F.lit(10)
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("l_shipdate").cast("int").alias("o_year"))
        .agg(F.sum(profit).cast("long").alias("profit_e4"))
    )


def o_nation_profit_trend() -> str:
    return """
SELECT n_name, CAST(year(l_shipdate) AS INT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - CAST(round(p_retailprice * 100) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT) * 10) AS BIGINT) AS profit_e4
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def q_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows: ntile quartile + percent_rank of balance WITHIN
    each nation (partitioned windows — no global single-partition sort,
    which would be the 100 TB anti-pattern). Deterministic via the
    (bal_cents, c_custkey) composite order."""
    customer = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("bal_cents"), F.col("c_custkey"))
    return (
        customer.withColumn("bal_cents", cents)
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            F.col("bal_cents"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        )
    )


def o_customer_quartiles() -> str:
    return """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 9) AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY CAST(round(c_acctbal * 100) AS BIGINT), c_custkey)
"""


def q_orders_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts by year x priority as wide columns (explicit
    pivot values — no extra distinct-values job, required at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .pivot("o_orderpriority", [v for v, _ in _PRIORITY_PIVOT])
        .count()
    )
    return piv.select(
        "o_year",
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(a) for v, a in _PRIORITY_PIVOT],
    )


def o_orders_priority_pivot() -> str:
    cases = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE o_orderpriority = '{v}') AS BIGINT) AS {a}"
        for v, a in _PRIORITY_PIVOT
    )
    return f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       {cases}
FROM orders GROUP BY 1
"""


def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shape: one nation's share of regional revenue per year
    (two roles for the nation table, conditional aggregation, exact-
    integer share numerator/denominator with one final double division)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.alias("n1")  # customer nation -> region filter
    n2 = nation.alias("n2")  # supplier nation -> the "share" nation
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    vol = e100 * (F.lit(100) - d100)
    df = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    return (
        df.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("n2.n_name") == "CHINA", vol).otherwise(F.lit(0)))
            .cast("long")
            .alias("nation_vol_e4"),
            F.sum(vol).cast("long").alias("total_vol_e4"),
        )
        .select(
            "o_year",
            "nation_vol_e4",
            "total_vol_e4",
            F.round(
                F.col("nation_vol_e4").cast("double") / F.col("total_vol_e4").cast("double"),
                9,
            ).alias("mkt_share"),
        )
    )


def o_nation_market_share() -> str:
    return """
WITH flat AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS vol,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
)
SELECT CAST(o_year AS INT) AS o_year,
       CAST(sum(CASE WHEN supp_nation = 'CHINA' THEN vol ELSE 0 END) AS BIGINT) AS nation_vol_e4,
       CAST(sum(vol) AS BIGINT) AS total_vol_e4,
       round(sum(CASE WHEN supp_nation = 'CHINA' THEN vol ELSE 0 END)::DOUBLE
             / sum(vol)::DOUBLE, 9) AS mkt_share
FROM flat GROUP BY 1
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shape: top-20 customers by revenue lost to returns
    (fact-fact shuffle join + broadcast dims + TakeOrderedAndProject)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("c_name"),
            F.col("n_name"),
        )
        .agg(F.sum(e100 * (F.lit(100) - d100)).cast("long").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("c_custkey"))
        .limit(20)
    )


def o_returned_items() -> str:
    return """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_e4 DESC, c_custkey ASC LIMIT 20
"""


def q_customer_order_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions: first_value / nth_value / last_value with
    an explicit full frame per customer (frame semantics, not just
    ranking)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.first_value(F.col("o_orderkey")).over(w).cast("long").alias("first_order"),
        F.nth_value(F.col("o_orderkey"), 2).over(w).cast("long").alias("second_order"),
        F.last_value(F.col("o_orderkey")).over(w).cast("long").alias("last_order"),
    )


def o_customer_order_frame() -> str:
    return """
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(first_value(o_orderkey) OVER w AS BIGINT) AS first_order,
       CAST(nth_value(o_orderkey, 2) OVER w AS BIGINT) AS second_order,
       CAST(last_value(o_orderkey) OVER w AS BIGINT) AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: from_json with an explicit schema (not
    get_json_object string-plucking) -> struct field -> grouped exact
    aggregates. Schema-on-read stays JVM-side and vectorized."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("k").cast("long")).cast("long").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
            F.count(F.when(F.col("k").isNull(), 1)).cast("long").alias("n_null_k"),
        )
    )


def o_props_json_stats() -> str:
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
       CAST(count(*) FILTER (WHERE json_extract_string(props, '$.k') IS NULL) AS BIGINT) AS n_null_k
FROM events GROUP BY 1
"""


def q_orders_priority_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide year x priority counts back to long form
    — wide-table normalization without touching Python (stack/unpivot is
    a zero-shuffle projection op)."""
    wide = q_orders_priority_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            "o_year",
            [a for _, a in _PRIORITY_PIVOT],
            "priority_slot",
            "n_orders",
        )
        .filter(F.col("n_orders") > 0)
        .select("o_year", "priority_slot", F.col("n_orders").cast("long").alias("n_orders"))
    )


def o_orders_priority_unpivot() -> str:
    cases = " ".join(
        f"WHEN '{v}' THEN '{a}'" for v, a in _PRIORITY_PIVOT
    )
    return f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CASE o_orderpriority {cases} END AS priority_slot,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1, 2
"""


def q_event_type_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (interpolated) of integer cents per event type — both
    engines average the two middle values in exact double arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.withColumn("cents", cents)
        .groupBy("event_type")
        .agg(
            F.median("cents").alias("median_cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


def o_event_type_medians() -> str:
    return """
SELECT event_type,
       median(CAST(round(value * 100) AS BIGINT)) AS median_cents,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""


def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values (bucket arithmetic stays in
    whole-stage codegen; one partial-agg shuffle)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("bucket", F.floor(F.col("value") / 50).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
        )
    )


def o_events_value_histogram() -> str:
    return """
SELECT CAST(floor(value / 50) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1
"""


def q_distinct_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact DISTINCT aggregates in one pass (compiles to
    Spark's Expand operator — each distinct set gets its own expansion
    row; one shuffle, no self-joins)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).cast("long").alias("n_users"),
        F.count_distinct(F.floor(F.col("value") / 50)).cast("long").alias("n_buckets"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def o_distinct_agg_stats() -> str:
    return """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT floor(value / 50)) AS BIGINT) AS n_buckets,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than cube/rollup: exactly the
    requested aggregation levels) with grouping_id disambiguation."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(
        """
SELECT event_type,
       CAST(user_id % 10 AS BIGINT) AS user_mod,
       CAST(grouping_id() AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events_gs
GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
"""
    )


def o_events_grouping_sets() -> str:
    return """
SELECT event_type,
       CAST(user_id % 10 AS BIGINT) AS user_mod,
       CAST(grouping(event_type) * 2 + grouping(user_id % 10) AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
"""


def q_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join: orders ⋈ customer routed through the salting
    utility (hot keys spread over 8 salt partitions); the oracle is the
    plain join — identical results prove salting is semantics-free."""
    from pythonvectordb_spark.sources.bucketing import salted_join

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    joined = salted_join(orders, customer, key="o_custkey", salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias(
            "total_cents"
        ),
    )


def o_salted_segment_revenue() -> str:
    return """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shape: cheapest EUROPE supplier per STANDARD size-15
    part. The reference Q2's correlated MIN subquery over partsupp
    decorrelates into a partitioned window rank; this schema has no
    partsupp, so the per-(part, supplier) offer price is the MIN
    lineitem extendedprice in exact integer cents. Scale shape: the
    fact table reduces to (part, supplier) BEFORE any dimension join
    (one shuffle on the composite key), then part/supplier/nation/
    region broadcast; the window partitions on p_partkey — never a
    global sort. Deterministic rank tiebreak on s_suppkey."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    e100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    offers = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(e100).alias("offer_e100")
    )
    eur_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    target_parts = part.filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_brand")
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("offer_e100").asc(), F.col("s_suppkey").asc()
    )
    return (
        offers.join(F.broadcast(target_parts), offers.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eur_supp), offers.l_suppkey == F.col("s_suppkey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_brand",
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("s_bal_cents"),
            "n_name",
            F.col("offer_e100").cast("long").alias("offer_e100"),
        )
    )


def o_min_cost_supplier() -> str:
    return """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS offer_e100
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name, offer_e100,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY offer_e100 ASC, s_suppkey ASC) AS rk
  FROM offers
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'STANDARD'
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand,
       CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(round(s_acctbal * 100) AS BIGINT) AS s_bal_cents, n_name,
       CAST(offer_e100 AS BIGINT) AS offer_e100
FROM ranked WHERE rk = 1
"""


def q_lateship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shape: for lines shipped late (>60 days after the
    order date — the schema has no commitdate/receiptdate/shipmode, so
    l_linestatus stands in for the ship-mode axis), count high-priority
    vs low-priority orders per status. One broadcast-joined projection
    of orders (two columns) against the fact table, then a two-value
    conditional aggregate — a single shuffle on the tiny group key."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ods = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        lineitem.join(ods, lineitem.l_orderkey == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).cast("long").alias("high_line_count"),
            F.sum(F.lit(1) - high).cast("long").alias("low_line_count"),
        )
    )


def o_lateship_priority_counts() -> str:
    return """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1
"""


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shape: distinct-supplier counts per (brand, size)
    part group, excluding one brand and excluding "complaint"
    suppliers (no comment column — negative account balance is the
    stand-in, expressed as the same NOT-IN anti-join shape Q16 uses).
    Scale shape: the (part, supplier) bridge is deduplicated BEFORE
    the dimension join (map-side combine on the composite key); part
    and the tiny exclusion set broadcast; count_distinct shuffles once
    on the small (brand, size) key space."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    bridge = lineitem.select("l_partkey", "l_suppkey").distinct()
    complaints = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(F.col("p_brand") != "Brand#45").select(
        "p_partkey", "p_brand", "p_size"
    )
    return (
        bridge.join(F.broadcast(parts), bridge.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(complaints),
            bridge.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def o_supplier_part_counts() -> str:
    return """
SELECT p_brand, CAST(p_size AS INT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the warehouse's seven fk edges
    (staged for the round-5 rotation): per edge, child rows pointing at
    a missing parent — the join-safety precondition
    (`operators/relational.fk_orphans`)."""
    return RL.fk_orphans(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
    )


def o_fk_orphans() -> str:
    edges = [
        ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    parts = [
        f"""SELECT '{name}' AS relationship,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM {child} c
LEFT JOIN (SELECT DISTINCT {pk} AS _pk FROM {parent}) p ON c.{ck} = p._pk"""
        for name, child, ck, parent, pk in edges
    ]
    return "\nUNION ALL\n".join(parts)


def q_brand_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto coverage of revenue by brand at 50/80/90% thresholds
    (staged for the round-5 rotation): the hot-tier sizing curve —
    100*cum >= t*total compared in pure int64
    (`operators/relational.brand_pareto`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.brand_pareto(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_brand_pareto() -> str:
    return """
WITH rev AS (
  SELECT p.p_brand,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1),
cum AS (
  SELECT CAST(row_number() OVER (ORDER BY rev_e4 DESC, p_brand ASC) AS BIGINT) AS rk,
         CAST(sum(rev_e4) OVER (ORDER BY rev_e4 DESC, p_brand ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM rev),
tot AS (SELECT max(cum) AS total, max(rk) AS n_brands FROM cum),
th AS (SELECT * FROM (VALUES (50), (80), (90)) AS t(t)),
g AS (SELECT t, CAST(min(rk) AS BIGINT) AS brands_needed,
             CAST(max(n_brands) AS BIGINT) AS n_brands
      FROM cum CROSS JOIN tot CROSS JOIN th
      WHERE 100 * cum >= t * total GROUP BY 1)
SELECT CAST(t AS INTEGER) AS threshold_pct, brands_needed, n_brands,
       round(brands_needed::DOUBLE / n_brands::DOUBLE, 9) AS brand_fraction
FROM g
"""


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation census over the orders table (staged for the
    round-5 rotation): tercile cuts located on DISTINCT-value frames,
    value<=cut bucketing in int64 — no floats anywhere
    (`operators/relational.customer_rfm`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.customer_rfm(load_table(spark, sf_dir, "orders"))


def o_customer_rfm() -> str:
    cut = """
  SELECT max(CASE WHEN cum - c < (n + 2) // 3 AND (n + 2) // 3 <= cum THEN v END) AS c1,
         max(CASE WHEN cum - c < (2 * n + 2) // 3 AND (2 * n + 2) // 3 <= cum THEN v END) AS c2
  FROM (SELECT v, c,
               CAST(sum(c) OVER (ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(sum(c) OVER () AS BIGINT) AS n
        FROM (SELECT {col} AS v, CAST(count(*) AS BIGINT) AS c FROM cust GROUP BY 1))
"""
    return f"""
WITH cust AS (
  SELECT o_custkey,
         CAST(max(epoch_us(o_orderdate) // 86400000000) AS BIGINT) AS rec,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon
  FROM orders GROUP BY 1),
rc AS ({cut.format(col='rec')}),
fc AS ({cut.format(col='freq')}),
mc AS ({cut.format(col='mon')})
SELECT CAST(CASE WHEN rec <= rc.c1 THEN 1 WHEN rec <= rc.c2 THEN 2 ELSE 3 END AS INTEGER) AS r_bucket,
       CAST(CASE WHEN freq <= fc.c1 THEN 1 WHEN freq <= fc.c2 THEN 2 ELSE 3 END AS INTEGER) AS f_bucket,
       CAST(CASE WHEN mon <= mc.c1 THEN 1 WHEN mon <= mc.c2 THEN 2 ELSE 3 END AS INTEGER) AS m_bucket,
       CAST(count(*) AS BIGINT) AS n_customers
FROM cust CROSS JOIN rc CROSS JOIN fc CROSS JOIN mc
GROUP BY 1, 2, 3
"""


def q_fk_fanout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out distribution of the two fact FK edges (staged for the
    round-5 rotation): mean/p50/p99/max children per parent — the
    decide-before-you-shuffle join-planning numbers
    (`operators/relational.fk_fanout_stats`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.fk_fanout_stats(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


def o_fk_fanout_stats() -> str:
    edge = """
  SELECT '{name}' AS edge, CAST(max(n) AS BIGINT) AS n_parents,
         CAST(max(children) AS BIGINT) AS n_children,
         round(max(children)::DOUBLE / max(n)::DOUBLE, 6) AS mean_fanout,
         round(CAST(sum((CASE WHEN cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum THEN v ELSE 0 END)
                        + (CASE WHEN cum - c < (n + 2) // 2 AND (n + 2) // 2 <= cum THEN v ELSE 0 END))
               AS BIGINT)::DOUBLE / 2.0, 1) AS p50_fanout,
         CAST(max(CASE WHEN cum - c < (99 * n + 99) // 100 AND (99 * n + 99) // 100 <= cum THEN v END)
              AS BIGINT) AS p99_fanout,
         CAST(max(mx) AS BIGINT) AS max_fanout
  FROM (SELECT v, c,
               CAST(sum(c) OVER (ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(sum(c) OVER () AS BIGINT) AS n,
               CAST(sum(v * c) OVER () AS BIGINT) AS children,
               CAST(max(v) OVER () AS BIGINT) AS mx
        FROM (SELECT v, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT CAST(count(*) AS BIGINT) AS v FROM {table} GROUP BY {key})
              GROUP BY 1))
"""
    return (
        edge.format(name="orders_per_customer", table="orders", key="o_custkey")
        + " UNION ALL "
        + edge.format(name="lineitems_per_order", table="lineitem", key="l_orderkey")
    )


def q_yearly_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year order-value quartiles (staged for the round-5
    rotation): nearest-rank quartile cents on per-year DISTINCT-value
    frames — banded drift the revenue trend can't show
    (`operators/timeseries.yearly_value_quartiles`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.yearly_value_quartiles(load_table(spark, sf_dir, "orders"))


def o_yearly_value_quartiles() -> str:
    return """
WITH vc AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2),
cu AS (SELECT y, v, c,
              CAST(sum(c) OVER (PARTITION BY y ORDER BY v ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
       FROM vc),
tot AS (SELECT y, max(cum) AS n FROM cu GROUP BY 1),
j AS (SELECT cu.y, cu.v, cu.c, cu.cum, tot.n FROM cu JOIN tot USING (y))
SELECT y AS order_year, CAST(max(n) AS BIGINT) AS n_orders,
       CAST(max(CASE WHEN cum - c < (1 * n + 3) // 4 AND (1 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q1_cents,
       CAST(max(CASE WHEN cum - c < (2 * n + 3) // 4 AND (2 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q2_cents,
       CAST(max(CASE WHEN cum - c < (3 * n + 3) // 4 AND (3 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q3_cents
FROM j GROUP BY 1
"""


def q_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation bands for orders (staged for the
    round-5 rotation): exact e6 charge recompute, int64 tolerance-band
    comparisons, orphan-header count
    (`operators/relational.order_reconciliation`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.order_reconciliation(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def o_order_reconciliation() -> str:
    return """
WITH lines AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
                  * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT) AS line_e6
  FROM lineitem GROUP BY 1),
j AS (SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000 AS hdr_e6,
             l.line_e6
      FROM orders o LEFT JOIN lines l ON o.o_orderkey = l.l_orderkey)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN line_e6 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orphan_headers,
       CAST(sum(CASE WHEN line_e6 IS NOT NULL
                      AND 100 * abs(hdr_e6 - line_e6) <= 1 * hdr_e6
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
       CAST(sum(CASE WHEN line_e6 IS NOT NULL
                      AND 100 * abs(hdr_e6 - line_e6) <= 10 * hdr_e6
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_10pct,
       CAST(sum(CASE WHEN line_e6 IS NOT NULL
                      AND 100 * abs(hdr_e6 - line_e6) <= 50 * hdr_e6
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_50pct,
       CAST(max(CASE WHEN line_e6 IS NOT NULL THEN abs(hdr_e6 - line_e6) END)
            AS BIGINT) AS max_abs_diff_e6
FROM j
"""


def q_brand_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year brand revenue growth table (staged for the
    round-5 rotation): exact e4 revenue per (brand, year) self-joined
    on (brand, year-1) — the mover report behind `rank_stability`
    (`operators/relational.brand_yoy_growth`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.brand_yoy_growth(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
    )


def o_brand_yoy_growth() -> str:
    return """
WITH rev AS (
  SELECT p.p_brand, CAST(year(o.o_orderdate) AS INTEGER) AS yr,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2)
SELECT a.p_brand, a.yr, a.rev_e4, b.rev_e4 AS prev_e4,
       round((a.rev_e4 - b.rev_e4)::DOUBLE / b.rev_e4::DOUBLE, 6) AS yoy_growth
FROM rev a JOIN rev b ON a.p_brand = b.p_brand AND a.yr = b.yr + 1
"""


def q_single_source_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-supplier part census over observed trade (staged for the
    round-5 rotation): exact 1/2/3+ supplier buckets — the
    part-grain supply-risk roll-up
    (`operators/relational.single_source_parts`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.single_source_parts(load_table(spark, sf_dir, "lineitem"))


def o_single_source_parts() -> str:
    return """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
per AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS k FROM ps GROUP BY 1),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single,
             CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_two,
             CAST(sum(CASE WHEN k >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_three_plus
      FROM per)
SELECT n_parts, n_single, n_two, n_three_plus,
       round(n_single::DOUBLE / n_parts::DOUBLE, 9) AS single_share
FROM g
"""


def q_basket_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-brand basket-width histogram (staged for the round-5
    rotation): the fan-out bound behind `copurchase_lift` — exact 1/2/3+
    buckets and mean brands per order
    (`operators/relational.basket_diversity`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.basket_diversity(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_basket_diversity() -> str:
    return """
WITH ob AS (SELECT DISTINCT l.l_orderkey, p.p_brand
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
per AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k FROM ob GROUP BY 1),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(k) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
             CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_2,
             CAST(sum(CASE WHEN k >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_3plus
      FROM per)
SELECT n_orders, round(nb::DOUBLE / n_orders::DOUBLE, 6) AS mean_brands,
       n_1, n_2, n_3plus,
       round(n_1::DOUBLE / n_orders::DOUBLE, 9) AS single_brand_share
FROM g
"""


def q_priority_leadtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship lead time by order priority (staged for the round-5
    rotation): mean/median/p95 exact-day gaps located on per-priority
    DISTINCT-gap frames — the SLA evidence for the priority flag
    (`operators/relational.priority_leadtime`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.priority_leadtime(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


def o_priority_leadtime() -> str:
    return """
WITH vc AS (
  SELECT o.o_orderpriority AS pr,
         CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT)
         - CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
cu AS (SELECT pr, v, c,
              CAST(sum(c) OVER (PARTITION BY pr ORDER BY v ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
       FROM vc),
tot AS (SELECT pr, max(cum) AS n, CAST(sum(v * c) AS BIGINT) AS sv
        FROM cu GROUP BY 1),
j AS (SELECT cu.pr, cu.v, cu.c, cu.cum, tot.n, tot.sv
      FROM cu JOIN tot USING (pr))
SELECT pr AS o_orderpriority, CAST(max(n) AS BIGINT) AS n_items,
       round(max(sv)::DOUBLE / max(n)::DOUBLE, 6) AS mean_days,
       round(CAST(sum((CASE WHEN cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
                            THEN v ELSE 0 END)
                      + (CASE WHEN cum - c < (n + 2) // 2 AND (n + 2) // 2 <= cum
                              THEN v ELSE 0 END)) AS BIGINT)::DOUBLE / 2.0, 1)
           AS median_days,
       CAST(max(CASE WHEN cum - c < (19 * n + 19) // 20
                      AND (19 * n + 19) // 20 <= cum THEN v END) AS BIGINT)
           AS p95_days
FROM j GROUP BY 1
"""


def q_realized_vs_retail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized-vs-list price ratio per brand (staged for the round-5
    rotation): ratio of two exact integer sums — markup/markdown depth
    with no per-row division
    (`operators/relational.realized_vs_retail`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.realized_vs_retail(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_realized_vs_retail() -> str:
    return """
WITH g AS (
  SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS realized_cents,
         CAST(sum(CAST(round(l.l_quantity) AS BIGINT)
                  * CAST(round(p.p_retailprice * 100) AS BIGINT)) AS BIGINT)
             AS list_cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1)
SELECT p_brand, n_items, realized_cents, list_cents,
       round(realized_cents::DOUBLE / list_cents::DOUBLE, 9)
           AS realization_ratio
FROM g
"""


def q_segment_acctbal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment account-balance solvency profile (staged for the
    round-5 rotation): negative share + nearest-rank quartiles on
    distinct-cents frames
    (`operators/relational.segment_acctbal_profile`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.segment_acctbal_profile(load_table(spark, sf_dir, "customer"))


def o_segment_acctbal_profile() -> str:
    return """
WITH vc AS (SELECT c_mktsegment AS seg,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS c
            FROM customer GROUP BY 1, 2),
cu AS (SELECT seg, v, c,
              CAST(sum(c) OVER (PARTITION BY seg ORDER BY v ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
       FROM vc),
tot AS (SELECT seg, max(cum) AS n,
               CAST(sum(CASE WHEN v < 0 THEN c ELSE 0 END) AS BIGINT) AS n_neg
        FROM cu GROUP BY 1),
j AS (SELECT cu.seg, cu.v, cu.c, cu.cum, tot.n, tot.n_neg
      FROM cu JOIN tot USING (seg))
SELECT seg AS c_mktsegment, CAST(max(n) AS BIGINT) AS n_customers,
       CAST(max(n_neg) AS BIGINT) AS n_negative,
       round(max(n_neg)::DOUBLE / max(n)::DOUBLE, 9) AS negative_share,
       CAST(max(CASE WHEN cum - c < (1 * n + 3) // 4 AND (1 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q1_cents,
       CAST(max(CASE WHEN cum - c < (2 * n + 3) // 4 AND (2 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q2_cents,
       CAST(max(CASE WHEN cum - c < (3 * n + 3) // 4 AND (3 * n + 3) // 4 <= cum
                     THEN v END) AS BIGINT) AS q3_cents
FROM j GROUP BY 1
"""


def q_basket_size_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean order value by lines-per-order bucket (staged for the
    round-5 rotation): the cross-sell payoff curve — exact cents sums,
    one division per bucket
    (`operators/relational.basket_size_value`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.basket_size_value(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def o_basket_size_value() -> str:
    return """
WITH lc AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
            FROM lineitem GROUP BY 1),
j AS (SELECT CASE WHEN k = 1 THEN '1' WHEN k = 2 THEN '2'
                  WHEN k = 3 THEN '3' ELSE '4+' END AS lines_bucket,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN lc ON o.o_orderkey = lc.l_orderkey),
g AS (SELECT lines_bucket, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM j GROUP BY 1)
SELECT lines_bucket, n_orders, sum_cents,
       round(sum_cents::DOUBLE / (n_orders::DOUBLE * 100.0), 6) AS mean_value
FROM g
"""


def q_customer_brand_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime brand breadth per customer (staged for the round-5
    rotation): loyalty-vs-explorer census — exact 1-2/3-5/6+ buckets
    (`operators/relational.customer_brand_breadth`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.customer_brand_breadth(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
    )


def o_customer_brand_breadth() -> str:
    return """
WITH cb AS (SELECT DISTINCT o.o_custkey, p.p_brand
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p ON l.l_partkey = p.p_partkey),
per AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS k FROM cb GROUP BY 1),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(k) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN k <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_narrow,
             CAST(sum(CASE WHEN k >= 3 AND k <= 5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_mid,
             CAST(sum(CASE WHEN k >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_wide
      FROM per)
SELECT n_customers,
       round(n_pairs::DOUBLE / n_customers::DOUBLE, 6) AS mean_brands,
       n_narrow, n_mid, n_wide,
       round(n_wide::DOUBLE / n_customers::DOUBLE, 9) AS wide_share
FROM g
"""


def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation export vs import revenue and the balance ratio
    (staged for the round-5 rotation): the macro roll-up of
    `bilateral_trade` — two nation-grain exact sums off one
    checkpointed fact frame
    (`operators/relational.nation_trade_balance`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.nation_trade_balance(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def o_nation_trade_balance() -> str:
    return """
WITH base AS (
  SELECT s.s_nationkey AS snk, c.c_nationkey AS cnk,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS r_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey),
exp AS (SELECT snk, CAST(sum(r_e4) AS BIGINT) AS export_e4 FROM base GROUP BY 1),
imp AS (SELECT cnk, CAST(sum(r_e4) AS BIGINT) AS import_e4 FROM base GROUP BY 1)
SELECT n.n_name,
       CAST(coalesce(exp.export_e4, 0) AS BIGINT) AS export_e4,
       CAST(coalesce(imp.import_e4, 0) AS BIGINT) AS import_e4,
       CAST(coalesce(exp.export_e4, 0) - coalesce(imp.import_e4, 0) AS BIGINT)
           AS balance_e4,
       CASE WHEN coalesce(imp.import_e4, 0) > 0 THEN
         round(coalesce(exp.export_e4, 0)::DOUBLE
               / coalesce(imp.import_e4, 0)::DOUBLE, 6) END
           AS export_import_ratio
FROM nation n
LEFT JOIN exp ON n.n_nationkey = exp.snk
LEFT JOIN imp ON n.n_nationkey = imp.cnk
"""


def q_brand_market_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier vs customer nations per brand (staged for the
    round-5 rotation): the replication-policy reach table
    (`operators/relational.brand_market_presence`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.brand_market_presence(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
    )


def o_brand_market_presence() -> str:
    return """
WITH base AS (
  SELECT p.p_brand, s.s_nationkey AS snk, c.c_nationkey AS cnk
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN part p ON l.l_partkey = p.p_partkey),
sup AS (SELECT p_brand, CAST(count(DISTINCT snk) AS BIGINT) AS n_supplier_nations
        FROM base GROUP BY 1),
cus AS (SELECT p_brand, CAST(count(DISTINCT cnk) AS BIGINT) AS n_customer_nations
        FROM base GROUP BY 1)
SELECT coalesce(sup.p_brand, cus.p_brand) AS p_brand,
       CAST(coalesce(sup.n_supplier_nations, 0) AS BIGINT) AS n_supplier_nations,
       CAST(coalesce(cus.n_customer_nations, 0) AS BIGINT) AS n_customer_nations
FROM sup FULL OUTER JOIN cus ON sup.p_brand = cus.p_brand
"""
