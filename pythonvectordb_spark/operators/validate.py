"""Data-quality validation suite: declarative rule checks over the warehouse
tables, reported as one row per rule.

The reference validates at ingest time only (``pythonvectordb.py:99-117``
raises on dim/NaN/dup-id violations); a 100 TB lakehouse also needs
*batch* validation of data already landed — the dbt-test / Deequ role.
Each rule is expressed so Catalyst keeps it in one scan per table:

* intra-row rules (range, null, ordering) are conditional sums inside a
  SINGLE aggregate pass over the table — adding a rule adds a column to
  the agg, not a scan;
* primary-key uniqueness rides the same pass (``count - count(distinct)``
  is a two-level hash agg, map-side combined on the key);
* referential-integrity rules are LEFT ANTI joins on the projected key
  columns only — dimension-sided FKs broadcast, fact-to-fact FKs shuffle
  on the join key, which is the correct (and only) plan at scale; a
  Bloom-filter pre-pass (see ``operators/layout.bloom_prune_join``) slots
  in front unchanged when the violation rate is known to be tiny.

At 100 TB the whole report is: one scan + one grouped agg per table, plus
one key-projected anti-join per FK rule. Nothing is collected; the output
is rule-count-sized (rows = number of rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rule_rows(df: DataFrame, rules: list[tuple[str, F.Column]]) -> DataFrame:
    """One agg pass computing every rule's violation count, unpivoted to
    (rule, n_checked, n_violations) rows via a literal stack."""
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for name, pred in rules:
        aggs.append(
            F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))).cast("long").alias(name)
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', `{name}`" for name, _ in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)", "_n AS n_checked"
    ).select("rule", "n_checked", "n_violations")


def _pk_rule(df: DataFrame, name: str, *key_cols: str) -> DataFrame:
    """PK uniqueness as duplicate-row count: count(*) - count(distinct key)."""
    return df.agg(
        F.lit(name).alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in key_cols]))
        .cast("long")
        .alias("n_violations"),
    ).select("rule", "n_checked", "n_violations")


def _fk_rule(
    fact: DataFrame, dim: DataFrame, name: str, fact_key: str, dim_key: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """FK orphan count in ONE join + ONE agg: left-join the projected fact
    key against the deduped dim key (each side's scan reads one column),
    then count rows and unmatched rows in the same aggregate — no second
    pass over the fact, no single-row cross join. NULL fact keys are
    skipped (a nullable FK is legal; null-ness is its own NOT-NULL rule),
    so ``n_checked`` counts non-null keys only."""
    d = dim.select(F.col(dim_key).alias(fact_key)).dropDuplicates([fact_key]).select(
        fact_key, F.lit(1).alias("_matched")
    )
    if broadcast_dim:
        d = F.broadcast(d)
    joined = (
        fact.select(fact_key)
        .where(F.col(fact_key).isNotNull())
        .join(d, on=fact_key, how="left")
    )
    return joined.agg(
        F.lit(name).alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum(F.when(F.col("_matched").isNull(), F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_violations"),
    ).select("rule", "n_checked", "n_violations")


def dq_report(
    orders: DataFrame, lineitem: DataFrame, customer: DataFrame
) -> DataFrame:
    """Run the standard warehouse rule suite; one row per rule with
    ``(rule, n_checked, n_violations, ok)``.

    Rules: NOT-NULL and range checks on orders/lineitem (intra-row, one
    agg pass per table), PK uniqueness on ``o_orderkey`` and
    ``(l_orderkey, l_linenumber)``, and FK orphan checks
    ``orders.o_custkey -> customer`` (broadcast dim) and
    ``lineitem.l_orderkey -> orders`` (shuffle anti-join — both sides are
    facts at scale).
    """
    order_rules = _rule_rows(
        orders,
        [
            ("orders_custkey_null", F.col("o_custkey").isNull()),
            ("orders_totalprice_nonpos", F.col("o_totalprice") <= 0),
            ("orders_orderdate_null", F.col("o_orderdate").isNull()),
        ],
    )
    line_rules = _rule_rows(
        lineitem,
        [
            ("lineitem_qty_range", (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50)),
            ("lineitem_discount_range", (F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            ("lineitem_price_nonpos", F.col("l_extendedprice") <= 0),
        ],
    )
    pks = [
        _pk_rule(orders, "orders_pk_unique", "o_orderkey"),
        _pk_rule(lineitem, "lineitem_pk_unique", "l_orderkey", "l_linenumber"),
        _pk_rule(customer, "customer_pk_unique", "c_custkey"),
    ]
    fks = [
        _fk_rule(orders, customer, "orders_fk_customer", "o_custkey", "c_custkey"),
        _fk_rule(
            lineitem, orders, "lineitem_fk_orders", "l_orderkey", "o_orderkey",
            broadcast_dim=False,
        ),
    ]
    report = order_rules
    for piece in [line_rules, *pks, *fks]:
        report = report.unionByName(piece)
    return report.select(
        "rule",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("ok"),
    )


def k_anonymity_report(
    events: DataFrame, k: int = 5, l_div: int = 3
) -> DataFrame:
    """K-anonymity / l-diversity audit over the events table — the privacy
    gate a training-data pipeline runs before exporting behavioral data
    (the complement of `curation.pii_scrub`: scrubbing removes literal
    identifiers; this measures RE-IDENTIFICATION risk from quasi-
    identifier combinations).

    Quasi-identifier class = (event_type, hour-of-day, value bucket of
    100). A class is k-RISKY if it holds fewer than ``k`` rows (an
    attacker who knows the quasi-identifiers pins the row to a small
    crowd) and LOW-DIVERSITY if its rows belong to fewer than ``l_div``
    distinct users (even a large class is revealing when one user fills
    it). One row per event_type: class counts, risky-row share.

    Scale shape: two map-side-combined aggregations — corpus -> classes
    (shuffle key is the 3-column quasi-identifier, count + distinct-user
    count ride the same pass), classes -> per-type summary (tiny). Hour
    buckets use epoch arithmetic (exact longs, engine-portable), never
    session-zone-dependent timestamp fields.
    """
    hod = (F.floor(F.unix_timestamp("ts") / 3600) % 24).cast("long")
    vbucket = F.floor(F.col("value") / 100).cast("long")
    classes = events.groupBy(
        F.col("event_type"), hod.alias("hod"), vbucket.alias("vbucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    risky = F.col("n_rows") < k
    return (
        classes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(risky, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_risky_classes"),
            F.sum(F.when(risky, F.col("n_rows")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_risky_rows"),
            F.sum("n_rows").cast("long").alias("n_total_rows"),
            F.sum(F.when(F.col("n_users") < l_div, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_low_diversity"),
        )
        .select(
            "event_type",
            "n_classes",
            "n_risky_classes",
            "n_risky_rows",
            "n_low_diversity",
            F.round(
                F.col("n_risky_rows").cast("double")
                / F.col("n_total_rows").cast("double"),
                6,
            ).alias("risky_row_share"),
        )
    )
