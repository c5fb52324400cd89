"""Data-quality validation suite: every rule must fire on seeded
violations and stay quiet on the clean testdata."""

import datetime

from tests.conftest import SF_SMOKE


def _report_map(df):
    return {r["rule"]: r.asDict() for r in df.collect()}


def test_clean_testdata_passes_all_rules(spark):
    from pythonvectordb_spark.operators.validate import dq_report

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    rep = _report_map(dq_report(orders, lineitem, customer))
    assert len(rep) == 11
    # the generator does NOT enforce the lineitem compound PK — the rule
    # correctly reports those real duplicates; everything else is clean
    failing = {k for k, v in rep.items() if v["ok"] == 0}
    assert failing == {"lineitem_pk_unique"}, failing
    assert rep["lineitem_pk_unique"]["n_violations"] > 0
    # n_checked mirrors the table sizes
    assert rep["orders_custkey_null"]["n_checked"] == orders.count()
    assert rep["lineitem_qty_range"]["n_checked"] == lineitem.count()


def test_seeded_violations_are_counted(spark):
    from pythonvectordb_spark.operators.validate import dq_report

    d = datetime.date(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
            (1, 10, "O", 100.0, d, "1-URGENT"),
            (1, 10, "O", 100.0, d, "1-URGENT"),  # dup PK
            (2, None, "O", -5.0, None, "2-HIGH"),  # null FK, nonpos price, null date
            (3, 99, "F", 50.0, d, "3-MEDIUM"),  # orphan custkey
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 1, 1, 1, 10.0, 100.0, 0.05, 0.02, "N", "O", d),
            (1, 1, 1, 1, 99.0, -1.0, 1.5, 0.02, "N", "O", d),  # dup PK + qty>50 + disc>1 + price<=0
            (7, 1, 1, 2, 5.0, 10.0, 0.0, 0.0, "N", "O", d),  # orphan orderkey
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate date",
    )
    customer = spark.createDataFrame(
        [(10, "a", 1, 0.0, "BUILDING"), (10, "b", 1, 0.0, "BUILDING")],  # dup PK
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    )
    rep = _report_map(dq_report(orders, lineitem, customer))
    expected = {
        "orders_custkey_null": 1,
        "orders_totalprice_nonpos": 1,
        "orders_orderdate_null": 1,
        "lineitem_qty_range": 1,
        "lineitem_discount_range": 1,
        "lineitem_price_nonpos": 1,
        "orders_pk_unique": 1,
        "lineitem_pk_unique": 1,
        "customer_pk_unique": 1,
        # NULL o_custkey is not an orphan (null-FK has its own rule); 99 is
        "orders_fk_customer": 1,
        "lineitem_fk_orders": 1,
    }
    got = {k: rep[k]["n_violations"] for k in expected}
    assert got == expected, got
    assert all(rep[k]["ok"] == 0 for k in expected)


def test_k_anonymity_report(spark):
    import datetime

    from pythonvectordb_spark.operators.validate import k_anonymity_report

    t = datetime.datetime(2024, 1, 1, 10, 30)  # hod 10 for all rows
    rows = []
    # class A: 5 rows, 3 users -> safe on both axes (k=5, l=3)
    rows += [(i, t, 100 + (i % 3), "view", 10.0, "{}") for i in range(5)]
    # class B: 2 rows, 1 user -> k-risky AND low-diversity
    rows += [(10 + i, t, 200, "click", 150.0, "{}") for i in range(2)]
    # class C: 6 rows, 2 users -> safe size but low diversity
    rows += [(20 + i, t, 300 + (i % 2), "view", 250.0, "{}") for i in range(6)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rep = {r["event_type"]: r.asDict() for r in k_anonymity_report(df).collect()}
    v, c = rep["view"], rep["click"]
    assert (v["n_classes"], v["n_risky_classes"], v["n_risky_rows"]) == (2, 0, 0)
    assert v["n_low_diversity"] == 1  # class C: 2 users < 3
    assert v["risky_row_share"] == 0.0
    assert (c["n_classes"], c["n_risky_classes"], c["n_risky_rows"]) == (1, 1, 2)
    assert c["n_low_diversity"] == 1 and c["risky_row_share"] == 1.0
