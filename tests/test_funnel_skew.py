"""Skew hardening for the per-user sequence queries (round-2 VERDICT
item 7): a synthetic power user with orders of magnitude more events than
everyone else must not change correctness, and the funnel plan must not
contain an unbounded per-key collect_list."""

import datetime

import duckdb
import pytest

from tests.oracle_utils import compare

N_HEAVY = 20_000


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """events.parquet where user 1 has N_HEAVY events and users 2-4 have
    hand-designed funnel outcomes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime.datetime(2024, 1, 1)
    rows = []

    def add(user, etype, sec, val):
        rows.append(
            (
                len(rows),
                t0 + datetime.timedelta(seconds=sec),
                user,
                etype,
                float(val),
                "{}",
            )
        )

    # heavy user: completes the funnel, then spams clicks forever
    add(1, "view", 0, 1.0)
    add(1, "click", 10, 2.0)
    add(1, "purchase", 20, 3.0)
    for i in range(N_HEAVY - 3):
        add(1, "click", 30 + i, 0.5)
    # user 2: click BEFORE view -> stalls at view stage
    add(2, "click", 0, 1.0)
    add(2, "view", 10, 1.0)
    # user 3: view -> click, purchase before click -> stalls at click
    add(3, "purchase", 0, 9.0)
    add(3, "view", 10, 1.0)
    add(3, "click", 20, 1.0)
    # user 4: never views
    add(4, "click", 0, 1.0)
    add(4, "purchase", 10, 1.0)

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    d = tmp_path_factory.mktemp("skew")
    pq.write_table(table, d / "events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def duck_events(skew_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{skew_dir}/events.parquet'"
    )
    yield con
    con.close()


@pytest.mark.slow
def test_funnel_heavy_user_matches_oracle(spark, skew_dir, duck_events):
    from pythonvectordb_spark.registry import ORACLES, QUERIES

    df = QUERIES["event_funnel"](spark, skew_dir)
    ok, msg = compare(df, duck_events, ORACLES["event_funnel"])
    assert ok, msg
    row = df.collect()[0]
    # hand-check: users 1-4 exist; 1,2,3 viewed; only 1 clicked after
    # first view... except user 3 clicked after view too; only 1 purchased
    assert row.n_users == 4
    assert row.stage_view == 3
    assert row.stage_click == 2  # users 1 and 3
    assert row.stage_purchase == 1  # user 1 only


def test_funnel_plan_has_no_collect_list(spark, skew_dir):
    from pythonvectordb_spark.registry import QUERIES

    plan = QUERIES["event_funnel"](spark, skew_dir)._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan, "funnel must keep bounded per-user state"


def test_user_event_paths_heavy_user(spark, skew_dir, duck_events):
    from pythonvectordb_spark.registry import ORACLES, QUERIES

    df = QUERIES["user_event_paths"](spark, skew_dir)
    ok, msg = compare(df, duck_events, ORACLES["user_event_paths"])
    assert ok, msg
    heavy = {r.user_id: r for r in df.collect()}[1]
    # list capped at the first 10 events even though the user has 20k
    assert heavy.n_events == N_HEAVY
    assert heavy.path10.count(">") == 9
    assert heavy.path10.startswith("view>click>purchase>click")
