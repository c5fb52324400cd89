"""Every registered query must hash-match its DuckDB oracle at sf0.001
(the driver runs the same check at sf0.01).

Tier-2 (`slow`): the /verify sweep runs the identical comparison for
all queries at the larger sf0.01 before every commit, so the fast path
(`-m "not slow"`) skips this module; the full suite still runs it once
per round."""

import pytest

pytestmark = pytest.mark.slow

from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connection


def _registry():
    from pythonvectordb_spark.registry import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    return QUERIES, ORACLES


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        queries, oracles = _registry()
        metafunc.parametrize("qname", sorted(oracles))


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


def test_oracle(qname, spark, duck):
    queries, oracles = _registry()
    df = queries[qname](spark, SF_SMOKE)
    ok, msg = compare(df, duck, oracles[qname])
    assert ok, f"{qname}: {msg}"
