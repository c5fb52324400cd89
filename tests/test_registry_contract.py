"""Driver-canonicalization contract for every oracled query.

The driver's CORRECTNESS comparator canonicalizes each result by sorting
all columns in pandas and hashing the values; array/map/struct cells are
unhashable there (round 2's `pq_encode` err). Any ORACLED query can
rotate into the driver's front-50 window in a later round, so every one
of them must emit only scalar columns — operators keep their natural
array outputs; the REGISTERED projection strings them
(`pq_encode`/`encode_tokens` pattern). Since round 7 every registered
query is oracled — the last two rows-only sketches graduated to
hash-matched sketch-internal oracles (KMV / bottom-k sample).
"""

import pytest

from pyspark.sql import types as T

from tests.conftest import SF_SMOKE

NON_SCALAR = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.slow
def test_oracled_schemas_are_driver_canonicalizable(spark):
    from pythonvectordb_spark.registry import ORACLES, QUERIES

    bad = []
    for name in ORACLES:
        for f in QUERIES[name](spark, SF_SMOKE).schema.fields:
            if isinstance(f.dataType, NON_SCALAR):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"non-scalar columns in oracled queries: {bad}"


def test_never_witnessed_queries_sit_in_front():
    """Witness-pipeline solvency (round-6 VERDICT ask #7): the driver
    checks the FIRST 50 registry entries each round, so a query that has
    never received a driver CORRECTNESS row must never sit BEHIND one
    that has — otherwise staged queries silently age without a witness
    (the round-4/5 debt this rule retires). New queries therefore enter
    at the BACK of the never-witnessed prefix, in front of all
    previously-witnessed entries.

    STALE_UNTIL names queries whose driver row predates a schema change
    (they must be re-witnessed, so they count as unwitnessed until a
    CORRECTNESS row from round >= the listed round lands — derived from
    the cumulative record, never frozen; round-6 VERDICT fix #1).
    """
    import glob
    import json
    import os
    import re

    from pythonvectordb_spark.registry import ORACLES, QUERIES

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)", path).group(1))
        with open(path) as fh:
            for name in json.load(fh):
                latest_round[name] = max(latest_round.get(name, 0), rnd)
    if not latest_round:  # fresh clone without driver artifacts: vacuous
        return
    # schema-change log: a witness row only counts if its round is >= the
    # round that changed the query's output schema
    # single source of truth shared with tools/rotation_plan.py (r9)
    from pythonvectordb_spark.registry._core import STALE_UNTIL as stale_until
    # the last two rows-only entries graduated to sketch-internal
    # oracles in round 7 — every registered query must carry an oracle
    rows_only = [n for n in QUERIES if n not in ORACLES]
    assert not rows_only, f"unoracled queries are no longer allowed: {rows_only}"
    order = list(QUERIES)
    seen_witnessed_at = None
    for i, name in enumerate(order):
        is_witnessed = latest_round.get(name, 0) >= stale_until.get(name, 1)
        if is_witnessed and seen_witnessed_at is None:
            seen_witnessed_at = (i, name)
        if not is_witnessed and seen_witnessed_at is not None:
            first_i, first_name = seen_witnessed_at
            raise AssertionError(
                f"never-witnessed query {name!r} (position {i}) sits behind "
                f"witnessed {first_name!r} (position {first_i}); move it into "
                "the never-witnessed prefix so the next front-50 window "
                "reaches it"
            )


def test_registry_lazy_reexports_resolve():
    """The round-9 slim __init__ replaced 1,500 explicit re-exports
    with a module __getattr__; pre-split import sites must keep
    working for every kind of name the single-file registry exported
    (query/oracle functions, shared constants, helper builders), and
    unknown names must still raise AttributeError (not return None or
    loop)."""
    import pytest as _pytest

    import pythonvectordb_spark.registry as R

    # one of each name class, spread across family modules + _core
    for name in (
        "q_knn_search",            # query fn (vector family)
        "o_gate_champion_challenger",  # oracle fn (curation family)
        "q_mllib_als_retrieval",   # mllib family
        "load_table",              # _core helper
        "STOPWORDS",               # _core constant
        "STALE_UNTIL",             # the shared schema-change ledger
    ):
        assert getattr(R, name) is not None, name
    # from-import form resolves through __getattr__ too
    from pythonvectordb_spark.registry import q_pricing_summary  # noqa: F401

    with _pytest.raises(AttributeError):
        R.q_this_query_does_not_exist


def test_build_rejects_order_and_binding_asymmetry():
    """_build() must fail loudly in BOTH directions (ADVICE r9): a name
    in _ORDER without q_/o_ bindings already raised; a q_* binding in a
    family module that was forgotten from _ORDER used to be silently
    dropped (never registered, never witnessed). Pin both by rebuilding
    against a perturbed _ORDER."""
    import pythonvectordb_spark.registry as R

    # dropping a name from _ORDER -> that family binding is now an extra
    orig = R._ORDER
    try:
        R._ORDER = tuple(n for n in orig if n != "knn_search")
        try:
            R._build()
        except ImportError as e:
            assert "missing from _ORDER" in str(e) and "knn_search" in str(e)
        else:
            raise AssertionError("extra q_* binding did not raise")
        # a name in _ORDER without bindings -> the original loud path
        R._ORDER = orig + ("this_query_does_not_exist",)
        try:
            R._build()
        except ImportError as e:
            assert "without q_/o_ bindings" in str(e)
        else:
            raise AssertionError("unbound _ORDER name did not raise")
    finally:
        R._ORDER = orig


def test_getattr_caches_resolution():
    """__getattr__ must cache the winner in module globals (ADVICE r9):
    repeat lookups skip the linear family-module scan and the _core-first
    winner is frozen deterministically."""
    import pythonvectordb_spark.registry as R

    name = "o_pricing_summary"
    R.__dict__.pop(name, None)
    first = getattr(R, name)
    assert name in R.__dict__ and R.__dict__[name] is first
    assert getattr(R, name) is first
