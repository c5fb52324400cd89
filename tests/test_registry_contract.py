"""Driver-canonicalization contract for every oracled query.

The driver's CORRECTNESS comparator canonicalizes each result by sorting
all columns in pandas and hashing the values; array/map/struct cells are
unhashable there (round 2's `pq_encode` err). Any ORACLED query can
rotate into the driver's front-50 window in a later round, so every one
of them must emit only scalar columns — operators keep their natural
array outputs; the REGISTERED projection strings them
(`pq_encode`/`encode_tokens` pattern). Rows-only entries (no oracle) are
exempt: the driver only counts their rows.
"""

from pyspark.sql import types as T

from tests.conftest import SF_SMOKE

NON_SCALAR = (T.ArrayType, T.MapType, T.StructType)


def test_oracled_schemas_are_driver_canonicalizable(spark):
    from pythonvectordb_spark.registry import ORACLES, QUERIES

    bad = []
    for name in ORACLES:
        for f in QUERIES[name](spark, SF_SMOKE).schema.fields:
            if isinstance(f.dataType, NON_SCALAR):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"non-scalar columns in oracled queries: {bad}"
