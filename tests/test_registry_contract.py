"""Driver-canonicalization contract for the front-50 window.

The driver's CORRECTNESS comparator canonicalizes each result by sorting
all columns in pandas and hashing the values; array/map/struct cells are
unhashable there (round 2's `pq_encode` err). Every query in the first-50
window — the slice the driver actually checks — must therefore emit only
scalar columns. Queries past the window may keep their natural array
outputs (the operator contracts do); when they rotate forward they get a
string projection like `pq_encode`/`encode_tokens`.
"""

from itertools import islice

from pyspark.sql import types as T

from tests.conftest import SF_SMOKE

NON_SCALAR = (T.ArrayType, T.MapType, T.StructType)


def test_front50_schemas_are_driver_canonicalizable(spark):
    from pythonvectordb_spark.registry import QUERIES

    bad = []
    for name, fn in islice(QUERIES.items(), 50):
        for f in fn(spark, SF_SMOKE).schema.fields:
            if isinstance(f.dataType, NON_SCALAR):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"non-scalar columns in driver window: {bad}"
