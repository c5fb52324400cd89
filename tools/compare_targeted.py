"""Targeted oracle compare: run named registry queries against their
DuckDB oracles at one SF dir. Usage:
    python tools/compare_targeted.py SF_DIR name1 name2 ...
Writes PASS/FAIL lines to stdout (redirect to a file: Spark's \r
progress bars swallow piped lines otherwise)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

sf_dir = sys.argv[1]
names = sys.argv[2:]

from tests.oracle_utils import compare, duck_connection  # noqa: E402
from pythonvectordb_spark.session import get_spark  # noqa: E402
from pythonvectordb_spark.registry import ORACLES, QUERIES  # noqa: E402

spark = get_spark()
duck = duck_connection(sf_dir)
fails = []
for n in names:
    df = QUERIES[n](spark, sf_dir)
    ok, msg = compare(df, duck, ORACLES[n])
    print(("PASS" if ok else "FAIL") + f" {n}: {msg}", flush=True)
    if not ok:
        fails.append(n)
print("FAILS:", fails, flush=True)
