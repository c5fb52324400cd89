"""Round-8 surface on the public API — runnable:

    python examples/gates_and_retrieval.py [sf_dir]

Composes the trained-estimator operators the way a curation + serving
job would: pick the ingest quality gate by evidence (the four-gate,
two-label champion-challenger report — round 9 adds the GBT tree arm
and the topic-routing label), then build the collaborative retrieval
index (ALS on the purchase matrix) next to the content index the other
examples build, and read both verdict frames into one summary. Every
step is a pure DataFrame transform; nothing collects until the end.

Defaults to the sf0.001 testdata so it runs in seconds; point it at a
bigger sf_dir (or your own tables with the same schemas) unchanged.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pythonvectordb_spark as pv
from pythonvectordb_spark.indexing import als_purchase_retrieval
from pythonvectordb_spark.operators.curation import gate_champion_challenger
from pythonvectordb_spark.sources.testdata import load_table


def run(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = pv.get_spark("gates-and-retrieval-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    # 1. which quality gate should ingest run? One report, one split.
    gates = gate_champion_challenger(docs).first().asDict()

    # 2. collaborative retrieval over the purchase matrix: exact
    # interaction census + held-out hit-rates vs the chance floor.
    retrieval = als_purchase_retrieval(orders, lineitem).first().asDict()

    return {"gates": gates, "retrieval": retrieval}


if __name__ == "__main__":
    import json

    out = run(*(sys.argv[1:2] or []))
    print(json.dumps(out, indent=2, default=str))
