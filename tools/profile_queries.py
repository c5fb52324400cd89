"""Optimization-round profiler: time registered queries individually
(noop sink per guide §1.4) and/or dump their .explain('formatted') plans.

Usage:
    python tools/profile_queries.py time SF_DIR out.json [name ...]
    python tools/profile_queries.py plan SF_DIR out_dir [name ...]

`time` warms each query once, then records best-of-2 noop-sink seconds
AND best-of-2 collect() seconds (the bench's timed action), so the two
methodologies can be compared side by side. `plan` writes one
``<name>.txt`` per query with the formatted physical plan. With no
names given, every registered query is processed.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

from pythonvectordb_spark.session import get_spark  # noqa: E402
from pythonvectordb_spark.registry import QUERIES  # noqa: E402


def main() -> None:
    mode, sf_dir, out = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:] or list(QUERIES)
    spark = get_spark("pvdb-profile")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "plan":
        os.makedirs(out, exist_ok=True)
        for n in names:
            # build the DataFrame ONCE (ADVICE r10): plan construction is
            # itself seconds for literal-heavy queries, and building it
            # twice doubled exactly the cost this mode exists to measure
            df = QUERIES[n](spark, sf_dir)
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(out, f"{n}.txt"), "w") as f:
                f.write(plan)
            print(f"plan {n}: {len(plan)} chars", flush=True)
        return

    assert mode == "time"
    res: dict[str, dict[str, float]] = {}
    for n in names:
        fn = QUERIES[n]
        spark.sparkContext.setJobDescription(f"profile:{n}")
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm
            noop = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                noop = min(noop, time.time() - t0)
            coll = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                coll = min(coll, time.time() - t0)
            res[n] = {"noop_s": round(noop, 3), "collect_s": round(coll, 3)}
            print(f"time {n}: noop {noop:.3f}s collect {coll:.3f}s", flush=True)
        except Exception as e:  # keep going; record the failure
            res[n] = {"error": str(e)[:200]}  # type: ignore[dict-item]
            print(f"time {n}: ERROR {e}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)
    with open(out, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
