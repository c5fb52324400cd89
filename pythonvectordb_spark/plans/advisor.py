"""Plan advisor: static scale-review of a DataFrame's physical plan.

``advise(df)`` reads the formatted explain output and returns typed
findings for the anti-patterns that actually kill 100 TB jobs — the
automated version of the review this repo's own tests run by hand
(tests/test_plans.py pins the GOOD shapes; the advisor flags the bad
ones in user queries before they run):

  cartesian-product     CartesianProduct / non-broadcast nested-loop
                        join — O(n*m) row pairs.
  nested-loop-join      BroadcastNestedLoopJoin with a non-trivial
                        build side: fine for one-row stat frames,
                        quadratic wall time for real tables.
  python-row-udf        BatchEvalPython = row-at-a-time Python in the
                        data path (Arrow-vectorized shows as
                        ArrowEvalPython / MapInPandas and is not
                        flagged).
  unpushed-filter       a Filter sits directly above a parquet scan
                        whose PushedFilters is empty — the predicate
                        evaluates AFTER full IO instead of inside it.
  wide-scan             a scan reads >= ``wide_scan_cols`` columns;
                        usually a missing select() before a wide table
                        enters a join/agg.
  global-sort           a full Sort with a global Exchange
                        (rangepartitioning) not produced by top-k —
                        TakeOrderedAndProject is the bounded form.
  many-shuffles         more than ``max_exchanges`` Exchange nodes in
                        one plan: each is a full materialization
                        barrier; often a missing cache()/checkpoint or
                        a join tree that re-derives the same frame.

Heuristics over explain text, deliberately: the advisor must not change
the plan or trigger execution (it never calls an action), and the same
strings are what a human reads in the Spark UI. Findings carry the
matching plan fragment so they can be grepped straight back to the UI.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from pythonvectordb_spark.plans.explain import explain_str

__all__ = ["Finding", "advise"]


@dataclass
class Finding:
    code: str
    severity: str  # "high" | "medium" | "low"
    message: str
    fragment: str


def _findall_ops(txt: str, op: str) -> list[str]:
    return re.findall(rf"^\s*[+:*\-|\s]*({op}[^\n]*)", txt, flags=re.MULTILINE)


def advise(
    df: DataFrame,
    wide_scan_cols: int = 12,
    max_exchanges: int = 6,
) -> list[Finding]:
    """Static findings for ``df``'s physical plan, most severe first.
    Never executes the query."""
    txt = explain_str(df)
    out: list[Finding] = []

    for frag in _findall_ops(txt, "CartesianProduct"):
        out.append(
            Finding(
                "cartesian-product",
                "high",
                "Cartesian product: every left row pairs with every right "
                "row. Add an equi-join key, or broadcast() an intentionally "
                "tiny side.",
                frag,
            )
        )

    for frag in _findall_ops(txt, "BroadcastNestedLoopJoin"):
        out.append(
            Finding(
                "nested-loop-join",
                "medium",
                "Nested-loop join: per-row scan of the broadcast side. Fine "
                "for one-row stat frames; quadratic for real tables — check "
                "the build side's size.",
                frag,
            )
        )

    for frag in _findall_ops(txt, "BatchEvalPython"):
        if "UDTF" in frag:
            # UDTFs have no Arrow execution mode — row-wise is the only
            # way to write one, so this is informational, not a defect
            out.append(
                Finding(
                    "python-udtf",
                    "low",
                    "Python UDTF in the data path (row-wise by construction). "
                    "Keep the exploded row count bounded; if the logic is "
                    "per-row scalar, a pandas_udf is the vectorized form.",
                    frag,
                )
            )
            continue
        out.append(
            Finding(
                "python-row-udf",
                "high",
                "Row-at-a-time Python UDF in the data path (BatchEvalPython). "
                "Rewrite with built-in expressions, or at least a pandas_udf "
                "(ArrowEvalPython) for ~10-100x.",
                frag,
            )
        )

    # unpushed filter: the plan filters rows but NO scan pushes any
    # predicate (the PushedFilters line is absent, or present and empty)
    n_scans = len(re.findall(r"Scan parquet", txt))
    n_pushing = len(re.findall(r"PushedFilters: \[[^\]]+\]", txt))
    has_filter_node = bool(re.search(r"^\s*[+:*\-|\s]*(\(\d+\) )?Filter", txt, re.M))
    if n_scans and n_pushing == 0 and has_filter_node:
        out.append(
            Finding(
                "unpushed-filter",
                "medium",
                f"The plan filters rows but none of its {n_scans} parquet "
                "scan(s) push a predicate. If the filter is on scanned "
                "columns, express it as a comparison Catalyst can push "
                "(avoid UDFs/casts on the column side).",
                "no PushedFilters on any scan",
            )
        )

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", txt):
        ncols = len([p for p in m.group(1).split(",") if p.strip()])
        if ncols >= wide_scan_cols:
            out.append(
                Finding(
                    "wide-scan",
                    "medium",
                    f"A scan reads {ncols} columns. select() the needed "
                    "columns before joins/aggs so pruning reaches the scan.",
                    m.group(0)[:120],
                )
            )

    if re.search(r"rangepartitioning\(", txt) and "TakeOrderedAndProject" not in txt:
        out.append(
            Finding(
                "global-sort",
                "low",
                "Global sort (range-partitioned Exchange) without a top-k. "
                "If only the first k rows matter, orderBy(...).limit(k) "
                "compiles to TakeOrderedAndProject (per-partition heaps).",
                "Exchange rangepartitioning",
            )
        )

    n_exchanges = len(re.findall(r"\(\d+\) Exchange", txt)) or len(
        re.findall(r"^\s*[+:*\-|\s]*Exchange", txt, re.M)
    )
    if n_exchanges > max_exchanges:
        out.append(
            Finding(
                "many-shuffles",
                "low",
                f"{n_exchanges} shuffle Exchanges in one plan. Check for "
                "re-derived subtrees (cache/localCheckpoint them) and joins "
                "that could share one partitioning.",
                f"{n_exchanges} x Exchange",
            )
        )

    sev = {"high": 0, "medium": 1, "low": 2}
    out.sort(key=lambda f: sev[f.severity])
    return out
