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
  union-recompute       the same expensive subtree (contains a shuffle
                        / aggregation / join / window) appears two or
                        more times in one plan — DataFrame unions and
                        self-joins have NO cross-branch common-subtree
                        elimination, so each branch re-executes the
                        whole upstream pipeline (the round-3 perf-bug
                        class: per-band/per-block fan-outs built as
                        unions). Build fan-outs as ONE struct-array
                        explode, and localCheckpoint any frame read by
                        multiple join sides. Reads of the SAME
                        checkpointed RDD from several branches are the
                        fixed pattern and are not flagged.

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


# operators that represent real recomputed WORK when duplicated; a
# duplicated subtree made only of scan/filter/project is conventional
# double-IO, not the union-recompute bug class
_EXPENSIVE_OPS = (
    "Exchange",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Window",
    "Generate",
    "Expand",
    "Sort",
)


def _duplicated_subtrees(txt: str, min_nodes: int = 3) -> list[tuple[str, int, int]]:
    """(root op, subtree size, occurrence count) for maximal subtrees that
    appear >= 2x in the main physical-plan tree and contain expensive work.

    Fingerprints combine each operator's tree label with its normalized
    detail block (expression ids ``#N`` and plan ids stripped — duplicate
    plan instances get fresh ids) plus child fingerprints, so two
    branches differing only in literals-above-a-shared-pipeline still
    match on the shared pipeline below. ``Scan ExistingRDD`` leaves keep
    their RAW attribute ids: distinct localCheckpoints stay distinct,
    and multiple reads of one checkpoint (cached blocks — the sanctioned
    fan-out pattern) are deliberately not reported.

    Two execution realities shape what counts as a duplicate:
      * ``InMemoryTableScan`` (a .cache()/.persist() read) is treated as
        a LEAF — explain prints the cached plan beneath it, but
        execution reads cached blocks, so that subtree is not recomputed.
      * a duplicated subtree rooted AT an ``Exchange`` is not reported
        on its own: Spark's runtime exchange reuse shares identical
        shuffle results, so the duplication costs (almost) nothing. A
        duplicate is reported only when it carries expensive work that
        sits ABOVE every such reusable exchange (that work — final
        aggregates, windows, joins — really does run once per
        occurrence).
    """
    lines = txt.splitlines()
    try:
        start = next(
            i for i, ln in enumerate(lines) if ln.startswith("== Physical Plan ==")
        )
    except StopIteration:
        return []
    tree: list[tuple[int, str, str | None]] = []  # (depth, label, op id)
    i = start + 1
    while i < len(lines) and lines[i].strip():
        ln = lines[i]
        m = re.match(r"^([:+\-|\s]*)\*?\s?(.*?)(?:\s+\((\d+)\))?$", ln)
        if not m or not m.group(2).strip():
            break
        prefix, label, nid = m.group(1), m.group(2).strip(), m.group(3)
        tree.append((len(prefix) // 3, label, nid))
        i += 1
    if not tree:
        return []

    # detail blocks: "(N) OpName" followed by attribute lines
    details: dict[str, str] = {}
    for m in re.finditer(
        r"^\((\d+)\) [^\n]*\n((?:(?!\(\d+\) )(?!=)[^\n]*\n?)*)", txt, re.MULTILINE
    ):
        details[m.group(1)] = m.group(2)

    def _opkey(label: str, nid: str | None) -> str:
        det = details.get(nid or "", "")
        if label.startswith("Scan ExistingRDD"):
            return f"{label}|{det}"  # keep raw ids (see docstring)
        det = re.sub(r"#\d+", "#", det)
        det = re.sub(r"plan_id=\d+", "plan_id=", det)
        det = re.sub(r"\s+", " ", det)
        label = re.sub(r"#\d+", "#", label)
        return f"{label}|{det}"

    # build the tree (preorder + depth), then fingerprint bottom-up
    n = len(tree)
    children: list[list[int]] = [[] for _ in range(n)]
    stack: list[int] = []
    for idx, (depth, _label, _nid) in enumerate(tree):
        while stack and tree[stack[-1]][0] >= depth:
            stack.pop()
        if stack:
            children[stack[-1]].append(idx)
        stack.append(idx)

    # cached/reused nodes are leaves at execution time: explain prints
    # the producing plan beneath them, but it does not run per read —
    # detach those subtrees from fingerprints and from reporting
    _LEAF_OPS = ("InMemoryTableScan", "ReusedExchange", "ReusedSubquery")
    covered: set[int] = set()
    for idx in range(n):
        if tree[idx][1].startswith(_LEAF_OPS):
            todo = list(children[idx])
            children[idx] = []
            while todo:
                c = todo.pop()
                covered.add(c)
                todo.extend(children[c])

    fps: list[str] = [""] * n
    sizes: list[int] = [0] * n

    for idx in range(n - 1, -1, -1):
        depth, label, nid = tree[idx]
        ch = children[idx]
        fps[idx] = _opkey(label, nid) + "[" + ",".join(fps[c] for c in ch) + "]"
        sizes[idx] = 1 + sum(sizes[c] for c in ch)

    counts: dict[str, int] = {}
    for idx in range(n):
        if idx not in covered:
            counts[fps[idx]] = counts.get(fps[idx], 0) + 1

    # heavy = carries expensive work that will NOT be runtime-reused: a
    # duplicated Exchange shields everything beneath it (identical
    # shuffles share their result at execution), so only expensive ops
    # sitting above every such exchange count
    heavy: list[bool] = [False] * n
    for idx in range(n - 1, -1, -1):
        label = tree[idx][1]
        if label.startswith("Exchange") and counts.get(fps[idx], 0) >= 2:
            heavy[idx] = False  # reusable shuffle: subtree shielded
            continue
        heavy[idx] = label.startswith(_EXPENSIVE_OPS) or any(
            heavy[c] for c in children[idx]
        )

    out: list[tuple[str, int, int]] = []
    seen: set[str] = set()
    # `covered` already holds the cached-leaf descendants; reported
    # roots' descendants join it below

    def _cover(idx: int) -> None:
        todo = list(children[idx])
        while todo:
            c = todo.pop()
            covered.add(c)
            todo.extend(children[c])

    for idx in range(n):  # preorder: parents first -> report maximal only
        fp = fps[idx]
        if idx in covered:
            continue
        if fp in seen:  # another occurrence of a reported subtree
            _cover(idx)
            continue
        if counts[fp] < 2 or sizes[idx] < min_nodes or not heavy[idx]:
            continue
        seen.add(fp)
        out.append((tree[idx][1], sizes[idx], counts[fp]))
        _cover(idx)
    return out


def advise(
    df: DataFrame,
    wide_scan_cols: int = 12,
    max_exchanges: int = 6,
) -> list[Finding]:
    """Static findings for ``df``'s physical plan, most severe first.
    Never executes the query."""
    txt = explain_str(df)
    out: list[Finding] = []

    lines = txt.split("\n")
    for i, ln in enumerate(lines):
        m = re.match(r"^\s*[+:*\-|\s]*(CartesianProduct[^\n]*)", ln)
        if not m:
            continue
        frag = m.group(1)
        # The exemption must hold on the cartesian node's OWN child
        # branches (ADVICE r8): an accidental cartesian that merely
        # sits NEAR ALS recommend frames in the tree — beside them, or
        # above a single recommend output — must still flag. Walk the
        # formatted tree downward while the branch-marker indentation
        # is strictly deeper than the cartesian's (exactly its
        # subtree), split it into the two direct child branches, and
        # require the recommendation class in the detail entries of
        # BOTH: MLlib's blocked recommend feeds the cross-product from
        # two factor-block MapPartitions whose detail names
        # ml.recommendation.ALSModel on each side. (A hand-written
        # cross of two recommend OUTPUT frames would also pass — both
        # branches genuinely are recommendation frames — accepted.)
        depth = len(re.match(r"^[\s:+|\-*]*", ln).group(0))
        branches: list[list[str]] = []
        child_depth = None
        for nxt in lines[i + 1 :]:
            if not nxt.strip() or "(" not in nxt:
                break
            nd = len(re.match(r"^[\s:+|\-*]*", nxt).group(0))
            if nd <= depth:
                break
            if child_depth is None:
                child_depth = nd
            if nd == child_depth:
                branches.append([])
            if branches:
                branches[-1].append(nxt)

        def _branch_has_recommend(branch: list[str]) -> bool:
            ids = re.findall(
                r"\((\d+)\)\s*$", "\n".join(branch), flags=re.MULTILINE
            )
            detail = "\n".join(
                frag2
                for nid in ids
                for frag2 in re.findall(
                    rf"^\({nid}\) [^\n]*(?:\n[^\(\n][^\n]*)*",
                    txt,
                    flags=re.MULTILINE,
                )
            )
            return "ml.recommendation" in detail

        if len(branches) >= 2 and all(map(_branch_has_recommend, branches)):
            # MLlib ALS recommendForAll/ForUserSubset: a BLOCKED factor
            # cross-product (user-factor blocks x item-factor blocks,
            # per-block GEMM + bounded top-k heap) — the documented
            # all-pairs-scoring algorithm, not the accidental-cartesian
            # bug class (same carve-out shape as the UDTF exemption:
            # the op has no narrower physical form).
            out.append(
                Finding(
                    "mllib-blocked-recommend",
                    "info",
                    "ALS blocked recommend: intentional factor-block "
                    "cross-product with per-block top-k. Bound the user "
                    "subset and k; work is users x items by definition.",
                    frag,
                )
            )
            continue
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

    for root_op, n_nodes, n_occ in _duplicated_subtrees(txt):
        out.append(
            Finding(
                "union-recompute",
                "medium",
                f"An expensive {n_nodes}-operator subtree rooted at "
                f"'{root_op}' appears {n_occ}x in this plan. Unions and "
                "self-joins have no cross-branch subtree elimination, so "
                "each occurrence re-executes the whole upstream pipeline. "
                "Build per-band/per-block fan-outs as ONE struct-array "
                "explode, and localCheckpoint frames read by multiple "
                "join sides.",
                f"{n_occ} x {root_op} ({n_nodes} ops each)",
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

    sev = {"high": 0, "medium": 1, "low": 2, "info": 3}
    out.sort(key=lambda f: sev[f.severity])
    return out
