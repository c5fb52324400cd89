"""Witness-freshness rotation planner (VERDICT r7 task 1's standing
policy, mechanized): read the cumulative driver CORRECTNESS record,
compute each registered query's latest witness round, and print the
recommended next front-50 — never-witnessed queries first (the
contract-test invariant), then the stalest cohort oldest-first with the
current registry order as the deterministic tie-break.

Usage:
    python tools/rotation_plan.py            # report + recommended order
    python tools/rotation_plan.py --check    # exit 1 if the current
                                             # front-50 is not the
                                             # recommended one
"""

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

WINDOW = 50


def latest_witness() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)", path).group(1))
        with open(path) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> int:
    from pythonvectordb_spark.registry import QUERIES
    from pythonvectordb_spark.registry._core import STALE_UNTIL

    order = list(QUERIES)
    # a witness older than the query's last schema change does not
    # count (shared ledger, round 9): such queries re-enter the
    # never-witnessed prefix until a fresh driver row lands
    latest = {
        n: r for n, r in latest_witness().items() if r >= STALE_UNTIL.get(n, 1)
    }
    pos = {n: i for i, n in enumerate(order)}
    never = [n for n in order if n not in latest]
    witnessed = sorted(
        (n for n in order if n in latest), key=lambda n: (latest[n], pos[n])
    )
    plan = (never + witnessed)[:WINDOW]

    from collections import Counter

    hist = Counter(latest.get(n, 0) for n in order)
    print("witness histogram (0 = never):", dict(sorted(hist.items())))
    stale_after = [n for n in witnessed if n not in plan][: WINDOW]
    print(f"\nrecommended front-{WINDOW}:")
    for n in plan:
        print(f"  {n}  (last witnessed r{latest.get(n, 0)})")
    if stale_after:
        print(f"\nnext in line after this window: {stale_after[:5]} ...")

    current = order[:WINDOW]
    ok = current == plan
    print(f"\ncurrent front-{WINDOW} {'==' if ok else '!='} recommendation")
    if "--check" in sys.argv:
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
