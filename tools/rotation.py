#!/usr/bin/env python
"""Driver-window rotation audit: compute per-query driver-row staleness
from CORRECTNESS_r*.json and check/propose the 50-entry window.

    python -m tools.rotation            # staleness report + policy check
    python -m tools.rotation --propose  # print a proposed next-round window

Policy (encoded from the round-5 verdict + advisor notes):
  1. every query with NO driver row ever goes in the window;
  2. queries whose oracle changed since their last driver row go in
     (cannot be detected here — the round's builder must add them);
  3. the pinned bench sentinels (plans.queries.DRIVER_SENTINELS) are
     always in, so shared-operator regressions surface externally;
  4. remaining slots fill oldest-driver-row-first.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def latest_driver_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for q in json.load(open(f)):
            latest[q] = max(rnd, latest.get(q, 0))
    return latest


def main() -> None:
    from prod_data_pipeline_spark.plans.queries import (
        DRIVER_ORDER,
        DRIVER_SENTINELS,
        QUERIES,
    )

    latest = latest_driver_round()
    never = sorted(q for q in QUERIES if q not in latest)
    by_age = sorted((r, q) for q, r in latest.items() if q in QUERIES)

    print(f"registered queries : {len(QUERIES)}")
    print(f"never driver-checked: {len(never)}")
    for q in never:
        mark = " [IN WINDOW]" if q in DRIVER_ORDER else " [DARK]"
        print(f"  {q}{mark}")
    from collections import Counter

    ages = Counter(r for r, _ in by_age)
    print("driver rows by round:", dict(sorted(ages.items())))

    window = set(DRIVER_ORDER)
    dark = [q for q in never if q not in window]
    missing_sentinels = [s for s in DRIVER_SENTINELS if s not in window]
    ok = True
    if len(DRIVER_ORDER) != WINDOW:
        print(f"POLICY FAIL: window has {len(DRIVER_ORDER)} entries, want {WINDOW}")
        ok = False
    if dark:
        print(f"POLICY FAIL: {len(dark)} never-checked queries outside the window: {dark}")
        ok = False
    if missing_sentinels:
        print(f"POLICY FAIL: sentinels missing from window: {missing_sentinels}")
        ok = False
    if ok:
        print("policy check: OK (window size, never-checked coverage, sentinels)")

    if "--propose" in sys.argv:
        # next round: assume everything in the current window gets a row
        nxt = {q: max(latest.values()) + 1 if q in window else latest.get(q, 0)
               for q in QUERIES}
        order = [q for q in never if q not in window]  # should be empty
        order += list(DRIVER_SENTINELS)
        for _, q in sorted((r, q) for q, r in nxt.items()):
            if len(order) >= WINDOW:
                break
            if q not in order:
                order.append(q)
        print("\nproposed next-round DRIVER_ORDER (oldest-first + sentinels):")
        for q in order[:WINDOW]:
            print(f'    "{q}",')

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
