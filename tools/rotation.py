#!/usr/bin/env python
"""Driver-window rotation audit: compute per-query driver-row staleness
from CORRECTNESS_r*.json and check/propose the 50-entry window.

    python -m tools.rotation            # staleness report + policy check
    python -m tools.rotation --propose  # print a proposed next-round window

Policy (round-5 verdict + advisor notes; STALE-FIRST precedence added in
round 7 when the mandatory set first outgrew the window; the staleness
budget became CAPACITY-DERIVED in round 8 after the round-7 advisor
proved a hard-coded 3-round budget infeasible at steady state — with
198 queries and 47 non-sentinel slots a full rotation takes 5 rounds,
so a 3-round budget mathematically over-saturates the window):
  1. the pinned bench sentinels (plans.queries.DRIVER_SENTINELS) are
     always in, so shared-operator regressions surface externally;
  2. every query stale past the freshness budget goes in, where the
     budget is ceil(n_queries / (WINDOW - n_sentinels)) rounds — the
     fastest full rotation the window capacity permits — because
     letting driver evidence age past what rotation can physically
     refresh is worse than deferring a brand-new query one round (new
     queries are hash-verified against their oracles at sf0.001 by the
     local suite every round regardless);
  3. every never-driver-checked query goes in, seated AHEAD of the
     stale cohort (round-12 verdict: a query with ZERO driver evidence
     outranks one whose evidence is merely old — --propose emits them
     first, and the round-13 window was adopted on that ordering); when
     sentinels + never-checked + stale outgrow the window, the overflow
     (stale or never-checked alike) defers to the FRONT of next round's
     window (reported below, not a failure — a failure is ANY due row
     deferred while a non-mandatory filler holds a slot);
  4. queries whose plan/oracle changed since their last driver row go
     in — detected via the fingerprint ledger since round 14 (see
     below); before that the builder had to track changes by hand,
     which is exactly how the four r13 advisory-touched queries came to
     need manual fronting in r14;
  5. remaining slots fill oldest-driver-row-first.

Fingerprint ledger (tools/query_fingerprints.json): for every query,
the md5 of (oracle SQL + the TRANSITIVE-CLOSURE source of the DataFrame
builder: the builder itself plus every same-package function/class it
references, directly or through local imports, plus referenced
module-level constants) at the last state a driver row checked, plus
that round.  Closure hashing (algo 2, r15 — r14 advisory #1) closes the
algo-1 blind spot where an edit to a helper the builder calls (e.g.
operators/quality.py) left the fingerprint unchanged; remaining blind
spots are dynamic dispatch (getattr-by-name lookups) and behavior
smuggled through non-repr-stable constants — neither occurs in plans/
today.  `--fingerprint` refreshes the ledger for the CURRENT window
(run it right after adopting a round's window — those queries are about
to be driver-checked at their current state) and stamps `changed_at` on
any window entry whose fingerprint actually moved, so the audit can
tell a policy-#4 seating from a non-mandatory filler; the audit then
flags any query whose live fingerprint differs from its ledger entry
while sitting OUTSIDE the window (a policy-#4 violation the tool can
now see).  Queries with no ledger entry — or with an entry from an
older algo — are reported, not failed.
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def staleness_budget(n_queries: int, n_sentinels: int) -> int:
    """Freshness budget in rounds: the fastest full rotation the window
    capacity permits, ceil(n / (WINDOW - sentinels)).  A row older than
    this means the rotation was skipped; anything younger may simply be
    waiting its turn in an oldest-first cycle."""
    return max(1, math.ceil(n_queries / max(1, WINDOW - n_sentinels)))


FINGERPRINTS = os.path.join(REPO, "tools", "query_fingerprints.json")


#: Fingerprint algorithm version.  1 = builder source only (r14);
#: 2 = transitive-closure source (r15, r14 advisory #1).  Entries from an
#: older algo are treated as unledgered (reported, never silently
#: compared against a differently-computed hash).
FP_ALGO = 2

_PKG = "prod_data_pipeline_spark"

#: repr-stable value types included in the closure when a builder
#: references a module-level constant by name (e.g. _TOKS_SQL grids,
#: threshold dicts).  frozenset is deliberately ABSENT (r15 advisory):
#: its repr order follows per-process str hash randomization, so hashing
#: one would make query_fingerprint nondeterministic across runs and
#: spuriously flag policy-#4 changes.  No plans/ closure references one
#: today; if one ever must, hash repr(sorted(v)) instead.
_CONST_TYPES = (str, bytes, int, float, bool, tuple, dict, list)


def _code_names(fn) -> set:
    """Every name referenced by fn's code object tree (including nested
    lambdas/comprehensions) plus names bound by `from pkg.mod import y`
    statements in its source — the resolution inputs for the closure."""
    import types

    names: set = set()
    stack = [fn.__code__]
    while stack:
        co = stack.pop()
        names.update(co.co_names)
        names.update(co.co_freevars)
        for c in co.co_consts:
            if isinstance(c, types.CodeType):
                stack.append(c)
    return names


def _local_imports(src: str) -> list:
    """(module, name) pairs for `from prod_data_pipeline_spark... import`
    statements anywhere in the source — builders import operators inside
    the function body, where the imported callee never lands in
    __globals__."""
    import ast
    import textwrap

    out = []
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:  # pragma: no cover — source always parses
        return out
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and (
            node.module.split(".")[0] == _PKG
        ):
            for alias in node.names:
                out.append((node.module, alias.name))
    return out


def _collect_closure(obj, seen: dict) -> None:
    """Depth-first same-package source collection: functions and classes
    reachable from `obj` by global-name reference or local `from ... import`,
    keyed (module, qualname) for deterministic ordering; referenced
    module-level constants hash by repr under ('const:<module>', name)."""
    import importlib
    import inspect
    import types

    mod = getattr(obj, "__module__", "") or ""
    if not mod.startswith(_PKG):
        return
    key = (mod, getattr(obj, "__qualname__", getattr(obj, "__name__", "?")))
    if key in seen:
        return
    try:
        seen[key] = inspect.getsource(obj)
    except (OSError, TypeError):  # pragma: no cover — C-level or synthetic
        seen[key] = repr(obj)
        return

    fns: list = []
    if isinstance(obj, type):
        fns = [
            v for v in vars(obj).values()
            if isinstance(v, (types.FunctionType, staticmethod, classmethod))
        ]
        fns = [getattr(f, "__func__", f) for f in fns]
    elif isinstance(obj, types.FunctionType):
        fns = [obj]

    for fn in fns:
        g = getattr(fn, "__globals__", {})
        src = seen[key]
        for name in sorted(_code_names(fn)):
            v = g.get(name)
            if isinstance(v, (types.FunctionType, type)):
                _collect_closure(v, seen)
            elif isinstance(v, _CONST_TYPES) and not name.startswith("__"):
                gmod = g.get("__name__", mod)
                ckey = (f"const:{gmod}", name)
                if ckey not in seen and str(gmod).startswith(_PKG):
                    seen[ckey] = repr(v)
        for imod, iname in _local_imports(src):
            try:
                m = importlib.import_module(imod)
                v = getattr(m, iname, None)
            except ImportError:  # pragma: no cover
                v = None
            if isinstance(v, (types.FunctionType, type)):
                _collect_closure(v, seen)
            elif isinstance(v, _CONST_TYPES):
                ckey = (f"const:{imod}", iname)
                if ckey not in seen:
                    seen[ckey] = repr(v)


def query_fingerprint(spec) -> str:
    """md5 over the parts of a registered query a driver row certifies:
    the oracle SQL and the TRANSITIVE-CLOSURE source of the DataFrame
    builder (builder + every same-package function/class it references,
    plus referenced module-level constants).  Whitespace is NOT
    normalized — a comment-only edit re-flags the query, which is the
    cheap, safe direction (one window slot vs a silent policy-#4
    miss)."""
    import hashlib

    seen: dict = {}
    _collect_closure(spec.fn, seen)
    parts = [(spec.oracle or "")] + [
        f"{m}.{q}\n{src}" for (m, q), src in sorted(seen.items())
    ]
    return hashlib.md5("\0".join(parts).encode()).hexdigest()


def load_fingerprints() -> dict:
    if not os.path.exists(FINGERPRINTS):
        return {}
    with open(FINGERPRINTS) as f:
        return json.load(f)


def changed_since_driver_row(queries: dict, window: set) -> tuple[list, list]:
    """(policy-#4 offenders, unledgered names): offenders are queries
    whose live fingerprint differs from the ledgered
    last-driver-checked state while sitting OUTSIDE the window."""
    ledger = load_fingerprints()
    changed, unledgered = [], []
    for name, spec in queries.items():
        entry = ledger.get(name)
        if entry is None or entry.get("algo", 1) != FP_ALGO:
            # no entry, or an entry hashed under an older algorithm —
            # comparing across algos would flag everything; report instead
            unledgered.append(name)
        elif entry["fp"] != query_fingerprint(spec) and name not in window:
            changed.append(name)
    return changed, unledgered


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
    deferred = [q for q in never if q not in window]
    missing_sentinels = [s for s in DRIVER_SENTINELS if s not in window]
    max_round = max(latest.values()) if latest else 0
    # Spent-window detection (round-13 verdict directive #2): once every
    # window row has its driver row at max_round, the CORRECTNESS file for
    # this window's round has landed and the window is HISTORICAL — the
    # newly-due cohort correctly sits outside it, because its successor
    # window cannot be adopted until the next round's builder starts.
    # In that state stale-first / deferral violations are turnover
    # bookkeeping, not policy breaches, and the next-round load must be
    # computed from the recorded rows as-is (the old projection re-bumped
    # the already-run window a round forward and printed 90/50 where the
    # true load was 45).
    window_spent = bool(latest) and all(
        latest.get(q) == max_round for q in DRIVER_ORDER
    )
    if window_spent:
        print(f"window state       : SPENT (all {len(DRIVER_ORDER)} rows "
              f"recorded at round {max_round}; adopt the next window first)")
    budget = staleness_budget(len(QUERIES), len(DRIVER_SENTINELS))
    print(f"freshness budget   : {budget} rounds "
          f"(ceil({len(QUERIES)}/{WINDOW - len(DRIVER_SENTINELS)}))")
    # "due" is relative to the round this window is FOR (max_round + 1):
    # a row from round r has age (max_round + 1) - r when the next driver
    # check runs, so it hits the budget when r <= max_round + 1 - budget.
    # (The former `r <= max_round - budget` computed LAST round's dueness —
    # it classified the cohort expiring THIS round as optional fillers,
    # contradicting how rounds 10-12 actually rotated.)
    stale = {
        q for q, r in latest.items()
        if q in QUERIES and r <= max_round + 1 - budget
    }
    stale_out = sorted(stale - window)
    # A slot is "mandatory" when held by a sentinel, a due-stale query, a
    # never-checked query, or a policy-#4 seating (a query whose
    # fingerprint MOVED at this window's --fingerprint — the `changed_at ==
    # round == max_round + 1` ledger stamp); anything else is a filler.
    # Deferring a due row (stale OR never-checked) is legal ONLY under
    # true saturation — mandatory load > WINDOW with zero fillers holding
    # slots (round-13 case: 2 dark + 3 sentinels + 46 stale = 51 > 50;
    # round-15 case: 3 sentinels + 4 panels + 44 stale + 1 changed = 52).
    ledger = load_fingerprints()

    def _seated_for_change(q: str) -> bool:
        e = ledger.get(q) or {}
        return (
            e.get("changed_at") is not None
            and e.get("changed_at") == e.get("round") == max_round + 1
        )

    window_fillers = [
        q for q in DRIVER_ORDER
        if q not in DRIVER_SENTINELS
        and q not in stale
        and q in latest
        and not _seated_for_change(q)
    ]
    ok = True
    if len(DRIVER_ORDER) != WINDOW:
        print(f"POLICY FAIL: window has {len(DRIVER_ORDER)} entries, want {WINDOW}")
        ok = False
    if stale_out:
        if window_spent:
            print(
                f"NOTE: spent window; {len(stale_out)} due-stale queries "
                f"front the next window: {stale_out}"
            )
        elif window_fillers:
            print(f"POLICY FAIL: {len(stale_out)} >={budget}-round-stale queries outside the window: {stale_out}")
            ok = False
        else:
            print(
                f"NOTE: window saturated by mandatory rows; {len(stale_out)} "
                f"stale defer to the front of next round's window: {stale_out}"
            )
    if missing_sentinels:
        print(f"POLICY FAIL: sentinels missing from window: {missing_sentinels}")
        ok = False
    if deferred:
        # deferral is legal only under saturation: every window slot must be
        # held by a sentinel, a stale query, or another never-checked query
        fillers = window_fillers
        if window_spent:
            print(
                f"NOTE: spent window; {len(deferred)} never-checked front "
                f"the next window: {deferred}"
            )
        elif fillers:
            print(
                f"POLICY FAIL: {len(deferred)} never-checked deferred while "
                f"non-mandatory fillers hold slots: deferred={deferred} "
                f"fillers={fillers}"
            )
            ok = False
        else:
            print(
                f"NOTE: window saturated by sentinels+stale; {len(deferred)} "
                f"never-checked defer to the front of next round's window: "
                f"{deferred}"
            )
    # Policy #4 (fingerprint ledger, round 14): a query whose plan/oracle
    # changed since the state its last driver row certified must re-enter
    # the window.  Mid-round this is a failure; once the window is spent
    # it fronts the next window (same turnover semantics as stale rows).
    changed, unledgered = changed_since_driver_row(QUERIES, window)
    if changed:
        if window_spent:
            print(
                f"NOTE: {len(changed)} plan/oracle-changed queries front "
                f"the next window (policy #4): {sorted(changed)}"
            )
        else:
            print(
                f"POLICY FAIL: {len(changed)} queries changed since their "
                f"last driver row but sit outside the window (policy #4): "
                f"{sorted(changed)}"
            )
            ok = False
    if unledgered:
        print(
            f"note: {len(unledgered)} queries have no fingerprint ledger "
            "entry (run --fingerprint after adopting a window)"
        )

    if "--fingerprint" in sys.argv:
        if window_spent:
            print(
                "refusing --fingerprint on a SPENT window: its rows were "
                "checked against possibly-older code; adopt the next "
                "window first, then fingerprint"
            )
            sys.exit(1)
        ledger = load_fingerprints()
        for name in DRIVER_ORDER:
            old = ledger.get(name)
            new_fp = query_fingerprint(QUERIES[name])
            entry = {"fp": new_fp, "round": max_round + 1, "algo": FP_ALGO}
            if (
                old is not None
                and old.get("algo", 1) == FP_ALGO
                and old["fp"] != new_fp
            ):
                # the plan/oracle moved since the last driver row — this
                # seat is a policy-#4 seating, not a filler (the audit's
                # window_fillers computation consumes this stamp)
                entry["changed_at"] = max_round + 1
            elif (
                old is not None
                and old.get("changed_at") == max_round + 1
            ):
                # re-run in the same unspent round: the fp already moved
                # at an earlier --fingerprint and is now stable — carry
                # the stamp forward instead of silently reclassifying a
                # policy-#4 seating as a filler (r15 advisory: the erased
                # stamp plus a non-empty DRIVER_DEFERRED turns the audit
                # into a false POLICY FAIL)
                entry["changed_at"] = old["changed_at"]
            ledger[name] = entry
        seeded = [
            name for name in QUERIES
            if name in latest
            and (
                name not in ledger
                or ledger[name].get("algo", 1) != FP_ALGO
            )
            and name not in DRIVER_ORDER
        ]
        for name in seeded:
            # initial seeding / algo migration: assumes the query is
            # UNCHANGED since its latest driver row (valid at the r14
            # seeding — the r13 verdict certified the only
            # post-row-changed queries, all seated in the r14 window and
            # ledgered above; valid again at the r15 algo-2 migration —
            # the r14 verdict's diff audit certified no registered
            # query's plan changed in r14 outside its window)
            ledger[name] = {
                "fp": query_fingerprint(QUERIES[name]),
                "round": latest[name],
                "algo": FP_ALGO,
            }
        with open(FINGERPRINTS, "w") as f:
            json.dump(dict(sorted(ledger.items())), f, indent=0)
        print(
            f"fingerprinted {len(DRIVER_ORDER)} window queries for round "
            f"{max_round + 1}"
            + (f"; seeded {len(seeded)} out-of-window queries" if seeded else "")
        )

    if ok:
        print("policy check: OK (window size, stale-first coverage, sentinels)")

    # Forward load: what is NEXT round's mandatory set?  (sentinels +
    # next-round-due stale + anything still never-checked) — the number
    # that tells the round's builder how many free slots remain before
    # registering net-new queries re-saturates the window.  Mid-round the
    # current window will earn rows at max_round + 1, so the projection
    # bumps window rows forward and looks a round further out; once the
    # window is SPENT its rows are already recorded at max_round, so the
    # load for the upcoming round is computed from latest as-is (the old
    # unconditional bump double-counted the spent window and printed
    # 90/50 with a negative free-slot count — r13 verdict/advice fix).
    if window_spent:
        nxt_round = max_round + 1
        nxt_latest = {q: latest.get(q, 0) for q in QUERIES}
        label = f"next-round (r{nxt_round}) mandatory load"
    else:
        nxt_round = max_round + 2
        nxt_latest = {
            q: max_round + 1 if q in window else latest.get(q, 0)
            for q in QUERIES
        }
        label = (
            f"next-round (r{nxt_round}, after this window runs) "
            f"mandatory load"
        )
    # a row from round r has age nxt_round - r when round nxt_round's
    # driver check runs; it hits the budget when r <= nxt_round - budget
    nxt_stale = {
        q for q, r in nxt_latest.items() if r and r <= nxt_round - budget
    }
    nxt_never = [q for q in QUERIES if not nxt_latest[q]]
    nxt_load = len(
        set(DRIVER_SENTINELS) | nxt_stale | set(nxt_never)
    )
    print(
        f"{label}: {nxt_load} of {WINDOW} slots "
        f"({len(DRIVER_SENTINELS)} sentinels + {len(nxt_stale - set(DRIVER_SENTINELS))} "
        f"due-stale + {len(nxt_never)} never-checked; {WINDOW - nxt_load} free)"
    )

    if "--propose" in sys.argv:
        # next round: mid-round, assume everything in the current window
        # gets a row; once the window is spent those rows are already
        # recorded, so propose straight from latest (nxt_latest handles
        # both cases above).  Seating order: never-checked (policy #3),
        # sentinels (policy #1), ledger-detected changed queries
        # (policy #4 — automated since r14), then oldest-first.
        nxt = nxt_latest
        order = [q for q in never if q not in window]  # should be empty
        order += list(DRIVER_SENTINELS)
        order += [q for q in sorted(changed) if q not in order]
        for _, q in sorted((r, q) for q, r in nxt.items()):
            if len(order) >= WINDOW:
                break
            if q not in order:
                order.append(q)
        print(
            "\nproposed next-round DRIVER_ORDER "
            "(never-checked + sentinels + changed + oldest-first):"
        )
        for q in order[:WINDOW]:
            print(f'    "{q}",')

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
