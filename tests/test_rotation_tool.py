"""Pins tools/rotation.py's round-turnover behavior (round-13 verdict
directive #2): the audit must distinguish a SPENT window (every window row
already has its driver row at max_round — the round's CORRECTNESS file has
landed, so the due cohort legitimately waits outside the window) from a
mid-round policy breach (due rows outside while non-mandatory fillers hold
slots), and the next-round mandatory-load projection must not re-bump a
spent window a round forward (the r13 artifact: it printed 90 of 50 slots
where the true load was 45).
"""

from __future__ import annotations

import pytest

import tools.rotation as rotation
from prod_data_pipeline_spark.plans.queries import (
    DRIVER_ORDER,
    DRIVER_SENTINELS,
    QUERIES,
)


def _run(monkeypatch, capsys, latest):
    monkeypatch.setattr(rotation, "latest_driver_round", lambda: latest)
    with pytest.raises(SystemExit) as exc:
        rotation.main()
    return exc.value.code, capsys.readouterr().out


def _spread_rounds(names, budget, max_round):
    """Assign non-window queries driver rounds young enough to not be due
    at max_round + 1 (i.e. > max_round + 1 - budget), cycling so the
    distribution looks like a healthy rotation."""
    fresh = [max_round + 1 - budget + 1 + (i % (budget - 1)) for i in range(len(names))]
    return dict(zip(names, fresh))


def test_spent_window_is_not_a_policy_failure(monkeypatch, capsys):
    """After the round's CORRECTNESS lands (all window rows at max_round),
    a newly-due cohort outside the window is turnover bookkeeping: exit 0,
    SPENT note, and the load projection keys off latest as-is."""
    max_round = 40
    budget = rotation.staleness_budget(len(QUERIES), len(DRIVER_SENTINELS))
    outside = [q for q in QUERIES if q not in DRIVER_ORDER]
    # a due cohort outside the window: old enough to be stale next round
    due = outside[:10]
    latest = {q: max_round for q in DRIVER_ORDER}
    latest.update(_spread_rounds(outside[10:], budget, max_round))
    latest.update({q: max_round + 1 - budget for q in due})
    code, out = _run(monkeypatch, capsys, latest)
    assert code == 0, out
    assert "SPENT" in out
    assert "POLICY FAIL" not in out
    assert f"due-stale queries front the next window" in out
    # spent-window projection: next round is max_round + 1, computed from
    # latest as-is -> load = sentinels + the 10 due rows
    want = len(set(DRIVER_SENTINELS) | set(due))
    assert f"next-round (r{max_round + 1}) mandatory load: {want} of" in out


def test_midround_fillers_with_due_outside_still_fails(monkeypatch, capsys):
    """Mid-round (window rows NOT all at max_round), a due row outside the
    window while a non-mandatory filler holds a slot is the real policy
    breach and must keep failing."""
    max_round = 40
    budget = rotation.staleness_budget(len(QUERIES), len(DRIVER_SENTINELS))
    outside = [q for q in QUERIES if q not in DRIVER_ORDER]
    due = outside[:5]
    latest = {q: max_round for q in QUERIES}  # window rows fresh = fillers
    # break the spent state: one window row predates max_round but is not due
    non_sentinel = next(q for q in DRIVER_ORDER if q not in DRIVER_SENTINELS)
    latest[non_sentinel] = max_round - 1
    latest.update({q: max_round + 1 - budget for q in due})
    code, out = _run(monkeypatch, capsys, latest)
    assert code == 1
    assert "POLICY FAIL" in out


def test_midround_projection_bumps_window_forward(monkeypatch, capsys):
    """Mid-round the projection assumes the current window earns rows at
    max_round + 1 and reports the round after (max_round + 2)."""
    max_round = 40
    budget = rotation.staleness_budget(len(QUERIES), len(DRIVER_SENTINELS))
    outside = [q for q in QUERIES if q not in DRIVER_ORDER]
    # healthy mid-round: window holds the due-at-max_round+1 cohort
    latest = {q: max_round + 1 - budget for q in DRIVER_ORDER}
    latest.update(_spread_rounds(outside, budget, max_round))
    latest[DRIVER_ORDER[3]] = max_round  # not spent
    # sentinels always have fresh rows too
    for s in DRIVER_SENTINELS:
        latest[s] = max_round + 1 - budget
    code, out = _run(monkeypatch, capsys, latest)
    assert code == 0, out
    assert "SPENT" not in out
    assert f"next-round (r{max_round + 2}, after this window runs)" in out


def _ledger_with_one_stale_fp(name):
    """A ledger where `name` carries a deliberately wrong fingerprint
    (as if its plan/oracle changed after its last driver row) and every
    other query matches its live state."""
    ledger = {
        q: {
            "fp": rotation.query_fingerprint(QUERIES[q]),
            "round": 9,
            "algo": rotation.FP_ALGO,
        }
        for q in QUERIES
    }
    ledger[name] = {"fp": "0" * 32, "round": 9, "algo": rotation.FP_ALGO}
    return ledger


def test_changed_query_outside_window_fails_policy4(monkeypatch, capsys):
    """Mid-round, a query whose live fingerprint differs from the state
    its last driver row certified must sit IN the window; outside it the
    audit fails loudly (the r13->r14 manual-tracking gap, now visible)."""
    max_round = 40
    outside = next(q for q in QUERIES if q not in DRIVER_ORDER)
    budget = rotation.staleness_budget(len(QUERIES), len(DRIVER_SENTINELS))
    latest = {q: max_round + 1 - budget + 1 for q in QUERIES}  # nothing due
    latest[DRIVER_ORDER[0]] = max_round  # not spent
    monkeypatch.setattr(
        rotation, "load_fingerprints", lambda: _ledger_with_one_stale_fp(outside)
    )
    code, out = _run(monkeypatch, capsys, latest)
    assert code == 1
    assert "policy #4" in out and outside in out


def test_changed_query_notes_when_window_spent(monkeypatch, capsys):
    """Once the window is spent the changed query cannot be seated until
    the next adoption: NOTE, not failure — the next builder fronts it."""
    max_round = 40
    outside = next(q for q in QUERIES if q not in DRIVER_ORDER)
    latest = {q: max_round for q in QUERIES}
    monkeypatch.setattr(
        rotation, "load_fingerprints", lambda: _ledger_with_one_stale_fp(outside)
    )
    code, out = _run(monkeypatch, capsys, latest)
    assert code == 0, out
    assert "front the next window (policy #4)" in out and outside in out


def test_live_ledger_matches_live_queries():
    """The committed fingerprint ledger must cover every registered query
    and agree with the live code for every OUT-OF-WINDOW query — i.e. no
    query changed since its last driver row without being seated (in-
    window queries may drift mid-round; re-run --fingerprint after
    editing one).  This is the pytest face of rotation policy #4."""
    from prod_data_pipeline_spark.plans.queries import DRIVER_ORDER as window

    ledger = rotation.load_fingerprints()
    assert ledger, "tools/query_fingerprints.json missing — run --fingerprint"
    missing = sorted(set(QUERIES) - set(ledger))
    # queries with no driver row yet are ledgered at first adoption
    latest = rotation.latest_driver_round()
    missing = [q for q in missing if q in latest]
    assert not missing, f"registered queries absent from the ledger: {missing}"
    changed, _ = rotation.changed_since_driver_row(QUERIES, set(window))
    assert not changed, (
        f"plan/oracle changed since last driver row, outside the window "
        f"(policy #4): {changed} — seat them or re-run --fingerprint "
        "after a window re-adoption"
    )


def test_propose_seats_changed_queries(monkeypatch, capsys):
    """--propose must seat ledger-detected policy-#4 queries right after
    the sentinels, even when their driver rows are otherwise fresh."""
    import sys

    max_round = 40
    outside = next(q for q in QUERIES if q not in DRIVER_ORDER)
    latest = {q: max_round for q in QUERIES}  # spent window, nothing stale
    monkeypatch.setattr(
        rotation, "load_fingerprints", lambda: _ledger_with_one_stale_fp(outside)
    )
    monkeypatch.setattr(sys, "argv", ["rotation", "--propose"])
    code, out = _run(monkeypatch, capsys, latest)
    assert code == 0, out
    proposal = [
        line.strip().strip('",').strip('"')
        for line in out.splitlines()
        if line.strip().startswith('"')
    ]
    assert outside in proposal[: len(DRIVER_SENTINELS) + 1], proposal[:6]


def test_old_algo_entries_are_unledgered_not_changed(monkeypatch, capsys):
    """An entry hashed under an older fingerprint algorithm must never be
    compared against a live algo-2 hash (everything would flag changed);
    the audit reports it as unledgered instead."""
    max_round = 40
    outside = next(q for q in QUERIES if q not in DRIVER_ORDER)
    budget = rotation.staleness_budget(len(QUERIES), len(DRIVER_SENTINELS))
    latest = {q: max_round + 1 - budget + 1 for q in QUERIES}  # nothing due
    latest[DRIVER_ORDER[0]] = max_round  # not spent
    ledger = _ledger_with_one_stale_fp(outside)
    ledger[outside]["algo"] = 1  # wrong fp, but from the old algorithm
    monkeypatch.setattr(rotation, "load_fingerprints", lambda: ledger)
    code, out = _run(monkeypatch, capsys, latest)
    assert code == 0, out
    assert "policy #4" not in out
    assert "no fingerprint ledger entry" in out


def test_fingerprint_sees_helper_edits_via_closure():
    """Algo 2 (r14 advisory #1): the fingerprint must move when a
    same-package HELPER the builder calls changes, not just the builder's
    own source — monkeypatching a callee's source via a synthetic spec
    is impossible, so assert structurally: the closure of a builder that
    locally imports an operator includes that operator's source."""
    from prod_data_pipeline_spark.operators.ranking import exact_quantiles

    spec = QUERIES["events_value_distribution"]  # locally imports it
    seen = {}
    rotation._collect_closure(spec.fn, seen)
    names = {k[1] for k in seen}
    assert "events_value_distribution" in names
    assert "exact_quantiles" in names, sorted(names)
    # and a global-name reference (registry helper) rides along too
    assert "_t" in names, sorted(names)
    # sanity: the hash is a function of the closure, so two specs sharing
    # a helper differ only by their own sources/oracles
    assert rotation.query_fingerprint(spec) != rotation.query_fingerprint(
        QUERIES["events_hll_users_panel"]
    )
    assert exact_quantiles is not None


def test_changed_at_seating_is_not_a_filler(monkeypatch, capsys):
    """A window query whose ledger entry carries changed_at == round ==
    max_round + 1 is a policy-#4 seating: due rows may legally defer past
    it (saturation), whereas the same window with a true filler fails."""
    max_round = 40
    budget = rotation.staleness_budget(len(QUERIES), len(DRIVER_SENTINELS))
    outside = [q for q in QUERIES if q not in DRIVER_ORDER]
    due = outside[:5]
    seated = next(q for q in DRIVER_ORDER if q not in DRIVER_SENTINELS)
    latest = {q: max_round + 1 - budget + 1 for q in QUERIES}
    # every window slot mandatory: all stale except the changed seating
    for q in DRIVER_ORDER:
        latest[q] = max_round + 1 - budget
    latest[seated] = max_round  # fresh row -> filler unless changed_at
    latest.update({q: max_round + 1 - budget for q in due})

    ledger = {
        q: {
            "fp": rotation.query_fingerprint(QUERIES[q]),
            "round": latest[q],
            "algo": rotation.FP_ALGO,
        }
        for q in QUERIES
    }
    ledger[seated]["round"] = max_round + 1
    ledger[seated]["changed_at"] = max_round + 1
    monkeypatch.setattr(rotation, "load_fingerprints", lambda: dict(ledger))
    code, out = _run(monkeypatch, capsys, latest)
    assert code == 0, out
    assert "window saturated by mandatory rows" in out

    # drop the stamp -> same composition now has a filler -> breach
    del ledger[seated]["changed_at"]
    ledger[seated]["round"] = latest[seated]
    code, out = _run(monkeypatch, capsys, latest)
    assert code == 1
    assert "POLICY FAIL" in out


def test_refingerprint_same_round_preserves_changed_at(
    monkeypatch, capsys, tmp_path
):
    """r15 advisory (medium): a second --fingerprint run in the same
    unspent round must not erase a changed_at stamp.  The fp moved at the
    first run and is stable at the second, but the seat is still a
    policy-#4 seating for this round — the old rewrite dropped the stamp
    (it only set changed_at when old fp != new fp), retroactively
    reclassifying the seat as a filler and, with DRIVER_DEFERRED
    non-empty, flipping the audit to a false POLICY FAIL."""
    import json
    import sys as _sys

    max_round = 40
    budget = rotation.staleness_budget(len(QUERIES), len(DRIVER_SENTINELS))
    seated = next(q for q in DRIVER_ORDER if q not in DRIVER_SENTINELS)
    latest = {q: max_round + 1 - budget + 1 for q in QUERIES}
    latest[DRIVER_ORDER[0]] = max_round  # not spent
    ledger = {
        q: {
            "fp": rotation.query_fingerprint(QUERIES[q]),
            "round": max_round + 1,
            "algo": rotation.FP_ALGO,
        }
        for q in DRIVER_ORDER
    }
    ledger[seated]["changed_at"] = max_round + 1  # stamped at run 1
    fps = tmp_path / "fps.json"
    fps.write_text(json.dumps(ledger))
    monkeypatch.setattr(rotation, "FINGERPRINTS", str(fps))
    monkeypatch.setattr(_sys, "argv", ["rotation", "--fingerprint"])
    code, out = _run(monkeypatch, capsys, latest)
    assert "fingerprinted" in out
    rewritten = json.loads(fps.read_text())
    assert rewritten[seated].get("changed_at") == max_round + 1, (
        rewritten[seated]
    )
    # a stamp from an EARLIER round must still be dropped (the entry is
    # genuinely unchanged since that round's driver row certified it)
    stale_stamped = next(
        q for q in DRIVER_ORDER
        if q not in DRIVER_SENTINELS and q != seated
    )
    ledger[stale_stamped]["changed_at"] = max_round  # old round's stamp
    fps.write_text(json.dumps(ledger))
    code, out = _run(monkeypatch, capsys, latest)
    rewritten = json.loads(fps.read_text())
    assert "changed_at" not in rewritten[stale_stamped]
