"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This mirrors the driver's t2 correctness gate (run at sf0.01); sf0.001 keeps
the suite fast while exercising identical semantics.
"""

from __future__ import annotations

import pytest

from prod_data_pipeline_spark.plans.queries import QUERIES
from tests.conftest import SF_DIR
from tests.parity import check_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    check_query(spark, name, SF_DIR)


def test_driver_order_policy():
    """The driver checks only the first 50 queries() entries: the ordered
    registry must front-load DRIVER_ORDER (never-checked + changed queries)
    and still expose every registered query exactly once."""
    from prod_data_pipeline_spark.plans.queries import (
        DRIVER_ORDER,
        ordered_queries,
    )

    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)), "duplicate in DRIVER_ORDER"
    assert set(DRIVER_ORDER) <= set(QUERIES), "DRIVER_ORDER names a missing query"
    oq = list(ordered_queries())
    assert oq[: len(DRIVER_ORDER)] == DRIVER_ORDER
    assert set(oq) == set(QUERIES)
    # Rotation policy (verdict r6 directive #1), derived from the recorded
    # CORRECTNESS_r*.json staleness data instead of a hard-coded roster so
    # the contract survives round turnover:
    #   (a) every query with NO driver CORRECTNESS row ever is in-window;
    #   (b) the pinned bench sentinels are in-window;
    #   (c) every query stale past the CAPACITY-DERIVED freshness budget
    #       (ceil(n_queries / non-sentinel slots) rounds — the fastest
    #       full rotation the 50-slot window physically permits; round-7
    #       advisor proved the old hard-coded 3-round budget infeasible
    #       once the registry outgrew 3×47 queries) is in-window — a row
    #       older than one full rotation means the rotation was skipped.
    from prod_data_pipeline_spark.plans.queries import DRIVER_SENTINELS
    from tools.rotation import latest_driver_round, staleness_budget

    window = set(oq[:50])
    assert len(DRIVER_ORDER) == 50
    assert set(DRIVER_SENTINELS) <= window, "bench sentinels rotated out"
    latest = latest_driver_round()
    max_round = max(latest.values())
    budget = staleness_budget(len(QUERIES), len(DRIVER_SENTINELS))
    # due-this-round: the window under test is for round max_round + 1, so
    # a row from round r hits the budget when r <= max_round + 1 - budget
    # (the former max_round - budget form computed LAST round's dueness and
    # mislabeled the currently-expiring cohort as optional fillers)
    stale = {
        q
        for q, r in latest.items()
        if q in QUERIES and r <= max_round + 1 - budget
    }
    # Due rows (stale past budget, or never driver-checked) go in-window;
    # when the mandatory set outgrows all 50 slots (round-13 case:
    # 2 never-checked + 3 sentinels + 46 stale = 51 > 50), the overflow
    # may defer one round — but ONLY under true saturation: no slot may
    # be held by a non-mandatory filler while a due row waits outside
    # (stale-first policy, tools/rotation.py docstring).  Deferred
    # queries still get their oracle hash-checked at sf0.001 by this
    # suite every round, and front the next round's window.
    never_checked = {q for q in QUERIES if q not in latest}
    # A window query whose ledger entry is stamped changed_at == round ==
    # max_round + 1 is a policy-#4 seating (its plan/oracle moved since
    # its last driver row and --fingerprint recorded the move at this
    # window's adoption) — mandatory, not a filler (round-15 case:
    # q14_promo_revenue's half-up conversion).
    from tools.rotation import load_fingerprints

    ledger = load_fingerprints()

    def _seated_for_change(q):
        e = ledger.get(q) or {}
        return (
            e.get("changed_at") is not None
            and e.get("changed_at") == e.get("round") == max_round + 1
        )

    fillers = [
        q
        for q in DRIVER_ORDER
        if q not in DRIVER_SENTINELS
        and q not in stale
        and q in latest
        and not _seated_for_change(q)
    ]
    deferred = (stale | never_checked) - window
    # Spent-window state (round-13 verdict directive #2): once every
    # window row has its driver row at max_round, the window demonstrably
    # RAN and is historical — the newly-due cohort correctly waits outside
    # it because the successor window cannot be adopted until the next
    # round's builder starts.  Without this, the lint goes red at EVERY
    # round boundary by construction (it cost rounds 12 and 13 their
    # end-of-round green), while detecting no real policy breach: the
    # stale-first check below only means something for a window that has
    # yet to run.
    window_spent = bool(latest) and all(
        latest.get(q) == max_round for q in DRIVER_ORDER
    )
    if deferred and not window_spent:
        assert not fillers, (
            f"due rows deferred {sorted(deferred)} while non-mandatory "
            f"fillers hold window slots: {fillers}"
        )


def test_every_query_has_a_survey_row():
    """SURVEY.md §2 is the grading contract: a registered query that no
    SURVEY row mentions is invisible coverage (round-6 verdict gap #2).
    Conversely-named queries are fine — we only require each registered
    name to appear somewhere in the operator inventory section."""
    import re

    survey = open("/root/repo/SURVEY.md").read()
    start = survey.index("## 2. Operator inventory")
    end = survey.index("## 3.", start)
    section = survey[start:end]
    missing = [name for name in QUERIES if name not in section]
    assert not missing, f"queries with no SURVEY §2 row: {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_rows_only_queries_document_their_justification():
    """Governance: a query without an oracle gets only the driver's weak
    rows-only check, so its docstring must say why that is the strongest
    check its semantics admit (approximate output, order-nondeterminism,
    no tractable SQL mirror) — no silent oracle omissions."""
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            doc = (spec.fn.__doc__ or "").lower()
            assert "rows-only" in doc, f"{name}: no_oracle without justification"


def _decimal_sum_sites(sql: str) -> int:
    """Count SUM(...) aggregates whose balanced argument mentions DECIMAL
    — a paren-aware scan, so nested CAST/ROUND/FLOOR chains can't hide a
    BigDecimal accumulator from the lint (a plain regex misses 2-deep
    nesting like SUM(CAST(ROUND(x * CAST(n AS DOUBLE), 12) AS DECIMAL))."""
    import re

    n = 0
    for m in re.finditer(r"\bSUM\s*\(", sql, re.IGNORECASE):
        depth, i = 1, m.end()
        start = m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if "DECIMAL" in sql[start:i].upper():
            n += 1
    return n


def test_no_unexempted_decimal_sums():
    """Round-11 verdict #3 enforcement: every oracle that sums DECIMAL
    must carry a documented DSUM_EXCEPTIONS entry (second moments,
    wide-int sums, recurrence replay contracts, ...) — otherwise new
    queries must use the long-numerator recipe (query_registry.dsum /
    FLOOR(x*10^s+0.5) BIGINT sums), which measured ~5x cheaper on the
    q1 agg shape.  Also fails on STALE exceptions so the list can only
    shrink to the truth."""
    from prod_data_pipeline_spark.plans.queries import QUERIES
    from prod_data_pipeline_spark.plans.query_registry import DSUM_EXCEPTIONS

    offenders = {}
    for name, spec in QUERIES.items():
        if spec.oracle and _decimal_sum_sites(spec.oracle):
            offenders[name] = _decimal_sum_sites(spec.oracle)
    unexempted = sorted(set(offenders) - set(DSUM_EXCEPTIONS))
    assert not unexempted, (
        f"DECIMAL sums without a DSUM_EXCEPTIONS entry: {unexempted} — "
        "use the long-numerator recipe (query_registry.dsum) or document "
        "the exception (see SCALE.md round-11 dsum inventory)"
    )
    stale = sorted(set(DSUM_EXCEPTIONS) - set(offenders))
    assert not stale, f"stale DSUM_EXCEPTIONS entries (no DECIMAL sum left): {stale}"


def _floor_float_div_sites(sql: str) -> int:
    """Count FLOOR(...) sites whose balanced argument divides by a float
    literal at TOP level and carries an integer bias anywhere inside —
    the half-up-report-via-float-division form whose long->double
    conversion caps exactness at 2^53 (r13 advisory: the div form holds
    to the full int64 bound).  Bucketing floors (FLOOR(value / 25.0), no
    bias) and quantize steps (FLOOR(x * 10^s.0 + 0.5), float bias, no
    top-level division) do not match."""
    import re

    n = 0
    for m in re.finditer(r"\bFLOOR\s*\(", sql, re.IGNORECASE):
        depth, i = 1, m.end()
        start = m.end()
        top = []
        while i < len(sql) and depth:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            if depth == 1:
                top.append(c)
            i += 1
        arg, toptxt = sql[start:i - 1], "".join(top)
        if re.search(r"/\s*\d+\.0", toptxt) and re.search(
            r"\+\s*\d+(?![.\d])", arg
        ):
            n += 1
    return n


def test_no_unexempted_float_div_half_up():
    """Round-13 verdict #6 enforcement: a half-up report step must use
    the LONG integer division form ((n + bias) div 10^k — exact to the
    int64 sum bound) unless it carries a documented
    query_registry.FLOORDIV_EXCEPTIONS entry (signed numerators need
    floor semantics; `div` truncates toward zero).  A refactor of
    parts_adamic_adar_links / docs_bm25_topk back to
    FLOOR((n + 5e5) / 1e6.0) silently reopens the 2^53 exactness cap —
    this lint goes red instead.  Stale entries fail too."""
    from prod_data_pipeline_spark.plans.queries import QUERIES
    from prod_data_pipeline_spark.plans.query_registry import (
        FLOORDIV_EXCEPTIONS,
    )

    offenders = {
        name: _floor_float_div_sites(spec.oracle)
        for name, spec in QUERIES.items()
        if spec.oracle and _floor_float_div_sites(spec.oracle)
    }
    unexempted = sorted(set(offenders) - set(FLOORDIV_EXCEPTIONS))
    assert not unexempted, (
        f"float-division half-up report steps without a "
        f"FLOORDIV_EXCEPTIONS entry: {unexempted} — use the long "
        "division form ((n + bias) div 10^k in Spark, // in DuckDB; "
        "non-negative numerators only) or document the exception"
    )
    stale = sorted(set(FLOORDIV_EXCEPTIONS) - set(offenders))
    assert not stale, (
        f"stale FLOORDIV_EXCEPTIONS entries (no float-div floor left): {stale}"
    )


def test_no_unexempted_spark_side_float_div_half_up():
    """Companion scanning the DataFrame side: an F.floor whose balanced
    argument divides by a float literal at top level and carries an
    integer F.lit bias must have a SPARK_FLOORDIV_EXCEPTIONS entry."""
    import pathlib
    import re

    from prod_data_pipeline_spark.plans.query_registry import (
        SPARK_FLOORDIV_EXCEPTIONS,
    )

    offenders = []
    matched = set()
    pkg = pathlib.Path("prod_data_pipeline_spark")
    for path in sorted(list(pkg.glob("plans/*.py")) + list(pkg.glob("operators/*.py"))):
        text = path.read_text()
        for m in re.finditer(r"F\.floor\s*\(", text):
            depth, i = 1, m.end()
            start = m.end()
            slashes = []  # original indices of top-level '/' in the arg
            while i < len(text) and depth:
                c = text[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                elif c == "/" and depth == 1:
                    slashes.append(i)
                i += 1
            arg = text[start : i - 1]
            float_div = any(
                re.match(r"\s*(F\.lit\()?\d+(\.\d|e\d)", text[s + 1 :])
                for s in slashes
            )
            if not (float_div and re.search(r"\+\s*F\.lit\(\d+\)", arg)):
                continue
            line = text[: m.start()].count("\n") + 1
            lines = text.splitlines()
            ctx = "\n".join(lines[max(0, line - 3) : line + 12])
            hits = [
                key
                for key in SPARK_FLOORDIV_EXCEPTIONS
                if key[0] == path.name and key[1] in ctx
            ]
            if hits:
                matched.update(hits)
                continue
            offenders.append(f"{path.name}:{line}")
    assert not offenders, (
        f"Spark-side float-division half-up sites without a "
        f"SPARK_FLOORDIV_EXCEPTIONS entry: {offenders}"
    )
    stale = sorted(set(SPARK_FLOORDIV_EXCEPTIONS) - matched)
    assert not stale, f"stale SPARK_FLOORDIV_EXCEPTIONS entries: {stale}"


def test_cms_join_size_queries_guard_disjoint_keys():
    """r13 advisory regression pin: both CMS join-size queries must keep
    the disjoint-keys COALESCE on BOTH engines (an empty dot relation
    means the provably-correct estimate is 0, not NULL) — dropping it
    reverts the r12 advisory fix."""
    from prod_data_pipeline_spark.plans.queries import QUERIES

    for name in ("events_selfjoin_size_cms", "lineitem_orders_join_size_cms"):
        assert "COALESCE((SELECT MIN(dot) FROM dots), 0)" in QUERIES[name].oracle, name
    import pathlib

    src = pathlib.Path(
        "prod_data_pipeline_spark/plans/queries_tpch_graph.py"
    ).read_text()
    assert src.count('F.coalesce(F.min("dot"), F.lit(0))') == 2


def test_no_unexempted_spark_side_decimal_sums():
    """Companion to the oracle lint: the Spark side of a query must not
    grow a BigDecimal aggregation either.  Scans the plans/ sources for
    F.sum over a decimal cast; every legitimate site must carry a
    documented query_registry.SPARK_DSUM_EXCEPTIONS entry (one inventory
    for both lints — round-11 verdict #6), and stale entries fail so the
    table can only shrink to the truth.  The one Spark-only exemption is
    tables_fingerprint_audit's wide-int checksum (sum of 48-bit hashes
    exceeds int64 past ~32k rows; its oracle sums in DuckDB's native
    HUGEINT, so the oracle lint cannot see it)."""
    import pathlib
    import re

    from prod_data_pipeline_spark.plans.query_registry import (
        SPARK_DSUM_EXCEPTIONS,
    )

    plans = pathlib.Path("prod_data_pipeline_spark/plans")
    offenders = []
    matched = set()
    pat = re.compile(r"F\.sum\([^\n]*\.cast\(f?\"decimal", re.IGNORECASE)
    for path in sorted(plans.glob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines, 1):
            if pat.search(line):
                ctx = "\n".join(lines[max(0, i - 3) : i + 2])
                hits = [
                    key
                    for key in SPARK_DSUM_EXCEPTIONS
                    if key[0] == path.name and key[1] in ctx
                ]
                if hits:
                    matched.update(hits)
                    continue
                offenders.append(f"{path.name}:{i}: {line.strip()[:100]}")
    assert not offenders, (
        "Spark-side decimal sums without a SPARK_DSUM_EXCEPTIONS entry — "
        f"use the long-numerator recipe (query_registry.dsum): {offenders}"
    )
    stale = sorted(set(SPARK_DSUM_EXCEPTIONS) - matched)
    assert not stale, (
        f"stale SPARK_DSUM_EXCEPTIONS entries (no matching F.sum site): {stale}"
    )


def test_oracle_df_reads_spark_directory_parquet(tmp_path):
    """The bench's inflated dataset is Spark-written — each table is a
    DIRECTORY of part files, not the driver testdata's single file.
    oracle_df must glob that layout so inflated-shape oracle parity runs
    (round-12: docs_split_leakage_audit verified on the 10x corpus)."""
    import shutil

    from tests.parity import oracle_df
    from prod_data_pipeline_spark.sources.readers import TABLES

    src = "/root/testdata/sf0.001"
    for t in TABLES:
        d = tmp_path / f"{t}.parquet"
        d.mkdir()
        shutil.copy(f"{src}/{t}.parquet", d / "part-00000.parquet")
    got = oracle_df("SELECT COUNT(*) AS n FROM region", str(tmp_path))
    want = oracle_df("SELECT COUNT(*) AS n FROM region", src)
    assert got["n"][0] == want["n"][0] > 0
