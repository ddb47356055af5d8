"""Planted-case tests for operators.quality and operators.cdc."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from prod_data_pipeline_spark.operators.cdc import (
    latest_snapshot,
    merge_upsert,
    scd2_history,
)
from prod_data_pipeline_spark.operators.quality import (
    contamination_overlap,
    repetition_profile,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_profile_planted(spark):
    df = _docs(
        spark,
        [
            (1, "a a a a"),            # bigram 'a a' x3: top=1.0, dup=2/3
            (2, "w x y z"),            # all-distinct bigrams: dup=0
            (3, "solo"),               # no bigrams at all
        ],
    )
    out = {r["doc_id"]: r for r in repetition_profile(df, n=2).collect()}
    assert out[1]["top_ngram_frac"] == 1.0
    assert out[1]["dup_ngram_frac"] == round(2 / 3, 6)
    assert out[1]["distinct_token_ratio"] == 0.25
    assert out[2]["top_ngram_frac"] == round(1 / 3, 6)
    assert out[2]["dup_ngram_frac"] == 0.0
    assert out[3]["total_grams"] == 0
    assert out[3]["top_ngram_frac"] == 0.0 and out[3]["dup_ngram_frac"] == 0.0


def test_contamination_overlap_planted(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),  # identical -> 1.0
            (2, "totally different words here now"),  # disjoint -> 0.0
            (3, "xy"),  # too short for trigrams -> 0 grams
        ],
    )
    out = {r["doc_id"]: r for r in contamination_overlap(docs, bench, n=3).collect()}
    assert out[1]["contamination_frac"] == 1.0
    assert out[2]["contamination_frac"] == 0.0
    assert out[3]["n_grams"] == 0 and out[3]["contamination_frac"] == 0.0
    # partial overlap: shares the 'quick brown fox' window
    part = _docs(spark, [(4, "quick brown fox sleeps today")])
    row = contamination_overlap(part, bench, n=3).collect()[0]
    assert row["n_grams"] == 3 and row["n_contaminated"] == 1


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_latest_snapshot_ties_and_order(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2025-01-01T00:00:00"), 10, "a"),
            (1, _ts("2025-01-02T00:00:00"), 11, "b"),
            (1, _ts("2025-01-02T00:00:00"), 12, "c"),  # same ts: id wins
            (2, _ts("2025-01-01T00:00:00"), 13, "d"),
        ],
        "user_id long, ts timestamp, event_id long, v string",
    )
    out = {
        r["user_id"]: r
        for r in latest_snapshot(df, ["user_id"], "ts", tiebreak=["event_id"]).collect()
    }
    assert out[1]["v"] == "c" and out[1]["event_id"] == 12
    assert out[2]["v"] == "d"


def test_scd2_history_change_compression(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2025-01-01T00:00:00"), 1, "a"),
            (1, _ts("2025-01-02T00:00:00"), 2, "a"),  # same value: compressed
            (1, _ts("2025-01-03T00:00:00"), 3, "b"),
            (1, _ts("2025-01-04T00:00:00"), 4, "a"),  # back to a: new interval
        ],
        "user_id long, ts timestamp, event_id long, attr string",
    )
    rows = (
        scd2_history(df, "user_id", "ts", "attr", tiebreak=["event_id"])
        .orderBy("effective_from")
        .collect()
    )
    assert [r["attr"] for r in rows] == ["a", "b", "a"]
    # intervals abut: each effective_to equals the next effective_from
    assert rows[0]["effective_to"] == rows[1]["effective_from"]
    assert rows[1]["effective_to"] == rows[2]["effective_from"]
    assert [r["is_current"] for r in rows] == [False, False, True]


def test_scd2_history_null_attr_runs_compress(spark):
    """Consecutive NULL attribute values are ONE interval (null-safe
    change detection), and NULL->value / value->NULL are real changes."""
    df = spark.createDataFrame(
        [
            (1, _ts("2025-01-01T00:00:00"), 1, None),
            (1, _ts("2025-01-02T00:00:00"), 2, None),  # same (NULL) value: compressed
            (1, _ts("2025-01-03T00:00:00"), 3, "a"),
            (1, _ts("2025-01-04T00:00:00"), 4, None),  # back to NULL: new interval
            (1, _ts("2025-01-05T00:00:00"), 5, None),  # compressed into it
        ],
        "user_id long, ts timestamp, event_id long, attr string",
    )
    rows = (
        scd2_history(df, "user_id", "ts", "attr", tiebreak=["event_id"])
        .orderBy("effective_from")
        .collect()
    )
    assert [r["attr"] for r in rows] == [None, "a", None]
    assert rows[0]["effective_to"] == rows[1]["effective_from"]
    assert rows[1]["effective_to"] == rows[2]["effective_from"]
    assert [r["is_current"] for r in rows] == [False, False, True]


def test_merge_upsert_equal_order_update_wins(spark):
    """MERGE WHEN MATCHED UPDATE semantics: an update with the SAME
    order_col value as the stored row still replaces it (source-priority
    tiebreak, not a nondeterministic row_number winner)."""
    current = spark.createDataFrame([(1, "stored", 5)], "k long, v string, version int")
    updates = spark.createDataFrame([(1, "update", 5)], "k long, v string, version int")
    out = {r["k"]: r["v"] for r in merge_upsert(current, updates, ["k"], "version").collect()}
    assert out == {1: "update"}
    # and the internal priority column does not leak into the output
    assert merge_upsert(current, updates, ["k"], "version").columns == ["k", "v", "version"]


def test_merge_upsert_update_and_insert(spark):
    current = spark.createDataFrame(
        [(1, "old", 1), (2, "keep", 1)], "k long, v string, version int"
    )
    updates = spark.createDataFrame(
        [(1, "new", 2), (3, "ins", 2)], "k long, v string, version int"
    )
    out = {r["k"]: r["v"] for r in merge_upsert(current, updates, ["k"], "version").collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}


def test_table_diff_statuses(spark):
    from prod_data_pipeline_spark.operators.cdc import table_diff

    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    right = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "X", 3.0), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r["diff_status"] for r in table_diff(left, right, ["k"], ["s", "v"]).collect()}
    # 1 identical (dropped), 2 identical incl. null==null (dropped),
    # 3 changed, 4 left_only, 5 right_only
    assert out == {3: "changed", 4: "left_only", 5: "right_only"}


def test_hll_mergeable_sketches(spark):
    """Union of partial HLL sketches equals the single-pass sketch on the
    same data (mergeability), and both land within the configured error
    bound of the exact count."""
    from pyspark.sql import functions as F

    df = spark.range(50_000).select((F.col("id") % 9_173).alias("u"))
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("est")
    ).first()["est"]
    merged = (
        df.withColumn("g", F.col("u") % 37)
        .groupBy("g")
        .agg(F.hll_sketch_agg("u").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    # Union is not bit-identical to the single-pass sketch (sparse->dense
    # mode transitions differ), but both stay inside the HLL error bound.
    assert abs(merged - direct) / 9_173 < 0.02
    assert abs(direct - 9_173) / 9_173 < 0.05
    assert abs(merged - 9_173) / 9_173 < 0.05


# --- property-based invariants (hypothesis) ---------------------------------

from hypothesis import given, settings, strategies as st

EVT = st.tuples(
    st.integers(min_value=1, max_value=3),            # user
    st.integers(min_value=0, max_value=20),           # ts offset (days)
    st.integers(min_value=0, max_value=1_000_000),    # unique-ish event id
    st.sampled_from(["a", "b", "c"]),                 # attr
)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        EVT,
        min_size=1,
        max_size=20,
        # unique event ids, and unique ts per user: equal-ts rows would make
        # the interval sort in the assertions ambiguous (the operator itself
        # handles ties via the event_id tiebreak)
        unique_by=(lambda r: r[2], lambda r: (r[0], r[1])),
    )
)
def test_scd2_intervals_partition_the_timeline(spark, rows):
    """For every key: intervals are change-compressed (no two consecutive
    intervals share a value), abut exactly, and exactly one is current."""
    data = [
        (u, _ts("2025-01-01T00:00:00") + dt.timedelta(days=off), eid, a)
        for (u, off, eid, a) in rows
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, attr string"
    )
    out = scd2_history(df, "user_id", "ts", "attr", tiebreak=["event_id"]).collect()
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["effective_from"])
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[-1]["is_current"] and ivs[-1]["effective_to"] is None
        for a, b in zip(ivs, ivs[1:]):
            assert a["effective_to"] == b["effective_from"]  # abut exactly
            assert a["attr"] != b["attr"]  # change-compressed


@settings(max_examples=10, deadline=None)
@given(rows=st.lists(EVT, min_size=1, max_size=20, unique_by=lambda r: r[2]))
def test_merge_upsert_idempotent_and_latest_wins(spark, rows):
    """Applying the same batch twice equals applying it once, and every
    surviving row is its key's max-version row."""
    cur = spark.createDataFrame(
        [(u, f"v{eid}", 1) for (u, _, eid, _) in rows[: len(rows) // 2 + 1]],
        "k long, v string, version int",
    ).dropDuplicates(["k"])
    upd = spark.createDataFrame(
        [(u, f"w{eid}", 2) for (u, _, eid, _) in rows[len(rows) // 2 :]] or [(99, "w", 2)],
        "k long, v string, version int",
    ).dropDuplicates(["k"])
    once = merge_upsert(cur, upd, ["k"], "version")
    twice = merge_upsert(once, upd, ["k"], "version")
    a = sorted((r["k"], r["v"]) for r in once.collect())
    b = sorted((r["k"], r["v"]) for r in twice.collect())
    assert a == b
    upd_keys = {r["k"] for r in upd.collect()}
    for k, v in a:
        if k in upd_keys:
            assert v.startswith("w")  # update batch always wins


def test_scd2_temporal_join_tie_and_boundary_semantics(spark):
    """Hand-built stream pins the temporal join's contract: a fact AT an
    interval boundary gets the NEW version (equal timestamps match), a
    fact before any dim row gets null, and same-instant dim changes
    resolve to the greatest event_id before history compression."""
    from pyspark.sql import functions as F

    from prod_data_pipeline_spark.operators.cdc import (
        latest_snapshot,
        scd2_history,
    )
    from prod_data_pipeline_spark.operators.joins import asof_join

    purch = spark.createDataFrame(
        [
            ("u1", "2025-01-01 00:00:00", 1, "low"),
            # same instant, higher event_id: must win the dedup
            ("u1", "2025-01-01 00:00:00", 2, "mid"),
            ("u1", "2025-01-03 00:00:00", 3, "high"),
            # change-compression case: high again, no new interval
            ("u1", "2025-01-04 00:00:00", 4, "high"),
        ],
        "user_id string, ts string, event_id long, tier string",
    ).withColumn("ts", F.to_timestamp("ts"))
    clicks = spark.createDataFrame(
        [
            (10, "u1", "2024-12-31 00:00:00"),  # before any purchase
            (11, "u1", "2025-01-02 00:00:00"),  # inside first interval
            (12, "u1", "2025-01-03 00:00:00"),  # AT the boundary -> new
            (13, "u2", "2025-01-05 00:00:00"),  # user with no dim rows
        ],
        "event_id long, user_id string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))

    deduped = latest_snapshot(purch, ["user_id", "ts"], order_col="event_id")
    hist = scd2_history(deduped, "user_id", "ts", "tier", tiebreak=["event_id"])
    hrows = sorted(
        (r["tier"], r["is_current"]) for r in hist.collect()
    )
    assert hrows == [("high", True), ("mid", False)]  # compressed + deduped

    joined = asof_join(
        clicks,
        hist.select("user_id", F.col("effective_from").alias("ts"), "tier"),
        by="user_id",
        value_cols=("tier",),
    )
    got = {r["event_id"]: r["asof_tier"] for r in joined.collect()}
    assert got == {10: None, 11: "mid", 12: "high", 13: None}


def test_paragraph_repetition_profile_planted(spark):
    """Gopher duplicate-line/paragraph counting on hand-built newline text:
    occurrences beyond the first count as duplicates; char fractions weight
    by unit length; the gate is the all-integer MassiveText rule."""
    from prod_data_pipeline_spark.operators.quality import (
        paragraph_repetition_profile,
    )

    # doc 1: paragraphs [P, Q, P]; P = two identical lines "aa\naa", Q = "bb"
    #   paras: P x2 (dup 1), Q x1 -> n=3 dup=1; para_chars = 5+5+2=12, dup 5
    #   lines: "aa" x4 (dup 3), "bb" x1 -> n=5 dup=3; chars 2*5=... aa=2 each
    # doc 2: no duplicates at all
    # doc 3: empty text
    df = _docs(
        spark,
        [
            (1, "aa\naa\n\nbb\n\naa\naa"),
            (2, "one two\n\nthree"),
            (3, ""),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in paragraph_repetition_profile(df).collect()
    }
    r1 = out[1]
    assert (r1["n_paras"], r1["dup_paras"]) == (3, 1)
    assert (r1["n_lines"], r1["dup_lines"]) == (5, 3)
    assert (r1["para_chars"], r1["dup_para_chars"]) == (12, 5)
    assert (r1["line_chars"], r1["dup_line_chars"]) == (10, 6)
    assert r1["dup_para_frac"] == 0.333333
    assert r1["dup_line_frac"] == 0.6
    assert not r1["passes_repetition"]  # 10*3 > 3*5
    r2 = out[2]
    assert (r2["n_paras"], r2["n_lines"], r2["dup_paras"], r2["dup_lines"]) == (
        2, 2, 0, 0,
    )
    assert r2["passes_repetition"]
    r3 = out[3]
    assert (r3["n_paras"], r3["n_lines"]) == (0, 0)
    assert r3["passes_repetition"]


def test_synthetic_paragraph_doc_structure(spark):
    """Fabrication contract: 25-token paragraphs of 5-token lines,
    doc_id % 4 boilerplate copies of paragraph 0 appended."""
    from prod_data_pipeline_spark.operators.text import synthetic_paragraph_doc

    toks30 = " ".join(f"w{i}" for i in range(30))
    df = _docs(spark, [(6, toks30), (4, "a b c"), (1, "")])
    out = {r["doc_id"]: r["ptext"] for r in synthetic_paragraph_doc(df).collect()}
    paras = out[6].split("\n\n")
    assert len(paras) == 4  # 2 body + doc_id%4=2 copies of para 0
    assert paras[0] == paras[2] == paras[3]
    assert paras[0].count("\n") == 4  # 25 tokens -> 5 lines
    assert paras[1] == "w25 w26 w27 w28 w29"
    assert out[4] == "a b c"  # %4==0: no boilerplate
    assert out[1] == ""


def test_cross_doc_paragraph_dedup_first_occurrence_rule(spark):
    """Corpus-wide rule: every occurrence after the global first (by
    (doc_id, pos)) is removed — including repeats INSIDE the first doc
    and the first doc's own later duplicates."""
    from prod_data_pipeline_spark.operators.quality import (
        cross_doc_paragraph_dedup,
    )

    df = spark.createDataFrame(
        [
            (1, "boiler\n\nunique one"),
            (2, "boiler\n\nunique two\n\nboiler"),
            (3, ""),
            (4, "unique three\n\nunique three"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cross_doc_paragraph_dedup(df).collect()}
    assert (out[1]["n_paras"], out[1]["n_removed"]) == (2, 0)
    assert out[1]["clean_text"] == "boiler\n\nunique one"
    assert (out[2]["n_paras"], out[2]["n_removed"]) == (3, 2)
    assert out[2]["clean_text"] == "unique two"
    assert out[2]["chars_removed"] == 12  # two 'boiler' occurrences
    assert (out[3]["n_paras"], out[3]["clean_text"]) == (0, "")
    assert (out[4]["n_paras"], out[4]["n_removed"]) == (2, 1)  # self-dup
    assert out[4]["clean_text"] == "unique three"


def test_fasttext_style_scores_plumbing(spark):
    """Classifier-gate plumbing: feature counts = unigrams + bigrams,
    empty docs score sigmoid(0)=0.5 and pass the >= 0.5 gate, scores lie
    in (0,1), and identical texts get identical scores."""
    from prod_data_pipeline_spark.operators.quality import fasttext_style_scores

    df = _docs(
        spark,
        [
            (1, "alpha beta gamma"),        # 3 uni + 2 bi = 5 feats
            (2, "alpha beta gamma"),        # identical -> identical score
            (3, "solo"),                    # 1 uni + 0 bi
            (4, ""),                        # empty -> 0 feats, prob 0.5
        ],
    )
    out = {r["doc_id"]: r for r in fasttext_style_scores(df).collect()}
    assert out[1]["n_feats"] == 5
    assert out[3]["n_feats"] == 1
    assert out[4]["n_feats"] == 0 and out[4]["quality_prob"] == 0.5 and out[4]["keeps"]
    assert out[1]["quality_prob"] == out[2]["quality_prob"]
    for r in out.values():
        assert 0.0 < r["quality_prob"] < 1.0
        assert r["keeps"] == (r["quality_prob"] >= 0.5)


def test_ft_trained_gate_separates_held_out(spark):
    """Round-11 verdict #2: the production fastText-architecture gate now
    scores with TRAINED weights.  On the real corpus, its keep decision
    must meet the same held-out precision/recall floors the NB evaluation
    gate enforces (0.8/0.75) — a stub-weight regression (which measured
    ~base-rate precision) fails this loudly."""
    from prod_data_pipeline_spark.operators.quality import ft_trained_quality_scores
    from prod_data_pipeline_spark.operators.text import quality_score
    from prod_data_pipeline_spark.functions.text import tokens
    from prod_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    per = ft_trained_quality_scores(docs)
    tk = tokens(F.col("text"))
    lab = docs.select(
        "doc_id",
        (quality_score(tk, F.array_distinct(tk)) >= F.lit(0.52)).alias("y"),
        F.pmod(F.col("doc_id"), F.lit(5)).alias("fold"),
    )
    rows = (
        per.join(lab, "doc_id")
        .filter(F.col("fold") == 4)  # held-out fold (train_folds=4)
        .select("keeps", "y")
        .collect()
    )
    assert rows, "held-out fold is empty"
    tp = sum(1 for r in rows if r["keeps"] and r["y"])
    fp = sum(1 for r in rows if r["keeps"] and not r["y"])
    fn = sum(1 for r in rows if not r["keeps"] and r["y"])
    assert tp + fp > 0 and tp + fn > 0
    assert tp / (tp + fp) >= 0.8, f"precision {tp/(tp+fp):.3f} below NB-gate floor"
    assert tp / (tp + fn) >= 0.75, f"recall {tp/(tp+fn):.3f} below NB-gate floor"


def test_no_registered_query_scores_on_stub_weights():
    """Lint: every plans/ call of fasttext_style_scores must pass trained
    weights (or go through ft_trained_quality_scores).  The stub weight
    table remains available for plumbing tests only."""
    import pathlib
    import re

    plans = pathlib.Path("prod_data_pipeline_spark/plans")
    for path in sorted(plans.glob("*.py")):
        src = path.read_text()
        for m in re.finditer(r"fasttext_style_scores\(", src):
            call = src[m.start() : m.start() + 400]
            assert "weights=" in call, (
                f"{path}: fasttext_style_scores called without trained "
                "weights= in a registered query module"
            )


def test_kappa_report_edge_cases_match_ieee_reference(spark):
    """The kappa-report expressions on confusion counts the corpus cannot
    produce: NEGATIVE kappa (systematic disagreement) and the degenerate
    pe=1 guard (both gates constant -> kappa=1.0 by convention).  The
    reference replays the SAME IEEE ops in Python (int64->float divide,
    floor(x+0.5)), which is the cross-engine contract the oracle relies
    on."""
    import math

    from pyspark.sql import functions as F

    from prod_data_pipeline_spark.plans.queries_curation_gates import (
        kappa_report_columns,
    )

    cases = [
        (100, 40, 10, 10, 40),  # healthy agreement
        (100, 0, 50, 50, 0),    # systematic disagreement -> kappa < 0
        (100, 100, 0, 0, 0),    # both gates constant-keep -> pe = 1 guard
        (100, 0, 0, 0, 100),    # both gates constant-drop -> pe = 1 guard
        (7, 3, 1, 2, 1),        # odd totals exercise the half-up path
        (100, 25, 25, 25, 25),  # independence -> kappa = 0
    ]
    df = spark.createDataFrame(
        cases, "n_docs long, n11 long, n10 long, n01 long, n00 long"
    )
    got = {
        (r.n_docs, r.n11, r.n10, r.n01, r.n00): r
        for r in df.select("*", *kappa_report_columns()).collect()
    }

    def half_up(num: int, den: int) -> float:
        return math.floor(float(num) * 1e6 / float(den) + 0.5) / 1e6

    for n, n11, n10, n01, n00 in cases:
        pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
        r = got[(n, n11, n10, n01, n00)]
        assert r.observed_agreement == half_up(n11 + n00, n)
        assert r.chance_agreement == half_up(pe, n * n)
        if n * n == pe:
            assert r.kappa == 1.0
        else:
            assert r.kappa == half_up(n * (n11 + n00) - pe, n * n - pe)
    # sanity on the semantics, not just the arithmetic:
    assert got[(100, 0, 50, 50, 0)].kappa < 0
    assert got[(100, 25, 25, 25, 25)].kappa == 0.0
    assert got[(100, 100, 0, 0, 0)].kappa == 1.0
