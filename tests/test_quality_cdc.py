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
