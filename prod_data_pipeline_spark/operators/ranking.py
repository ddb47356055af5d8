"""Distributed EXACT ranking and quantiles — no single-partition sort.

A global window (``Window.orderBy`` with no partition) moves every row
into ONE task: the plan that kills global NTILE / percentile at 100 TB.
These operators keep the semantics exact while staying parallel, via the
classic two-pass sampled-ranking scheme (the same idea behind Spark's own
range-partitioned sort, done at the DataFrame level so the rank is a
first-class column):

1. **Bucket** every row by approximate quantile boundaries of the first
   order column (`approx_percentile` sketch — one cheap pass, mergeable).
   Boundary *quality* only affects load balance, never correctness.
2. **Rank within buckets** with a window partitioned by (group, bucket) —
   parallel across buckets, one hash exchange of the slim relation.
3. **Offset** each bucket by the total count of the buckets before it
   (a window over the tiny (group, bucket)-count relation), so
   ``rank = offset + within-bucket row_number`` is the exact global (or
   per-group) rank.

From the exact rank, NTILE bucket numbers and interpolated
(``quantile_cont``) percentiles follow in closed form, bit-identical to
the single-sort answer.

Requirements: the first order column must be numeric and non-null (filter
first); remaining order columns break ties (pass a unique id for a total
order when exact NTILE assignment matters).

Reference parity: the reference exposes only full-sort SQL over Athena
(sql/athena/curated_events.sql); these operators exist so the same
answers survive a 1000-executor scale-up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RANK_COL = "rank"
TOTAL_COL = "n_total"


def bucketed_global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    by: Sequence[str] = (),
    n_buckets: int = 32,
) -> DataFrame:
    """Exact 1-based row_number rank over ``order_cols`` (per ``by`` group,
    or global when ``by`` is empty), computed without a global sort.

    Output: input columns + ``rank`` (bigint) + ``n_total`` (bigint, the
    group's row count).  The plan's only full-data exchange is one hash
    partition on (by, bucket); everything else runs over relations of at
    most |groups| * n_buckets rows.
    """
    by = list(by)
    val = F.col(order_cols[0]).cast("double")

    probs = [i / n_buckets for i in range(1, n_buckets)]
    agg = [F.approx_percentile(val, F.lit(probs), F.lit(10_000)).alias("__bounds")]
    bounds = df.groupBy(*by).agg(*agg) if by else df.agg(*agg)

    joined = (
        df.join(F.broadcast(bounds), on=by) if by else df.crossJoin(F.broadcast(bounds))
    )
    bucketed = joined.withColumn(
        "__b", F.size(F.filter("__bounds", lambda x: val > x))
    ).drop("__bounds")

    w_rn = Window.partitionBy(*by, "__b").orderBy(*[F.col(c).asc() for c in order_cols])
    ranked = bucketed.withColumn("__rn", F.row_number().over(w_rn))

    # Tiny relation: |groups| * n_buckets rows.  partitionBy(lit(0)) for the
    # global case keeps the exchange a hash partition (the relation is
    # n_buckets rows by construction, never the fact table).
    part = [F.col(c) for c in by] if by else [F.lit(0)]
    counts = bucketed.groupBy(*by, "__b").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.partitionBy(*part).orderBy("__b")
    offsets = counts.select(
        *by,
        "__b",
        F.coalesce(
            F.sum("__cnt").over(w_off.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__off"),
        F.sum("__cnt").over(Window.partitionBy(*part)).alias(TOTAL_COL),
    )

    return (
        ranked.join(F.broadcast(offsets), on=[*by, "__b"])
        .withColumn(RANK_COL, (F.col("__off") + F.col("__rn")).cast("bigint"))
        .drop("__b", "__rn", "__off")
    )


def ntile_from_rank(rank: Column, n_total: Column, k: int) -> Column:
    """SQL NTILE(k) bucket number from an exact 1-based rank: the first
    (n mod k) buckets hold ceil(n/k) rows, the rest floor(n/k) — identical
    assignment to the single-sort window function."""
    base = (n_total / k).cast("bigint")  # floor for non-negative
    rem = n_total % k
    cutoff = rem * (base + 1)
    big = ((rank - 1) / (base + 1)).cast("bigint") + 1
    small = rem + ((rank - cutoff - 1) / base).cast("bigint") + 1
    return F.when(rank <= cutoff, big).otherwise(small).cast("int")


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: dict[str, float],
    by: Sequence[str] = (),
    n_buckets: int = 32,
) -> DataFrame:
    """Exact interpolated quantiles (SQL ``percentile_cont`` /  DuckDB
    ``quantile_cont`` semantics) per ``by`` group, distributed.

    ``probs`` maps output column name -> quantile in [0, 1].  Only the
    two rows flanking each target rank survive the rank pass; the
    interpolation ``lo + (hi - lo) * frac`` with ``h = 1 + p*(n-1)`` is
    the standard continuous-quantile definition, evaluated once per
    (group, prob).  NULL values must be filtered by the caller.

    This is the production-exact alternative to ``approx_percentile``:
    use the sketch when a bounded error is acceptable (one pass, no
    rank join), use this when the answer must be exact — both stay
    parallel at any scale.

    Single-consumer rank (round-16 swap, prepared and equality-proven in
    round 15): the original body consumed its ranked relation TWICE — a
    corpus-wide DISTINCT for the per-group totals, then the flank join —
    so the whole ``bucketed_global_rank`` pipeline (4 scans) replayed per
    consumer: 8 corpus scans.  The totals are group-level facts the rank
    pass already aggregates, so this body inlines the rank and reads
    ``n_total`` off the bucket-count OFFSETS relation (|groups| ×
    n_buckets rows — no corpus re-scan), leaving the ranked relation
    single-consumer: 4 scans, and strictly fewer exchanges.  The flank
    join, interpolation arithmetic, and tie semantics are byte-identical
    to the two-consumer form (pinned at swap time by the r15
    side-by-side run recorded in SCALE.md; the live pins are
    tests/test_ranking.py::test_exact_quantiles_events_shape and the
    ≤4-scan pin in test_exact_quantiles_scan_count).
    """
    by = list(by)
    val = F.col(value_col).cast("double")

    bprobs = [i / n_buckets for i in range(1, n_buckets)]
    agg = [F.approx_percentile(val, F.lit(bprobs), F.lit(10_000)).alias("__bounds")]
    bounds = df.groupBy(*by).agg(*agg) if by else df.agg(*agg)
    joined = (
        df.join(F.broadcast(bounds), on=by) if by else df.crossJoin(F.broadcast(bounds))
    )
    bucketed = joined.withColumn(
        "__b", F.size(F.filter("__bounds", lambda x: val > x))
    ).drop("__bounds")

    w_rn = Window.partitionBy(*by, "__b").orderBy(F.col(value_col).asc())
    ranked = bucketed.withColumn("__rn", F.row_number().over(w_rn))

    part = [F.col(c) for c in by] if by else [F.lit(0)]
    counts = bucketed.groupBy(*by, "__b").agg(F.count(F.lit(1)).alias("__cnt"))
    # |groups| x n_buckets rows feeding TWO consumers (the rank-offset
    # join and the totals) — cut lineage so the corpus-side combiner agg
    # behind it runs once, not per consumer
    from prod_data_pipeline_spark.session import truncate_lineage

    counts = counts.transform(truncate_lineage, eager=False)
    w_off = Window.partitionBy(*part).orderBy("__b")
    offsets = counts.select(
        *by,
        "__b",
        F.coalesce(
            F.sum("__cnt").over(w_off.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__off"),
        F.sum("__cnt").over(Window.partitionBy(*part)).alias(TOTAL_COL),
    )

    # group totals straight off the offsets relation — |groups| rows,
    # zero corpus scans (THE change vs the pre-r16 two-consumer body)
    totals = offsets.select(*by, TOTAL_COL).distinct()
    prob_rows = F.array(
        *[
            F.struct(F.lit(name).alias("qname"), F.lit(p).alias("p"))
            for name, p in probs.items()
        ]
    )
    needed = (
        totals.withColumn("__q", F.explode(prob_rows))
        .select(
            *by,
            F.col("__q.qname").alias("qname"),
            (F.lit(1) + F.col("__q.p") * (F.col(TOTAL_COL) - 1)).alias("__h"),
        )
        .withColumn("__k1", F.floor("__h").cast("bigint"))
        .withColumn("__k2", F.ceil("__h").cast("bigint"))
        .withColumn("__frac", F.col("__h") - F.col("__k1"))
    )

    ranked = (
        ranked.join(F.broadcast(offsets), on=[*by, "__b"])
        .withColumn(RANK_COL, (F.col("__off") + F.col("__rn")).cast("bigint"))
        .drop("__b", "__rn", "__off")
    )
    r, nd = ranked.alias("__r"), needed.alias("__nd")
    cond = [F.col(f"__r.{c}") == F.col(f"__nd.{c}") for c in by] + [
        (F.col(f"__r.{RANK_COL}") == F.col("__nd.__k1"))
        | (F.col(f"__r.{RANK_COL}") == F.col("__nd.__k2"))
    ]
    hits = r.join(F.broadcast(nd), cond).select(
        *[F.col(f"__nd.{c}") for c in by],
        F.col("__nd.qname").alias("qname"),
        F.col("__nd.__k1").alias("__k1"),
        F.col("__nd.__frac").alias("__frac"),
        F.col(f"__r.{RANK_COL}").alias("__rk"),
        F.col(f"__r.{value_col}").cast("double").alias("__v"),
    )
    return (
        hits.groupBy(*by, "qname", "__k1", "__frac")
        .agg(
            F.max(F.when(F.col("__rk") == F.col("__k1"), F.col("__v"))).alias("__lo"),
            F.max(F.when(F.col("__rk") != F.col("__k1"), F.col("__v"))).alias("__hi"),
        )
        .select(
            *by,
            "qname",
            (
                F.col("__lo")
                + (F.coalesce("__hi", "__lo") - F.col("__lo")) * F.col("__frac")
            ).alias("quantile"),
        )
    )
