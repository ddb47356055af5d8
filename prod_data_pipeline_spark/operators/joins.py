"""Temporal join operators: as-of join (point-in-time lookup).

The reference has no joins at all (SURVEY §2.6); an as-of join is the
canonical "operator Spark lacks" from the build brief, implemented as a
composition of built-in DataFrame ops — NOT a range join:

- the naive formulation (`l.ts >= r.ts` range join + max per left row)
  explodes to |L|x|R| within each key and cannot survive scale;
- instead we union both sides, sort within each key by (ts, side), and
  carry the latest right-side payload forward with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding window.
  One shuffle on the `by` key, O(|L|+|R|) rows, no pair blowup — the same
  shape a 1000-executor cluster wants at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    by: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = -600.0,
    upper_s: float = 0.0,
    right_value_cols: Sequence[str] = (),
    matched_prefix: str = "r_",
) -> DataFrame:
    """Interval join: all (left, right) pairs sharing the `by` key with
    ``right_ts`` in ``[left_ts + lower_s, left_ts + upper_s]`` seconds.

    A naive ``l.ts BETWEEN ...`` condition on top of the key equality makes
    Spark evaluate the range as a post-join residual over every key match —
    fine — but with NO key it degenerates to a nested-loop join, and with a
    hot key it still materializes every in-key pair.  This implementation
    bins time into windows of width ``upper_s - lower_s`` and equi-joins on
    (key, bin): each left row lands in at most two bins, each right row in
    exactly one, so a pair can match only once (no post-dedup) and the
    shuffle is a plain hash partition on (key, bin) — skew-bounded by bin
    width, AQE-splittable.
    """
    by = [by] if isinstance(by, str) else list(by)
    lo_us, up_us = int(lower_s * 1_000_000), int(upper_s * 1_000_000)
    width_us = up_us - lo_us
    if width_us <= 0:
        raise ValueError("upper_s must exceed lower_s")
    lcols = left.columns
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    l = left.withColumn(  # noqa: E741
        "_bin",
        F.explode(
            F.sequence(
                F.floor((l_us + lo_us) / width_us), F.floor((l_us + up_us) / width_us)
            )
        ),
    )
    r = right.select(
        *[F.col(c) for c in by],
        F.floor(r_us / width_us).alias("_bin"),
        F.col(right_ts).alias(f"{matched_prefix}{right_ts}"),
        *[F.col(c).alias(f"{matched_prefix}{c}") for c in right_value_cols],
    )
    m_us = F.unix_micros(F.col(f"{matched_prefix}{right_ts}"))
    return (
        l.join(r, by + ["_bin"])
        .filter((m_us >= F.unix_micros(F.col(left_ts)) + lo_us)
                & (m_us <= F.unix_micros(F.col(left_ts)) + up_us))
        .select(
            *lcols,
            F.col(f"{matched_prefix}{right_ts}"),
            *[F.col(f"{matched_prefix}{c}") for c in right_value_cols],
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
    matched_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the latest right row
    (per `by` key) whose ``right_ts <= left_ts``; null when none exists.

    Equal timestamps match (right rows sort before left rows at the same
    instant).  When several right rows share the match timestamp, the one
    with the greatest `tiebreak_cols` wins — pass a unique key there for
    fully deterministic output.

    Returns all left columns plus ``{matched_prefix}{right_ts}`` and
    ``{matched_prefix}{c}`` for each value column.
    """
    by = [by] if isinstance(by, str) else list(by)
    lcols = left.columns
    payload = F.struct(F.col(right_ts).alias("_rts"), *[F.col(c) for c in value_cols])
    r = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        payload.alias("_asof_payload"),
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreak_cols],
    )
    l = (  # noqa: E741
        left.withColumn("_asof_ts", F.col(left_ts)).withColumn("_asof_side", F.lit(1))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy("_asof_ts", "_asof_side", *[f"_tb_{c}" for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_asof_m", F.last("_asof_payload", ignorenulls=True).over(w))
    return matched.filter(F.col("_asof_side") == 1).select(
        *lcols,
        F.col("_asof_m._rts").alias(f"{matched_prefix}{right_ts}"),
        *[F.col(f"_asof_m.{c}").alias(f"{matched_prefix}{c}") for c in value_cols],
    )


def blocked_levenshtein_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 3,
    block_prefix: int = 1,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Fuzzy entity-resolution pairs (record linkage): distinct values of
    `name_col` within `max_dist` edit distance, candidate-bounded by a
    prefix block and a length band.

    Classic blocking: two names can only pair if they share their first
    `block_prefix` characters AND their lengths differ by at most
    `max_dist` (a length gap > d forces edit distance > d, so the band is
    a lossless filter — zero false negatives within the block).  The join
    runs on the DISTINCT name relation — the entity catalog, orders of
    magnitude below the fact table — and `F.levenshtein` is JVM-side
    codegen, no Python.  At 100 TB-catalog scale, widen the block key
    (first token + soundex, or an n-gram LSH) the same way the text dedup
    family does; a hot prefix can be chunk-split exactly like
    dedup.jaccard_prefix_pairs' hot-token guard.

    Block-prefix blocking DOES miss pairs whose first characters differ
    ("gear" vs "fear") — standard recall/cost trade of prefix blocking;
    callers needing zero misses compose multiple blocking passes.
    """
    base = df.select(F.col(name_col), *[F.col(c) for c in extra_cols]).distinct()
    a = base.alias("a")
    b = base.alias("b")
    na, nb = F.col(f"a.{name_col}"), F.col(f"b.{name_col}")
    cond = (
        (F.substring(na, 1, block_prefix) == F.substring(nb, 1, block_prefix))
        & (na < nb)
        & (F.abs(F.length(na) - F.length(nb)) <= max_dist)
    )
    return (
        a.join(b, cond)
        .withColumn("edit_dist", F.levenshtein(na, nb).cast("long"))
        .filter(F.col("edit_dist") <= max_dist)
        .select(
            na.alias("name_a"),
            nb.alias("name_b"),
            "edit_dist",
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in extra_cols],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in extra_cols],
        )
    )
