"""Change-data-capture compaction and slowly-changing-dimension history.

The reference rebuilds curated partitions wholesale (purge + rewrite,
glue/jobs/raw_to_curated_events_v3_dq.py:113-121); these operators cover
the incremental-update patterns a warehouse layered on the same engine
needs: collapse a change stream to its latest state (SCD type 1) and
derive effective-dated history with change compression (SCD type 2).

Scale notes: both are single-window plans — one shuffle on the entity
key, no joins, no second pass.  At 100 TB the shuffle is unavoidable
(per-key ordering is the semantics); what matters is that there is
exactly ONE exchange and every downstream column derives from the same
sorted run (lag/lead/row_number share the window frame).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """SCD1 / CDC log compaction: the most recent row per key.

    ``tiebreak`` columns break order_col ties deterministically (pass a
    unique id when the change stream can carry equal timestamps).
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_history(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """SCD2 effective-dated history of one tracked attribute, change-
    compressed: consecutive rows with the same attribute value collapse
    into one validity interval.

    Output: (key, attr, effective_from, effective_to, is_current) where
    effective_to is NULL on each key's open interval.  Two stacked window
    functions over the SAME window spec — Catalyst evaluates both in a
    single sort, so the plan is one exchange + one sort despite the
    change-detection lag and the interval-closing lead.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    # Change detection must be null-safe: lag() returns NULL both on the
    # first row and after a NULL attribute, so "prev IS NULL" cannot stand
    # in for "first row" without splitting runs of consecutive NULL attrs
    # into duplicate uncompressed intervals.  Detect the first row
    # explicitly (row_number over the same spec — still one sort) and
    # compare attr to prev with IS DISTINCT FROM (~eqNullSafe).
    changed = (
        df.select(key, ts_col, attr_col, *tiebreak)
        .withColumn("__prev", F.lag(attr_col).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            | ~F.col(attr_col).eqNullSafe(F.col("__prev"))
        )
        .drop("__prev", "__rn")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return changed.select(
        F.col(key),
        F.col(attr_col),
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w2).alias("effective_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Data reconciliation: key-level diff of two relations.

    Emits one row per key that differs — ``diff_status`` is
    ``left_only`` / ``right_only`` / ``changed`` (any compare column
    differs under null-safe comparison); identical keys are dropped.
    The migration-validation companion to merge_upsert: after an upsert,
    ``table_diff(old, new, ...)`` is exactly the change set.

    Scale: one full-outer shuffle join on the key — both sides exchange
    once, compare columns ride along, no second pass.  Column comparison
    is null-safe (`eqNullSafe`), the relational IS DISTINCT FROM.
    """
    lm = left.select(
        *keys,
        F.lit(1).alias("__l"),
        *[F.col(c).alias(f"__l_{c}") for c in compare_cols],
    )
    rm = right.select(
        *keys,
        F.lit(1).alias("__r"),
        *[F.col(c).alias(f"__r_{c}") for c in compare_cols],
    )
    joined = lm.join(rm, list(keys), "full_outer")
    any_changed = F.lit(False)
    for c in compare_cols:
        any_changed = any_changed | ~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
    status = (
        F.when(F.col("__r").isNull(), F.lit("left_only"))
        .when(F.col("__l").isNull(), F.lit("right_only"))
        .when(any_changed, F.lit("changed"))
    )
    return (
        joined.withColumn("diff_status", status)
        .filter(F.col("diff_status").isNotNull())
        .select(*keys, "diff_status")
    )


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Upsert a change batch into a snapshot: union then latest-per-key.

    Equivalent to MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT for append-style batches, expressed as a plain relational plan
    so it runs on bare parquet (no table-format dependency).  The union
    is shuffle-free; the single exchange is the latest_snapshot window.

    Ordering ties resolve update-wins: after ``order_col`` and any caller
    ``tiebreak`` columns, an internal source-priority column (updates=1,
    current=0) is the final tiebreak, so an update carrying the same
    order value as the stored row still replaces it — MERGE WHEN MATCHED
    UPDATE semantics rather than a nondeterministic winner.
    """
    cols = current.columns
    tagged = (
        current.select(*cols)
        .withColumn("__src", F.lit(0))
        .unionByName(updates.select(*cols).withColumn("__src", F.lit(1)))
    )
    return latest_snapshot(
        tagged, keys, order_col, tiebreak=[*tiebreak, "__src"]
    ).drop("__src")
