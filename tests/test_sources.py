"""Source operators S1-S4: schema-enforced NDJSON, recursive multi-partition
scan, and the file-provenance partition column (SURVEY §2.1)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from prod_data_pipeline_spark.sources.readers import (
    read_events_ndjson,
    with_ingestion_date_from_path,
)
from tests.eventgen import generate_raw_events

DATES = ["2025-01-01", "2025-01-02"]


def test_recursive_scan_with_path_provenance(spark, tmp_path):
    """S2 + S4: one recursive read over the whole landing zone; each row's
    ingestion_date comes from its source file path (reference v1.py:26-37)."""
    base = str(tmp_path / "raw")
    counts = generate_raw_events(base, DATES, rows_per_day=120, dup_rate=0.0)
    df = with_ingestion_date_from_path(read_events_ndjson(spark, base, recursive=True))
    got = {
        r["ingestion_date"]: r["n"]
        for r in df.groupBy("ingestion_date").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == counts


def test_provenance_drops_unpartitioned_paths(spark, tmp_path):
    """Rows from files outside an ingestion_date= dir are dropped, as in the
    reference's v1 filter (v1.py:47)."""
    base = str(tmp_path / "raw")
    generate_raw_events(base, DATES[:1], rows_per_day=50, dup_rate=0.0)
    stray_dir = os.path.join(base, "stray")
    os.makedirs(stray_dir)
    with open(os.path.join(stray_dir, "events.json"), "w") as f:
        f.write('{"event_id": "x", "user_id": "1", "event_type": "login", '
                '"event_ts": "2025-01-01T00:00:00Z", "amount": null}\n')
    df = with_ingestion_date_from_path(read_events_ndjson(spark, base, recursive=True))
    assert df.count() == 50  # stray row filtered, partitioned rows kept


def test_schema_enforced_no_inference(spark, tmp_path):
    """S1: the reader applies the declared schema even to malformed rows
    (extra fields ignored, wrong-typed amount nulled, no inference pass)."""
    base = str(tmp_path / "raw" / "source_system=app" / "ingestion_date=2025-01-01")
    os.makedirs(base)
    with open(os.path.join(base, "events.json"), "w") as f:
        f.write('{"event_id": "a", "user_id": "1", "event_type": "login", '
                '"event_ts": "2025-01-01T01:00:00Z", "amount": 5.5, "extra": "ignored"}\n')
        f.write('{"event_id": "b", "user_id": "2", "event_type": "purchase", '
                '"event_ts": "2025-01-01T02:00:00Z", "amount": "not-a-number"}\n')
    df = read_events_ndjson(spark, base)
    rows = {r["event_id"]: r for r in df.collect()}
    assert set(df.columns) == {"event_id", "user_id", "event_type", "event_ts", "amount"}
    assert rows["a"]["amount"] == 5.5


def test_write_json_report_uri_storage_parity(spark, tmp_path):
    """S7 storage parity (round-9 verdict #5): the reference lands the DQ
    report next to the data on the warehouse store (v3_dq.py:134-140);
    a URI path must go through the Hadoop FileSystem API so file:// /
    hdfs:// / s3a:// all work, and the artifact must be readable back
    through Spark.  A plain local path keeps the direct-write fast path;
    a URI without a session raises."""
    import json

    import pytest

    from prod_data_pipeline_spark.sources.writers import write_json_report

    report = {"status": "PASS", "profile": {"n_rows": 42, "null_user_rate": 0.0}}

    # URI path through the Hadoop FS (file:// exercises the same API
    # surface hdfs:// / s3a:// would hit on a cluster)
    uri = f"file://{tmp_path}/metrics/ingestion_date=2025-01-01/dq_report.json"
    got = write_json_report(report, uri, spark=spark)
    assert got == uri
    # read it back THROUGH Spark, like a warehouse consumer would
    body = "\n".join(r["value"] for r in spark.read.text(uri).collect())
    assert json.loads(body) == report
    # and the bytes really are on the local store at the expected spot
    local = os.path.join(str(tmp_path), "metrics", "ingestion_date=2025-01-01", "dq_report.json")
    with open(local) as f:
        assert json.load(f) == report

    # plain local path: fast path, no session needed
    plain = os.path.join(str(tmp_path), "metrics2", "dq_report.json")
    write_json_report(report, plain)
    with open(plain) as f:
        assert json.load(f) == report

    # URI without a session is a hard error, not a silent local write
    with pytest.raises(ValueError, match="SparkSession"):
        write_json_report(report, "file:///tmp/nope.json")


def test_write_range_ordered_global_file_order(spark, tmp_path):
    """Range-ordered layout: every file's [min, max] of the order column is
    disjoint and ordered across files — the property parquet footer stats
    need for real file-level skipping."""
    import glob as _glob_mod

    from prod_data_pipeline_spark.sources.writers import write_range_ordered

    df = spark.range(0, 10_000).withColumn(
        "k", (F.col("id") * 2654435761) % 10_000  # scrambled insert order
    )
    out = str(tmp_path / "ranged")
    write_range_ordered(df, out, ["k"], num_files=8)

    files = sorted(_glob_mod.glob(out + "/part-*.parquet"))
    assert len(files) == 8
    spans = []
    for f in files:
        stats = spark.read.parquet(f).agg(
            F.min("k").alias("lo"), F.max("k").alias("hi"), F.count("*").alias("n")
        ).first()
        spans.append((stats["lo"], stats["hi"], stats["n"]))
    spans.sort()
    for (lo_a, hi_a, _), (lo_b, hi_b, _) in zip(spans, spans[1:]):
        assert hi_a <= lo_b  # disjoint, globally ordered
    # range partitioner balances: no file holds more than ~3x the mean
    ns = [n for _, _, n in spans]
    assert max(ns) < 3 * (sum(ns) / len(ns))
    # round-trip preserves the data
    assert spark.read.parquet(out).count() == 10_000


def test_write_zordered_multidim_locality(spark, tmp_path):
    """Z-order layout: per-file min/max spans must be partial on BOTH
    z-ordered dimensions — that is the property that lets a predicate on
    EITHER column skip files.  Baseline: a single-column range sort on x
    has perfect x-locality but every file spans ~the whole y range, so a
    y-only predicate prunes nothing."""
    import glob as _glob_mod

    from prod_data_pipeline_spark.sources.writers import (
        write_range_ordered,
        write_zordered,
    )

    n = 20_000
    df = spark.range(0, n).select(
        ((F.col("id") * 2654435761) % n).alias("x"),
        ((F.col("id") * 40503) % n).alias("y"),
    )

    def mean_spans(path: str) -> tuple[float, float]:
        files = sorted(_glob_mod.glob(path + "/part-*.parquet"))
        assert len(files) == 16
        xs, ys = [], []
        for f in files:
            s = spark.read.parquet(f).agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y")
            ).first()
            xs.append((s[1] - s[0]) / n)
            ys.append((s[3] - s[2]) / n)
        return sum(xs) / len(xs), sum(ys) / len(ys)

    zpath, rpath = str(tmp_path / "zord"), str(tmp_path / "ranged")
    write_zordered(df, zpath, ["x", "y"], num_files=16, bits=10)
    write_range_ordered(df, rpath, ["x"], num_files=16)

    zx, zy = mean_spans(zpath)
    rx, ry = mean_spans(rpath)
    # x-only sort: near-perfect x spans but y unprunable (span ~ 1.0)
    assert rx < 0.1 and ry > 0.9, (rx, ry)
    # z-order: BOTH dims partial — every file prunable on either column
    # (theoretical ~0.25 for 16 files on a 2-D morton curve + boundary
    #  effects; 0.6 is the "still far better than unsorted" bar)
    assert zx < 0.6 and zy < 0.6, (zx, zy)
    assert spark.read.parquet(zpath).count() == n
    # the z columns round-trip unchanged (helper cols dropped)
    assert set(spark.read.parquet(zpath).columns) == {"x", "y"}
