"""Multimodal plumbing: Arrow-batched decode kernel, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prod_data_pipeline_spark.operators.multimodal import (
    HAVE_PIL,
    decode_and_featurize,
    real_decode,
    repartition_for_payloads,
    sample_video_frames,
)
from prod_data_pipeline_spark.schemas import MEDIA_ASSET_SCHEMA


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", b"\x89PNG fake payload one", "image/png", 64, 48, None, "s3://x/1.png"),
        (2, "image", b"\x89PNG fake payload two", "image/png", 32, 32, None, "s3://x/2.png"),
        (3, "audio", b"RIFF fake wav", "audio/wav", None, None, 2500, "s3://x/3.wav"),
        (4, "video", b"\x00\x00ftyp fake mp4", "video/mp4", 640, 360, 5500, "s3://x/4.mp4"),
        (5, "image", None, "image/png", None, None, None, "s3://x/missing.png"),
    ]
    return spark.createDataFrame(rows, MEDIA_ASSET_SCHEMA)


def test_decode_schema_and_determinism(spark, assets):
    out = decode_and_featurize(assets, feature_dim=16)
    rows = {r["asset_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert all(len(r["features"]) == 16 for r in rows.values())
    assert rows[5]["n_bytes"] == 0 and all(v == 0.0 for v in rows[5]["features"])
    # deterministic: same payload -> same features across runs
    again = {r["asset_id"]: r["features"] for r in decode_and_featurize(assets, 16).collect()}
    assert again == {k: r["features"] for k, r in rows.items()}
    # distinct payloads -> distinct features
    assert rows[1]["features"] != rows[2]["features"]


def test_features_feed_similarity(spark, assets):
    """Decoded features flow into the generic similarity operator."""
    from prod_data_pipeline_spark.operators.similarity import brute_force_topk

    feats = decode_and_featurize(assets).filter(F.col("n_bytes") > 0).select(
        F.col("asset_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    out = brute_force_topk(feats, feats.filter(F.col("vec_id") == 1), k=2)
    got = out.collect()
    assert [r["query_id"] for r in got] == [1, 1]
    assert len({r["neighbor_id"] for r in got}) == 2


def test_video_frame_sampling(spark, assets):
    frames = sample_video_frames(assets, every_ms=1000).collect()
    assert [r["frame_idx"] for r in frames] == [0, 1, 2, 3, 4]
    assert frames[-1]["frame_ts_ms"] == 4000


def test_repartition_for_payloads_triggers_no_action(spark):
    """Building the repartitioned plan must not run a job: a poison UDF in
    the lineage would explode if anything (like the old eager count())
    materialized the input."""
    @F.udf("int")
    def boom(x):
        raise RuntimeError("repartition_for_payloads must not trigger an action")

    poisoned = spark.range(100).withColumn("payload_len", boom("id"))
    # plan construction alone — the old implementation would raise here
    repartition_for_payloads(poisoned)
    repartition_for_payloads(poisoned, row_count=100_000)

    n = spark.sparkContext.defaultParallelism
    clean = spark.range(100)
    assert repartition_for_payloads(clean).rdd.getNumPartitions() == n
    # 100k rows x 1 MiB into 128 MiB partitions -> 100000/128 + 1 = 782
    sized = repartition_for_payloads(clean, row_count=100_000)
    assert sized.rdd.getNumPartitions() == max(n, 782)


def test_real_decode_is_gated(spark, assets):
    if not HAVE_PIL:
        with pytest.raises(NotImplementedError, match="stubbed"):
            real_decode(assets)
