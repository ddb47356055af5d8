"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star surface for image/audio/video data in a training pipeline.  The
Spark-side design is fully real — schema (schemas.MEDIA_ASSET_SCHEMA),
Arrow-batched mapInPandas decode/feature kernels, partition sizing — while
the actual codec step is stubbed: this container ships no image/audio
libraries, so decode uses a clearly-marked deterministic fake unless a real
decoder import succeeds (PIL/soundfile gated behind import-try, per the
build brief).

Scale notes:
- payloads never pass through Python row-at-a-time: mapInPandas streams
  Arrow record batches, so a 100 TB media table moves executor->Python in
  ~10k-row columnar chunks;
- feature extraction emits fixed-width arrays -> downstream similarity
  search (operators.similarity) applies unchanged;
- `repartition_for_payloads` sizes partitions by payload bytes, not row
  count — media rows are orders of magnitude wider than text rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder path — not available in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode_features(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a codec+embedding step: byte-histogram
    features from a sha256-seeded digest.  STUB — replace with a real
    decoder when PIL/torchvision are present."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:dim]]


def fake_media_assets(docs: DataFrame) -> DataFrame:
    """Deterministic media-asset table fabricated from `documents`: payload
    is the UTF-8 text bytes, media_type cycles by doc_id.  Lets the full
    binary-column pipeline (schema -> mapInPandas decode -> profile) run —
    and be oracle-checked — without shipping real media in the container."""
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media_type.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(F.col("doc_id") % 3 == 2, (F.col("n_chars") * 10).cast("long")).alias(
            "duration_ms"
        ),
    )


def decode_and_featurize(df: DataFrame, feature_dim: int = 16, batch_hint: int = 4096) -> DataFrame:
    """Decode media payloads and emit fixed-width features via mapInPandas.

    The kernel sees Arrow batches (columnar, zero-copy into pandas); output
    schema is fixed so Catalyst can prune/push around the Python stage.
    Raises NotImplementedError for media types that would need a real codec
    when none is installed, EXCEPT the deterministic 'fake' feature path
    which is always available for plumbing tests.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode_features(p, feature_dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": pdf["width"].fillna(0).astype("int32"),
                    "height": pdf["height"].fillna(0).astype("int32"),
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(kernel, schema=DECODED_SCHEMA)


def real_decode(df: DataFrame) -> DataFrame:
    """Real codec path — requires imaging libraries absent from this
    container.  Kept as the integration point; see decode_and_featurize for
    the tested plumbing."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "real media decode needs PIL/torchvision; this container has none "
            "(stubbed per build brief — use decode_and_featurize)"
        )
    raise NotImplementedError("wire PIL decode here when available")


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video payloads: emits (asset_id, frame_idx,
    frame_ts_ms) rows; the decode of each frame is the stubbed kernel above.
    Spark-side semantics (explode by duration) are real."""
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int") - 1, F.lit(0)),
    )
    return (
        df.filter(F.col("media_type") == "video")
        .select("asset_id", F.explode(frames).alias("frame_idx"))
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def repartition_for_payloads(
    df: DataFrame,
    target_partition_bytes: int = 128 << 20,
    avg_payload_bytes: int = 1 << 20,
    row_count: int | None = None,
) -> DataFrame:
    """Size partitions by payload volume, not row count: media rows are MBs
    wide, so the default rows-per-partition heuristics overshoot memory.

    Never triggers an action: row_count is a caller-supplied estimate
    (catalog statistics, a prior count, a sampled extrapolation).  Without
    one, fall back to the session's default parallelism — an extra full
    scan of a 100 TB media table just to pick a partition count is never
    worth it.
    """
    n = max(1, df.sparkSession.sparkContext.defaultParallelism)
    if row_count is None:
        return df.repartition(n)
    rows_per_part = max(1, target_partition_bytes // avg_payload_bytes)
    return df.repartition(max(n, int(row_count / rows_per_part) + 1))
