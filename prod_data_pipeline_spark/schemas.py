"""Static, read-time-enforced schemas.

The reference never infers schemas: every Glue job declares the identical
StructType and passes it to the JSON reader
(glue/jobs/raw_to_curated_events_v3_dq.py:46-52, v1:17-23, v2:33-39).
We keep that discipline — schema-on-read, no inference pass.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw NDJSON event record (reference: v3_dq.py:46-52).
EVENT_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("event_ts", T.StringType(), True),  # ISO-8601 Z string
        T.StructField("amount", T.DoubleType(), True),
    ]
)

# Curated table (reference: v3_dq.py:157-162, sql/athena/curated_events.sql:1-11).
EVENT_CURATED_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("event_ts", T.TimestampType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("processing_ts", T.TimestampType(), True),
        T.StructField("ingestion_date", T.StringType(), True),  # partition col
    ]
)

# Valid event types for the DQ enum check (reference: v3_dq.py:22).
VALID_EVENT_TYPES = ["login", "view_item", "add_to_cart", "purchase"]

# Event types in the driver's synthetic `events` table (/root/testdata).
TESTDATA_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

# Multimodal asset record: opaque binary payload + typed metadata.  The
# payload is never interpreted by Spark itself; decode/feature-extract runs
# in Arrow-batched pandas UDFs (operators/multimodal.py).
MEDIA_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("source_uri", T.StringType(), True),
    ]
)
