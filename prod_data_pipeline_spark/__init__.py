"""prod_data_pipeline_spark — a PySpark-native analytics/ETL engine.

A brand-new, idiomatic Spark SQL / DataFrame implementation of the
capabilities of the reference pipeline ``vbhupathiraju/prod_data_pipeline``
(raw NDJSON -> DQ-gated curated Parquet -> SQL analytics; see SURVEY.md),
extended with large-scale training-data operators: deduplication (exact,
MinHash/LSH, SimHash, n-gram Jaccard), embedding similarity search
(brute-force + IVF), text analysis (language-ID, quality scoring, token
stats, fingerprinting), and multimodal column plumbing.

Design rules (SURVEY.md §4, §7):
- declare plans with the DataFrame/SQL API; let Catalyst/AQE pick physical
  strategies (no hand scheduling, no RDDs);
- one aggregation pass where the reference ran seven actions;
- broadcast small dimensions, keep expressions JVM-side, push filters to
  the parquet scan;
- partition-scoped idempotent writes via dynamic partition overwrite
  (replaces the reference's AWS-proprietary ``purge_s3_path``,
  glue/jobs/raw_to_curated_events_v3_dq.py:155).
"""

__version__ = "0.1.0"

from prod_data_pipeline_spark.session import get_spark, tune  # noqa: F401
