"""Operator surface: dedup, similarity, text, temporal joins, skew/layout,
multimodal, corpus curation, content-quality gates, CDC/SCD."""

from prod_data_pipeline_spark.operators.cdc import (
    latest_snapshot,
    merge_upsert,
    scd2_history,
    table_diff,
)
from prod_data_pipeline_spark.operators.corpus import curate_corpus, dup_clusters
from prod_data_pipeline_spark.operators.dedup import (
    drop_exact_dups,
    exact_dedup_groups,
    near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_bucket_pairs,
    with_minhash,
    with_simhash,
)
from prod_data_pipeline_spark.operators.joins import asof_join, time_range_join
from prod_data_pipeline_spark.operators.packing import chunk_spans, pack_greedy
from prod_data_pipeline_spark.operators.sampling import (
    hash_sample,
    mixing_weights,
    stratified_sample,
)
from prod_data_pipeline_spark.operators.multimodal import (
    real_decode,
    repartition_for_payloads,
    resize_images,
    sample_video_frames,
    synthetic_media_assets,
)
from prod_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_recall_at_k,
    ivf_topk,
    srp_near_dup_pairs,
)
from prod_data_pipeline_spark.operators.quality import (
    contamination_overlap,
    repetition_profile,
)
from prod_data_pipeline_spark.operators.skew import salted_join, write_bucketed
from prod_data_pipeline_spark.operators.text import (
    predicted_lang,
    quality_score,
    winnow_fingerprints,
)

__all__ = [
    "asof_join",
    "brute_force_topk",
    "chunk_spans",
    "contamination_overlap",
    "cosine_near_dup_pairs",
    "curate_corpus",
    "dup_clusters",
    "drop_exact_dups",
    "exact_dedup_groups",
    "hash_sample",
    "ivf_recall_at_k",
    "ivf_topk",
    "latest_snapshot",
    "merge_upsert",
    "mixing_weights",
    "near_dup_pairs",
    "pack_greedy",
    "ngram_jaccard_pairs",
    "predicted_lang",
    "quality_score",
    "real_decode",
    "repartition_for_payloads",
    "repetition_profile",
    "resize_images",
    "salted_join",
    "scd2_history",
    "stratified_sample",
    "sample_video_frames",
    "synthetic_media_assets",
    "table_diff",
    "simhash_bucket_pairs",
    "srp_near_dup_pairs",
    "time_range_join",
    "winnow_fingerprints",
    "with_minhash",
    "with_simhash",
    "write_bucketed",
]
