"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This mirrors the driver's t2 correctness gate (run at sf0.01); sf0.001 keeps
the suite fast while exercising identical semantics.
"""

from __future__ import annotations

import pytest

from prod_data_pipeline_spark.plans.queries import QUERIES
from tests.conftest import SF_DIR
from tests.parity import check_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    check_query(spark, name, SF_DIR)


def test_driver_order_policy():
    """The driver checks only the first 50 queries() entries: the ordered
    registry must front-load DRIVER_ORDER (never-checked + changed queries)
    and still expose every registered query exactly once."""
    from prod_data_pipeline_spark.plans.queries import (
        DRIVER_ORDER,
        ordered_queries,
    )

    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)), "duplicate in DRIVER_ORDER"
    assert set(DRIVER_ORDER) <= set(QUERIES), "DRIVER_ORDER names a missing query"
    oq = list(ordered_queries())
    assert oq[: len(DRIVER_ORDER)] == DRIVER_ORDER
    assert set(oq) == set(QUERIES)
    # Round-6 policy (verdict r5 directive #1): the 50-entry window must
    # contain (a) every query that has never had a driver CORRECTNESS row,
    # (b) the 4 queries whose r5 oracles have never been driver-exercised,
    # and (c) the pinned bench-headline sentinels (advisor r5 ask).
    from prod_data_pipeline_spark.plans.queries import DRIVER_SENTINELS

    window = set(oq[:50])
    never_checked = {
        "q2_min_cost_supplier",
        "q5_local_supplier_volume",
        "q11_important_part_value",
        "q20_promotable_suppliers",
        "emb_semdedup_stats",
        "docs_incremental_dedup",
        "emb_top_principal_component",
        "parts_fuzzy_name_matches",
        "events_kanonymity_audit",
        "join_key_skew_report",
        "customer_revenue_gini",
        "customer_rfm_segments",
        "docs_bigram_logprob",
        "docs_bpe_merge_candidates",
        "docs_bpe_second_merge",
        "docs_shard_assignment",
        "docs_taint_blast_radius",
        "docs_zipf_fit",
        "docs_filter_funnel",
        "emb_matryoshka_energy",
        "events_value_mad_outliers",
        "tables_fingerprint_audit",
        "docs_cross_source_dup_matrix",
        "docs_distribution_shift",
        "docs_rag_chunk_stats",
        "docs_source_token_cap",
        "docs_quality_weighted_sample",
        "media_audio_waveform_stats",
        "media_video_frame_stats",
        "events_daily_anomalies",
    }
    newly_oracled = {
        "emb_srp_near_dup_pairs",
        "emb_topk_ivf",
        "media_feature_topk",
        "docs_packed_bins",
    }
    new_in_round_6 = {
        "docs_bpe_train_16",
        "media_audio_band_hash_groups",
        "media_video_framehash_groups",
    }
    must_see = (
        never_checked | newly_oracled | new_in_round_6 | set(DRIVER_SENTINELS)
    )
    assert must_see <= window


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_rows_only_queries_document_their_justification():
    """Governance: a query without an oracle gets only the driver's weak
    rows-only check, so its docstring must say why that is the strongest
    check its semantics admit (approximate output, order-nondeterminism,
    no tractable SQL mirror) — no silent oracle omissions."""
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            doc = (spec.fn.__doc__ or "").lower()
            assert "rows-only" in doc, f"{name}: no_oracle without justification"
