"""Injected-NaN/Inf tests for the round-11 non-finite hardening sweep
(verdict #4): every numeric family that aggregates embeddings or ships
driver-side decisions must either EXCLUDE invalid rows (the
``_emb_matrix`` mask-False contract) or FAIL LOUDLY — never let a NaN
poison an aggregate or sail through a Python bound comparison (every
comparison with NaN is False — the round-9 int40-guard bypass class).
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

NAN = float("nan")
INF = float("inf")


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")


CLEAN = [
    (1, "a", [1.0, 2.0, 3.0, 4.0]),
    (2, "a", [2.0, 3.0, 4.0, 5.0]),
    (3, "b", [5.0, 1.0, 0.0, 2.0]),
    (4, "b", [7.0, 3.0, 2.0, 0.0]),
]
DIRTY = [
    (10, "a", [NAN, 2.0, 3.0, 4.0]),       # NaN element
    (11, "b", [1.0, INF, 3.0, 4.0]),        # +Inf element
    (12, "a", [1.0, -INF, 3.0, 4.0]),       # -Inf element
    (13, "b", None),                          # NULL array
    (14, "a", [1.0, None, 3.0, 4.0]),       # NULL element
    (15, "b", [1.0, 2.0]),                    # ragged
]


def test_assert_finite_raises_on_all_nonfinite():
    from prod_data_pipeline_spark.functions.guards import assert_finite

    assert assert_finite(1.5, "ok") == 1.5
    assert assert_finite(0, "ok") == 0.0
    for bad in (NAN, INF, -INF, None):
        with pytest.raises(ValueError, match="non-finite"):
            assert_finite(bad, "ctx")


def test_invalid_embedding_expression_matches_emb_matrix(spark):
    """The expression-side guard must agree row-for-row with the Arrow
    kernels' _emb_matrix validity mask — one shared rule, two engines."""
    import pandas as pd

    from prod_data_pipeline_spark.functions.guards import invalid_embedding
    from prod_data_pipeline_spark.operators.similarity import _emb_matrix

    rows = CLEAN + DIRTY
    df = _emb_df(spark, rows)
    got = {
        r["vec_id"]: r["bad"]
        for r in df.select(
            "vec_id", invalid_embedding("embedding", 4).alias("bad")
        ).collect()
    }
    _, ok = _emb_matrix(pd.Series([r[2] for r in rows]), 4)
    for (vec_id, _, _), valid in zip(rows, ok):
        assert got[vec_id] == (not bool(valid)), f"disagreement on vec {vec_id}"


def test_covariance_matrix_raises_on_injected_nonfinite(spark):
    from prod_data_pipeline_spark.operators.linalg import covariance_matrix

    clean = _emb_df(spark, CLEAN)
    covariance_matrix(clean)  # clean data passes
    for bad_row in DIRTY:
        df = _emb_df(spark, CLEAN + [bad_row])
        with pytest.raises(ValueError, match="NULL/NaN/Inf|length"):
            covariance_matrix(df)


def test_pq_codebook_excludes_injected_rows(spark):
    """Training excludes invalid rows — the codebook over CLEAN+DIRTY must
    equal the codebook over CLEAN alone, and every code is finite."""
    from prod_data_pipeline_spark.operators.similarity import pq_codebook

    labels_c, book_c = pq_codebook(_emb_df(spark, CLEAN), dim=4)
    labels_d, book_d = pq_codebook(_emb_df(spark, CLEAN + DIRTY), dim=4)
    assert labels_c == labels_d
    assert book_c == book_d
    for codes in book_d.values():
        assert all(math.isfinite(c) for c in codes)


def test_pq_encode_nulls_invalid_rows(spark):
    """Encoding degrades per-row: invalid embeddings produce NULL codes
    (the _emb_matrix mask), valid rows are unaffected by their presence."""
    from prod_data_pipeline_spark.operators.similarity import pq_codebook, pq_encode

    base = _emb_df(spark, CLEAN)
    labels, book = pq_codebook(base)
    mixed = _emb_df(spark, CLEAN + DIRTY)
    out = {
        r["vec_id"]: r
        for r in pq_encode(mixed, labels, book, m=2).select(
            "vec_id", "codes", "recon_err"
        ).collect()
    }
    clean_out = {
        r["vec_id"]: r
        for r in pq_encode(base, labels, book, m=2).select(
            "vec_id", "codes", "recon_err"
        ).collect()
    }
    for vid, _, _ in CLEAN:
        assert out[vid]["codes"] == clean_out[vid]["codes"]
        assert out[vid]["recon_err"] == clean_out[vid]["recon_err"]
    for vid, _, _ in DIRTY:
        assert out[vid]["codes"] is None, f"vec {vid} should encode as NULL"


def test_label_centroids_exclude_injected_rows(spark):
    from prod_data_pipeline_spark.operators.similarity import label_centroids

    cents_c = {
        r["cell"]: r["centroid"]
        for r in label_centroids(_emb_df(spark, CLEAN), dim=4).collect()
    }
    cents_d = {
        r["cell"]: r["centroid"]
        for r in label_centroids(_emb_df(spark, CLEAN + DIRTY), dim=4).collect()
    }
    assert cents_c == cents_d
    for c in cents_d.values():
        assert all(math.isfinite(x) for x in c)


def test_assign_cells_excludes_injected_rows(spark):
    from prod_data_pipeline_spark.operators.similarity import (
        assign_cells,
        label_centroids,
    )

    cents = label_centroids(_emb_df(spark, CLEAN), dim=4)
    out = assign_cells(_emb_df(spark, CLEAN + DIRTY), cents, dim=4)
    got = {r["vec_id"]: r["cell"] for r in out.collect()}
    assert set(got) == {1, 2, 3, 4}, "invalid rows must be excluded, valid kept"
    clean_got = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(_emb_df(spark, CLEAN), cents, dim=4).collect()
    }
    assert got == clean_got


def test_kmeans_cells_excludes_injected_rows(spark):
    from prod_data_pipeline_spark.operators.similarity import kmeans_cells

    assigns, cents = kmeans_cells(_emb_df(spark, CLEAN + DIRTY), k=2, max_iter=2, dim=4)
    got = {r["vec_id"] for r in assigns.collect()}
    assert got == {1, 2, 3, 4}
    for r in cents.collect():
        assert all(math.isfinite(x) for x in r["centroid"])


def test_srp_signature_degrades_on_injected_rows(spark):
    """SRP signatures over invalid rows take the documented degraded path
    (zero dots -> sign-bit-0 signature) instead of crashing the task, and
    valid rows' signatures are unchanged by their presence."""
    from prod_data_pipeline_spark.operators.similarity import with_srp_signature

    sig_c = {
        r["vec_id"]: r["srp_sig"]
        for r in with_srp_signature(_emb_df(spark, CLEAN), dim=4, nbits=16).collect()
    }
    sig_d = {
        r["vec_id"]: r["srp_sig"]
        for r in with_srp_signature(_emb_df(spark, CLEAN + DIRTY), dim=4, nbits=16).collect()
    }
    for vid, _, _ in CLEAN:
        assert sig_d[vid] == sig_c[vid]
    for vid, _, _ in DIRTY:
        assert vid in sig_d, "degraded rows must still produce a signature row"
