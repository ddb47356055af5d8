"""Similarity-search operators: exactness of brute force, IVF recall."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from prod_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    label_centroids,
)
from prod_data_pipeline_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def test_brute_force_matches_numpy(spark, emb):
    import numpy as np

    pdf = emb.toPandas()
    vecs = {r.vec_id: np.array(r.embedding, dtype="float64") for r in pdf.itertuples()}
    qid = 3
    sims = {
        vid: float(vecs[qid] @ v / (np.linalg.norm(vecs[qid]) * np.linalg.norm(v)))
        for vid, v in vecs.items()
        if vid != qid
    }
    expected = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = (
        brute_force_topk(emb, emb.filter(F.col("vec_id") == qid), k=5)
        .orderBy("rank")
        .collect()
    )
    assert [r["neighbor_id"] for r in got] == [vid for vid, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert math.isclose(r["sim"], round(s, 4), abs_tol=1e-4)


def test_ivf_recall_vs_bruteforce(spark, emb):
    """k-means IVF with nprobe=3 of 8 cells must recover most of the exact
    top-5 (the synthetic labels are NOT geometric clusters, so cells come
    from a real quantizer fit)."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, nprobe=3, n_cells=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q]) for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6


def test_centroids_shape(spark, emb):
    cents = label_centroids(emb).collect()
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert {r["cell"] for r in cents} == labels
    dim = len(emb.first()["embedding"])
    assert all(len(r["centroid"]) == dim for r in cents)


def test_ivf_nprobe_full_equals_bruteforce(spark, emb):
    """With nprobe == n_cells IVF degenerates to exact search."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=3).collect()
    full = ivf_topk(emb, queries, k=3, nprobe=8, n_cells=8).collect()
    key = lambda rows: {(r["query_id"], r["rank"]): r["neighbor_id"] for r in rows}
    assert key(exact) == key(full)
