"""Similarity-search operators: exactness of brute force, IVF recall."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from prod_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_recall_at_k,
    ivf_topk,
    label_centroids,
    srp_near_dup_pairs,
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


def test_ivf_recall_at_k_floor(spark, emb):
    """The one-plan recall@k metric: every query reports n_exact=k, and
    average recall at nprobe=4 of 8 cells clears the floor.  The corpus is
    near-random unit vectors (hardest case for a coarse quantizer); the
    seeded k-means makes the measured 0.9 deterministic, 0.8 allows slack
    for pyspark.ml implementation drift."""
    rows = ivf_recall_at_k(
        emb, emb.filter(F.col("vec_id") < 8), k=5, nprobe=4, n_cells=8
    ).collect()
    assert len(rows) == 8
    assert all(r["n_exact"] == 5 for r in rows)
    avg = sum(r["recall"] for r in rows) / len(rows)
    assert avg >= 0.8, f"avg recall {avg}"


def test_centroids_shape(spark, emb):
    cents = label_centroids(emb).collect()
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert {r["cell"] for r in cents} == labels
    dim = len(emb.first()["embedding"])
    assert all(len(r["centroid"]) == dim for r in cents)


def _planted(spark, emb):
    """Corpus + a near-identical copy of vec 0 (cosine ~1) with a fresh id."""
    base = emb.select("vec_id", "embedding", "label")
    dup = base.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0001)).alias("embedding"),
        "label",
    )
    return base.unionByName(dup)


def test_srp_finds_planted_duplicate(spark, emb):
    """A cosine~1 pair agrees on every SRP bit, so band bucketing ALWAYS
    surfaces it — the LSH recall floor for true duplicates."""
    corpus = _planted(spark, emb)
    pairs = srp_near_dup_pairs(corpus, dim=64, threshold=0.99).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 1_000_000 for r in pairs)
    assert all(r["sim"] >= 0.99 for r in pairs)


def test_srp_pairs_subset_of_exact(spark, emb):
    """LSH candidates post-verify are a subset of the exact blocked pairs
    (same threshold, block = everything via constant label)."""
    one_block = emb.withColumn("label", F.lit(0))
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(one_block, threshold=0.25).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in srp_near_dup_pairs(emb, dim=64, threshold=0.25).collect()
    }
    assert approx <= exact


def test_cosine_near_dup_blocked_on_label(spark, emb):
    """Blocked pairs only ever pair within a block, and sims respect the
    threshold."""
    rows = cosine_near_dup_pairs(emb, threshold=0.25).collect()
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in rows:
        assert labels[r["id_a"]] == labels[r["id_b"]]
        assert r["sim"] >= 0.25
        assert r["id_a"] < r["id_b"]


def test_ivf_nprobe_full_equals_bruteforce(spark, emb):
    """With nprobe == n_cells IVF degenerates to exact search."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=3).collect()
    full = ivf_topk(emb, queries, k=3, nprobe=8, n_cells=8).collect()
    key = lambda rows: {(r["query_id"], r["rank"]): r["neighbor_id"] for r in rows}
    assert key(exact) == key(full)


def test_zero_norm_vector_never_matches_or_ranks(spark):
    """cosine_sim is zero-norm-safe via try_divide -> NULL.  A NaN cosine
    would pass every `sim >= t` filter AND rank #1 in desc top-k windows
    (Spark sorts NaN above all numbers); NULL is excluded by both."""
    rows = [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [0.0, 0.0], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pair_ids = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(df, threshold=0.1).collect()
    }
    assert pair_ids == {(0, 1)}  # the zero vector pairs with nothing
    top = brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    assert [r["neighbor_id"] for r in top] == [1]  # never the zero vector


def test_ivf_topk_label_deterministic_and_recall(spark, emb):
    """The deterministic-quantizer IVF (ivf_topk_label): two independent
    runs are row-identical (the whole index is a pure function of the
    data), self-matches are excluded, ranks are 1..k, and recall vs
    exact brute force clears a floor at nprobe=2 of the label cells."""
    from prod_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_label,
    )

    q = emb.filter(F.col("vec_id") < 8)
    a = ivf_topk_label(emb, q, k=5, nprobe=2).collect()
    b = ivf_topk_label(emb, q, k=5, nprobe=2).collect()
    assert a == b, "deterministic index must reproduce itself exactly"
    assert all(r["query_id"] != r["neighbor_id"] for r in a)
    by_q = {}
    for r in a:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in a}
    recall = len(got & exact) / len(exact)
    # random unit vectors are the worst case for any non-adaptive coarse
    # quantizer; at nprobe=2 of ~10 label cells a loose floor is honest
    assert recall >= 0.25, f"label-IVF recall {recall}"
    # crisp invariant: probing EVERY cell degenerates to exact brute force
    n_cells = emb.select("label").distinct().count()
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk_label(emb, q, k=5, nprobe=n_cells).collect()
    }
    assert full == exact, "nprobe=all-cells must equal brute force"


def test_semdedup_no_kept_pair_above_threshold(spark, emb):
    """semdedup invariant: the kept set contains NO pair at or above the
    threshold (the dominated-id rule's safety direction), every pruned id
    has a lower-id witness >= threshold, and pruning is deterministic."""
    from prod_data_pipeline_spark.operators.similarity import (
        cosine_near_dup_pairs,
        semdedup,
    )

    kept = semdedup(emb, threshold=0.3, block_cols=("label",))
    assert kept.count() == semdedup(emb, threshold=0.3, block_cols=("label",)).count()
    leftover = cosine_near_dup_pairs(kept, threshold=0.3, block_cols=("label",))
    assert leftover.count() == 0, "kept set still contains a >=threshold pair"
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    pruned_ids = {r["vec_id"] for r in emb.select("vec_id").collect()} - kept_ids
    witnesses = {
        r["id_b"]
        for r in cosine_near_dup_pairs(emb, threshold=0.3, block_cols=("label",)).collect()
    }
    assert pruned_ids == witnesses, "pruned iff a lower-id witness exists"


def test_ivf_sample_fit_recall_and_determinism(spark, emb):
    """Sample-fit IVF (fit_sample_mod): the Lloyd's fit sees only the
    deterministic 1/2 hash-sample, assignment still covers every vector,
    two runs are row-identical, and recall vs brute force stays above the
    random-unit-vector floor."""
    from prod_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    q = emb.filter(F.col("vec_id") < 8)
    a = ivf_topk(emb, q, k=5, nprobe=4, n_cells=8, fit_sample_mod=2).collect()
    b = ivf_topk(emb, q, k=5, nprobe=4, n_cells=8, fit_sample_mod=2).collect()
    assert a == b, "sample-fit index must be deterministic"
    assigned = {r["neighbor_id"] for r in a}
    assert assigned, "sample-fit produced an empty result"
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in a}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.25, f"sample-fit IVF recall {recall}"


def test_power_iteration_pca_converges_on_anisotropic_data(spark):
    """On data with a dominant direction (large eigengap), the quantized
    relational power iteration recovers numpy's top eigenvector
    (|cos| > 0.99) and eigenvalue (rel err < 2%); two runs are
    row-identical (the quantization makes the recurrence deterministic)."""
    import numpy as np

    from prod_data_pipeline_spark.operators.linalg import (
        covariance_matrix,
        top_principal_component,
    )

    rng = np.random.RandomState(7)
    d, n = 16, 400
    direction = rng.standard_normal(d)
    direction /= np.linalg.norm(direction)
    X = rng.standard_normal((n, d)) * 0.1 + np.outer(rng.standard_normal(n), direction)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        ["vec_id", "embedding"],
    )
    cov = covariance_matrix(df).localCheckpoint(eager=True)
    out = top_principal_component(cov, dim=d, n_iters=8).toPandas().sort_values("pos")
    out2 = top_principal_component(cov, dim=d, n_iters=8).toPandas().sort_values("pos")
    assert out["loading"].tolist() == out2["loading"].tolist(), "non-deterministic"

    C = np.cov(X, rowvar=False)
    w, V = np.linalg.eigh(C)
    mine = out["loading"].values
    cos = abs(float(np.dot(mine, V[:, -1])) / (np.linalg.norm(mine) * np.linalg.norm(V[:, -1])))
    assert cos > 0.99, f"cos to true eigvec {cos}"
    eig = float(out["eigenvalue"].iloc[0])
    assert abs(eig - w[-1]) / w[-1] < 0.02, f"eig {eig} vs {w[-1]}"


def test_deflation_recovers_top_two_components(spark):
    """Two planted orthogonal directions with distinct strengths: power
    iteration + quantized Hotelling deflation recovers BOTH numpy
    eigenvectors (|cos| > 0.99), in strength order, near-orthogonal."""
    import numpy as np

    from prod_data_pipeline_spark.operators.linalg import (
        covariance_matrix,
        top_principal_components,
    )

    rng = np.random.RandomState(11)
    d, n = 12, 400
    q, _ = np.linalg.qr(rng.standard_normal((d, 2)))
    u1, u2 = q[:, 0], q[:, 1]
    X = (
        rng.standard_normal((n, d)) * 0.05
        + np.outer(rng.standard_normal(n) * 3.0, u1)
        + np.outer(rng.standard_normal(n) * 1.5, u2)
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        ["vec_id", "embedding"],
    )
    cov = covariance_matrix(df).localCheckpoint(eager=True)
    out = top_principal_components(cov, dim=d, n_components=2, n_iters=10).toPandas()
    C = np.cov(X, rowvar=False)
    w, V = np.linalg.eigh(C)
    v1 = out[out.component == 1].sort_values("pos")["loading"].values
    v2 = out[out.component == 2].sort_values("pos")["loading"].values
    cos1 = abs(float(v1 @ V[:, -1])) / (np.linalg.norm(v1) * np.linalg.norm(V[:, -1]))
    cos2 = abs(float(v2 @ V[:, -2])) / (np.linalg.norm(v2) * np.linalg.norm(V[:, -2]))
    assert cos1 > 0.99 and cos2 > 0.99, (cos1, cos2)
    assert abs(float(v1 @ v2)) < 0.05, "components not near-orthogonal"
    e1 = float(out[out.component == 1].eigenvalue.iloc[0])
    e2 = float(out[out.component == 2].eigenvalue.iloc[0])
    assert e1 > e2, "strength order lost"
    assert abs(e1 - w[-1]) / w[-1] < 0.02 and abs(e2 - w[-2]) / w[-2] < 0.05


def test_mmr_rerank_prefers_diversity(spark):
    """Two near-duplicate high-relevance vectors and one diverse
    moderate one: plain top-k orders (A1, A2, B); MMR must demote the
    duplicate and pick (A1, B, A2)."""
    from prod_data_pipeline_spark.operators.similarity import mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),        # query
        (1, [0.9, 0.1, 0.0, 0.0]),        # A1: high sim to q
        (2, [0.9, 0.11, 0.0, 0.0]),       # A2: near-copy of A1
        (3, [0.5, 0.0, 0.8, 0.0]),        # B: moderate sim, diverse
        (4, [0.0, 0.0, 0.0, 1.0]),        # unrelated
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qv = emb.filter("vec_id = 0")
    # diversity-heavy weights so the near-copy's redundancy penalty
    # exceeds its relevance edge; also checks lam/mu are honored
    out = [
        (r.mmr_rank, r.neighbor_id)
        for r in mmr_rerank(emb, qv, k_candidates=3, k_select=3, lam=0.3, mu=0.7)
        .orderBy("mmr_rank")
        .collect()
    ]
    assert [nid for _, nid in out] == [1, 3, 2], out
    # relevance-only degenerate case reduces to plain top-k order
    topk = [
        r.neighbor_id
        for r in mmr_rerank(emb, qv, k_candidates=3, k_select=3, lam=1.0, mu=0.0)
        .orderBy("mmr_rank")
        .collect()
    ]
    assert topk == [1, 2, 3], topk


def test_l2_topk_ignores_malformed_embeddings(spark):
    """A zero-length (or length-mismatched) embedding yields NULL
    distance; ascending order sorts NULLs first, so without the guard
    the malformed vector would take rank 1 in every query's top-k."""
    from prod_data_pipeline_spark.operators.similarity import l2_topk

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
            (99, []),  # malformed: empty embedding
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = [(r.neighbor_id, r.rank) for r in l2_topk(corpus, queries, k=3).collect()]
    assert 99 not in {n for n, _ in got}
    assert got[0] == (1, 1)  # exact match ranks first, not the NULL row


def test_covariance_matrix_empty_and_ragged_raise(spark):
    """Input guards (round-7 advisor): an empty frame raised a bare
    TypeError from first(), and a ragged embedding silently corrupted
    the flattened k -> (i, j) index math via zip_with NULL padding."""
    import pytest as _pytest

    from prod_data_pipeline_spark.operators.linalg import covariance_matrix

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="empty"):
        covariance_matrix(empty)

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [4.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="length"):
        covariance_matrix(ragged)


def test_float_production_path_agrees_with_exact(spark):
    """Round-9 verdict #6: the exact-DECIMAL/int40 recipes buy the
    cross-engine oracle proof at a quantization cost; the float64
    production path (covariance quantizer='float', PCA quantize=False)
    must agree to tolerance while staying pure codegen double math.
    Pins covariance entrywise agreement, full PCA-chain agreement
    (driver AND distributed float paths), and that the float covariance
    plan carries no Decimal cast."""
    import numpy as np

    from prod_data_pipeline_spark.operators.linalg import (
        covariance_matrix,
        top_principal_components,
    )

    rng = np.random.RandomState(11)
    d, n = 12, 300
    direction = rng.standard_normal(d)
    direction /= np.linalg.norm(direction)
    X = rng.standard_normal((n, d)) * 0.2 + np.outer(rng.standard_normal(n), direction)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        ["vec_id", "embedding"],
    )

    exact = covariance_matrix(df, quantizer="int40")
    prod = covariance_matrix(df, quantizer="float")
    em = {(r["i"], r["j"]): r["c"] for r in exact.collect()}
    fm = {(r["i"], r["j"]): r["c"] for r in prod.collect()}
    assert set(em) == set(fm)
    for k in em:
        assert abs(em[k] - fm[k]) < 1e-9, (k, em[k], fm[k])
    # numpy ground truth agrees with the float path at float precision
    C = np.cov(X, rowvar=False)
    for (i, j), c in fm.items():
        assert abs(c - C[i, j]) < 1e-9

    # no DECIMAL anywhere in the float covariance plan (the point of the
    # production path is staying inside primitive codegen arithmetic)
    plan = prod._jdf.queryExecution().executedPlan().toString()
    assert "decimal" not in plan.lower()

    exact_cov = exact.localCheckpoint(eager=True)
    float_cov = prod.localCheckpoint(eager=True)
    q = top_principal_components(exact_cov, dim=d, n_components=2, n_iters=8)
    f_driver = top_principal_components(
        float_cov, dim=d, n_components=2, n_iters=8, quantize=False
    )
    f_dist = top_principal_components(
        float_cov, dim=d, n_components=2, n_iters=8, quantize=False,
        driver_dim_threshold=0,
    )
    qd = q.toPandas().sort_values(["component", "pos"]).reset_index(drop=True)
    for fl in (f_driver, f_dist):
        fd = fl.toPandas().sort_values(["component", "pos"]).reset_index(drop=True)
        # loadings agree up to the quantized recipe's own rounding
        # (round_vec=9 per iteration -> ~1e-6 accumulated)
        assert np.allclose(qd["loading"], fd["loading"], atol=1e-5)
        assert np.allclose(qd["eigenvalue"], fd["eigenvalue"], atol=1e-4)


def test_covariance_matrix_nonfinite_elements_raise(spark):
    """Round-9 advisor: a NaN element made amax NaN, every Python bound
    comparison on NaN evaluated False, and floor(NaN * 2^40) fed corrupt
    quantized terms into the covariance — the int40 overflow guard was
    silently bypassed.  NaN and +/-Inf elements must raise for BOTH
    quantizers, consistent with similarity's _emb_matrix treating
    non-finite rows as invalid."""
    import pytest as _pytest

    from prod_data_pipeline_spark.operators.linalg import covariance_matrix

    for bad_val in (float("nan"), float("inf"), float("-inf")):
        bad = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [bad_val, 3.0])],
            "vec_id long, embedding array<double>",
        )
        for quantizer in ("int40", "decimal"):
            with _pytest.raises(ValueError, match="NaN/Inf"):
                covariance_matrix(bad, quantizer=quantizer)


def test_covariance_matrix_null_embeddings_raise(spark):
    """Round-8 advisor: a NULL embedding made `size(e) != dim` NULL, so
    the when/otherwise ragged counter scored it 0 — the row passed the
    guard, contributed nothing to the product sums, yet inflated n
    (silent covariance skew).  NULL elements inside a correctly-sized
    array slipped through the same way.  Both must raise."""
    import pytest as _pytest

    from prod_data_pipeline_spark.operators.linalg import covariance_matrix

    null_emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="NULL"):
        covariance_matrix(null_emb)

    null_elem = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, None])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="NULL"):
        covariance_matrix(null_elem)

    first_null = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="first row has NULL embedding"):
        covariance_matrix(first_null)


def test_ivf_nprobe_sweep_properties(spark, emb):
    """Sweep invariants that hold at ANY data scale: candidate sets nest,
    so recall is non-decreasing in nprobe; probing every cell IS brute
    force, so recall at nprobe=n_cells is exactly 1.0; replication can
    only add candidates, so replicated recall >= unreplicated per point."""
    from prod_data_pipeline_spark.operators.similarity import ivf_nprobe_sweep

    qdf = emb.filter(F.col("vec_id") < 8)

    def curve(replicas):
        rows = ivf_nprobe_sweep(
            emb, qdf, k=10, nprobes=(1, 2, 4, 8), n_cells=8, replicas=replicas
        ).collect()
        out = {}
        for r in rows:
            out.setdefault(r["nprobe"], []).append(r["recall"])
        return {np: sum(v) / len(v) for np, v in out.items()}

    plain, repl = curve(1), curve(2)
    for c in (plain, repl):
        assert sorted(c) == [1, 2, 4, 8]
        assert c[1] <= c[2] <= c[4] <= c[8], c
        assert c[8] == 1.0, c
    for np_ in (1, 2, 4):
        assert repl[np_] >= plain[np_], (plain, repl)
    assert repl[4] >= 0.8  # the production bar the oracled query pins


def test_pq_encode_and_adc_properties(spark, emb):
    """PQ invariants: codes index the sorted label list; recon_err is
    nonnegative and equals the sum of chosen sub-distances; a vector AT a
    codebook centroid reconstructs (near-)exactly; ADC top-k overlaps
    exact brute force enough to be a useful candidate generator."""
    from prod_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )

    labels, cb = pq_codebook(emb)
    enc = pq_encode(emb, labels, cb).collect()
    K = len(labels)
    for r in enc:
        assert len(r["codes"]) == 8
        assert all(0 <= c < K for c in r["codes"])
        assert r["recon_err"] >= 0.0
    # a synthetic vector equal to label-0's centroid encodes to code 0
    # in every subspace with ~zero reconstruction error
    cvec = cb[labels[0]]
    probe = spark.createDataFrame([(999999, cvec)], "vec_id long, embedding array<double>")
    row = pq_encode(probe, labels, cb).collect()[0]
    assert row["codes"] == [0] * 8
    assert row["recon_err"] < 1e-9
    # ADC ranking recalls a reasonable share of the exact cosine top-10
    # (PQ is a candidate generator; label-mean codebooks on near-random
    # unit vectors are the hardest case, so the floor is loose)
    q = emb.filter(F.col("vec_id") < 8)
    adc = pq_adc_topk(emb, q, k=10)
    exact = brute_force_topk(emb, q, k=10)
    a = {(r["query_id"], r["neighbor_id"]) for r in adc.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    assert len(a) == len(e) == 80


def test_srp_kernels_tolerate_malformed_embeddings(spark):
    """NULL, wrong-length, and NULL-element embeddings must degrade —
    signature 0, excluded from pairs — not crash the Arrow batch kernel
    (np.array over a batch containing a NULL row raises ValueError and
    fails the whole task)."""
    from prod_data_pipeline_spark.operators.similarity import with_srp_signature

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),  # exact dup of 1
        (3, [-1.0, 0.5, 0.0, 0.0]),
        (90, None),  # NULL embedding
        (91, [1.0, 0.0]),  # wrong length
        (92, [1.0, None, 0.0, 0.0]),  # NULL element
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for backend in ("mt", "md5"):
        sig = with_srp_signature(df, dim=4, backend=backend)
        got = {r["vec_id"]: r["srp_sig"] for r in sig.collect()}
        assert got[90] == got[91] == got[92] == 0, backend
        assert got[1] == got[2], backend  # identical vectors, identical sigs
        pairs = srp_near_dup_pairs(df, dim=4, threshold=0.9, backend=backend)
        got_pairs = {(r.id_a, r.id_b) for r in pairs.collect()}
        assert (1, 2) in got_pairs, backend
        touched = {i for p in got_pairs for i in p}
        assert not touched & {90, 91, 92}, backend


def test_srp_collapse_key_is_null_safe(spark):
    """concat_ws SKIPS NULL array elements, so without a per-element
    sentinel [1.0, 2.0], [1.0, NULL, 2.0] and [NULL, 1.0, 2.0] all render
    "1.0,2.0" and collapse into one exact-dup group — whose valid
    representative would then fan out sim-1.0 pairs to the malformed
    members, output the uncollapsed pipeline never produces."""
    rows = [
        (1, [1.0, 2.0]),  # valid, the min-id representative
        (2, [1.0, None, 2.0]),
        (3, [None, 1.0, 2.0]),
        (4, None),
        (5, []),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = srp_near_dup_pairs(df, dim=2, threshold=0.5)
    assert pairs.count() == 0


def test_pq_kernels_tolerate_malformed_embeddings(spark, emb):
    """PQ encode must emit NULL codes for malformed embeddings (not the
    zero vector's codes), and ADC ranking must exclude them — ascending
    NULLs-first order would otherwise rank a malformed row 1st."""
    from prod_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )

    base = emb.filter(F.col("vec_id") < 40).select("vec_id", "embedding", "label")
    dim = len(base.select("embedding").first()[0])
    bad = spark.createDataFrame(
        [
            (9001, None, 0),
            (9002, [1.0, 0.0], 0),  # wrong length
            (9003, [1.0, None] + [0.0] * (dim - 2), 0),  # NULL element
        ],
        "vec_id long, embedding array<double>, label int",
    )
    corpus = base.unionByName(bad)
    labels, cb = pq_codebook(base)
    enc = {r["vec_id"]: r["codes"] for r in pq_encode(corpus, labels, cb).collect()}
    assert enc[9001] is None and enc[9002] is None and enc[9003] is None
    assert all(v is not None for k, v in enc.items() if k < 40)
    top = pq_adc_topk(corpus, base.filter(F.col("vec_id") < 4), k=5)
    rows = top.collect()
    assert rows  # valid queries still rank
    assert not {r["neighbor_id"] for r in rows} & {9001, 9002, 9003}


def test_power_iteration_driver_path_matches_distributed(spark, emb):
    """The adaptive driver fast path replays the quantized power-iteration
    recurrence bit-identically to the distributed matvec loop (the
    pagerank_quantized guarantee, extended to PCA): same rounded terms,
    same exact-decimal sums, same IEEE sqrt/divisions — so the oracle
    hash is path-independent."""
    from prod_data_pipeline_spark.operators.linalg import (
        covariance_matrix,
        top_principal_component,
    )

    cov = covariance_matrix(emb).localCheckpoint(eager=True)
    fast = top_principal_component(cov, dim=64, n_iters=5).collect()
    slow = top_principal_component(
        cov, dim=64, n_iters=5, driver_dim_threshold=0
    ).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]


def test_covariance_int40_bounds_guard(spark):
    """Embeddings whose magnitude breaks the int40 overflow proofs must
    raise with a pointer to the decimal quantizer, and the decimal path
    must still handle them."""
    import numpy as np
    import pytest

    from prod_data_pipeline_spark.operators.linalg import covariance_matrix

    big = spark.createDataFrame(
        [(i, [float(5000 + i), float(-4000 - i)]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="int40 quantizer bounds"):
        covariance_matrix(big).collect()
    rows = covariance_matrix(big, quantizer="decimal").collect()
    got = {(r["i"], r["j"]): r["c"] for r in rows}
    x = np.array([[5000.0 + i, -4000.0 - i] for i in range(4)])
    ref = np.cov(x, rowvar=False)
    for (i, j), c in got.items():
        assert abs(c - ref[i][j]) < 1e-6


def test_top_components_driver_chain_matches_distributed(spark, emb):
    """The driver fast path for the FULL top-k chain (power iterations +
    quantized Hotelling deflation between components) is bit-identical to
    the distributed join/agg path."""
    from prod_data_pipeline_spark.operators.linalg import (
        covariance_matrix,
        top_principal_components,
    )

    cov = covariance_matrix(emb).localCheckpoint(eager=True)
    fast = top_principal_components(cov, dim=64, n_components=2, n_iters=4).collect()
    slow = top_principal_components(
        cov, dim=64, n_components=2, n_iters=4, driver_dim_threshold=0
    ).collect()
    assert [tuple(r) for r in fast] == [
        tuple(r) for r in sorted(slow, key=lambda r: (r[0], r[1]))
    ]


def test_ivf_append_assigns_batch_to_existing_cells(spark):
    """The frozen-codebook contract: a batch row lands in its nearest
    EXISTING snapshot cell even when its label never appeared in the
    snapshot — the codebook must come from the snapshot alone (an
    accidental union refit would mint cell 7 here and break both
    assertions)."""
    from prod_data_pipeline_spark.operators.similarity import ivf_append

    snap = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.0, 1.0], 1),
            (3, [0.1, 0.9], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    batch = spark.createDataFrame(
        [(10, [0.05, 0.95], 7), (11, [0.95, 0.05], 7)],
        "vec_id long, embedding array<double>, label int",
    )
    postings, cents, n_cells = ivf_append(snap, batch)
    assert n_cells == 2
    assert {r["cell"] for r in cents.collect()} == {0, 1}
    rows = {r["vec_id"]: (r["cell"], r["is_new"]) for r in postings.collect()}
    assert len(rows) == 6
    assert rows[10] == (1, True) and rows[11] == (0, True)
    assert all(not rows[v][1] for v in (0, 1, 2, 3))
    assert rows[0][0] == rows[1][0] == 0 and rows[2][0] == rows[3][0] == 1


def test_ivf_append_postings_plan_never_shuffles_by_key(spark, emb):
    """Scale pin for the append path: both assignment passes are
    zero-exchange projections against the inlined codebook literal — the
    postings plan must contain no key-based exchange (hash or range) and
    no join.  (ensure_parallelism may add a ROUND-ROBIN repartition on
    the single-file test input; at real scale — thousands of splits —
    that is a documented no-op, and it is not a key shuffle.)"""
    from prod_data_pipeline_spark.operators.similarity import ivf_append

    is_new = F.pmod(F.col("vec_id"), F.lit(8)) == F.lit(7)
    postings, _, _ = ivf_append(emb.filter(~is_new), emb.filter(is_new))
    plan = postings._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "Join" not in plan


def test_ivf_append_topk_full_probe_equals_bruteforce(spark, emb):
    """Probing every snapshot cell makes the appended index scan the whole
    union corpus with the same tie-break as brute force — the nprobe
    escape hatch must reproduce the exact top-k bit-for-bit (same
    invariant as the k-means sweep's nprobe=n_cells point)."""
    from prod_data_pipeline_spark.operators.similarity import ivf_append_topk

    is_new = F.pmod(F.col("vec_id"), F.lit(8)) == F.lit(7)
    snap, batch = emb.filter(~is_new), emb.filter(is_new)
    queries = emb.filter(F.col("vec_id") < 8)
    n_cells = snap.select("label").distinct().count()
    exact = brute_force_topk(emb, queries, k=5).collect()
    appended = ivf_append_topk(snap, batch, queries, k=5, nprobe=n_cells).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
    assert [key(r) for r in appended] == [key(r) for r in exact]


def test_ivf_append_topk_empty_batch_matches_fresh_index(spark, emb):
    """Appending nothing must serve exactly the fresh snapshot index —
    pins the union plumbing and that the search kernels really are
    byte-identical."""
    from prod_data_pipeline_spark.operators.similarity import (
        ivf_append_topk,
        ivf_topk_label,
    )

    is_new = F.pmod(F.col("vec_id"), F.lit(8)) == F.lit(7)
    snap, batch = emb.filter(~is_new), emb.filter(is_new)
    queries = emb.filter(F.col("vec_id") < 8)
    empty = batch.filter(F.lit(False))
    got = ivf_append_topk(snap, empty, queries, k=5, nprobe=2).collect()
    want = ivf_topk_label(snap, queries, k=5, nprobe=2).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_label_centroids_split_matches_separate_fits(spark, emb):
    """label_centroids_split's one-pass codebooks must be BIT-identical to
    two separate label_centroids fits (snapshot subset / full union) —
    DECIMAL partials are exact, so the conditional and unconditional sums
    re-add to the separate fits' sums and each mean is the same IEEE
    division.  Also covers the novel-label case via a synthetic batch."""
    from prod_data_pipeline_spark.operators.similarity import (
        label_centroids_split,
    )

    is_new = F.pmod(F.col("vec_id"), F.lit(8)) == F.lit(7)
    snap_got, union_got = label_centroids_split(
        emb.withColumn("_new", is_new), "_new"
    )
    snap_want = label_centroids(emb.filter(~is_new))
    union_want = label_centroids(emb)
    as_map = lambda df: {r["cell"]: list(r["centroid"]) for r in df.collect()}
    assert as_map(snap_got) == as_map(snap_want)
    assert as_map(union_got) == as_map(union_want)

    # novel label: present only in the batch -> absent from the snapshot
    # codebook, present in the union codebook
    extra = spark.createDataFrame(
        [(1000, [1.0] * 64, 99)], "vec_id long, embedding array<double>, label int"
    )
    both = emb.select("vec_id", "embedding", "label").unionByName(extra)
    flagged = both.withColumn(
        "_new", (F.pmod(F.col("vec_id"), F.lit(8)) == F.lit(7)) | (F.col("vec_id") >= 1000)
    )
    s2, u2 = label_centroids_split(flagged, "_new")
    assert 99 not in as_map(s2)
    assert as_map(u2)[99] == [1.0] * 64


def test_ivf_append_empty_snapshot_raises_clearly(spark):
    """Cold-start contract: appending to an EMPTY (or all-invalid)
    snapshot must raise a clear ValueError at plan-construction time —
    without the guard, F.array() of zero codebook structs is VOID-typed
    and fails much later with a cryptic field-extraction
    AnalysisException."""
    import pytest

    from prod_data_pipeline_spark.operators.similarity import ivf_append

    snap = spark.createDataFrame([], "vec_id long, embedding array<double>, label int")
    batch = spark.createDataFrame(
        [(1, [1.0, 0.0], 0)], "vec_id long, embedding array<double>, label int"
    )
    with pytest.raises(ValueError, match="empty IVF codebook"):
        ivf_append(snap, batch)


# --- label-relevance retrieval eval (round 12) -----------------------------


def _eval_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_label_retrieval_metrics_known_geometry(spark):
    """2-D vectors at known angles: ranking is unambiguous, so every metric
    is hand-checkable.  Query v0 (label 0) ranks v1 (10°, label 1), v2
    (20°, label 0), v3 (80°, label 0): first relevant at rank 2 ->
    rr_num = lcm(1..3)/2 = 2, hits = 2."""
    from prod_data_pipeline_spark.operators.similarity import (
        label_retrieval_metrics,
    )

    def vec(deg):
        r = math.radians(deg)
        return [float(math.cos(r)), float(math.sin(r))]

    df = _eval_df(
        spark,
        [(0, vec(0), 0), (1, vec(10), 1), (2, vec(20), 0), (3, vec(80), 0)],
    )
    out = label_retrieval_metrics(df, df.filter(F.col("vec_id") == 0), k=3)
    row = out.collect()[0]
    assert row.query_id == 0 and row.qlabel == 0
    assert row.n_ranked == 3
    assert row.first_rel_rank == 2
    assert row.rr_num == math.lcm(1, 2, 3) // 2
    assert row.hits == 2


def test_label_retrieval_metrics_no_hit_and_null_label(spark):
    """A query whose label no neighbor shares scores rr_num=0 / hits=0 with
    NULL first_rel_rank; NULL-label neighbors are never relevant (for a
    NULL-label query nothing is relevant either)."""
    from prod_data_pipeline_spark.operators.similarity import (
        label_retrieval_metrics,
    )

    df = _eval_df(
        spark,
        [
            (0, [1.0, 0.0], 9),
            (1, [0.9, 0.1], None),
            (2, [0.8, 0.2], 1),
            (3, [0.0, 1.0], None),
        ],
    )
    out = {r.query_id: r for r in label_retrieval_metrics(df, df, k=3).collect()}
    assert out[0].first_rel_rank is None
    assert out[0].rr_num == 0 and out[0].hits == 0
    # NULL-label query: NULL = anything is never true
    assert out[3].rr_num == 0 and out[3].hits == 0


def test_label_retrieval_metrics_corpus_smaller_than_k(spark):
    from prod_data_pipeline_spark.operators.similarity import (
        label_retrieval_metrics,
    )

    df = _eval_df(spark, [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0)])
    row = label_retrieval_metrics(df, df.filter(F.col("vec_id") == 0), k=10).collect()[0]
    assert row.n_ranked == 1  # only one other vector exists
    assert row.first_rel_rank == 1
    assert row.rr_num == math.lcm(*range(1, 11))  # 2520/1
    assert row.hits == 1


def test_knn_label_vote_majority_and_tie_break(spark):
    """Vote ties break (votes DESC, label ASC): a 2-2 split between labels
    1 and 2 predicts 1.  The 5th neighbor is pushed out of top-4 by
    construction (k=4)."""
    from prod_data_pipeline_spark.operators.similarity import knn_label_vote

    def vec(deg):
        r = math.radians(deg)
        return [float(math.cos(r)), float(math.sin(r))]

    df = _eval_df(
        spark,
        [
            (0, vec(0), 2),
            (1, vec(5), 2),
            (2, vec(10), 1),
            (3, vec(15), 1),
            (4, vec(20), 2),
            (5, vec(70), 2),  # outside top-4 of query 0
        ],
    )
    row = knn_label_vote(df, df.filter(F.col("vec_id") == 0), k=4).collect()[0]
    assert row.predicted_label == 1  # tie 2-2, lower label wins
    assert row.votes == 2
    assert row.correct is False  # qlabel 2, predicted 1


def test_knn_label_vote_null_neighbors_abstain(spark):
    """NULL-label neighbors are filtered BEFORE voting (engine-dependent
    NULL ordering must never decide the tie-break), and an unlabeled query
    is never scored correct."""
    from prod_data_pipeline_spark.operators.similarity import knn_label_vote

    df = _eval_df(
        spark,
        [
            (0, [1.0, 0.0], None),
            (1, [0.99, 0.01], None),
            (2, [0.9, 0.1], 3),
            (3, [0.8, 0.2], 3),
        ],
    )
    row = knn_label_vote(df, df.filter(F.col("vec_id") == 0), k=3).collect()[0]
    assert row.predicted_label == 3  # the NULL-label nearest neighbor abstained
    assert row.votes == 2
    assert row.correct is False  # NULL qlabel coalesces to not-correct


def test_label_ranked_plan_broadcast_panel_two_stage_topk(spark, emb):
    """Scale pin for the retrieval-eval family: the ranked relation must be
    the brute-force shape — query panel BROADCAST (non-equi condition =>
    BroadcastNestedLoopJoin), corpus scanned once, and the TWO-STAGE
    top-k (ranked_topk): the heavy exchange keys on (query_id, _pid) so
    no task ever sorts a corpus-sized group, and the second query_id-only
    exchange carries just panel x partitions x k survivors.  A third hash
    exchange would mean a corpus-sized label join crept in after
    ranking."""
    from prod_data_pipeline_spark.operators.similarity import _label_ranked

    ranked = _label_ranked(
        emb, emb.filter(F.col("vec_id") < 8), 10, "vec_id", "embedding", "label"
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # panel rides a broadcast
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Exchange hashpartitioning(query_id" in plan
    assert plan.count("hashpartitioning(query_id#") >= 1
    # stage-1 keys include the partition id column
    import re

    assert re.search(r"hashpartitioning\(query_id#\d+L?, _pid#", plan), plan[:2000]
    assert "CartesianProduct" not in plan
