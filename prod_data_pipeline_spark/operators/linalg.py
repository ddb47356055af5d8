"""Distributed linear algebra over embedding columns, engine-reproducible.

The covariance matrix is computed as relational aggregation (dimension-pair
keys, exact DECIMAL sums — order-independent at any parallelism), and the
top principal component comes from power iteration expressed as relational
matvec (join + agg per round) with the same per-iteration round-then-
DECIMAL quantization that made PageRank exact-hash-oracle-able
(operators/graph.py::pagerank_quantized): every float that enters a sum is
first rounded to a fixed digit budget, so the recurrence is bit-identical
on any engine that replays it.

Provenance: extension surface beyond the reference (north-star scope —
/root/reference has no linear algebra); the quantization recipe is this
repo's own (see graph.py), residual HALF_UP-vs-half-away tie caveat
documented there applies here too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prod_data_pipeline_spark.functions.vector import to_double_array
from prod_data_pipeline_spark.session import truncate_lineage


def covariance_matrix(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_term: int = 12,
) -> DataFrame:
    """Exact sample covariance as a (i, j, c) relation.

    posexplode -> per-dim exact means (DECIMAL sum, ONE double division)
    -> centered values -> dimension-pair products -> DECIMAL-summed per
    (i, j) -> /(n-1).  The only corpus-sized shuffle carries (i, j)
    partials (map-side combined to d^2 rows per task); the self-join on
    the row id is co-partitioned.  Products are rounded to `round_term`
    digits before the exact sum — the quantization that makes the result
    independent of partition order AND replayable by the SQL oracle.

    At 100 TB prefer d <= a few hundred (d^2 pair terms per row); above
    that, block the dimension range and union the blocks.
    """
    x = df.select(to_double_array(F.col(emb_col)).alias("e"))
    first = x.first()
    if first is None:
        raise ValueError("covariance_matrix: input frame is empty")
    if first["e"] is None:
        raise ValueError("covariance_matrix: first row has NULL embedding")
    dim = len(first["e"])
    # Uniform-width guard (round-7 advisor): a ragged/shorter embedding
    # would zip_with-pad with NULL and corrupt the flattened k -> (i, j)
    # index math, so raggedness is an error, not a silent filter.  The
    # check rides the count pass — no extra scan.  NULL embeddings and
    # NULL elements count as ragged too (round-8 advisor): for a NULL
    # array `size(e) != dim` is NULL, so the old when/otherwise counted 0
    # and the row passed the guard while still inflating n — exactly the
    # silent skew the guard exists to prevent.
    bad = (
        F.col("e").isNull()
        | (F.size("e") != dim)
        | F.exists("e", lambda xi: xi.isNull())
    )
    stats = x.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("ragged"),
    ).first()
    n = stats["n"]
    if stats["ragged"]:
        raise ValueError(
            f"covariance_matrix: {stats['ragged']} rows have a NULL "
            f"embedding, a NULL element, or length != {dim}; uniform "
            f"non-null width is required"
        )
    # Per-dim means: DECIMAL sum + one double division, exactly the
    # expression the oracle replays.  Collected to the driver (d doubles —
    # parameter-bounded, like MMR's candidate lists) and embedded as an
    # array literal so centering is a zip_with instead of a join.
    sums = (
        x.select(F.posexplode("e").alias("i", "xi"))
        .groupBy("i")
        .agg(F.sum(F.col("xi").cast("decimal(38,12)")).cast("double").alias("s"))
        .collect()
    )
    mu = [0.0] * dim
    for r in sums:
        mu[r["i"]] = r["s"] / float(n)
    mu_arr = F.array(*[F.lit(m) for m in mu])
    # Outer product ARRAY-SIDE: center once into a bound attribute, then
    # d×d products per row via nested transform over that attribute —
    # reading a materialized array column per element is a field access,
    # not an expression re-evaluation (the shingles O(L²) lesson).  This
    # replaces the previous posexplode → self-join-on-row-id → 26M joined
    # rows plan: no join, no row-id exchange — the product stream
    # generates in-pipeline and partial-aggregates to d² rows per task
    # before the ONLY exchange (measured 20.5 s -> ~13 s warm at sf0.1;
    # the remaining wall is the n·d² round+DECIMAL quantization ops
    # themselves — one BigDecimal per product is the price of the
    # exact-oracle recipe, not a plan defect).  Products round to
    # `round_term` before the exact DECIMAL sum — the same terms in the
    # same quantization, so the result (and the SQL oracle) is
    # unchanged.
    centered = x.select(
        F.zip_with(F.col("e"), mu_arr, lambda xi, m: xi - m).alias("c")
    )
    # Symmetry halves the quantization work (round 9): only the upper
    # triangle j >= i is generated — d(d+1)/2 products per row instead of
    # d² — and the strict-lower entries are mirrored AFTER the aggregation
    # (d² output rows either way, but the n·d² rounding + DECIMAL stream
    # is the wall).  Bit-identical to the full pass: ci*cj and cj*ci are
    # the same IEEE product, so the mirrored entry sums the exact same
    # quantized terms the full pass would — the oracle is unchanged.
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    prods = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.sequence(i, F.lit(dim - 1)),
                lambda j: F.struct(
                    (i * dim + j).cast("int").alias("k"),
                    F.round(
                        F.element_at(F.col("c"), i + 1)
                        * F.element_at(F.col("c"), j + 1),
                        round_term,
                    ).alias("p"),
                ),
            ),
        )
    )
    upper = (
        centered.select(F.explode(prods).alias("t"))
        .select(F.col("t.k").alias("k"), F.col("t.p").alias("p"))
        .groupBy("k")
        .agg(
            (
                F.sum(F.col("p").cast("decimal(38,12)")).cast("double")
                / F.lit(float(n - 1))
            ).alias("c")
        )
        .select(
            (F.col("k") / dim).cast("int").alias("i"),
            F.pmod(F.col("k"), F.lit(dim)).cast("int").alias("j"),
            "c",
        )
    )
    lower = upper.filter(F.col("i") != F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "c"
    )
    return upper.unionByName(lower)


def top_principal_component(
    cov: DataFrame,
    dim: int,
    n_iters: int = 6,
    round_term: int = 12,
    round_vec: int = 9,
) -> DataFrame:
    """Top eigenvector of a (i, j, c) covariance relation by power
    iteration as relational matvec: u = C v is a join on j + an exact
    DECIMAL sum per i; normalization divides by the DECIMAL-summed norm.

    Start vector is 1/sqrt(dim) in every coordinate — exact when dim is a
    power of two (1/8 for d=64), and fully deterministic regardless.
    Each round quantizes: terms rounded to `round_term` before summing,
    the normalized vector rounded to `round_vec` — so iteration t+1 sees
    bit-identical inputs on every engine and the final loadings
    hash-compare exactly.  Returns (pos, loading, eigenvalue), where the
    eigenvalue is the final pre-normalization norm (the Rayleigh estimate
    under v'v = 1).

    Scale: the matvec relation is d^2 rows — this is for the SMALL side
    (dimension space), computed once after the corpus-sized covariance
    pass; d^2 at d=1024 is a 1M-row join, trivial for any cluster.
    """
    spark = cov.sparkSession
    # Materialize the covariance ONCE (d² rows — trivial): every
    # iteration's matvec joins `cov`, and an unmaterialized input would
    # replay the corpus-sized covariance pipeline per round.  (At sf0.1
    # the measured win is modest — 21 s -> 19 s — because Spark was
    # already reusing the covariance's shuffle files across rounds; the
    # checkpoint makes the reuse a guarantee instead of a scheduler
    # accident, which is what matters on a real cluster where shuffle
    # files expire.)  The residual wall is the covariance pass itself:
    # n×d(d+1)/2 quantized products is the price of the exact-oracle
    # relational design, paid once.
    cov = cov.transform(truncate_lineage, eager=True)
    v0 = 1.0 / float(dim) ** 0.5
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("j"), F.lit(v0).alias("v")
    )
    eig = None
    for it in range(n_iters):
        u = (
            cov.join(v, "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.round(F.col("c") * F.col("v"), round_term).cast("decimal(38,12)")
                )
                .cast("double")
                .alias("u")
            )
        )
        norm = u.agg(
            F.sqrt(
                F.sum(F.round(F.col("u") * F.col("u"), round_term).cast("decimal(38,12)")).cast(
                    "double"
                )
            ).alias("nrm")
        )
        vn = (
            u.join(F.broadcast(norm))
            .select(
                F.col("i").alias("j"),
                F.round(F.col("u") / F.col("nrm"), round_vec).alias("v"),
                F.col("nrm"),
            )
        )
        # Truncate lineage every FOURTH round (and on the last): an eager
        # per-round checkpoint forces one full job per iteration — 16
        # materializations of a d-row relation, pure scheduler overhead.
        # Four fused rounds keep the plan depth trivial for d² data while
        # quartering the job count; values are identical either way (the
        # quantized recurrence doesn't care where lineage is cut).
        if it % 4 == 3 or it == n_iters - 1:
            vn = vn.transform(truncate_lineage, eager=True)
        v = vn.select("j", "v")
        eig = vn.select("nrm").limit(1)
    return (
        v.join(F.broadcast(eig))
        .select(
            F.col("j").alias("pos"),
            F.col("v").alias("loading"),
            F.round(F.col("nrm"), 6).alias("eigenvalue"),
        )
        .orderBy("pos")
    )


def deflate(cov: DataFrame, component: DataFrame, round_term: int = 12) -> DataFrame:
    """Hotelling deflation as a relation: C' = C - λ·v·vᵀ, with the rank-1
    term quantized to `round_term` digits so the deflated matrix — and
    every subsequent iteration on it — stays engine-reproducible.
    `component` is top_principal_component's output (pos, loading,
    eigenvalue); its 6-digit eigenvalue rounding is part of the recipe
    (the oracle replays the same rounded λ)."""
    vi = component.select(
        F.col("pos").alias("i"),
        F.col("loading").alias("vi"),
        F.col("eigenvalue").alias("lam"),
    )
    vj = component.select(F.col("pos").alias("j"), F.col("loading").alias("vj"))
    return (
        cov.join(F.broadcast(vi), "i")
        .join(F.broadcast(vj), "j")
        .select(
            "i",
            "j",
            (
                F.col("c")
                - F.round(F.col("lam") * F.col("vi") * F.col("vj"), round_term)
            ).alias("c"),
        )
    )


def top_principal_components(
    cov: DataFrame,
    dim: int,
    n_components: int = 2,
    n_iters: int = 6,
    round_term: int = 12,
    round_vec: int = 9,
) -> DataFrame:
    """Top-k eigenpairs by power iteration + Hotelling deflation, all
    relational and all quantized: component m is power-iterated on the
    (m-1)-times-deflated covariance.  Returns (component, pos, loading,
    eigenvalue) with component 1-indexed.  Same determinism guarantee as
    the single-component path — deflation only adds one quantized rank-1
    join per extracted component."""
    out = None
    cur = cov
    for m in range(1, n_components + 1):
        comp = top_principal_component(
            cur, dim, n_iters=n_iters, round_term=round_term, round_vec=round_vec
        ).transform(truncate_lineage, eager=True)
        tagged = comp.select(
            F.lit(m).alias("component"), "pos", "loading", "eigenvalue"
        )
        out = tagged if out is None else out.unionByName(tagged)
        if m < n_components:
            cur = deflate(cur, comp, round_term=round_term).transform(truncate_lineage, eager=True)
    return out.orderBy("component", "pos")
