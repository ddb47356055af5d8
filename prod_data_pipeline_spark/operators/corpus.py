"""Corpus curation: the end-to-end training-data cleaning composition.

Chains the engine's dedup + text-quality operators into the pipeline a
large-scale pretraining corpus actually runs:

    exact dedup (digest groupBy, keep lowest id)
      -> MinHash-LSH near-dup removal (transitive: connected components
         over the verified pair graph, keep the min-id representative of
         each component — a chain a~b~c drops both b and c even when
         (a, c) never collided)
      -> quality gate (length-saturation + lexical-diversity score)

Every stage is a narrow-shuffle DataFrame op (see the component operators'
scale notes); nothing in the chain widens beyond (id, digest/signature,
score) exchanges, so the composition inherits 100 TB behavior from its
parts.  The connected-components step is iterative (min-label propagation
to fixpoint) but each iteration is one join + one aggregation shuffled on
node id, and near-dup components are tiny in practice, so convergence is
a handful of rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from prod_data_pipeline_spark.functions.text import tokens
from prod_data_pipeline_spark.operators.dedup import drop_exact_dups, near_dup_pairs
from prod_data_pipeline_spark.operators.text import quality_score


def dup_clusters(
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected near-dup pair graph.

    Input: (id_a, id_b) pairs (any extra columns ignored).  Output:
    (id_col, cluster_id) for every node appearing in at least one pair,
    where cluster_id is the smallest id in the node's component.

    Iterative min-label propagation: label(x) starts at min(x, min
    neighbor) and each round takes the min of its own and all neighbors'
    labels, until a fixpoint (at most the graph diameter rounds; near-dup
    components are small, so this is a handful of iterations).  Each round
    is one equi-join plus one groupBy — both shuffle on node id, nothing
    ever widens beyond (id, label) rows.  localCheckpoint truncates the
    per-iteration lineage; on a real cluster set a reliable checkpoint dir
    (sc.setCheckpointDir) and swap in .checkpoint() for fault tolerance.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("nbr_min")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("dst", "id")
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id"))


def curate_corpus(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.45,
    hash_fn: str = "md5",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curated corpus: per-document (doc_id, lang, n_tokens, quality) after
    exact dedup, transitive near-dup removal, and the quality threshold.

    Near-dup removal keeps the min-id representative of each connected
    component of the verified pair graph (dup_clusters), so duplicate
    chains collapse to one survivor even when the endpoints never collided
    directly.
    """
    # d1 feeds both the near-dup pipeline and the final keep-join; persist
    # so the exact-dedup semi-join runs once, not per branch
    d1 = drop_exact_dups(docs, id_col, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    pairs = near_dup_pairs(
        d1, id_col, text_col, threshold=jaccard_threshold, hash_fn=hash_fn
    )
    clusters = dup_clusters(pairs, id_col=id_col)
    losers = clusters.filter(F.col("cluster_id") != F.col(id_col)).select(id_col)
    d2 = d1.join(losers, id_col, "left_anti")
    toks = tokens(F.col(text_col))
    scored = d2.select(
        F.col(id_col),
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        quality_score(toks, F.array_distinct(toks)).alias("quality"),
    )
    return scored.filter(F.col("quality") >= min_quality)
