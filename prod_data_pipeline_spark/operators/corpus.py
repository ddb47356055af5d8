"""Corpus curation: the end-to-end training-data cleaning composition.

Chains the engine's dedup + text-quality operators into the pipeline a
large-scale pretraining corpus actually runs:

    exact dedup (digest groupBy, keep lowest id)
      -> MinHash-LSH near-dup removal (drop the higher id of each
         verified colliding pair — deterministic, SQL-expressible; a
         transitive connected-components grouping is the iterative
         upgrade and deliberately out of scope here)
      -> quality gate (length-saturation + lexical-diversity score)

Every stage is a narrow-shuffle DataFrame op (see the component operators'
scale notes); nothing in the chain widens beyond (id, digest/signature,
score) exchanges, so the composition inherits 100 TB behavior from its
parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from prod_data_pipeline_spark.functions.text import tokens
from prod_data_pipeline_spark.operators.dedup import drop_exact_dups, near_dup_pairs
from prod_data_pipeline_spark.operators.text import quality_score


def curate_corpus(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.45,
    hash_fn: str = "md5",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curated corpus: per-document (doc_id, lang, n_tokens, quality) after
    exact dedup, near-dup removal, and the quality threshold."""
    # d1 feeds both the near-dup pipeline and the final keep-join; persist
    # so the exact-dedup semi-join runs once, not per branch
    d1 = drop_exact_dups(docs, id_col, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    pairs = near_dup_pairs(
        d1, id_col, text_col, threshold=jaccard_threshold, hash_fn=hash_fn
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    d2 = d1.join(losers, id_col, "left_anti")
    toks = tokens(F.col(text_col))
    scored = d2.select(
        F.col(id_col),
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        quality_score(toks, F.array_distinct(toks)).alias("quality"),
    )
    return scored.filter(F.col("quality") >= min_quality)
