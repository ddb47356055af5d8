"""Repetition / contamination quality filters for training corpora.

The reference pipeline gates rows on null/dup/set-membership checks
(glue/jobs/raw_to_curated_events_v3_dq.py:70-106); a pretraining corpus
needs the analogous *content* gates.  Two families, both standard in
published data pipelines (Gopher/MassiveText repetition rules; GPT-3
appendix-C benchmark decontamination):

- **Repetition profile** — per-document duplicate-n-gram statistics.
  Highly repetitive documents (boilerplate, SEO spam, generation loops)
  are dropped by thresholding ``top_ngram_frac`` / ``dup_ngram_frac``.
- **Contamination overlap** — fraction of a document's distinct n-grams
  that appear in a benchmark set; documents above a threshold leak eval
  data into training and must be dropped.

Scale notes: the repetition profile shuffles (doc_id, gram) pairs — keys
are document-local so the shuffle is perfectly spread and combiner-friendly
(partial aggregation collapses each doc's grams map-side).  Contamination
broadcasts the benchmark gram set: eval benchmarks are tiny relative to a
100 TB corpus, so the scored side is never shuffled at all — one scan,
map-side broadcast probe, one doc-local aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prod_data_pipeline_spark.functions.text import shingles, tokens


def repetition_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-document n-gram repetition statistics.

    Returns one row per input row: token counts plus

    - ``top_ngram_frac``  — occurrences of the most frequent n-gram over
      total n-gram occurrences (Gopher's "top n-gram fraction");
    - ``dup_ngram_frac``  — fraction of n-gram occurrences that are
      repeats of an earlier occurrence (1 - distinct/total);
    - ``distinct_token_ratio`` — lexical diversity.

    Documents shorter than ``n`` tokens have no n-grams; their fractions
    are 0.  Plan shape: one explode + two hash aggregations keyed by
    doc_id (map-side partial agg collapses per-doc grams before the
    shuffle), then a join back to the per-doc token stats — all JVM-side.
    """
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        shingles(toks, n).alias("grams"),
    )
    gram_counts = (
        base.select(id_col, F.explode("grams").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("total_grams"),
            F.max("c").alias("max_gram_count"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
        )
    )
    joined = base.drop("grams").join(gram_counts, id_col, "left")
    total = F.col("total_grams").cast("double")
    return joined.select(
        id_col,
        "n_tokens",
        F.round(
            F.col("n_distinct_tokens") / F.col("n_tokens").cast("double"), 6
        ).alias("distinct_token_ratio"),
        F.coalesce(F.col("total_grams"), F.lit(0)).alias("total_grams"),
        F.coalesce(F.round(F.col("max_gram_count") / total, 6), F.lit(0.0)).alias(
            "top_ngram_frac"
        ),
        F.coalesce(
            F.round(F.lit(1.0) - F.col("n_distinct_grams") / total, 6), F.lit(0.0)
        ).alias("dup_ngram_frac"),
    )


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document benchmark contamination: the fraction of a document's
    distinct n-grams that occur anywhere in the benchmark corpus.

    GPT-3-style decontamination keeps a document only if the overlap is
    below a threshold; this operator computes the score, the caller
    filters.  The benchmark's distinct gram set is broadcast — it is the
    small side by construction (eval sets vs a 100 TB corpus) — so the
    scored corpus is scanned once with a map-side probe; the only shuffle
    is the doc-local gram aggregation.
    """
    bench_grams = (
        benchmark.select(
            F.explode_outer(shingles(tokens(F.col(text_col)), n)).alias("gram")
        )
        .where(F.col("gram").isNotNull())
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(shingles(tokens(F.col(text_col)), n))).alias(
            "gram"
        ),
    )
    scored = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("gram")).alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_contaminated"),
        )
    )
    return scored.select(
        id_col,
        "n_grams",
        "n_contaminated",
        F.when(F.col("n_grams") > 0,
               F.round(F.col("n_contaminated") / F.col("n_grams").cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("contamination_frac"),
    )
