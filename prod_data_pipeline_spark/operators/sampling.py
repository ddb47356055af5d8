"""Deterministic sampling for training-data mixing.

A pretraining pipeline rarely uses a corpus as-is: sources are mixed at
target proportions (downsample crawl, keep curated reference data whole).
``df.sample()`` is wrong for this at scale — it draws from rand(), so task
retries/speculative duplicates see different rows, and no oracle can
replay it.  These operators derive the keep/drop decision from a hash of a
stable key, which makes sampling:

- deterministic across retries, re-runs, and engines (md5-based buckets
  replay exactly in the DuckDB correctness oracle);
- stable under data growth: a row's fate depends only on (salt, key);
- stratifiable: per-stratum rates are just a CASE over the threshold.

Scale: the filter is a pure projection predicate — no shuffle, pushes to
the scan, and composes with partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 32-bit bucket space: md5's first 8 hex chars, uniform over [0, 2^32).
_BUCKET_SPACE = 1 << 32


def hash_bucket(key: Column, salt: str) -> Column:
    """Uniform [0, 2^32) bucket from md5(salt:key) — the first 8 hex chars
    parsed as an integer.  Mirrorable bit-for-bit in ANSI SQL."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its hash bucket falls
    below rate * 2^32.  Same rows on every run."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_bucket(F.col(key_col), salt) < int(rate * _BUCKET_SPACE))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive:
    rates={'crawl': 0.1, 'curated': 1.0} downsamples crawl 10x and keeps
    curated whole; strata not listed get default_rate (0 drops them).
    """
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0, 1], got {rate}")
    threshold = F.lit(int(default_rate * _BUCKET_SPACE))
    for stratum, rate in rates.items():
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * _BUCKET_SPACE))
        ).otherwise(threshold)
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)


def mixing_weights(
    df: DataFrame,
    targets: dict[str, float],
    strata_col: str,
) -> DataFrame:
    """Sampling rates that turn the observed source mix into a target mix.

    Given target proportions (summing to 1), computes per-stratum keep
    rates scaled so the most-over-represented source relative to its
    target is kept whole and every other source is downsampled to match —
    i.e. the largest achievable corpus with exactly the target mixture and
    no upsampling.  One narrow groupBy; output is a tiny relation meant to
    feed stratified_sample.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_rows"))
    target_col = F.lit(None).cast("double")
    for stratum, share in targets.items():
        target_col = F.when(F.col(strata_col) == stratum, F.lit(share)).otherwise(
            target_col
        )
    with_t = counts.withColumn("target_share", target_col).filter(
        F.col("target_share").isNotNull()
    )
    # scale chosen so max(rate) == 1: corpus_total = min over strata of n/share
    corpus_total = with_t.select(
        F.min(F.col("n_rows") / F.col("target_share")).alias("m")
    )
    return (
        with_t.crossJoin(F.broadcast(corpus_total))
        .select(
            strata_col,
            "n_rows",
            "target_share",
            F.round((F.col("target_share") * F.col("m")) / F.col("n_rows"), 6).alias(
                "keep_rate"
            ),
        )
        .orderBy(strata_col)
    )
