"""Text-analysis operators over document tables — all JVM-side expressions.

Extension surface mandated by the north star (BASELINE.json): language-ID,
quality scoring, token statistics, document fingerprinting.  The reference
has no text operators (SURVEY §2.6); these are designed Spark-first:

- every function returns Column expressions built from higher-order array
  functions (whole-stage codegen, no Python boundary);
- the scale path is scan -> narrow projection -> (optional) explode+agg:
  no shuffles except where an aggregation genuinely needs one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod_data_pipeline_spark.functions.text import distinct_tokens, shingles, tokens
from prod_data_pipeline_spark.session import ensure_parallelism

# Tiny per-language stopword sets for the n-gram/stopword-hit heuristic.
# Deliberately small so the DuckDB oracle can mirror the exact expression.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "de", "que", "y", "los", "un"],
    "fr": ["le", "la", "de", "et", "un", "les", "des"],
    "de": ["der", "die", "und", "das", "ist", "von", "ein"],
}
LANG_PRIORITY = ["en", "es", "fr", "de"]  # tie-break order, most common first


def lang_hits(toks_distinct: Column, lang: str) -> Column:
    return F.size(F.array_intersect(toks_distinct, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def predicted_lang(toks_distinct: Column) -> Column:
    """Argmax of stopword hits with fixed priority tie-break; 'und' if no
    language scores a single hit."""
    hits = {lang: lang_hits(toks_distinct, lang) for lang in LANG_PRIORITY}
    expr = F.lit("und")
    # Build the CASE chain back-to-front so earlier languages win ties.
    for lang in reversed(LANG_PRIORITY):
        later = LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1 :]
        cond = (hits[lang] > 0) & F.lit(True)
        for other in later:
            cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_score(toks: Column, toks_distinct: Column) -> Column:
    """Composite [0,1] quality score: length saturation + lexical diversity.

    score = 0.5*min(n_tokens/100, 1) + 0.5*(distinct/total); rounded to 4
    decimals so cross-engine double arithmetic hashes identically.
    """
    n = F.size(toks).cast("double")
    d = F.size(toks_distinct).cast("double")
    return F.round(
        F.lit(0.5) * F.least(n / F.lit(100.0), F.lit(1.0)) + F.lit(0.5) * (d / n),
        4,
    )


def token_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token counts and quality features."""
    toks = tokens(F.col(text_col))
    dtoks = F.array_distinct(toks)
    return df.withColumn("toks", toks).withColumn("dtoks", dtoks)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 scheme):
    hash every k-token shingle, keep the min hash of each sliding window,
    dedupe.  Sub-linear fingerprint count per doc; xxhash64 keeps hashing
    JVM-side.  Used for plagiarism-style containment detection at scale.

    hash_fn="md5" swaps the shingle hash for the lowercase hex digest and
    takes lexicographic window minima — bit-identical in DuckDB, so the
    correctness oracle can replay the whole scheme (fingerprints become
    array<string> instead of array<bigint>).

    The sliding-window min runs as posexplode + a rows-frame window MIN —
    codegen'd, O(n·w).  The tempting pure-expression form
    (``transform(sequence(...), i -> array_min(slice(hashes, i, w)))``)
    re-evaluates the hash array per window index inside the interpreted
    higher-order lambda: O(n²) per document, ~15x slower measured.
    """
    from pyspark.sql import Window

    df = ensure_parallelism(df)
    toks = tokens(F.col(text_col))
    if hash_fn == "md5":
        hashes = F.transform(shingles(toks, k), lambda s: F.md5(s))
    elif hash_fn == "xxhash64":
        hashes = F.transform(shingles(toks, k), lambda s: F.xxhash64(s))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    e = df.select(F.col(id_col), F.posexplode(hashes).alias("_pos", "_h"))
    wmin = Window.partitionBy(id_col).orderBy("_pos").rowsBetween(0, window - 1)
    wn = Window.partitionBy(id_col)
    mins = e.select(
        F.col(id_col),
        "_pos",
        F.min("_h").over(wmin).alias("_wmin"),
        F.count("_pos").over(wn).alias("_n"),
    )
    # full windows only; a doc with fewer hashes than one window keeps the
    # min of everything it has (the pos==0 truncated frame)
    valid = mins.filter(
        (F.col("_pos") <= F.col("_n") - window)
        | ((F.col("_n") < window) & (F.col("_pos") == 0))
    )
    fps = valid.groupBy(id_col).agg(F.array_sort(F.collect_set("_wmin")).alias("fingerprints"))
    return (
        df.select(F.col(id_col))
        .join(fps, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(
                "fingerprints",
                F.array().cast("array<string>" if hash_fn == "md5" else "array<bigint>"),
            ).alias("fingerprints"),
        )
    )
