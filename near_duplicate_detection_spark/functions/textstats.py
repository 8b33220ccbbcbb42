"""Text analytics for a training-data pipeline: language ID, quality scoring,
token counting, document fingerprinting.

All of these are column-expression compositions (JVM codegen) except the
rolling-hash fingerprint, which reuses the engine's deterministic hash layer.
They are the graft of the reference's per-record classification pass
(extract_aspect_ratio.py:46-71: classify each shot against canonical
classes and emit label rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons (public common stopwords); language ID =
# argmax of marker hits — the canonical-class argmin of the reference
# (extract_aspect_ratio.py:67-69) with count-of-markers as the distance.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "was", "that", "with"],
    "de": ["der", "die", "und", "das", "nicht", "mit", "ist", "von"],
    "fr": ["le", "la", "les", "des", "est", "dans", "que", "pour"],
    "es": ["el", "los", "las", "es", "por", "con", "para", "como"],
}


def token_col(text_col: str = "text") -> Column:
    return F.split(F.lower(F.col(text_col)), r"\s+")


def n_tokens(text_col: str = "text") -> Column:
    return F.size(token_col(text_col))


def marker_hits(text_col: str, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(token_col(text_col), lambda t: F.array_contains(arr, t)))


def lang_id(text_col: str = "text") -> Column:
    """Best-guess language code by marker-word voting ('und' if no hits)."""
    langs = list(LANG_MARKERS)
    hits = F.array(*[marker_hits(text_col, LANG_MARKERS[lg]) for lg in langs])
    labels = F.array(*[F.lit(lg) for lg in langs])
    best = F.array_position(hits, F.array_max(hits)).cast("int")
    return F.when(F.array_max(hits) > 0, F.element_at(labels, best)).otherwise(
        F.lit("und")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition features + a 0-1 score.

    Heuristics follow the public C4/Gopher-style quality-filter recipes:
    too-short docs, punctuation-free docs, and low-diversity (high-repetition)
    docs score low. Everything is a codegen'd column expression.
    """
    toks = token_col(text_col)
    nt = F.size(toks)
    n_chars = F.length(text_col)
    distinct_ratio = F.size(F.array_distinct(toks)) / nt
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    stop = marker_hits(text_col, LANG_MARKERS["en"])
    mean_tok_len = (n_chars - nt + 1) / nt  # chars minus separators
    score = (
        F.least(nt / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(distinct_ratio * 2, F.lit(1.0)) * 0.3
        + F.least(stop / F.lit(5.0), F.lit(1.0)) * 0.3
    )
    return df.select(
        "*",
        nt.alias("q_n_tokens"),
        n_chars.alias("q_n_chars"),
        F.round(distinct_ratio, 6).alias("q_distinct_ratio"),
        punct.alias("q_n_punct"),
        F.round(mean_tok_len, 6).alias("q_mean_token_len"),
        F.round(score, 6).alias("q_score"),
    )


def doc_fingerprint(text_col: str = "text") -> Column:
    """64-bit whole-document fingerprint (exact-dedup key): xxhash64 of the
    normalized text — the S1-exact-dup groupBy key. JVM-side."""
    return F.xxhash64(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups by content hash: one row per duplicated text,
    with the representative (min id) and the group size. Single shuffle."""
    return (
        df.select(F.col(id_col), doc_fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("representative"),
        )
        .where(F.col("n_copies") > 1)
    )
