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


# ------------------------------------------------------- repetition (Gopher)


def line_chunks(text_col: str = "text", width: int = 3) -> Column:
    """Deterministic "lines" for line-level analytics: the whitespace tokens
    chunked into fixed ``width``-token runs (last chunk may be short).

    Web pages carry real newlines; the shared test corpus does not, so every
    line-based operator in this engine takes an explicit lines column and the
    driver queries synthesize it with this helper (ANSI-SQL-reproducible:
    ``list_transform(range(...), i -> array_to_string(list_slice(...)))``).
    JVM-side: split → sequence → transform/slice/array_join, no UDF.
    """
    return chunk_lines(F.split(F.col(text_col), " "), width)


def chunk_lines(toks: Column, width: int = 3) -> Column:
    """``line_chunks`` over an existing token-array column."""
    n_lines = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_lines - 1, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
    )


def repetition_signals(lines_col: Column) -> list[Column]:
    """Gopher-style per-doc repetition features over a lines array
    (Rae et al. 2021 §A1.1: duplicate-line fraction and duplicate-line
    CHARACTER fraction — the two intra-doc repetition filters).

    Pure higher-order column expressions (aggregate/array_distinct), so the
    whole computation is JVM-side per row with no shuffle and no UDF:

    - ``dup_line_frac``: lines beyond the first occurrence of their value,
      over total lines ((n - n_distinct) / n).
    - ``dup_line_char_frac``: characters in those repeat occurrences over
      total line characters ((chars - distinct_chars) / chars; 0 when the
      doc has no line characters at all).
    """
    n = F.size(lines_col)
    nd = F.size(F.array_distinct(lines_col))
    chars = F.aggregate(
        lines_col, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dchars = F.aggregate(
        F.array_distinct(lines_col),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x),
    )
    dup_frac = F.when(n > 0, (n - nd) / n).otherwise(F.lit(0.0))
    dup_char_frac = F.when(chars > 0, (chars - dchars) / chars).otherwise(
        F.lit(0.0)
    )
    return [
        F.round(dup_frac, 6).alias("dup_line_frac"),
        F.round(dup_char_frac, 6).alias("dup_line_char_frac"),
    ]


def top_ngram_char_frac(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher's "fraction of characters in the most common word n-gram"
    (Rae et al. 2021 §A1.1), per document.

    Plan shape for 10^12 docs: ONE exchange, and it ships the compact
    pre-explode rows — the docs are hash-repartitioned by id BEFORE the
    gram explode, and HashPartitioning(id) satisfies the clustering
    requirement of BOTH the (id, chars, gram) count and the per-doc argmax
    window, so the exploded gram rows (≈2× the text volume for bigrams)
    never cross the wire at all. Keying on the doc id also means a
    corpus-hot n-gram ("of the") cannot concentrate on one reducer.
    Tiebreak is total order (count desc, gram asc) so the result is
    deterministic and ANSI-SQL-reproducible.

    Returns (id, top_ngram, top_ngram_count, top_ngram_char_frac) — one row
    per doc that has at least one n-gram (docs shorter than n tokens drop).

    Metric note (documented deviation from Gopher): the fraction is
    count × len(gram) / doc_chars, which double-counts characters shared by
    OVERLAPPING occurrences ("a a a a" → bigram "a a" counts 3×3 chars over
    7), where Gopher counts characters COVERED by the top gram. The value
    is clamped to 1.0; thresholding behavior stays monotone either way, and
    a covered-characters computation would need position-aware dedup at
    ~2× the text volume in shuffle — not worth it for a filter signal.
    """
    toks = F.split(F.col(text_col), " ")
    m = F.size(toks) - (n - 1)  # number of n-grams (may be <= 0)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    # Spark's sequence(1, 0) DESCENDS — guard short docs to an empty array
    grams = F.when(m >= 1, grams).otherwise(F.slice(grams, 1, 0))
    exploded = df.repartition(F.col(id_col)).select(
        F.col(id_col),
        F.length(text_col).alias("_doc_chars"),
        F.explode(grams).alias("gram"),
    )
    counts = exploded.groupBy(id_col, "_doc_chars", "gram").agg(
        F.count("*").alias("cnt")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("gram"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("gram").alias("top_ngram"),
            F.col("cnt").alias("top_ngram_count"),
            F.round(
                F.least(
                    F.col("cnt")
                    * F.length("gram")
                    / F.greatest(F.col("_doc_chars"), F.lit(1)),
                    F.lit(1.0),
                ),
                6,
            ).alias("top_ngram_char_frac"),
        )
    )
