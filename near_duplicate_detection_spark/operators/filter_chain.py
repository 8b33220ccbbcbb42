"""Composable corpus filter chain — the C4/Gopher/RefinedWeb-style
cleaning pass that decides, per document, KEEP or the FIRST failing gate:

  1. too_short / too_long   (token-count bounds — C4 length gates)
  2. repetitive             (Gopher duplicate-line fraction)
  3. boilerplate            (corpus-level boilerplate-line share, CCNet)
  4. contaminated           (benchmark n-gram overlap, GPT-3 appendix C)

Reference analog: the reference drops videos whose extraction produced no
usable shots before indexing (ndd/server_ndd.py:246-261); a webtext corpus
has a whole family of such drop-gates, and what matters operationally is
ATTRIBUTION — which gate fired — because that is what gets tuned.

Plan shape at 10^12 docs: gates 1-2 are pure map-side column expressions
(zero shuffle). Gate 3 adds the boilerplate count (one groupBy on 8-byte
line hashes) and a per-doc membership aggregation. Gate 4 is the
broadcast-asymmetric contamination semi-join (benchmark side broadcast,
only hit rows shuffle). The reason column is a single ordered
``when``-chain, so attribution costs nothing beyond the signals
themselves, and ``corpus_filter``/``filter_report`` share one annotated
plan (kept docs and the report are two projections of the same lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from near_duplicate_detection_spark.functions.textstats import (
    chunk_lines,
    line_chunks,
)
from near_duplicate_detection_spark.operators.line_dedup import (
    boilerplate_line_frac,
)


def annotate_reject_reason(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    max_dup_line_frac: float = 0.3,
    max_boiler_frac: float = 0.5,
    boiler_min_docs: int = 3,
    line_width: int = 3,
    benchmark: DataFrame | None = None,
    decontaminate_k: int = 8,
) -> DataFrame:
    """``df`` plus a ``reject_reason`` column ('kept' when every gate
    passes). Gate order is fixed and documented above — a doc failing
    several gates reports the FIRST."""
    toks = F.split(F.col(text_col), " ")
    nt = F.size(toks)
    lines = chunk_lines(toks, line_width)
    dup_frac = (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(
        lines
    )

    boiler = boilerplate_line_frac(
        df, id_col, line_chunks(text_col, line_width), boiler_min_docs
    ).select(id_col, "boiler_frac")
    out = df.join(boiler, id_col, "left")

    if benchmark is not None:
        from near_duplicate_detection_spark.operators.decontaminate import (
            contamination_hits,
        )

        hits = contamination_hits(
            df.select(id_col, text_col),
            benchmark,
            k=decontaminate_k,
            id_col=id_col,
            text_col=text_col,
        )
        # No explicit broadcast hint: "contamination-sized" is an
        # assumption, not a guarantee — a benchmark that overlaps hot
        # boilerplate can make the hit set corpus-scale, and a forced
        # broadcast then OOMs instead of degrading. AQE sees the hit-set's
        # actual post-agg size at runtime and broadcasts exactly when safe.
        out = out.join(
            hits.select(id_col, F.lit(True).alias("_contam")),
            id_col,
            "left",
        )
        contam = F.coalesce(F.col("_contam"), F.lit(False))
    else:
        contam = F.lit(False)

    reason = (
        F.when(nt < min_tokens, "too_short")
        .when(nt > max_tokens, "too_long")
        .when(dup_frac > max_dup_line_frac, "repetitive")
        .when(
            F.coalesce(F.col("boiler_frac"), F.lit(0.0)) > max_boiler_frac,
            "boilerplate",
        )
        .when(contam, "contaminated")
        .otherwise("kept")
    )
    return out.select(*df.columns, reason.alias("reject_reason"))


def corpus_filter(df: DataFrame, **kwargs) -> DataFrame:
    """The cleaned corpus: input rows (original columns only) that pass
    every gate."""
    ann = annotate_reject_reason(df, **kwargs)
    return ann.where(F.col("reject_reason") == "kept").drop("reject_reason")


def filter_report(df: DataFrame, **kwargs) -> DataFrame:
    """(reject_reason, n_docs) — the tuning dashboard for the chain.
    Every input doc lands in exactly one bucket ('kept' included), so
    ``sum(n_docs) == count(df)`` always."""
    ann = annotate_reject_reason(df, **kwargs)
    return ann.groupBy("reject_reason").agg(F.count("*").alias("n_docs"))
