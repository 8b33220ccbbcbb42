"""Corpus-level boilerplate-line detection (CCNet/RefinedWeb-style line
dedup): a line that recurs across many DISTINCT documents is template
chrome ("all rights reserved", cookie banners, nav menus), not content.

Reference analog: the reference dedups whole frames by fingerprint across
videos (ndd/server_ndd.py:127-141); lines are the webtext graft's
sub-document unit.

Plan shape at 10^12 docs:
- per-doc ``array_distinct`` FIRST (map-side), so a doc repeating its own
  line 1000× contributes one count — and the explode that follows is
  bounded by distinct lines per doc;
- the cross-corpus count groups by a 64-bit ``xxhash64`` of the line, not
  the line text, so shuffle rows are (8-byte key, small payload) and the
  line text itself rides along only as a ``min`` aggregate for reporting;
- ultra-hot boilerplate keys ("" or "home") are exactly the skew case AQE
  splits; counting is algebraic (map-side partial agg), so even a line in
  every doc on earth partial-aggregates before the shuffle.

The join back to docs is a semi-join on the hash; the boilerplate set is
NOT assumed broadcastable (it is corpus-dependent), but per-doc membership
testing stays an equi-join on the same 8-byte key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def boilerplate_lines(
    df: DataFrame, lines_col: Column, min_docs: int = 3
) -> DataFrame:
    """Lines appearing in >= ``min_docs`` distinct documents.

    Returns (line_hash, line, n_docs). ``df`` needs one row per doc;
    ``lines_col`` is the per-doc lines array (see
    ``functions.textstats.line_chunks``).
    """
    per_doc = df.select(
        F.explode(F.array_distinct(lines_col)).alias("line")
    ).where(F.col("line") != "")
    return (
        per_doc.groupBy(F.xxhash64("line").alias("line_hash"))
        .agg(F.count("*").alias("n_docs"), F.min("line").alias("line"))
        .where(F.col("n_docs") >= min_docs)
        .select("line_hash", "line", "n_docs")
    )


def boilerplate_line_frac(
    df: DataFrame, id_col: str, lines_col: Column, min_docs: int = 3
) -> DataFrame:
    """Per-doc fraction of line occurrences (with multiplicity) that are
    corpus-boilerplate. Returns (id, n_lines, boiler_frac).

    Two shuffles total: the boilerplate count and the membership equi-join
    + per-doc re-aggregation (both keyed by line_hash then doc id).
    """
    boiler = boilerplate_lines(df, lines_col, min_docs)
    occ = df.select(
        F.col(id_col), F.explode(lines_col).alias("line")
    ).select(
        id_col,
        "line",
        F.xxhash64("line").alias("line_hash"),
        (F.col("line") != "").cast("int").alias("_nonempty"),
    )
    # Join KEY stays the 8-byte hash (shuffle partitions on it), but
    # membership is CONFIRMED by text equality against the line the
    # boilerplate side already carries: at 10^12-doc scale (billions of
    # distinct lines) 64-bit collisions are birthday-expected, and without
    # the confirm a content line colliding with a boilerplate hash would be
    # silently misflagged. Residual tolerance (documented): a collision
    # still merges the two lines' doc counts in `boiler` (its shuffle is
    # deliberately hash-only) and keeps min(line) as the stored text — so a
    # colliding pair can under-flag one line, never misflag a non-matching
    # one.
    flagged = occ.join(
        boiler.select("line_hash", F.col("line").alias("_boiler_line")),
        "line_hash",
        "left",
    ).withColumn(
        "_is_boiler", (F.col("line") == F.col("_boiler_line")).cast("int")
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.round(
            F.coalesce(
                F.sum(F.col("_nonempty") * F.coalesce("_is_boiler", F.lit(0)))
                / F.sum("_nonempty"),
                F.lit(0.0),
            ),
            6,
        ).alias("boiler_frac"),
    )
