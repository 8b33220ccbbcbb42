"""Train/test decontamination: drop or flag corpus docs that share k-token
shingles with a benchmark/eval set.

The standard LLM-training-data hygiene pass (the n-gram-overlap
decontamination of GPT-3 appendix C / PaLM / Llama training reports): any
training document containing a long-enough token run that also appears in a
held-out benchmark is contaminated — keeping it inflates eval scores. This is
the same candidate-generation shape as the engine's LSH/substring stages
(shingle → match → verify; reference analog: the exact-duplicate check over
extracted features, ndd/server_ndd.py:104-112) with one asymmetry that
decides the whole physical plan: the benchmark side is SMALL by nature
(thousands of eval items vs 10^12 training docs).

Scale posture, in plan terms:
- the benchmark's distinct shingle set builds once and BROADCASTS — the
  corpus is never shuffled against it;
- the corpus side is a map-side generator: tokenize → k-shingle → explode,
  immediately filtered by the broadcast hash join, so only (doc, shingle)
  rows that actually hit a benchmark shingle ever leave the map stage;
- the per-doc aggregation that follows shuffles ONLY contaminated rows —
  for a clean corpus the shuffle is empty;
- everything is built-in column expressions (split / transform / sequence /
  explode) — no Python UDF anywhere on the corpus path.

Shingles are joined as strings (array_join over a token slice) rather than
rolling hashes so the operator is directly ANSI-SQL-checkable; at 10^12 docs
the string shingle would be replaced by the xxhash64 composition the
signature stage already uses (functions/signatures.py shingle_hashes_flat)
— same plan shape, cheaper bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingles(text_col, k: int):
    """k-token shingle strings of a whitespace-tokenized column. Docs with
    fewer than k tokens contribute their whole token stream as one shingle
    (the stage-1 degenerate-record guard, functions/signatures.py:44-61) —
    a short benchmark item must still be findable."""
    toks = F.split(text_col, " ")
    n = F.size(toks)
    return F.when(
        n <= k, F.array(F.array_join(toks, " "))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
    )


def benchmark_shingles(
    benchmark: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """The benchmark's distinct shingle set — one column ``shingle``. Small
    by construction (|benchmark| × tokens); the caller broadcasts it."""
    return (
        benchmark.select(
            F.explode(_shingles(F.col(text_col), k)).alias("shingle")
        )
        .where(F.col("shingle") != "")
        .distinct()
    )


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per contaminated doc: (id_col, n_hits) — the number of DISTINCT
    benchmark shingles the doc contains. Docs with zero hits are absent
    (the common case: the output is benchmark-overlap-sized, not
    corpus-sized). One broadcast join on the corpus map side; the count
    shuffles only the hit rows."""
    bench = F.broadcast(benchmark_shingles(benchmark, k, text_col))
    exploded = docs.select(
        F.col(id_col),
        F.explode(_shingles(F.col(text_col), k)).alias("shingle"),
    )
    # semi-join FIRST (map-side broadcast filter), dedup/count AFTER: the
    # distinct would otherwise shuffle the full exploded corpus (docs ×
    # shingles); this order shuffles only the hit rows
    return (
        exploded.join(bench, "shingle", "left_semi")
        .dropDuplicates([id_col, "shingle"])
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    min_hits: int = 1,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """The corpus minus contaminated docs (>= min_hits distinct benchmark
    shingles). LEFT ANTI against the hit set, with NO forced broadcast:
    the hit set is usually contamination-sized (AQE sees its post-agg size
    at runtime and picks a broadcast anti-join when it fits), but a
    benchmark that accidentally overlaps hot boilerplate makes it
    corpus-scale — an unconditional hint would driver-OOM there instead of
    degrading to a shuffle join."""
    hits = contamination_hits(docs, benchmark, k, id_col, text_col)
    if min_hits > 1:
        hits = hits.where(F.col("n_hits") >= min_hits)
    return docs.join(hits.select(id_col), id_col, "left_anti")
