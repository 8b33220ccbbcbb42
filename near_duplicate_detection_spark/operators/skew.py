"""Explicit skew-handling operators: value-salted aggregation and salted join.

The pipeline's LSH stage handles bucket skew with ceilings + a linear SimHash
fallback (operators/lsh.py — salting an LSH bucket would LOSE pairs across
salt groups, so ceilings are the correct tool there). These operators cover
the other two skew shapes a web-scale corpus hits:

- hot-KEY aggregation (one domain holds 10% of all tokens): salt derived
  from the aggregated VALUE partitions the value space, so per-(key, salt)
  partial aggregates are exact and the final merge is a tiny second shuffle —
  the classic two-phase exact distinct-count that AQE cannot synthesize
  (AQE splits skewed JOIN partitions, not skewed groupBy state);
- hot-key JOIN where the dim side is too big to broadcast: replicate dim
  rows per salt only for the declared hot keys, spread fact rows across
  salts, join on (key, salt).

Both are semantically transparent (result == the unsalted plan), which is
what the contract oracle checks.

Reference analog: the reference has no skew story at all — its index is a
single in-RAM matrix (ndd/server_ndd.py:244-257); skew is purely an artifact
of distributing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    alias: str,
    n_salt: int = 64,
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value), skew-safe under hot keys.

    Phase 1 groups by (keys, pmod(xxhash64(value), n_salt)) — the salt is a
    pure function of the VALUE, so every occurrence of a value lands in the
    same salt group and per-group count_distinct values are disjoint; phase 2
    sums the n_salt partials per key. A hot key's distinct-state is thereby
    split across n_salt reducers instead of materializing on one executor.
    """
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salt)).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(
        F.count_distinct(F.col(value)).alias("_partial")
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(alias))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with per-hot-key salting (for dims too large to broadcast).

    Fact rows under a hot key get salt = pmod(xxhash64(key-col, rand-free
    row fingerprint), n_salt) — here the whole-row hash of the fact side,
    deterministic across retries; other rows get salt 0. Dim rows under a
    hot key are replicated n_salt× via explode(sequence(...)), others get
    the single salt 0. The join key becomes (key, _salt), so one hot key's
    rows spread over n_salt shuffle partitions instead of one straggler.

    Result is row-identical to fact.join(dim, key, how).
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # right/full would emit unmatched replicated dim rows n_salt times
        raise ValueError(f"salted_join supports fact-preserving joins, not {how!r}")
    if "_salt" in fact.columns or "_salt" in dim.columns:
        raise ValueError("inputs must not carry a _salt column")
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _has_map(dt) -> bool:
        # Spark's hash expressions reject MapType nested at ANY depth
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    # any map-free subset of columns is a valid (deterministic) spread source;
    # the join key itself can never be a map, so this is non-empty whenever
    # `key` is a real column — guard anyway for a clear error over the opaque
    # zero-arg xxhash64 analysis failure
    hashable = [f.name for f in fact.schema.fields if not _has_map(f.dataType)]
    if not hashable:
        raise ValueError(
            "salted_join: every fact column is (or nests) a MapType — no "
            "hashable column to derive the salt from"
        )
    hot = F.col(key).isin(hot_keys)
    fact_salt = F.when(
        hot, F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(n_salt))
    ).otherwise(F.lit(0))
    f = fact.withColumn("_salt", fact_salt)
    dim_salts = F.when(
        hot, F.sequence(F.lit(0), F.lit(n_salt - 1))
    ).otherwise(F.array(F.lit(0)))
    d = dim.withColumn("_salt", F.explode(dim_salts))
    return f.join(d, [key, "_salt"], how).drop("_salt")
