"""Skew operators: semantic transparency + the salt actually reaches the
shuffle (operators/skew.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from near_duplicate_detection_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)


def _skewed_tokens(spark):
    # one hot key holding ~90% of rows, many distinct + repeated values
    rows = [("hot", f"t{i % 400}") for i in range(3000)]
    rows += [(f"cold{i % 20}", f"t{i % 50}") for i in range(300)]
    return spark.createDataFrame(rows, "key string, tok string")


def test_salted_count_distinct_matches_plain(spark):
    df = _skewed_tokens(spark)
    got = (
        salted_count_distinct(df, ["key"], "tok", alias="n", n_salt=16)
        .toPandas()
        .sort_values("key", ignore_index=True)
    )
    want = (
        df.groupBy("key")
        .agg(F.count_distinct("tok").alias("n"))
        .toPandas()
        .sort_values("key", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.loc[got.key == "hot", "n"].iloc[0] == 400


def test_salted_count_distinct_salt_in_shuffle(spark):
    df = _skewed_tokens(spark)
    plan = (
        salted_count_distinct(df, ["key"], "tok", alias="n", n_salt=16)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # phase-1 aggregate must group on the value-derived salt, not key alone
    # (the optimizer renames _salt to _groupingexpression; match the expr)
    assert "pmod(xxhash64(tok" in plan


def test_salted_join_matches_plain_inner_and_left(spark):
    fact = _skewed_tokens(spark)
    dim = spark.createDataFrame(
        [("hot", 1), ("cold3", 2), ("absent", 9)] + [(f"cold{i}", 10 + i) for i in range(0, 20, 2)],
        "key string, attr int",
    )
    for how in ("inner", "left"):
        got = (
            salted_join(fact, dim, "key", hot_keys=["hot"], n_salt=8, how=how)
            .toPandas()
            .sort_values(["key", "tok", "attr"], ignore_index=True)
            .reindex(["key", "tok", "attr"], axis=1)
        )
        want = (
            fact.join(dim, "key", how)
            .toPandas()
            .sort_values(["key", "tok", "attr"], ignore_index=True)
            .reindex(["key", "tok", "attr"], axis=1)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_salted_join_semi_anti(spark):
    fact = _skewed_tokens(spark)
    dim = spark.createDataFrame([("hot", 1), ("cold5", 2)], "key string, attr int")
    for how in ("left_semi", "left_anti"):
        got = salted_join(fact, dim, "key", ["hot"], n_salt=8, how=how).count()
        want = fact.join(dim, "key", how).count()
        assert got == want, how


def test_salted_join_rejects_dim_preserving():
    import pytest

    with pytest.raises(ValueError):
        salted_join(None, None, "k", ["h"], how="full")
