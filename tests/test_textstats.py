"""Text analytics: lang-id, quality features, fingerprint/exact-dedup."""

from __future__ import annotations

import pandas as pd

from near_duplicate_detection_spark.functions.textstats import (
    exact_dedup,
    lang_id,
    quality_features,
)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )


def test_lang_id_votes(spark):
    df = _df(
        spark,
        [
            (1, "the cat and the dog sat with the hat of the man"),
            (2, "der hund und die katze ist nicht mit der maus"),
            (3, "le chien est dans la maison pour les enfants"),
            (4, "el perro es por la casa con los gatos para el"),
            (5, "zzz qqq totally unmarkered text"),
        ],
    )
    got = dict(
        df.select("doc_id", lang_id("text").alias("lang")).collect()
    )
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_quality_features_shape_and_ranges(spark):
    df = _df(
        spark,
        [
            (1, "the " + " ".join(f"w{i}" for i in range(100)) + " end."),
            (2, "spam spam spam spam spam"),
            (3, "x"),
        ],
    )
    out = quality_features(df).toPandas().set_index("doc_id")
    assert set(c for c in out.columns if c.startswith("q_")) == {
        "q_n_tokens", "q_n_chars", "q_distinct_ratio", "q_n_punct",
        "q_mean_token_len", "q_score",
    }
    assert out.loc[1, "q_score"] > out.loc[2, "q_score"] > 0
    assert out.loc[1, "q_score"] > out.loc[3, "q_score"]
    assert out.q_score.between(0, 1).all()
    assert out.loc[2, "q_distinct_ratio"] == 0.2
    assert out.loc[1, "q_n_punct"] == 1


def test_exact_dedup_groups(spark):
    df = _df(
        spark,
        [
            (1, "Same   Text here"),
            (7, "same text HERE"),  # whitespace/case-normalized duplicate
            (3, "unique one"),
            (9, "same text here"),
        ],
    )
    out = exact_dedup(df, "doc_id").toPandas()
    assert len(out) == 1
    assert out.n_copies.iloc[0] == 3
    assert out.representative.iloc[0] == 1
