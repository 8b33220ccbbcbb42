"""Per-row invariant: byte-identical extracted text per url (BASELINE.json).

Mirrors the reference's determinism contract — stage validity by version-string
equality (ndd/extract_features.py:88) — as golden-equality tests.
"""

from __future__ import annotations

import numpy as np

from near_duplicate_detection_spark.functions.text import (
    extract_text,
    normalize_text,
    tokenize,
)
from near_duplicate_detection_spark.sources.pages import generate_pages, generate_rows


def test_extract_golden_roundtrip_pure():
    pdf = generate_rows(np.arange(300))
    for url, html, text in zip(pdf.url, pdf.html, pdf.text):
        assert extract_text(html) == text, url


def test_extract_strips_script_style_comments_entities():
    html = (
        b"<html><head><script>bad()</script><style>x{}</style>"
        b"<!-- secret --></head><body><p>a &amp; b</p><P>c</P></body></html>"
    )
    assert extract_text(html) == "a & b c"


def test_extract_handles_null_and_malformed():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"no tags at all") == "no tags at all"
    assert extract_text(b"<p>unclosed") == "unclosed"


def test_extract_is_deterministic_repeated():
    pdf = generate_rows(np.arange(50))
    h = pdf.html.iloc[7]
    outs = {extract_text(h) for _ in range(5)}
    assert len(outs) == 1


def test_normalize_and_tokenize():
    assert normalize_text("  Foo\tBAR  baz ") == "foo bar baz"
    assert tokenize("A b  C") == ["a", "b", "c"]
    assert tokenize("") == []


def test_extract_udf_matches_pure_fn(spark):
    pages = generate_pages(spark, 200)
    from near_duplicate_detection_spark.functions.text import extract_text_udf

    bad = (
        pages.withColumn("extracted", extract_text_udf("html"))
        .where("extracted != text")
        .count()
    )
    assert bad == 0


def test_generator_partition_layout_independent(spark):
    a = generate_pages(spark, 120).orderBy("url").toPandas()
    b = (
        generate_pages(spark, 120)
        .repartition(13)
        .orderBy("url")
        .toPandas()
    )
    assert (a["text"] == b["text"]).all()
    assert (a["url"] == b["url"]).all()
