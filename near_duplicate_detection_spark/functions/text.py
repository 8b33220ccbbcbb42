"""Byte-deterministic HTML→text extraction + tokenization.

Per-row invariant (BASELINE.json input_hint): byte-identical extracted text
per url, every run, every partition layout. The extractor is therefore pure
stdlib — compiled regexes + html.unescape — with no library whose output can
drift. This plays the role of the reference's per-frame image pipeline
(resize/trim, ndd/server_ndd.py:37-60, ndd/utils.py:21-33): the deterministic
per-record transform that feeds signature extraction.

All Spark entry points are Arrow-batched pandas UDFs (no per-row Python UDFs,
per input_hint). Token normalization (casefold + whitespace collapse) is the
graft analog of the reference's image normalization before feature extraction
(ndd/extract_features.py:53-55).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Order matters: comments and script/style bodies go first (their content must
# not leak into text), then tags, then entity decoding, then whitespace.
_RE_COMMENT = re.compile(rb"<!--.*?-->", re.DOTALL)
_RE_SCRIPT = re.compile(rb"<script\b.*?</script\s*>", re.DOTALL | re.IGNORECASE)
_RE_STYLE = re.compile(rb"<style\b.*?</style\s*>", re.DOTALL | re.IGNORECASE)
_RE_TAG = re.compile(rb"<[^>]*>")
_RE_WS = re.compile(r"\s+")


def extract_text(html_bytes: bytes | None) -> str:
    """Pure, deterministic extraction: bytes of HTML → normalized visible text.

    Contract: for the engine's page synthesizer, extract_text(wrap(text)) == text.
    """
    if html_bytes is None:
        return ""
    b = _RE_COMMENT.sub(b" ", html_bytes)
    b = _RE_SCRIPT.sub(b" ", b)
    b = _RE_STYLE.sub(b" ", b)
    b = _RE_TAG.sub(b" ", b)
    s = b.decode("utf-8", errors="replace")
    s = _html.unescape(s)
    return _RE_WS.sub(" ", s).strip()


def normalize_text(s: str) -> str:
    """Casefold + whitespace collapse — the canonical form that is shingled."""
    return _RE_WS.sub(" ", s.casefold()).strip()


def tokenize(s: str) -> list[str]:
    return normalize_text(s).split(" ") if s else []


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction over a binary column."""
    return html.map(extract_text)


@F.pandas_udf(T.StringType())
def normalize_text_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda s: normalize_text(s) if s is not None else "")
