"""URL canonicalization for web-corpus dedup keys.

Exact-dup grouping on raw urls misses the same page fetched as
``HTTP://WWW.Site.COM/p?utm_source=feed#top`` and ``http://www.site.com/p``.
This is the url-normalization front of the reference's per-video identity
key (the reference keys its index by videoid, ndd/server_ndd.py:127-141;
a web corpus's videoid analog is the canonical url).

Every step is an anchored or global ``regexp_replace`` chosen to evaluate
identically under Java regex (Spark) and RE2 (DuckDB oracles): no
lookaround, no backreferences in patterns, explicit alternations only.
All JVM-side codegen — no UDFs — so canonicalization runs map-side at
corpus scale with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking parameters stripped from query strings (public lists: utm_*
# campaign tags, facebook/google click ids)
_TRACKING_PARAM = r"(utm_[a-zA-Z]+|fbclid|gclid)"


def canonicalize_url(url_col: str | Column) -> Column:
    """Canonical form: lowercased scheme+authority, default ports dropped,
    tracking params and fragment stripped, dangling ``?``/``&`` trimmed."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    # 1. drop the fragment
    url = F.regexp_replace(url, r"#.*$", "")
    # 2. lowercase scheme://host[:port] only (path/query stay case-exact)
    head = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", 0)
    url = F.concat(F.lower(head), F.substr(url, F.length(head) + 1))
    # 3. drop scheme-default ports (http:80, https:443) — other ports stay
    url = F.regexp_replace(url, r"^(http://[^/:?]+):80([/?]|$)", r"$1$2")
    url = F.regexp_replace(url, r"^(https://[^/:?]+):443([/?]|$)", r"$1$2")
    # 4. strip tracking params (with their leading separator)
    url = F.regexp_replace(url, r"[?&]" + _TRACKING_PARAM + r"=[^&#]*", "")
    # 5. if the first surviving param lost its '?', restore it
    url = F.regexp_replace(url, r"^([^?&]*)&", r"$1?")
    # 6. trim a dangling separator
    return F.regexp_replace(url, r"[?&]+$", "")


def url_host(url_col: str | Column) -> Column:
    """Hostname of an (ideally canonicalized) url — the partition/skew key
    for host-level corpus statistics."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)


def registered_domain(host_col: Column) -> Column:
    """Last-two-labels approximation of the registrable domain (a true
    public-suffix-list lookup is a broadcast dim join in production; the
    two-label rule is the deterministic, dependency-free stand-in)."""
    return F.regexp_extract(host_col, r"([^.]+\.[^.]+)$", 1)
