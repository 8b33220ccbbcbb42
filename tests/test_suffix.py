"""Suffix-array unit tests vs brute-force oracles."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from near_duplicate_detection_spark.functions.suffix import (
    lcp_array,
    longest_common_run,
    suffix_array,
)


def _brute_sa(s: str) -> list[int]:
    return sorted(range(len(s)), key=lambda i: s[i:])


def _brute_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


def test_suffix_array_small():
    for s in ("banana", "aaaa", "abcabc", "a", "ab", "ba", "mississippi"):
        codes = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
        assert suffix_array(codes).tolist() == _brute_sa(s), s


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abcd", min_size=1, max_size=60))
def test_suffix_array_matches_bruteforce(s):
    codes = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
    assert suffix_array(codes).tolist() == _brute_sa(s)


def test_lcp_kasai():
    s = "banana"
    codes = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
    sa = suffix_array(codes)
    lcp = lcp_array(codes, sa)
    # suffixes sorted: a, ana, anana, banana, na, nana → lcp 0,1,3,0,0,2
    assert lcp.tolist() == [0, 1, 3, 0, 0, 2]


@settings(max_examples=40, deadline=None)
@given(
    st.text(alphabet="abc ", min_size=1, max_size=50),
    st.text(alphabet="abc ", min_size=1, max_size=50),
)
def test_lcs_matches_bruteforce(a, b):
    assert longest_common_run(a, b) == _brute_lcs(a, b)


def test_lcs_planted_run():
    run = "x" * 7 + "the shared verbatim segment appears here once"
    a = "left padding words " + run + " and unrelated tail"
    b = "completely different document " + run + " something else"
    assert longest_common_run(a, b) >= len(run)


def test_lcs_empty_and_disjoint():
    assert longest_common_run("", "abc") == 0
    assert longest_common_run("abc", "") == 0
    assert longest_common_run("aaa", "bbb") == 0


def test_lcs_unicode():
    assert longest_common_run("héllo wörld", "wörld héllo") >= len("héllo".encode())
