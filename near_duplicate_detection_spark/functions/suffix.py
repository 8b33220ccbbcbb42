"""Suffix-array longest-common-run — the exact long-repeat verifier.

Pure numpy prefix-doubling suffix array (O(n log² n)) + Kasai LCP, then the
longest common substring of two docs = max LCP between adjacent suffixes that
originate in different docs of the concatenation a ⊕ sep ⊕ b. Deterministic,
no external libs; runs inside the stage-2b verification UDF over candidate
pairs only (never the full corpus).
"""

from __future__ import annotations

import numpy as np


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array of an int array (values ≥ 0) via prefix doubling."""
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # MUST copy: the rank/tmp buffer swap below would otherwise write into
    # the caller's array (tmp aliases the previous rank, which on the first
    # iteration would be `codes` itself)
    rank = np.array(codes, dtype=np.int64, copy=True)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while True:
        # sort key: (rank[i], rank[i+k] or -1)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order.astype(np.int64)
        # re-rank
        prev = sa[:-1]
        curr = sa[1:]
        new_group = (rank[curr] != rank[prev]) | (second[curr] != second[prev])
        tmp[sa[0]] = 0
        tmp[curr] = np.cumsum(new_group)
        rank, tmp = tmp.copy(), rank
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def lcp_array(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i-1], suffix sa[i]); lcp[0] = 0."""
    n = len(codes)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and codes[i + h] == codes[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h > 0:
                h -= 1
    return lcp


def longest_common_run(a: str, b: str) -> int:
    """Length (chars) of the longest verbatim substring shared by a and b."""
    if not a or not b:
        return 0
    ca = np.frombuffer(a.encode("utf-8"), dtype=np.uint8).astype(np.int64) + 2
    cb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8).astype(np.int64) + 2
    sep = np.array([1], dtype=np.int64)  # sentinel below every real byte
    codes = np.concatenate([ca, sep, cb])
    boundary = len(ca)  # index of the sentinel
    sa = suffix_array(codes)
    lcp = lcp_array(codes, sa)
    from_a = sa < boundary
    if len(sa) < 2:
        return 0
    cross = from_a[1:] != from_a[:-1]  # adjacent suffixes from different docs
    if not cross.any():
        return 0
    return int(lcp[1:][cross].max())
