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


_HB = np.int64(np.uint64(1099511628211).astype(np.int64))  # odd poly base


def _powers(n: int) -> np.ndarray:
    """[B^0, B^1, …, B^(n-1)] with int64 wraparound, vectorized."""
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    p = np.empty(n, dtype=np.int64)
    p[0] = 1
    if n > 1:
        p[1:] = np.cumprod(np.full(n - 1, _HB, dtype=np.int64))
    return p


def _pow_b(k: int) -> np.int64:
    # python-int modular exponentiation (numpy scalar ops warn on overflow)
    v = pow(int(np.uint64(_HB.view(np.uint64))), k, 1 << 64)
    return np.uint64(v).astype(np.int64)


def _scaled_window_hashes(codes: np.ndarray, L: int, other_n: int) -> np.ndarray:
    """Hashes of all L-char windows, scaled to B^(n+other_n-2L)·H so hashes
    from two docs of different lengths are directly comparable.

    With weighted prefix sums W[k] = Σ_{j<k} c_j·B^(n-1-j):
      (W[i+L] − W[i]) · B^i = B^(n−L) · H(window i)
    and multiplying by B^(other_n−L) puts both docs on one scale. B is odd →
    multiplication mod 2^64 is a bijection, so equality structure is exact.
    """
    n = len(codes)
    if L > n:
        return np.empty(0, dtype=np.int64)
    powers = _powers(n)
    weighted = codes * powers[::-1]
    csum = np.concatenate(([np.int64(0)], np.cumsum(weighted)))
    d = csum[L : n + 1] - csum[0 : n + 1 - L]
    scaled = d * powers[: n + 1 - L]
    k = other_n - L
    return scaled * _pow_b(k) if k > 0 else scaled


def common_run_at_least(a: str, b: str, min_len: int) -> bool:
    """Vectorized prefilter: do a and b share a verbatim run ≥ min_len chars?

    Window rolling-hash matching at L = min_len. False negatives are
    impossible (equal windows hash equal); a 64-bit collision false positive
    merely sends the pair to the exact suffix-array pass, which decides.
    """
    ca = np.frombuffer(a.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    cb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    if len(ca) < min_len or len(cb) < min_len:
        return False
    ha = _scaled_window_hashes(ca, min_len, len(cb))
    hb = _scaled_window_hashes(cb, min_len, len(ca))
    return bool(np.intersect1d(ha, hb).size)


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
