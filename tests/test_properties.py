"""Property-based invariants of the signature family (hypothesis).

The brute-force oracles in test_signatures.py pin exact values; these pin the
ALGEBRAIC properties the 100 TB design leans on — e.g. the union-min law is
what makes MinHash mergeable (per-bucket signatures could be combined
map-side without re-reading text), and scale/duplication invariance is why
SimHash star-linking of exact-dup groups is sound (pipeline stage 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.functions.hashing import perm_params
from near_duplicate_detection_spark.functions.signatures import (
    _segmented_minhash,
    _segmented_simhash,
    compute_signatures_batch,
)

CFG = NDDConfig()

u64 = st.integers(min_value=0, max_value=2**64 - 1)
hash_sets = st.lists(u64, min_size=1, max_size=200, unique=True)


def _minhash_of(sets: list[list[int]]) -> np.ndarray:
    flat = np.concatenate([np.array(s, dtype=np.uint64) for s in sets])
    offsets = np.zeros(len(sets), dtype=np.int64)
    np.cumsum([len(s) for s in sets[:-1]], out=offsets[1:])
    a, b = perm_params(CFG.num_perms)
    return _segmented_minhash(flat, offsets, a, b)


@settings(max_examples=50, deadline=None)
@given(hash_sets, hash_sets)
def test_minhash_union_is_elementwise_min(sa, sb):
    """sig(A ∪ B) == min(sig(A), sig(B)) componentwise — the mergeability
    law: per-partition signatures can be combined without the raw shingles."""
    sig = _minhash_of([sa, sb, sorted(set(sa) | set(sb))])
    assert (sig[2] == np.minimum(sig[0], sig[1])).all()


@settings(max_examples=50, deadline=None)
@given(hash_sets)
def test_minhash_set_semantics(s):
    """Duplicate shingle occurrences don't change the signature (min over a
    multiset == min over its support) — why the exact-dup star collapse can
    sign one representative per distinct text."""
    sig = _minhash_of([s, s + s, [s[0]] * 5 + s])
    assert (sig[0] == sig[1]).all() and (sig[0] == sig[2]).all()


@settings(max_examples=50, deadline=None)
@given(hash_sets)
def test_simhash_duplication_invariant(s):
    """Replicating every token occurrence r× preserves the unweighted
    bit-vote fingerprint (votes and threshold scale together)."""
    flat = np.array(s * 3, dtype=np.uint64)
    offsets = np.array([0, len(s)], dtype=np.int64)
    fp = _segmented_simhash(flat, offsets)
    assert fp[0] == fp[1]


@settings(max_examples=20, deadline=None)
@given(st.lists(u64, min_size=20, max_size=120, unique=True), st.randoms())
def test_minhash_jaccard_estimator(pool, rnd):
    """Componentwise-match fraction estimates exact Jaccard within 5σ of the
    binomial bound at num_perms components (the recall math behind the LSH
    band thresholds, SURVEY §4.2)."""
    cut = rnd.randint(1, len(pool) - 1)
    keep = rnd.randint(0, cut)
    sa, sb = pool[:cut], pool[keep:]
    inter = len(set(sa) & set(sb))
    j = inter / len(set(sa) | set(sb))
    sig = _minhash_of([sa, sb])
    est = float((sig[0] == sig[1]).mean())
    sigma = (j * (1 - j) / CFG.num_perms) ** 0.5
    assert abs(est - j) <= 5 * sigma + 1e-9


def test_signature_batch_unicode_robustness():
    """Stage-1 batch extraction is total and deterministic over non-ASCII
    content: CJK, emoji, combining marks, RTL, NUL-adjacent controls — the
    web-crawl reality the pages table carries (input_hint: text column of
    Common-Crawl-style pages)."""
    texts = [
        "统一码 万国码 单一码 统一码 万国码",
        "🙂 🚀 🙂 🚀 data 🙂 emoji stream",
        "café résumé naïve words here",
        "שלום עולם hello world مرحبا بالعالم",
        "ctrl\x01chars\x02mixed\tin text here",
        "",
        " \t\n ",
    ]
    pdf = pd.DataFrame(
        {"url": [f"u{i}" for i in range(len(texts))], "text": texts}
    )
    a, b = perm_params(CFG.num_perms)
    s1 = compute_signatures_batch(pdf.url, pdf.text, CFG, a, b)
    s2 = compute_signatures_batch(pdf.url, pdf.text, CFG, a, b)
    assert len(s1) == len(texts)
    for i in range(len(texts)):
        assert np.array_equal(s1.minhash.iloc[i], s2.minhash.iloc[i])
        assert s1.simhash.iloc[i] == s2.simhash.iloc[i]
    # split-batch invariance on unicode too
    h1 = compute_signatures_batch(pdf.url[:3], pdf.text[:3], CFG, a, b)
    assert np.array_equal(s1.minhash.iloc[1], h1.minhash.iloc[1])
