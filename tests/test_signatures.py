"""Signature operators vs brute-force oracles (SURVEY §5.2)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.functions.hashing import (
    apply_perms,
    hash_str_array,
    perm_params,
)
from near_duplicate_detection_spark.functions.signatures import (
    band_hashes,
    compute_signatures_batch,
    shingle_strings,
)
from near_duplicate_detection_spark.functions.text import tokenize
from near_duplicate_detection_spark.sources.pages import generate_rows

CFG = NDDConfig()


def _sigs(pdf):
    a, b = perm_params(CFG.num_perms)
    return compute_signatures_batch(pdf.url, pdf.text, CFG, a, b)


def _oracle_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Independent per-doc reimplementation of the engine's shingle-hash
    family: seeded linear combination of the k token hashes per window,
    computed with an explicit python loop (no shared vectorized code)."""
    from near_duplicate_detection_spark.functions.signatures import (
        _SHINGLE_COMBINE_SEED,
    )

    toks = tokenize(text) or [""]
    th = hash_str_array(toks).view(np.int64)
    coeffs, _ = perm_params(max(k, 1), seed=_SHINGLE_COMBINE_SEED)
    ci = coeffs.view(np.int64)
    out = []
    if len(toks) < k:
        acc = (ci[: len(toks)] * th).sum()
        out.append(acc)
    else:
        for i in range(len(toks) - k + 1):
            out.append((ci * th[i : i + k]).sum())
    return np.unique(np.array(out, dtype=np.int64).view(np.uint64))


def test_minhash_matches_bruteforce_permutation_min():
    pdf = generate_rows(np.arange(120))
    sig = _sigs(pdf)
    a, b = perm_params(CFG.num_perms)
    rng = np.random.RandomState(0)
    for i in rng.choice(len(pdf), 15, replace=False):
        sh = _oracle_shingle_hashes(pdf.text.iloc[i], CFG.shingle_k)
        oracle = apply_perms(sh, a, b).min(axis=0).view(np.int64)
        assert (np.array(sig.minhash.iloc[i]) == oracle).all()


def test_simhash_matches_bitvote_oracle():
    pdf = generate_rows(np.arange(60))
    sig = _sigs(pdf)
    for i in (0, 7, 31, 59):
        toks = tokenize(pdf.text.iloc[i]) or [""]
        h = hash_str_array(toks)
        fp = 0
        for bit in range(64):
            ones = int(((h >> np.uint64(bit)) & np.uint64(1)).sum())
            if ones * 2 > len(h):
                fp |= 1 << bit
        assert int(np.uint64(sig.simhash.iloc[i])) == fp


def test_simhash_near_dups_low_hamming():
    pdf = generate_rows(np.arange(40))
    sig = _sigs(pdf).set_index("url")
    # near group: ids 2, 3, 4
    urls = [u for u in sig.index if u.endswith(("0000000002", "0000000003"))]
    a, b = (np.uint64(sig.loc[u, "simhash"]) for u in urls)
    hamming = bin(int(a) ^ int(b)).count("1")
    assert hamming <= 6


def test_exact_dups_identical_signatures():
    pdf = generate_rows(np.arange(40))
    sig = _sigs(pdf).set_index("url")
    u0 = [u for u in sig.index if u.endswith("0000000000")][0]
    u1 = [u for u in sig.index if u.endswith("0000000001")][0]
    assert list(sig.loc[u0, "minhash"]) == list(sig.loc[u1, "minhash"])
    assert sig.loc[u0, "simhash"] == sig.loc[u1, "simhash"]
    assert list(sig.loc[u0, "bands"]) == list(sig.loc[u1, "bands"])


def test_shingles_short_doc_and_empty():
    assert shingle_strings([], 5) == [""]
    assert shingle_strings(["a", "b"], 5) == ["a b"]
    assert shingle_strings(list("abcdef"), 5) == ["a b c d e", "b c d e f"]


def test_band_hash_shape_and_determinism():
    rng = np.random.RandomState(3)
    m = rng.randint(0, 2**61 - 1, size=(10, 128)).astype(np.uint64)
    b1 = band_hashes(m, 32, 4)
    b2 = band_hashes(m.copy(), 32, 4)
    assert b1.shape == (10, 32)
    assert (b1 == b2).all()


def test_batch_split_invariance():
    """Signatures must not depend on Arrow batch boundaries."""
    pdf = generate_rows(np.arange(100))
    whole = _sigs(pdf)
    a, b = perm_params(CFG.num_perms)
    parts = pd.concat(
        [
            compute_signatures_batch(p.url, p.text, CFG, a, b)
            for p in (pdf.iloc[:33], pdf.iloc[33:67], pdf.iloc[67:])
        ],
        ignore_index=True,
    )
    for col in ("minhash", "bands"):
        assert all(
            list(x) == list(y) for x, y in zip(whole[col], parts[col])
        )
    assert (whole.simhash.values == parts.simhash.values).all()
