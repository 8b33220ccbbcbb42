"""LSH tuning math (operators/lsh_tuning.py): S-curve vs Monte-Carlo over
the REAL signature family, engine-default recall floor, scheme solver."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.functions.hashing import perm_params
from near_duplicate_detection_spark.functions.signatures import (
    _segmented_minhash,
    band_hashes,
)
from near_duplicate_detection_spark.operators.lsh_tuning import (
    choose_scheme,
    collision_probability,
    describe,
    recall_floor,
    threshold,
)

CFG = NDDConfig()


def test_engine_default_recall_floor():
    """32 bands × 4 rows: p = 0.9882 at EXACTLY J=0.6, ≥0.99 from J≈0.62 up
    — the precise LSH leg of the north rule's ≥0.99 dup-pair recall (the
    corpus gate additionally rides on exact-star edges + SimHash fallback,
    see lsh_tuning module docstring)."""
    floor = recall_floor(CFG.lsh_bands, CFG.lsh_rows, CFG.jaccard_threshold)
    assert 0.988 < floor < 0.99
    assert collision_probability(0.62, CFG.lsh_bands, CFG.lsh_rows) >= 0.99
    assert collision_probability(0.70, CFG.lsh_bands, CFG.lsh_rows) >= 0.999
    assert 0.35 < threshold(CFG.lsh_bands, CFG.lsh_rows) < 0.5


@settings(max_examples=40, deadline=None)
@given(
    st.floats(min_value=0.0, max_value=1.0),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=16),
)
def test_probability_is_monotone_and_bounded(j, bands, rows):
    p = collision_probability(j, bands, rows)
    assert 0.0 <= p <= 1.0
    assert collision_probability(min(j + 0.05, 1.0), bands, rows) >= p - 1e-12


def test_choose_scheme_engine_config():
    # at a strict 0.99 floor the 4-row scheme is infeasible (p=0.9882):
    # the solver must step down to rows=2
    bands, rows = choose_scheme(
        CFG.num_perms, CFG.jaccard_threshold, min_recall=0.99
    )
    assert bands * rows == CFG.num_perms
    assert collision_probability(CFG.jaccard_threshold, bands, rows) >= 0.99
    assert rows == 2
    # the engine default IS the optimum at a 0.98 floor (most selective
    # feasible scheme — fewest false candidates)
    assert choose_scheme(CFG.num_perms, CFG.jaccard_threshold, 0.98) == (
        CFG.lsh_bands,
        CFG.lsh_rows,
    )
    with pytest.raises(ValueError):
        choose_scheme(4, 0.05, min_recall=0.999999)


def test_s_curve_matches_real_signature_family():
    """Monte-Carlo over the actual MinHash+band pipeline: empirical band-
    collision rate at a controlled Jaccard must track 1-(1-J^r)^b within
    Monte-Carlo noise — the formula describes THIS family, not an ideal one."""
    rng = np.random.RandomState(7)
    a, b_par = perm_params(CFG.num_perms)
    n_pairs = 300
    j_target = 0.6
    hits = 0
    for _ in range(n_pairs):
        n = 400
        shared = rng.randint(0, 2**63, size=int(n * 2 * j_target / (1 + j_target)))
        only = (n * 2 - 2 * len(shared)) // 2
        sa = np.concatenate([shared, rng.randint(0, 2**63, size=only)]).astype(
            np.uint64
        )
        sb = np.concatenate([shared, rng.randint(0, 2**63, size=only)]).astype(
            np.uint64
        )
        flat = np.concatenate([sa, sb])
        offsets = np.array([0, len(sa)], dtype=np.int64)
        sig = _segmented_minhash(flat, offsets, a, b_par)
        bh = band_hashes(sig, CFG.lsh_bands, CFG.lsh_rows)
        hits += bool((bh[0] == bh[1]).any())
    empirical = hits / n_pairs
    # true J of the construction
    j_true = len(shared) / (2 * n - len(shared))
    expected = collision_probability(j_true, CFG.lsh_bands, CFG.lsh_rows)
    assert abs(empirical - expected) < 0.05, (empirical, expected)


def test_describe_shape():
    d = describe(CFG.lsh_bands, CFG.lsh_rows, CFG.jaccard_threshold)
    assert d["num_perms"] == CFG.num_perms
    assert d["recall_floor_at_verify"] >= 0.988


def test_s_curve_and_candidate_rate():
    from near_duplicate_detection_spark.operators.lsh_tuning import (
        expected_candidate_rate,
        s_curve,
    )

    pts = s_curve(CFG.lsh_bands, CFG.lsh_rows, steps=11)
    assert pts[0] == (0.0, 0.0) and pts[-1][1] == 1.0
    assert all(b[1] >= a[1] for a, b in zip(pts, pts[1:]))  # monotone
    assert expected_candidate_rate(
        0.3, CFG.lsh_bands, CFG.lsh_rows
    ) == collision_probability(0.3, CFG.lsh_bands, CFG.lsh_rows)
    with pytest.raises(ValueError):
        s_curve(CFG.lsh_bands, CFG.lsh_rows, steps=1)
