"""LSH band-scheme tuning: the S-curve math behind the engine's defaults.

For a MinHash signature split into b bands of r rows, a pair with true
Jaccard J collides in ≥1 band with probability

    p(J) = 1 - (1 - J^r)^b

The curve's waterline (50% collision point) sits at t ≈ (1/b)^(1/r).
The engine's default 32×4 (config.py) puts t = (1/32)^(1/4) ≈ 0.42, well
below the 0.6 verify threshold. Exact floor values for that scheme:
p(0.60) = 0.9882, p(0.62) = 0.9940, p(0.70) = 0.9999 — i.e. LSH alone
gives ≥0.99 for J ≳ 0.62, and 0.988 for a pair sitting EXACTLY at the
verify threshold. The corpus-level ≥0.99 recall gate (north rule; e2e
pytest) holds because real dup mass sits far above the waterline and the
pipeline adds two non-LSH recall paths: exact-duplicate star edges and the
SimHash fallback on flagged buckets (operators/lsh.py). Candidates are
generous by design — exact-Jaccard verify is the precision gate, so a low
waterline costs verify work, not correctness.

These are driver-side planning helpers (pure math, no Spark): size a band
scheme before a 100 TB run instead of discovering recall after it.
"""

from __future__ import annotations

import math


def collision_probability(j: float, bands: int, rows: int) -> float:
    """P(pair with Jaccard j shares ≥1 LSH band) = 1 - (1 - j^r)^b."""
    if not 0.0 <= j <= 1.0:
        raise ValueError(f"jaccard must be in [0,1], got {j}")
    return 1.0 - (1.0 - j**rows) ** bands


def threshold(bands: int, rows: int) -> float:
    """Approximate S-curve waterline (1/b)^(1/r) — the Jaccard at which
    collision probability crosses ~50%."""
    return (1.0 / bands) ** (1.0 / rows)


def choose_scheme(
    num_perms: int,
    target_jaccard: float,
    min_recall: float = 0.99,
) -> tuple[int, int]:
    """Pick (bands, rows) with bands*rows == num_perms such that pairs at
    target_jaccard collide with probability ≥ min_recall, preferring the
    LARGEST rows (fewest false candidates) that still meets recall.

    Raises if no factorization meets the target — the caller must raise
    num_perms, not silently accept lower recall.
    """
    best: tuple[int, int] | None = None
    for rows in range(1, num_perms + 1):
        if num_perms % rows:
            continue
        bands = num_perms // rows
        if collision_probability(target_jaccard, bands, rows) >= min_recall:
            best = (bands, rows)  # rows ascending: keep the largest feasible
    if best is None:
        raise ValueError(
            f"no (bands, rows) with bands*rows={num_perms} reaches "
            f"recall {min_recall} at J={target_jaccard}; increase num_perms"
        )
    return best


def expected_candidate_rate(j: float, bands: int, rows: int) -> float:
    """Alias of collision_probability for the false-positive reading: the
    fraction of pairs AT Jaccard j that become candidates (verify load)."""
    return collision_probability(j, bands, rows)


def recall_floor(bands: int, rows: int, verify_jaccard: float) -> float:
    """Worst-case candidate recall over pairs the verify stage would accept
    (J ≥ verify_jaccard): p is increasing in J, so the floor is at the
    threshold itself."""
    return collision_probability(verify_jaccard, bands, rows)


def s_curve(bands: int, rows: int, steps: int = 21) -> list[tuple[float, float]]:
    """(J, p(J)) samples for reporting/plots."""
    if steps < 2:
        raise ValueError("steps must be >= 2")
    return [
        (i / (steps - 1), collision_probability(i / (steps - 1), bands, rows))
        for i in range(steps)
    ]


def describe(bands: int, rows: int, verify_jaccard: float) -> dict:
    """One-call scheme summary (used by reports/logs)."""
    return {
        "bands": bands,
        "rows": rows,
        "num_perms": bands * rows,
        "waterline": round(threshold(bands, rows), 4),
        "recall_floor_at_verify": round(
            recall_floor(bands, rows, verify_jaccard), 6
        ),
        "noise_rate_at_half_verify": round(
            collision_probability(verify_jaccard / 2, bands, rows), 6
        ),
    }
