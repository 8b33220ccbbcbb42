"""Rolling-hash LCS prefilter vs suffix-array oracle: no false negatives."""

from __future__ import annotations

import random
import warnings

from hypothesis import given, settings
from hypothesis import strategies as st

from near_duplicate_detection_spark.functions.suffix import (
    common_run_at_least,
    longest_common_run,
)


def test_no_numpy_overflow_warnings():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert common_run_at_least("abcdefgh" * 10, "abcdefgh" * 10, 20)


def test_planted_run_detected_and_negatives_rejected():
    rng = random.Random(3)

    def rnd(n):
        return " ".join(f"w{rng.randrange(5000)}" for _ in range(n))

    run = rnd(40)
    a = rnd(300) + " " + run + " " + rnd(100)
    b = rnd(200) + " " + run + " " + rnd(250)
    c = rnd(600)
    assert common_run_at_least(a, b, 200)
    assert not common_run_at_least(a, c, 200)


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abcd ", min_size=1, max_size=80),
    st.text(alphabet="abcd ", min_size=1, max_size=80),
    st.integers(min_value=1, max_value=30),
)
def test_prefilter_agrees_with_suffix_oracle(a, b, min_len):
    exact = longest_common_run(a, b) >= min_len
    fast = common_run_at_least(a, b, min_len)
    # no false negatives ever; false positives only via 64-bit collision
    # (probability ~0 at these sizes, so equality is asserted)
    assert fast == exact


def test_short_inputs():
    assert not common_run_at_least("abc", "abc", 10)
    assert common_run_at_least("abcdefghij", "abcdefghij", 10)
