"""Property tests of the adaptive-threshold sampling ALGEBRA (pure
Python model, no Spark): the two identities the streaming sink's
oracle contract rests on, driven over arbitrary stream splits.

Model = exactly the fold `streaming/sketches.adaptive_sample_batch`
performs: per epoch, admit batch rows under the current threshold,
then tighten the exponent until the state fits the cap.
"""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

SPAN = 1 << 20


def _coin(i) -> int:
    return int(hashlib.md5(f"{i}:as".encode()).hexdigest()[:5], 16)


def _fold(batches, cap, max_exp=20):
    """The streaming fold: returns (state_ids, j)."""
    state, j = set(), 0
    for batch in batches:
        state |= {i for i in batch if _coin(i) < (SPAN >> j)}
        while len(state) > cap and j < max_exp:
            j += 1
            state = {i for i in state if _coin(i) < (SPAN >> j)}
        # idempotent re-filter at the (possibly unchanged) threshold
        state = {i for i in state if _coin(i) < (SPAN >> j)}
    return state, j


def _batch_j(ids, cap, max_exp=20):
    """The batch rule: smallest j whose full-stream sample fits cap."""
    for j in range(max_exp + 1):
        if len({i for i in ids if _coin(i) < (SPAN >> j)}) <= cap:
            return j
    return max_exp


@settings(max_examples=200, deadline=None)
@given(
    splits=st.lists(
        st.lists(st.integers(min_value=0, max_value=100_000), max_size=300),
        min_size=1,
        max_size=6,
    ),
    cap=st.integers(min_value=1, max_value=64),
)
def test_stream_fold_equals_batch_filter_at_batch_threshold(splits, cap):
    """Identity 1: streaming-final j == batch smallest-fitting j.
    Identity 2: streaming state == filter(full stream, coin < 2^20>>j).
    Holds for ANY split of the stream into epochs, any cap — including
    duplicate ids across epochs and empty batches."""
    all_ids = {i for b in splits for i in b}
    state, j = _fold(splits, cap)
    assert j == _batch_j(all_ids, cap)
    assert state == {i for i in all_ids if _coin(i) < (SPAN >> j)}
    assert len(state) <= cap or j == 20


@settings(max_examples=100, deadline=None)
@given(
    splits=st.lists(
        st.lists(st.integers(min_value=0, max_value=50_000), max_size=200),
        min_size=2,
        max_size=5,
    ),
    cap=st.integers(min_value=2, max_value=32),
)
def test_threshold_is_monotone_and_prefix_consistent(splits, cap):
    """j never decreases across epochs, and every prefix's state obeys
    the same batch identity (the epoch store is a valid sample at
    EVERY point in time, not just at the end)."""
    prev_j = 0
    for e in range(1, len(splits) + 1):
        prefix = splits[:e]
        state, j = _fold(prefix, cap)
        assert j >= prev_j
        prev_j = j
        ids = {i for b in prefix for i in b}
        assert j == _batch_j(ids, cap)
        assert state == {i for i in ids if _coin(i) < (SPAN >> j)}
