"""Property-based tests for the streaming sessionizer transition
function: for ANY event set split arbitrarily into chunks, the closed
sessions plus the surviving open-session state must equal a
straightforward pandas gap-scan oracle."""

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_functions_financial_spark.streaming.sessions import (
    make_sessionizer,
)

BASE = datetime(2024, 1, 1)
GAP_S = 300


class FakeState:
    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def remove(self):
        self._v = None
        self.exists = False

    def getCurrentWatermarkMs(self):
        return 0

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _oracle(seconds, gap_s=GAP_S):
    """All sessions (start_us, last_us, n) from a sorted gap scan."""
    out = []
    ts = sorted(seconds)
    start = last = ts[0]
    n = 1
    for t in ts[1:]:
        if t - last > gap_s:
            out.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    out.append((start, last, n))
    return [
        (s * 1_000_000 + int(BASE.timestamp()) * 1_000_000,
         e * 1_000_000 + int(BASE.timestamp()) * 1_000_000, k)
        for s, e, k in out
    ]


def _chunk_frames(seconds, split_points):
    """Split the (unsorted) event list into chunk DataFrames."""
    frames, prev = [], 0
    bounds = sorted({min(p, len(seconds)) for p in split_points})
    for b in bounds + [len(seconds)]:
        part = seconds[prev:b]
        prev = b
        frames.append(pd.DataFrame({
            "timestamp": [BASE + timedelta(seconds=int(s)) for s in part]
        }))
    return frames


@settings(max_examples=60, deadline=None)
@given(
    seconds=st.lists(
        st.integers(min_value=0, max_value=5000),
        min_size=1, max_size=40, unique=True,
    ),
    splits=st.lists(st.integers(min_value=0, max_value=40), max_size=3),
    order_seed=st.randoms(use_true_random=False),
)
def test_closed_plus_open_equals_oracle(seconds, splits, order_seed):
    shuffled = list(seconds)
    order_seed.shuffle(shuffled)  # arbitrary chunk arrival order
    fn = make_sessionizer(GAP_S)
    st_ = FakeState()
    closed = []
    for out in fn(("K",), iter(_chunk_frames(shuffled, splits)), st_):
        for r in out.itertuples():
            closed.append((
                int(r.session_start.value // 1000),
                int(r.session_end.value // 1000),
                int(r.n_events),
            ))
    sessions = list(closed)
    if st_.exists:
        s, e, n = st_.get
        sessions.append((int(s), int(e), int(n)))
    oracle = _oracle(seconds)
    assert sorted(sessions) == sorted(oracle)
    # The open state, if any, must be the LAST oracle session.
    if st_.exists:
        s, e, n = st_.get
        assert (int(s), int(e), int(n)) == oracle[-1]


@settings(max_examples=60, deadline=None)
@given(
    seconds=st.lists(
        st.integers(min_value=0, max_value=5000),
        min_size=1, max_size=40, unique=True,
    ),
    splits=st.lists(st.integers(min_value=0, max_value=40), max_size=4),
)
def test_multi_batch_in_order_equals_oracle(seconds, splits):
    """Consecutive micro-batches of an IN-ORDER stream (state carried
    between invocations) reproduce the batch gap scan exactly."""
    ordered = sorted(seconds)
    fn = make_sessionizer(GAP_S)
    st_ = FakeState()
    closed = []
    for frame in _chunk_frames(ordered, splits):
        for out in fn(("K",), iter([frame]), st_):
            for r in out.itertuples():
                closed.append((
                    int(r.session_start.value // 1000),
                    int(r.session_end.value // 1000),
                    int(r.n_events),
                ))
    sessions = list(closed)
    if st_.exists:
        s, e, n = st_.get
        sessions.append((int(s), int(e), int(n)))
    assert sessions == _oracle(seconds)
