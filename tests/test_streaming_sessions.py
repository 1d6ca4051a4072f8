"""Custom stateful streaming sessionizer (applyInPandasWithState +
event-time timeout): in-batch gap closure, cross-batch continuation,
timeout closure, and agreement with a batch oracle."""

from datetime import datetime, timedelta

import pandas as pd
import pytest

from datafusion_functions_financial_spark.streaming.sessions import (
    make_sessionizer,
    sessionize_stream,
)
from datafusion_functions_financial_spark.streaming.spark import TICK_SCHEMA

BASE = datetime(2024, 1, 1, 9, 0, 0)


def _ticks(spec):
    """spec: list of (symbol, seconds_offset)."""
    return pd.DataFrame([
        dict(symbol=s, timestamp=BASE + timedelta(seconds=sec),
             price=1.0, volume=1, bid=None, ask=None)
        for s, sec in spec
    ])


def _batch_sessions(pdf, gap_s):
    """Pandas oracle: sessions per symbol by the same gap rule."""
    out = []
    for sym, g in pdf.groupby("symbol"):
        ts = g["timestamp"].sort_values().tolist()
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if (t - last).total_seconds() > gap_s:
                out.append((sym, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        out.append((sym, start, last, n))
    return sorted(out)


@pytest.mark.slow
def test_in_batch_gaps_match_batch_oracle(spark, tmp_path):
    spec = ([("A", s) for s in (0, 10, 20, 1000, 1010)]     # 2 sessions
            + [("B", s) for s in (5, 2000, 2001, 5000)])    # 3 sessions
    pdf = _ticks(spec)
    src = tmp_path / "sess_src"
    spark.createDataFrame(pdf, schema=TICK_SCHEMA).write.parquet(str(src))

    stream = spark.readStream.schema(TICK_SCHEMA).parquet(str(src))
    sessions = sessionize_stream(stream, gap_seconds=300)
    q = (sessions.writeStream.format("memory").queryName("cust_sess")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM cust_sess").collect()
    got = sorted(
        (r.symbol, r.session_start, r.session_end, r.n_events)
        for r in rows
    )
    oracle = _batch_sessions(pdf, 300)
    # The stream emits CLOSED sessions only. After the data batch the
    # watermark sits at max_event (B@5000s) - 30min = 3200s: A's tail
    # session (ends 1010s) is idle past its gap, so the availableNow
    # run closes it via event-time TIMEOUT before terminating; B's
    # tail (5000s) stays open in state and is withheld.
    open_tail = {max(s for s in oracle if s[0] == "B")}
    assert got == sorted(set(oracle) - open_tail)
    by = {(r.symbol, r.session_start): r.closed_by for r in rows}
    a_tail = max(s for s in oracle if s[0] == "A")
    assert by[("A", a_tail[1])] == "timeout"
    assert sorted(set(by.values())) == ["gap", "timeout"]


@pytest.mark.slow
def test_timeout_closes_idle_session(spark, tmp_path):
    src = tmp_path / "sess_to"
    src.mkdir()
    # Batch 1: one burst for A. Batch 2 (separate file, later data for
    # another key) advances the watermark far past A's gap -> A's open
    # session must close via EventTimeTimeout.
    b1 = _ticks([("A", 0), ("A", 10)])
    b2 = _ticks([("B", 7200), ("B", 7210)])
    # coalesce(1): exactly one part-file per directory, so
    # maxFilesPerTrigger=1 gives deterministic batch boundaries.
    spark.createDataFrame(b1, schema=TICK_SCHEMA).coalesce(1) \
        .write.parquet(str(src / "f=1"))
    spark.createDataFrame(b2, schema=TICK_SCHEMA).coalesce(1) \
        .write.parquet(str(src / "f=2"))

    stream = (spark.readStream.schema(TICK_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/f=*"))
    sessions = sessionize_stream(stream, gap_seconds=300,
                                 watermark="1 minute")
    q = (sessions.writeStream.format("memory").queryName("to_sess")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = {r.symbol: r for r in
            spark.sql("SELECT * FROM to_sess").collect()}
    assert "A" in rows, "idle session was not closed by timeout"
    a = rows["A"]
    assert a.closed_by == "timeout" and a.n_events == 2
    assert a.session_start == BASE
    assert a.session_end == BASE + timedelta(seconds=10)


def test_sessionizer_fn_unit_continuation():
    """Drive the state-transition function directly: a stored open
    session extends when the next batch is within the gap."""
    fn = make_sessionizer(300)

    class FakeState:
        def __init__(self, value):
            self._v = value
            self.exists = value is not None
            self.hasTimedOut = False
            self.updated = None
            self.removed = False

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.updated = v

        def remove(self):
            self.removed = True

        def getCurrentWatermarkMs(self):
            return 0

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

    t0 = int(BASE.timestamp()) * 1_000_000
    st = FakeState((t0, t0 + 10_000_000, 2))
    batch = _ticks([("A", 100), ("A", 110)])  # within 300s of last
    out = list(fn(("A",), iter([batch]), st))
    assert out == []                       # nothing closed
    assert st.updated[2] == 4              # 2 + 2 events merged
    assert st.updated[0] == t0             # start preserved

    # Next batch far away -> stored session closes in-batch.
    st2 = FakeState((t0, t0 + 10_000_000, 2))
    far = _ticks([("A", 5000)])
    out2 = list(fn(("A",), iter([far]), st2))
    assert len(out2) == 1 and out2[0]["closed_by"][0] == "gap"
    assert out2[0]["n_events"][0] == 2
    assert st2.updated[2] == 1             # new open session of 1
