"""Batch/stream parity tests (SURVEY.md §5.2.5): the same query over
read vs readStream must agree when driven with availableNow."""

from __future__ import annotations

import pytest

from database_per_keyword_analysis_spark.sources import load
from database_per_keyword_analysis_spark.streaming import windows as SW


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    # cast NTZ → TIMESTAMP to mirror the stream reader (identical values
    # under the UTC session timezone)
    ev = load(spark, sf_dir, "events")
    return ev.withColumn("ts", ev.ts.cast("timestamp"))


@pytest.fixture(scope="module")
def stream_events(spark, sf_dir):
    return SW.read_events_stream(spark, sf_dir)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_window_parity(batch_events, stream_events):
    batch = SW.windowed_counts(batch_events)
    stream = SW.run_to_memory(SW.windowed_counts(stream_events), "t_tumble")
    cols = ["window_start", "window_end", "n"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_sliding_window_parity(batch_events, stream_events):
    batch = SW.windowed_counts(batch_events, "1 day", "6 hours")
    stream = SW.run_to_memory(
        SW.windowed_counts(stream_events, "1 day", "6 hours"), "t_slide"
    )
    cols = ["window_start", "window_end", "n"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_session_window_parity(batch_events, stream_events):
    batch = SW.session_window_counts(batch_events)
    stream = SW.run_to_memory(SW.session_window_counts(stream_events), "t_sess")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_session_matches_batch_sessionize(batch_events):
    """session_window must agree with the window-function formulation."""
    from database_per_keyword_analysis_spark.operators import events as E

    a = {
        (r.user_id, r.session_start, r.n_events)
        for r in SW.session_window_counts(batch_events).collect()
    }
    b = {
        (r.user_id, r.session_start, r.n_events)
        for r in E.sessionize(batch_events).collect()
    }
    assert a == b


def test_streaming_dedup(spark, stream_events, batch_events):
    out = SW.run_append_to_memory(SW.deduped_stream(stream_events), "t_dedup")
    assert out.count() == batch_events.select("event_id").distinct().count()
