"""Unit tests for event operators: sessionization gap semantics and the
as-of join's strictly-earlier rule."""

from __future__ import annotations

import datetime as dt

from database_per_keyword_analysis_spark.operators import events as E


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_sessionize_gap_boundary(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 1, "view", 0.0, "{}"),  # == gap: same session
        (3, t0 + dt.timedelta(minutes=61), 1, "view", 0.0, "{}"),  # > gap from #2: new
        (4, t0, 2, "view", 0.0, "{}"),  # other user independent
    ]
    out = E.sessionize(_ev(spark, rows), gap_minutes=30).collect()
    got = {(r.user_id, r.session_id): r.n_events for r in out}
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_asof_strictly_earlier(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=5), 1, "purchase", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=6), 1, "purchase", 0.0, "{}"),
        (4, t0, 2, "purchase", 0.0, "{}"),  # no prior view -> NULL
        (5, t0 + dt.timedelta(minutes=1), 2, "view", 0.0, "{}"),  # later view ignored
    ]
    out = {r.event_id: r.last_view_ts for r in
           E.asof_last_view_before_purchase(_ev(spark, rows)).collect()}
    assert out[2] == t0
    assert out[3] == t0
    assert out[4] is None
