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


def test_daily_value_locf_fills_gaps_not_leading_nulls(spark):
    import datetime as dt
    from database_per_keyword_analysis_spark.operators.events import daily_value_locf

    rows = [
        # user 1: observed day 1 (two events -> mean), gap day 2, observed day 3
        (1, "click", dt.datetime(2024, 1, 1, 5), 10.0),
        (1, "click", dt.datetime(2024, 1, 1, 9), 20.0),
        (1, "click", dt.datetime(2024, 1, 3, 5), 7.0),
        # user 2: first observation day 2 -> day 1 must stay NULL
        (2, "click", dt.datetime(2024, 1, 2, 5), 5.0),
    ]
    ev = spark.createDataFrame(
        [(i, ts, uid, et, v, None) for i, (uid, et, ts, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        (r.user_id, str(r.day)): (r.value_locf, r.observed)
        for r in daily_value_locf(ev).collect()
    }
    assert len(out) == 6  # 2 series x 3 spine days
    assert out[(1, "2024-01-01")] == (15.0, True)   # exact mean of 10, 20
    assert out[(1, "2024-01-02")] == (15.0, False)  # gap carried forward
    assert out[(1, "2024-01-03")] == (7.0, True)    # new observation wins
    assert out[(2, "2024-01-01")] == (None, False)  # before first obs: NULL
    assert out[(2, "2024-01-02")] == (5.0, True)
    assert out[(2, "2024-01-03")] == (5.0, False)


def test_funnel_report_enforces_strict_order(spark):
    """Round-9 funnel contract: stage k counts only users whose
    stage-k event comes STRICTLY after their stage-(k-1) reach time —
    co-occurrence in the wrong order does not convert; ties on one
    instant do not advance; conversion ratios are vs stage 1."""
    import datetime as dt

    from database_per_keyword_analysis_spark.operators import events as EV

    t = dt.datetime.fromisoformat
    rows = [
        # u1: full ordered journey
        (1, "view", t("2024-01-01 10:00")),
        (1, "click", t("2024-01-01 11:00")),
        (1, "purchase", t("2024-01-01 12:00")),
        # u2: purchase BEFORE click -> stops at click
        (2, "view", t("2024-01-01 10:00")),
        (2, "purchase", t("2024-01-01 10:30")),
        (2, "click", t("2024-01-01 11:00")),
        # u3: click tied to view instant -> tie does not advance
        (3, "view", t("2024-01-01 10:00")),
        (3, "click", t("2024-01-01 10:00")),
        # u4: never viewed -> not in funnel at all
        (4, "click", t("2024-01-01 10:00")),
        (4, "purchase", t("2024-01-01 11:00")),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp_ntz")
    out = {r.stage: (r.event_type, r.n_users, r.conversion)
           for r in EV.funnel_report(df, ["view", "click", "purchase"]).collect()}
    assert out[1] == ("view", 3, 1.0)
    assert out[2] == ("click", 2, round(2 / 3, 6))
    assert out[3] == ("purchase", 1, round(1 / 3, 6))


def test_top_user_paths_orders_and_bounds(spark):
    """Round-9 path contract: events order by (ts, event_id) inside
    each user's path, only the first k events contribute, and the
    report ranks by user count with the path string breaking ties."""
    import datetime as dt

    from database_per_keyword_analysis_spark.operators import events as EV

    t = dt.datetime.fromisoformat
    rows = [
        # two users share view>click; one continues (beyond k=2 cut)
        (1, 10, "view", t("2024-01-01 10:00")),
        (1, 11, "click", t("2024-01-01 11:00")),
        (1, 12, "purchase", t("2024-01-01 12:00")),
        (2, 20, "view", t("2024-01-01 10:00")),
        (2, 21, "click", t("2024-01-01 11:00")),
        # same-instant tie ordered by event_id: error(30) before view(31)
        (3, 31, "view", t("2024-01-01 10:00")),
        (3, 30, "error", t("2024-01-01 10:00")),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp_ntz"
    )
    out = [(r.path, r.n_users) for r in EV.top_user_paths(df, first_k=2).collect()]
    assert out == [("view>click", 2), ("error>view", 1)]


def test_daily_value_interp_contracts(spark):
    """r10 interpolation contracts on a hand-built series: observed
    days keep their exact mean, an interior gap gets the time-weighted
    blend, days before the first / after the last observation stay
    NULL, and a one-day series interpolates nothing."""
    import datetime as dt

    from database_per_keyword_analysis_spark.operators.events import (
        daily_value_interp,
    )

    d = lambda s: dt.datetime(2024, 1, s, 12, 0, 0)
    rows = [
        # series A: obs on day 2 (value 10) and day 5 (value 40);
        # two obs on day 2 so the daily MEAN (10) is exercised
        ("A", 1, d(2), 8.0),
        ("A", 1, d(2), 12.0),
        ("A", 1, d(5), 40.0),
        # series B: single obs on day 3 — nothing to interpolate
        ("B", 2, d(3), 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts timestamp_ntz, value double"
    )
    out = {
        (r.event_type, r.user_id, r.day.isoformat()): (r.value_interp, r.observed)
        for r in daily_value_interp(df).collect()
    }
    # grid spans day 2..5 for both series
    assert out[("A", 1, "2024-01-02")] == (10.0, True)
    assert out[("A", 1, "2024-01-03")] == (20.0, False)  # 10 + 30*(1/3)
    assert out[("A", 1, "2024-01-04")] == (30.0, False)  # 10 + 30*(2/3)
    assert out[("A", 1, "2024-01-05")] == (40.0, True)
    assert out[("B", 2, "2024-01-03")] == (7.0, True)
    # B has no second observation: every other grid day stays NULL
    assert out[("B", 2, "2024-01-02")] == (None, False)
    assert out[("B", 2, "2024-01-04")] == (None, False)
    assert out[("B", 2, "2024-01-05")] == (None, False)


def test_event_transition_matrix_contracts(spark):
    """r10 Markov contracts: transitions follow (ts, id) total order
    including the id tie-break, sequence-final events emit nothing,
    probabilities row-normalize to 1."""
    import datetime as dt

    from database_per_keyword_analysis_spark.operators.events import (
        event_transition_matrix,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: view -> click -> buy
        (1, 1, t0, "view"), (2, 1, t0 + s, "click"), (3, 1, t0 + 2 * s, "buy"),
        # user 2: two simultaneous events — id breaks the tie:
        # view(4) -> click(5) -> view(6)
        (4, 2, t0, "view"), (5, 2, t0, "click"), (6, 2, t0 + s, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    out = {(r.cur_type, r.next_type): r for r in event_transition_matrix(df).collect()}
    assert {(k, v.n_trans) for k, v in out.items()} == {
        (("view", "click"), 2),
        (("click", "buy"), 1),
        (("click", "view"), 1),
    }
    assert out[("view", "click")].p == 1.0
    assert out[("click", "buy")].p == 0.5 and out[("click", "view")].p == 0.5
    # row sums normalize to 1 per cur state
    import collections

    sums = collections.defaultdict(float)
    for (cur, _), r in out.items():
        sums[cur] += r.p
    assert all(abs(v - 1.0) < 1e-9 for v in sums.values())


def test_user_stickiness_contracts(spark):
    """r10 DAU/WAU contracts on hand-built activity: trailing window
    includes exactly [d-6, d], dedup within day, stickiness = 1.0 when
    the window holds no extra users."""
    import datetime as dt

    from database_per_keyword_analysis_spark.operators.events import (
        user_stickiness,
    )

    d = lambda s: dt.datetime(2024, 1, s, 10, 0, 0)
    rows = [
        (1, d(1)), (1, d(1)),  # same user twice on day 1: DAU dedups
        (2, d(1)),
        (1, d(5)),             # user 1 returns on day 5
        (3, d(8)),             # day 8: user 2's day-1 visit is OUTSIDE [2..8]
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = {r.day.isoformat(): r for r in user_stickiness(df).collect()}
    assert set(out) == {"2024-01-01", "2024-01-05", "2024-01-08"}
    a = out["2024-01-01"]
    assert (a.dau, a.wau, a.stickiness) == (2, 2, 1.0)
    b = out["2024-01-05"]  # window [dec30..jan5]: users {1, 2}
    assert (b.dau, b.wau) == (1, 2) and b.stickiness == 0.5
    c = out["2024-01-08"]  # window [jan2..jan8]: users {1 (jan5), 3}
    assert (c.dau, c.wau) == (1, 2)


def test_user_active_spans_contracts(spark):
    """r10 gaps-and-islands contracts on hand-built events: touching
    intervals merge, a chain that only pairwise-overlaps merges into
    ONE span (the running-max rule a lag-based gap check gets wrong),
    disjoint claims stay separate, durations are exact microseconds."""
    import datetime as dt

    from database_per_keyword_analysis_spark.operators.events import (
        user_active_spans,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    rows = [
        # user 1: events at 0, 20, 40 min — each pair overlaps via the
        # +/-15 pad, so one span [-15, 55] = 70 min
        (1, m(0)), (1, m(20)), (1, m(40)),
        # user 2: events at 0 and 60 — disjoint spans of 30 min each
        (2, m(0)), (2, m(60)),
        # user 3: a long early claim swallowing a later short one:
        # events at 0 and 10 (inside [−15,15]∪[−5,25] = one span)
        (3, m(0)), (3, m(10)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = {r.user_id: r for r in user_active_spans(df).collect()}
    MIN = 60_000_000
    assert (out[1].n_spans, out[1].covered_us, out[1].longest_us) == (
        1, 70 * MIN, 70 * MIN,
    )
    assert (out[2].n_spans, out[2].covered_us, out[2].longest_us) == (
        2, 60 * MIN, 30 * MIN,
    )
    assert (out[3].n_spans, out[3].covered_us) == (1, 40 * MIN)


def test_touch_attribution_contracts(spark):
    """r10 attribution contracts on hand-built journeys: first vs last
    touch diverge, lookback excludes stale touches, same-timestamp
    touches do not self-attribute, and a touchless conversion counts
    under '(none)'."""
    import datetime as dt

    from database_per_keyword_analysis_spark.operators.events import (
        touch_attribution,
    )

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    h = lambda k: t0 + dt.timedelta(hours=k)
    rows = [
        # user 1: view then click then purchase — first=view, last=click
        (1, 1, h(0), "view"), (2, 1, h(1), "click"), (3, 1, h(2), "purchase"),
        # user 2: a touch 8 days before purchase is OUTSIDE the window,
        # a click inside it — first=last=click
        (4, 2, h(-200), "view"), (5, 2, h(1), "click"), (6, 2, h(3), "purchase"),
        # user 3: purchase with NO prior touch (a same-instant view
        # must not self-attribute)
        (7, 3, h(5), "view"), (8, 3, h(5), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    out = {r.touch_type: (r.n_first_touch, r.n_last_touch)
           for r in touch_attribution(df).collect()}
    assert out == {"view": (1, 0), "click": (1, 2), "(none)": (1, 1)}


def test_touch_attribution_colon_types_and_huge_ids(spark):
    """r10 advice item 3: an event_type containing ':' must survive
    key recovery intact (substring past the fixed numeric prefix, not
    split-on-':'), and event ids near the BIGINT ceiling must neither
    overflow the pad nor corrupt the lexicographic tie order."""
    import datetime as dt

    from database_per_keyword_analysis_spark.operators.events import (
        touch_attribution,
    )

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    big = 9_223_372_036_854_775_807  # max BIGINT: 19 digits, pad is 20
    rows = [
        # same-timestamp touches: the id is the tie-break, so the
        # max-key (last touch) must be the HIGHER id even at 19 digits
        (1, 1, t0, "promo:email"), (big, 1, t0, "promo:sms"),
        (5, 1, t0 + dt.timedelta(hours=1), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    out = {r.touch_type: (r.n_first_touch, r.n_last_touch)
           for r in touch_attribution(df).collect()}
    assert out == {"promo:email": (1, 0), "promo:sms": (0, 1)}


def test_funnel_report_conversion_window(spark):
    """r10 conversion-window contracts: a stage event inside the lag
    converts, one past it does not, the boundary instant (exactly
    prev + lag) is INCLUSIVE, and lagless behavior is unchanged."""
    import datetime as dt

    from database_per_keyword_analysis_spark.operators.events import (
        funnel_report,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = lambda k: t0 + dt.timedelta(hours=k)
    rows = [
        # user 1: click 1h after view -> converts under 24h
        (1, 1, h(0), "view"), (2, 1, h(1), "click"),
        # user 2: click 30h after view -> outside the 24h window
        (3, 2, h(0), "view"), (4, 2, h(30), "click"),
        # user 3: click at EXACTLY +24h -> inclusive boundary
        (5, 3, h(0), "view"), (6, 3, h(24), "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    lagged = {
        r.stage: r.n_users
        for r in funnel_report(df, ["view", "click"], max_lag_hours=24).collect()
    }
    assert lagged == {1: 3, 2: 2}  # users 1 and 3 convert; 2 stalls
    free = {
        r.stage: r.n_users
        for r in funnel_report(df, ["view", "click"]).collect()
    }
    assert free == {1: 3, 2: 3}  # without the window all three convert


def test_transition_entropy_contracts(spark):
    """r10 entropy contracts: a deterministic next step scores 0, a
    uniform 2-way split scores ln(2), counts weight the distribution."""
    import datetime as dt
    import math

    from database_per_keyword_analysis_spark.operators.events import (
        transition_entropy,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = []
    eid = 0
    # state A always goes to B (two users): entropy 0
    for u in (1, 2):
        rows += [(eid := eid + 1, u, t0, "A"), (eid := eid + 1, u, t0 + s, "B")]
    # state B splits evenly B->C and B->D across users: entropy ln 2
    rows += [(eid := eid + 1, 1, t0 + 2 * s, "C")]
    rows += [(eid := eid + 1, 2, t0 + 2 * s, "D")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    out = {r.cur_type: r for r in transition_entropy(df).collect()}
    assert out["A"].entropy == 0.0 and out["A"].n_out == 1
    assert out["B"].entropy == round(math.log(2), 6) and out["B"].n_out == 2
    assert out["B"].n_trans == 2
    assert "C" not in out and "D" not in out  # terminal states emit nothing


class TestEventGapStats:
    def _run(self, spark, rows):
        from database_per_keyword_analysis_spark.operators import events as E

        df = spark.createDataFrame(
            rows, "event_type string, user_id long, ts timestamp"
        )
        return {r.event_type: r for r in E.event_gap_stats(df).collect()}

    def test_regular_clock_is_minus_one(self, spark):
        from datetime import datetime, timedelta

        t0 = datetime(2024, 1, 1)
        rows = [("tick", 1, t0 + timedelta(seconds=60 * i))
                for i in range(20)]
        got = self._run(spark, rows)["tick"]
        # constant 60 s gaps: sigma = 0 -> B = -1 exactly
        assert got.n_gaps == 19
        assert got.med_gap_s == 60 and got.p90_gap_s == 60
        assert got.burstiness == -1.0

    def test_matches_pure_python_reference(self, spark):
        import math
        import random
        from datetime import datetime, timedelta

        rng = random.Random(5)
        t = datetime(2024, 1, 1)
        rows, gaps = [], []
        for _ in range(40):
            rows.append(("b", 7, t))
            g = rng.randrange(1, 5000)
            gaps.append(g)
            t += timedelta(seconds=g)
        gaps = gaps[:-1]  # the last increment has no following event
        got = self._run(spark, rows)["b"]
        n = len(gaps)
        srt = sorted(gaps)
        assert got.n_gaps == n
        assert got.med_gap_s == srt[(5 * n + 9) // 10 - 1]
        assert got.p90_gap_s == srt[(9 * n + 9) // 10 - 1]
        mu = sum(gaps) / n
        sig = math.sqrt(sum(g * g for g in gaps) / n - mu * mu)
        assert got.burstiness == round((sig - mu) / (sig + mu), 6)

    def test_all_simultaneous_gaps_are_null_burstiness(self, spark):
        from datetime import datetime

        t0 = datetime(2024, 1, 1)
        rows = [("z", 3, t0)] * 5
        got = self._run(spark, rows)["z"]
        # all gaps 0: mu = sigma = 0 -> burstiness NULL
        assert got.n_gaps == 4 and got.med_gap_s == 0
        assert got.burstiness is None

    def test_gaps_are_per_entity_not_cross_user(self, spark):
        from datetime import datetime, timedelta

        t0 = datetime(2024, 1, 1)
        # two interleaved users, each on a 100 s clock offset by 50 s:
        # per-entity gaps are all 100; a cross-user bug would see 50s
        rows = [("e", u, t0 + timedelta(seconds=off + 100 * i))
                for u, off in ((1, 0), (2, 50)) for i in range(10)]
        got = self._run(spark, rows)["e"]
        assert got.n_gaps == 18 and got.med_gap_s == 100
        assert got.burstiness == -1.0


class TestMarkovStationary:
    def _run(self, spark, seqs, iters=30):
        from datetime import datetime, timedelta

        from database_per_keyword_analysis_spark.operators import events as E

        rows = []
        t0 = datetime(2024, 1, 1)
        for uid, seq in enumerate(seqs):
            for i, s in enumerate(seq):
                rows.append(
                    (uid * 1000 + i, t0 + timedelta(seconds=i), uid, s)
                )
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        return {
            r.event_type: r
            for r in E.markov_stationary(df, iters=iters).collect()
        }

    def test_two_state_symmetric_chain_is_uniform(self, spark):
        # a<->b alternation: stationary is exactly (0.5, 0.5)
        got = self._run(spark, [list("abababab")] * 3)
        assert got["a"].pi == 0.5 and got["b"].pi == 0.5
        assert got["a"].n_out == 1 and got["b"].n_out == 1

    def test_absorbing_state_with_uniform_restart(self, spark):
        # a->b always, b dangling (restarts uniformly): pi solves
        # pi_a = pi_b/2, pi_b = pi_a + pi_b/2 -> pi = (1/3, 2/3)
        got = self._run(spark, [list("ab")] * 5)
        assert abs(got["a"].pi - 1 / 3) < 1e-9
        assert abs(got["b"].pi - 2 / 3) < 1e-9
        assert got["b"].n_out == 0  # dangling

    def test_matches_pure_python_power_iteration(self, spark):
        import random
        from collections import Counter, defaultdict

        rng = random.Random(21)
        seqs = ["".join(rng.choice("xyz") for _ in range(30))
                for _ in range(6)]
        got = self._run(spark, [list(s) for s in seqs], iters=30)
        trans = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                trans[(a, b)] += 1
        states = sorted(set("".join(seqs)))
        tot = defaultdict(int)
        for (a, _), n in trans.items():
            tot[a] += n
        k = len(states)
        pi = {s: 1.0 / k for s in states}
        for _ in range(30):
            nxt = {s: 0.0 for s in states}
            m = sum(pi[s] for s in states if tot[s] == 0)
            for (a, b), n in trans.items():
                nxt[b] += pi[a] * (n / tot[a])
            pi = {s: nxt[s] + m / k for s in states}
        for s in states:
            assert abs(got[s].pi - round(pi[s], 9)) <= 2e-9, (s, got[s].pi, pi[s])


    def test_null_states_excluded_before_lead(self, spark):
        # r13 (r12 advice): NULL event types are filtered BEFORE the
        # lead window, so a NULL mid-sequence BRIDGES its neighbours
        # (a, NULL, b contributes a->b) instead of silently vanishing
        # through the inner join on 'cur'
        got = self._run(spark, [["a", None, "b", "a", None, "b"]] * 2)
        assert set(got) == {"a", "b"}  # no None state, no KeyError
        # bridged chain is exactly the a<->b alternation: pi = 0.5/0.5
        assert got["a"].pi == 0.5 and got["b"].pi == 0.5


class TestIntervalOpenCounts:
    def _run(self, spark, rows):
        from database_per_keyword_analysis_spark.operators import events as E

        df = spark.createDataFrame(rows, "s date, e date")
        return {
            str(r.day): r.n_open
            for r in E.interval_open_counts(df, "s", "e").collect()
        }

    def test_hand_intervals(self, spark):
        from datetime import date

        got = self._run(
            spark,
            [
                (date(2024, 1, 1), date(2024, 1, 3)),
                (date(2024, 1, 2), date(2024, 1, 2)),
                (date(2024, 1, 5), date(2024, 1, 5)),
            ],
        )
        assert got == {
            "2024-01-01": 1,
            "2024-01-02": 2,  # both open
            "2024-01-03": 1,
            "2024-01-04": 0,  # gap day is a true zero
            "2024-01-05": 1,
        }

    def test_null_end_is_point_interval(self, spark):
        from datetime import date

        got = self._run(spark, [(date(2024, 2, 1), None)])
        assert got == {"2024-02-01": 1}

    def test_matches_pure_python(self, spark):
        import random
        from datetime import date, timedelta

        rng = random.Random(11)
        d0 = date(2024, 3, 1)
        rows = []
        for _ in range(60):
            s = d0 + timedelta(days=rng.randint(0, 25))
            rows.append((s, s + timedelta(days=rng.randint(0, 10))))
        got = self._run(spark, rows)
        lo = min(s for s, _ in rows)
        hi = max(e for _, e in rows)
        d = lo
        while d <= hi:
            want = sum(1 for s, e in rows if s <= d <= e)
            assert got[str(d)] == want, (d, got[str(d)], want)
            d += timedelta(days=1)
