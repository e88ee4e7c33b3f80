"""Event-stream operators in batch form: JSON extraction, windowed
counts, sessionization, as-of join.

The reference has no streaming and no JSON (SURVEY.md §2.8/§2.10) — these
are the north-star extensions over the driver's `events` fixture
(event_id, ts, user_id, event_type, value, props JSON-string).  Each has
a batch formulation here (oracle-checkable); streaming/ holds the
readStream variants of the windowed aggregations.

Scale notes: sessionization and as-of both partition by `user_id` — at
100 TB that is a single shuffle each, and AQE's skew-join/partition
coalescing handles hot users; there is no driver-side collection
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .relational import dec_sum


def json_props_stats(events: DataFrame) -> DataFrame:
    """Per event_type stats over the JSON `props.k` field (C-row gap in
    the reference: no JSON functions; SURVEY.md §2.8).

    `get_json_object` evaluates JVM-side inside codegen — no UDF.
    """
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            dec_sum(F.col("value"), "sum_value"),
        )
        .orderBy("event_type")
    )


def variant_props_stats(events: DataFrame) -> DataFrame:
    """`json_props_stats` on Spark 4's VARIANT path: `parse_json` once
    into the binary variant encoding, then `variant_get` typed field
    extraction — the semi-structured plan Spark 4 prefers over repeated
    `get_json_object` string re-parsing (each get_json_object call
    re-parses the JSON text; a variant column parses ONCE and every
    extraction is a cheap binary probe — the difference between 1 and k
    parses per row for k extracted fields at 100 TB).  Identical
    result contract to `json_props_stats`, which is the oracle twin."""
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "long")
    return (
        events.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            dec_sum(F.col("value"), "sum_value"),
        )
        .orderBy("event_type")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a session breaks when a user is idle longer
    than `gap_minutes` (the batch analog of streaming session_window;
    guide 'Sessionization' pattern).

    Returns one row per session: (user_id, session_id, session_start,
    session_end, n_events).  Gap arithmetic in integer microseconds —
    exact, no float drift vs the oracle.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = (prev_us.isNull() | ((us - prev_us) > gap_minutes * 60_000_000)).cast("int")
    with_ids = events.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return (
        with_ids.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


def asof_last_view_before_purchase(events: DataFrame) -> DataFrame:
    """As-of join (SURVEY.md §2.3 gap row): for each 'purchase', the ts of
    the same user's most recent strictly-earlier 'view'.

    Spark lacks a native as-of join; the single-pass formulation is a
    conditional `last(..., ignorenulls)` over an ordered per-user window —
    one shuffle on user_id, no self-join, no `merge_asof` UDF needed.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    return (
        events.withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_view_ts")
        .orderBy("event_id")
    )


def sliding_window_counts(
    events: DataFrame, width: str = "1 day", slide: str = "6 hours"
) -> DataFrame:
    """Sliding-window event counts (streaming W2 analog, batch form).

    Returns (window_start TIMESTAMP, window_end TIMESTAMP, n BIGINT).
    `F.window` assigns each event to width/slide overlapping windows
    JVM-side (an explode of ~width/slide rows per event).
    """
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
        .orderBy("window_start")
    )


def user_activity_pivot(events: DataFrame) -> DataFrame:
    """Pivot (absent from the reference): events per user × event_type.
    Explicit pivot values keep the plan one-pass (no distinct pre-scan)."""
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types]
        )
        .orderBy("user_id")
    )


def user_activity_unpivot(events: DataFrame) -> DataFrame:
    """UNPIVOT/melt (the §2.4 pivot row's inverse, also absent from the
    reference): the wide per-user × event-type count matrix back to long
    (user_id, event_type, n_events) form — the shape a mixture model or
    a per-type downstream aggregate wants.

    Uses the built-in ``DataFrame.unpivot`` (Spark 3.4+ melt): a
    zero-shuffle narrow transformation — each wide row expands to
    |types| long rows in place, so the only shuffle in the composition
    is the pivot's own groupBy.  Zero counts are KEPT (the dense melt):
    dropping them would make the output depend on which (user, type)
    pairs happen to exist, and the dense form is what a per-type
    normalizer needs.  Type names carry the bare event_type (the n_
    prefix is presentation, stripped here)."""
    types = ["click", "error", "purchase", "signup", "view"]
    wide = user_activity_pivot(events)
    return (
        wide.unpivot(
            ["user_id"],
            [f"n_{t}" for t in types],
            "event_type",
            "n_events",
        )
        .withColumn(
            "event_type", F.expr("substring(event_type, 3)")
        )
        .orderBy("user_id", "event_type")
    )


def funnel_counts(events: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Ordered-funnel conversion: users whose first stage-k event happens
    AFTER their first stage-(k-1) event, per stage.

    One aggregation pass: per user, min(ts) per stage via conditional
    aggregation (no joins, no self-unions); stage reach is then a chain
    of timestamp comparisons on the per-user row.  Shuffle: one, on
    user_id, carrying |stages| timestamps per user.
    """
    firsts = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{i}")
            for i, s in enumerate(stages)
        ]
    )
    reached = [F.col("t_0").isNotNull()]
    for i in range(1, len(stages)):
        reached.append(
            reached[i - 1] & F.col(f"t_{i}").isNotNull() & (F.col(f"t_{i}") > F.col(f"t_{i-1}"))
        )
    agg = firsts.agg(
        *[F.sum(r.cast("long")).alias(f"n_{i}") for i, r in enumerate(reached)]
    )
    stack = ", ".join(f"'{s}', `n_{i}`" for i, s in enumerate(stages))
    return (
        agg.selectExpr(f"stack({len(stages)}, {stack}) AS (stage, n_users)")
        .selectExpr("stage", "CAST(n_users AS BIGINT) AS n_users")
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort-retention matrix (absent from the reference — the
    natural growth form of its time-bucketed counts, main.py:812-816):
    users are cohorted by the week of their FIRST event; for each
    (cohort_week, week_offset) cell, how many of that cohort were
    active, and what fraction of the cohort size that is.

    Returns (cohort_week DATE, week_offset INT, n_users, retention) —
    retention = n_users / the cohort's offset-0 cell, rounded to 6.

    Scale shape: first-event week via one groupBy(user) aggregate; the
    distinct (user, active-week) pairs join it ON user_id — both sides
    are keyed and shuffled by user_id, so AQE co-partitions the join and
    hot users skew-split; the cohort base size attaches per cohort row
    with a window `first` over week_offset (the matrix is
    n_weeks × n_offsets rows — tiny — by then).  No driver collects.
    """
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    cells = (
        active.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    base = Window.partitionBy("cohort_week").orderBy("week_offset")
    return (
        cells.withColumn(
            "retention",
            F.round(
                F.col("n_users")
                / F.first("n_users").over(base).cast("double"),
                6,
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


def event_anomalies(events: DataFrame, z_threshold: float = 2.0) -> DataFrame:
    """Daily event-count anomaly detection per event_type: each day's
    count is z-scored against its trailing window of the 7 PRECEDING
    OBSERVED days (absent from the reference, which only plots raw
    daily counts, main.py:812-816).

    Frame semantics — trailing 7 ROWS, not 7 calendar days: days with
    zero events produce no row in the daily-count table, so for a
    sparse event type the frame reaches back further than one calendar
    week (the baseline is "the last 7 days this type was active").
    This is deliberate: zero-days carry no variance information for
    burst detection, and the row frame keeps Spark and the oracle on
    identical inputs.  A calendar-week baseline instead wants the
    zero-filled (event_type, day) spine of `events_daily_counts`
    composed in front of this operator.

    Returns (event_type, day, cnt, zscore, is_anomaly); zscore/flag are
    NULL for days with fewer than 3 trailing observations or zero
    variance.  The trailing mean/variance are computed from explicit
    INTEGER sum / sum-of-squares window aggregates — NOT stddev_samp —
    because integer sums are exact and therefore independent of the
    order the engine combines frame rows in (Spark iterates the frame,
    DuckDB uses segment trees; float accumulation order would differ in
    the low bits, and stddev implementations differ outright).  All
    float math is derived from the exact integer sums, so the oracle
    SQL computes bit-identical doubles.

    Scale shape: the daily-count aggregate is the only corpus-sized
    shuffle; the window runs over the (event_type, day) frame, which is
    n_types × n_days rows.
    """
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    c = F.col("cnt").cast("double")
    n = F.count("cnt").over(w).cast("double")
    s1 = F.sum("cnt").over(w).cast("double")
    s2 = F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("double")
    mean = s1 / n
    var = (s2 - n * mean * mean) / (n - 1)
    z = F.when((n >= 3) & (var > 0), (c - mean) / F.sqrt(var))
    return (
        daily.select(
            "event_type",
            "day",
            "cnt",
            F.round(z, 6).alias("zscore"),
            (F.abs(F.round(z, 6)) > z_threshold).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


def _daily_grid(events: DataFrame) -> DataFrame:
    """Shared dense grid for the gap-fill family: exact DECIMAL daily
    means per (event_type, user_id, day), left-joined onto the full
    day-spine x key cross — (event_type, user_id, day, obs_value),
    obs_value NULL on gap days.  daily_value_locf and
    daily_value_interp both impute over THIS grid, so spine/mean
    semantics cannot drift between the two (r10 continuation review
    finding)."""
    day = F.to_date("ts")
    daily = events.groupBy("event_type", "user_id", day.alias("day")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("obs_value")
    )
    lo_hi = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = lo_hi.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    keys = events.select("event_type", "user_id").distinct()
    grid = keys.crossJoin(F.broadcast(spine))
    return grid.join(daily, ["event_type", "user_id", "day"], "left")


def daily_value_locf(events: DataFrame) -> DataFrame:
    """Gap-filled per-entity daily series with last-observation-carried-
    forward: for each (event_type, user_id) series, the exact daily mean
    value on observed days and the most recent earlier observation on
    gap days — the standard imputation for sparse telemetry before
    feature extraction.  Days before a series' first observation stay
    NULL (nothing to carry).  Returns (event_type, user_id, day,
    value_locf, observed) ordered deterministically.

    Spark-first shape: the dense day spine is generated with
    sequence/explode from a 1-row min/max aggregate (never collected),
    cross-joined with the distinct key set (both sides tiny relative to
    the fact), left-joined to the observed daily means, and filled with
    ``F.last(ignorenulls=True)`` over a per-series ordered window — the
    ignore-nulls frame window Spark evaluates in one pass per series.
    At scale the window parallelism is the series-key cardinality
    (users × types — millions in production), the same per-key
    independence as sessionize/pack_sequences; the daily mean is the
    DECIMAL-sum/count idiom, so every engine computes bit-identical
    values and LOCF copies them unchanged."""
    j = _daily_grid(events)
    w = (
        Window.partitionBy("event_type", "user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "event_type",
        "user_id",
        "day",
        F.last("obs_value", ignorenulls=True).over(w).alias("value_locf"),
        F.col("obs_value").isNotNull().alias("observed"),
    ).orderBy("event_type", "user_id", "day")


def funnel_report(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_lag_hours: float | None = None,
) -> DataFrame:
    """Strict-order funnel analysis (the Amplitude/PostHog funnel;
    Flink's MATCH_RECOGNIZE territory): a user reaches stage k at the
    EARLIEST stage-k event STRICTLY AFTER their stage-(k-1) reach time
    — first view, then the first click after that view, then the
    first purchase after that click.  Unordered co-occurrence
    (`cohort_retention`'s semantics) does not imply an ordered journey;
    the ordering constraint is the operator.

    Returns one row per stage: (stage, event_type, n_users,
    conversion) with conversion = n_users / stage-1 users rounded to
    6 (1.0 for stage 1; NULL when stage 1 is empty).

    Physical shape: K-1 chained (events ⋈ reach-table) rounds — each
    a co-partitioned equi-join on the user key against a
    USER-cardinality table followed by one map-side-combined min —
    plus a final union of K one-row aggregates.  No windows over the
    event stream, no sequence explode; at 100 TB each round shuffles
    reach rows (one per surviving user), never the event table (AQE
    broadcasts the reach side when it fits).  Deterministic: min() is
    order-free and ties inside one timestamp resolve identically in
    any engine (strictly-greater keeps later stages off the tied
    instant).

    `max_lag_hours` adds the CONVERSION-WINDOW constraint product
    funnels default to (Amplitude's "within N days"): stage k must
    land in (prev_reach, prev_reach + lag] — a stalled journey does
    not convert, and a user who re-enters later is still measured
    from their FIRST stage-(k-1) reach (the strict first-touch
    semantics; a per-retry funnel is a different operator).  The
    bound rides the SAME join's residual predicate — no extra stage
    or shuffle."""
    reach = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts_col).alias("_t"))
    )
    tables = [reach]
    lag = (
        F.expr(f"INTERVAL {int(max_lag_hours * 3600)} SECOND")
        if max_lag_hours is not None
        else None
    )
    for s in stages[1:]:
        cond = (F.col(user_col) == F.col("_u")) & (
            F.col(ts_col) > F.col("_t")
        )
        if lag is not None:
            cond = cond & (F.col(ts_col) <= F.col("_t") + lag)
        nxt = (
            events.where(F.col(type_col) == s)
            .join(
                tables[-1],
                cond,
            )
            .groupBy(F.col("_u").alias("_u2"))
            .agg(F.min(ts_col).alias("_t2"))
            .select(F.col("_u2").alias("_u"), F.col("_t2").alias("_t"))
        )
        tables.append(nxt)
    base = tables[0].agg(F.count(F.lit(1)).alias("_n1"))
    rows = None
    for i, (s, t) in enumerate(zip(stages, tables), start=1):
        r = (
            t.agg(F.count(F.lit(1)).alias("n_users"))
            .crossJoin(F.broadcast(base))
            .select(
                F.lit(i).alias("stage"),
                F.lit(s).alias("event_type"),
                "n_users",
                F.when(
                    F.col("_n1") > 0,
                    F.round(
                        F.col("n_users").cast("double")
                        / F.col("_n1").cast("double"),
                        6,
                    ),
                ).alias("conversion"),
            )
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.orderBy("stage")


def top_user_paths(
    events: DataFrame,
    first_k: int = 5,
    top_n: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Free-form path analysis (the product-analytics "top user
    journeys" report): each user's first `first_k` events in
    (ts, tiebreak) total order joined into a '>'-separated path
    string, then the `top_n` most common paths with user counts —
    the exploratory complement of :func:`funnel_report`'s FIXED
    stage sequence (funnels answer "how many converted through THIS
    journey", paths answer "WHICH journeys happen").

    Physical shape: one user-partitioned window (rank the first k —
    the sessionize shuffle), one per-user array_sort+concat (the
    collect_list is k-bounded per user, never unbounded), one
    path-keyed count, one top-n.  Deterministic: the (ts, tiebreak)
    order is total, array_sort on the (ts, tiebreak, type) struct
    reproduces it inside the collected array, and the final tie
    breaks on the path string."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    firstk = events.withColumn("_r", F.row_number().over(w)).where(
        F.col("_r") <= first_k
    )
    paths = firstk.groupBy(user_col).agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(ts_col, tiebreak, type_col))
                ),
                lambda s: s[type_col],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(top_n)
    )


def daily_value_interp(events: DataFrame) -> DataFrame:
    """Gap-filled per-entity daily series with LINEAR interpolation:
    the imputation tier above `daily_value_locf` — a gap day between
    two observations gets the time-weighted blend
    prev + (next - prev) * (day - prev_day) / (next_day - prev_day),
    days outside a series' observed span stay NULL (nothing to
    interpolate toward; extrapolation is a modeling decision, not a
    fill).  Returns (event_type, user_id, day, value_interp, observed)
    ordered deterministically.

    Same 100 TB shape as LOCF: dense spine from a 1-row min/max
    aggregate, broadcast cross to the distinct key set, one left join
    to the observed DECIMAL daily means, then TWO frame windows per
    series (ignore-nulls last over the preceding frame, ignore-nulls
    first over the following frame) — window parallelism is the
    series-key cardinality.  The blend is rounded to 9 so the double
    is engine-portable (int-day differences divide exactly the same
    everywhere; the rounding guards the multiply-add ordering)."""
    j = _daily_grid(events)
    wb = (
        Window.partitionBy("event_type", "user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("event_type", "user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last("obs_value", ignorenulls=True).over(wb)
    prev_d = F.last(
        F.when(F.col("obs_value").isNotNull(), F.col("day")), ignorenulls=True
    ).over(wb)
    next_v = F.first("obs_value", ignorenulls=True).over(wf)
    next_d = F.first(
        F.when(F.col("obs_value").isNotNull(), F.col("day")), ignorenulls=True
    ).over(wf)
    interp = F.round(
        prev_v
        + (next_v - prev_v)
        * (
            F.datediff(F.col("day"), prev_d)
            / F.datediff(next_d, prev_d)
        ),
        9,
    )
    return j.select(
        "event_type",
        "user_id",
        "day",
        F.when(F.col("obs_value").isNotNull(), F.round(F.col("obs_value"), 9))
        .when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        .otherwise(F.lit(None).cast("double"))
        .alias("value_interp"),
        F.col("obs_value").isNotNull().alias("observed"),
    ).orderBy("event_type", "user_id", "day")


def event_transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: every a→b transition counted in (ts, id) total order —
    the id tie-break makes simultaneous events deterministic, the
    top_user_paths convention — with the row-normalized transition
    probability.  The per-state probability rows are what journey
    models, next-event predictors and anomaly monitors consume.

    100 TB shape: one window (lead over the user-keyed sequence —
    parallelism is user cardinality, the sessionize family's shape),
    one (cur, next) aggregate, one state-cardinality row-total join;
    the matrix is |states|² at most, broadcast-sized for any real
    event taxonomy.  Returns (cur_type, next_type, n_trans, p)
    deterministically ordered; sequence-final events emit no
    transition."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    trans = (
        events.select(
            F.col(type_col).alias("cur_type"),
            F.lead(type_col).over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    totals = trans.groupBy("cur_type").agg(
        F.sum("n_trans").alias("row_total")
    )
    return (
        trans.join(totals, "cur_type")
        .select(
            "cur_type",
            "next_type",
            "n_trans",
            F.round(
                F.col("n_trans").cast("double") / F.col("row_total"), 9
            ).alias("p"),
        )
        .orderBy("cur_type", "next_type")
    )


def user_stickiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Rolling distinct-user engagement: per observed day, DAU (distinct
    users that day), trailing-`window_days` WAU (distinct users in
    [d-6, d]) and the DAU/WAU stickiness ratio — the product-analytics
    staple that needs DISTINCT counts over overlapping windows, which
    no frame window computes (count_distinct isn't a frame aggregate).

    Spark-first shape: distinct (user, day) activity pairs, each
    EXPLODED into the `window_days` future days it covers (bounded
    scan-stage fan-out — the sliding_window_counts idiom), restricted
    to observed days, then one count_distinct per day.  The shuffle
    carries (user, day) pairs x window_days — linear in activity, never
    user x day dense.  Returns (day, dau, wau, stickiness)
    deterministically ordered."""
    day = F.to_date(ts_col)
    ud = events.select(
        F.col(user_col).alias("uid"), day.alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count_distinct("uid").alias("dau"))
    cover = ud.select(
        "uid",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), window_days - 1),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    )
    wau = (
        cover.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.count_distinct("uid").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 9).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


def user_active_spans(
    events: DataFrame,
    pad_minutes: int = 15,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Interval union per user (the gaps-and-islands pattern): each
    event claims [ts - pad, ts + pad]; overlapping or touching claims
    merge into maximal activity SPANS, and the per-user report is the
    span count, total covered seconds and longest span — the "how much
    wall-clock was this entity actually active" question raw
    sessionization (which keys on inter-event gaps, not coverage)
    does not answer.

    Spark-first shape: one per-user ordered window computes the
    running max of interval ends over all PRIOR rows; an interval
    whose start exceeds that max opens a new island (exact integer
    microsecond arithmetic — the sessionize convention), a second
    running sum turns the open-flags into island ids, and one groupBy
    folds each island to [min start, max end].  Window parallelism is
    user cardinality; everything after is key-cardinality.  Returns
    (user_id, n_spans, covered_us, longest_us) — durations in exact
    integer MICROSECONDS (no second-rounding division: Spark casts
    truncate where DuckDB casts round, so a derived double would be
    the one non-portable value in an otherwise exact pipeline) —
    deterministically ordered."""
    pad_us = pad_minutes * 60_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    iv = events.select(
        F.col(user_col).alias("uid"),
        (us - pad_us).alias("s"),
        (us + pad_us).alias("e"),
    )
    w = Window.partitionBy("uid").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "uid",
        "s",
        "e",
        (prev_max_e.isNull() | (F.col("s") > prev_max_e))
        .cast("int")
        .alias("opens"),
    )
    islands = (
        marked.select(
            "uid",
            "s",
            "e",
            F.sum("opens")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("island"),
        )
        .groupBy("uid", "island")
        .agg(F.min("s").alias("is_"), F.max("e").alias("ie"))
    )
    return (
        islands.groupBy(F.col("uid").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("ie") - F.col("is_")).alias("covered_us"),
            F.max(F.col("ie") - F.col("is_")).alias("longest_us"),
        )
        .orderBy("user_id")
    )


ATTRIBUTION_LOOKBACK_DAYS = 7


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    lookback_days: int = ATTRIBUTION_LOOKBACK_DAYS,
) -> DataFrame:
    """First-touch and last-touch attribution: every conversion event
    is attributed to the earliest and the latest NON-conversion event
    by the same user inside the trailing lookback window, and the
    report counts conversions per (touch type, model) — the marketing
    staple that is two as-of lookups per conversion.

    Spark-first shape: ONE pass over the per-user event stream — no
    per-conversion join.  Touch events encode as a lexicographically
    sortable key (zero-padded micros : event id : type — string
    min/max order identical in any engine, the portable substitute
    for struct extrema), and two RANGE-frame window aggregates over
    the numeric time axis pick the window's min and max touch.  The
    range frame [lookback, 1 preceding] is exact integer micros, so
    same-timestamp touch/conversion pairs do NOT self-attribute.
    Window parallelism is user cardinality.  Key robustness (r10
    advice item 3): the two numeric fields are padded to fixed widths
    that cover their full non-negative BIGINT range (20 for micros,
    20 for event_id — a BIGINT is at most 19 digits, so the pad can
    never overflow and the lexicographic tie order is exact), and the
    touch type is recovered by SUBSTRING past the fixed 42-char
    numeric prefix rather than split-on-':' — an event_type
    containing ':' survives intact.  Non-negative event ids are the
    input contract (a '-' sign would break the pad order).  Returns
    (touch_type, n_first_touch, n_last_touch) deterministically
    ordered; conversions with no touch in window count under
    '(none)'."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    look_us = lookback_days * 86_400_000_000
    key = F.concat_ws(
        ":",
        F.lpad(us.cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
        F.col("event_type"),
    )
    base = events.select(
        "user_id",
        us.alias("us"),
        F.col("event_type").alias("etype"),
        F.when(F.col("event_type") != conversion_type, key).alias("touch_key"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-look_us, -1)
    )
    attributed = base.select(
        "etype",
        F.min("touch_key").over(w).alias("first_key"),
        F.max("touch_key").over(w).alias("last_key"),
    ).where(F.col("etype") == conversion_type)
    # type starts right after "<20 micros>:<20 id>:" = 42 chars
    pick = lambda c: F.coalesce(
        F.expr(f"substring({c}, 43)"), F.lit("(none)")
    )
    first = attributed.groupBy(pick("first_key").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("n_first_touch")
    )
    last = attributed.groupBy(pick("last_key").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("n_last_touch")
    )
    return (
        first.join(last, "touch_type", "full_outer")
        .select(
            "touch_type",
            F.coalesce("n_first_touch", F.lit(0).cast("long")).alias(
                "n_first_touch"
            ),
            F.coalesce("n_last_touch", F.lit(0).cast("long")).alias(
                "n_last_touch"
            ),
        )
        .orderBy("touch_type")
    )


def transition_entropy(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-state Shannon entropy of the next-event distribution — the
    journey-predictability metric on top of the transition matrix
    (H = -Σ p ln p; 0 = deterministic next step, ln(k) = uniform over
    k successors).  Machinery twin of `event_transition_matrix`: the
    same lead window and (cur, next) aggregate, one more
    state-cardinality fold; ln at 6dp is the cross-engine convention.
    Returns (cur_type, n_out, n_trans, entropy) with n_out = distinct
    successors, deterministically ordered."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    trans = (
        events.select(
            F.col(type_col).alias("cur_type"),
            F.lead(type_col).over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("cur_type").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_out")
    )
    p = F.col("n").cast("double") / F.col("tot")
    return (
        trans.join(totals, "cur_type")
        .groupBy("cur_type", "n_out", F.col("tot").alias("n_trans"))
        .agg(
            F.round(
                -F.sum(
                    (p * F.log(p)).cast("decimal(38,18)")
                ).cast("double"),
                6,
            ).alias("entropy")
        )
        .select("cur_type", "n_out", "n_trans", "entropy")
        .orderBy("cur_type")
    )


def event_gap_stats(
    df: DataFrame,
    group_col: str = "event_type",
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-group inter-event gap statistics + burstiness (Goh &
    Barabási, EPL 2008): the gaps between consecutive same-entity
    events, summarized as discrete median / p90 and the burstiness
    index B = (σ−μ)/(σ+μ) — B near −1 is a regular clock, 0 a
    Poisson process, +1 extreme burst-silence alternation; the
    temporal texture the daily-grain family (trend/break/ACF) cannot
    see.

    Cross-engine exactness: gap values are exact BIGINT seconds
    (epoch-microsecond differences, integer-div 1e6; ties in `ts`
    cannot perturb them — gaps are differences of order statistics,
    a tie-order-invariant multiset).  Median and p90 are explicit
    rank selections (value at rank ceil(q·n) via row_number — NOT
    percentile_disc/quantile_disc, whose discrete index conventions
    diverge between engines at q≠0.5).  μ is one IEEE division of
    exact integers; Σg² accumulates per-row BIGINT squares into an
    exact DECIMAL(38,0) sum, so σ² = Σg²/n − μ² is the same IEEE
    tree in both engines and σ one correctly-rounded sqrt.  Groups
    where σ+μ = 0 (all gaps zero) surface NULL burstiness.

    100 TB shape: one (group, entity)-keyed lag window over the
    facts, then everything is group-keyed — one moments aggregate,
    one rank window over the gap values feeding both percentile rows
    via a single rank equi-join.  Returns (group, n_gaps, med_gap_s,
    p90_gap_s, mean_gap_s, burstiness) deterministically ordered."""
    w = Window.partitionBy("grp", "ent").orderBy("us")
    base = df.where(
        F.col(group_col).isNotNull()
        & F.col(entity_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.col(entity_col).alias("ent"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )
    gaps = (
        base.withColumn("prev", F.lag("us").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "grp",
            F.expr("(us - prev) div 1000000").alias("g"),
        )
    )
    mom = gaps.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("sg"),
        F.sum((F.col("g") * F.col("g")).cast("decimal(38,0)")).alias("sgg"),
    )
    ranked = gaps.select(
        "grp",
        "g",
        F.row_number().over(Window.partitionBy("grp").orderBy("g")).alias(
            "rn"
        ),
    )
    picks = (
        ranked.join(F.broadcast(mom.select("grp", "n")), "grp")
        .where(
            (F.col("rn") == F.expr("(5 * n + 9) div 10"))
            | (F.col("rn") == F.expr("(9 * n + 9) div 10"))
        )
        .groupBy("grp")
        .agg(
            F.min(
                F.when(
                    F.col("rn") == F.expr("(5 * n + 9) div 10"), F.col("g")
                )
            ).alias("med_gap_s"),
            F.min(
                F.when(
                    F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("g")
                )
            ).alias("p90_gap_s"),
        )
    )
    n_d = F.col("n").cast("double")
    mu = F.col("sg").cast("double") / n_d
    var = F.greatest(
        F.col("sgg").cast("double") / n_d - mu * mu, F.lit(0.0)
    )
    s = F.sqrt(var)
    return (
        mom.join(picks, "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("n").alias("n_gaps"),
            "med_gap_s",
            "p90_gap_s",
            F.round(mu, 6).alias("mean_gap_s"),
            F.when(
                s + mu > 0, F.round((s - mu) / (s + mu), 6)
            ).alias("burstiness"),
        )
        .orderBy(group_col)
    )


MARKOV_ITERS = 30  # fixed power-iteration count (the pagerank_fixed
#   discipline: a FIXED unrollable count, so the oracle replays the
#   identical arithmetic instead of a convergence test)


def markov_stationary(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    iters: int = MARKOV_ITERS,
) -> DataFrame:
    """Stationary distribution of the event-type Markov chain: the
    long-run state mix implied by the per-user transition matrix —
    'where do journeys spend their time', the fixed-point answer on
    top of event_transition_matrix (one step) and transition_entropy
    (one-step predictability).

    Semantics: row-stochastic P from the same lead-window transition
    counts the matrix family uses (ties ordered by event_id); states
    with NO outgoing transitions redistribute their mass uniformly
    (the pagerank dangling convention); pi starts uniform and takes
    `iters` fixed power steps — deterministic by construction, so the
    oracle unrolls the identical arithmetic even when the chain is
    periodic.

    100 TB shape: the ONLY fact-scale stage is the lead window + the
    transition count (state-pair-bounded output).  The K-state vector
    iteration then runs DRIVER-SIDE on the collected K² transition
    table (the bounded-collect precedent: kmeans centroids, scalar
    guards — states are event TYPES, small by definition; a dataflow
    form was measured at ~0.77 s of pure scheduling overhead PER
    ITERATION on 5-row tables, 23 s for 30 rounds, and rejected).

    Engine-exactness: each p_ij is ONE IEEE division of exact BIGINTs
    (computed in the Spark plan before the collect); each step's
    per-state sum accumulates decimal.Decimal-quantized terms at 18
    fractional digits with ROUND_HALF_EVEN — mirroring the oracle's
    CAST(pi·p AS DECIMAL(38,18)) sums term for term (order-free on
    both sides); the update coalesce(c,0) + m/K is the same IEEE tree
    (Python floats are IEEE doubles); the one 9dp round happens in a
    SPARK expression over the literal results, so the output rounding
    is the same engine pair every other query exercises.  Returns
    (type_col, n_out, pi) deterministically ordered."""
    from decimal import ROUND_HALF_EVEN, Decimal

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    trans = (
        # NULL states are excluded BEFORE the lead window (the
        # event_gap_stats convention), so the exclusion is explicit on
        # both engines rather than an accident of the downstream inner
        # join on 'cur' — a null-safe-join refactor can no longer
        # desync the oracle or KeyError the driver loop (r12 advice)
        events.where(F.col(type_col).isNotNull())
        .select(
            F.col(type_col).alias("cur"),
            F.lead(type_col).over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = trans.groupBy("cur").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_out")
    )
    p = trans.join(tot.select("cur", "tot"), "cur").select(
        F.col("cur").alias("s_from"),
        F.col("nxt").alias("s_to"),
        (F.col("n").cast("double") / F.col("tot")).alias("p"),
    )
    states = [
        r.state
        for r in events.where(F.col(type_col).isNotNull())
        .select(F.col(type_col).alias("state"))
        .distinct()
        .collect()
    ]
    p_rows = [(r.s_from, r.s_to, r.p) for r in p.collect()]  # K²-bounded
    n_out = {r.cur: r.n_out for r in tot.collect()}
    k = len(states)
    if k == 0:
        spark = events.sparkSession
        return spark.createDataFrame(
            [], f"{type_col} string, n_out long, pi double"
        )
    outgoing = {s for s, _, _ in p_rows}
    dangling = [s for s in states if s not in outgoing]
    q18 = Decimal(1).scaleb(-18)

    def dec_to_double(d: Decimal) -> float:
        # DuckDB's CAST(DECIMAL(38,18) AS DOUBLE) is NOT correctly
        # rounded: it converts the scaled integer to double and divides
        # by 1e18 (two roundings) — verified empirically (0/2000
        # mismatches vs this mirror; the correctly-rounded
        # float(Decimal) differs in ~26% of values by 1 ulp).  Since
        # this cast sits INSIDE the iteration feedback loop, mirroring
        # it exactly is what makes the 'term for term' claim literal.
        return float(int(d.scaleb(18))) / 1e18

    kd = float(k)
    pi = {s: 1.0 / kd for s in states}
    for _ in range(iters):
        sums = {s: Decimal(0) for s in states}
        for s_from, s_to, pv in p_rows:
            sums[s_to] += Decimal(pi[s_from] * pv).quantize(
                q18, ROUND_HALF_EVEN
            )
        m = Decimal(0)
        for s in dangling:
            m += Decimal(pi[s]).quantize(q18, ROUND_HALF_EVEN)
        mf = dec_to_double(m)
        pi = {s: dec_to_double(sums[s]) + mf / kd for s in states}
    spark = events.sparkSession
    out = spark.createDataFrame(
        [(s, int(n_out.get(s, 0)), pi[s]) for s in sorted(states)],
        f"{type_col} string, n_out long, pi double",
    )
    return out.select(
        type_col, "n_out", F.round("pi", 9).alias("pi")
    ).orderBy(type_col)


def interval_open_counts(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Sweep-line interval-stabbing aggregate: for every day of the
    observed span, how many [start, end] intervals COVER it — the
    open-order backlog / concurrent-sessions / active-contracts curve,
    computed WITHOUT a range join (the rangejoin family answers
    "which intervals cover point x"; this answers "how many, for every
    x" in one pass).

    The classic differencing trick: each interval contributes +1 at
    its start day and −1 the day AFTER its end; the running prefix
    sum over the zero-filled day spine is exactly the open count.
    All integer arithmetic — no floats anywhere, engines cannot
    diverge.

    100 TB shape: one 2-rows-per-interval projection (scan-stage
    explode) + one groupBy(day) net-delta collapse (map-side
    combinable) — the only interval-scale work; the prefix sum runs
    over the day-span-bounded spine (the _zero_filled_daily
    acceptance).  NULL-start rows are dropped; a NULL end is treated
    as a point interval (end = start).  Returns (day, n_open)
    covering the full span, deterministically ordered."""
    base = intervals.where(F.col(start_col).isNotNull()).select(
        F.to_date(start_col).alias("s"),
        F.coalesce(F.to_date(end_col), F.to_date(start_col)).alias("e"),
    ).where(F.col("e") >= F.col("s"))
    deltas = base.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("day"), F.lit(1).alias("d")),
                F.struct(
                    F.date_add("e", 1).alias("day"), F.lit(-1).alias("d")
                ),
            )
        ).alias("x")
    ).select("x.day", "x.d")
    net = deltas.groupBy("day").agg(F.sum("d").alias("net"))
    span = base.agg(
        F.min("s").alias("lo"), F.max("e").alias("hi")
    )
    spine = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("day")
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(net, "day", "left")
        .select(
            "day",
            F.sum(F.coalesce("net", F.lit(0).cast("long")))
            .over(wc)
            .alias("n_open"),
        )
        .orderBy("day")
    )
