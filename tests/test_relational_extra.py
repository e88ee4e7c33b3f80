from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from database_per_keyword_analysis_spark.operators import relational as R
from database_per_keyword_analysis_spark.sources import load
from database_per_keyword_analysis_spark.streaming import stateful as ST
from database_per_keyword_analysis_spark.streaming import windows as SW

SCRATCH = "/root/repo/.scratch/test_stateful"


def test_approx_stats_within_bounds(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    approx = {r.o_orderpriority: r for r in R.approx_order_stats(orders).collect()}
    exact = {
        r.o_orderpriority: r
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("nd"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for prio, a in approx.items():
        e = exact[prio]
        # HLL rsd=0.02 → generous 10% gate
        assert abs(a.approx_customers - e.nd) <= max(2, 0.1 * e.nd)
        # percentile_approx with accuracy 10k is near-exact at this sf
        assert abs(a.p50 - e.p50) <= 0.05 * abs(e.p50)
        assert a.p50 <= a.p95 <= a.p99


def test_cube_grouping_sets_consistent(spark, sf_dir):
    cube = R.customer_nation_cube(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "nation")
    ).collect()
    total = [r for r in cube if r.segment == "ALL" and r.nation == "ALL"]
    assert len(total) == 1
    seg_rows = [r for r in cube if r.segment != "ALL" and r.nation == "ALL"]
    assert sum(r.n_customers for r in seg_rows) == total[0].n_customers


def test_stateful_batch_matches_groupby(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    got = {
        r.user_id: (r.n_events, r.max_value)
        for r in ST.running_user_stats(events).collect()
    }
    want = {
        r.user_id: (r.n, r.mx)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == want


@pytest.fixture()
def multi_file_events(spark, sf_dir):
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "events_split")
    load(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(path)
    yield path
    shutil.rmtree(SCRATCH, ignore_errors=True)


def test_stateful_state_survives_micro_batches(spark, sf_dir, multi_file_events):
    """maxFilesPerTrigger=1 over 4 files → 4 micro-batches: the final
    emission per user must equal the all-data answer, proving state is
    carried across batches (not recomputed per batch)."""
    batch = load(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi_file_events)
    )
    updates = SW.run_update_to_memory(
        ST.running_user_stats(stream), "t_stateful_mb"
    )
    # multiple emissions per key proves >1 micro-batch ran
    n_updates = updates.count()
    n_users = updates.select("user_id").distinct().count()
    assert n_updates > n_users
    final = {
        r.user_id: (r.n_events, r.max_value)
        for r in ST.finalize_cumulative(updates).collect()
    }
    want = {
        r.user_id: (r.n, r.mx)
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert final == want


def test_results_invariant_to_partitioning(spark, sf_dir):
    """The decimal-accumulation convention's core promise: changing the
    physical partitioning must not change a single bit of the result."""
    from database_per_keyword_analysis_spark.operators import relational as R

    li = load(spark, sf_dir, "lineitem")
    base = R.pricing_summary(li).collect()
    for parts in (1, 7):
        got = R.pricing_summary(li.repartition(parts)).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in base]


def test_profile_table_counts(spark):
    from database_per_keyword_analysis_spark.operators import relational as R

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k long, v string"
    )
    out = {r.column: r for r in R.profile_table(df).collect()}
    assert out["k"].n_rows == 3 and out["k"].n_nulls == 0 and out["k"].n_distinct == 2
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 2


# ---------------------------------------------------------- Q21/Q22 shapes


def test_high_balance_inactive_threshold_and_anti(spark):
    import datetime as dt

    customer = spark.createDataFrame(
        [
            (1, "a", 10, 100.0, "B"),   # above avg(60), recent order -> out
            (2, "b", 10, 80.0, "B"),    # above avg, old order only -> in
            (3, "c", 20, 0.0, "B"),     # excluded from avg, below -> out
            (4, "d", 20, -5.0, "B"),    # negative: excluded from avg -> out
            (5, "e", 20, 120.0, "B"),   # above avg, no orders -> in
        ],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [
            (100, 1, dt.datetime(1999, 1, 1)),  # recent: disqualifies cust 1
            (101, 2, dt.datetime(1997, 1, 1)),  # old: cust 2 still inactive
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    # avg positive balance = (100 + 80 + 120) / 3 = 100; the comparison
    # is strict, so only 120.0 clears the threshold
    out = {r.c_nationkey: r for r in
           R.high_balance_inactive_customers(customer, orders).collect()}
    assert set(out) == {20}
    assert out[20].numcust == 1 and out[20].totacctbal == 120.0


def test_supplier_wait_blame_sole_late_only(spark):
    import datetime as dt

    d0 = dt.datetime(1995, 1, 1)
    late_ship = dt.datetime(1995, 6, 1)   # > 90 days after d0
    ok_ship = dt.datetime(1995, 1, 15)
    supplier = spark.createDataFrame(
        [(1, "S1", 0, 0.0), (2, "S2", 0, 0.0), (3, "S3", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    orders = spark.createDataFrame(
        [(10, "F", d0), (11, "F", d0), (12, "F", d0), (13, "O", d0)],
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
    )
    rows = [
        # order 10: S1 late, S2 on time -> S1 blamed
        (10, 1, late_ship), (10, 2, ok_ship),
        # order 11: S1 and S2 both late -> nobody blamed
        (11, 1, late_ship), (11, 2, late_ship),
        # order 12: S3 late but sole supplier -> not blamed (no EXISTS)
        (12, 3, late_ship),
        # order 13: not 'F' status -> ignored entirely
        (13, 1, late_ship), (13, 2, ok_ship),
    ]
    lineitem = spark.createDataFrame(
        [(o, s, s, ts) for (o, s, ts) in rows],
        "l_orderkey long, l_suppkey long, l_linenumber long, l_shipdate timestamp",
    )
    out = {r.s_name: r.numwait for r in
           R.supplier_wait_blame(supplier, orders, lineitem).collect()}
    assert out == {"S1": 1}


def test_equi_depth_histogram_uniform_and_ties(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    out = {r.bucket: r for r in R.equi_depth_histogram(df, "v", 4).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert all(out[b].n_rows == 25 for b in out)
    assert out[1].lo == 1.0 and out[4].hi == 100.0
    assert out[1].hi < out[2].lo  # buckets are disjoint value ranges
    # all-ties degenerate case: everything lands in bucket 1
    ties = spark.createDataFrame([(7.0,)] * 20, "v double")
    trow = R.equi_depth_histogram(ties, "v", 4).collect()
    assert len(trow) == 1 and trow[0].bucket == 1 and trow[0].n_rows == 20


def test_constraint_checks_catch_injected_violations(spark):
    import datetime as dt

    orders = spark.createDataFrame(
        [
            (1, 10, "F", 5.0, dt.datetime(1995, 1, 1)),
            (1, 10, "O", 5.0, dt.datetime(1995, 1, 2)),   # duplicate PK
            (2, 99, "P", 5.0, dt.datetime(1995, 1, 3)),   # orphan custkey
            (3, 10, "X", -1.0, None),  # bad status, negative, null date
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp",
    )
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    out = {
        r.check_name: (r.violations, r.passed)
        for r in R.orders_constraint_checks(orders, customer).collect()
    }
    assert out == {
        "fk_customer_exists": (1, False),
        "orderdate_not_null": (1, False),
        "pk_orderkey_unique": (1, False),
        "status_in_domain": (1, False),
        "totalprice_nonnegative": (1, False),
    }


def test_grouped_pearson_corr_matches_builtin_and_handles_degenerate(spark):
    rows = [("a", float(i), float(2 * i + 1)) for i in range(1, 50)]
    rows += [("b", float(i), float(100 - 3 * i)) for i in range(1, 40)]
    rows += [("c", 5.0, float(i)) for i in range(1, 10)]  # zero x-variance
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in R.grouped_pearson_corr(df, "x", "y", ["g"]).collect()}
    assert out["a"].corr_xy == pytest.approx(1.0, abs=1e-12)
    assert out["b"].corr_xy == pytest.approx(-1.0, abs=1e-12)
    assert out["c"].corr_xy is None  # degenerate like the built-in
    # note: the BUILT-IN corr raises DIVIDE_BY_ZERO on the degenerate
    # group under ANSI mode — ours returns NULL; cross-check on the
    # well-defined groups only
    builtin = {
        r.g: r.c
        for r in df.where("g <> 'c'")
        .groupBy("g")
        .agg(F.corr("x", "y").alias("c"))
        .collect()
    }
    for g in ("a", "b"):
        assert out[g].corr_xy == pytest.approx(builtin[g], abs=1e-9)


def test_new_operators_tolerate_empty_inputs(spark):
    """Degenerate-input contract: empty frames flow through to empty
    results, never to planner or runtime errors."""
    from database_per_keyword_analysis_spark.operators import dedup as D
    from database_per_keyword_analysis_spark.operators.events import (
        daily_value_locf,
    )

    assert R.equi_depth_histogram(
        spark.createDataFrame([], "v double"), "v", 4
    ).collect() == []
    assert D.fuzzy_string_pairs(
        spark.createDataFrame([], "id long, name string"), "id", "name"
    ).collect() == []
    assert daily_value_locf(
        spark.createDataFrame(
            [],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
    ).collect() == []
    assert R.high_balance_inactive_customers(
        spark.createDataFrame([], "c_custkey long, c_nationkey long, c_acctbal double"),
        spark.createDataFrame([], "o_orderkey long, o_custkey long, o_orderdate timestamp"),
    ).collect() == []
    assert R.grouped_pearson_corr(
        spark.createDataFrame([], "g string, x double, y double"),
        "x", "y", ["g"],
    ).collect() == []


def test_customer_order_distribution_includes_zero_bucket(spark):
    customer = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2)], "o_orderkey long, o_custkey long"
    )
    out = {r.c_count: r.custdist for r in
           R.customer_order_distribution(customer, orders).collect()}
    # cust 1: 2 orders; cust 2: 1; cust 3: 0 -> the Q13 trap bucket
    assert out == {2: 1, 1: 1, 0: 1}


def test_late_shipment_priority_boundary_and_partition(spark):
    """Q12 semantics: 'late' is STRICTLY more than late_days after the
    order date (the +60d boundary line is on-time), only the target
    year counts, and critical/normal partition the priority domain."""
    from datetime import datetime as DT

    orders = spark.createDataFrame(
        [
            (1, DT(1997, 3, 1), "1-URGENT"),
            (2, DT(1997, 3, 1), "5-LOW"),
            (3, DT(1996, 3, 1), "2-HIGH"),  # wrong year: excluded
        ],
        "o_orderkey long, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            (1, "A", DT(1997, 4, 30)),  # exactly +60d: NOT late
            (1, "A", DT(1997, 5, 1)),   # +61d: late, critical
            (2, "A", DT(1997, 5, 2)),   # late, normal
            (2, "R", DT(1997, 3, 2)),   # on time
            (3, "A", DT(1996, 9, 1)),   # late but 1996 order: excluded
        ],
        "l_orderkey long, l_returnflag string, l_shipdate timestamp_ntz",
    )
    rows = {
        r.l_returnflag: (r.critical_count, r.normal_count)
        for r in R.late_shipment_priority(lineitem, orders).collect()
    }
    assert rows == {"A": (1, 1)}


def test_nation_profit_arithmetic_and_part_filter(spark):
    """Q9 semantics: profit = extprice·(1−disc) − retail·qty·rate summed
    per (nation, year); parts not matching the name filter contribute
    nothing."""
    from datetime import datetime as DT

    lineitem = spark.createDataFrame(
        [(1, 100, 7, 2.0, 50.0, 0.1), (1, 200, 7, 1.0, 99.0, 0.0)],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double, l_discount double",
    )
    orders = spark.createDataFrame(
        [(1, DT(1996, 6, 1))], "o_orderkey long, o_orderdate timestamp_ntz"
    )
    part = spark.createDataFrame(
        [(100, "blue rod", 30.0), (200, "cold widget", 10.0)],
        "p_partkey long, p_name string, p_retailprice double",
    )
    supplier = spark.createDataFrame(
        [(7, 3)], "s_suppkey long, s_nationkey long"
    )
    nation = spark.createDataFrame(
        [(3, "NATION_3")], "n_nationkey long, n_name string"
    )
    rows = R.nation_profit(
        lineitem, orders, part, supplier, nation, part_substr="rod"
    ).collect()
    # only the 'rod' line survives the part filter; extendedprice is
    # the line total: 50.0*(1-0.1) - 30.0*2.0*0.10 = 39.0
    assert len(rows) == 1
    r = rows[0]
    assert (r.nation, r.order_year) == ("NATION_3", 1996)
    assert abs(r.profit - 39.0) < 1e-9


def test_round7_operators_tolerate_empty_inputs(spark):
    """Degenerate-input contract for the round-7 additions: empty frames
    flow through to empty (or zero-total) results, never planner or
    runtime errors."""
    from database_per_keyword_analysis_spark.catalog import (
        FROZEN_BPE_MERGES,
        FROZEN_EMB_CENTROIDS,
    )
    from database_per_keyword_analysis_spark.operators import bpe as B
    from database_per_keyword_analysis_spark.operators import (
        similarity as SIM,
    )
    from database_per_keyword_analysis_spark.operators import (
        textquality as TQ,
    )
    from database_per_keyword_analysis_spark.operators.scale import (
        join_size_report,
        skew_report,
    )

    li = spark.createDataFrame(
        [],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_returnflag string, "
        "l_shipdate timestamp_ntz",
    )
    orders = spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz, "
        "o_orderpriority string",
    )
    part = spark.createDataFrame(
        [], "p_partkey long, p_name string, p_retailprice double"
    )
    supplier = spark.createDataFrame([], "s_suppkey long, s_nationkey long")
    nation = spark.createDataFrame([], "n_nationkey long, n_name string")
    assert R.nation_profit(li, orders, part, supplier, nation).collect() == []
    assert R.late_shipment_priority(li, orders).collect() == []

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert TQ.kneser_ney_bigram_scores(docs).collect() == []
    assert TQ.kneser_ney_trigram_scores(docs).collect() == []
    assert (
        B.bpe_fertility_by_group(
            spark.createDataFrame([], "doc_id long, text string, lang string"),
            FROZEN_BPE_MERGES,
        ).collect()
        == []
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert SIM.cluster_assign_frozen(emb, FROZEN_EMB_CENTROIDS).collect() == []
    assert (
        SIM.cluster_balanced_sample(
            emb, FROZEN_EMB_CENTROIDS, target_total=10
        ).collect()
        == []
    )
    assert (
        SIM.ivf_knn_frozen(emb, emb, FROZEN_EMB_CENTROIDS).collect() == []
    )

    keys = spark.createDataFrame([], "k long")
    assert skew_report(keys, ["k"]).collect() == []
    rows = join_size_report(keys, keys, ["k"]).collect()
    assert len(rows) == 1 and rows[0].k is None and rows[0].n_pairs == 0


def test_round8_operators_tolerate_empty_inputs(spark):
    """Degenerate-input contract for the round-8 additions: empty
    frames flow through to empty (or decision-only) results, never
    planner or runtime errors."""
    from database_per_keyword_analysis_spark.catalog import (
        FROZEN_EMB_CENTROIDS,
    )
    from database_per_keyword_analysis_spark.operators import graph as G
    from database_per_keyword_analysis_spark.operators import merge as M
    from database_per_keyword_analysis_spark.operators import (
        similarity as SIM,
    )
    from database_per_keyword_analysis_spark.operators.scale import (
        choose_join_strategy,
        join_strategy_report,
    )

    # snapshot diff: empty vs empty, and one-sided
    empty = spark.createDataFrame([], "k long, v string")
    one = spark.createDataFrame([(1, "a")], "k long, v string")
    assert M.table_diff(empty, empty, ["k"]).collect() == []
    assert [r.op for r in M.table_diff(empty, one, ["k"]).collect()] == [
        "insert"
    ]
    assert [r.op for r in M.table_diff(one, empty, ["k"]).collect()] == [
        "delete"
    ]
    # PIT join: empty facts / empty history
    hist = spark.createDataFrame(
        [], "k long, valid_from timestamp_ntz, valid_to timestamp_ntz, "
        "tier string",
    )
    facts = spark.createDataFrame([], "k long, fts timestamp_ntz")
    assert M.scd2_pit_join(facts, hist, ["k"], "fts").collect() == []
    import datetime as dt

    facts1 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "k long, fts timestamp_ntz"
    )
    got = M.scd2_pit_join(facts1, hist, ["k"], "fts").collect()
    assert len(got) == 1 and got[0].tier is None
    # PageRank: empty edge list -> empty ranks
    edges = spark.createDataFrame([], "src string, dst string")
    assert G.pagerank_fixed(edges, iters=1).collect() == []
    # PQ: empty corpus -> no neighbors; empty queries -> no rows
    books = SIM.pq_codebooks_from_centroids(FROZEN_EMB_CENTROIDS, 4)
    vecs = spark.createDataFrame([], "vec_id long, embedding array<double>")
    one_vec = spark.createDataFrame(
        [(0, [0.01] * 64)], "vec_id long, embedding array<double>"
    )
    assert SIM.pq_knn_frozen(one_vec, vecs, books).collect() == []
    assert SIM.pq_knn_frozen(vecs, one_vec, books).collect() == []
    assert SIM.pq_encode_frozen(vecs, books).collect() == []
    # control loop: empty sides pick the cheap tiers deterministically
    d = choose_join_strategy(vecs, vecs, ["vec_id"])
    assert d["strategy"] == "broadcast" and d["small_rows"] == 0
    d2 = choose_join_strategy(one_vec, one_vec, ["vec_id"], broadcast_max_rows=0)
    assert d2["strategy"] in ("shuffle", "salted")
    rep = join_strategy_report(vecs, vecs, ["vec_id"]).collect()
    assert len(rep) == 1 and rep[0].small_rows == 0


def test_hll_sketch_rollup_bounds_and_merge_exactness(spark, sf_dir, tmp_path):
    """r8 sketch rollup: (a) weekly estimates within the documented
    HLL error of exact uniques, (b) union of persisted DAILY sketches
    gives the BIT-SAME estimate as one sketch over the raw range
    (sketch-state exactness — the property that makes incremental
    maintenance sound), (c) sketches survive a parquet round-trip."""
    from pyspark.sql import functions as F

    from database_per_keyword_analysis_spark.operators import rollup as RU
    from database_per_keyword_analysis_spark.sources import load

    events = load(spark, sf_dir, "events")
    daily = RU.hll_sketch_rollup(events, "ts", "user_id", unit="day")
    # (c) persist + read back: BINARY sketches round-trip
    p = str(tmp_path / "sketches")
    daily.write.parquet(p)
    stored = spark.read.parquet(p)
    weekly = {r.bucket: r.est_distinct for r in RU.hll_merge_estimate(stored).collect()}
    exact = {
        r.bucket: r.n
        for r in events.select(
            F.date_trunc("week", F.col("ts")).alias("bucket"), "user_id"
        )
        .groupBy("bucket")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(weekly) == set(exact)
    for b, est in weekly.items():
        assert abs(est - exact[b]) / exact[b] < 0.05, (b, est, exact[b])
    # (b) daily-union == one-pass sketch state, bit-exact estimate
    one_pass = (
        events.select(F.col("user_id").alias("_k"))
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(_k))").alias("e"))
        .collect()[0].e
    )
    merged = (
        stored.agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias("e")
        ).collect()[0].e
    )
    assert merged == one_pass


def test_time_decayed_counts_semantics(spark):
    """r8 decay aggregate: anchor row weighs 1.0; a row exactly one
    half-life older weighs 0.5; optional per-row weights multiply;
    empty input -> empty output."""
    import datetime as dt

    from database_per_keyword_analysis_spark.operators.stats import (
        time_decayed_counts,
    )

    df = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 8), 1.0),   # anchor -> w=1
            ("a", dt.datetime(2024, 1, 1), 1.0),   # one half-life -> 0.5
            ("b", dt.datetime(2024, 1, 8), 3.0),   # weighted anchor row
        ],
        "k string, ts timestamp_ntz, wt double",
    )
    got = {
        r.k: (r.decayed_score, r.n_rows)
        for r in time_decayed_counts(df, ["k"], "ts").collect()
    }
    assert got["a"] == (1.5, 2)
    assert got["b"] == (1.0, 1)
    with_w = {
        r.k: r.decayed_score
        for r in time_decayed_counts(
            df, ["k"], "ts", weight_col="wt"
        ).collect()
    }
    assert with_w["b"] == 3.0 and with_w["a"] == 1.5
    empty = spark.createDataFrame([], "k string, ts timestamp_ntz, wt double")
    assert time_decayed_counts(empty, ["k"], "ts").collect() == []
