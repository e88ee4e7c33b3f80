from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from database_per_keyword_analysis_spark.operators import scale as SC
from database_per_keyword_analysis_spark.sources import load


def test_salted_sum_matches_direct(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    direct = {
        r.source: r.s
        for r in docs.groupBy("source").agg(F.sum("n_chars").alias("s")).collect()
    }
    salted = {
        r.source: r.s
        for r in SC.salted_sum(docs, ["source"], "n_chars", "s").collect()
    }
    assert salted == direct


def test_salted_count_matches_direct(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    direct = {r.user_id: r.n for r in ev.groupBy("user_id").count().withColumnRenamed("count", "n").collect()}
    salted = {r.user_id: r.n for r in SC.salted_count(ev, ["user_id"], "n").collect()}
    assert salted == direct


def test_salt_is_deterministic(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(50)
    a = [r["__salt"] for r in SC.with_salt(docs).orderBy("doc_id").collect()]
    b = [r["__salt"] for r in SC.with_salt(docs).orderBy("doc_id").collect()]
    assert a == b
    assert len(set(a)) > 1  # actually spreads


def test_salted_plan_has_two_stage_agg(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    plan = (
        SC.salted_sum(docs, ["source"], "n_chars", "s")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # two distinct hash aggregations over two exchanges (salted partial,
    # then final combine)
    assert plan.count("Exchange hashpartitioning") >= 2


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    SC.write_bucketed(
        load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey"),
        "b_orders",
        ["custkey"],
        n_buckets=8,
    )
    SC.write_bucketed(
        load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey"),
        "b_customer",
        ["custkey"],
        n_buckets=8,
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_is_exchange_free(spark, sf_dir, bucketed_tables):
    t_orders, t_cust = bucketed_tables
    o = spark.table(t_orders)
    c = spark.table(t_cust)
    # forbid broadcast so the plan would need a shuffle WITHOUT bucketing
    joined = o.hint("merge").join(c, "custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    # same join on the raw (unbucketed) tables DOES exchange
    o2 = load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    c2 = load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    plan2 = o2.hint("merge").join(c2, "custkey")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan2
    # and the bucketed join returns the right row count
    assert joined.count() == o2.join(c2, "custkey").count()


def test_bucketed_postings_index_probe(spark, sf_dir, tmp_path):
    # round-4 advice item 6: persisted indexes in the bucketed layout.
    from database_per_keyword_analysis_spark.operators import search as SRCH

    docs = load(spark, sf_dir, "documents")
    idx = str(tmp_path / "bm25_bucketed")
    SRCH.build_postings_index(docs, idx, n_buckets=8)

    # probe parity with the in-plan scorer
    probe = SRCH.bm25_probe(spark, idx, n_buckets=8)
    direct = SRCH.bm25_search(docs)
    assert sorted(map(tuple, probe.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # the bucketed layout removes the Exchange under the per-token df
    # aggregate and prunes buckets on the token IN-filter
    posted = SRCH._open_postings(spark, idx, "doc_id", 8)
    agg_plan = (
        posted.groupBy("token").count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in agg_plan, agg_plan[:2000]
    # the probe shape (token IN-filter + per-token aggregate) keeps the
    # bucketed scan alive (a filter-only plan has no distribution
    # requirement, so the planner auto-disables bucketing there), and
    # the IN-filter then prunes whole buckets
    scan_plan = (
        posted.where(F.col("token").isin("data", "model"))
        .groupBy("token").count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SelectedBucketsCount" in scan_plan, scan_plan[:2000]
    assert "Exchange" not in scan_plan

    # a fresh catalog (dropped table) re-registers from files — no
    # rewrite, same exchange-free plan
    table = SC._index_table_name(f"{idx}/postings")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    posted2 = SRCH._open_postings(spark, idx, "doc_id", 8)
    plan2 = (
        posted2.groupBy("token").count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan2


def test_bucketed_ivf_self_join_exchange_free(spark, sf_dir, tmp_path):
    from database_per_keyword_analysis_spark.operators import similarity as SIM

    emb = load(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf_bucketed")
    assigned, cents = SIM.ivf_index(emb, n_lists=4, index_path=idx, n_buckets=8)
    a = assigned.select("list_id", F.col("vec_id").alias("vec_a"))
    b = assigned.select("list_id", F.col("vec_id").alias("vec_b"))
    plan = (
        a.hint("merge").join(b, "list_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # semantic_dedup's candidate join shape: both sides the bucketed
    # index -> no Exchange on either
    assert "Exchange" not in plan, plan[:2000]

    # bucketed semantic_dedup decisions equal the plain-layout tier
    plain = SIM.semantic_dedup(emb, threshold=0.4, n_lists=4)
    bucketed = SIM.semantic_dedup(
        emb, threshold=0.4, n_lists=4, index_path=idx, n_buckets=8
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bucketed.collect())
    )
