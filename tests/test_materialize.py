"""Lifecycle contract for materialized query intermediates (r14
verdict item 2): persist() entries registered during query
construction must be releasable, and a long session that releases
after each query keeps the CacheManager bounded — the measured
failure mode was ~30% planner drag from 12 accumulated entries
(OPTIMIZATION_r14.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_per_keyword_analysis_spark import materialize as M
from database_per_keyword_analysis_spark.operators import graph as G


def _n_cached(spark) -> int:
    """Entries currently registered in Catalyst's CacheManager."""
    return spark._jsparkSession.sharedState().cacheManager().cachedData().size()


def test_track_returns_df_and_registers(spark):
    df = spark.range(5).persist()
    before = M.n_tracked()
    out = M.track(df)
    assert out is df
    assert M.n_tracked() == before + 1
    M.release_materialized()
    assert M.n_tracked() == 0


def test_release_unpersists_and_result_recomputes(spark):
    spark.catalog.clearCache()
    M.release_materialized()
    edges = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("b", "y"), ("c", "y")],
        "src string, dst string",
    )
    df = G.pagerank_fixed(edges, iters=1)
    want = sorted(tuple(r) for r in df.collect())
    assert M.n_tracked() >= 1  # the DISK_ONLY edge persist registered
    assert _n_cached(spark) >= 1
    released = M.release_materialized()
    assert released >= 1
    assert _n_cached(spark) == 0
    # the returned DataFrame stays valid: consuming it again silently
    # recomputes from its inputs with identical results
    assert sorted(tuple(r) for r in df.collect()) == want


def test_min_cost_supplier_materialized_equals_lazy(spark, sf_dir):
    # r15 scale gate: the checkpointed-offers arm (sf1 regime) must be
    # bit-equal to the lazy arm (sf0.1 regime) — the gate only moves
    # WHEN the aggregate materializes, never what it computes
    from database_per_keyword_analysis_spark.operators import relational as R
    from database_per_keyword_analysis_spark.sources.loader import load

    args = [
        load(spark, sf_dir, t)
        for t in ("lineitem", "supplier", "nation", "region", "part")
    ]
    lazy = sorted(tuple(r) for r in R.min_cost_supplier(*args).collect())
    mat = sorted(
        tuple(r)
        for r in R.min_cost_supplier(*args, materialize_offers=True).collect()
    )
    assert mat == lazy


def test_token_js_matrix_materialized_equals_lazy(spark, sf_dir):
    from database_per_keyword_analysis_spark.operators import textquality as TQ
    from database_per_keyword_analysis_spark.sources.loader import load

    docs = load(spark, sf_dir, "documents")
    lazy = sorted(tuple(r) for r in TQ.token_js_matrix(docs).collect())
    mat = sorted(
        tuple(r)
        for r in TQ.token_js_matrix(docs, materialize_counts=True).collect()
    )
    assert mat == lazy


def test_cache_entries_bounded_across_50_sequential_invocations(spark):
    """The long-session story: 50 sequential persist-using query
    constructions, each released when its consumer finishes — the
    CacheManager never grows past one query's own entries."""
    spark.catalog.clearCache()
    M.release_materialized()
    edges = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("b", "y"), ("c", "y"), ("c", "z")],
        "src string, dst string",
    )
    peak = 0
    for i in range(50):
        df = G.pagerank_fixed(edges, iters=1)
        df.agg(F.sum("rank")).collect()  # the consumer finishes
        peak = max(peak, _n_cached(spark))
        M.release_materialized()
        assert _n_cached(spark) == 0, f"cache leaked at invocation {i}"
    # one invocation registers exactly its own bounded set (the edge
    # persist), never an accumulating backlog
    assert 1 <= peak <= 4
