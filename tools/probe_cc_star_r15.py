"""Probe (r14 verdict item 3): two-phase large-star/small-star
connected components (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) vs the shipped alternating
min-propagation(+pointer-jump) design, on the REAL sf0.1 pair lists.

Both converge to label(n) = min node id reachable from n, so at the
fixpoint results are identical — asserted at sf0.01 before timing.
Timing: the CC-consuming queries (winnowing_dup_groups, semantic_dedup,
corpus_curation) run interleaved A/B/A/B in one session with the star
implementation monkeypatched in for the B arms.

Usage: python tools/probe_cc_star_r15.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def cc_star(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    shortcut_after: int = 2,
    steps_per_round: int = 2,
) -> DataFrame:
    """Large-star/small-star CC.  Signature-compatible with
    dedup.connected_components (the extra knobs are accepted and
    ignored — they parameterize the propagation design)."""
    del shortcut_after, steps_per_round
    pairs = pairs.localCheckpoint()
    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    all_nodes = e.select(F.col("u").alias("n")).distinct().localCheckpoint()

    def large_star(edges: DataFrame) -> DataFrame:
        # per u over the SYMMETRIC neighborhood: m = min(Γ(u) ∪ {u});
        # emit (v, m) for strictly larger neighbors v > u
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("_mv")).select(
            "u", F.least(F.col("_mv"), F.col("u")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(edges: DataFrame) -> DataFrame:
        # orient each edge (hi, lo); per hi: m = min neighbors;
        # emit (v, m) for all smaller neighbors v plus (hi, m)
        o = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        lower = (
            o.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_edges = mins.select(F.col("u"), F.col("m").alias("v"))
        return (
            lower.union(self_edges)
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    cur = e
    for _ in range(max_iter):
        nxt = small_star(large_star(cur)).localCheckpoint()
        # converged when the edge multiset is a star already: one round
        # leaves it unchanged.  Cheap check: same row count AND every
        # (u, v) of nxt present in cur (counts equal + anti-join empty)
        if nxt.count() == cur.count() and (
            nxt.join(cur, ["u", "v"], "left_anti").limit(1).count() == 0
        ):
            cur = nxt
            break
        cur = nxt
    # final star: (v, root) edges; roots label themselves
    roots = cur.select(F.col("v").alias("n")).distinct()
    labels = cur.select(F.col("u").alias("n"), F.col("v").alias("label"))
    # nodes that appear in no final edge as u are roots; give them
    # their own label, and keep any node of the original graph
    out = (
        all_nodes.join(labels, "n", "left")
        .select("n", F.coalesce("label", "n").alias("label"))
    )
    return out.select(F.col("n").alias("doc_id"), F.col("label").alias("group_id"))


def check_equal(spark, sf_dir: str) -> None:
    from database_per_keyword_analysis_spark.operators import dedup as D
    from database_per_keyword_analysis_spark.sources.loader import load

    docs = load(spark, sf_dir, "documents")
    pair_sets = {
        "minhash": D.minhash_near_dups(docs),
        "winnowing": D.winnowing_pairs(docs),
    }
    for name, pairs in pair_sets.items():
        want = sorted(
            tuple(r)
            for r in D.connected_components(pairs).collect()
        )
        got = sorted(tuple(r) for r in cc_star(pairs).collect())
        assert got == want, f"{name}: star CC diverges from propagation CC"
        print(f"equal on {name}: {len(want)} nodes", flush=True)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from database_per_keyword_analysis_spark import catalog
    from database_per_keyword_analysis_spark.operators import dedup as dd
    from database_per_keyword_analysis_spark.session import get_spark

    spark = get_spark("probe-cc-star")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    check_equal(spark, "/root/testdata/sf0.01")

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    queries = ["winnowing_dup_groups", "semantic_dedup", "corpus_curation"]
    orig = dd.connected_components
    arms = {"prop": orig, "star": cc_star}
    res = {q: {a: [] for a in arms} for q in queries}
    for trip in range(5):
        order = list(arms) if trip % 2 == 0 else list(arms)[::-1]
        for a in order:
            dd.connected_components = arms[a]
            try:
                for q in queries:
                    t0 = time.perf_counter()
                    catalog.queries()[q](spark, sf).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = round(time.perf_counter() - t0, 2)
                    res[q][a].append(dt)
                    print(f"trip {trip} {a} {q}: {dt}s", flush=True)
                    spark.catalog.clearCache()
            finally:
                dd.connected_components = orig
    import statistics

    for q in queries:
        p = statistics.median(res[q]["prop"])
        s = statistics.median(res[q]["star"])
        print(f"{q}: prop={p} star={s} star/prop={s / p:.3f}")
    print("RESULT", res)
    spark.stop()


if __name__ == "__main__":
    main()
