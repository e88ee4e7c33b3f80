"""Re-probe the five r14-rejected bounded-intermediate checkpoints at
sf1 (10x) — r14 verdict item 8.  At sf0.1 the duplicated branches ran
in parallel on idle cores and every checkpoint LOST 1.2-2.3x; the
builder's own 100 TB caveat says saturated cores shift the calculus
toward materialization.  This probe measures exactly that flip point
on 10x fixtures (.cache/scale_tpch1, .cache/scale_events1,
.cache/scale_docs1 — composite dir .cache/sf1probe).

Arms (lazy = shipped code; ckpt = the r14 probe's checkpoint variant,
re-implemented verbatim here):
  purchase_funnel / purchase_funnel_24h — localCheckpoint each
    user-cardinality reach table (events.py funnel_report);
  source_token_js_matrix — localCheckpoint the (group, token) count
    (textquality.py token_js_matrix);
  min_cost_supplier — localCheckpoint the offers aggregate;
  important_parts — localCheckpoint the per-part aggregate.

Interleaved in ONE session, monkeypatching the operator per arm.

Usage: python tools/probe_sf1_checkpoints_r15.py [trips]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".cache", "sf1probe")


def funnel_report_ckpt(events, stages, user_col="user_id", ts_col="ts",
                       type_col="event_type", max_lag_hours=None):
    reach = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts_col).alias("_t"))
        .localCheckpoint()
    )
    tables = [reach]
    lag = (
        F.expr(f"INTERVAL {int(max_lag_hours * 3600)} SECOND")
        if max_lag_hours is not None
        else None
    )
    for s in stages[1:]:
        cond = (F.col(user_col) == F.col("_u")) & (F.col(ts_col) > F.col("_t"))
        if lag is not None:
            cond = cond & (F.col(ts_col) <= F.col("_t") + lag)
        nxt = (
            events.where(F.col(type_col) == s)
            .join(tables[-1], cond)
            .groupBy(F.col("_u").alias("_u2"))
            .agg(F.min(ts_col).alias("_t2"))
            .select(F.col("_u2").alias("_u"), F.col("_t2").alias("_t"))
            .localCheckpoint()
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


def min_cost_supplier_ckpt(lineitem, supplier, nation, region, part,
                           region_name="EUROPE", p_type="LARGE"):
    dims = (
        supplier.join(F.broadcast(nation),
                      supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == region_name)
        .select("s_suppkey", "s_name", "n_name")
    )
    offers = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "n_name")
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("avg_price")
        )
        .localCheckpoint()
    )
    # post-checkpoint the min table derives from the SAME plan as
    # offers, so the self-join columns must be disambiguated by rename
    min_price = (
        offers.groupBy("l_partkey")
        .agg(F.min("avg_price").alias("min_price"))
        .select(F.col("l_partkey").alias("_mp_part"), "min_price")
    )
    return (
        offers.join(
            min_price,
            (offers.l_partkey == F.col("_mp_part"))
            & (offers.avg_price == F.col("min_price")),
        )
        .join(F.broadcast(part.where(F.col("p_type") == p_type)),
              offers.l_partkey == F.col("p_partkey"))
        .select("p_partkey", "p_name", "l_suppkey", "s_name", "n_name",
                "min_price")
        .orderBy("p_partkey", "l_suppkey")
    )


def important_parts_ckpt(lineitem, supplier, nation,
                         nation_name="NATION_3", fraction=0.002):
    nat_supp = (
        supplier.join(F.broadcast(nation),
                      supplier.s_nationkey == nation.n_nationkey)
        .where(F.col("n_name") == nation_name)
        .select("s_suppkey")
    )
    per_part = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias(
                "_dec_value"
            )
        )
        .localCheckpoint()
    )
    total = per_part.agg(
        F.sum("_dec_value").cast("double").alias("_total_value")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(
            F.col("_dec_value").cast("double")
            > F.lit(fraction) * F.col("_total_value")
        )
        .select(
            "l_partkey",
            F.col("_dec_value").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def token_js_matrix_ckpt(docs, group_col="source", text_col="text"):
    from database_per_keyword_analysis_spark.operators import textquality as TQ

    toks = docs.where(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("token"),
    )
    gt = (
        toks.groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    gtot = gt.groupBy("grp").agg(F.sum("c").alias("gn"))
    p = gt.join(F.broadcast(gtot), "grp").select(
        "grp", "token",
        (F.col("c").cast("double") / F.col("gn").cast("double")).alias("p"),
    )
    a = p.select(F.col("grp").alias("group_a"), "token", F.col("p").alias("pa"))
    b = p.select(F.col("grp").alias("group_b"), "token", F.col("p").alias("pb"))
    d18 = lambda c: c.cast("decimal(38,18)")  # noqa: E731
    pa, pb = F.col("pa"), F.col("pb")
    shared = (
        a.join(b, "token")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum(d18(pa)).alias("sa"),
            F.sum(d18(pb)).alias("sb"),
            F.sum(
                d18(
                    pa * F.log(F.lit(2.0) * pa / (pa + pb))
                    + pb * F.log(F.lit(2.0) * pb / (pa + pb))
                )
            ).alias("core"),
        )
    )
    pairs = (
        gtot.select(F.col("grp").alias("group_a"))
        .crossJoin(gtot.select(F.col("grp").alias("group_b")))
        .where(F.col("group_a") < F.col("group_b"))
    )
    js = (
        F.lit(0.5) * F.lit(TQ.LN2)
        * (
            F.lit(2.0)
            - F.coalesce(F.col("sa").cast("double"), F.lit(0.0))
            - F.coalesce(F.col("sb").cast("double"), F.lit(0.0))
        )
        + F.lit(0.5) * F.coalesce(F.col("core").cast("double"), F.lit(0.0))
    )
    return (
        pairs.join(shared, ["group_a", "group_b"], "left")
        .select(
            "group_a", "group_b",
            F.coalesce("n_shared", F.lit(0).cast("long")).alias("n_shared"),
            F.round(js, 6).alias("js"),
        )
        .orderBy("group_a", "group_b")
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from database_per_keyword_analysis_spark import catalog
    from database_per_keyword_analysis_spark.operators import events as E2
    from database_per_keyword_analysis_spark.operators import relational as R
    from database_per_keyword_analysis_spark.operators import textquality as TQ
    from database_per_keyword_analysis_spark.session import get_spark

    trips = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("probe-sf1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = catalog.queries()

    patches = {
        "purchase_funnel": (E2, "funnel_report", funnel_report_ckpt),
        "purchase_funnel_24h": (E2, "funnel_report", funnel_report_ckpt),
        "min_cost_supplier": (R, "min_cost_supplier", min_cost_supplier_ckpt),
        "important_parts": (R, "important_parts", important_parts_ckpt),
        "source_token_js_matrix": (TQ, "token_js_matrix", token_js_matrix_ckpt),
    }
    # equality gate at sf0.01 for each variant
    sf001 = "/root/testdata/sf0.01"
    for q, (mod, attr, variant) in patches.items():
        want = sorted(tuple(r) for r in qs[q](spark, sf001).collect())
        orig = getattr(mod, attr)
        setattr(mod, attr, variant)
        try:
            got = sorted(tuple(r) for r in qs[q](spark, sf001).collect())
        finally:
            setattr(mod, attr, orig)
        assert got == want, f"{q}: checkpoint variant diverges"
        print(f"equal: {q}", flush=True)
    spark.catalog.clearCache()

    res = {q: {"lazy": [], "ckpt": []} for q in patches}
    arms = ["lazy", "ckpt"]
    for trip in range(trips):
        order = arms if trip % 2 == 0 else arms[::-1]
        for a in order:
            for q, (mod, attr, variant) in patches.items():
                orig = getattr(mod, attr)
                if a == "ckpt":
                    setattr(mod, attr, variant)
                try:
                    t0 = time.perf_counter()
                    qs[q](spark, SF1).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = round(time.perf_counter() - t0, 2)
                finally:
                    setattr(mod, attr, orig)
                res[q][a].append(dt)
                print(f"trip {trip} {a} {q}: {dt}s", flush=True)
                spark.catalog.clearCache()
    import statistics

    for q in res:
        lz = statistics.median(res[q]["lazy"])
        ck = statistics.median(res[q]["ckpt"])
        print(f"{q}: lazy={lz} ckpt={ck} ckpt/lazy={ck / lz:.3f}")
    print("RESULT", res)
    spark.stop()


if __name__ == "__main__":
    main()
