"""Relational operator surface: joins, aggregations, windows, set ops.

The reference has NO key-based joins anywhere (SURVEY.md §2.3) — its only
join-like constructs are membership predicates.  This module provides the
full relational surface a user of a real engine needs, exercised over the
driver's TPC-H-ish fixtures, all as declarative DataFrame compositions so
Catalyst owns join strategy (AQE broadcast/sort-merge/skew handling),
pushdown, and pruning.

Numeric convention for oracle-stable aggregates: double products are
computed per-row in IEEE double (bit-identical in any engine), CAST to
DECIMAL(18,6) (deterministic rounding), summed exactly in decimal (order-
independent), then presented as DOUBLE — so a parallel Spark sum and a
sequential DuckDB sum agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dec_sum(expr: F.Column, alias: str, scale: int = 6) -> F.Column:
    """Order-independent sum of a double expression (see module doc)."""
    return F.sum(expr.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def pricing_summary(lineitem: DataFrame, cutoff: str = "2001-09-01") -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical scan→filter→group→agg.

    Map-side partial aggregation reduces ~rows to 6 groups before the
    shuffle; the filter pushes into the parquet scan.
    """
    li = lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(F.col("l_quantity"), "sum_qty"),
            dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            # deterministic avg: exact decimal sum → double, then one double
            # division (plain avg(double) varies with summation order)
            (
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame,
    region: DataFrame, region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5-style multi-join: revenue per nation within one region.

    Join order: fact-to-fact (orders⋈lineitem) shuffles on orderkey; the
    dimension chain customer⋈nation⋈region is small and broadcast, so no
    extra shuffle for it.  AQE would pick this anyway at these sizes; the
    explicit `broadcast` makes the intent survive a 100× scale-up where
    stale statistics might not.
    """
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == region_name)
        .select("c_custkey", "n_name")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(dec_sum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def top_customers_by_revenue(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 10
) -> DataFrame:
    """TPC-H Q10-flavored: top-k customers by lineitem revenue."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dec_sum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def top_suppliers_by_revenue(
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q15-style: top-k suppliers by shipped revenue in a window.

    Exercises the supplier dimension (the reference fixture no other
    query reads).  The shipdate filter pushes into the parquet scan;
    revenue aggregates to one row per suppkey BEFORE any join, so the
    shuffle carries (suppkey, partial decimal sum) — then the tiny
    aggregated side joins broadcast supplier→nation, no second shuffle.
    """
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp_ntz"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(dec_sum(revenue, "revenue"))
    return (
        rev.join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), "s_suppkey")
        .limit(k)
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-style shipping priority: top-k unshipped orders by
    revenue for one market segment (orders placed before `cutoff`,
    lineitems shipping after it).

    Both fact scans are date-filtered BEFORE any join (the predicates
    push into the parquet scans); the segment-filtered customer key set
    broadcasts into orders, and the one shuffle join is
    lineitem⋈orders on orderkey — the same fact-to-fact-then-broadcast
    shape as revenue_by_nation."""
    cut = F.lit(cutoff).cast("timestamp_ntz")
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = (
        orders.where(F.col("o_orderdate") < cut)
        .join(F.broadcast(cust), orders.o_custkey == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = lineitem.where(F.col("l_shipdate") > cut)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(k)
    )


def segment_order_stats(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Orders per market segment: equi-join + group-by with several aggs,
    including a distinct agg (absent from the reference, SURVEY.md §2.4)."""
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dec_sum(F.col("o_totalprice"), "total_price"),
        )
        .orderBy("c_mktsegment")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti-join (J3 generalized): customers that never ordered."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def customers_with_open_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi-join (J2): customers having at least one open ('O') order."""
    open_orders = orders.where(F.col("o_orderstatus") == "O")
    return (
        customer.join(open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def high_balance_inactive_customers(
    customer: DataFrame, orders: DataFrame, cutoff: str = "1998-01-01"
) -> DataFrame:
    """TPC-H Q22-style 'global sales opportunity': per nation, the count
    and total balance of customers whose account balance exceeds the
    average positive balance (a correlated scalar subquery in the SQL
    formulation) and who placed no order since `cutoff` (NOT EXISTS).

    Decorrelated Spark-first: the scalar subquery becomes a 1-row
    aggregate cross-joined in as a broadcast scalar (zero shuffle — the
    decorrelation Catalyst itself applies to uncorrelated scalar
    subqueries), and NOT EXISTS becomes a left_anti join against the
    date-filtered orders projection (predicate pushed to the orders
    scan, only o_custkey shipped).  The threshold is an exact DECIMAL
    sum cast to double, divided by the count — bit-identical on any
    engine, so the > comparison is oracle-stable.
    """
    thresh = customer.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    # timestamp_ntz, matching the module's date-filter convention
    # (pricing_summary, shipping_priority, forecast_revenue): an LTZ
    # literal would be boundary-correct only while the session timezone
    # is pinned to UTC (round-5 advice)
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def supplier_wait_blame(
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = 90,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21-style 'suppliers who kept orders waiting': for finished
    ('F') orders, count per supplier the multi-supplier orders where
    that supplier was the ONLY late one (shipped more than `late_days`
    after the order date) — EXISTS(another supplier in the order) AND
    NOT EXISTS(another LATE supplier in the order) in SQL.

    Decorrelated Spark-first: both correlated EXISTS predicates become
    self-joins of the (l_orderkey, l_suppkey) pair table — a left_semi
    against all pairs and a left_anti against the late pairs, each an
    equi-join on l_orderkey with the supplier inequality as a join
    residual.  All three legs shuffle on the SAME key (l_orderkey), so
    the exchanges reuse one partitioning; the pair tables are DISTINCT
    projections (two longs per row — the text/price columns never
    shuffle), and the supplier dimension broadcasts into the final
    count.  Deterministic top-k tie-break on s_name.
    """
    pairs = lineitem.select("l_orderkey", "l_suppkey").distinct()
    late = (
        lineitem.join(
            orders.where(F.col("o_orderstatus") == "F"),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = pairs.select(
        F.col("l_orderkey").alias("b_orderkey"),
        F.col("l_suppkey").alias("b_suppkey"),
    )
    other_late = late.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
    )
    blame = (
        late.join(
            other,
            (late.l_orderkey == other.b_orderkey)
            & (late.l_suppkey != other.b_suppkey),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == other_late.x_orderkey)
            & (F.col("l_suppkey") != other_late.x_suppkey),
            "left_anti",
        )
    )
    return (
        blame.join(F.broadcast(supplier), blame.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13-style customer distribution: how many customers placed
    exactly k orders, INCLUDING k=0 — which forces the LEFT OUTER join
    (an inner join would silently drop order-less customers, the
    classic Q13 trap) followed by the double aggregate.

    Scale: the outer join shuffles on custkey (both sides keyed, AQE
    co-partitions); the first aggregate reduces to one row per customer
    map-side-combinably; the second reduces to the distinct order-count
    domain (tiny).  `count(o_orderkey)` counts non-NULL keys only, so
    unmatched customers land in the k=0 bucket exactly as the SQL
    semantics require."""
    per_customer = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy(customer.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_customer.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def order_priority_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP over (status, priority) — the reference's per-industry +
    "Global" dual reporting (main.py:516-564) expressed as a grouping set.

    NULL group keys are labeled 'ALL' so the output is oracle-comparable.
    """
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum(F.col("o_totalprice"), "total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


def running_order_totals(orders: DataFrame) -> DataFrame:
    """Window surface absent from the reference (SURVEY.md §2.5): per
    customer, order sequence with lag delta and running total."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price_dec = F.col("o_totalprice").cast("decimal(18,6)")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.row_number().over(w).alias("order_seq"),
            F.sum(price_dec).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            .alias("running_total"),
            (price_dec - F.lag(price_dec, 1).over(w)).cast("double").alias("delta_prev"),
        )
    )


def part_type_distincts(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Exact distinct aggregates per brand (oracle-checked).  The
    approximate 100 TB path (HLL sketches, mergeable, no shuffle of
    distinct values) lives in `approx_order_stats` — approx results
    cannot hash-match a different engine's sketch, so the two variants
    are separate queries."""
    joined = lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
    return (
        joined.groupBy("p_brand")
        .agg(
            F.countDistinct("p_type").alias("n_types"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("p_brand")
    )


def nation_region_setops(nation: DataFrame, region: DataFrame) -> DataFrame:
    """Set-operation surface (E1/§2.7): union/except/intersect composition.

    Returns each nation name tagged with whether its region is AMERICA,
    built via intersect/except rather than a join, to exercise the ops.
    """
    america_keys = (
        region.where(F.col("r_name") == "AMERICA").select(F.col("r_regionkey").alias("k"))
    )
    all_keys = region.select(F.col("r_regionkey").alias("k"))
    other_keys = all_keys.exceptAll(america_keys)
    in_america = (
        nation.join(america_keys, nation.n_regionkey == F.col("k"), "left_semi")
        .select("n_name")
        .withColumn("in_america", F.lit(True))
    )
    outside = (
        nation.join(other_keys.intersect(all_keys), nation.n_regionkey == F.col("k"), "left_semi")
        .select("n_name")
        .withColumn("in_america", F.lit(False))
    )
    return in_america.unionByName(outside).orderBy("n_name")


def customer_nation_cube(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """CUBE over (market segment, nation): all four grouping sets in one
    shuffle — the generalization of the reference's per-industry +
    "Global" dual reporting (SURVEY.md §2.4 grouping-sets row).

    NULL group keys are labeled 'ALL' for oracle comparability.  At
    scale CUBE multiplies shuffle rows by the number of grouping sets;
    partial (map-side) aggregation still applies per set, so the
    shuffle carries group keys, not raw rows.
    """
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    return (
        joined.cube("c_mktsegment", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum(F.col("c_acctbal"), "total_acctbal", scale=2),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_acctbal",
        )
        .orderBy("segment", "nation")
    )


def approx_order_stats(orders: DataFrame) -> DataFrame:
    """Approximate aggregates per order priority: HLL distinct customers
    and approximate price quantiles (SURVEY.md §2.4 approx row).

    This is the 100 TB formulation: `approx_count_distinct` shuffles a
    fixed-size sketch per group instead of every distinct customer key,
    and `percentile_approx` a bounded histogram instead of a full sort.
    Deterministic for a fixed rsd/accuracy but engine-specific, so the
    correctness bound (vs the exact answers) is asserted in unit tests,
    not the DuckDB oracle.
    """
    price = F.col("o_totalprice")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
            F.percentile_approx(price, [0.5, 0.95, 0.99], 10_000).alias("price_q"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderpriority",
            "approx_customers",
            F.col("price_q")[0].alias("p50"),
            F.col("price_q")[1].alias("p95"),
            F.col("price_q")[2].alias("p99"),
            "n_orders",
        )
        .orderBy("o_orderpriority")
    )


def order_price_quantiles(orders: DataFrame) -> DataFrame:
    """EXACT quantiles per priority (`percentile`, linear interpolation —
    agrees bit-for-bit with DuckDB's quantile_cont, so oracle-checked,
    unlike the sketch tier in `approx_order_stats`).  Exact percentile
    sorts each group's values — at 100 TB use the approx tier; this is
    the correctness anchor it is validated against."""
    p = F.col("o_totalprice")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
            F.min(p).alias("min_price"),
            F.max(p).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram WITHOUT the classic
    global-ntile window: exact percentile boundaries are computed by
    the distributed `percentile` aggregate (the oracle-proven
    quantile machinery of `order_price_quantiles`), broadcast as one
    (n_buckets-1)-double array, and each row's bucket is the map-side
    expression 1 + |{b : value > b}|.  A global
    ``ntile() OVER (ORDER BY value)`` would funnel every row through
    ONE task — dead at 100 TB; this form's only shuffles are the
    percentile aggregate's and the n_buckets-group count.

    Ties that straddle a boundary land in the lower bucket on every
    engine (strict `>` against bit-identical boundaries), so counts
    are deterministic even though duplicate-heavy data makes the
    depths approximate — the documented equi-depth trade-off.
    Returns (bucket, n_rows, lo, hi) ordered by bucket."""
    v = F.col(value_col)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.expr(
            f"percentile({value_col}, array({', '.join(map(str, qs))}))"
        ).alias("_bounds")
    )
    bucket = F.lit(1) + F.size(
        F.filter(F.col("_bounds"), lambda b: v > b)
    )
    return (
        df.where(v.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(v).alias("lo"),
            F.max(v).alias("hi"),
        )
        .orderBy("bucket")
    )


def orders_constraint_checks(
    orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """Deequ-style declarative data-quality validation: one row per
    constraint with its violation count and pass verdict — the gate a
    pipeline runs before promoting a new snapshot.  Constraints:
    primary-key uniqueness, column completeness, value-domain and
    range checks (one multi-conditional aggregate pass over the fact),
    and referential integrity (a left_anti probe against the dimension
    — streamed, never a collected key set).  All counts are integers,
    so verdicts are exact on every engine.

    Scale: the four column checks share ONE aggregate scan (count +
    countDistinct + conditional sums); the FK check is the only join
    and ships o_custkey alone.  Both reductions end in 1-row frames
    cross-joined broadcast-style, then unpivoted via `stack` — output
    size is #constraints, independent of data size."""
    m = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_dup"),
        F.coalesce(
            F.sum(F.when(F.col("o_orderdate").isNull(), 1)), F.lit(0)
        ).alias("null_date"),
        F.coalesce(
            F.sum(F.when(F.col("o_totalprice") < 0, 1)), F.lit(0)
        ).alias("neg_price"),
        F.coalesce(
            F.sum(
                F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)
            ),
            F.lit(0),
        ).alias("bad_status"),
    )
    fk = (
        orders.select("o_custkey")
        .join(
            customer.select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    return (
        m.crossJoin(fk)
        .select(
            F.expr(
                "stack(5, "
                "'fk_customer_exists', fk_orphans, "
                "'orderdate_not_null', null_date, "
                "'pk_orderkey_unique', pk_dup, "
                "'status_in_domain', bad_status, "
                "'totalprice_nonnegative', neg_price"
                ") AS (check_name, violations)"
            )
        )
        .select(
            "check_name",
            F.col("violations").cast("long").alias("violations"),
            (F.col("violations") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )


def grouped_pearson_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Pearson correlation per group with ORACLE-EXACT arithmetic: the
    five moment sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as DECIMAL
    (order-independent, partitioning-invariant), and the textbook
    formula (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²̂)(n·Σy² − Σy²̂)) evaluates
    once in double — identical IEEE operations over bit-identical
    inputs on every engine, so even the float result hash-matches
    DuckDB (built-in `corr`'s streaming co-moment accumulation cannot:
    its result depends on combine order).  Per-row products stay exact
    in double while x·y carries ≤ 15 significant digits (cents-scale
    prices squared ≈ 12 digits — fine; re-scale inputs first beyond
    that).

    Scale: one partial-aggregatable groupBy — moment sums combine
    map-side, shuffle volume is O(groups × 6 decimals).  Degenerate
    groups (zero variance) return NULL like the built-in."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")

    def dsum(expr: F.Column, alias: str) -> F.Column:
        return F.sum(expr.cast("decimal(28,6)")).alias(alias)

    m = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        dsum(x, "_sx"),
        dsum(y, "_sy"),
        dsum(x * y, "_sxy"),
        dsum(x * x, "_sxx"),
        dsum(y * y, "_syy"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when(
        (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)
    ).otherwise(F.lit(None))
    return m.select(
        *group_cols,
        F.col("_n").alias("n_rows"),
        corr.alias("corr_xy"),
    ).orderBy(*group_cols)


def profile_table(df: DataFrame) -> DataFrame:
    """ANALYZE-style table profile: one row per column with
    (column, n_rows, n_nulls, n_distinct) — the quick health check a
    pipeline runs on every new snapshot.  Min/max are deliberately
    omitted: their string rendering is engine-specific (Java vs DuckDB
    double/timestamp formatting), the counts are not.

    One aggregation pass computes every statistic (count + null count +
    exact distinct per column in a single agg — map-side partial for
    the counts, expand for the distincts), then a `stack` pivots the
    single row to long form.  At profiling cardinality (#columns rows)
    this is one job regardless of table size."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in df.columns:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_rows - __nn_{c}, __nd_{c}" for c in df.columns
    )
    return (
        row.selectExpr(
            "__n_rows",
            f"stack({len(df.columns)}, {stack_args}) "
            "AS (column, n_nulls, n_distinct)",
        )
        .select(
            "column",
            F.col("__n_rows").alias("n_rows"),
            "n_nulls",
            "n_distinct",
        )
        .orderBy("column")
    )


# TPC-H Q19-style disjunctive predicate branches:
# (brand, max p_size, quantity range) — OR-of-ANDs across the join.
DISJUNCTIVE_BRANCHES = [
    ("Brand#12", 15, (1.0, 11.0)),
    ("Brand#23", 25, (10.0, 20.0)),
    ("Brand#3", 35, (20.0, 30.0)),
]


def disjunctive_revenue(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """TPC-H Q19-style discounted-revenue query: an OR of AND-groups
    mixing part-side (brand, size) and lineitem-side (quantity)
    predicates across an equi-join.  Returns one row
    (n_lineitems, revenue).

    Scale design: the reason Q19 is a classic optimizer test — the
    per-side CONJUNCTS of the disjunction must still push down.  The
    part-side OR (brand+size branches) prunes the dimension before the
    join (and `part` stays broadcast-sized); the lineitem-side
    quantity disjunction (1..30 overall) pushes to the parquet scan as
    a range residual.  The final predicate re-checks the full
    OR-of-ANDs post-join; revenue accumulates in DECIMAL (module
    convention)."""
    joined = lineitem.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    branch_preds = []
    for brand, max_size, (qlo, qhi) in DISJUNCTIVE_BRANCHES:
        branch_preds.append(
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(1, max_size))
            & (F.col("l_quantity").between(qlo, qhi))
        )
    pred = branch_preds[0]
    for p in branch_preds[1:]:
        pred = pred | p
    return joined.where(pred).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        dec_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        ),
    )


def forecast_revenue(
    lineitem: DataFrame,
    year: int = 1997,
    discount_band: tuple[float, float] = (0.04, 0.06),
    max_quantity: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-style revenue-change forecast: sum(extendedprice ·
    discount) over one shipping year, a discount band, and a quantity
    cap.  Returns one row (n_lineitems, revenue).

    Scale shape: pure scan→filter→scalar-agg — every predicate reaches
    the parquet scan (min/max row-group pruning on l_shipdate), the
    aggregate is map-side partial; no join, no wide shuffle."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
        & (
            F.col("l_shipdate")
            < F.lit(f"{year + 1}-01-01").cast("timestamp_ntz")
        )
        & F.col("l_discount").between(*discount_band)
        & (F.col("l_quantity") < max_quantity)
    )
    return li.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    fraction: float = 0.2,
    years: float = 7.0,
) -> DataFrame:
    """TPC-H Q17-style small-quantity revenue, per brand: lineitems
    whose quantity is below `fraction` of THAT PART's average quantity,
    summed to a yearly revenue figure.

    The textbook form is a correlated scalar subquery per part
    (`l_quantity < 0.2 * (SELECT avg(l_quantity) ... WHERE l_partkey =
    p_partkey)`); the decorrelated shape written here — ONE
    groupBy(partkey) average joined back to the detail scan — is what
    Catalyst's own subquery decorrelation produces, made explicit.
    Unlike high_balance_inactive_customers' GLOBAL scalar (broadcast
    one row), this is a PER-GROUP scalar: the aggregate output is
    partkey-partitioned, so the join back to lineitem reuses the same
    hash partitioning the aggregation just established (one shuffle of
    the detail side, no broadcast of a corpus-sized table).

    Exactness: the per-part mean is the DECIMAL-sum/count double (both
    engines agree bitwise), so the `fraction·avg` threshold compares
    identically; revenue is a DECIMAL sum divided once by `years`.
    """
    avg_q = lineitem.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg_qty")
    )
    small = (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(avg_q, "l_partkey")
        .where(F.col("l_quantity") < F.lit(fraction) * F.col("_avg_qty"))
        .join(
            part.select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    return (
        small.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lineitems"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.lit(years)
            ).alias("avg_yearly"),
        )
        .orderBy("p_brand")
    )


def max_revenue_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = "1997-01-01",
    end: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q15-style top supplier(s): revenue per supplier over one
    shipping quarter, returning every supplier achieving the maximum
    (the view + scalar-subquery-on-aggregate shape, ties included).

    Decorrelation: the revenue aggregate computes once; its global max
    is a one-row broadcast joined back by equality — the same
    aggregate-then-broadcast-scalar idiom as
    high_balance_inactive_customers, here applied to the aggregate's
    OWN output (self-referential scalar subquery).  Double equality is
    safe because both sides derive the value from the identical exact
    DECIMAL sum.  Supplier names attach AFTER the max filter, so the
    dimension join touches only the winning rows (broadcast)."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dec_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "total_revenue",
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_max_rev"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def large_volume_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18-style large-volume orders: orders whose total lineitem
    quantity exceeds `min_qty`, with customer attribution — the
    HAVING-on-aggregate + join-back-to-header shape (the textbook form
    is `o_orderkey IN (SELECT l_orderkey ... GROUP BY ... HAVING
    sum > T)`).

    The qualifying-key aggregate is orderkey-partitioned and shrinks to
    the HAVING survivors before any join; the orders join is a plain
    equi-join on that key (AQE picks broadcast when the survivor set is
    small — at 100 TB a >99.9th-percentile threshold keeps it tiny, but
    the plan stays correct if it is not); customer attaches by
    broadcast after the filter.  Deterministic top-k: (o_totalprice
    desc, o_orderkey)."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dec_sum(F.col("l_quantity"), "sum_qty"))
        .where(F.col("sum_qty") > F.lit(min_qty))
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(k)
    )


def min_cost_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    region_name: str = "EUROPE",
    p_type: str = "LARGE",
    materialize_offers: bool = False,
) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier: for every part of one type,
    the supplier(s) inside one region offering it at the LOWEST average
    sale price, ties included (the fixtures carry no partsupp table, so
    the part-supplier cost relation derives from lineitem — avg
    extendedprice per (part, supplier); the correlated-subquery shape is
    identical, /root/reference has no analogue: SURVEY.md §2.3 gap row).

    The textbook form correlates `ps_supplycost = (SELECT min(...) WHERE
    ps_partkey = p_partkey AND <region chain>)`; written decorrelated:
    the region-scoped offer table aggregates ONCE, its per-part min
    aggregates from that, and the min joins back by (partkey, price)
    equality — double equality is safe because both sides carry the
    identical exact DECIMAL-derived average.  The supplier→nation→region
    chain is a broadcast dimension filter applied BEFORE the offer
    aggregate, so off-region lineitems never reach the shuffle; the
    partkey-partitioned offer table is reused by both the min aggregate
    and the join-back (one shuffle, Catalyst reuses the exchange).

    Scale: offers is |parts×suppliers-in-region| — far smaller than
    lineitem; the join back to `part` prunes to the p_type slice by
    broadcast.  No window function, no cartesian."""
    dims = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
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
    )
    if materialize_offers:
        # r15 scale gate (SCALE.md r15 rows): both the per-part min
        # aggregate and the join-back re-execute the lineitem⋈dims
        # offer aggregate when lazy.  At sf0.1 idle-core parallelism
        # hides the duplication and a checkpoint LOSES (r14 paired
        # 1.269); at 10x it flips to a WIN (r15 paired 0.821) — so the
        # caller derives this flag from the measured input size.
        # Lifecycle (see materialize.py): construction-time job,
        # executor-only blocks.  Post-checkpoint both join sides share
        # one plan, so the join-back keys disambiguate by rename.
        offers = offers.localCheckpoint()
        min_price = (
            offers.groupBy("l_partkey")
            .agg(F.min("avg_price").alias("min_price"))
            .select(F.col("l_partkey").alias("_mp_part"), "min_price")
        )
        joined = offers.join(
            min_price,
            (offers.l_partkey == F.col("_mp_part"))
            & (offers.avg_price == F.col("min_price")),
        ).drop("_mp_part")
    else:
        min_price = offers.groupBy("l_partkey").agg(
            F.min("avg_price").alias("min_price")
        )
        joined = offers.join(
            min_price,
            (offers.l_partkey == min_price.l_partkey)
            & (offers.avg_price == min_price.min_price),
        ).drop(min_price.l_partkey)
    return (
        joined
        .join(
            F.broadcast(
                part.where(F.col("p_type") == p_type).select(
                    "p_partkey", "p_name"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_partkey", "p_name", "l_suppkey", "s_name", "n_name", "min_price"
        )
        .orderBy("p_partkey", "l_suppkey")
    )


def important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    fraction: float = 0.002,
) -> DataFrame:
    """TPC-H Q11-style important stock: parts whose sales value through
    one nation's suppliers exceeds `fraction` of that nation's TOTAL
    sales value — the HAVING-against-a-global-scalar-subquery shape
    (`HAVING sum(...) > (SELECT sum(...)*fraction ...)`).

    Decorrelation: the nation-scoped detail scan aggregates once per
    part; the global total is NOT a second scan — it re-aggregates the
    per-part output (exact: decimal sums re-summed as decimal), shrinks
    to one row, and broadcasts into the HAVING comparison.  The
    `fraction * total` product and the `>` compare are single IEEE
    double ops over bit-identical inputs, so the survivor set matches
    any engine's.

    Scale: one shuffle on partkey; the scalar side is O(1).  The nation
    filter broadcasts (25 suppliers-per-nation scale) and prunes before
    the shuffle."""
    nat_supp = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
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


def promo_revenue_ratio(
    lineitem: DataFrame,
    part: DataFrame,
    promo_type: str = "PROMO",
    start: str = "1998-01-01",
    end: str = "1998-02-01",
) -> DataFrame:
    """TPC-H Q14-style promotion-revenue share: over one shipping month,
    the percentage of revenue coming from parts of the promo type — the
    conditional-aggregate-ratio shape (two sums in ONE pass, no second
    scan, no join duplication).

    part attaches by broadcast AFTER the month filter pruned the fact
    scan (predicate reaches the parquet scan; only partkey+price+
    discount columns are read).  Both sums are exact DECIMAL; the
    100·promo/total division is one double op — identical everywhere.

    Scale: a single scan-filter-broadcast-join-scalar-agg — the
    map-side-combinable minimum for this query."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.col("p_type") == promo_type
    month = lineitem.where(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp_ntz"))
    ).join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return month.agg(
        dec_sum(F.when(promo, revenue).otherwise(F.lit(0.0)), "promo_revenue"),
        dec_sum(revenue, "total_revenue"),
    ).select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


def supplier_counts_excluded(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    brand_excl: str = "Brand#1",
    type_excl: str = "PROMO",
    sizes: tuple[int, ...] = (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49),
) -> DataFrame:
    """TPC-H Q16-style supplier counts: distinct suppliers able to ship
    each (brand, type, size) combination, excluding a blacklist of
    suppliers held in a subquery — the NOT-IN-subquery + COUNT DISTINCT
    shape (blacklist proxy: negative account balance; the fixtures carry
    no comment column).

    NOT IN decorrelates to a broadcast LEFT ANTI join (safe here: the
    blacklist key is a PK, never NULL — the NULL-poisoning semantics of
    SQL NOT IN don't bite; documented rather than silently assumed).
    The part-supplier relation derives from lineitem as DISTINCT
    (partkey, suppkey) — a partial-aggregatable dedup that shrinks the
    fact table to |parts×suppliers| BEFORE the dimension join; the
    count-distinct then re-shuffles only that reduced set on the part
    attribute triple.

    Scale: two shuffles (pair dedup, attribute-group distinct), both on
    shrinking data; part and the blacklist broadcast."""
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    dims = part.where(
        (F.col("p_brand") != brand_excl)
        & (F.col("p_type") != type_excl)
        & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(F.broadcast(dims), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7-style volume shipping: revenue flowing between two
    nations (supplier nation → customer nation, both directions), per
    shipping year — the DISJUNCTIVE nation-pair join shape
    (`(n1=A AND n2=B) OR (n1=B AND n2=A)`).

    The disjunction never becomes a join condition: each side's nation
    filter applies independently (supplier side IN (A,B), customer side
    IN (A,B)) as broadcast dimension joins, and the pair disjunction
    reduces to one residual `supp_nation != cust_nation` filter after
    both attach — Catalyst pushes the IN filters into the dimension
    scans, and the fact-to-fact orderkey join stays a plain equi-join
    (no OR in the join condition, no nested-loop fallback).

    Scale: one orderkey shuffle; both nation slices broadcast; output is
    |2 directions × years|."""
    both = [nation_a, nation_b]
    supp = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .where(F.col("n_name").isin(both))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .where(F.col("n_name").isin(both))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(dec_sum(revenue, "revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def nation_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    region_name: str = "ASIA",
    target_nation: str = "NATION_7",
    p_type: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8-style market share: of all revenue from one part type
    sold to customers in one region, the fraction supplied by one
    nation, per order year — the share-of-total conditional-aggregate
    shape (numerator and denominator in ONE pass: `sum(CASE WHEN
    supp_nation = X THEN rev END) / sum(rev)`).

    The region chain restricts the CUSTOMER side (broadcast semi
    shape); the supplier side attaches un-filtered, only to label rows
    with supp_nation for the CASE — no second scan, no self-join.  Both
    sums are exact DECIMAL per year; the share division is one double
    op.

    Scale: part-type broadcast prune hits the fact scan first (the most
    selective filter), then one orderkey shuffle; output is |years|."""
    cust_in_region = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == region_name)
        .select("c_custkey")
    )
    supp_nat = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.col("supp_nation") == target_nation
    return (
        lineitem.join(
            F.broadcast(
                part.where(F.col("p_type") == p_type).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            dec_sum(F.when(target, revenue).otherwise(F.lit(0.0)), "nation_revenue"),
            dec_sum(revenue, "total_revenue"),
        )
        .select(
            "order_year",
            "nation_revenue",
            "total_revenue",
            (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
        )
        .orderBy("order_year")
    )


def dominant_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """TPC-H Q20-style dominant suppliers: suppliers that account for
    more than `threshold` of the total shipped quantity of at least one
    part, with how many parts they dominate — the nested two-level
    aggregate + semi-join shape (`s_suppkey IN (SELECT ... WHERE qty >
    0.5 * (SELECT sum(qty) WHERE partkey = ...))`, availqty replaced by
    shipped quantity since the fixtures carry no partsupp).

    Decorrelation: per-(part, supplier) quantity aggregates once;
    per-part totals aggregate from the SAME decimal partials (re-summed
    as decimal — exact, so the threshold compare is engine-invariant);
    the partkey join-back reuses the partitioning the second aggregate
    established.  The final per-supplier count is a shuffle of the
    dominant pairs only, and supplier names attach by broadcast.

    Scale: shuffles on (part,supp) then part then supp — each over a
    table no larger than |part×supplier|; no window, no cartesian."""
    ps = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_dec_qty"))
    )
    totals = ps.groupBy("l_partkey").agg(
        F.sum("_dec_qty").cast("double").alias("_part_qty")
    )
    dominant = (
        ps.select(
            "l_partkey",
            "l_suppkey",
            F.col("_dec_qty").cast("double").alias("_supp_qty"),
        )
        .join(totals, "l_partkey")
        .where(F.col("_supp_qty") > F.lit(threshold) * F.col("_part_qty"))
    )
    return (
        dominant.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_dominant_parts"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "n_dominant_parts")
        .orderBy(F.desc("n_dominant_parts"), "s_suppkey")
    )


def late_order_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = "1998-01-01",
    end: str = "1998-04-01",
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q4-style order-priority check: orders placed in one quarter
    having AT LEAST ONE lineitem shipped more than `late_days` after the
    order date, counted per priority — the EXISTS-with-residual-
    inequality shape (commitdate/receiptdate absent in the fixtures;
    ship-lag vs order date carries the same correlated predicate).

    EXISTS decorrelates to a LEFT SEMI join on orderkey with the
    inequality as a residual join condition — exactly-once per order no
    matter how many lineitems qualify (no DISTINCT needed, no fanout).
    The quarter filter prunes the orders scan BEFORE the join, so the
    semi-join probe side is one quarter of orders, and the date
    arithmetic (`o_orderdate + late_days`) is a scan-stage expression.

    Scale: one orderkey shuffle (or broadcast of the quarter slice under
    AQE); counts combine map-side."""
    quarter = orders.where(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp_ntz"))
    )
    late = quarter.join(
        lineitem.select("l_orderkey", "l_shipdate"),
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


def nation_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part_substr: str = "rod",
    cost_rate: float = 0.10,
) -> DataFrame:
    """TPC-H Q9-style product-type profit per (nation, year).

    Reference parity: completes the TPC-H decorrelation family (SURVEY
    §2.3) — Q9 is the last join-tree shape the catalog lacked.  The
    fixtures carry no partsupp table, so the supply-cost term uses
    `p_retailprice * l_quantity * cost_rate` in place of
    `ps_supplycost * l_quantity`; the expression SHAPE (a price×quantity
    product subtracted inside the aggregate) and the join tree (fact ⋈
    filtered part ⋈ supplier ⋈ nation ⋈ orders) are Q9's.

    Physical plan: the substring-filtered part slice (a few % of an
    already-small dimension) broadcasts into lineitem FIRST, shrinking
    the fact stream before the one orderkey shuffle against orders;
    supplier⋈nation broadcast too.  Profit terms aggregate in DECIMAL
    (order-independent) and surface as DOUBLE — the dec_sum convention.
    """
    p = (
        part.where(F.col("p_name").contains(part_substr))
        .select("p_partkey", "p_retailprice")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(cost_rate)
    return (
        lineitem.join(F.broadcast(p), lineitem.l_partkey == p.p_partkey)
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("integer").alias("order_year"),
        )
        .agg(dec_sum(profit, "profit"))
        .orderBy("nation", F.desc("order_year"))
    )


def late_shipment_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    late_days: int = 60,
    year: int = 1997,
) -> DataFrame:
    """TPC-H Q12-style shipping-class priority counts.

    The fixtures carry no l_shipmode/l_commitdate/l_receiptdate, so the
    adapted form groups by `l_returnflag` (the available line class) and
    defines "late" as l_shipdate > o_orderdate + late_days within one
    order year — the same shape: fact⋈fact equi-join with a correlated
    date inequality as residual, then per-class CONDITIONAL counts
    splitting the order-priority domain into critical (1-URGENT/2-HIGH)
    vs non-critical.

    Physical plan: the year filter prunes the orders scan before the
    join; one orderkey shuffle; both conditional counts come from the
    same pass (map-side combine) — no second scan, no pivot shuffle.
    """
    o = orders.where(F.year("o_orderdate") == year).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = lineitem.select("l_orderkey", "l_returnflag", "l_shipdate").join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
        ),
    )
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy("l_returnflag")
        .agg(
            F.count(F.when(critical, 1)).alias("critical_count"),
            F.count(F.when(~critical, 1)).alias("normal_count"),
        )
        .orderBy("l_returnflag")
    )
