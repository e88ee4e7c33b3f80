"""Keyword classification operators — the reference's core pipeline.

Reference behavior (all pandas, /root/reference/main.py):
  * coarse relevance filter: ONE alternation regex over all keywords of all
    industries keeps any row matching any keyword (main.py:231-237, 283-288);
  * per-industry multi-label flags `is_<Industry>` via per-industry
    alternation regex (main.py:309-329);
  * channel blacklist anti-filter, case-insensitive NOT IN (main.py:350-352);
  * context-noise anti-filter, substring alternation (main.py:207-208, 354-358);
  * per-keyword hit counts on the cleaned industry slice (main.py:369-381).

Spark realization: everything is built-in column expressions (`rlike`,
`contains`, `lower`, boolean algebra) so the whole pipeline is one lazy
Catalyst plan — filters and projections push into the parquet scan, flags
are evaluated in a single whole-stage-codegen pass, and the per-keyword
breakdown is ONE aggregation with map-side partial combine (no shuffle of
raw text) followed by a `stack` unpivot.

Scale notes (100 TB): a single regex pass over `text` is O(rows); there is
no join and no shuffle until the final tiny aggregation.  The keyword dim
is Python-side constant-folded into the plan (equivalent to broadcasting a
5×~20-row dim; SURVEY.md §2.3 J1).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import KeywordConfig


def flag_col(industry: str) -> str:
    """Name of the derived multi-label flag (reference: `is_<Industry>`)."""
    return f"is_{industry}"


def coarse_keyword_filter(
    df: DataFrame, cfg: KeywordConfig, text_col: str = "text"
) -> DataFrame:
    """First-pass relevance filter (F4): keep rows whose text contains ANY
    configured keyword.  NULL text never matches (`na=False` parity)."""
    return df.where(F.col(text_col).isNotNull() & F.col(text_col).rlike(cfg.full_pattern))


def categorize(df: DataFrame, cfg: KeywordConfig, text_col: str = "text") -> DataFrame:
    """Add one boolean `is_<industry>` column per industry (F5, multi-label).

    All flags evaluate in the same codegen stage — one pass over text.
    """
    flags = [
        F.coalesce(F.col(text_col).rlike(cfg.industry_pattern(i)), F.lit(False)).alias(
            flag_col(i)
        )
        for i in cfg.industries
    ]
    return df.select("*", *flags)


def apply_channel_blacklist(
    df: DataFrame, cfg: KeywordConfig, channel_col: str
) -> DataFrame:
    """Case-insensitive NOT IN over the channel blacklist (F6/J3).

    A literal `isin` beats an anti-join for a config-sized list; at scale a
    huge blacklist would become `broadcast` + `left_anti`.
    """
    if not cfg.channel_blacklist:
        return df
    lowered = [c.lower() for c in cfg.channel_blacklist]
    return df.where(~F.lower(F.col(channel_col)).isin(lowered))


def apply_noise_filter(df: DataFrame, cfg: KeywordConfig, text_col: str = "text") -> DataFrame:
    """Context-noise anti-filter (F7): drop rows containing any noise term."""
    if not cfg.noise_terms:
        return df
    return df.where(~F.coalesce(F.col(text_col).rlike(cfg.noise_pattern), F.lit(False)))


def clean(
    df: DataFrame, cfg: KeywordConfig, text_col: str = "text", channel_col: str | None = None
) -> DataFrame:
    """Blacklist + noise anti-filters, the reference's standard cleanup pair
    applied before every report (main.py:347-358 et al.)."""
    out = apply_noise_filter(df, cfg, text_col)
    if channel_col is not None:
        out = apply_channel_blacklist(out, cfg, channel_col)
    return out


def industry_counts(
    df: DataFrame, cfg: KeywordConfig, text_col: str = "text", channel_col: str | None = None
) -> DataFrame:
    """Posts per industry after cleaning — `stats_report[i]['count']`
    (main.py:426) for all industries in ONE aggregation pass.

    Returns (industry STRING, post_count BIGINT), ordered by industry.
    """
    flagged = categorize(
        clean(coarse_keyword_filter(df, cfg, text_col), cfg, text_col, channel_col),
        cfg,
        text_col,
    )
    aggs = [
        F.sum(F.col(flag_col(i)).cast("long")).alias(i) for i in cfg.industries
    ]
    wide = flagged.agg(*aggs)
    stack_expr = ", ".join(f"'{i}', `{i}`" for i in cfg.industries)
    return (
        wide.selectExpr(
            f"stack({len(cfg.industries)}, {stack_expr}) AS (industry, post_count)"
        )
        .select("industry", F.coalesce("post_count", F.lit(0)).alias("post_count"))
        .orderBy("industry")
    )


def any_industry(df: DataFrame, cfg: KeywordConfig) -> Column:
    """Row-wise disjunction over the flag columns (F9) — the reference's
    "Global" group membership (main.py:547-550)."""
    return reduce(lambda a, b: a | b, [F.col(flag_col(i)) for i in cfg.industries])


def keyword_breakdown(
    df: DataFrame, cfg: KeywordConfig, text_col: str = "text", channel_col: str | None = None
) -> DataFrame:
    """Per-keyword hit counts per industry on the cleaned slice (A4,
    main.py:369-381), zero-count keywords dropped, sorted desc (ties broken
    by keyword for determinism — SURVEY.md §7.4).

    Formulation: one aggregation with a `sum(contains(...))` column per
    (industry, keyword) — a single scan, map-side partials, then a tiny
    unpivot.  The explode+join alternative shuffles every (row × keyword)
    pair; this shuffles ~80 longs.
    """
    flagged = categorize(
        clean(coarse_keyword_filter(df, cfg, text_col), cfg, text_col, channel_col),
        cfg,
        text_col,
    )
    aggs = []
    pairs = []
    for idx, (industry, kws) in enumerate(cfg.industry_keywords.items()):
        for jdx, kw in enumerate(kws):
            alias = f"c_{idx}_{jdx}"
            aggs.append(
                F.sum(
                    (F.col(flag_col(industry)) & F.col(text_col).contains(kw)).cast("long")
                ).alias(alias)
            )
            pairs.append((industry, kw, alias))
    wide = flagged.agg(*aggs)
    stack_expr = ", ".join(
        f"'{i}', '{k}', `{a}`" for i, k, a in pairs
    ).replace("''", "''")
    long = wide.selectExpr(
        f"stack({len(pairs)}, {stack_expr}) AS (industry, keyword, cnt)"
    )
    return (
        long.where(F.col("cnt") > 0)
        .orderBy(F.col("industry"), F.desc("cnt"), F.col("keyword"))
    )


def keyword_dim(spark, cfg: KeywordConfig) -> DataFrame:
    """The keyword dimension as a (industry, keyword) DataFrame — the
    reference's INDUSTRY_KEYWORDS dict (main.py:45-74) as data."""
    rows = [(i, k) for i, kws in cfg.industry_keywords.items() for k in kws]
    return spark.createDataFrame(rows, ["industry", "keyword"])


def keyword_breakdown_join(
    df: DataFrame,
    cfg: KeywordConfig,
    text_col: str = "text",
    channel_col: str | None = None,
) -> DataFrame:
    """A4 in its J1 theta-join formulation: posts ⋈ keywords on
    `contains(text, keyword)` as a broadcast nested-loop join
    (main.py:231-237/371-378 is logically `CROSS JOIN ... WHERE instr>0`).

    Same result as `keyword_breakdown`; that one-pass agg is the faster
    plan (shuffles ~80 longs vs row×keyword pairs), but the join form is
    the one that generalizes to a keyword dim too large to inline in an
    expression tree — broadcast stays O(|keywords|) per executor.
    """
    cleaned = clean(coarse_keyword_filter(df, cfg, text_col), cfg, text_col, channel_col)
    kw = keyword_dim(df.sparkSession, cfg)
    return (
        cleaned.select(text_col)
        .crossJoin(F.broadcast(kw))
        .where(F.col(text_col).contains(F.col("keyword")))
        .groupBy("industry", "keyword")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("industry"), F.desc("cnt"), F.col("keyword"))
    )


def debug_keyword_posts(
    df: DataFrame,
    cfg: KeywordConfig,
    industry: str,
    keyword: str,
    text_col: str = "text",
    channel_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """The reference's only parameterized query API (entry point 3,
    main.py:956-990): posts of one industry containing one keyword,
    after blacklist+noise filters, projected for manual audit.

    Predicate composition: is_<industry> ∧ contains(text, keyword) ∧
    ¬blacklisted ∧ ¬noise — all pushed into one scan.
    """
    flagged = categorize(clean(df, cfg, text_col, channel_col), cfg, text_col)
    from ..functions.text import snippet

    return (
        flagged.where(F.col(flag_col(industry)) & F.col(text_col).contains(keyword))
        .select(
            F.col(id_col),
            F.col(channel_col).alias("channel"),
            snippet(text_col).alias("snippet"),
        )
        .orderBy(id_col)
    )
