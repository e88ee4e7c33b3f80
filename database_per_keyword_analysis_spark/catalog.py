"""Query catalog: the driver-facing registry behind ``__spark_entry__.py``.

Each entry pairs a Spark query (SparkSession, sf_dir) -> DataFrame with an
equivalent DuckDB oracle SQL string over the same parquet fixtures
(BASELINE.md: row-count + schema + order-insensitive value-hash at
sf0.01).  Conventions that keep the two sides hash-identical
(SURVEY.md §5.2, §7.4):

  * every computed column is aliased identically on both sides;
  * every top-k carries a deterministic tie-breaker;
  * money-like double sums go through DECIMAL so the result is exact and
    independent of summation order (fp addition is not associative —
    a parallel Spark sum and a sequential DuckDB sum would differ in the
    low bits otherwise);
  * DuckDB integer sums are cast to BIGINT (DuckDB widens to HUGEINT);
  * timestamps are naive/UTC on both sides.

Oracle SQL is *generated* from the same ``KeywordConfig`` the Spark side
uses, so a config change cannot desynchronize them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .config import FIXTURE_CONFIG, KeywordConfig
from .operators import keywords as K
from .operators import stats as S
from .sources import load

SparkQuery = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# ---------------------------------------------------------------------------
# Oracle SQL builders over the keyword config (ANSI/DuckDB dialect).
# ---------------------------------------------------------------------------

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _contains_any(col: str, terms: list[str]) -> str:
    return "(" + " OR ".join(f"contains({col}, {_sql_quote(t)})" for t in terms) + ")"


def _cleaned_cte(cfg: KeywordConfig, channel_col: str = "source") -> str:
    """WHERE-parity with operators.keywords.clean + text IS NOT NULL."""
    noise = (
        f"AND NOT {_contains_any('text', cfg.noise_terms)}" if cfg.noise_terms else ""
    )
    bl = ", ".join(_sql_quote(c.lower()) for c in cfg.channel_blacklist)
    bl_pred = f"AND lower({channel_col}) NOT IN ({bl})" if bl else ""
    return (
        "cleaned AS (SELECT * FROM documents WHERE text IS NOT NULL "
        f"{noise} {bl_pred})"
    )


def _industry_counts_sql(cfg: KeywordConfig) -> str:
    branches = " UNION ALL ".join(
        f"SELECT {_sql_quote(i)} AS industry, "
        f"count(*) FILTER (WHERE {_contains_any('text', kws)}) AS post_count FROM cleaned"
        for i, kws in cfg.industry_keywords.items()
    )
    return (
        f"WITH {_cleaned_cte(cfg)} "
        f"SELECT industry, post_count FROM ({branches}) ORDER BY industry"
    )


def _keyword_breakdown_sql(cfg: KeywordConfig) -> str:
    branches = " UNION ALL ".join(
        f"SELECT {_sql_quote(i)} AS industry, {_sql_quote(kw)} AS keyword, "
        f"count(*) FILTER (WHERE contains(text, {_sql_quote(kw)})) AS cnt FROM cleaned"
        for i, kws in cfg.industry_keywords.items()
        for kw in kws
    )
    return (
        f"WITH {_cleaned_cte(cfg)} "
        f"SELECT industry, keyword, cnt FROM ({branches}) WHERE cnt > 0 "
        "ORDER BY industry, cnt DESC, keyword"
    )


CFG = FIXTURE_CONFIG


# ---------------------------------------------------------------------------
# Keyword-analytics queries (reference core pipeline over `documents`,
# which stands in for telegram_posts: source≈channel, n_chars≈views).
# ---------------------------------------------------------------------------

@register("industry_counts", _industry_counts_sql(CFG))
def q_industry_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: cleaned posts per industry (main.py:426; chart 1 data)."""
    docs = load(spark, sf_dir, "documents")
    return K.industry_counts(docs, CFG, text_col="text", channel_col="source")


@register("keyword_breakdown", _keyword_breakdown_sql(CFG))
def q_keyword_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-keyword hit counts (A4; main.py:369-381)."""
    docs = load(spark, sf_dir, "documents")
    return K.keyword_breakdown(docs, CFG, text_col="text", channel_col="source")


_STREAMING_PRED = _contains_any("text", CFG.industry_keywords["Streaming"])


@register(
    "top_channels_by_views",
    f"WITH {_cleaned_cte(CFG)} "
    f"SELECT source AS channel, CAST(sum(n_chars) AS BIGINT) AS total_views "
    f"FROM cleaned WHERE {_STREAMING_PRED} "
    "GROUP BY source ORDER BY total_views DESC, channel LIMIT 15",
)
def q_top_channels_by_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 channels by Σ views within one industry slice (A1+T2;
    main.py:428), views ≈ n_chars per FIXTURES.md §5."""
    docs = load(spark, sf_dir, "documents")
    flagged = K.categorize(
        K.clean(K.coarse_keyword_filter(docs, CFG), CFG, channel_col="source"), CFG
    )
    sliced = flagged.where(K.flag_col("Streaming"))
    return S.top_channels_by_views(sliced, "source", "n_chars", 15)


@register(
    "top_posts",
    f"WITH {_cleaned_cte(CFG)} "
    "SELECT doc_id, source AS channel, n_chars AS views, "
    "replace(substr(text, 1, 100), chr(10), ' ') || '...' AS snippet "
    f"FROM cleaned WHERE {_STREAMING_PRED} "
    "ORDER BY views DESC, doc_id LIMIT 20",
)
def q_top_posts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 posts by views in an industry slice with snippet (T1 + C5;
    main.py:427, 918)."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    flagged = K.categorize(
        K.clean(K.coarse_keyword_filter(docs, CFG), CFG, channel_col="source"), CFG
    )
    sliced = flagged.where(K.flag_col("Streaming")).select(
        "doc_id",
        F.col("source").alias("channel"),
        F.col("n_chars").alias("views"),
        F.concat(
            F.expr(r"replace(substr(text, 1, 100), '\n', ' ')"), F.lit("...")
        ).alias("snippet"),
    )
    return S.top_k_by(sliced, "views", 20, "doc_id")


@register(
    "channel_audit",
    f"WITH {_cleaned_cte(CFG)}, "
    "top AS (SELECT source FROM cleaned GROUP BY source "
    "        ORDER BY CAST(sum(n_chars) AS BIGINT) DESC, source LIMIT 5), "
    "ranked AS (SELECT c.source AS channel, c.doc_id, c.n_chars AS views, "
    "           row_number() OVER (PARTITION BY c.source "
    "                              ORDER BY c.n_chars DESC, c.doc_id) AS rn "
    "           FROM cleaned c JOIN top t ON c.source = t.source) "
    "SELECT channel, doc_id, views, rn FROM ranked WHERE rn <= 3 "
    "ORDER BY channel, rn",
)
def q_channel_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channel audit: top-3 posts of each top-5 channel (main.py:894-923)."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    cleaned = K.clean(
        docs.where(F.col("text").isNotNull()), CFG, channel_col="source"
    )
    audited = S.channel_audit(
        cleaned, "source", "n_chars", "doc_id", top_channels=5, posts_per_channel=3
    )
    return audited.select(
        F.col("source").alias("channel"),
        "doc_id",
        F.col("n_chars").alias("views"),
        "rn",
    ).orderBy("channel", "rn")
