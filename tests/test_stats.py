"""Unit tests for top-k/stats operators — especially deterministic
tie-breaking (SURVEY.md §2.6 ⚠: pandas nlargest breaks ties by first-seen
order, which has no stable Spark equivalent)."""

from __future__ import annotations

import pytest

from database_per_keyword_analysis_spark.operators import stats as S


@pytest.fixture(scope="module")
def posts(spark):
    rows = [
        (1, "chanA", 100),
        (2, "chanA", 100),  # tie on views -> lower id wins
        (3, "chanB", 300),
        (4, "chanB", 50),
        (5, "chanC", 200),
        (6, "chanC", 200),
        (7, "chanC", 10),
    ]
    return spark.createDataFrame(rows, "post_id long, channel string, views long")


def test_top_k_by_tiebreak(posts):
    out = S.top_k_by(posts, "views", 3, "post_id").collect()
    assert [r.post_id for r in out] == [3, 5, 6]


def test_top_channels_by_views(posts):
    out = S.top_channels_by_views(posts, "channel", "views", 2).collect()
    assert [(r.channel, r.total_views) for r in out] == [("chanC", 410), ("chanB", 350)]


def test_top_channels_by_count(posts):
    out = S.top_channels_by_count(posts, "channel", 1).collect()
    assert (out[0].channel, out[0].post_count) == ("chanC", 3)


def test_top_channels_tie_by_name(spark):
    df = spark.createDataFrame(
        [(1, "b", 10), (2, "a", 10)], "post_id long, channel string, views long"
    )
    out = S.top_channels_by_views(df, "channel", "views", 1).collect()
    assert out[0].channel == "a"  # equal totals -> name asc


def test_top_k_per_group(posts):
    out = S.top_k_per_group(posts, "channel", "views", 1, "post_id").collect()
    got = {(r.channel, r.post_id) for r in out}
    assert got == {("chanA", 1), ("chanB", 3), ("chanC", 5)}


def test_channel_audit(posts):
    out = S.channel_audit(
        posts, "channel", "views", "post_id", top_channels=2, posts_per_channel=2
    ).collect()
    got = {(r.channel, r.post_id, r.rn) for r in out}
    assert got == {
        ("chanC", 5, 1),
        ("chanC", 6, 2),
        ("chanB", 3, 1),
        ("chanB", 4, 2),
    }


def test_stats_report_composite(spark):
    from database_per_keyword_analysis_spark.config import KeywordConfig
    from database_per_keyword_analysis_spark.operators.stats import stats_report

    cfg = KeywordConfig(
        industry_keywords={"Steel": ["steel"], "Water": ["water"]},
        channel_blacklist=["spam"],
    )
    df = spark.createDataFrame(
        [
            (1, "a", 10, "steel up"),
            (2, "b", 30, "steel water"),
            (3, "spam", 99, "steel spam"),
            (4, "b", 5, "water only"),
        ],
        ["post_id", "channel_username", "views", "text"],
    )
    rep = stats_report(df, cfg)
    assert set(rep) == {"Steel", "Water"}
    assert rep["Steel"]["count"] == 2
    assert rep["Water"]["count"] == 2
    top = rep["Steel"]["top_posts"].collect()
    assert [r.post_id for r in top] == [2, 1]  # by views desc
    ch = rep["Water"]["top_channels"].collect()
    assert [(r.channel, r.total_views) for r in ch] == [("b", 35)]
