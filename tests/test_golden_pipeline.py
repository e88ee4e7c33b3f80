"""Golden end-to-end test (SURVEY.md §5.2.3): a fixed synthetic posts
fixture through the full keyword pipeline — counts, breakdown, top
channels, word frequency — against hand-computed expected outputs.

The fixture exercises every filter the reference applies: NULL text,
multi-label posts, blacklisted channel (case-insensitively), noise-term
disqualification, and keyword-free rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_per_keyword_analysis_spark.config import KeywordConfig
from database_per_keyword_analysis_spark.operators import keywords as K
from database_per_keyword_analysis_spark.operators import stats as S
from database_per_keyword_analysis_spark.operators import wordfreq as WF

CFG = KeywordConfig(
    industry_keywords={
        "Steel": ["steel", "iron ore"],
        "Water": ["water", "pipeline"],
    },
    noise_terms=["football"],
    channel_blacklist=["SpamChan"],
    stopwords=["the", "a"],
)

ROWS = [
    # (post_id, channel, views, text)
    (1, "alpha", 100, "the steel market is hot"),          # Steel
    (2, "alpha", 50, "water pipeline project announced"),  # Water (2 kws)
    (3, "beta", 300, "steel and water prices"),            # BOTH (multi-label)
    (4, "spamchan", 900, "steel spam offer"),              # blacklisted channel
    (5, "beta", 70, "football steel derby"),               # noise-disqualified
    (6, "gamma", 10, None),                                # NULL text
    (7, "gamma", 40, "nothing relevant here"),             # no keyword
    (8, "beta", 20, "iron ore shipment arrives"),          # Steel via kw 2
]


@pytest.fixture(scope="module")
def posts(spark):
    return spark.createDataFrame(
        ROWS, ["post_id", "channel_username", "views", "text"]
    )


def _pipeline(posts):
    return K.categorize(
        K.clean(
            K.coarse_keyword_filter(posts, CFG),
            CFG,
            channel_col="channel_username",
        ),
        CFG,
    )


def test_golden_industry_counts(posts):
    got = {
        r.industry: r.post_count
        for r in K.industry_counts(
            posts, CFG, channel_col="channel_username"
        ).collect()
    }
    # survivors: 1,2,3,8 (4 blacklisted, 5 noise, 6 null, 7 no kw)
    assert got == {"Steel": 3, "Water": 2}


def test_golden_keyword_breakdown(posts):
    got = {
        (r.industry, r.keyword): r.cnt
        for r in K.keyword_breakdown(
            posts, CFG, channel_col="channel_username"
        ).collect()
    }
    assert got == {
        ("Steel", "steel"): 2,       # posts 1, 3
        ("Steel", "iron ore"): 1,    # post 8
        ("Water", "water"): 2,       # posts 2, 3
        ("Water", "pipeline"): 1,    # post 2
    }


def test_golden_top_channels(posts):
    flagged = _pipeline(posts)
    steel = flagged.where(F.col(K.flag_col("Steel")))
    got = [
        (r.channel, r.total_views)
        for r in S.top_channels_by_views(
            steel, "channel_username", "views", 10
        ).collect()
    ]
    # beta: 300+20=320 (posts 3, 8); alpha: 100 (post 1)
    assert got == [("beta", 320), ("alpha", 100)]


def test_golden_word_frequency(posts):
    cleaned = K.clean(
        posts.where(F.col("text").isNotNull()), CFG, channel_col="channel_username"
    )
    got = {
        (r.word, r.cnt)
        for r in WF.word_frequency(
            cleaned, [], "text", stopwords=CFG.stopwords, top_n=3
        ).collect()
    }
    # top words over surviving texts 1,2,3,7,8 minus stopwords; "steel"
    # and "water" appear twice; tie at 2 broken alphabetically for rank,
    # third rank is some 1-count word — assert the two definite leaders
    leaders = {w for w, c in got if c == 2}
    assert leaders == {"steel", "water"}


def test_golden_multilabel_and_global(posts):
    flagged = _pipeline(posts)
    both = flagged.where(
        F.col(K.flag_col("Steel")) & F.col(K.flag_col("Water"))
    ).select("post_id").collect()
    assert [r.post_id for r in both] == [3]
    n_global = flagged.where(K.any_industry(flagged, CFG)).count()
    assert n_global == 4
