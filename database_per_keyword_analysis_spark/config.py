"""Domain configuration as *data*, not code (SURVEY.md §7.1).

The reference hard-codes 5 industries × 12-20 Persian keywords
(/root/reference/main.py:45-74), sports/ads noise terms
(main.py:185-199), a channel blacklist (main.py:202-205) and a stopword
set (main.py:140-181) as Python literals inside the analyzer class.  We
keep the same *shape* but make it a value the operators take as an
argument, so the engine is reusable over any corpus.

`FIXTURE_CONFIG` instantiates that shape over the driver fixtures'
English vocabulary (documents.text; FIXTURES.md §5: `documents` stands in
for `telegram_posts`, `source` ≈ channel) so every operator is
oracle-checkable in ASCII-safe DuckDB SQL.  The Persian-specific behavior
(ZWNJ, char unification) lives in functions/text.py with unit tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class KeywordConfig:
    """Everything the keyword-analytics pipeline needs, as plain data."""

    # {industry: [keyword phrase, ...]} — substring containment semantics
    # (reference uses plain str.contains, not word boundaries; main.py:287).
    industry_keywords: dict[str, list[str]]
    # noise terms (sports/ads context filter, main.py:185-199): any match
    # disqualifies the row.
    noise_terms: list[str] = field(default_factory=list)
    # channels compared case-insensitively (main.py:351).
    channel_blacklist: list[str] = field(default_factory=list)
    # stopwords for the word-frequency pipeline (main.py:140-181).
    stopwords: list[str] = field(default_factory=list)

    @property
    def industries(self) -> list[str]:
        return list(self.industry_keywords)

    @property
    def all_keywords(self) -> list[str]:
        return [k for kws in self.industry_keywords.values() for k in kws]

    def industry_pattern(self, industry: str) -> str:
        """Escaped alternation regex for one industry (main.py:231-237)."""
        return "|".join(re.escape(k) for k in self.industry_keywords[industry])

    @property
    def full_pattern(self) -> str:
        """Escaped alternation over ALL keywords — the coarse first-pass
        filter that "drastically reduces rows" (main.py:283-288)."""
        return "|".join(re.escape(k) for k in self.all_keywords)

    @property
    def noise_pattern(self) -> str:
        """Noise alternation.  Unlike the reference (main.py:207-208 leaves
        terms unescaped) we escape — nil behavioral difference for literal
        terms, but safe for arbitrary config (SURVEY.md §7.4)."""
        return "|".join(re.escape(t) for t in self.noise_terms)


# Keyword config over the fixture vocabulary (documents.text is drawn from
# a ~30-word English vocabulary).  Multi-word phrases included to exercise
# phrase containment; one keyword shared across industries would be legal
# (multi-label) but is avoided here for clearer per-industry counts.
FIXTURE_CONFIG = KeywordConfig(
    industry_keywords={
        "Query_Engine": ["query", "filter", "hash join", "scan"],
        "Storage": ["table", "column", "row"],
        "Streaming": ["stream", "window", "batch"],
        "Performance": ["fast", "vector", "slow query"],
        "Data_Ops": ["group", "agg", "sort merge"],
    },
    noise_terms=["big data slow", "click join"],
    channel_blacklist=["src13", "SRC7"],
    stopwords=["the", "a", "an", "of", "and", "to", "in"],
)
