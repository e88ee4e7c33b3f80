"""Demo chart layer: renders the reference's six chart families from
their already-oracle-checked feeding queries.

Reference: `plot_visualizations` (/root/reference/main.py:570-891) — six
matplotlib/seaborn PNG families at 300 dpi.  SURVEY.md §2.1 scopes chart
rendering out of the ENGINE; this script is presentation-only plumbing
kept outside the engine package, mapping each family to its feeding
query (COVERAGE.md S6 row):

    1_industry_counts.png      <- industry_counts        (vertical bars)
    2_keywords_<industry>.png  <- keyword_breakdown      (horizontal bars)
    3_top_channels.png         <- top_channels_by_views  (horizontal bars)
    4_wordfreq_<lang>.png      <- word_frequency_by_lang (horizontal bars)
    5_time_trend.png           <- events_weekly_counts   (line)
    6_active_channels.png      <- channel_audit          (horizontal bars)

Rendering uses matplotlib when importable; this container has none, so
`tools/miniplot.py` (pure stdlib+numpy rasterizer) is the default
backend.  Either way the PNGs are real files with real data.

Usage:  python charts.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

try:
    import matplotlib  # noqa: F401

    matplotlib.use("Agg")
    HAVE_MPL = True
except ImportError:
    HAVE_MPL = False

from tools import miniplot as MP

try:
    import arabic_reshaper
    from bidi.algorithm import get_display

    HAS_RESHAPER = True
except ImportError:
    HAS_RESHAPER = False


def make_rtl_readable(text, _reshape=None, _display=None):
    """RTL label shim — port of the reference's reshape-if-available
    pattern (`make_farsi_text_readable`, /root/reference/main.py:76-84):
    matplotlib draws Arabic-script text with isolated glyph forms in
    logical order, so Persian labels need arabic-reshaper (contextual
    forms) + python-bidi (visual order) when those libs exist, and must
    pass through UNCHANGED when they don't.  `_reshape`/`_display` are
    test seams (the injected-backend idiom of functions/nlp_tier_b)."""
    reshape = _reshape if _reshape is not None else (
        arabic_reshaper.reshape if HAS_RESHAPER else None
    )
    display = _display if _display is not None else (
        get_display if HAS_RESHAPER else None
    )
    if reshape is None or display is None:
        return text
    return display(reshape(text))


def _rtl_labels(labels):
    return [make_rtl_readable(str(x)) for x in labels]


def _mpl_barh(path, labels, values, title):
    import matplotlib.pyplot as plt

    fig_h = max(9, len(labels) * 0.6)
    plt.figure(figsize=(16, fig_h))
    plt.barh(labels[::-1], values[::-1])
    plt.title(title)
    plt.tight_layout()
    plt.savefig(path, dpi=300, bbox_inches="tight", pad_inches=0.75)
    plt.close()


def _mpl_barv(path, labels, values, title):
    import matplotlib.pyplot as plt

    plt.figure(figsize=(16, 9))
    plt.bar(labels, values)
    plt.title(title)
    plt.tight_layout()
    plt.savefig(path, dpi=300, bbox_inches="tight", pad_inches=0.75)
    plt.close()


def _mpl_lines(path, series, title):
    import matplotlib.pyplot as plt

    plt.figure(figsize=(16, 9))
    for name, pts in sorted(series.items()):
        pts = sorted(pts)
        plt.plot([p[0] for p in pts], [p[1] for p in pts], marker="o", label=name)
    plt.legend()
    plt.title(title)
    plt.tight_layout()
    plt.savefig(path, dpi=300, bbox_inches="tight", pad_inches=0.75)
    plt.close()


def barh(path, labels, values, title):
    (_mpl_barh if HAVE_MPL else MP.barh)(
        path, _rtl_labels(labels), values, make_rtl_readable(title)
    )


def barv(path, labels, values, title):
    (_mpl_barv if HAVE_MPL else MP.barv)(
        path, _rtl_labels(labels), values, make_rtl_readable(title)
    )


def lines(path, series, title):
    series = {make_rtl_readable(str(k)): v for k, v in series.items()}
    (_mpl_lines if HAVE_MPL else MP.lines)(path, series, make_rtl_readable(title))


def _mpl_wordcloud(path, freqs, title):
    # matplotlib text-scatter; the wordcloud package (used by the
    # reference, main.py:773-778) is not assumed importable either way.
    # Top 100 words (reference WordCloud max_words=100, main.py:774 —
    # same cap as tools/miniplot.py so both backends render the same
    # content), placed greedily on an archimedean spiral at the first
    # collision-free spot (the same strategy as miniplot's backend,
    # with text extents estimated from fontsize).
    import math

    import matplotlib.pyplot as plt

    plt.figure(figsize=(16, 9))
    ax = plt.gca()
    ax.axis("off")
    items = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    cmax = items[0][1] if items else 1
    placed: list[tuple[float, float, float, float]] = []

    def collides(x0, y0, x1, y1):
        if x0 < 0.01 or y0 < 0.01 or x1 > 0.99 or y1 > 0.99:
            return True
        return any(
            x0 < px1 and x1 > px0 and y0 < py1 and y1 > py0
            for px0, py0, px1, py1 in placed
        )

    for i, (word, cnt) in enumerate(items):
        fs = 8 + 28 * (cnt / (cmax or 1)) ** 0.5
        # figure is 16x9 in = 1152x648 pt; glyph ~0.55*fs pt wide
        w = 0.55 * fs * max(len(word), 1) / 1152
        h = 1.3 * fs / 648
        spot = None
        for step in range(2400):
            ang = 2.399963 * (i + step * 0.05)
            r = 0.0008 * step
            cx = 0.5 + r * math.cos(ang)
            cy = 0.5 + r * math.sin(ang) * 0.6
            x0, y0 = cx - w / 2, cy - h / 2
            if not collides(x0, y0, x0 + w, y0 + h):
                spot = (cx, cy)
                break
        if spot is None:
            continue  # canvas full; drop the rarest words
        cx, cy = spot
        placed.append((cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2))
        ax.text(
            cx,
            cy,
            word,
            ha="center",
            va="center",
            fontsize=fs,
            transform=ax.transAxes,
        )
    plt.title(title)
    plt.savefig(path, dpi=300, bbox_inches="tight", pad_inches=0.75)
    plt.close()


def wordcloud(path, freqs, title):
    freqs = {make_rtl_readable(str(k)): v for k, v in freqs.items()}
    (_mpl_wordcloud if HAVE_MPL else MP.wordcloud)(
        path, freqs, make_rtl_readable(title)
    )


def render_all(spark, sf_dir: str, out_dir: str) -> list[str]:
    """Run the six feeding queries and write the six chart families.
    Returns the list of written PNG paths."""
    from database_per_keyword_analysis_spark import catalog

    qs = catalog.queries()
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []

    def out(name: str) -> str:
        p = os.path.join(out_dir, name)
        written.append(p)
        return p

    # 1: total posts per industry (main.py:656-682)
    rows = qs["industry_counts"](spark, sf_dir).collect()
    rows.sort(key=lambda r: -r.post_count)
    barv(
        out("1_industry_counts.png"),
        [r.industry for r in rows],
        [r.post_count for r in rows],
        "Posts by industry",
    )

    # 2: top keywords per industry (main.py:684-711)
    rows = qs["keyword_breakdown"](spark, sf_dir).collect()
    by_ind: dict[str, list] = {}
    for r in rows:
        by_ind.setdefault(r.industry, []).append(r)
    for ind, rs in sorted(by_ind.items()):
        rs = sorted(rs, key=lambda r: -r.cnt)[:15]
        barh(
            out(f"2_keywords_{ind}.png"),
            [r.keyword for r in rs],
            [r.cnt for r in rs],
            f"Top keywords: {ind}",
        )

    # 3: top channels by views (main.py:713-735)
    rows = qs["top_channels_by_views"](spark, sf_dir).collect()
    barh(
        out("3_top_channels.png"),
        [r.channel for r in rows],
        [r.total_views for r in rows],
        "Top channels by views",
    )

    # 4: word frequency per group, both reference variants
    # (main.py:737-791): 4A bar chart + 4B word cloud per group
    rows = qs["word_frequency_by_lang"](spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in sorted(by_lang.items()):
        rs = sorted(rs, key=lambda r: r.rn)
        top = rs[:20]
        barh(
            out(f"4_wordfreq_{lang}.png"),
            [r.word for r in top],
            [r.cnt for r in top],
            f"Top words: {lang}",
        )
        wordcloud(
            out(f"4_wordcloud_{lang}.png"),
            {r.word: r.cnt for r in rs},
            f"Word cloud: {lang}",
        )

    # 5: weekly time trend (main.py:793-839)
    rows = qs["events_weekly_counts"](spark, sf_dir).collect()
    series = {"events": [(r.bucket.toordinal(), r.n) for r in rows]}
    lines(out("5_time_trend.png"), series, "Weekly event volume")

    # 6: most active channels (main.py:841-891) — channel_audit's top
    # posts per channel, aggregated to a post count per channel
    rows = qs["channel_audit"](spark, sf_dir).collect()
    counts: dict[str, int] = {}
    for r in rows:
        counts[r.channel] = counts.get(r.channel, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    barh(
        out("6_active_channels.png"),
        [k for k, _ in top],
        [v for _, v in top],
        "Most active channels",
    )
    return written


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "charts_out"
    from database_per_keyword_analysis_spark.session import get_spark

    spark = get_spark("charts-demo")
    spark.sparkContext.setLogLevel("ERROR")
    for p in render_all(spark, sf_dir, out_dir):
        print(p, os.path.getsize(p), "bytes", "(matplotlib)" if HAVE_MPL else "(miniplot)")


if __name__ == "__main__":
    main()
