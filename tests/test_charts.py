"""The demo chart layer (charts.py / tools/miniplot.py) writes one valid
PNG per reference chart family from the oracle-checked feeding queries."""

from __future__ import annotations

import os

import charts


def test_render_all_six_families(spark, sf_dir, tmp_path):
    written = charts.render_all(spark, sf_dir, str(tmp_path))
    families = {os.path.basename(p).split("_")[0] for p in written}
    assert families == {"1", "2", "3", "4", "5", "6"}
    # both chart-4 variants (bar + word cloud, main.py:737-791)
    names = {os.path.basename(p) for p in written}
    assert any(n.startswith("4_wordfreq_") for n in names)
    assert any(n.startswith("4_wordcloud_") for n in names)
    for p in written:
        assert os.path.getsize(p) > 500
        with open(p, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_wordcloud_scales_and_places_words(tmp_path):
    from tools import miniplot as MP

    p = str(tmp_path / "wc.png")
    freqs = {f"word{i}": 100 - i for i in range(40)}
    MP.wordcloud(p, freqs, "cloud")
    assert os.path.getsize(p) > 500
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    # deterministic: same input renders byte-identical output
    p2 = str(tmp_path / "wc2.png")
    MP.wordcloud(p2, dict(freqs), "cloud")
    assert open(p, "rb").read() == open(p2, "rb").read()
    MP.wordcloud(str(tmp_path / "empty.png"), {}, "empty")


def test_miniplot_empty_inputs(tmp_path):
    # degenerate data must not crash the rasterizer
    from tools import miniplot as MP

    MP.barh(str(tmp_path / "empty.png"), [], [], "empty")
    MP.lines(str(tmp_path / "none.png"), {}, "none")
    assert os.path.getsize(tmp_path / "empty.png") > 100


def test_rtl_label_shim():
    # reference parity: make_farsi_text_readable (main.py:76-84) —
    # reshape+bidi when the libs exist, byte-identical pass-through
    # when they don't.
    import charts

    persian = "سنگ آهن"  # "سنگ آهن"
    # this container has neither lib: pass-through, same object content
    assert not charts.HAS_RESHAPER
    assert charts.make_rtl_readable(persian) == persian
    assert charts.make_rtl_readable("plain english") == "plain english"

    # injected backends (the nlp_tier_b idiom) exercise the real branch:
    # contextual reshape then visual reordering
    def fake_reshape(t):
        return t.replace("س", "ﺷ")  # isolated -> initial form

    def fake_display(t):
        return t[::-1]

    out = charts.make_rtl_readable(
        persian, _reshape=fake_reshape, _display=fake_display
    )
    assert out == fake_display(fake_reshape(persian))
    assert out != persian

    # the chart entry points route labels through the shim without
    # breaking rendering (miniplot backend, real PNG)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "rtl.png")
        charts.barh(p, [persian, "other"], [3, 1], persian)
        assert os.path.getsize(p) > 0
