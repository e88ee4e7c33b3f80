"""Unit tests for the Tier-A text pipeline: Persian normalization rules,
U6 token-filter edge cases (FIXTURES.md §4), normalization idempotence."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from database_per_keyword_analysis_spark.functions import text as TX
from database_per_keyword_analysis_spark.operators import wordfreq as WF


def _norm_one(spark, s: str) -> str:
    return (
        spark.range(1).select(TX.normalize_text(F.lit(s)).alias("x")).first().x
    )


def _toks_one(spark, s: str, spec=TX.REFERENCE_SPEC) -> list[str]:
    df = spark.createDataFrame([(1, s)], "doc_id long, text string")
    return [r.word for r in WF.tokens(df, "text", spec).collect()]


def test_normalize_persian_char_unification(spark):
    assert _norm_one(spark, "كيف") == "کیف"  # Arabic kaf/yeh → Persian


def test_normalize_strips_diacritics(spark):
    assert _norm_one(spark, "مدرسةٌ") == "مدرسه"


def test_normalize_squeezes_repeats_and_whitespace(spark):
    assert _norm_one(spark, "sooooo   GOOD") == "soo good"


def test_normalize_idempotent_examples(spark):
    for s in ["hello world", "كيف حالك", "aaa  bbb", "x"]:
        once = _norm_one(spark, s)
        assert _norm_one(spark, once) == once


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8", categories=("L", "N", "Zs")), max_size=40))
def test_normalize_idempotent_property(spark, s):
    once = _norm_one(spark, s)
    assert _norm_one(spark, once) == once


def test_token_filters_reference_spec(spark):
    # FIXTURES.md §4 edge cases, REFERENCE_SPEC (ascii_rule on)
    text = "ab abc a1b http://x.com www.y.ir @chan id:99 bot1 landing beautiful کتاب خانه‌ها"
    kept = _toks_one(spark, text)
    assert "ab" not in kept          # len < 3
    assert "abc" in kept             # len 3 kept
    assert "a1b" not in kept         # digit
    assert not any("http" in t or "www" in t or "@" in t for t in kept)
    assert "landing" not in kept     # ascii junk literal
    assert "beautiful" not in kept   # all-ASCII len>7
    assert "کتاب" in kept            # Persian kept
    assert "خانه‌ها" in kept          # ZWNJ-joined word survives tokenize
    assert "bot1" not in kept        # digit + 'bot'


def test_token_filters_english_spec(spark):
    kept = _toks_one(spark, "beautiful admin words", TX.ENGLISH_SPEC)
    assert "beautiful" in kept  # ascii_rule off keeps long English words
    assert "admin" in kept


def test_dynamic_stopwords(spark):
    df = spark.createDataFrame(
        [(1, "hello from ChanA", "ChanA"), (2, "more text", "chanB")],
        "doc_id long, text string, channel string",
    )
    sw = {r.word for r in WF.dynamic_stopwords(df, "channel").collect()}
    assert sw == {"chana", "chanb", "@chana", "@chanb"}


def test_word_frequency_applies_stopword_df(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta beta chana", "g"), (2, "beta gamma", "g")],
        "doc_id long, text string, grp string",
    )
    sw = spark.createDataFrame([("chana",)], "word string")
    out = WF.word_frequency(df, ["grp"], "text", stopwords=sw, top_n=10)
    got = {(r.word, r.cnt, r.rn) for r in out.collect()}
    assert got == {("beta", 3, 1), ("alpha", 1, 2), ("gamma", 1, 3)}


def test_snippet(spark):
    df = spark.createDataFrame([("line1\nline2 " + "x" * 200,)], "text string")
    out = df.select(TX.snippet("text", 100).alias("s")).first().s
    assert out.endswith("...")
    assert "\n" not in out
    assert len(out) == 103


def test_word_frequency_by_industry_multilabel(spark):
    """A multi-label doc's tokens count in BOTH industries and Global."""
    from database_per_keyword_analysis_spark.config import KeywordConfig
    from database_per_keyword_analysis_spark.operators import wordfreq as WF

    cfg = KeywordConfig(
        industry_keywords={"Steel": ["steel"], "Water": ["water"]},
        stopwords=[],
    )
    df = spark.createDataFrame(
        [(1, "ch1", "steel water blend"), (2, "ch2", "steel only post")],
        ["doc_id", "src", "text"],
    )
    out = WF.word_frequency_by_industry(df, cfg, channel_col="src", top_n=10)
    got = {(r.industry, r.word): r.cnt for r in out.collect()}
    assert got[("Steel", "steel")] == 2   # docs 1 and 2
    assert got[("Water", "steel")] == 1   # doc 1's tokens in Water too
    assert got[("Global", "steel")] == 2
    assert got[("Water", "water")] == 1
    assert ("Steel", "only") in got and ("Water", "only") not in got


def test_approx_top_tokens_exact_when_vocab_fits(spark, sf_dir):
    from pyspark.sql import functions as F

    from database_per_keyword_analysis_spark.operators import wordfreq as WF
    from database_per_keyword_analysis_spark.sources import load

    docs = load(spark, sf_dir, "documents")
    out = WF.approx_top_tokens(docs, k=30).collect()
    assert len(out) == 30
    assert [r.rank for r in out] == list(range(1, 31))
    exact = {
        r.word: r.n
        for r in WF.tokens(docs)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # vocab fits the 10k tracked slots -> every reported count is EXACT
    assert len(exact) < 10_000
    for r in out:
        assert exact[r.word] == r.n
    # and nothing heavier was missed: the k-th reported count bounds the
    # counts of all unreported words (ties may swap word identity only)
    floor = min(r.n for r in out)
    reported = {r.word for r in out}
    assert all(n <= floor for w, n in exact.items() if w not in reported)


def test_bigram_collocations_pmi_math_and_min_count(spark):
    import math

    from database_per_keyword_analysis_spark.operators import wordfreq as WF

    # 'new york' always together (5x); 'the the' frequent singles
    docs = [("new york " * 5).strip()] + ["the cat", "the dog", "the fish"]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    out = {(r.w1, r.w2): r for r in
           WF.bigram_collocations(df, min_count=2, k=10).collect()}
    # bigrams: doc1 has 9 pairs: 5x(new,york) + 4x(york,new); others 1 each
    assert ("new", "york") in out and ("york", "new") in out
    assert ("the", "cat") not in out  # below min_count
    r = out[("new", "york")]
    n_total = 9 + 3
    expected = round(math.log(5 * n_total / (5 * 5)), 6)
    assert r.pair_count == 5 and r.pmi == pytest.approx(expected, abs=1e-6)


class TestKneserNey:
    def test_probabilities_sum_to_one_per_context(self, spark):
        """The KN invariant: for every observed context w1,
        sum over OBSERVED continuations of the discounted term plus
        lambda(w1) * sum of P_cont over observed w2 stays <= 1, and the
        full model (discounted mass + lambda * total continuation mass)
        sums to EXACTLY 1 when P_cont is summed over the whole vocab —
        checked by reconstructing the terms from the same count tables."""
        from pyspark.sql import functions as F

        docs = spark.createDataFrame(
            [(1, "a b a c a b"), (2, "b a b c")], "doc_id long, text string"
        )
        toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        pairs = F.expr(
            "transform(sequence(1, size(toks) - 1), "
            "i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
        )
        grams = (
            docs.select(toks.alias("toks"))
            .select(F.explode(pairs).alias("p"))
            .select("p.w1", "p.w2")
        )
        import collections

        rows = [(r.w1, r.w2) for r in grams.collect()]
        c12 = collections.Counter(rows)
        c1 = collections.Counter(w1 for w1, _ in rows)
        n1f = collections.Counter(w1 for w1, _ in set(rows))
        n1b = collections.Counter(w2 for _, w2 in set(rows))
        nt = len(set(rows))
        d = 0.75
        for w1 in c1:
            disc = sum(
                max(c12[(w1, w2)] - d, 0.0) / c1[w1]
                for w2 in {b for a, b in rows if a == w1}
            )
            lam = d * n1f[w1] / c1[w1]
            total_cont = sum(n1b[w2] for w2 in n1b) / nt  # == 1 by def
            assert abs(total_cont - 1.0) < 1e-12
            assert abs(disc + lam * total_cont - 1.0) < 1e-12

    def test_scores_hand_computed_tiny_corpus(self, spark):
        from database_per_keyword_analysis_spark.operators import (
            textquality as TQ,
        )

        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_bigrams, r.avg_nll)
            for r in TQ.kneser_ney_bigram_scores(docs).collect()
        }
        # count tables: bigrams ab x3, ba x1, bc x1
        # c(a)=3, c(b)=2; N1+(a.)=1, N1+(b.)=2; N1+(.a)=1, N1+(.b)=1,
        # N1+(.c)=1; N1+(..)=3
        import math

        d = 0.75
        p_ab = (3 - d) / 3 + (d * 1 / 3) * (1 / 3)
        p_ba = (1 - d) / 2 + (d * 2 / 2) * (1 / 3)
        p_bc = (1 - d) / 2 + (d * 2 / 2) * (1 / 3)
        want1 = round(-(2 * math.log(p_ab) + 1 * math.log(p_ba)) / 3, 6)
        want2 = round(-(math.log(p_ab) + math.log(p_bc)) / 2, 6)
        assert got[1] == (3, want1)
        assert got[2] == (2, want2)


def _kn3_reference(texts: dict[int, str], d: float = 0.75) -> dict:
    """Pure-Python order-3 interpolated KN (Chen & Goodman eq. 18) —
    the independent reference the Spark implementation must match."""
    import collections
    import math

    tris, bigs, doc_tris = collections.Counter(), set(), {}
    for doc, text in texts.items():
        toks = text.strip().lower().split()
        doc_tris[doc] = [
            (toks[i - 2], toks[i - 1], toks[i]) for i in range(2, len(toks))
        ]
        tris.update(doc_tris[doc])
        bigs.update(
            {(toks[i - 1], toks[i]) for i in range(1, len(toks))}
        )
    c12 = collections.Counter()
    n1f12 = collections.Counter()
    n1p23 = collections.Counter()
    for (w1, w2, w3), c in tris.items():
        c12[(w1, w2)] += c
        n1f12[(w1, w2)] += 1
        n1p23[(w2, w3)] += 1
    n1p2dot, n1f2 = collections.Counter(), collections.Counter()
    for (w2, w3), c in n1p23.items():
        n1p2dot[w2] += c
        n1f2[w2] += 1
    n1b = collections.Counter(w3 for _, w3 in bigs)
    ntb = len(bigs)

    def p(w1, w2, w3):
        p1 = n1b[w3] / ntb
        p2 = max(n1p23[(w2, w3)] - d, 0.0) / n1p2dot[w2] + (
            d * n1f2[w2] / n1p2dot[w2]
        ) * p1
        return max(tris[(w1, w2, w3)] - d, 0.0) / c12[(w1, w2)] + (
            d * n1f12[(w1, w2)] / c12[(w1, w2)]
        ) * p2

    out = {}
    for doc, ts in doc_tris.items():
        if not ts:
            continue
        s = sum(math.log(p(*t)) for t in ts)
        out[doc] = (len(ts), round(-s / len(ts), 6))
    return out


class TestKneserNeyTrigram:
    def test_matches_pure_python_reference_on_fixture(self, spark):
        from database_per_keyword_analysis_spark.operators import (
            textquality as TQ,
        )
        from database_per_keyword_analysis_spark.sources import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        texts = {
            r.doc_id: r.text
            for r in docs.where("text IS NOT NULL").collect()
        }
        want = _kn3_reference(texts)
        got = {
            r.doc_id: (r.n_trigrams, r.avg_nll)
            for r in TQ.kneser_ney_trigram_scores(docs).collect()
        }
        assert set(got) == set(want)
        mismatches = {
            k: (got[k], want[k])
            for k in want
            # the reference's raw-double sum may differ from the
            # DECIMAL-accumulated Spark sum in the last ulp before
            # rounding; 6-dp equality after a 1e-9 tolerance is the
            # contract
            if abs(got[k][1] - want[k][1]) > 1e-6 or got[k][0] != want[k][0]
        }
        assert mismatches == {}

    def test_model_sums_to_one_per_context(self, spark):
        """Σ_w3 P3(w3|w1,w2) over the FULL continuation vocab = 1 for
        every observed trigram context — KN's properness invariant,
        checked on a tiny corpus via the reference implementation's
        count tables."""
        import collections

        texts = {1: "a b a b c a b", 2: "b a b c a"}
        d = 0.75
        tris, bigs = collections.Counter(), set()
        for text in texts.values():
            toks = text.split()
            tris.update(
                (toks[i - 2], toks[i - 1], toks[i])
                for i in range(2, len(toks))
            )
            bigs.update((toks[i - 1], toks[i]) for i in range(1, len(toks)))
        c12, n1f12, n1p23 = (
            collections.Counter(),
            collections.Counter(),
            collections.Counter(),
        )
        for (w1, w2, w3), c in tris.items():
            c12[(w1, w2)] += c
            n1f12[(w1, w2)] += 1
            n1p23[(w2, w3)] += 1
        n1p2dot, n1f2 = collections.Counter(), collections.Counter()
        for (w2, w3), c in n1p23.items():
            n1p2dot[w2] += c
            n1f2[w2] += 1
        n1b = collections.Counter(w3 for _, w3 in bigs)
        ntb = len(bigs)
        vocab = set(n1b)
        for (w1, w2) in c12:
            total = 0.0
            for w3 in vocab:
                p1 = n1b[w3] / ntb
                p2 = max(n1p23[(w2, w3)] - d, 0.0) / n1p2dot[w2] + (
                    d * n1f2[w2] / n1p2dot[w2]
                ) * p1
                total += max(tris[(w1, w2, w3)] - d, 0.0) / c12[(w1, w2)] + (
                    d * n1f12[(w1, w2)] / c12[(w1, w2)]
                ) * p2
            assert abs(total - 1.0) < 1e-9, (w1, w2, total)


def test_corpus_drift_terms_contracts(spark):
    """r10 drift-monitor contracts on hand-built snapshots: a term
    present only in A tops the drift ranking with positive KL term, a
    balanced term contributes ~0, smoothing defines absent-side
    probabilities, and the exact-integer ordering is deterministic."""
    from database_per_keyword_analysis_spark.operators.textquality import (
        corpus_drift_terms,
    )

    a = spark.createDataFrame(
        [(1, "alpha alpha alpha beta beta common common common")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(2, "gamma gamma beta beta common common common")],
        "doc_id long, text string",
    )
    rows = corpus_drift_terms(a, b, top_k=10).collect()
    by_tok = {r.token: r for r in rows}
    # union vocab V=4; tot_a=8, tot_b=7
    al = by_tok["alpha"]
    assert (al.n_a, al.n_b) == (3, 0)
    assert al.p_a == round(4 / 12, 9) and al.p_b == round(1 / 11, 9)
    assert al.kl_term > 0
    ga = by_tok["gamma"]
    assert (ga.n_a, ga.n_b) == (0, 2)
    assert ga.kl_term < 0  # A under-represents gamma
    # beta: 2 vs 2 — near-balanced, tiny |kl|
    assert abs(by_tok["beta"].kl_term) < abs(al.kl_term)
    # ordering: the largest |cross-product| first
    drifts = [
        abs((r.n_a + 1) * (7 + 4) - (r.n_b + 1) * (8 + 4)) for r in rows
    ]
    assert drifts == sorted(drifts, reverse=True)


def test_cooccurrence_npmi_contracts(spark):
    """r11 NPMI contracts on hand-built docs: a pair present in every
    document pins to the degenerate npmi=1, a perfectly-associated
    (but not universal) pair scores 1, near-independent pairs sit
    near 0, sub-support tokens/pairs are pruned, and the A-priori
    prune loses no qualifying pair."""
    import math

    from database_per_keyword_analysis_spark.operators.textquality import (
        cooccurrence_npmi,
    )

    rows = []
    # 8 docs all containing "anchor base" (universal pair, npmi = 1)
    # docs 0-3 also contain "alpha beta" together (perfect association,
    # p=1/2 each and jointly); docs 4-7 contain "gamma" (co-occurs with
    # anchor but driven by anchor's universality)
    for i in range(8):
        extra = "alpha beta" if i < 4 else "gamma delta"
        rows.append((i, f"anchor base {extra}"))
    # "rare" appears in only 2 docs: below min_support=4, pruned
    rows[0] = (0, rows[0][1] + " rare")
    rows[1] = (1, rows[1][1] + " rare")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.token_a, r.token_b): r
        for r in cooccurrence_npmi(df, min_support=4).collect()
    }
    assert out[("anchor", "base")].npmi == 1.0  # degenerate p_ab = 1
    assert out[("anchor", "base")].n_ab == 8
    # alpha-beta: p_a = p_b = p_ab = 1/2 -> npmi = ln(2)/ln(2) = 1
    assert out[("alpha", "beta")].npmi == 1.0
    assert out[("alpha", "beta")].n_ab == 4
    # alpha-anchor: p_ab = 1/2 = p_a * 1 -> pmi ln(1) = 0 -> npmi 0
    assert out[("alpha", "anchor")].npmi == 0.0
    # the pruned token appears in NO pair
    assert not any("rare" in k for k in out)
    # completeness vs brute force at the same threshold
    docs = {i: set(t.split()) for i, t in rows}
    toks = sorted({t for s in docs.values() for t in s})
    want = set()
    for i, a in enumerate(toks):
        for b in toks[i + 1:]:
            n_ab = sum(1 for s in docs.values() if a in s and b in s)
            if n_ab >= 4:
                want.add((a, b))
    assert set(out) == want
    # spot-check one non-trivial value against the formula
    r = out[("anchor", "gamma")]
    p_ab, p_a, p_b = r.n_ab / 8, r.n_a / 8, r.n_b / 8
    assert r.npmi == round(
        math.log(p_ab / (p_a * p_b)) / -math.log(p_ab), 6
    )


def test_persian_fixture_counts_pin_every_rule(spark):
    # the oracle-checked persian_word_frequency query's expected
    # output, pinned row-for-row so a fixture or rule change is loud:
    # unification merges the two spellings of کتاب (5 total), the
    # squeeze produces سلاام/عالیی, ZWNJ tokens survive whole, ASCII
    # junk/weblike/digit tokens drop, Persian digits pass the charset
    from database_per_keyword_analysis_spark import catalog

    rows = catalog.queries()["persian_word_frequency"](spark, "").collect()
    got = [(r.token, r.n) for r in rows]
    assert got[0] == ("کتاب", 5)
    assert got[1] == ("خوب", 4)
    d = dict(got)
    assert d["می‌خواهم"] == 1 and d["کتاب‌ها"] == 1  # ZWNJ intact
    assert d["سلاام"] == 1 and d["عالیی"] == 1  # squeezed to 2
    assert d["علی"] == 2  # Arabic yeh spelling unified
    assert d["salam"] == 1  # short non-junk ASCII survives
    assert d["۱۴۰۲"] == 1  # Persian digits pass the charset
    for absent in ("landing", "admin", "click", "wonderful", "1402",
                   "یک", "با", "او"):
        assert absent not in d
    assert len(got) == 17


def test_kn3_derived_bigram_types_arm_is_bit_equal(spark):
    # r11 verdict item 3 A/B arm: deriving the unigram layer's
    # bigram-type table from the trigram types (+ the 2-token-doc
    # residual) must be EXACTLY the corpus bigram explode+distinct —
    # crafted corpus hits every branch: n>=3 docs, an n==2 doc (no
    # trigram, contributes its lone bigram), n==1 and NULL docs
    from database_per_keyword_analysis_spark.operators import (
        textquality as TQ,
    )

    rows = [(1, "a b c a b d"), (2, "x y"), (3, "a b"), (4, "p"),
            (5, None), (6, "q r s q r s q r")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        tuple(r) for r in TQ.kneser_ney_trigram_scores(docs).collect()
    )
    b = sorted(
        tuple(r)
        for r in TQ.kneser_ney_trigram_scores(
            docs, derive_bigram_types=True
        ).collect()
    )
    assert a == b


class TestLengthConcentration:
    def _run(self, spark, rows, **kw):
        from database_per_keyword_analysis_spark.operators import (
            textquality as TQ,
        )

        df = spark.createDataFrame(rows, "source string, n_chars long")
        return {
            r.source: r
            for r in TQ.length_concentration(df, **kw).collect()
        }

    def test_equal_masses_give_gini_near_zero(self, spark):
        # perfectly equal distribution: rank-form Gini = (n-1)/n - 1 + 1/n
        # ... exactly 0 for equal x: (2*S1 - (n+1)*S)/(n*S) with
        # S1 = x*n(n+1)/2 -> numerator 0
        got = self._run(spark, [("a", 100)] * 8)
        assert got["a"].gini == 0.0
        assert got["a"].top_share == 1.0  # 8 docs <= top_k=10

    def test_single_giant_doc_dominates(self, spark):
        rows = [("b", 1)] * 9 + [("b", 991)]
        got = self._run(spark, rows)
        # hand Gini: sorted x = 1*9, 991; S=1000, S1=45+9910=9955
        # (2*9955 - 11*1000)/(10*1000) = 8910/10000
        assert got["b"].gini == 0.891
        assert got["b"].top_share == 1.0

    def test_matches_pure_python_reference(self, spark):
        import random

        rng = random.Random(3)
        xs = [rng.randrange(1, 5000) for _ in range(57)]
        got = self._run(spark, [("c", x) for x in xs], top_k=5)
        xs.sort()
        n, s = len(xs), sum(xs)
        s1 = sum((i + 1) * x for i, x in enumerate(xs))
        assert got["c"].gini == round((2 * s1 - (n + 1) * s) / (n * s), 9)
        assert got["c"].top_share == round(sum(sorted(xs)[-5:]) / s, 9)

    def test_zero_total_mass_is_null(self, spark):
        got = self._run(spark, [("d", 0), ("d", 0)])
        assert got["d"].gini is None and got["d"].top_share is None
        assert got["d"].n_docs == 2


class TestZipfSlope:
    def test_synthetic_zipf_recovers_minus_one(self, spark):
        # frequencies n_r = round(C / r) over 60 ranks: the fitted
        # log-log slope must sit near -1
        from database_per_keyword_analysis_spark.operators import (
            textquality as TQ,
        )

        rows = []
        for r in range(1, 61):
            tok = f"w{r:03d}"
            rows.extend(("en", tok) for _ in range(max(1, round(600 / r))))
        docs = spark.createDataFrame(
            [(lang, " ".join(t for _, t in grp))
             for lang, grp in [("en", rows)]],
            "lang string, text string",
        )
        out = TQ.zipf_slope(docs).collect()[0]
        assert out.n_types == 60 and out.k_used == 60
        assert -1.05 < out.slope < -0.93

    def test_tie_break_on_token_is_deterministic(self, spark):
        # all-equal counts: slope exactly 0 (y constant), rank order
        # pinned by the token tiebreak
        from database_per_keyword_analysis_spark.operators import (
            textquality as TQ,
        )

        docs = spark.createDataFrame(
            [("en", "b a d c")], "lang string, text string"
        )
        out = TQ.zipf_slope(docs).collect()[0]
        assert out.slope == 0.0 and out.k_used == 4

    def test_top_k_validation(self, spark):
        import pytest as _pytest

        from database_per_keyword_analysis_spark.operators import (
            textquality as TQ,
        )

        docs = spark.createDataFrame(
            [("en", "a b")], "lang string, text string"
        )
        with _pytest.raises(ValueError):
            TQ.zipf_slope(docs, top_k=1)


class TestHeapsLaw:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )

    def test_closed_vocabulary_beta_near_zero(self, spark):
        from database_per_keyword_analysis_spark.operators import (
            textquality as TQ,
        )

        # the same 4 words repeated: V saturates at the first
        # checkpoint, beta ~ 0
        texts = ["a b c d"] * 40
        rows = TQ.heaps_law(self._docs(spark, texts)).collect()
        assert len(rows) == 10
        assert all(r.v_cum == 4 for r in rows)
        assert rows[0].beta == rows[9].beta  # repeated fit columns
        assert abs(rows[0].beta) < 0.01

    def test_all_novel_tokens_beta_is_one(self, spark):
        from database_per_keyword_analysis_spark.operators import (
            textquality as TQ,
        )

        # every token unique: V(N) = N exactly -> beta = 1, ln_k = 0
        texts = [f"t{4*i} t{4*i+1} t{4*i+2} t{4*i+3}" for i in range(30)]
        rows = TQ.heaps_law(self._docs(spark, texts)).collect()
        assert all(r.v_cum == r.n_cum for r in rows)
        assert rows[0].beta == 1.0 and rows[0].ln_k == 0.0

    def test_matches_pure_python_reference(self, spark):
        import math
        import random

        from database_per_keyword_analysis_spark.operators import (
            textquality as TQ,
        )

        rng = random.Random(11)
        texts = [
            " ".join(f"w{rng.randrange(1, 1 + 3 * (i + 1))}"
                     for _ in range(12))
            for i in range(25)
        ]
        rows = TQ.heaps_law(self._docs(spark, texts)).collect()
        # replay: doc order, bucket formula, first occurrences
        n_docs, c = len(texts), 10
        seen, curve, n_cum, v_cum = set(), {}, 0, 0
        for rnk, t in enumerate(texts, start=1):
            ck = ((rnk - 1) * c) // n_docs + 1
            toks = t.split()
            n_cum += len(toks)
            for tok in toks:
                if tok not in seen:
                    seen.add(tok)
                    v_cum += 1
            curve[ck] = (n_cum, v_cum)
        # cumulative at each checkpoint = value at its LAST doc
        want = {}
        acc = (0, 0)
        for ck in range(1, c + 1):
            acc = curve.get(ck, acc)
            want[ck] = acc
        got = {r.ckpt: (r.n_cum, r.v_cum) for r in rows}
        assert got == {k: v for k, v in want.items() if v[0] > 0}
        xs = [math.log(n) for n, _ in got.values()]
        ys = [math.log(v) for _, v in got.values()]
        k = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        assert abs(rows[0].beta - round(beta, 6)) <= 1e-6

    def test_checkpoint_validation(self, spark):
        import pytest as _pytest

        from database_per_keyword_analysis_spark.operators import (
            textquality as TQ,
        )

        with _pytest.raises(ValueError):
            TQ.heaps_law(self._docs(spark, ["a"]), checkpoints=1)


def test_vocab_richness_hand_counts(spark):
    # tokens: a a a b b c d -> N=7, V=4, n1=2 (c,d), n2=1 (b)
    from database_per_keyword_analysis_spark.operators import (
        textquality as TQ,
    )

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c d")], "doc_id long, text string"
    )
    r = TQ.vocab_richness(df).collect()[0]
    assert (r.n_tokens, r.vocab, r.singletons, r.doubletons) == (7, 4, 2, 1)
    assert r.gt_unseen == round(2 / 7, 9)
    # chao1 = 4 + 2*1/(2*(1+1)) = 4.5
    assert r.chao1 == 4.5


def test_vocab_richness_closed_vocab_is_saturated(spark):
    # every type seen >= 3 times: n1 = 0 -> unseen mass 0, chao1 == V
    from database_per_keyword_analysis_spark.operators import (
        textquality as TQ,
    )

    df = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y x y")], "doc_id long, text string"
    )
    r = TQ.vocab_richness(df).collect()[0]
    assert r.singletons == 0 and r.gt_unseen == 0.0 and r.chao1 == 2.0


def test_vocab_richness_empty_corpus(spark):
    from database_per_keyword_analysis_spark.operators import (
        textquality as TQ,
    )

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = TQ.vocab_richness(df).collect()[0]
    assert r.n_tokens == 0 and r.gt_unseen is None and r.chao1 is None


def test_style_delta_identical_groups_are_zero(spark):
    # two sources with identical token rates: every z difference is 0
    from database_per_keyword_analysis_spark.operators import (
        textquality as TQ,
    )

    rows = [
        (1, "a", "the cat sat on the mat"),
        (2, "b", "the cat sat on the mat"),
        (3, "c", "dogs dogs dogs bark bark loudly"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r.group_a, r.group_b): r for r in TQ.style_delta(df).collect()}
    assert out[("a", "b")].delta == 0.0
    assert out[("a", "c")].delta > 0.5
    # symmetry by construction: (a,c) and (b,c) identical
    assert out[("a", "c")].delta == out[("b", "c")].delta


def test_style_delta_matches_pure_python(spark):
    import math
    import random
    from collections import Counter

    from database_per_keyword_analysis_spark.operators import (
        textquality as TQ,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    groups = {}
    rows = []
    for gi, g in enumerate(["s1", "s2", "s3"]):
        toks = [rng.choice(vocab) for _ in range(200 + gi * 40)]
        groups[g] = toks
        rows.append((gi, g, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.group_a, r.group_b): (r.n_terms, r.delta)
        for r in TQ.style_delta(df, top_k=8).collect()
    }
    # pure-Python replay
    total = Counter()
    for toks in groups.values():
        total.update(toks)
    panel = sorted(total, key=lambda t: (-total[t], t))[:8]
    f = {
        g: {t: Counter(toks)[t] / len(toks) for t in panel}
        for g, toks in groups.items()
    }
    z = {}
    terms = []
    for t in panel:
        vs = [f[g][t] for g in groups]
        k = len(vs)
        mu = sum(vs) / k
        var = (k * sum(v * v for v in vs) - sum(vs) ** 2) / (k * k)
        if var <= 0:
            continue
        terms.append(t)
        for g in groups:
            z[(g, t)] = (f[g][t] - mu) / math.sqrt(var)
    for a in groups:
        for b in groups:
            if a < b:
                d = sum(abs(z[(a, t)] - z[(b, t)]) for t in terms) / len(terms)
                nt, delta = got[(a, b)]
                assert nt == len(terms)
                assert abs(delta - round(d, 6)) <= 2e-6, (a, b, delta, d)


def test_style_delta_validates_top_k(spark):
    import pytest as _pt

    from database_per_keyword_analysis_spark.operators import (
        textquality as TQ,
    )

    df = spark.createDataFrame([(1, "a", "x")], "doc_id long, source string, text string")
    with _pt.raises(ValueError):
        TQ.style_delta(df, top_k=0)


def test_token_js_matrix_contracts(spark):
    import math

    from database_per_keyword_analysis_spark.operators import (
        textquality as TQ,
    )

    rows = [
        (1, "a", "x y z x"),
        (2, "b", "x y z x"),  # identical to a -> JS exactly 0
        (3, "c", "p q r"),  # disjoint from both -> JS exactly ln 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r.group_a, r.group_b): r for r in TQ.token_js_matrix(df).collect()}
    assert out[("a", "b")].js == 0.0 and out[("a", "b")].n_shared == 3
    ln2_6 = round(math.log(2), 6)
    assert out[("a", "c")].js == ln2_6 and out[("a", "c")].n_shared == 0
    assert out[("b", "c")].js == ln2_6  # zero-filled pair spine


def test_token_js_matrix_matches_pure_python(spark):
    import math
    import random
    from collections import Counter

    from database_per_keyword_analysis_spark.operators import (
        textquality as TQ,
    )

    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(15)]
    groups = {
        g: [rng.choice(vocab[: 8 + i * 3]) for _ in range(120)]
        for i, g in enumerate(["s1", "s2", "s3"])
    }
    rows = [
        (i, g, " ".join(toks)) for i, (g, toks) in enumerate(groups.items())
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r.group_a, r.group_b): r.js for r in TQ.token_js_matrix(df).collect()}

    def js(a, b):
        ca, cb = Counter(a), Counter(b)
        na, nb = len(a), len(b)
        total = 0.0
        for t in set(ca) | set(cb):
            pa, pb = ca[t] / na, cb[t] / nb
            m = (pa + pb) / 2
            if pa:
                total += 0.5 * pa * math.log(pa / m)
            if pb:
                total += 0.5 * pb * math.log(pb / m)
        return total

    for a in groups:
        for b in groups:
            if a < b:
                assert abs(got[(a, b)] - round(js(groups[a], groups[b]), 6)) <= 2e-6
