"""BPE merge induction: classic-example behavior + an exact-match
differential against a pure-Python reference implementation (the
oracle strategy for iterative operators that one SQL statement cannot
express)."""

from __future__ import annotations

from collections import Counter

from database_per_keyword_analysis_spark.operators import bpe as B
from database_per_keyword_analysis_spark.sources import load


def _py_bpe(word_counts: dict[str, int], n_merges: int, min_pair_count: int = 2):
    """Reference BPE (Sennrich et al. 2016): same tie-break (count desc,
    then lexicographic pair) and the same greedy left-to-right
    simultaneous merge."""
    symbols = {w: list(w) + [B.END_OF_WORD] for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, c in word_counts.items():
            s = symbols[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, left + right, cnt))
        merged = left + right
        for w, s in symbols.items():
            out: list[str] = []
            for sym in s:
                if out and out[-1] == left and sym == right:
                    out[-1] = merged
                else:
                    out.append(sym)
            symbols[w] = out
    return merges, symbols


def test_bpe_classic_example(spark):
    df = spark.createDataFrame(
        [("low lower lowest low low",), ("new newer newest new",)],
        "text string",
    )
    merges, words = B.bpe_train(df, n_merges=8)
    final = {r.word: r.symbols for r in words.collect()}
    # 'low' occurs 3x -> fully merged into one unit; 'er' learned as a
    # shared suffix of lower/newer
    assert final["low"] == ["low</w>"]
    assert final["lower"][-1] == "er</w>"
    assert final["newer"][-1] == "er</w>"
    assert any(m.merged == "er" for m in merges)


def test_bpe_matches_python_reference_on_fixture(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(120)
    base = B.word_symbol_table(docs)
    word_counts = {r.word: r.n for r in base.select("word", "n").collect()}
    want_merges, want_symbols = _py_bpe(word_counts, n_merges=12)
    merges, words = B.bpe_train(docs, n_merges=12)
    got = [(m.merge_rank, m.left, m.right, m.merged, m.pair_count) for m in merges]
    assert got == want_merges  # exact sequence, counts included
    got_symbols = {r.word: r.symbols for r in words.collect()}
    assert got_symbols == want_symbols  # every word's final segmentation


def test_bpe_stops_below_min_pair_count(spark):
    # all words unique singletons: every pair count is 1 -> no merges
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    merges, _ = B.bpe_train(df, n_merges=5, min_pair_count=2)
    assert merges == []


def test_bpe_encode_roundtrip_and_oov(spark):
    train = spark.createDataFrame(
        [("low lower lowest low low",), ("new newer newest new",)],
        "text string",
    )
    _, words = B.bpe_train(train, n_merges=8)
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "zebra low")],  # zebra is OOV
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in B.bpe_encode(docs, words).collect()}
    assert out[1].n_words == 2
    # concatenating subwords reconstructs each word + end marker
    joined = "".join(out[1].subwords)
    assert joined == "low" + B.END_OF_WORD + "lower" + B.END_OF_WORD
    # OOV falls back to character symbols
    assert out[2].subwords[: 5 + 1] == list("zebra") + [B.END_OF_WORD]
    assert out[2].n_subwords == 6 + 1  # 'zebra'+marker, 'low</w>' merged unit


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=5),
        min_size=1,
        max_size=12,
    )
)
def test_bpe_matches_python_reference_random(spark, words):
    """Property differential: on arbitrary small corpora the Spark
    merge sequence and final segmentations must equal the pure-Python
    reference exactly.  Word counts are taken from word_symbol_table so
    both sides see the identical post-normalization vocabulary
    (normalize squeezes 3+ char runs, so raw strings would diverge)."""
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    base = B.word_symbol_table(df)
    word_counts = {r.word: r.n for r in base.select("word", "n").collect()}
    if not word_counts:
        return
    want_merges, want_symbols = _py_bpe(word_counts, n_merges=6)
    merges, out_words = B.bpe_train(df, n_merges=6)
    got = [(m.merge_rank, m.left, m.right, m.merged, m.pair_count) for m in merges]
    assert got == want_merges
    assert {r.word: r.symbols for r in out_words.collect()} == want_symbols


def test_bpe_encode_frozen_equals_fold_encode(spark):
    """The replace-chain apply form (bpe_encode_frozen) must equal the
    fold form: build the segmentation table by applying the same frozen
    merges with _apply_merge, feed it to bpe_encode, and compare per-doc
    subword streams exactly (left != right merges ⇒ non-overlapping
    matches ⇒ the global replace IS the greedy simultaneous pass)."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "lower the window lower now"),
            (2, "a partition sorts sorted columns"),
            (3, "scan scan scan window order"),
            (4, None),
            (5, "   "),
        ],
        "doc_id long, text string",
    )
    merges = [
        ("e", "r"), ("o", "w"), ("ow", "</w>"), ("er", "</w>"),
        ("o", "r"), ("s", "c"), ("sc", "an</w>"), ("a", "n</w>"),
    ]
    # fold form: segmentation table from the same merges
    words = B.word_symbol_table(docs)
    for left, right in merges:
        words = words.withColumn(
            "symbols", B._apply_merge(F.col("symbols"), left, right)
        )
    # note merge order differs from a learned sequence on purpose:
    # ("a","n</w>") after ("sc","an</w>") exercises a no-op-then-hit mix
    want = {
        r.doc_id: (r.n_words, r.n_subwords, r.subwords)
        for r in B.bpe_encode(docs, words).collect()
    }
    got = {
        r.doc_id: (r.n_words, r.n_subwords, r.subwords)
        for r in B.bpe_encode_frozen(docs, merges).collect()
    }
    assert got == want
    assert set(got) == {1, 2, 3}  # null/blank docs emit nothing


def test_bpe_encode_frozen_rejects_left_eq_right(spark):
    import pytest

    docs = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    with pytest.raises(ValueError, match="left == right"):
        B.bpe_encode_frozen(docs, [("a", "a")])


def test_bpe_encode_frozen_adjacent_matches_share_separators(spark):
    # 'x y x y' with merge (x,y): both pairs must merge in ONE pass —
    # the double-separator encoding exists exactly for this case
    docs = spark.createDataFrame([(1, "q xy xy v")], "doc_id long, text string")
    row = B.bpe_encode_frozen(docs, [("x", "y")]).collect()[0]
    assert row.subwords == ["q", "</w>", "xy", "</w>", "xy", "</w>", "v", "</w>"]


def test_fertility_by_group_totals_and_floor(spark):
    """Fertility per group equals the ratio of the encode's own totals,
    and is >= 1 by construction (every word is at least one subword)."""
    from database_per_keyword_analysis_spark.catalog import FROZEN_BPE_MERGES
    from database_per_keyword_analysis_spark.operators import bpe as B
    from database_per_keyword_analysis_spark.sources import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    enc = B.bpe_encode_frozen(
        docs, FROZEN_BPE_MERGES, extra_cols=["lang"]
    ).collect()
    fert = B.bpe_fertility_by_group(docs, FROZEN_BPE_MERGES).collect()
    by_lang = {}
    for r in enc:
        w, s = by_lang.get(r.lang, (0, 0))
        by_lang[r.lang] = (w + r.n_words, s + r.n_subwords)
    assert len(fert) == len(by_lang)
    for r in fert:
        w, s = by_lang[r.lang]
        assert (r.total_words, r.total_subwords) == (w, s)
        assert r.fertility == s / w
        assert r.fertility >= 1.0
