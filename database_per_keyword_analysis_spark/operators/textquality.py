"""Text-analysis extensions for a training-data pipeline (north star;
SURVEY.md §2.11): quality scoring, language-ID heuristic, token counting,
document fingerprinting.

All pure column expressions — at 100 TB these run as a single projection
pass over the corpus with no shuffle at all (the quality metrics) or one
tiny aggregation (the per-language rollups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic.  Real corpora would use larger lists or character n-gram
# profiles; the mechanism (score per language via marker hits, argmax) is
# identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "die", "ist"],
    "fr": ["le", "et", "les", "est"],
    "es": ["el", "los", "es", "y"],
}

STOPWORDS_EN = ["the", "a", "an", "of", "and", "to", "in", "is"]

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
# (shared regex subset: works identically in Java, RE2/DuckDB, Python).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# math.log(2) as a single shared literal: token_js_matrix's Spark plan
# AND catalog._js_matrix_sql's DuckDB oracle both embed it (the
# generated-oracle convention — QS_K/MIX_BUDGET_TOKENS/XCORR_MAX_LAG);
# defining it once means neither side can silently desync (r13 advice)
LN2 = 0.6931471805599453


def ws_token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(c), r"\s+"))


def bpe_ish_token_count(c: Column) -> Column:
    """Tokenizer-style count via the BPE-ish regex."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def quality_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: lengths, token counts, mean word
    length, stopword ratio, punctuation ratio."""
    c = F.col(text_col)
    n_ws = ws_token_count(c)
    stop_hits = F.size(
        F.filter(
            F.split(F.lower(F.trim(c)), r"\s+"),
            lambda t: t.isin(*STOPWORDS_EN),
        )
    )
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return docs.where(c.isNotNull()).select(
        "doc_id",
        F.length(c).alias("n_chars_actual"),
        n_ws.alias("n_tokens_ws"),
        bpe_ish_token_count(c).alias("n_tokens_bpe"),
        (
            (F.length(F.regexp_replace(c, r"\s+", "")).cast("double"))
            / n_ws.cast("double")
        ).alias("mean_word_len"),
        (stop_hits.cast("double") / n_ws.cast("double")).alias("stopword_ratio"),
        (n_punct.cast("double") / F.length(c).cast("double")).alias("punct_ratio"),
    )


def lang_scores(c: Column) -> list[Column]:
    cols = []
    for lang, markers in LANG_MARKERS.items():
        toks = F.split(F.lower(F.trim(c)), r"\s+")
        cols.append(
            F.size(F.filter(toks, lambda t: t.isin(*markers))).alias(f"score_{lang}")
        )
    return cols


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: marker-hit score per language, argmax with
    deterministic tie-break on language code; 'und' when no marker hits."""
    scored = docs.where(F.col(text_col).isNotNull()).select(
        "doc_id", "lang", *lang_scores(F.col(text_col))
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:  # first (alphabetical) language achieving the max wins
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
    )


def _max_run_sorted(s: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array == the
    occurrence count of its most frequent element.  One `aggregate` pass
    with (prev, run, best) struct state — O(n) after the O(n log n)
    array_sort, all JVM expressions.  (A distinct×filter counting
    transform is O(n²) interpreted-lambda work per row and measured
    ~100× slower on the sf0.1 corpus — do not regress to it.)"""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def merge(acc, x):
        run = F.when(acc["prev"] == x, acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(s, init, merge, lambda acc: acc["best"])


def _singleton_count_sorted(s: Column) -> Column:
    """Number of elements occurring exactly once in a SORTED array: count
    runs of length 1 in one (prev, run, singles) aggregate pass."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("singles"),
    )

    def merge(acc, x):
        is_new = acc["prev"].isNull() | (acc["prev"] != x)
        singles = acc["singles"] + F.when(is_new & (acc["run"] == 1), 1).otherwise(0)
        run = F.when(is_new, F.lit(1)).otherwise(acc["run"] + 1)
        return F.struct(x.alias("prev"), run.alias("run"), singles.alias("singles"))

    return F.aggregate(
        s, init, merge,
        lambda acc: acc["singles"] + F.when(acc["run"] == 1, 1).otherwise(0),
    )


def _ngrams(toks: Column, n_toks: Column, n: int) -> Column:
    """Consecutive word n-grams of a token array as space-joined strings,
    built from n shifted slices zipped together (empty when the doc has
    fewer than n tokens)."""
    length = F.greatest(n_toks - (n - 1), F.lit(0))
    out = F.slice(toks, 1, length)
    for i in range(2, n + 1):
        out = F.zip_with(
            out, F.slice(toks, i, length), lambda a, b: F.concat_ws(" ", a, b)
        )
    return out


def repetition_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    arXiv:2112.11446 §A1.1 — repetitious documents are low-quality
    pretraining data; the reference has no quality layer at all, its
    closest analog being the noise anti-filters at
    /root/reference/main.py:354-358):

      max_token_frac   — occurrences of the most frequent token / n_tokens
      top_bigram_frac  — occurrences of the most frequent 2-gram / n_bigrams
      dup_trigram_frac — fraction of 3-gram occurrences whose 3-gram
                         appears more than once
      repetitive       — any signal past its Gopher-ish threshold
                         (0.20 / 0.18 / 0.30)

    Token-fraction variants of Gopher's character-fraction metrics: same
    signal, exactly expressible on both engines (the oracle mirrors the
    arithmetic with DuckDB list lambdas).

    Scale design: pure column expressions over the token array — a single
    projection pass, zero shuffle.  Counting is array_sort + one
    run-length `aggregate` pass per metric (O(n log n) per row); for
    corpora of book-length documents cap the scan with slice(toks, 1, K)
    or switch to the explode → groupBy(doc_id, ngram) formulation, which
    trades per-row sort work for one shuffle.
    """
    c = F.col(text_col)
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    n = F.size(toks)
    big = _ngrams(toks, n, 2)
    tri = _ngrams(toks, n, 3)
    n_big = F.size(big)
    n_tri = F.size(tri)
    # duplicated-trigram occurrences = total - singletons
    tri_singletons = _singleton_count_sorted(F.array_sort(tri))
    dbl = lambda x: x.cast("double")  # noqa: E731
    return docs.where(c.isNotNull()).select(
        "doc_id",
        n.alias("n_tokens_ws"),
        (dbl(_max_run_sorted(F.array_sort(toks))) / dbl(n)).alias("max_token_frac"),
        F.when(n_big > 0, dbl(_max_run_sorted(F.array_sort(big))) / dbl(n_big))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(n_tri > 0, dbl(n_tri - tri_singletons) / dbl(n_tri))
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    ).withColumn(
        "repetitive",
        (F.col("max_token_frac") > 0.20)
        | (F.col("top_bigram_frac") > 0.18)
        | (F.col("dup_trigram_frac") > 0.30),
    )


def unigram_lm_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained unigram LM negative log-likelihood per document —
    the unigram tier of the CCNet / KenLM perplexity-bucket quality
    signal (Wenzek et al. 2020): documents of improbable tokens (junk,
    boilerplate codes, wrong-language residue) score high, fluent text
    scores low.  Reference N/A (no LM scoring in /root/reference).

    Returns (id, n_tokens, avg_nll) where
    ``avg_nll = ln(N) - sum(tf·ln(cf)) / n_tokens`` — algebraically
    ``mean(-ln(cf/N))`` over tokens, but with the corpus total N split
    out additively so it can be attached as a broadcast scalar AFTER
    the per-document aggregation instead of joined into the token
    stream.

    Scale shape (100 TB): one tokenize pass -> per-(doc, token) counts
    (map-side combine); corpus frequencies attached by a window over
    token (one shuffle of the tf table, which is already far smaller
    than the corpus); per-doc reduce; the one-row total N is computed
    from the per-DOC frame (n_docs rows, localCheckpointed so its
    lineage is not recomputed for the scalar) and cross-joined back as
    a broadcast.  No token-stream self-join, no driver collect.
    """
    toks = docs.where(F.col(text_col).isNotNull()).select(
        id_col,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "token"
        ),
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    cfw = tf.withColumn(
        "cf", F.sum("tf").over(Window.partitionBy("token"))
    )
    per_doc = (
        cfw.groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(
                F.col("tf") * F.log(F.col("cf").cast("double"))
            ).alias("_s_lncf"),
        )
        .localCheckpoint(eager=False)
    )
    total = per_doc.agg(F.sum("n_tokens").cast("double").alias("_n"))
    return (
        per_doc.crossJoin(F.broadcast(total))
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.log(F.col("_n")) - F.col("_s_lncf") / F.col("n_tokens"), 6
            ).alias("avg_nll"),
        )
        .orderBy(id_col)
    )


def bigram_lm_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram tier of :func:`unigram_lm_scores`: mean negative
    log-likelihood of a doc's token BIGRAMS under the corpus bigram
    distribution — sharper than the unigram tier at spotting scrambled
    or templated text whose individual tokens are common but whose
    transitions are not.  Same plan shape (tf → token-window cf →
    per-doc reduce → broadcast scalar), scoring n−1 bigrams per
    n-token doc; docs with < 2 tokens are excluded (no bigram to
    score)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(toks[i-1], ' ', toks[i]))"
    )
    grams = (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col, toks.alias("toks"))
        .where(F.size("toks") >= 2)
        .select(id_col, F.explode(bigrams).alias("token"))
    )
    tf = grams.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    cfw = tf.withColumn("cf", F.sum("tf").over(Window.partitionBy("token")))
    per_doc = (
        cfw.groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(F.col("tf") * F.log(F.col("cf").cast("double"))).alias("_s"),
        )
        .localCheckpoint(eager=False)
    )
    total = per_doc.agg(F.sum("n_bigrams").cast("double").alias("_n"))
    return (
        per_doc.crossJoin(F.broadcast(total))
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.log(F.col("_n")) - F.col("_s") / F.col("n_bigrams"), 6
            ).alias("avg_nll"),
        )
        .orderBy(id_col)
    )


def lm_quality_buckets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet's perplexity buckets (Wenzek et al. 2020 §4.3): split the
    corpus into head / middle / tail terciles by unigram-LM NLL —
    pipelines keep the head, resample the middle, drop or down-weight
    the tail.  Returns (id, n_tokens, avg_nll, bucket).

    Scale shape: tercile THRESHOLDS come from one exact-percentile
    aggregate over the per-doc score frame (n_docs rows, not tokens)
    and attach as a broadcast scalar — no global ntile sort of the
    corpus; the bucket label is then a scan-stage CASE."""
    scores = unigram_lm_scores(docs, text_col, id_col).localCheckpoint(
        eager=False
    )
    cuts = scores.agg(
        F.expr(
            "percentile(avg_nll, array(0.3333333333333333, "
            "0.6666666666666666))"
        ).alias("_cuts")
    ).select(
        F.col("_cuts")[0].alias("_t1"), F.col("_cuts")[1].alias("_t2")
    )
    return (
        scores.crossJoin(F.broadcast(cuts))
        .select(
            id_col,
            "n_tokens",
            "avg_nll",
            F.when(F.col("avg_nll") <= F.col("_t1"), F.lit("head"))
            .when(F.col("avg_nll") <= F.col("_t2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
        .orderBy(id_col)
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowered text (north-star 'document fingerprinting').  md5 is identical
    across Spark/DuckDB/Python — the portable choice for oracle checks."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.where(F.col(text_col).isNotNull()).select(
        "doc_id", F.md5(norm).alias("fingerprint")
    )


# Fixed linear quality model (fastText-proxy tier).  Every weight and
# cutoff is binary-representable (k/2^m), so the logit is a fixed tree of
# IEEE-exact +,*,/ ops over exact-rational features — bit-identical on
# Spark and DuckDB; only the sigmoid touches libm (exp) and that column
# is rounded.  The feature set mirrors published quality classifiers
# (CCNet / DataComp-LM document-level features): length, stopword
# density, punctuation density, word-length shape.
QUALITY_WEIGHTS = {
    "bias": -0.5,
    "len": 2.0,  # · min(n_tokens, 512)/512  — longer docs score higher
    "stop": 4.0,  # · stopword_ratio          — natural prose marker
    "punct": -8.0,  # · punct_ratio           — symbol soup penalized
    "wordlen": -1.0,  # · |mean_word_len - 4.5| / 4.5 — shape deviation
}
QUALITY_LEN_CAP = 512


def quality_classifier(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document quality classifier: a fixed-weight logistic model over
    the `quality_metrics` features (the deterministic stand-in for a
    trained fastText/linear quality scorer — same serving plan, frozen
    weights).  Returns (doc_id, logit, quality_score, keep) where
    keep ⇔ logit > 0 (an exact-arithmetic comparison: no float-boundary
    flakiness between engines, see QUALITY_WEIGHTS).

    Scale shape: a pure projection over the metrics scan — zero shuffle,
    whole-stage codegen end to end.  At 100 TB this is one map pass;
    swapping in trained weights is a literal change, the plan is
    unchanged."""
    w = QUALITY_WEIGHTS
    m = quality_metrics(docs, text_col)
    len_feat = (
        F.least(F.col("n_tokens_ws"), F.lit(QUALITY_LEN_CAP)).cast("double")
        / F.lit(float(QUALITY_LEN_CAP))
    )
    wordlen_dev = F.abs(F.col("mean_word_len") - F.lit(4.5)) / F.lit(4.5)
    logit = (
        F.lit(w["bias"])
        + F.lit(w["len"]) * len_feat
        + F.lit(w["stop"]) * F.col("stopword_ratio")
        + F.lit(w["punct"]) * F.col("punct_ratio")
        + F.lit(w["wordlen"]) * wordlen_dev
    )
    return (
        m.select(id_col, logit.alias("logit"))
        .select(
            id_col,
            "logit",
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 6
            ).alias("quality_score"),
            (F.col("logit") > 0).alias("keep"),
        )
        .orderBy(id_col)
    )


# C4-style heuristic cleaning rules (Raffel et al. 2020 §2.2, adapted to
# token-level rules because the fixture corpus is single-line).  Marker
# terms use the fixture vocabulary the way C4's "javascript"/"lorem
# ipsum" markers target web boilerplate.
C4_MIN_TOKENS = 12
C4_MAX_TOKENS = 4096
C4_MEAN_WORD_LEN_RANGE = (2.0, 10.0)
C4_MARKER_TERMS = ["lorem", "javascript", "cookie"]
C4_MAX_SYMBOL_RATIO = 0.25


def c4_rule_filter(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4/DataComp rule-based cleaning verdict: per-document boolean for
    each heuristic rule plus the composite keep flag.  All comparisons
    are on exact integers or exact-rational doubles — deterministic
    across engines.  Returns (doc_id, too_short, too_long, bad_word_len,
    has_marker, symbol_heavy, keep).

    Scale shape: pure projection, zero shuffle; rules are scan-stage
    predicates so a downstream `WHERE keep` lets Catalyst push the whole
    verdict into the file scan."""
    c = F.col(text_col)
    toks = F.split(F.trim(c), r"\s+")
    n_tok = F.size(toks)
    mean_wl = (
        F.length(F.regexp_replace(c, r"\s+", "")).cast("double")
        / n_tok.cast("double")
    )
    lowered = F.split(F.lower(F.trim(c)), r"\s+")
    has_marker = F.size(
        F.filter(lowered, lambda t: t.isin(*C4_MARKER_TERMS))
    ) > 0
    n_sym = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    symbol_heavy = (
        n_sym.cast("double") / F.length(c).cast("double")
    ) > F.lit(C4_MAX_SYMBOL_RATIO)
    lo, hi = C4_MEAN_WORD_LEN_RANGE
    verdict = docs.where(c.isNotNull()).select(
        id_col,
        (n_tok < F.lit(C4_MIN_TOKENS)).alias("too_short"),
        (n_tok > F.lit(C4_MAX_TOKENS)).alias("too_long"),
        ((mean_wl < F.lit(lo)) | (mean_wl > F.lit(hi))).alias("bad_word_len"),
        has_marker.alias("has_marker"),
        symbol_heavy.alias("symbol_heavy"),
    )
    return verdict.select(
        "*",
        (
            ~(
                F.col("too_short")
                | F.col("too_long")
                | F.col("bad_word_len")
                | F.col("has_marker")
                | F.col("symbol_heavy")
            )
        ).alias("keep"),
    ).orderBy(id_col)


def kneser_ney_bigram_scores(
    docs: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM scores (Kneser & Ney 1995;
    Chen & Goodman 1999 §2.7) — the standard n-gram smoothing, and the
    upgrade over :func:`bigram_lm_scores`' raw-count model that makes
    unseen-in-context transitions informative instead of −∞:

        P(w2|w1) = max(c(w1w2) − d, 0)/c(w1)
                 + [d·N1+(w1•)/c(w1)] · [N1+(•w2)/N1+(••)]

    with d = `discount` and the continuation probability counting
    DISTINCT predecessors, not raw frequency (the insight that "Francisco"
    is frequent but only ever follows "San").

    Plan shape: the corpus-scale work is ONE bigram explode + the
    per-(doc, bigram) tf aggregate — exactly bigram_lm_scores'
    machinery; everything KN adds operates on the BIGRAM-TYPE table
    (vocab²-bounded): c(w1w2) per type, a groupBy(w1) for context
    totals + distinct-continuation counts, a groupBy(w2) for distinct-
    predecessor counts, and the distinct-type total as a one-row
    broadcast scalar.  Every count is an exact integer, d is a literal,
    and the probability expression is written as the identical
    double-arithmetic tree on both engines; per-doc NLL sums accumulate
    in DECIMAL (order-free), surfaced rounded to 6.

    Returns (id_col, n_bigrams, avg_nll); docs with < 2 tokens are
    excluded (no bigram to score)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    pairs = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
    )
    grams = (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col, toks.alias("toks"))
        .where(F.size("toks") >= 2)
        .select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    tf = grams.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # the bigram-TYPE table feeds four derivations (ctx/cont/nt/prob);
    # without a cut each would re-run the corpus explode + tf shuffle
    # (measured: 5 parquet scans).  localCheckpoint materializes the
    # vocab²-bounded types once — the corpus is scanned exactly twice
    # (once into `big`, once for the scoring join), the
    # cluster_balanced_sample trade: scans parallelize, re-derivations
    # don't.  tf itself is ~corpus-sized and deliberately NOT cut.
    big = (
        tf.groupBy("w1", "w2")
        .agg(F.sum("tf").cast("long").alias("c12"))
        .localCheckpoint(eager=False)
    )
    ctx = big.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).alias("n1f"),
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    nt = big.agg(F.count(F.lit(1)).alias("nt"))
    d = F.lit(float(discount))
    p = (
        F.greatest(F.col("c12").cast("double") - d, F.lit(0.0))
        / F.col("c1").cast("double")
        + (d * F.col("n1f").cast("double") / F.col("c1").cast("double"))
        * (F.col("n1b").cast("double") / F.col("nt").cast("double"))
    )
    prob = (
        big.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nt))
        .select("w1", "w2", p.alias("p"))
    )
    return (
        tf.join(prob, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(
                (F.col("tf") * F.log("p")).cast("decimal(38,18)")
            )
            .cast("double")
            .alias("_s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(-F.col("_s") / F.col("n_bigrams"), 6).alias("avg_nll"),
        )
        .orderBy(id_col)
    )


def kneser_ney_trigram_scores(
    docs: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    derive_bigram_types: bool = False,
) -> DataFrame:
    """Order-3 interpolated Kneser–Ney (Chen & Goodman 1999 eq. 18 —
    the KenLM-default model shape): the trigram layer backs off through
    a CONTINUATION-count bigram layer to the continuation unigram,

        P3(w3|w1w2) = max(c(w1w2w3) − d, 0)/c(w1w2)
                    + [d·N1+(w1w2•)/c(w1w2)] · P2(w3|w2)
        P2(w3|w2)   = max(N1+(•w2w3) − d, 0)/N1+(•w2•)
                    + [d·N1+(w2•)/N1+(•w2•)] · P1(w3)
        P1(w3)      = N1+(•w3) / N1+(••)

    with every N1+ a DISTINCT-TYPE count (trigram types for the middle
    layer, bigram types for the unigram layer) — the lower orders model
    how often a word appears in NEW contexts, not how often it appears.

    Plan shape: corpus-scale work is one trigram explode + per-doc tf
    pass, one bigram-type pass (for the unigram layer), and the scoring
    join — three scans total; the trigram-TYPE table (localCheckpoint,
    vocab³-bounded in principle, corpus-bigram-bounded in practice)
    feeds every KN table so none re-derives the corpus.  All counts are
    exact integers, d is a literal, and the three-layer probability is
    written as the identical double-arithmetic tree on both engines;
    per-doc NLL sums accumulate in DECIMAL.  Docs with < 3 tokens are
    excluded (no trigram to score).

    Returns (id_col, n_trigrams, avg_nll)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tris = F.expr(
        "transform(sequence(2, size(toks) - 1), i -> "
        "struct(toks[i-2] AS w1, toks[i-1] AS w2, toks[i] AS w3))"
    )
    bis = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
    )
    base = docs.where(F.col(text_col).isNotNull()).select(
        id_col, toks.alias("toks")
    )
    tf3 = (
        base.where(F.size("toks") >= 3)
        .select(id_col, F.explode(tris).alias("t"))
        .select(id_col, "t.w1", "t.w2", "t.w3")
        .groupBy(id_col, "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    t3 = (
        tf3.groupBy("w1", "w2", "w3")
        .agg(F.sum("tf").cast("long").alias("c123"))
        .localCheckpoint(eager=False)
    )
    ctx12 = t3.groupBy("w1", "w2").agg(
        F.sum("c123").cast("long").alias("c12"),
        F.count(F.lit(1)).alias("n1f12"),
    )
    mid23 = t3.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("n1p23"))
    mid2 = mid23.groupBy("w2").agg(
        F.sum("n1p23").cast("long").alias("n1p2dot"),
        F.count(F.lit(1)).alias("n1f2"),
    )
    if derive_bigram_types:
        # r11 verdict item 3 A/B arm: the unigram layer's bigram-TYPE
        # table derived from the (already-checkpointed, vocab-bounded)
        # trigram types instead of a third corpus-wide bigram
        # explode+distinct.  Exact identity: in a doc of n >= 3 tokens
        # every bigram position 1..n-2 is some trigram's (w1,w2) prefix
        # and every position 2..n-1 its (w2,w3) suffix, so prefix-types
        # ∪ suffix-types cover all of the doc's bigram types; docs with
        # exactly 2 tokens (no trigram) contribute their single bigram
        # from a cheap residual scan.  Trades the corpus-sized distinct
        # shuffle for two vocab-bounded projections.
        two = base.where(F.size("toks") == 2).select(
            F.col("toks")[0].alias("w1"), F.col("toks")[1].alias("w3")
        )
        bigtypes = (
            t3.select("w1", F.col("w2").alias("w3"))
            .unionByName(t3.select(F.col("w2").alias("w1"), "w3"))
            .unionByName(two)
            .distinct()
            .localCheckpoint(eager=False)
        )
    else:
        bigtypes = (
            base.where(F.size("toks") >= 2)
            .select(F.explode(bis).alias("b"))
            .select("b.w1", F.col("b.w2").alias("w3"))
            .distinct()
            .localCheckpoint(eager=False)
        )
    cont = bigtypes.groupBy("w3").agg(F.count(F.lit(1)).alias("n1b"))
    ntb = bigtypes.agg(F.count(F.lit(1)).alias("ntb"))
    d = F.lit(float(discount))
    p1 = F.col("n1b").cast("double") / F.col("ntb").cast("double")
    p2 = (
        F.greatest(F.col("n1p23").cast("double") - d, F.lit(0.0))
        / F.col("n1p2dot").cast("double")
        + (d * F.col("n1f2").cast("double") / F.col("n1p2dot").cast("double"))
        * p1
    )
    p3 = (
        F.greatest(F.col("c123").cast("double") - d, F.lit(0.0))
        / F.col("c12").cast("double")
        + (d * F.col("n1f12").cast("double") / F.col("c12").cast("double"))
        * p2
    )
    prob = (
        t3.join(ctx12, ["w1", "w2"])
        .join(mid23, ["w2", "w3"])
        .join(mid2, "w2")
        .join(cont, "w3")
        .crossJoin(F.broadcast(ntb))
        .select("w1", "w2", "w3", p3.alias("p"))
    )
    return (
        tf3.join(prob, ["w1", "w2", "w3"])
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_trigrams"),
            F.sum((F.col("tf") * F.log("p")).cast("decimal(38,18)"))
            .cast("double")
            .alias("_s"),
        )
        .select(
            id_col,
            "n_trigrams",
            F.round(-F.col("_s") / F.col("n_trigrams"), 6).alias("avg_nll"),
        )
        .orderBy(id_col)
    )


def corpus_drift_terms(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    top_k: int = 25,
) -> DataFrame:
    """Corpus drift monitor: the top-k unigrams whose add-one-smoothed
    probability moved most between two corpus snapshots, with each
    side's KL contribution — the per-term decomposition of
    KL(P_a || P_b) a training-data pipeline watches between ingestion
    snapshots (vocabulary shifts, source-mix drift, contamination
    bursts all surface here first).

    Smoothing is add-one over the UNION vocabulary (p = (c+1)/(tot+V)),
    so terms absent from one side are defined and heavy one-sided terms
    rank high.  The drift ORDER is computed on exact BIGINT
    DECIMAL(38,0) cross-products — |(c_a+1)(tot_b+V) -
    (c_b+1)(tot_a+V)|, exact past the int64 range — never on
    the float probabilities, so the top-k boundary cannot flip on a
    last-ulp division (the A-ES lesson); the float columns are
    round(9)/round(6) display values both engines compute identically
    (ln matches across engines at 6dp — the Kneser-Ney convention).

    100 TB shape: two token-count aggregates (scan + one shuffle
    each), a full-outer merge on token, three one-row scalars
    broadcast, one TakeOrderedAndProject for the top-k — no global
    sort materialization.  Returns (token, n_a, n_b, p_a, p_b,
    kl_term) ordered by drift.  Reference N/A (no corpus monitoring
    in main.py)."""

    ca = corpus_token_counts(docs_a, text_col).select(
        "token", F.col("n").alias("n_a")
    )
    cb = corpus_token_counts(docs_b, text_col).select(
        "token", F.col("n").alias("n_b")
    )
    return drift_from_counts(ca, cb, top_k)


def corpus_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram occurrence counts (token, n) over the repo's lowercase
    whitespace tokenization — the snapshot state the drift monitor
    compares; also the per-batch increment the STREAMING drift fold
    accumulates (one occurrence = one +1 change row)."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def drift_from_counts(
    ca: DataFrame, cb: DataFrame, top_k: int = 25
) -> DataFrame:
    """The drift report from two (token, count) tables — split out of
    `corpus_drift_terms` so the streaming fold (which maintains the
    counts incrementally) and the batch monitor share one scoring
    path.  ca carries (token, n_a), cb (token, n_b)."""
    merged = ca.join(cb, "token", "full_outer").select(
        "token",
        F.coalesce("n_a", F.lit(0).cast("long")).alias("n_a"),
        F.coalesce("n_b", F.lit(0).cast("long")).alias("n_b"),
    )
    scal = merged.agg(
        F.sum("n_a").alias("tot_a"),
        F.sum("n_b").alias("tot_b"),
        F.count(F.lit(1)).alias("v"),
    )
    p_a = (F.col("n_a") + 1).cast("double") / (F.col("tot_a") + F.col("v"))
    p_b = (F.col("n_b") + 1).cast("double") / (F.col("tot_b") + F.col("v"))
    # DECIMAL(38,0) cross-products: the int64 form overflows once a
    # snapshot passes ~1e9 tokens (n+1 ~ 1e9 times tot+V ~ 1e10) —
    # Spark would wrap silently and DuckDB would raise (r10
    # continuation review finding); DECIMAL keeps the ordering exact
    # at any advertised corpus size
    drift = (F.col("n_a") + 1).cast("decimal(38,0)") * (
        F.col("tot_b") + F.col("v")
    ) - (F.col("n_b") + 1).cast("decimal(38,0)") * (
        F.col("tot_a") + F.col("v")
    )
    return (
        merged.crossJoin(F.broadcast(scal))
        .select(
            "token",
            "n_a",
            "n_b",
            F.round(p_a, 9).alias("p_a"),
            F.round(p_b, 9).alias("p_b"),
            F.round(p_a * F.log(p_a / p_b), 6).alias("kl_term"),
            F.abs(drift).alias("__drift"),
        )
        .orderBy(F.desc("__drift"), "token")
        .limit(top_k)
        .drop("__drift")
    )


NPMI_MIN_SUPPORT = 10  # minimum document frequency for tokens AND pairs


def cooccurrence_npmi(
    docs: DataFrame,
    text_col: str = "text",
    min_support: int = NPMI_MIN_SUPPORT,
) -> DataFrame:
    """Document-level co-occurrence with normalized PMI (Bouma, GSCL
    2009): for every token pair appearing together in >= min_support
    documents,

      npmi(a,b) = ln(p(a,b) / (p(a)·p(b))) / -ln(p(a,b)),

    probabilities over DOCUMENTS (presence, not occurrence counts) —
    the phrase/topic-affinity signal a training-data pipeline mines
    for collocation dictionaries and near-duplicate topic clusters;
    +1 = perfect association, 0 = independence, negative = repulsion.
    The adjacency-free companion to bigram_collocations (which scores
    ADJACENT pairs): here 'deep' and 'learning' associate however far
    apart they sit in the document.

    100 TB shape — the copurchase_lift discipline applied to text:
    the ONLY quadratic stage (the within-document token pair
    self-join) runs AFTER the A-priori downward-closure prune — a
    pair in >= s documents needs each member in >= s documents, so
    tokens below min_support are dropped BEFORE pairing with zero
    loss of qualifying pairs (completeness is what the oracle hash
    proves).  Pair work scales with frequent-token co-presence, not
    vocabulary; the distinct (doc, token) projection collapses
    occurrence counts at the scan.  Exact-integer discipline: all
    counts are BIGINT document frequencies; the two ln calls divide
    BIGINT products and round once at 6dp (the KN/entropy
    convention); the degenerate p(a,b)=1 case (denominator 0) is
    pinned to npmi=1 in both engines.  Returns
    (token_a, token_b, n_a, n_b, n_ab, npmi) for qualifying pairs,
    ordered by pair — a count-thresholded SET, so no rank boundary
    can flip on an ulp."""
    base = docs.where(F.col(text_col).isNotNull())
    toks = (
        base.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    kept = toks.join(
        dfreq.where(F.col("df") >= min_support), "token"
    )
    n_docs = base.select("doc_id").distinct().count()
    a = kept.select(
        "doc_id", F.col("token").alias("token_a"), F.col("df").alias("n_a")
    )
    b = kept.select(
        "doc_id", F.col("token").alias("token_b"), F.col("df").alias("n_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_support)
    )
    n = F.lit(int(n_docs))
    npmi = F.when(F.col("n_ab") == n, F.lit(1.0)).otherwise(
        F.log((F.col("n_ab") * n).cast("double") / (F.col("n_a") * F.col("n_b")))
        / -F.log(F.col("n_ab").cast("double") / n)
    )
    return pairs.select(
        "token_a",
        "token_b",
        "n_a",
        "n_b",
        "n_ab",
        F.round(npmi, 6).alias("npmi"),
    ).orderBy("token_a", "token_b")


CONCENTRATION_TOP_K = 10  # heaviest docs per group in the share metric


def length_concentration(
    docs: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    top_k: int = CONCENTRATION_TOP_K,
) -> DataFrame:
    """Per-group corpus mass concentration: the Gini coefficient of a
    size column plus the share held by the top_k heaviest docs — the
    "is this source dominated by a few giant documents" diagnostic a
    curation pipeline reads before sampling (a high-Gini source needs
    a token-budget cap or per-doc chunking before mixing; the
    source-mixture samplers in operators/curation.py assume roughly
    balanced mass).

    Engine-exactness (the series_acf/assortativity moment discipline):
    with x_(1) <= ... <= x_(n) the ascending sort,

        gini = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)

    — every Σ an exact BIGINT (rank from one ordered window; ties
    share a value, so Σ i·x_(i) is tie-order invariant), then ONE IEEE
    division rounded 9dp; top_k share is a BIGINT sum over the k
    largest divided by the total.  Groups with zero total mass surface
    NULL for both ratios.

    100 TB shape: one per-group window sort (the exact-percentile
    shuffle, paid once) feeding both metrics; everything after is a
    group-sized aggregate.  Returns (group, n_docs, total, gini,
    top_share) deterministically ordered."""
    if top_k < 1:
        raise ValueError("length_concentration: top_k must be >= 1")
    base = docs.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"), F.col(value_col).cast("long").alias("x")
    )
    w = Window.partitionBy("grp").orderBy("x")
    wd = Window.partitionBy("grp").orderBy(F.desc("x"))
    ranked = base.select(
        "grp",
        "x",
        F.row_number().over(w).alias("i"),
        F.row_number().over(wd).alias("j"),
    )
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("i") * F.col("x")).alias("s1"),
        F.sum(F.when(F.col("j") <= top_k, F.col("x")).otherwise(0)).alias(
            "top"
        ),
    )
    n, s = F.col("n"), F.col("s")
    gini = (F.lit(2) * F.col("s1") - (n + 1) * s).cast("double") / (
        n * s
    ).cast("double")
    share = F.col("top").cast("double") / s.cast("double")
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n").alias("n_docs"),
        F.col("s").alias("total"),
        F.when(s > 0, F.round(gini, 9)).alias("gini"),
        F.when(s > 0, F.round(share, 9)).alias("top_share"),
    ).orderBy(group_col)


def _dec18(c: Column) -> Column:
    """DECIMAL(38,18) accumulator cast — the cross-engine contract for
    order-free sums of double terms (the _dot_dec convention); shared
    by zipf_slope and heaps_law so the precision cannot drift apart."""
    return c.cast("decimal(38,18)")


ZIPF_TOP_K = 1000  # rank cutoff for the log-log fit


def zipf_slope(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    top_k: int = ZIPF_TOP_K,
) -> DataFrame:
    """Per-group Zipf rank-frequency slope (Zipf 1949; Piantadosi 2014
    review): OLS of ln(frequency) on ln(rank) over each group's top_k
    word types — the vocabulary-health diagnostic of a training corpus
    (natural language sits near slope −1; scraped boilerplate, spam,
    or tokenizer damage bend the curve), beside length_concentration's
    mass view.

    Determinism: rank is a row_number over (n DESC, token) — the tie
    on counts breaks on the token string, so both engines rank
    identically; ln terms are doubles, and their SUMS accumulate in
    DECIMAL(38,18) (the _dot_dec convention: decimal addition is
    exact and order-free, so a parallel Spark sum and a sequential
    DuckDB sum agree bit-for-bit); the slope/intercept are then a few
    IEEE ops on the exact sums, rounded 6dp.

    100 TB shape: one token count aggregate (map-side combinable), one
    per-group top-k rank window over the TYPE table (vocab-bounded,
    not corpus-bounded), then a group-sized OLS fold.  Groups with
    fewer than 2 kept types have no fit and surface NULLs.  Returns
    (group, n_types, n_tokens, k_used, slope, intercept)."""
    if top_k < 2:
        raise ValueError("zipf_slope: top_k must be >= 2")
    counts = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("n").alias("n_tokens"),
    )
    w = Window.partitionBy("grp").orderBy(F.desc("n"), "token")
    top = counts.select(
        "grp", "n", F.row_number().over(w).alias("r")
    ).where(F.col("r") <= top_k)
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("n").cast("double"))
    fit = top.groupBy("grp").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(_dec18(x)).alias("sx"),
        F.sum(_dec18(y)).alias("sy"),
        F.sum(_dec18(x * y)).alias("sxy"),
        F.sum(_dec18(x * x)).alias("sxx"),
    )
    k = F.col("k").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    den = k * F.col("sxx").cast("double") - sx * sx
    slope = (k * F.col("sxy").cast("double") - sx * sy) / den
    intercept = (sy - slope * sx) / k
    return (
        fit.join(tot, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_types",
            "n_tokens",
            F.col("k").alias("k_used"),
            F.when(F.col("k") >= 2, F.round(slope, 6)).alias("slope"),
            F.when(F.col("k") >= 2, F.round(intercept, 6)).alias(
                "intercept"
            ),
        )
        .orderBy(group_col)
    )


HEAPS_CHECKPOINTS = 10  # prefix checkpoints for the growth fit


def heaps_law(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoints: int = HEAPS_CHECKPOINTS,
) -> DataFrame:
    """Heaps'-law vocabulary growth fit (Heaps 1978; Herdan 1960):
    V(N) ≈ K·N^β — how fast the vocabulary grows as the corpus is
    read in a fixed order — the companion diagnostic to zipf_slope
    (natural text sits at β ≈ 0.4-0.6; β near 1 means unbounded
    novel-token churn — OCR noise, serial numbers, tokenizer damage —
    and β near 0 a closed boilerplate vocabulary).

    The corpus prefix order is doc_id (deterministic on both engines);
    `checkpoints` equal-count doc buckets give the sample points.  The
    trick that keeps it one pass instead of `checkpoints` distinct
    scans: a token joins the vocabulary at its FIRST document —
    min(doc_id) per token — so per-bucket vocabulary increments are a
    group count over that first-occurrence table, and the cumulative
    V_j / N_j curves are window sums over `checkpoints` rows.  The
    log-log OLS runs on DECIMAL(38,18)-accumulated ln sums (the
    zipf_slope/_dot_dec convention), so slope and intercept are
    engine-reproducible at 6dp.

    100 TB shape: one per-doc token-count projection ranked by
    scale.global_rank (range-partitioned local row_number + bounded
    prefix-sum offsets — no unpartitioned WindowExec over the per-doc
    table), one (token -> min doc) aggregate over the TYPE table, one
    `checkpoints`-row fold; nothing is rescanned per checkpoint.  The
    only unpartitioned windows left run over bounded tables (the
    partition-count offsets and the `checkpoints`-row spine cumsum),
    never over facts.  Returns one row per
    checkpoint (ckpt, n_cum, v_cum) with the fitted (beta, ln_k)
    repeated on each row, deterministically ordered."""
    if checkpoints < 2:
        raise ValueError("heaps_law: checkpoints must be >= 2")
    c = checkpoints
    base = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != F.lit(""),
        ).alias("toks"),
    )
    # doc -> checkpoint bucket via the integer rank formula
    # ((rank-1)*c) div n + 1 (identical arithmetic in both engines).
    # The rank itself is scale.global_rank's range-partitioned
    # decomposition, NOT row_number() OVER (ORDER BY doc): the per-doc
    # table is fact-scale (one row per document), and an unpartitioned
    # WindowExec would push every row through a single task at 100 TB
    # (round-12 verdict finding).  doc ids are unique, so the
    # distributed rank is bit-identical to the oracle's global one.
    from . import scale as _scale

    ranked = _scale.global_rank(
        base.select("doc", F.size("toks").alias("n_toks")), "doc"
    )
    nd = ranked.groupBy().agg(F.count(F.lit(1)).alias("nd"))
    bucketed = ranked.crossJoin(F.broadcast(nd)).select(
        "doc",
        "n_toks",
        (
            F.expr("CAST((rnk - 1) AS BIGINT) * "
                   f"{c} div nd") + F.lit(1)
        ).alias("ckpt"),
    )
    occ = bucketed.groupBy("ckpt").agg(
        F.sum("n_toks").alias("n_inc")
    )
    firsts = (
        base.select("doc", F.explode("toks").alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.min("doc").alias("doc"))
        .join(bucketed.select("doc", "ckpt"), "doc")
        .groupBy("ckpt")
        .agg(F.count(F.lit(1)).alias("v_inc"))
    )
    spine = nd.select(
        F.explode(F.sequence(F.lit(1), F.lit(c))).alias("ckpt")
    )
    wc = Window.orderBy("ckpt").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        spine.join(occ, "ckpt", "left")
        .join(firsts, "ckpt", "left")
        .select(
            "ckpt",
            F.sum(F.coalesce("n_inc", F.lit(0).cast("long")))
            .over(wc)
            .alias("n_cum"),
            F.sum(F.coalesce("v_inc", F.lit(0).cast("long")))
            .over(wc)
            .alias("v_cum"),
        )
        .where(F.col("n_cum") > 0)
    )
    # r14 (guide §2.1): `curve` (≤ `checkpoints` rows) feeds BOTH the
    # OLS fit aggregate and the final fit-attach crossJoin — without
    # materialization each consumer re-ran the whole upstream (the
    # corpus token explode + first-occurrence aggregate, the query's
    # dominant stage, executed twice; the audit counted 22 documents
    # scans).  Eager persist+count, not localCheckpoint: truncating
    # lineage here would hide the range-partitioned rank subtree that
    # tests/test_plans.py::test_heaps_rank_window_is_partitioned pins
    # (the 100 TB no-single-task-sort guarantee must stay visible).
    # Lifecycle (see materialize.py): the persist+count runs a job at
    # query-construction time and registers a CacheManager entry the
    # tracker releases; release_materialized() is the consumer seam.
    from .. import materialize as _mat

    curve = _mat.track(curve.persist())
    curve.count()
    x = F.log(F.col("n_cum").cast("double"))
    y = F.log(F.col("v_cum").cast("double"))
    fit = curve.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(_dec18(x)).alias("sx"),
        F.sum(_dec18(y)).alias("sy"),
        F.sum(_dec18(x * y)).alias("sxy"),
        F.sum(_dec18(x * x)).alias("sxx"),
    )
    kk = F.col("k").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    den = kk * F.col("sxx").cast("double") - sx * sx
    beta = (kk * F.col("sxy").cast("double") - sx * sy) / den
    ln_k = (sy - beta * sx) / kk
    return (
        curve.crossJoin(F.broadcast(fit))
        .select(
            "ckpt",
            "n_cum",
            "v_cum",
            F.when(F.col("k") >= 2, F.round(beta, 6)).alias("beta"),
            F.when(F.col("k") >= 2, F.round(ln_k, 6)).alias("ln_k"),
        )
        .orderBy("ckpt")
    )


def vocab_richness(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-richness estimators off the frequency-of-frequencies
    head: Good-Turing unseen mass (Good 1953) and bias-corrected Chao1
    species richness (Chao 1984; Chiu et al. 2014 correction) — the
    "how much vocabulary have we NOT seen yet" companion to
    zipf_slope/heaps_law (a corpus whose unseen mass stays high after
    trillions of tokens is churning junk types; one whose Chao1 ≈ V
    has been read to saturation).

      gt_unseen = n1 / N          (mass of the next token being novel)
      chao1     = V + n1·(n1−1) / (2·(n2+1))   (bias-corrected)

    with N total tokens, V distinct types, n1 singletons, n2
    doubletons.  All four inputs are exact BIGINTs off ONE aggregate
    over the type table; each estimator is a single IEEE division
    (9dp) — no libm, engine-exact by construction.

    100 TB shape: one tokenize projection, one groupBy(token) count
    (map-side combinable), one 4-scalar fold over the type table.
    Returns one row (n_tokens, vocab, singletons, doubletons,
    gt_unseen, chao1); NULL estimators on an empty corpus."""
    toks = docs.where(F.col(text_col).isNotNull()).select(
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("token")
    )
    types = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    agg = types.groupBy().agg(
        F.coalesce(F.sum("c"), F.lit(0).cast("long")).alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.coalesce(
            F.sum(F.when(F.col("c") == 1, 1)), F.lit(0).cast("long")
        ).alias("singletons"),
        F.coalesce(
            F.sum(F.when(F.col("c") == 2, 1)), F.lit(0).cast("long")
        ).alias("doubletons"),
    )
    n1 = F.col("singletons")
    return agg.select(
        "n_tokens",
        "vocab",
        "singletons",
        "doubletons",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                n1.cast("double") / F.col("n_tokens").cast("double"), 9
            ),
        ).alias("gt_unseen"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col("vocab").cast("double")
                + (n1 * (n1 - 1)).cast("double")
                / (F.lit(2.0) * (F.col("doubletons") + 1).cast("double")),
                9,
            ),
        ).alias("chao1"),
    )


DELTA_TOP_K = 30  # function-word panel size for the Delta distance


def style_delta(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = DELTA_TOP_K,
) -> DataFrame:
    """Burrows' Delta stylometric distance between corpus groups
    (Burrows 2002; Evert et al. 2017): over the corpus-wide top-k most
    frequent tokens (the function-word panel — style lives in 'the /
    of / and' rates, not content words), z-score each group's relative
    frequencies against the across-group mean/sd, then Delta(a, b) =
    mean_t |z_at − z_bt| — the duplicated-pipeline detector for
    training mixes (two 'different' sources with near-zero Delta are
    the same crawl wearing two labels; one source drifting from its
    own history is a scraper change).

    Engine-exactness: token counts are exact BIGINTs; relative
    frequencies are one IEEE division each; across-group moments and
    the |z| difference sums accumulate as DECIMAL(38,18) quantized
    terms (order-free); σ uses the population form via the n²-scaled
    identity and one IEEE sqrt.  Zero-variance panel tokens (same
    rate everywhere) are EXCLUDED from the mean — their z is
    undefined — and the per-pair mean divides by the surviving term
    count (mirrored in the oracle).  Output rounded 6dp.

    100 TB shape: one tokenize explode + one (group, token) count
    (map-side combinable) — the only fact-sized work; the panel is a
    vocab-bounded TakeOrdered top-k; everything downstream (z table,
    pair join) is (#groups × k)-bounded.  Returns one row per
    unordered group pair (group_a < group_b, n_terms, delta)."""
    if top_k < 1:
        raise ValueError("style_delta: top_k must be >= 1")
    toks = docs.where(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("token"),
    )
    # r14: materializing this (group, token) table (localCheckpoint)
    # plus the grid below (persist) A/B'd at 1.090 / 1.08 across two
    # independent 3- and 5-trip interleaved runs — a consistent LOSS.
    # The three consumers' recompute is already deduplicated at
    # runtime (ReusedExchange fires for these identical-pruning
    # branches), so the checkpoint only added materialization cost.
    # Rejected; left as the r13 lineage form.
    gt = toks.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("c"))
    # corpus-wide panel: top_k by total count, ties by token — a
    # TakeOrdered over the type table, never a global sort
    panel = (
        gt.groupBy("token")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.desc("tc"), F.asc("token"))
        .limit(top_k)
        .select("token")
    )
    gtot = gt.groupBy("grp").agg(F.sum("c").alias("gn"))
    # restrict the (group, token) table to the panel BEFORE the grid
    # join: gt is vocab x #groups sized at 100 TB, and without this
    # broadcast semi-filter the zero-fill left join would shuffle the
    # whole type table to meet a 600-row grid
    gt_panel = gt.join(F.broadcast(panel), "token")
    # zero-fill: every (group, panel token) cell exists
    grid = (
        gtot.crossJoin(F.broadcast(panel))
        .join(gt_panel, ["grp", "token"], "left")
        .select(
            "grp",
            "token",
            (
                F.coalesce("c", F.lit(0).cast("long")).cast("double")
                / F.col("gn").cast("double")
            ).alias("f"),
        )
    )
    d18 = lambda c: c.cast("decimal(38,18)")  # noqa: E731
    mom = grid.groupBy("token").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(d18(F.col("f"))).alias("s"),
        F.sum(d18(F.col("f") * F.col("f"))).alias("q"),
    )
    kk = F.col("k").cast("double")
    s, q = F.col("s").cast("double"), F.col("q").cast("double")
    var = (kk * q - s * s) / (kk * kk)
    z = grid.join(F.broadcast(mom), "token").where(
        (F.col("k") > 1)
        & ((F.col("k").cast("double") * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")) > 0)
    ).select(
        "grp",
        "token",
        (
            (F.col("f") - s / kk) / F.sqrt(var)
        ).alias("z"),
    )
    a = z.select(
        F.col("grp").alias("group_a"), "token", F.col("z").alias("za")
    )
    b = z.select(
        F.col("grp").alias("group_b"), "token", F.col("z").alias("zb")
    )
    return (
        a.join(b, "token")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(
                F.sum(d18(F.abs(F.col("za") - F.col("zb"))))
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("delta"),
        )
        .orderBy("group_a", "group_b")
    )


def token_js_matrix(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    materialize_counts: bool = False,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between groups' token
    distributions (Lin 1991): the SYMMETRIC, bounded (≤ ln 2)
    companion to the drift ladder's one-directional KL tier — the
    all-pairs mix map a training-data curator reads before setting
    mixture weights (JS near 0 = redundant sources; near ln 2 =
    disjoint vocabularies).

    The identity that keeps it one INNER join instead of a full-outer
    per pair: tokens present in only one side contribute exactly
    ½·P·ln 2, so with S_a = Σ_{t∈A∩B} P_a(t) (the shared mass seen
    from a),

      JS(a,b) = ½ln2·(2 − S_a − S_b)
              + ½·Σ_{t∈A∩B} [P_a·ln(2P_a/(P_a+P_b))
                             + P_b·ln(2P_b/(P_a+P_b))]

    Engine-exactness: the P's are single IEEE divisions of exact
    BIGINTs (bit-identical); each ln term may differ by an ulp of
    libm between engines, so the per-pair sums accumulate as
    DECIMAL(38,18) quantized terms (order-free) and the output rounds
    at 6dp — the accumulated ulp drift is ≤ |vocab|·1.4e-17, orders
    of magnitude under the rounding quantum (the NPMI/KL-ladder
    convention).

    100 TB shape: one tokenize explode + one (group, token) count is
    the only corpus-scale work; the pair join is an equi-join ON
    TOKEN over the group-count table — rows = Σ_t C(groups_with_t, 2)
    ≤ vocab · C(G,2), linear in vocabulary, map-side-combined down to
    G² rows.  Returns (group_a < group_b, n_shared, js) ordered."""
    toks = docs.where(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("token"),
    )
    gt = toks.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("c"))
    if materialize_counts:
        # r15 scale gate (SCALE.md r15 rows): the (group, token) count
        # feeds the group totals AND both renamed sides of the pair
        # join — three differently-pruned consumers, each re-running
        # the tokenize explode when lazy.  At sf0.1 a checkpoint LOSES
        # (r14 paired 1.252, idle cores hide the duplication); at 10x
        # it flips to a WIN (r15 paired 0.863) — the caller derives
        # this flag from the measured input size.  Lifecycle (see
        # materialize.py): construction-time job, executor-only blocks.
        gt = gt.localCheckpoint()
    gtot = gt.groupBy("grp").agg(F.sum("c").alias("gn"))
    p = gt.join(F.broadcast(gtot), "grp").select(
        "grp",
        "token",
        (F.col("c").cast("double") / F.col("gn").cast("double")).alias(
            "p"
        ),
    )
    a = p.select(
        F.col("grp").alias("group_a"), "token", F.col("p").alias("pa")
    )
    b = p.select(
        F.col("grp").alias("group_b"), "token", F.col("p").alias("pb")
    )
    d18 = lambda c: c.cast("decimal(38,18)")  # noqa: E731
    pa, pb = F.col("pa"), F.col("pb")
    shared = (
        a.join(b, "token")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum(d18(pa)).alias("sa"),
            F.sum(d18(pb)).alias("sb"),
            F.sum(
                d18(
                    pa * F.log(F.lit(2.0) * pa / (pa + pb))
                    + pb * F.log(F.lit(2.0) * pb / (pa + pb))
                )
            ).alias("core"),
        )
    )
    # group pairs with NO shared token never appear in the inner join;
    # the G²-bounded pair spine zero-fills them at the exact JS = ln 2
    pairs = (
        gtot.select(F.col("grp").alias("group_a"))
        .crossJoin(gtot.select(F.col("grp").alias("group_b")))
        .where(F.col("group_a") < F.col("group_b"))
    )
    js = (
        F.lit(0.5)
        * F.lit(LN2)  # module constant, shared with the oracle
        * (
            F.lit(2.0)
            - F.coalesce(F.col("sa").cast("double"), F.lit(0.0))
            - F.coalesce(F.col("sb").cast("double"), F.lit(0.0))
        )
        + F.lit(0.5)
        * F.coalesce(F.col("core").cast("double"), F.lit(0.0))
    )
    return (
        pairs.join(shared, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            F.coalesce("n_shared", F.lit(0).cast("long")).alias(
                "n_shared"
            ),
            F.round(js, 6).alias("js"),
        )
        .orderBy("group_a", "group_b")
    )
