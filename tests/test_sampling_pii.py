"""Unit tests for the round-4 training-pipeline additions: Gopher-style
repetition metrics, PII redaction, stratified / mixture sampling, and
SemDeDup semantic dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_per_keyword_analysis_spark.operators import curation as CUR
from database_per_keyword_analysis_spark.operators import pii as PII
from database_per_keyword_analysis_spark.operators import similarity as SIM
from database_per_keyword_analysis_spark.operators import textquality as TQ


# ---------------------------------------------------------------------------
# repetition_metrics
# ---------------------------------------------------------------------------

def test_repetition_metrics_known_values(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "hello"), (3, "x x x x"), (4, None)],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in TQ.repetition_metrics(docs).collect()}
    assert set(rows) == {1, 2, 3}  # null text dropped
    r1 = rows[1]  # tokens a,b,a,b,c
    assert r1.n_tokens_ws == 5
    assert r1.max_token_frac == pytest.approx(2 / 5)
    # bigrams: 'a b','b a','a b','b c' -> top 2/4
    assert r1.top_bigram_frac == pytest.approx(0.5)
    # trigrams 'a b a','b a b','a b c' all distinct
    assert r1.dup_trigram_frac == 0.0
    assert r1.repetitive  # max_token_frac 0.4 > 0.20
    r2 = rows[2]  # single token: no bigrams/trigrams, fracs defined as 0
    assert (r2.n_tokens_ws, r2.top_bigram_frac, r2.dup_trigram_frac) == (1, 0.0, 0.0)
    assert r2.max_token_frac == 1.0
    r3 = rows[3]  # maximally repetitive
    assert r3.max_token_frac == 1.0
    assert r3.top_bigram_frac == 1.0  # 'x x' ×3 of 3
    assert r3.dup_trigram_frac == 1.0  # 'x x x' ×2, no singletons
    assert r3.repetitive


def test_repetition_metrics_clean_text_not_flagged(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    r = TQ.repetition_metrics(docs).collect()[0]
    assert r.max_token_frac == pytest.approx(0.1)
    assert r.top_bigram_frac == pytest.approx(1 / 9)
    assert r.dup_trigram_frac == 0.0
    assert not r.repetitive


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def test_redact_pii_all_families(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob@x.io or alice.smith@corp.example.org, call 555-1234, host 10.0.0.1"),
            (2, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in PII.redact_pii(docs).collect()}
    r1 = rows[1]
    assert (r1.n_emails, r1.n_phones, r1.n_ips) == (2, 1, 1)
    assert "<EMAIL>" in r1.redacted and "<PHONE>" in r1.redacted and "<IP>" in r1.redacted
    for leaked in ("bob@x.io", "alice.smith@corp.example.org", "555-1234", "10.0.0.1"):
        assert leaked not in r1.redacted
    r2 = rows[2]
    assert (r2.n_emails, r2.n_phones, r2.n_ips) == (0, 0, 0)
    assert r2.redacted == "no pii here at all"  # untouched


def test_redact_pii_counts_audit_original_not_rewritten(spark):
    # the replacement tags must not be re-counted by a later family
    docs = spark.createDataFrame([(1, "a@b.co 555-0000 1.2.3.4")], ["doc_id", "text"])
    r = PII.redact_pii(docs).collect()[0]
    assert (r.n_emails, r.n_phones, r.n_ips) == (1, 1, 1)
    assert r.redacted == "<EMAIL> <PHONE> <IP>"


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------

def _strata_docs(spark):
    rows = [("a", i) for i in range(20)] + [("b", 100 + i) for i in range(3)]
    return spark.createDataFrame(rows, ["source", "doc_id"])


def test_stratified_sample_exact_quota_and_undersized_stratum(spark):
    out = CUR.stratified_sample(_strata_docs(spark), n_per_stratum=4).collect()
    by = {}
    for r in out:
        by.setdefault(r.stratum, []).append(r)
    assert len(by["a"]) == 4  # exact quota
    assert len(by["b"]) == 3  # undersized stratum keeps everything
    assert sorted(r.rk for r in by["a"]) == [1, 2, 3, 4]
    assert sorted(r.rk for r in by["b"]) == [1, 2, 3]


def test_stratified_sample_custom_column_names(spark):
    docs = spark.createDataFrame(
        [("x", i) for i in range(8)], ["grp", "item_id"]
    )
    out = CUR.stratified_sample(
        docs, 2, stratum_col="grp", id_col="item_id"
    ).collect()
    assert len(out) == 2 and all(r.stratum == "x" for r in out)


def test_stratified_sample_prefilter_is_lossless_and_deterministic(spark):
    docs = _strata_docs(spark)
    with_pf = CUR.stratified_sample(docs, 4).collect()
    without_pf = CUR.stratified_sample(docs, 4, prefilter_margin=None).collect()
    assert sorted(map(tuple, with_pf)) == sorted(map(tuple, without_pf))
    again = CUR.stratified_sample(docs, 4).collect()
    assert sorted(map(tuple, with_pf)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# mixture_sample
# ---------------------------------------------------------------------------

def test_mixture_sample_ratios_and_absent_strata(spark):
    rows = (
        [("a", i) for i in range(100)]
        + [("b", 1000)]
        + [("c", 2000 + i) for i in range(10)]
    )
    docs = spark.createDataFrame(rows, ["source", "doc_id"])
    out = CUR.mixture_sample(docs, weights={"a": 0.5, "b": 0.5}, target_docs=4)
    rows = out.collect()
    assert {r.stratum for r in rows} <= {"a", "b"}  # 'c' has no weight -> dropped
    ratios = {r.stratum: r.accept_ratio for r in rows}
    assert ratios.get("a", 0.02) == pytest.approx(2 / 100)
    # undersized stratum: quota 2 > count 1 -> keep all (ratio clamps to 1)
    assert ratios["b"] == 1.0
    assert sum(1 for r in rows if r.stratum == "b") == 1
    for r in rows:
        assert r.u < r.accept_ratio  # the acceptance rule, verbatim


def test_mixture_sample_is_deterministic(spark):
    docs = spark.createDataFrame([("a", i) for i in range(50)], ["source", "doc_id"])
    a = CUR.mixture_sample(docs, {"a": 1.0}, target_docs=10).collect()
    b = CUR.mixture_sample(docs, {"a": 1.0}, target_docs=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------

def _planted_vectors(spark):
    import random

    rng = random.Random(7)

    def jitter(base, eps):
        return [x + rng.uniform(-eps, eps) for x in base]

    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    e3 = [0.0, 0.0, 1.0, 0.0]
    rows = (
        [(i, jitter(e1, 1e-3)) for i in range(4)]
        + [(10 + i, jitter(e2, 1e-3)) for i in range(3)]
        + [(20, e3)]
    )
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_semantic_dedup_groups_planted_clusters(spark):
    vecs = _planted_vectors(spark)
    out = SIM.semantic_dedup(vecs, threshold=0.99, n_lists=3).collect()
    groups = {}
    for r in out:
        groups.setdefault(r.group_id, set()).add(r.vec_id)
    # the two planted near-identical clusters come out whole; the
    # singleton has no pair and does not appear
    assert sorted(len(g) for g in groups.values()) == [3, 4]
    assert {0, 1, 2, 3} in groups.values()
    assert {10, 11, 12} in groups.values()
    keepers = [r for r in out if not r.is_duplicate]
    assert {r.vec_id for r in keepers} == {0, 10}  # smallest id per group


def test_semantic_dedup_nodes_subset_of_exact_tier(spark, sf_dir):
    from database_per_keyword_analysis_spark.sources import load

    emb = load(spark, sf_dir, "embeddings")
    sem = SIM.semantic_dedup(emb, threshold=0.4, n_lists=4)
    exact_pairs = SIM.cosine_near_dup_pairs(emb, threshold=0.4)
    sem_nodes = {r.vec_id for r in sem.collect()}
    exact_nodes = {r.vec_a for r in exact_pairs.collect()} | {
        r.vec_b for r in exact_pairs.collect()
    }
    # cluster scoping only removes pairs -> node set can only shrink
    assert sem_nodes <= exact_nodes
    if exact_nodes:
        assert len(sem_nodes) / len(exact_nodes) >= 0.5  # recall floor


# ---------------------------------------------------------------------------
# Corpus-trained unigram LM quality scores (CCNet/KenLM tier)
# ---------------------------------------------------------------------------


def test_unigram_lm_known_values(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in TQ.unigram_lm_scores(docs).collect()}
    # corpus: N=5, cf(a)=2, cf(b)=2, cf(c)=1
    n = 5.0
    exp1 = (2 * -math.log(2 / n) + 1 * -math.log(2 / n)) / 3
    exp2 = (1 * -math.log(2 / n) + 1 * -math.log(1 / n)) / 2
    assert out[1].n_tokens == 3 and out[2].n_tokens == 2
    assert abs(out[1].avg_nll - round(exp1, 6)) < 1e-9
    assert abs(out[2].avg_nll - round(exp2, 6)) < 1e-9


def test_unigram_lm_rare_tokens_score_higher(spark):
    # a doc of corpus-rare tokens must score above a doc of common ones
    rows = [(i, "common words common words") for i in range(1, 9)]
    rows.append((99, "zxqv jkwy"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.avg_nll for r in TQ.unigram_lm_scores(docs).collect()}
    assert out[99] > out[1]


def test_unigram_lm_null_text_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, None)], "doc_id long, text string"
    )
    out = TQ.unigram_lm_scores(docs).collect()
    assert [r.doc_id for r in out] == [1]


# ---------------------------------------------------------------------------
# Sequence packing (GPT-style training-batch assembly plan)
# ---------------------------------------------------------------------------


def test_pack_sequences_offsets_and_spans(spark):
    from database_per_keyword_analysis_spark.operators import curation as CUR

    rows = [
        (1, "a b c d", "s1"),        # 4 tokens, offsets 0-3
        (2, "e f g", "s1"),          # 3 tokens, offsets 4-6 -> spans 5-boundary
        (3, "h i", "s1"),            # offsets 7-8
        (10, "x y z", "s2"),         # independent stream restarts at 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in CUR.pack_sequences(docs, seq_len=5).collect()}
    assert (out[1].start_offset, out[1].seq_first, out[1].seq_last) == (0, 0, 0)
    assert not out[1].spans_boundary
    # doc 2 occupies offsets 4..6: starts in seq 0, ends in seq 1
    assert (out[2].start_offset, out[2].seq_first, out[2].seq_last) == (4, 0, 1)
    assert out[2].spans_boundary
    assert (out[3].start_offset, out[3].seq_first, out[3].seq_last) == (7, 1, 1)
    assert (out[10].start_offset, out[10].seq_first) == (0, 0)


def test_pack_sequences_no_token_lost(spark):
    # every stream's last doc ends exactly at the stream's total tokens
    from database_per_keyword_analysis_spark.operators import curation as CUR

    rows = [(i, " ".join(["t"] * (i % 7 + 1)), f"s{i % 3}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = CUR.pack_sequences(docs, seq_len=4).collect()
    by_stream = {}
    for r in out:
        by_stream.setdefault(r.stream, []).append(r)
    for rs in by_stream.values():
        rs.sort(key=lambda r: r.doc_id)
        # offsets are contiguous: each start = previous start + previous len
        acc = 0
        for r in rs:
            assert r.start_offset == acc
            acc += r.n_tokens


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def test_dsir_target_like_docs_score_higher(spark):
    from pyspark.sql import functions as F

    from database_per_keyword_analysis_spark.operators import curation as CUR

    rows = [(i, "alpha beta gamma delta", "en") for i in range(1, 9)]
    rows += [(i, "zork quux blarg frotz", "xx") for i in range(20, 28)]
    rows.append((99, "alpha beta zork quux", "xx"))  # mixed
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r.doc_id: r.log_ratio
        for r in CUR.dsir_weights(docs, docs.where(F.col("lang") == "en")).collect()
    }
    assert out[1] > out[99] > out[20]  # target > mixed > off-target


def test_dsir_deterministic_and_total(spark):
    from pyspark.sql import functions as F

    from database_per_keyword_analysis_spark.operators import curation as CUR

    rows = [(i, f"w{i % 5} w{i % 3}", "en" if i % 2 else "de") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    tgt = docs.where(F.col("lang") == "en")
    a = sorted(tuple(r) for r in CUR.dsir_weights(docs, tgt).collect())
    b = sorted(tuple(r) for r in CUR.dsir_weights(docs, tgt).collect())
    assert a == b
    assert len(a) == 20  # every raw doc scored, target subset or not


def test_bigram_lm_known_values(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "x")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in TQ.bigram_lm_scores(docs).collect()}
    # bigrams: doc1 = [a b, b a, a b], doc2 = [b a]; doc3 has none
    # corpus: N=4, cf("a b")=2, cf("b a")=2
    assert set(out) == {1, 2}
    assert out[1].n_bigrams == 3 and out[2].n_bigrams == 1
    exp = -math.log(2 / 4.0)
    assert abs(out[1].avg_nll - round(exp, 6)) < 1e-9
    assert abs(out[2].avg_nll - round(exp, 6)) < 1e-9


# ---------------------------------------------------------------------------
# Overlapping document chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_overlap_and_coverage(spark):
    from database_per_keyword_analysis_spark.operators import curation as CUR

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(1, 11)))], "doc_id long, text string"
    )
    out = [r.chunk_text for r in CUR.chunk_documents(docs, 6, 2).collect()]
    # stride 4: [t1..t6], [t5..t10] — 2-token overlap, full coverage
    assert out == ["t1 t2 t3 t4 t5 t6", "t5 t6 t7 t8 t9 t10"]


def test_chunk_documents_short_doc_single_chunk(spark):
    from database_per_keyword_analysis_spark.operators import curation as CUR

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = CUR.chunk_documents(docs, 512, 64).collect()
    assert len(out) == 1 and out[0].chunk_text == "a b c" and out[0].n_tokens == 3


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from database_per_keyword_analysis_spark.operators import curation as CUR

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        CUR.chunk_documents(docs, 8, 8)


def test_lm_quality_buckets_terciles(spark):
    rows = [(i, f"common common w{i % 11} w{i % 7} w{i}", "en") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = TQ.lm_quality_buckets(docs).collect()
    counts = {}
    for r in out:
        counts[r.bucket] = counts.get(r.bucket, 0) + 1
    assert set(counts) == {"head", "middle", "tail"}
    # threshold bucketing: equal scores always share a bucket (ties
    # make exact tercile balance impossible — that is the semantics)
    by_score: dict[float, set] = {}
    for r in out:
        by_score.setdefault(r.avg_nll, set()).add(r.bucket)
    assert all(len(b) == 1 for b in by_score.values())
    # buckets are monotone in avg_nll
    order = {"head": 0, "middle": 1, "tail": 2}
    rs = sorted(out, key=lambda r: r.avg_nll)
    assert [order[r.bucket] for r in rs] == sorted(order[r.bucket] for r in rs)


def test_corpus_diff_statuses(spark):
    from database_per_keyword_analysis_spark.operators import curation as CUR

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same  TEXT"), (2, "changed now"), (4, "brand new")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in CUR.corpus_diff(old, new).collect()}
    # fingerprint normalizes case+whitespace -> doc 1 unchanged
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_dsir_resample_keeps_top_fraction(spark):
    from pyspark.sql import functions as F

    from database_per_keyword_analysis_spark.operators import curation as CUR

    rows = [(i, "alpha beta gamma", "en") for i in range(8)]
    rows += [(i, "zork quux blarg", "xx") for i in range(100, 108)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = CUR.dsir_resample(
        docs, docs.where(F.col("lang") == "en"), keep_fraction=0.5
    ).collect()
    ids = {r.doc_id for r in kept}
    assert ids == set(range(8))  # exactly the target-like half survives


def test_weighted_sample_aes_matches_python_reference(spark):
    """Round-9 A-ES contract: the Spark top-k over u^(1/w) selects
    exactly the python-reference weighted sample (same md5 draws), a
    dominant weight is always selected, and zero/NULL weights never
    are."""
    import hashlib
    import math

    from database_per_keyword_analysis_spark.operators import curation as C

    rows = [(i, float(1 + (i % 7) * 10)) for i in range(60)]
    rows += [(100, 1e9), (101, 0.0), (102, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    def u(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) / 2**48

    keyed = sorted(
        ((math.pow(u(i), 1.0 / w), i, w) for i, w in rows if w),
        reverse=True,
    )[:10]
    want = sorted((i, w, round(k, 6)) for k, i, w in keyed)
    got = sorted(
        (r.doc_id, r.w, r.es_key)
        for r in C.weighted_sample_aes(df, 10, "w").collect()
    )
    assert got == want
    ids = {i for i, _, _ in got}
    assert 100 in ids  # the dominant weight is in every 10-sample
    assert 101 not in ids and 102 not in ids


def test_weighted_sample_aes_is_plan_topk_not_global_sort(spark):
    from database_per_keyword_analysis_spark.operators import curation as C

    df = spark.range(1000).selectExpr(
        "id AS doc_id", "CAST(1 + id % 5 AS DOUBLE) AS w"
    )
    plan = (
        C.weighted_sample_aes(df, 10, "w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # per-partition top-k merge


def test_content_safe_split_is_group_atomic(spark):
    """Round-9 contamination guarantee: every copy of a content lands
    in the SAME split (group-atomic by construction), normalization
    unifies whitespace/case variants, and id-hash splitting provably
    lacks the property on the same data (the motivating gap)."""
    from database_per_keyword_analysis_spark.operators import curation as C

    rows = []
    # 40 duplicate families, 5 copies each with distinct ids and
    # whitespace/case variants of the same content
    for g in range(40):
        for c in range(5):
            text = f"The   Quick document {g}" if c % 2 else f"the quick DOCUMENT {g}"
            rows.append((g * 10 + c, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = C.content_safe_split(df).collect()
    by_fp = {}
    for r in out:
        by_fp.setdefault(r.fingerprint, set()).add(r.split)
    assert len(by_fp) == 40  # variants collapse to one group per family
    assert all(len(s) == 1 for s in by_fp.values())  # group-atomic
    assert {r.split for r in out} >= {"train"}  # sane assignment
    # the id-hash split does NOT have the property on the same data
    ids = C.train_test_split(df).collect()
    doc_split = {r.doc_id: r.split for r in ids}
    families = {}
    for g in range(40):
        families.setdefault(g, set()).update(
            doc_split[g * 10 + c] for c in range(5)
        )
    assert any(len(s) > 1 for s in families.values())


def test_content_safe_split_neardup_is_group_atomic_on_planted_neardups(spark):
    """Round-10 (r9 verdict item 4): near-dup-SAFE split — planted
    paraphrase families (word-level edits the exact fingerprint treats
    as distinct content) each land wholly in one split; the EXACT
    content-keyed split provably lacks the property on the same data
    (the Lee et al. 2022 §6 leak this variant closes); singletons keep
    their own id as group key."""
    from database_per_keyword_analysis_spark.operators import curation as C
    from database_per_keyword_analysis_spark.operators import dedup as D

    rows = []
    # 20 near-dup families with DISJOINT vocabularies (cross-family
    # Jaccard 0): 3 copies each, one word changed per copy — high
    # within-family Jaccard, but different exact fingerprints
    for g in range(20):
        toks = [f"w{g}x{i}" for i in range(40)]
        fam = " ".join(toks)
        # boundary-token edits: each touches only 1 of the 38 word
        # 3-shingles, keeping within-family Jaccard ≈ 0.95 (reliably
        # above both the 0.6 threshold and the LSH banding curve)
        rows.append((g * 10, fam))
        rows.append((g * 10 + 1, " ".join([f"w{g}xEDIT"] + toks[1:])))
        rows.append((g * 10 + 2, " ".join(toks[:-1] + [f"w{g}xALT"])))
    # 10 singletons (no near-dups): unique token streams
    for s in range(10):
        rows.append((1000 + s, " ".join(f"tok{s}_{i}" for i in range(25))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # stronger banding (48 seeds, 24 bands × 2 rows) so the planted
    # J≈0.95 edges are all candidates — the invariant under test is
    # group-atomicity of the SPLIT, not the default banding curve
    groups = D.minhash_dup_groups(
        df, threshold=0.6, n_seeds=48, n_bands=24
    ).select("doc_id", "group_id")
    out = C.content_safe_split_neardup(df, groups).collect()
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r.group_id, set()).add(r.split)
    # every family collapsed to one group and one split
    fam_groups = [r.group_id for r in out if r.doc_id < 1000]
    assert len(set(fam_groups)) == 20
    assert all(len(s) == 1 for s in by_group.values())
    # singletons key on their own id
    singles = {r.doc_id: r.group_id for r in out if r.doc_id >= 1000}
    assert singles == {1000 + s: 1000 + s for s in range(10)}
    # the EXACT-fingerprint split does NOT have the property here:
    # paraphrased copies fingerprint differently, so some family
    # straddles splits (the gap this variant closes)
    exact = C.content_safe_split(df).collect()
    fam_splits: dict = {}
    for r in exact:
        if r.doc_id < 1000:
            fam_splits.setdefault(r.doc_id // 10, set()).add(r.split)
    assert any(len(s) > 1 for s in fam_splits.values())
