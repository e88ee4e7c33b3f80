"""Golden test for the corpus-curation verdict (operators/curation.py):
a hand-built corpus where every decision branch fires, with expected
outputs reasoned out by hand (the DuckDB differential for the registered
query lives in tests/test_catalog_twins.py)."""

from __future__ import annotations

import pytest

from database_per_keyword_analysis_spark.operators import curation as CUR

_BASE = (
    "steel demand keeps rising across asia while water infrastructure "
    "projects expand and iron ore shipments arrive at ports every single "
    "week bringing fresh supply to regional mills and refineries alike "
    "during the busy spring construction season"
)  # 36 tokens, all 3-gram shingles unique


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, _BASE),                       # keeper of the dup group
        (2, "  " + _BASE.replace("  ", " ") + " "),  # exact after normalize
        (3, _BASE.replace("season", "quarter")),     # near-dup of 1 (J≈0.91)
        (4, "tiny doc with only six tokens"),        # too_short (<20)
        (5, "a completely different report about maritime logistics and "
            "container routing discusses harbor capacity customs clearance "
            "scheduling berth allocation and crane throughput optimization "
            "for the northern corridor trade"),      # clean keep
        (6, None),                                   # NULL: excluded
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_golden_curation_decisions(corpus):
    out = {r.doc_id: r for r in CUR.curate(corpus).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # NULL text never surfaces

    # keeper of the duplicate group survives; copies drop with the
    # highest-precedence reason each
    assert out[1].keep and out[1].drop_reason is None
    assert out[2].drop_reason == "exact_duplicate" and not out[2].keep
    assert out[3].drop_reason == "near_duplicate" and not out[3].keep
    assert out[4].drop_reason == "too_short" and not out[4].keep
    assert out[5].keep and out[5].drop_reason is None

    # flags stay independently auditable alongside the verdict
    assert out[2].exact_dup and not out[1].exact_dup
    assert out[3].near_dup and not out[3].exact_dup
    assert out[4].n_tokens_ws == 6


def test_apply_curation_keeps_only_keepers(corpus):
    verdict = CUR.curate(corpus)
    kept = CUR.apply_curation(corpus, verdict)
    assert kept.columns == corpus.columns
    assert {r.doc_id for r in kept.collect()} == {1, 5}


def test_token_budget_sample_determinism_and_budget(corpus):
    # a budget >= the corpus keeps everything; u is a valid uniform draw
    full = CUR.token_budget_sample(corpus, budget_tokens=10**9).collect()
    assert {r.doc_id for r in full} == {1, 2, 3, 4, 5}
    assert all(0.0 <= r.u < 1.0 for r in full)
    total = sum(r.n_tokens_ws for r in full)
    # threshold p = 0.8: keeps exactly the docs whose deterministic draw
    # is below it (ids 1, 2, 4 on this corpus), a strict non-empty subset
    budget = int(total * 0.8)
    part1 = CUR.token_budget_sample(corpus, budget_tokens=budget).collect()
    part2 = CUR.token_budget_sample(corpus, budget_tokens=budget).collect()
    assert [tuple(r) for r in part1] == [tuple(r) for r in part2]  # deterministic
    kept = {r.doc_id for r in part1}
    assert kept == {r.doc_id for r in full if r.u < budget / total}
    assert 0 < len(kept) < len(full)


def test_precedence_near_dup_beats_too_short(spark):
    # two near-identical SHORT docs: the non-keeper must report
    # near_duplicate (higher precedence), the keeper too_short
    a = "alpha beta gamma delta epsilon zeta"
    rows = [(1, a), (2, a + " eta")]
    out = {
        r.doc_id: r
        for r in CUR.curate(
            spark.createDataFrame(rows, "doc_id long, text string"),
            near_threshold=0.5,
        ).collect()
    }
    assert out[1].drop_reason == "too_short"
    assert out[2].drop_reason == "near_duplicate"


def test_curate_repetition_rule_optional(spark):
    from pyspark.sql import functions as F

    base = " ".join(f"w{i}" for i in range(25))  # 25 distinct tokens
    rep = " ".join(["spam ham"] * 13)  # 26 tokens, all trigrams duplicated
    docs = spark.createDataFrame(
        [(1, base), (2, rep)], ["doc_id", "text"]
    )
    # default: rule off, both docs keep (long enough, clean, no dups)
    off = {r.doc_id: r for r in CUR.curate(docs).collect()}
    assert off[1].keep and off[2].keep
    assert "dup_trigram_frac" not in CUR.curate(docs).columns
    # rule on: the repetitive doc drops with the new lowest-precedence reason
    on = {r.doc_id: r for r in CUR.curate(docs, max_dup_trigram_frac=0.5).collect()}
    assert on[1].keep
    assert not on[2].keep and on[2].drop_reason == "repetitive"
    # precedence: an exact duplicate that is ALSO repetitive reports the dup
    docs2 = spark.createDataFrame(
        [(1, rep), (2, rep)], ["doc_id", "text"]
    )
    d2 = {r.doc_id: r for r in CUR.curate(docs2, max_dup_trigram_frac=0.5).collect()}
    assert d2[2].drop_reason == "exact_duplicate"


def test_mix_allocation_hand_example(spark):
    # r13: supply (a=5, b=3, c=2 tokens), budget 7:
    # shares 3.5/2.1/1.4 -> base 3/2/1 (sum 6), remainders
    # 7*5%10=5, 7*3%10=1, 7*2%10=4 -> the 1 leftover seat goes to a
    rows = [
        (1, "a", "t1 t2 t3 t4 t5"),
        (2, "b", "t1 t2 t3"),
        (3, "c", "t1 t2"),
        (4, None, "ignored"),
        (5, "a", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r.stratum: r
        for r in CUR.mix_allocation(df, budget_tokens=7).collect()
    }
    assert {s: r.n_tokens for s, r in out.items()} == {"a": 5, "b": 3, "c": 2}
    assert {s: r.quota for s, r in out.items()} == {"a": 4, "b": 2, "c": 1}


def test_mix_allocation_quotas_sum_to_budget_exactly(spark, sf_dir):
    from database_per_keyword_analysis_spark.sources import load

    docs = load(spark, sf_dir, "documents")
    for budget in (0, 1, 9_999, 100_000):
        out = CUR.mix_allocation(docs, budget_tokens=budget).collect()
        assert sum(r.quota for r in out) == budget
        assert all(r.quota >= 0 for r in out)
    import pytest as _pt

    with _pt.raises(ValueError):
        CUR.mix_allocation(docs, budget_tokens=-1)


def test_mix_allocation_remainder_tie_breaks_by_stratum(spark):
    # equal supplies, budget not divisible: remainders all tie, the
    # leftover seats go to the ascending-name strata
    rows = [
        (1, "s1", "a b"),
        (2, "s2", "a b"),
        (3, "s3", "a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r.stratum: r.quota
        for r in CUR.mix_allocation(df, budget_tokens=4).collect()
    }
    assert out == {"s1": 2, "s2": 1, "s3": 1}
