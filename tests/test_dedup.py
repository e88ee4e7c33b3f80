"""Unit tests for dedup operators with synthetic duplicates (the fixture
corpus has near-dups but no exact dups, so exact-dedup paths need
hand-built inputs)."""

from __future__ import annotations

import pytest

from database_per_keyword_analysis_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    rows = [
        (1, base),
        (2, "The  quick brown fox jumps over the lazy dog again and again today"),  # exact after normalize
        (3, near),  # near-dup of 1
        (4, "completely different words about database engines and sparks"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    out = {r.doc_id: (r.dup_rank, r.is_duplicate) for r in D.exact_duplicates(docs).collect()}
    assert out[1] == (1, False)
    assert out[2] == (2, True)  # whitespace/case-normalized match
    assert out[3] == (1, False)
    assert 5 not in out  # NULL text excluded


def test_shingles_short_text_empty(spark):
    df = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    assert D.shingles(df).count() == 0


def test_jaccard_pairs_finds_near_dup(docs):
    out = D.jaccard_pairs(docs, threshold=0.5).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    assert (1, 2) in pairs  # identical shingle sets -> jaccard 1.0
    assert (1, 3) in pairs  # one word differs at the end
    assert all(p[0] < p[1] for p in pairs)


def test_minhash_candidates_superset_of_high_jaccard(docs):
    """LSH with 4×3 bands must catch jaccard≈1 pairs deterministically."""
    got = {(r.doc_a, r.doc_b) for r in D.minhash_near_dups(docs, threshold=0.5).collect()}
    assert (1, 2) in got
    jac = {(r.doc_a, r.doc_b) for r in D.jaccard_pairs(docs, threshold=0.5).collect()}
    assert got.issubset(jac)  # LSH never invents pairs; verify stage is exact


def test_char_shingles_window_and_guard(spark):
    df = spark.createDataFrame([(1, " ab  cd "), (2, "xy")], "doc_id long, text string")
    out = {r.doc_id: set() for r in df.collect()}
    for r in D.shingles(df, n=3, unit="char").collect():
        out[r.doc_id].add(r.shingle)
    assert out[1] == {"ab ", "b c", " cd"}  # whitespace normalized, 3-char slide
    assert out[2] == set()  # shorter than n -> no shingles, row survives nothing


def test_char_minhash_finds_unsegmented_dup(spark):
    """Unsegmented text (no whitespace — CJK-like, or concatenated ids) is
    a single token, so word shingling yields ZERO shingles and is
    structurally blind; char 8-grams still see it (J≈0.84 here) — the
    case the char unit exists for."""
    base = "thequickbrownfoxjumpsoverthelazydogagainandagaintoday"
    rows = [(1, base), (2, base.replace("today", "tonight")), (3, "unrelatedtextentirelyoverhere")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert D.jaccard_pairs(df, threshold=0.3).count() == 0  # word unit: blind
    got = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_near_dups(df, n=8, threshold=0.6, unit="char").collect()
    }
    assert got == {(1, 2)}


def test_simhash_close_for_near_dups(docs):
    hs = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
    def hamming(a, b):
        return bin(a ^ b).count("1")
    assert hamming(hs[1], hs[2]) <= 1
    assert hamming(hs[1], hs[3]) <= 4
    assert hamming(hs[1], hs[4]) > 4


def test_simhash_pairs(docs):
    got = {(r.doc_a, r.doc_b) for r in D.simhash_pairs(docs, max_hamming=1).collect()}
    assert (1, 2) in got
    assert (1, 4) not in got


def test_simhash_pairs_blocked_parity(docs, spark, sf_dir):
    """Pigeonhole blocking is lossless: blocked output == all-pairs
    output, on the handcrafted fixture AND the sf0.001 documents table
    at two Hamming radii."""
    for max_h in (1, 3):
        allp = sorted(map(tuple, D.simhash_pairs(docs, max_hamming=max_h).collect()))
        blocked = sorted(
            map(tuple, D.simhash_pairs_blocked(docs, max_hamming=max_h).collect())
        )
        assert blocked == allp

    from database_per_keyword_analysis_spark.sources import load

    real = load(spark, sf_dir, "documents")
    allp = sorted(map(tuple, D.simhash_pairs(real, max_hamming=2).collect()))
    blocked = sorted(
        map(tuple, D.simhash_pairs_blocked(real, max_hamming=2).collect())
    )
    assert blocked == allp
    assert len(allp) > 0  # fixture contains near-dups; parity isn't vacuous


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing guarantees: docs sharing a substring of length
    >= k + w - 1 share at least one fingerprint; disjoint texts share
    none; and a doc's fingerprint set is position-invariant under a
    prefix shift of the shared block."""
    shared = "the quick brown fox jumps over the lazy dog near the river"
    df = spark.createDataFrame(
        [
            (1, "PREFIX AAA " + shared + " SUFFIX ONE"),
            (2, "totally different opening text " + shared),
            (3, "no overlap here at all with anything else whatsoever zzz"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: set(r.fps) for r in D.winnowing_fingerprints(df).collect()}
    assert out[1] & out[2]          # shared block => shared fingerprint
    assert not (out[1] & out[3])    # disjoint text => disjoint fps
    assert not (out[2] & out[3])


def test_minhash_xxhash_tier_parity(docs, spark, sf_dir):
    """The xxhash64 fast tier shares the md5 tier's correctness contract:
    output ⊆ exact-Jaccard pairs (the verify stage is exact either way)
    and full recall on strong dups.  Borderline J≈threshold pairs may
    differ between hashers (banding recall < 1 is the documented LSH
    trade-off), so equality is only asserted where recall is 1."""
    from database_per_keyword_analysis_spark.sources import load

    # handcrafted strong dups: identical output
    md5_out = sorted(map(tuple, D.minhash_near_dups(docs, threshold=0.5).collect()))
    xx_out = sorted(
        map(tuple, D.minhash_near_dups(docs, threshold=0.5, hasher="xxhash64").collect())
    )
    assert xx_out == md5_out and len(md5_out) > 0

    # real corpus: both tiers ⊆ exact pairs, and neither misses a J≥0.9 pair
    real = load(spark, sf_dir, "documents")
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in D.jaccard_pairs(real, threshold=0.8).collect()}
    strong = {p for p, j in exact.items() if j >= 0.9}
    for hasher in ("md5", "xxhash64"):
        got = {
            (r.doc_a, r.doc_b)
            for r in D.minhash_near_dups(real, threshold=0.8, hasher=hasher).collect()
        }
        assert got <= set(exact)
        assert strong <= got
