"""Unit tests for dedup operators with synthetic duplicates (the fixture
corpus has near-dups but no exact dups, so exact-dedup paths need
hand-built inputs)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

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
    """Each tier is tested against the contract it actually has
    (perfect-recall-by-luck assertions are banned):

    * J=1 pairs (identical shingle sets ⇒ identical signatures ⇒ same
      bands) are NEVER missed — deterministic under ANY hasher;
    * both tiers' output ⊆ exact-Jaccard pairs — deterministic, the
      verify stage computes exact Jaccard;
    * md5 (affine a+i·b seeds, kept for DuckDB-oracle portability) has
      CORRELATED seeds — a shingle minimizing both a and b dominates
      every seed, so recall does not converge to 1 with more bands
      (dedup.py:minhash_signatures caveat).  Contract: recall floor on
      strong (J≥0.9) pairs;
    * xxhash64 (independent seeded hashes) obeys the banding formula:
      at 24 seeds / 8 bands P(miss | J≥0.9) ≈ 1e-5 per pair, so full
      strong recall IS its contract (and deterministic for a fixed
      corpus: no RNG anywhere)."""
    from database_per_keyword_analysis_spark.sources import load

    # handcrafted corpus: pair (1,2) has J=1 — both tiers must emit it
    for hasher in ("md5", "xxhash64"):
        out = {
            (r.doc_a, r.doc_b)
            for r in D.minhash_near_dups(docs, threshold=0.5, hasher=hasher).collect()
        }
        assert (1, 2) in out

    real = load(spark, sf_dir, "documents")
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in D.jaccard_pairs(real, threshold=0.8).collect()}
    strong = {p for p, j in exact.items() if j >= 0.9}
    assert len(strong) >= 10  # floor below isn't vacuous

    for hasher in ("md5", "xxhash64"):
        got = {
            (r.doc_a, r.doc_b)
            for r in D.minhash_near_dups(real, threshold=0.8, hasher=hasher).collect()
        }
        assert got <= set(exact)
        recall = len(strong & got) / len(strong)
        assert recall >= 0.85, f"{hasher} strong recall {recall}"

    # independent seeds at 24/8: full strong recall is a real property
    xx_strong = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_near_dups(
            real, threshold=0.8, n_seeds=24, n_bands=8, hasher="xxhash64"
        ).collect()
    }
    assert xx_strong <= set(exact)
    assert strong <= xx_strong


def test_connected_components_transitive_chain(spark):
    """a~b, b~c, c~d: one component rooted at the min id — the
    transitivity the pair form cannot express; plus two disjoint
    components and an isolated pair."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    out = {r.doc_id: r.group_id for r in D.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_converges_on_long_path(spark):
    # worst case for min-propagation: a path graph; label must walk the
    # full diameter. 0-1-2-...-9 => all labeled 0.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r.group_id for r in D.connected_components(pairs).collect()}
    assert out == {i: 0 for i in range(10)}


def test_connected_components_path_graph_iterations_bounded(spark):
    # adversarial diameter: a 100-node path (diameter 99).  Plain
    # min-propagation would need ~99 shuffle rounds; the pointer-jumping
    # shortcut (active from iteration `shortcut_after`) halves the
    # remaining distance-to-root per round, so the bound is
    # shortcut_after + O(log2 d) + a fixed-point-confirmation round.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r.group_id for r in D.connected_components(pairs).collect()}
    assert out == {i: 0 for i in range(100)}
    iters = D.connected_components.last_iterations
    assert iters <= 12, f"expected O(log d) convergence, took {iters} iterations"


def test_winnowing_pairs_finds_shared_passage(spark):
    """A long passage copied between otherwise-different docs must pair
    via the fingerprint join; whole-doc minhash at 0.8 would miss it."""
    passage = (
        "the quarterly safety inspection checklist requires every valve "
        "flange and gasket to be photographed and logged before restart"
    )
    rows = [
        (1, "unrelated preamble about harvest yields. " + passage),
        (2, passage + " appended notes on a completely different topic here"),
        (3, "totally independent text with no copied passage inside it at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.doc_a, r.doc_b): r for r in D.winnowing_pairs(docs, min_shared=3).collect()}
    assert (1, 2) in out
    assert all(3 not in pair for pair in out)
    assert 0 < out[(1, 2)].overlap <= 1.0


def test_decontamination_finds_planted_leak(spark):
    """A benchmark passage planted inside one corpus doc must surface as
    a (corpus_doc, probe_doc) hit; clean corpus docs must not."""
    bench = (
        "question seven asks the candidate to derive the closed form of "
        "the recurrence and prove its asymptotic growth rate rigorously"
    )
    corpus = spark.createDataFrame(
        [
            (101, "training text that embeds the benchmark: " + bench),
            (102, "entirely clean training document with original content only"),
        ],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame([(9001, bench)], "doc_id long, text string")
    out = D.decontamination_pairs(corpus, probe, min_shared=3).collect()
    assert {(r.corpus_doc, r.probe_doc) for r in out} == {(101, 9001)}
    assert all(r.overlap > 0.5 for r in out)


def test_winnowing_pairs_df_cap_drops_boilerplate(spark):
    """With max_df=1, a fingerprint present in 2+ docs is boilerplate and
    must not generate candidates — the skew guard is observable."""
    text = "identical boilerplate sentence repeated across both documents"
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    assert D.winnowing_pairs(docs, min_shared=1, max_df=1).count() == 0
    assert D.winnowing_pairs(docs, min_shared=1, max_df=None).count() == 1


@settings(max_examples=5, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Differential vs a driver-side union-find on random edge lists:
    the distributed min-propagation must produce exactly the component
    structure, with group_id = min node id of the component."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    expected = {n: min(m for m in parent if find(m) == find(n)) for n in parent}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.group_id for r in D.connected_components(pairs).collect()}
    assert got == expected


def test_dup_groups_keeper_semantics(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (30, 40)], "doc_a long, doc_b long"
    )
    rows = {r.doc_id: r for r in D.dup_groups(pairs).collect()}
    assert rows[5].group_id == 5 and rows[5].dup_rank == 1 and not rows[5].is_duplicate
    assert rows[7].group_id == 5 and rows[7].is_duplicate
    assert rows[9].group_id == 5 and rows[9].is_duplicate
    assert rows[5].group_size == 3 and rows[30].group_size == 2
    assert rows[30].dup_rank == 1 and rows[40].dup_rank == 2


def test_minhash_dup_groups_end_to_end(docs):
    """docs 1,2,3 are mutual near-dups (J>=0.5) => one group kept by 1;
    doc 4 shares nothing, doc 5 is NULL: neither appears."""
    out = {r.doc_id: r for r in D.minhash_dup_groups(docs, threshold=0.5).collect()}
    assert set(out) == {1, 2, 3}
    assert all(r.group_id == 1 for r in out.values())
    assert not out[1].is_duplicate and out[2].is_duplicate and out[3].is_duplicate


# ---------------------------------------------------------------------------
# C4-style line-level boilerplate dedup
# ---------------------------------------------------------------------------


def test_token_line_chunks_with_remainder(spark):
    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    out = df.select(D.token_line_chunks("text", 3).alias("lines")).first().lines
    assert out == ["a b c", "d e f", "g"]


def test_line_dedup_removes_shared_lines_preserves_order(spark):
    from pyspark.sql import functions as F
    import hashlib

    rows = [
        (1, ["intro one", "COOKIE BANNER", "body alpha"]),
        (2, ["COOKIE BANNER", "body beta"]),
        (3, ["body gamma", "unique line"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {r.doc_id: r for r in D.line_dedup(docs).collect()}
    # "COOKIE BANNER" appears in docs 1 and 2 -> boilerplate, removed
    assert (out[1].n_lines, out[1].n_kept, out[1].n_removed) == (3, 2, 1)
    assert (out[2].n_lines, out[2].n_kept, out[2].n_removed) == (2, 1, 1)
    assert (out[3].n_lines, out[3].n_kept, out[3].n_removed) == (2, 2, 0)
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1].clean_md5 == md5("intro one\nbody alpha")  # original order
    assert out[3].clean_md5 == md5("body gamma\nunique line")


def test_line_dedup_fully_boilerplate_doc_keeps_row(spark):
    import hashlib

    rows = [(1, ["x y"]), (2, ["x y"]), (3, ["x y", "own line"])]
    docs = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {r.doc_id: r for r in D.line_dedup(docs).collect()}
    assert out[1].n_kept == 0 and out[1].n_removed == 1
    assert out[1].clean_md5 == hashlib.md5(b"").hexdigest()
    assert out[3].n_kept == 1


def test_line_dedup_min_docs_threshold(spark):
    rows = [(1, ["shared"]), (2, ["shared"]), (3, ["other"])]
    docs = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    strict = {r.doc_id: r.n_removed for r in D.line_dedup(docs, min_docs=3).collect()}
    assert strict == {1: 0, 2: 0, 3: 0}  # needs 3 distinct docs, only 2 share


def test_line_dedup_repeat_within_one_doc_not_boilerplate(spark):
    # min_docs counts DISTINCT documents: a line repeated inside a single
    # doc is repetition (the Gopher metrics' business), not boilerplate
    rows = [(1, ["dup", "dup", "solo"]), (2, ["other"])]
    docs = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {r.doc_id: r for r in D.line_dedup(docs).collect()}
    assert out[1].n_removed == 0 and out[1].n_kept == 3


@settings(max_examples=5, deadline=None)
@given(
    corpora=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                 min_size=1, max_size=6),
        min_size=2,
        max_size=8,
    )
)
def test_line_dedup_matches_python_reference(spark, corpora):
    """Differential vs a driver-side pure-Python implementation on
    random small corpora drawn from a 5-line vocabulary (guaranteeing
    cross-doc collisions): counts and reconstruction hashes must agree
    exactly."""
    import hashlib
    from collections import defaultdict

    docs = [(i, lines) for i, lines in enumerate(corpora)]
    line_docs = defaultdict(set)
    for i, lines in docs:
        for ln in lines:
            line_docs[ln].add(i)
    boiler = {ln for ln, ds in line_docs.items() if len(ds) >= 2}
    expected = {}
    for i, lines in docs:
        kept = [ln for ln in lines if ln not in boiler]
        expected[i] = (
            len(lines),
            len(kept),
            len(lines) - len(kept),
            hashlib.md5("\n".join(kept).encode()).hexdigest(),
        )

    df = spark.createDataFrame(docs, "doc_id long, lines array<string>")
    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.n_removed, r.clean_md5)
        for r in D.line_dedup(df).collect()
    }
    assert got == expected


def test_line_dedup_clean_returns_cleaned_lines(spark):
    rows = [
        (1, ["keep one", "SHARED", "keep two"]),
        (2, ["SHARED", "other"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {r.doc_id: r.clean_lines for r in D.line_dedup_clean(docs).collect()}
    assert out[1] == ["keep one", "keep two"]
    assert out[2] == ["other"]


def test_apply_decontamination_drops_leaked_doc(spark):
    passage = "the quick brown fox jumps over the lazy dog and keeps running fast"
    corpus = spark.createDataFrame(
        [
            (1, passage + " extra tail words here"),
            (2, "completely unrelated training document about databases"),
        ],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame([(100, passage)], "doc_id long, text string")
    kept = D.apply_decontamination(
        corpus, probe, min_overlap=0.3, min_shared=2, max_df=None
    )
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {2}  # the leaked doc is gone, columns intact
    assert set(kept.columns) == {"doc_id", "text"}


def test_winnowing_pairs_persisted_index_reused_and_equal(spark, tmp_path):
    """index_path semantics: first call builds the parquet index, the
    second call REUSES it (no rebuild — mtime of _SUCCESS unchanged),
    and both match the checkpoint-path results exactly."""
    import os

    passage = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, passage + " tail one"),
        (2, passage + " other tail"),
        (3, "unrelated words entirely different from the shared passage"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "winnow_idx")

    base = sorted(tuple(r) for r in D.winnowing_pairs(docs, min_shared=2).collect())
    first = sorted(
        tuple(r) for r in D.winnowing_pairs(docs, min_shared=2, index_path=idx).collect()
    )
    stamp = os.path.getmtime(os.path.join(idx, "_SUCCESS"))
    second = sorted(
        tuple(r) for r in D.winnowing_pairs(docs, min_shared=2, index_path=idx).collect()
    )
    assert first == base == second
    assert os.path.getmtime(os.path.join(idx, "_SUCCESS")) == stamp  # no rebuild


def test_incremental_exact_dedup_against_index(spark, tmp_path):
    idx = str(tmp_path / "fp_idx")
    corpus = spark.createDataFrame(
        [(1, "known document one"), (2, "known document two")],
        "doc_id long, text string",
    )
    D.build_fingerprint_index(corpus, idx)
    batch = spark.createDataFrame(
        [
            (10, "Known  Document one"),   # dup of indexed 1 (normalized)
            (11, "a brand new document"),  # novel
            (12, "a brand new document"),  # in-batch dup of 11
            (13, "another novel one"),     # novel
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in D.incremental_exact_dedup(batch, idx).collect()}
    assert out[10].is_duplicate and out[10].dup_of == 1
    assert not out[11].is_duplicate and out[11].dup_of is None
    assert out[12].is_duplicate and out[12].dup_of == 11
    assert not out[13].is_duplicate and out[13].dup_of is None


def test_duplicated_spans_merges_maximal(spark):
    # docs 1/2 share a 10-token passage at different offsets; with
    # width=8 that is 3 overlapping duplicated windows -> ONE span each
    shared = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [
            (1, shared + " unique1 tail here"),
            (2, "pre pre2 " + shared + " post"),
            (3, "totally different tokens with no overlap at all ok"),
        ],
        ["doc_id", "text"],
    )
    out = D.duplicated_spans(df).collect()
    got = {(r.doc_id): (r.span_start, r.span_end, r.span_tokens, r.n_windows) for r in out}
    assert got == {1: (1, 10, 10, 3), 2: (3, 12, 10, 3)}


def test_duplicated_spans_disjoint_islands(spark):
    # two shared 8-token passages separated by unique middles -> two
    # spans per doc, not one merged blob
    p1 = "q w e r t y u i"
    p2 = "z x c v b n m l"
    df = spark.createDataFrame(
        [
            (1, p1 + " mid1 mid2 mid3 " + p2),
            (2, p1 + " other filler words here " + p2),
        ],
        ["doc_id", "text"],
    )
    out = D.duplicated_spans(df).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert per_doc[1] == [(1, 8), (12, 19)]
    assert per_doc[2] == [(1, 8), (13, 20)]


def test_duplicated_spans_ignores_within_doc_repeats(spark):
    # a doc repeating ITS OWN passage is not cross-doc duplication
    p = "r1 r2 r3 r4 r5 r6 r7 r8"
    df = spark.createDataFrame(
        [(1, p + " " + p), (2, "nothing shared with that doc at all ok here")],
        ["doc_id", "text"],
    )
    assert D.duplicated_spans(df).count() == 0


def test_remove_duplicated_spans_round_trip(spark):
    shared = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [
            (1, shared + " unique1 tail here"),
            (2, "pre pre2 " + shared + " post"),
            (3, "totally different tokens with no overlap at all ok"),
            (4, shared),  # fully duplicated -> empty -> dropped
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in D.remove_duplicated_spans(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].clean_text == "unique1 tail here"
    assert out[2].clean_text == "pre pre2 post"
    assert out[1].n_removed == 10 and out[2].n_removed == 10
    assert out[3].clean_text.startswith("totally different")
    assert out[3].n_removed == 0


def test_fuzzy_string_pairs_blocking_and_verify(spark):
    rows = [
        (1, "johnathan smith"),
        (2, "jonathan smith"),    # ed=1 from 1, shares rare grams
        (3, "jonathan smyth"),    # ed=1 from 2, ed=2 from 1
        (4, "completely other"),  # no rare gram shared, far anyway
        (5, "xy"),                # shorter than q: excluded entirely
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = {
        (r.id_a, r.id_b): r.edit_dist
        for r in D.fuzzy_string_pairs(df, "id", "name", max_ed=1).collect()
    }
    assert (1, 2) in out and out[(1, 2)] == 1
    assert (2, 3) in out and out[(2, 3)] == 1
    assert (1, 3) not in out  # ed=2 > max_ed: verify stage filters it
    assert not any(4 in p or 5 in p for p in out)


def test_fuzzy_string_pairs_df_cap_drops_boilerplate_grams(spark):
    # every name shares the 'aaa' boilerplate; with max_df below the
    # corpus size those grams cannot form candidates, so only the pair
    # sharing a RARE gram ('bcd'/'cde' in ids 1-2) survives blocking
    rows = [(i, "aaaaa") for i in range(1, 10)] + [
        (100, "aabcde"),
        (101, "aabcdf"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = D.fuzzy_string_pairs(df, "id", "name", max_df=5, max_ed=1).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(100, 101)}


def test_edit_distance_pairs_complete_matches_brute_force(spark):
    """Round-9 completeness contract (Bocek et al. 2007): the
    deletion-neighborhood join finds EVERY pair within max_ed —
    including exact duplicates (distance 0), insert/delete/substitute
    neighbors, and the empty string — at k=1 and k=2."""
    import itertools

    import duckdb

    from database_per_keyword_analysis_spark.operators import dedup as D

    rows = [
        (1, "kitten"), (2, "sitten"), (3, "kitten"), (4, "kittens"),
        (5, "mitten"), (6, "xyz"), (7, "kiten"), (8, ""), (9, "a"),
        (10, "ab"), (11, "sittin"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    con = duckdb.connect()

    def brute(k):
        out = set()
        for (ia, na), (ib, nb) in itertools.combinations(rows, 2):
            d = con.execute("select levenshtein(?,?)", [na, nb]).fetchone()[0]
            if d <= k:
                out.add((ia, ib, na, nb, d))
        return out

    for k in (1, 2):
        got = {
            tuple(r)
            for r in D.edit_distance_pairs_complete(df, "id", "name", k).collect()
        }
        assert got == brute(k), f"k={k}"


def test_incremental_near_dups_equals_full_rerun(spark, tmp_path):
    """Round-10 ingest near-dup contract: probing the persisted band
    index with only the batch's keys yields EXACTLY the pairs the
    full minhash pipeline over corpus ∪ batch finds that involve the
    batch — both batch-vs-corpus and batch-vs-batch — and appending
    the batch's bands keeps the index current for the next batch
    (retried appends harmless: candidates are DISTINCT'd)."""
    rows = []
    # corpus: 30 distinct docs; batch: near-dups of some corpus docs,
    # one batch-internal near-dup pair, and novel docs
    for i in range(30):
        rows.append((i * 2 + 1, " ".join(f"c{i}w{j}" for j in range(20))))
    corpus_rows = list(rows)
    batch_rows = [
        # near-dup of corpus doc 1 (one word changed)
        (100, " ".join(("cX" if j == 19 else f"c0w{j}") for j in range(20))),
        # batch-internal near-dup pair
        (102, " ".join(f"b1w{j}" for j in range(20))),
        (104, " ".join(("bY" if j == 0 else f"b1w{j}") for j in range(20))),
        # novel
        (106, " ".join(f"n6w{j}" for j in range(20))),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    idx = str(tmp_path / "bands")
    D.build_minhash_band_index(corpus, idx, n_seeds=24, n_bands=12, hasher="xxhash64")
    got = sorted(
        (r.doc_a, r.doc_b, round(r.jaccard, 6))
        for r in D.incremental_near_dups(
            batch, corpus, idx, threshold=0.5, n_seeds=24, n_bands=12,
            hasher="xxhash64",
        ).collect()
    )
    full = D.minhash_near_dups(
        corpus.unionByName(batch), threshold=0.5, n_seeds=24, n_bands=12,
        hasher="xxhash64",
    )
    batch_ids = {r[0] for r in batch_rows}
    want = sorted(
        (r.doc_a, r.doc_b, round(r.jaccard, 6))
        for r in full.collect()
        if r.doc_a in batch_ids or r.doc_b in batch_ids
    )
    assert got == want
    assert len(got) >= 2  # the planted cross pair + the internal pair
    # append the batch's bands; a second batch near-dupping doc 100
    # must now find it through the index
    D.build_minhash_band_index(
        batch, str(tmp_path / "delta"), n_seeds=24, n_bands=12,
        hasher="xxhash64",
    )
    import shutil
    for f in __import__("os").listdir(str(tmp_path / "delta")):
        if f.endswith(".parquet"):
            shutil.copy(
                str(tmp_path / "delta" / f), str(tmp_path / "bands" / ("d_" + f))
            )
    batch2 = spark.createDataFrame(
        [(200, " ".join(("cZ" if j == 3 else f"c0w{j}") for j in range(20)))],
        "doc_id long, text string",
    )
    got2 = {
        (r.doc_a, r.doc_b)
        for r in D.incremental_near_dups(
            batch2,
            corpus.unionByName(batch),
            idx,
            threshold=0.5,
            n_seeds=24,
            n_bands=12,
            hasher="xxhash64",
        ).collect()
    }
    assert (100, 200) in got2 and (1, 200) in got2


def test_incremental_near_dups_raises_on_stale_index_rows(spark, tmp_path):
    """r10 verdict item 2 (band-index lifecycle): the index is
    insert-only — a doc deleted from the corpus AFTER indexing leaves
    stale band rows, and when one surfaces as a candidate the probe
    must FAIL LOUD (mirroring zone_map_append's r10 hardening), not
    silently under-report pairs.  Candidates that never touch the
    deleted doc keep working."""
    import pytest as _pytest

    mk = lambda i, p: (i, " ".join(f"{p}w{j}" for j in range(20)))
    corpus = spark.createDataFrame(
        [mk(1, "a"), mk(3, "b"), mk(5, "c")], "doc_id long, text string"
    )
    idx = str(tmp_path / "bands")
    D.build_minhash_band_index(corpus, idx, n_seeds=24, n_bands=12, hasher="xxhash64")
    # doc 3 deleted after indexing
    pruned = corpus.where("doc_id <> 3")
    near3 = spark.createDataFrame(
        [(100, " ".join(("X" if j == 0 else f"bw{j}") for j in range(20)))],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="insert-only"):
        D.incremental_near_dups(
            near3, pruned, idx, threshold=0.5, n_seeds=24, n_bands=12,
            hasher="xxhash64",
        ).collect()
    # a batch whose candidates avoid the stale row still verifies
    near1 = spark.createDataFrame(
        [(102, " ".join(("X" if j == 0 else f"aw{j}") for j in range(20)))],
        "doc_id long, text string",
    )
    ok = {
        (r.doc_a, r.doc_b)
        for r in D.incremental_near_dups(
            near1, pruned, idx, threshold=0.5, n_seeds=24, n_bands=12,
            hasher="xxhash64",
        ).collect()
    }
    assert ok == {(1, 102)}


def test_jaccard_pairs_complete_matches_brute_force(spark):
    """Round-10 completeness contract (prefix filtering; Chaudhuri et
    al. ICDE'06 / Bayardo et al. WWW'07): the prefix-filtered join
    finds EVERY pair with shingle-Jaccard >= t — including exact
    duplicates (J = 1), boundary pairs at exactly t, and docs too
    short to shingle (excluded on both sides) — across thresholds."""
    from database_per_keyword_analysis_spark.operators import dedup as D

    base = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, base),
        (2, base),  # exact dup: J = 1.0
        (3, base.replace("w11", "zz")),  # near dup
        (4, " ".join(f"w{i}" for i in range(6))),  # prefix subset
        (5, "alpha beta gamma delta"),  # unrelated
        (6, "alpha beta gamma delta epsilon"),  # J = 2/5 exactly vs 5
        (7, "too short"),  # < 3 tokens: no shingles, never pairs
        (8, None),  # null text dropped
        (9, "one two three"),  # single shingle
        (10, "one two three"),  # its exact dup: J = 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.3, 0.4, 0.5, 0.8, 1.0):
        brute = sorted(
            tuple(r)
            for r in D.jaccard_pairs(df, threshold=t, max_rows=None).collect()
        )
        got = sorted(
            tuple(r) for r in D.jaccard_pairs_complete(df, threshold=t).collect()
        )
        assert got == brute, f"t={t}"
    # the J = 2/5 boundary pair (4,6)-style check: ids 5 & 6 share 2 of
    # their 3+2=5 distinct shingles? compute once at the exact ratio
    out = {(r.doc_a, r.doc_b) for r in D.jaccard_pairs_complete(df, threshold=0.4).collect()}
    assert (9, 10) in out and (1, 2) in out


def test_jaccard_pairs_complete_prefix_is_shorter_than_set(spark):
    """The scale claim: prefixes actually shrink the join input — at
    t = 0.8 a doc's exploded prefix rows are |x| - ceil(0.8|x|) + 1,
    about a fifth of its shingles, never the full set."""
    from pyspark.sql import functions as F

    from database_per_keyword_analysis_spark.operators import dedup as D

    rows = [(i, " ".join(f"d{i}w{j}" for j in range(22))) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = D.shingles(df, "text", 3)
    n_sh = sh.count()  # 8 docs x 20 shingles
    # replicate the operator's prefix stage row count via its internals:
    out = D.jaccard_pairs_complete(df, threshold=0.8)
    out.collect()
    # 20 shingles -> prefix 20 - 16 + 1 = 5 per doc
    assert n_sh == 8 * 20
    # distinct docs share no shingles: no candidates, no pairs
    assert out.count() == 0


def test_containment_pairs_complete_matches_brute_force(spark):
    """r10 asymmetric-containment contracts: a strict subset document
    scores containment 1.0 toward its superset (but not vice versa —
    the relation Jaccard misses), brute-force equality across
    thresholds, and short/null docs drop out on both sides."""
    from database_per_keyword_analysis_spark.operators import dedup as D

    base = " ".join(f"w{i}" for i in range(12))  # 10 shingles
    sub = " ".join(f"w{i}" for i in range(6))  # 4 shingles, all in base
    rows = [
        (1, base),
        (2, sub),
        (3, "alpha beta gamma delta"),
        (4, None),
        (5, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.doc_sub, r.doc_super): r.containment
        for r in D.containment_pairs_complete(df, threshold=0.9).collect()
    }
    assert out == {(2, 1): 1.0}  # sub ⊂ base; the reverse is 4/10
    # at a low threshold the reverse direction appears with its ratio
    lo = {
        (r.doc_sub, r.doc_super): r.containment
        for r in D.containment_pairs_complete(df, threshold=0.4).collect()
    }
    assert lo == {(2, 1): 1.0, (1, 2): 0.4}
    # brute force equality on the same corpus at several thresholds
    sh = D.shingles(df, "text", 3).collect()
    sets = {}
    for r in sh:
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    for t in (0.3, 0.9, 1.0):
        brute = sorted(
            (a, b, len(sa & sets[b]) / len(sa))
            for a, sa in sets.items()
            for b in sets
            if a != b and len(sa & sets[b]) / len(sa) >= t
        )
        got = sorted(
            tuple(r)
            for r in D.containment_pairs_complete(df, threshold=t).collect()
        )
        assert got == brute, t


def test_customer_linkage_scores_contracts(spark):
    """r10 Fellegi-Sunter contracts on hand-built customers: an
    all-fields-agree near-name pair classifies match, an
    all-disagree pair falls below the weight floor and is dropped,
    and the weight equals the hand-summed field weights."""
    from database_per_keyword_analysis_spark.operators.dedup import (
        LINKAGE_M_U,
        customer_linkage_scores,
        fellegi_sunter_weights,
    )

    rows = [
        # near-identical pair: ED(name)=1, same nation/segment, close balance
        (1, "acme corp", 7, 100.0, "AUTO"),
        (2, "acme korp", 7, 150.0, "AUTO"),
        # name-similar by accident, everything else disagrees
        (3, "beta llc", 1, 100.0, "AUTO"),
        (4, "beta llq", 2, 9000.0, "HOUSE"),
        # unrelated name: never a candidate
        (5, "zzzzzzzzzz", 7, 100.0, "AUTO"),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    out = {(r.id_a, r.id_b): r for r in customer_linkage_scores(df).collect()}
    assert set(out) == {(1, 2)}
    wa_n, _ = fellegi_sunter_weights(*LINKAGE_M_U["nation"])
    wa_s, _ = fellegi_sunter_weights(*LINKAGE_M_U["segment"])
    wa_b, _ = fellegi_sunter_weights(*LINKAGE_M_U["balance"])
    m = out[(1, 2)]
    assert m.weight == round(wa_n + wa_s + wa_b, 6)
    assert m.verdict == "match"
    # lowering the floor readmits the weak pair with its negative weight
    low = {
        (r.id_a, r.id_b): r
        for r in customer_linkage_scores(df, min_weight=-100.0).collect()
    }
    assert (3, 4) in low and low[(3, 4)].verdict == "weak"
    assert low[(3, 4)].weight < 0
