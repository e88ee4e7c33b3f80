"""Unit tests for ranked retrieval (BM25), vocabulary coverage, cohort
retention, and event anomaly detection (round-4 additions)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row

from database_per_keyword_analysis_spark.operators import events as E
from database_per_keyword_analysis_spark.operators import search as SRCH


def _bm25_expected(tf, dl, idf, avgdl, k1=1.2, b=0.75):
    return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="hash hash join x"),
            Row(doc_id=2, text="join y z"),
            Row(doc_id=3, text="a b c d"),
            Row(doc_id=4, text=None),
        ]
    )
    out = SRCH.bm25_search(docs, query_terms=("hash", "join"), top_k=10)
    rows = {r.doc_id: r for r in out.collect()}
    # doc 3 matches nothing, doc 4 is null text
    assert set(rows) == {1, 2}
    n_docs, avgdl = 3.0, (4 + 3 + 4) / 3.0
    idf_hash = math.log(1 + (n_docs - 1 + 0.5) / (1 + 0.5))
    idf_join = math.log(1 + (n_docs - 2 + 0.5) / (2 + 0.5))
    exp1 = _bm25_expected(2, 4, idf_hash, avgdl) + _bm25_expected(
        1, 4, idf_join, avgdl
    )
    exp2 = _bm25_expected(1, 3, idf_join, avgdl)
    assert rows[1].n_terms == 2 and rows[2].n_terms == 1
    assert rows[1].score == round(exp1, 6)
    assert rows[2].score == round(exp2, 6)
    # ranked: doc 1 (two matching terms, one rare) above doc 2
    assert [r.doc_id for r in out.collect()] == [1, 2]


def test_bm25_tie_break_is_doc_id(spark):
    # identical docs -> identical scores; the top_k cut must be by id
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="hash join") for i in (5, 3, 9, 1)]
    )
    out = SRCH.bm25_search(docs, query_terms=("hash",), top_k=2)
    assert [r.doc_id for r in out.collect()] == [1, 3]


def test_vocab_coverage_curve(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a a b b c"),
            Row(doc_id=2, text="a b d"),
        ]
    )
    out = SRCH.vocab_coverage(docs, top_n=3).collect()
    # counts: a=4, b=3, c=1, d=1 (total 9); top-3 breaks the c/d tie by token
    assert [(r.rank, r.token, r.cnt) for r in out] == [
        (1, "a", 4),
        (2, "b", 3),
        (3, "c", 1),
    ]
    assert [r.coverage for r in out] == [
        round(4 / 9, 6),
        round(7 / 9, 6),
        round(8 / 9, 6),
    ]
    # coverage is monotone nondecreasing and bounded by 1
    cov = [r.coverage for r in out]
    assert cov == sorted(cov) and cov[-1] <= 1.0


def _ts(day, hour=12):
    return dt.datetime(2024, 1, day, hour)


def test_cohort_retention_hand_computed(spark):
    # 2024-01-01 is a Monday; weeks W0=Jan 1, W1=Jan 8
    events = spark.createDataFrame(
        [
            Row(event_id=1, ts=_ts(1), user_id=1, event_type="view"),
            Row(event_id=2, ts=_ts(9), user_id=1, event_type="view"),
            Row(event_id=3, ts=_ts(2), user_id=2, event_type="view"),
            Row(event_id=4, ts=_ts(8), user_id=3, event_type="view"),
        ]
    )
    out = E.cohort_retention(events).collect()
    w0, w1 = dt.date(2024, 1, 1), dt.date(2024, 1, 8)
    got = {(r.cohort_week, r.week_offset): (r.n_users, r.retention) for r in out}
    # cohort W0: users 1,2 at offset 0; user 1 retained at offset 1
    # cohort W1: user 3 only
    assert got == {
        (w0, 0): (2, 1.0),
        (w0, 1): (1, 0.5),
        (w1, 0): (1, 1.0),
    }


def test_event_anomalies_flags_spike(spark):
    counts = [4, 6, 5, 4, 6, 5, 4, 6, 50]
    rows = []
    eid = 0
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            eid += 1
            rows.append(
                Row(event_id=eid, ts=_ts(day), user_id=1, event_type="view")
            )
    out = E.event_anomalies(spark.createDataFrame(rows)).collect()
    by_day = {r.day.day: r for r in out}
    # first three days: fewer than 3 trailing observations -> NULL
    for d in (1, 2, 3):
        assert by_day[d].zscore is None and by_day[d].is_anomaly is None
    # steady days are not anomalous
    assert by_day[8].is_anomaly is False
    # the spike day z-scores against trailing mean ~5 with small variance
    spike = by_day[9]
    assert spike.is_anomaly is True and spike.zscore > 10
    # hand-check: trailing window = days 2..8
    trail = counts[1:8]
    n = len(trail)
    mean = sum(trail) / n
    var = (sum(c * c for c in trail) - n * mean * mean) / (n - 1)
    assert spike.zscore == round((50 - mean) / math.sqrt(var), 6)


def test_event_anomalies_null_on_zero_variance(spark):
    rows = [
        Row(event_id=i * 10 + j, ts=_ts(i), user_id=1, event_type="view")
        for i in range(1, 9)
        for j in range(3)  # constant 3/day -> zero trailing variance
    ]
    out = E.event_anomalies(spark.createDataFrame(rows)).collect()
    assert all(r.zscore is None and r.is_anomaly is None for r in out[3:])


def test_encode_documents_round_trip(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a b c"),
            Row(doc_id=2, text="b oovword a"),
        ]
    )
    # counts: a=3, b=2, c=1, oovword=1 -> vocab_size=3 keeps a,b,c
    # (c beats oovword on the token tie-break)
    out = {r.doc_id: r for r in SRCH.encode_documents(docs, vocab_size=3).collect()}
    assert out[1].ids == [1, 1, 2, 3] and out[1].n_oov == 0
    assert out[2].ids == [2, 0, 1] and out[2].n_oov == 1
    assert out[2].n_tokens == 3


def test_bm25_probe_matches_in_plan_search(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="hash hash join x"),
            Row(doc_id=2, text="join y z"),
            Row(doc_id=3, text="hash a b c d join"),
        ]
    )
    SRCH.build_postings_index(docs, str(tmp_path / "idx"))
    probe = SRCH.bm25_probe(
        spark, str(tmp_path / "idx"), query_terms=("hash", "join")
    ).collect()
    direct = SRCH.bm25_search(docs, query_terms=("hash", "join")).collect()
    assert sorted(map(tuple, probe)) == sorted(map(tuple, direct))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_postings_update_matches_full_build(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t)
            for i, t in enumerate(
                ["hash join window", "hash hash stream", "join stream x",
                 "window y z hash", "stream stream join hash", "a b c",
                 "hash window", "join join join"]
            )
        ]
    )
    first, second = docs.where("doc_id < 4"), docs.where("doc_id >= 4")
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(first, path)
    SRCH.update_postings_index(second, path)
    probe = SRCH.bm25_probe(spark, path, query_terms=("hash", "join"), top_k=10)
    full = SRCH.bm25_search(docs, query_terms=("hash", "join"), top_k=10)
    assert _rows(probe) == _rows(full)


def test_incremental_update_rejects_existing_ids(spark, tmp_path):
    import pytest as _pytest

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="hash join"), Row(doc_id=2, text="stream")]
    )
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, path)
    with _pytest.raises(ValueError, match="already indexed"):
        SRCH.update_postings_index(docs.where("doc_id = 1"), path)


def test_compaction_preserves_results_plain_and_bucketed(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t)
            for i, t in enumerate(
                ["hash join window", "hash hash stream", "join stream x",
                 "window y z hash", "stream stream join hash"]
            )
        ]
    )
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs.where("doc_id < 3"), path)
    SRCH.update_postings_index(docs.where("doc_id >= 3"), path)
    before = _rows(
        SRCH.bm25_probe(spark, path, query_terms=("hash", "join"), top_k=10)
    )
    SRCH.compact_postings_index(spark, path)  # plain relayout
    import os

    assert not os.path.exists(f"{path}/postings__compact")
    after_plain = _rows(
        SRCH.bm25_probe(spark, path, query_terms=("hash", "join"), top_k=10)
    )
    assert after_plain == before
    SRCH.compact_postings_index(spark, path, n_buckets=4)  # bucketed relayout
    after_bucketed = _rows(
        SRCH.bm25_probe(
            spark, path, query_terms=("hash", "join"), top_k=10, n_buckets=4
        )
    )
    assert after_bucketed == before


def test_streaming_index_maintenance_matches_batch(spark, tmp_path):
    """run_streaming_index over a multi-file doc stream (one file per
    micro-batch) == bm25_search over the union; retries are idempotent;
    compaction converts the streamed layout to the flat base."""
    from database_per_keyword_analysis_spark.streaming import ingest as ING

    texts = ["hash join window", "hash hash stream", "join stream x",
             "window y z hash", "stream stream join hash", "q r s"]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    src = str(tmp_path / "src")
    docs.where("doc_id < 3").coalesce(1).write.mode("append").parquet(src)
    docs.where("doc_id >= 3").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    idx = str(tmp_path / "idx")
    ING.run_streaming_index(stream, idx, str(tmp_path / "ckpt"))
    expected = _rows(SRCH.bm25_search(docs, query_terms=("hash", "join"), top_k=10))
    got = _rows(SRCH.bm25_probe(spark, idx, query_terms=("hash", "join"), top_k=10))
    assert got == expected

    # retry idempotence: re-running a batch id with ITS original input
    # set (read back from the index partition — file-to-batch assignment
    # order is the checkpoint's, not ours to assume) rewrites identical
    # state
    b1_ids = [
        r.doc_id
        for r in spark.read.parquet(f"{idx}/doclens/batch=1").collect()
    ]
    ING.index_batch(docs.where(docs.doc_id.isin(b1_ids)), 1, idx)
    assert _rows(
        SRCH.bm25_probe(spark, idx, query_terms=("hash", "join"), top_k=10)
    ) == expected

    # compact the batch-partitioned layout to the flat base, then a
    # batch-mode incremental append still composes
    SRCH.compact_postings_index(spark, idx)
    assert _rows(
        SRCH.bm25_probe(spark, idx, query_terms=("hash", "join"), top_k=10)
    ) == expected
    more = spark.createDataFrame([Row(doc_id=100, text="hash hash hash")])
    SRCH.update_postings_index(more, idx)
    full = _rows(
        SRCH.bm25_search(
            docs.unionByName(more), query_terms=("hash", "join"), top_k=10
        )
    )
    assert _rows(
        SRCH.bm25_probe(spark, idx, query_terms=("hash", "join"), top_k=10)
    ) == full


def test_hybrid_rrf_hand_computed(spark):
    # round 7: RRF fusion over a corpus small enough to rank by hand
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="hash hash"),
            Row(doc_id=2, text="join"),
            Row(doc_id=3, text="nothing here"),
            Row(doc_id=4, text="hash join"),
        ]
    )
    vecs = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),  # the query vector
            Row(vec_id=1, embedding=[0.0, 1.0]),  # cos 0
            Row(vec_id=2, embedding=[1.0, 0.01]),  # cos ~1
            Row(vec_id=3, embedding=[1.0, 1.0]),  # cos ~.707
            Row(vec_id=4, embedding=[-1.0, 0.0]),  # cos -1
        ]
    )
    out = SRCH.hybrid_search_rrf(
        docs, vecs, query_terms=("hash", "join"), top_k=10
    )
    rows = {r.doc_id: r for r in out.collect()}
    # all 4 docs retrieved by at least one side; query vec_id=0 excluded
    assert sorted(rows) == [1, 2, 3, 4]
    # dense ranking by cosine to [1,0], ties impossible here
    assert [rows[i].dense_rank for i in (2, 3, 1, 4)] == [1, 2, 3, 4]
    # doc 3 matches no query term: NULL sparse rank, dense-only score
    assert rows[3].sparse_rank is None
    # sparse ranking recomputed from the BM25 formula itself
    avgdl, n_docs, df = 7 / 4, 4.0, {"hash": 2.0, "join": 2.0}
    idf = {t: math.log(1 + (n_docs - d + 0.5) / (d + 0.5)) for t, d in df.items()}
    score = {
        1: round(_bm25_expected(2, 2, idf["hash"], avgdl), 6),
        2: round(_bm25_expected(1, 1, idf["join"], avgdl), 6),
        4: round(
            _bm25_expected(1, 2, idf["hash"], avgdl)
            + _bm25_expected(1, 2, idf["join"], avgdl),
            6,
        ),
    }
    for rank, d in enumerate(
        sorted(score, key=lambda d: (-score[d], d)), start=1
    ):
        assert rows[d].sparse_rank == rank
    # the fused score is exactly the RRF sum of the reported ranks
    for r in rows.values():
        exp = round(
            (1.0 / (60 + r.sparse_rank) if r.sparse_rank else 0.0)
            + (1.0 / (60 + r.dense_rank) if r.dense_rank else 0.0),
            6,
        )
        assert abs(r.rrf_score - exp) < 1e-12
    # ordered by fused score desc, doc_id tiebreak
    got = [r.doc_id for r in out.collect()]
    assert got == sorted(
        rows, key=lambda d: (-rows[d].rrf_score, d)
    )


def test_hybrid_rrf_respects_side_and_output_limits(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="hash join " * (i + 1)) for i in range(12)]
    )
    vecs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, float(i)]) for i in range(12)]
    )
    out = SRCH.hybrid_search_rrf(
        docs, vecs, query_terms=("hash",), per_side=3, top_k=4
    ).collect()
    assert len(out) == 4
    for r in out:
        assert r.sparse_rank is None or r.sparse_rank <= 3
        assert r.dense_rank is None or r.dense_rank <= 3


def test_phrase_search_contracts(spark):
    """r10 positional-phrase contracts: consecutive-position matches
    only (scrambled word order and gapped words do NOT match),
    overlapping occurrences each count, case/whitespace normalize,
    empty phrase rejected."""
    import pytest as _pytest

    from database_per_keyword_analysis_spark.operators.search import (
        phrase_search,
    )

    rows = [
        (1, "big data merge big data merge"),  # 2 occurrences
        (2, "data big merge"),  # scrambled: no match
        (3, "big fast data merge"),  # gapped: no match
        (4, "BIG   Data merge"),  # case + runs of whitespace: match
        (5, None),
        (6, "a a a a"),  # overlapping self-phrase below
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.n_occurrences for r in phrase_search(df, "big data merge").collect()}
    assert out == {1: 2, 4: 1}
    # overlapping occurrences: 'a a' appears 3x in 'a a a a'
    out2 = {r.doc_id: r.n_occurrences for r in phrase_search(df, "a a").collect()}
    assert out2[6] == 3
    with _pytest.raises(ValueError):
        phrase_search(df, "   ")


def test_phrase_oracle_sql_is_built_from_the_shared_constant():
    """r10 advice item 4: the DuckDB oracle for phrase_search derives
    its per-position conjuncts from PHRASE_QUERY — editing the phrase
    can never desynchronize plan and oracle."""
    from database_per_keyword_analysis_spark.catalog import (
        PHRASE_QUERY,
        _phrase_oracle_sql,
        oracle_sql,
    )

    assert oracle_sql()["phrase_search"] == _phrase_oracle_sql(PHRASE_QUERY)
    sql = _phrase_oracle_sql("alpha beta")
    assert "t[i] = 'alpha' AND t[i+1] = 'beta'" in sql
    assert "len(t) - 1" in sql  # k-1 window bound for a 2-term phrase
    # and the registered phrase's own terms appear positionally
    live = _phrase_oracle_sql(PHRASE_QUERY)
    for k, term in enumerate(PHRASE_QUERY.split()):
        assert (f"t[i+{k}] = '{term}'" if k else f"t[i] = '{term}'") in live


def test_boolean_search_contracts(spark):
    """r11 boolean retrieval contracts: AND requires every must term,
    OR requires at least one any_of (with the match count reported),
    NOT excludes, term repetition within a doc counts once, and the
    validation rejects empty/contradictory queries."""
    import pytest as _pytest

    from database_per_keyword_analysis_spark.operators.search import (
        boolean_search,
    )

    rows = [
        (1, "data stream hash"),          # must+any: match, n_any 1
        (2, "data stream hash table"),    # n_any 2
        (3, "data hash table"),           # missing 'stream': out
        (4, "data stream hash batch"),    # NOT term present: out
        (5, "data stream data stream"),   # no any_of term: out
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.n_any
        for r in boolean_search(
            df, ("data", "stream"), ("hash", "table"), ("batch",)
        ).collect()
    }
    assert out == {1: 1, 2: 2}
    # no any_of: pure AND NOT, n_any pinned to 0
    out2 = {
        r.doc_id: r.n_any
        for r in boolean_search(df, ("data", "stream"), (), ("batch",)).collect()
    }
    assert out2 == {1: 0, 2: 0, 5: 0}
    with _pytest.raises(ValueError, match="must-term"):
        boolean_search(df, ())
    with _pytest.raises(ValueError, match="required and excluded"):
        boolean_search(df, ("data",), (), ("data",))
