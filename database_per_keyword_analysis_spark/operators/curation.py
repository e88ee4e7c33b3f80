"""Corpus curation: the end-to-end per-document keep/drop decision a
training-data pipeline consumes.

The reference stops at per-slice reports (/root/reference/main.py:385-437);
a 100 TB pretraining pipeline instead needs ONE verdict per document with
an auditable reason.  `curate` composes three already-independent stages —
quality metrics (operators/textquality.py), exact dedup (operators/
dedup.py:exact_duplicates) and near-dup group decisions (operators/
dedup.py:minhash_dup_groups) — into (doc_id, metrics..., exact_dup,
near_dup, drop_reason, keep), with a fixed reason precedence:

    exact_duplicate > near_duplicate > too_short > high_punctuation

Scale design: every input is a per-doc_id table — the quality metrics are
scan-stage column expressions (zero shuffle), exact dedup shuffles
(fingerprint, id) and never text, the near-dup tier is the banded
MinHash+LSH path (candidate-bounded, see SCALE.md) — and the final
assembly is two left equi-joins on doc_id, which co-partition after one
hash shuffle.  No stage is all-pairs; no stage collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import dedup as D
from . import textquality as TQ


def uniform_hash(c: Column) -> Column:
    """Deterministic uniform draw in [0, 1) from a column: the first 48
    bits of md5 (the repo's portable-hash idiom — identical in Spark,
    DuckDB, and Python) scaled to a fraction.  The basis of every
    deterministic sampler here: same input ⇒ same draw, any engine."""
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(float(2**48))
    )


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic subsample of a corpus to ≈ `budget_tokens` total
    tokens: keep each doc with probability budget/total via a uniform
    hash of its id (md5-derived, the repo's portable-hash idiom), so the
    same corpus and budget always select the same docs.

    Scale design: the exact way to hit a budget — global sort by hash +
    running token sum — serializes an unbounded window on one partition,
    so this uses hash-threshold Bernoulli instead: one map-side token
    count, one scalar total (broadcast via cross join, not collected),
    one filter.  Expected kept tokens = budget exactly; the realized
    total concentrates within O(sqrt) sampling noise, the right trade at
    100 TB where the "budget" is itself a target, not an invariant.
    Returns (doc_id, n_tokens_ws, u) for the kept docs, u being the
    doc's uniform draw (audit column: kept ⇔ u < budget/total).
    """
    n = TQ.ws_token_count(F.col(text_col))
    counted = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), n.alias("n_tokens_ws")
    )
    total = counted.agg(
        F.sum(F.col("n_tokens_ws").cast("long")).alias("total_tokens")
    )
    u = uniform_hash(F.col("doc_id"))
    return (
        counted.crossJoin(F.broadcast(total))
        .withColumn("u", u)
        .where(
            F.col("u")
            < F.least(
                F.lit(1.0),
                F.lit(float(budget_tokens))
                / F.greatest(F.col("total_tokens"), F.lit(1)).cast("double"),
            )
        )
        .select("doc_id", "n_tokens_ws", "u")
        .orderBy("doc_id")
    )


def stratified_sample(
    docs: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    prefilter_margin: float = 4.0,
) -> DataFrame:
    """Exact-quota stratified sample: the `n_per_stratum` documents with
    the smallest md5(id) per stratum — a uniform without-replacement
    draw that is fully deterministic (same corpus ⇒ same sample, any
    partitioning, any engine).  Returns (stratum, doc_id, rk) with
    rk = 1..n the within-stratum sample order.

    Scale design: the naive form is one window sort per stratum — a
    shuffle on the stratum key where a hot stratum sorts ALL its rows to
    keep n.  The prefilter bounds that: a per-stratum count (map-side
    partial agg) sets a hash threshold of `prefilter_margin · n / count`,
    and only the ~margin·n surviving rows per stratum reach the window
    sort.  The cut is deterministic, so the oracle applies the same
    threshold; it is lossless with overwhelming probability
    (P[Binomial(count, margin·n/count) < n] ≤ e^{-n(margin-1)²/2margin},
    ~1e-25 at n=50, margin=4), and `tests/` pin prefiltered ==
    unprefiltered on the fixtures.  Set prefilter_margin=None to skip
    the cut (tiny corpora / exactness proofs).
    """
    base = docs.where(F.col(stratum_col).isNotNull()).select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(id_col).cast("string")).alias("u_hex"),
        uniform_hash(F.col(id_col)).alias("u"),
    )
    if prefilter_margin is not None:
        counts = base.groupBy("stratum").agg(F.count(F.lit(1)).alias("n_stratum"))
        base = base.join(counts, "stratum").where(
            F.col("u")
            < F.least(
                F.lit(1.0),
                F.lit(prefilter_margin * n_per_stratum)
                / F.col("n_stratum").cast("double"),
            )
        )
    w = Window.partitionBy("stratum").orderBy("u_hex", "doc_id")
    return (
        base.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n_per_stratum)
        .select("stratum", "doc_id", "rk")
        .orderBy("stratum", "rk")
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    target_docs: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resample a corpus toward a target source mixture: stratum `s`
    contributes ≈ target_docs · weight_s documents (weights are
    normalized; strata absent from `weights` contribute nothing).  The
    per-stratum acceptance ratio is min(1, quota/count) — an
    undersized stratum keeps everything rather than upsampling, the
    standard epoch-mixing convention for pretraining corpora.

    Returns (stratum, doc_id, u, accept_ratio) for the kept documents.

    Scale design: same hash-threshold Bernoulli machinery as
    `token_budget_sample`, applied per group — one map-side count
    aggregate over strata, one equi-join of that tiny table back
    (broadcast when #strata is small), one filter.  No global sort, no
    per-stratum windows, no collect.
    """
    total_w = sum(weights.values()) or 1.0
    wmap = F.create_map(
        *[x for k, v in sorted(weights.items()) for x in (F.lit(k), F.lit(v / total_w))]
    )
    base = docs.where(F.col(stratum_col).isNotNull()).select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("doc_id"),
        uniform_hash(F.col(id_col)).alias("u"),
    )
    counts = base.groupBy("stratum").agg(F.count(F.lit(1)).alias("n_stratum"))
    return (
        base.join(counts, "stratum")
        .withColumn("quota", wmap[F.col("stratum")] * F.lit(float(target_docs)))
        .where(F.col("quota").isNotNull())
        .withColumn(
            "accept_ratio",
            F.least(F.lit(1.0), F.col("quota") / F.col("n_stratum").cast("double")),
        )
        .where(F.col("u") < F.col("accept_ratio"))
        .select("stratum", "doc_id", "u", "accept_ratio")
        .orderBy("stratum", "doc_id")
    )


def apply_curation(docs: DataFrame, verdict: DataFrame) -> DataFrame:
    """Filter a corpus to its kept documents: semi-join `docs` against the
    keep side of a `curate` verdict on doc_id.  Keeps every original
    column; the join is an equi-join on the id (broadcast or shuffle as
    the optimizer prefers), so applying a verdict to a 100 TB corpus is
    one co-partitioned pass."""
    return docs.join(
        verdict.where(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )


def curate(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_punct_ratio: float = 0.30,
    near_threshold: float = 0.8,
    max_dup_trigram_frac: float | None = None,
) -> DataFrame:
    """Per-document curation decision over a corpus.

    Returns (doc_id, n_tokens_ws, punct_ratio, exact_dup, near_dup,
    drop_reason, keep): `keep` is true iff no drop reason fires;
    `drop_reason` is the highest-precedence failure (NULL when kept).
    Duplicate KEEPERS (rank 1 in their group) are kept — only the
    non-keeper members of a duplicate group are dropped, so applying the
    decision never loses content, it only removes redundancy.

    With `max_dup_trigram_frac` set, the Gopher repetition rule
    (textquality.repetition_metrics) joins the verdict as a final
    'repetitive' drop reason — lowest precedence, same zero-shuffle
    metrics pass folded in by one more co-partitioned doc_id join.
    """
    quality = TQ.quality_metrics(docs, text_col).select(
        "doc_id", "n_tokens_ws", "punct_ratio"
    )
    if max_dup_trigram_frac is not None:
        rep = TQ.repetition_metrics(docs, text_col).select(
            "doc_id", "dup_trigram_frac"
        )
        quality = quality.join(rep, "doc_id", "left")
    exact = D.exact_duplicates(docs, text_col).select(
        "doc_id", F.col("is_duplicate").alias("exact_dup")
    )
    near = D.minhash_dup_groups(docs, text_col, threshold=near_threshold).select(
        "doc_id", F.col("is_duplicate").alias("near_dup")
    )
    carry = ["doc_id", "n_tokens_ws", "punct_ratio"]
    if max_dup_trigram_frac is not None:
        carry.append("dup_trigram_frac")
    reason = (
        F.when(F.col("exact_dup"), F.lit("exact_duplicate"))
        .when(F.col("near_dup"), F.lit("near_duplicate"))
        .when(F.col("n_tokens_ws") < min_tokens, F.lit("too_short"))
        .when(F.col("punct_ratio") > max_punct_ratio, F.lit("high_punctuation"))
    )
    if max_dup_trigram_frac is not None:
        reason = reason.when(
            F.col("dup_trigram_frac") > max_dup_trigram_frac, F.lit("repetitive")
        )
    return (
        quality.join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            *carry,
            F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
            F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
        )
        .withColumn("drop_reason", reason)
        .withColumn("keep", F.col("drop_reason").isNull())
        .orderBy("doc_id")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    stream_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence-packing plan: concatenate documents in
    deterministic (id) order within each stream and cut fixed
    ``seq_len``-token training sequences; a document may straddle a
    cut (standard causal-LM packing — no padding, no document gets
    lost).  Reference N/A (no training-batch assembly in
    /root/reference/main.py).

    Returns one row per document:
    (id, stream, n_tokens, start_offset, seq_first, seq_last,
    spans_boundary) where start_offset is the document's position in
    its stream's token concatenation and seq_first/seq_last are the
    first/last sequence indices it lands in.

    Scale shape (100 TB): the prefix-sum window partitions by STREAM —
    each stream packs independently and in parallel, which is exactly
    how real pipelines shard packing (per source / per input shard);
    stream granularity is the parallelism knob.  One hash shuffle on
    stream, one in-partition sort, zero joins.
    """
    n = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    w = (
        Window.partitionBy("stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col, F.col(stream_col).alias("stream"), n.alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "stream",
            "n_tokens",
            (F.col("cum") - F.col("n_tokens")).alias("start_offset"),
            F.floor((F.col("cum") - F.col("n_tokens")) / seq_len).alias("seq_first"),
            F.floor((F.col("cum") - 1) / seq_len).alias("seq_last"),
        )
        .withColumn("spans_boundary", F.col("seq_last") > F.col("seq_first"))
        .orderBy(id_col)
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much more likely its hashed-unigram features are
    under a TARGET distribution (e.g. wiki-like, in-domain) than under
    the raw corpus, for importance resampling toward the target domain.
    Reference N/A.

    Returns (id, n_tokens, log_ratio): log_ratio =
    Σ_tokens [ln p̂_target(b) − ln p̂_raw(b)] with add-one smoothing
    over ``n_buckets`` hashed buckets; positive ⇒ more target-like.

    Scale shape (100 TB): token→bucket hashing is the portable md5
    idiom (48-bit prefix, identical in DuckDB); the two bucket
    histograms are map-side-combining aggregates onto ≤ n_buckets
    rows, localCheckpointed so the per-bucket term table and its
    scalar totals share one computation; the scoring join broadcasts
    that tiny table into the per-(doc, bucket) counts.  The smoothing
    normalizers separate additively — ln((t+1)/(T+B)) − ln((r+1)/(R+B))
    = [ln(t+1) − ln(r+1)] − [ln(T+B) − ln(R+B)] — so the corpus totals
    attach as a broadcast scalar AFTER the per-doc reduce, never
    joining the token stream.  No collect anywhere.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 12), 16, 10)
        .cast("long") % n_buckets
    ).alias("bucket")

    def feats(df: DataFrame, *cols) -> DataFrame:
        toks = df.where(F.col(text_col).isNotNull()).select(
            *cols,
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("token"),
        )
        return toks.select(*cols, bucket)

    rstat = feats(docs).groupBy("bucket").agg(F.count(F.lit(1)).alias("r_cnt"))
    tstat = feats(target).groupBy("bucket").agg(F.count(F.lit(1)).alias("t_cnt"))
    stats = (
        rstat.join(tstat, "bucket", "left")
        .select(
            "bucket",
            "r_cnt",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
        )
        .withColumn(
            "term",
            F.log(F.col("t_cnt").cast("double") + 1.0)
            - F.log(F.col("r_cnt").cast("double") + 1.0),
        )
        .localCheckpoint(eager=False)
    )
    scal = stats.agg(
        F.sum("t_cnt").cast("double").alias("_t_total"),
        F.sum("r_cnt").cast("double").alias("_r_total"),
    )
    docfeat = feats(docs, id_col).groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )
    per_doc = docfeat.join(F.broadcast(stats), "bucket").groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.sum(F.col("tf") * F.col("term")).alias("_s"),
    )
    b = float(n_buckets)
    return (
        per_doc.crossJoin(F.broadcast(scal))
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.col("_s")
                - F.col("n_tokens")
                * (F.log(F.col("_t_total") + b) - F.log(F.col("_r_total") + b)),
                6,
            ).alias("log_ratio"),
        )
        .orderBy(id_col)
    )


def source_quality_report(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-source corpus health rollup — the dashboard a curation run
    starts from: document counts, mean length, punctuation ratio,
    exact-duplicate share, and mean unigram-LM NLL per `source`.
    Composes three independent per-doc tiers (quality metrics, exact
    dedup, LM scoring) with doc_id equi-joins, then one small groupBy
    on source.  Reference parity: the closest thing main.py has is the
    per-industry report loop; this is that idea over curation signals.

    Scale shape: each tier is the already-documented per-doc pass; the
    assembly joins co-partition on doc_id after one hash shuffle; the
    final aggregate reduces to n_sources rows map-side.
    """
    q = TQ.quality_metrics(docs, text_col).select(
        id_col, "n_tokens_ws", "punct_ratio"
    )
    e = D.exact_duplicates(docs, text_col).select(
        id_col, F.col("is_duplicate").alias("exact_dup")
    )
    lm = TQ.unigram_lm_scores(docs, text_col, id_col).select(id_col, "avg_nll")
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col, "source")
        .join(q, id_col)
        .join(e, id_col)
        .join(lm, id_col)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_tokens_ws"), 6).alias("avg_tokens"),
            F.round(F.avg("punct_ratio"), 6).alias("avg_punct_ratio"),
            F.sum(F.when(F.col("exact_dup"), 1).otherwise(0))
            .cast("long")
            .alias("n_exact_dups"),
            F.round(F.avg("avg_nll"), 6).alias("avg_nll"),
        )
        .orderBy("source")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-size token chunks — the
    standard pre-step for context-window-bounded training and RAG
    indexing (complement of :func:`pack_sequences`, which concatenates
    SHORT docs; this splits LONG ones).  Chunk i covers tokens
    [i·stride, i·stride + chunk_tokens) with stride =
    chunk_tokens − overlap, so consecutive chunks share `overlap`
    tokens and no token is dropped.

    Returns (id, chunk_id, chunk_text, n_tokens) — one row per chunk,
    chunk_id 0-based in document order.

    Scale shape: pure per-row transform (split + slices) then one
    posexplode — map-side only, zero shuffle; chunk boundaries depend
    only on the row, so the pass parallelizes with the scan."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(
        F.greatest(F.size(toks) - F.lit(overlap), F.lit(1)) / F.lit(float(stride))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * stride + 1, chunk_tokens), " "),
    )
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col, F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .withColumn(
            "n_tokens",
            F.size(F.split(F.col("chunk_text"), r"\s+")).cast("long"),
        )
        .orderBy(id_col, "chunk_id")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot diff between two corpus versions: (id, status) with
    status ∈ added / removed / changed / unchanged, where `changed`
    means the id survives but its normalized-text fingerprint moved —
    the audit a versioned data pipeline runs between crawl snapshots.

    Scale shape: each side reduces to (id, fingerprint) in its scan
    stage (text never shuffles); the full-outer equi-join on id
    co-partitions after one hash shuffle per side; output is one row
    per id."""
    def fp(df: DataFrame, alias: str) -> DataFrame:
        return df.where(F.col(text_col).isNotNull()).select(
            id_col, D.fingerprint_col(text_col).alias(alias)
        )

    o = fp(old, "fp_old")
    n = fp(new, "fp_new")
    return (
        o.join(n, id_col, "full_outer")
        .select(
            id_col,
            F.when(F.col("fp_old").isNull(), F.lit("added"))
            .when(F.col("fp_new").isNull(), F.lit("removed"))
            .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
        .orderBy(id_col)
    )


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    keep_fraction: float = 0.25,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Execution step of DSIR: keep the ``keep_fraction`` of documents
    with the highest importance weights (:func:`dsir_weights`), ties
    broken by id — deterministic top-fraction selection toward the
    target domain.

    Scale shape: the cut threshold is one exact-percentile aggregate
    over the per-doc WEIGHT frame (docs rows), broadcast back — no
    global sort; the filter is then a scan-stage comparison.  Returns
    the kept (id, n_tokens, log_ratio) rows."""
    w = dsir_weights(docs, target, text_col, id_col, n_buckets).localCheckpoint(
        eager=False
    )
    cut = w.agg(
        F.expr(
            f"percentile(log_ratio, {1.0 - keep_fraction!r})"
        ).alias("_cut")
    )
    return (
        w.crossJoin(F.broadcast(cut))
        .where(F.col("log_ratio") >= F.col("_cut"))
        .select(id_col, "n_tokens", "log_ratio")
        .orderBy(id_col)
    )


# Fixed length-bucket boundaries (powers of two).  A shared literal list
# — NOT ceil(log2(n)) — because log2 at exact powers of two is a
# libm-boundary hazard (ln(64)/ln(2) can land either side of 6.0 per
# engine); a CASE over literals is exact everywhere.
LENGTH_BUCKETS = [16, 32, 64, 128, 256, 512, 1024]


def length_bucket_batches(
    docs: DataFrame,
    batch_size: int = 8,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed training-batch plan: assign each document to a
    power-of-two length bucket, deterministically shuffle within the
    bucket (md5 order), split into fixed-size batches, and report each
    batch's padding economics — the batching step a training-data
    pipeline runs so sequence padding is bounded by the bucket width
    instead of the global max length.  Returns one row per batch:
    (bucket_cap, shard, batch_id, n_docs, batch_max, sum_tokens,
    padding_frac) where padding_frac = (n_docs·batch_max − sum_tokens)
    / (n_docs·batch_max) — exact integer arithmetic, then one exact
    division.

    Scale design: a single window per (bucket, shard) — the shard key
    (md5 of the id, mod `n_shards`) splits each bucket's global sort
    into `n_shards` independent, deterministic partitions, exactly
    `pack_sequences`' per-stream parallel-packing idiom: no bucket ever
    serializes onto one task, and raising n_shards with the cluster
    keeps every window partition-sized.  Docs above the top bucket cap
    land in the top bucket (documented clamp)."""
    n = TQ.ws_token_count(F.col(text_col))
    bucket = F.lit(LENGTH_BUCKETS[-1])
    for cap in reversed(LENGTH_BUCKETS):
        bucket = F.when(F.col("n_tokens") <= cap, F.lit(cap)).otherwise(bucket)
    h = F.md5(F.col(id_col).cast("string"))
    base = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), n.alias("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            bucket.alias("bucket_cap"),
            h.alias("_h"),
            (
                F.conv(F.substring(h, 1, 12), 16, 10).cast("long")
                % n_shards
            ).alias("shard"),
        )
    )
    w = Window.partitionBy("bucket_cap", "shard").orderBy("_h", "doc_id")
    batched = base.select(
        "bucket_cap",
        "shard",
        "n_tokens",
        F.floor((F.row_number().over(w) - 1) / batch_size).alias("batch_id"),
    )
    return (
        batched.groupBy("bucket_cap", "shard", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").cast("long").alias("batch_max"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .select(
            "bucket_cap",
            "shard",
            "batch_id",
            "n_docs",
            "batch_max",
            "sum_tokens",
            (
                (F.col("n_docs") * F.col("batch_max") - F.col("sum_tokens"))
                .cast("double")
                / (F.col("n_docs") * F.col("batch_max")).cast("double")
            ).alias("padding_frac"),
        )
        .orderBy("bucket_cap", "shard", "batch_id")
    )


def alpha_power_rebalance(
    docs: DataFrame,
    target_docs: int,
    alpha: float = 0.5,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-sampling
    rule of XLM-R / mT5): stratum `s` is sampled with probability share
    ∝ n_s^alpha, flattening the head and up-weighting the tail relative
    to natural frequency.  Returns (stratum, doc_id, u, accept_ratio)
    for the kept docs — `mixture_sample` with the weight vector
    COMPUTED from corpus counts instead of given.

    Exactness: at the default alpha=0.5 the power is `sqrt` (IEEE
    correctly-rounded, bit-identical across engines — generic pow(x,a)
    is a libm hazard and other alphas are documented approximate); the
    normalizing denominator sums per-stratum sqrt weights in DECIMAL so
    it is independent of aggregation order.

    Scale shape: one map-side stratum count, one #strata-row weight
    table broadcast back, one scan-stage hash-threshold filter — the
    token_budget_sample / mixture_sample machinery."""
    base = docs.where(F.col(stratum_col).isNotNull()).select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("doc_id"),
        uniform_hash(F.col(id_col)).alias("u"),
    )
    counts = base.groupBy("stratum").agg(F.count(F.lit(1)).alias("n_stratum"))
    if alpha == 0.5:
        w_raw = F.sqrt(F.col("n_stratum").cast("double"))
    else:  # cross-engine bit-exactness not guaranteed off the sqrt path
        w_raw = F.pow(F.col("n_stratum").cast("double"), F.lit(alpha))
    wtab = counts.select("stratum", "n_stratum", w_raw.alias("w_raw"))
    denom = wtab.agg(
        F.sum(F.col("w_raw").cast("decimal(28,12)")).cast("double").alias("denom")
    )
    rates = (
        wtab.crossJoin(F.broadcast(denom))
        .select(
            "stratum",
            F.least(
                F.lit(1.0),
                F.col("w_raw")
                / F.col("denom")
                * F.lit(float(target_docs))
                / F.col("n_stratum"),
            ).alias("accept_ratio"),
        )
    )
    return (
        base.join(F.broadcast(rates), "stratum")
        .where(F.col("u") < F.col("accept_ratio"))
        .select("stratum", "doc_id", "u", "accept_ratio")
        .orderBy("stratum", "doc_id")
    )


# Funnel stage order = curate()'s drop_reason precedence; shared with the
# generated oracle so the two cannot desynchronize.
CURATION_FUNNEL_STAGES = [
    "exact_duplicate",
    "near_duplicate",
    "too_short",
    "high_punctuation",
]


def curation_funnel(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stage-by-stage survival accounting over the curation cascade —
    the funnel report every production pipeline publishes: for each
    stage (in drop-precedence order) how many docs entered, were
    dropped there, and survived.  Returns (stage_idx, stage, n_in,
    n_dropped, n_out) with n_out(i) = n_in(i+1); all-integer arithmetic.

    Scale shape: one conditional-count aggregate over the curate()
    verdict collapses the corpus to a single row; the per-stage rows
    unfold driver-free via `stack` with the cumulative arithmetic inline
    (the orders_profile idiom) — no window, no second pass."""
    v = curate(docs, text_col)
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.sum(F.when(F.col("drop_reason") == s, 1).otherwise(0))
        .cast("long")
        .alias(f"_c{i}")
        for i, s in enumerate(CURATION_FUNNEL_STAGES)
    ]
    row = v.agg(*aggs)
    args = []
    prior = "0"
    for i, s in enumerate(CURATION_FUNNEL_STAGES):
        n_in = f"_total - ({prior})"
        prior = f"{prior} + _c{i}"
        n_out = f"_total - ({prior})"
        args.append(f"{i + 1}, '{s}', {n_in}, _c{i}, {n_out}")
    return (
        row.selectExpr(
            f"stack({len(CURATION_FUNNEL_STAGES)}, {', '.join(args)}) "
            "AS (stage_idx, stage, n_in, n_dropped, n_out)"
        )
        .orderBy("stage_idx")
    )


def quality_keeper_selection(
    docs: DataFrame, text_col: str = "text", near_threshold: float = 0.8
) -> DataFrame:
    """Quality-aware duplicate-keeper selection: within each minhash
    near-dup group keep the HIGHEST-quality member (quality_classifier
    score, ties by doc_id) instead of the smallest id — the refinement
    real pipelines apply so dedup keeps the best copy, not an arbitrary
    one.  Returns (doc_id, group_id, quality_score, keeper_id, keep)
    for every grouped doc; ungrouped docs are unaffected by dedup and
    not emitted.

    Scale shape: the group table is pair-graph-sized (dup members only,
    << corpus), the quality join is doc_id-co-partitioned, and keeper
    election is one first_value window per group — group sizes are
    cluster-diameter-bounded, so no window partition is hot."""
    groups = D.minhash_dup_groups(
        docs, text_col, threshold=near_threshold
    ).select("doc_id", "group_id")
    q = TQ.quality_classifier(docs, text_col).select("doc_id", "quality_score")
    j = groups.join(q, "doc_id")
    w = Window.partitionBy("group_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        j.select(
            "doc_id",
            "group_id",
            "quality_score",
            F.first("doc_id").over(w).alias("keeper_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("keeper_id"))
        .orderBy("doc_id")
    )


def train_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic train/val/test assignment by hash bucket: bucket =
    first 48 bits of md5(id) mod 100, split = train below `train_pct`,
    val in the next `val_pct`, test above — the standard leakage-safe
    split for LLM corpora (membership is a pure function of the
    document id: re-runs, backfills, and late-arriving shards land in
    the SAME split without coordination, and train/eval contamination
    can't creep in through re-partitioning or arrival order).

    The md5 idiom is the repo's portable hash (identical in Spark,
    DuckDB, Python — see uniform_hash); mod-100 buckets rather than a
    float threshold so the percentage boundaries are exact integers.

    Scale: a pure scan-stage projection — zero shuffle, zero UDF; the
    split column pushes into any downstream partition pruning
    (`.where(split = 'train')` prunes at the scan when written
    partitioned-by-split)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(
        F.col(id_col),
        bucket.cast("int").alias("split_bucket"),
        split.alias("split"),
    )


def weighted_sample_aes(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the A-ES
    scheme (Efraimidis & Spirakis, "Weighted random sampling with a
    reservoir", IPL 2006) — per row key = u^(1/w), keep the k largest
    keys; the selected set is distributed exactly as sequential
    weighted draws without replacement.  u is the portable md5 draw
    (:func:`uniform_hash`), so the same corpus, weights and k select
    the same rows in any engine — the property that makes a
    quality-weighted corpus sample reproducible AND oracle-checkable
    (the samplers above are all uniform within stratum; this one
    biases by a per-row weight, e.g. doc length or a quality score).

    Rows with NULL or non-positive weight are never selected (w→0
    drives the key to 0 — excluded up front).  Scale shape: one
    scan-stage key computation + TakeOrderedAndProject top-k (each
    partition keeps its local k, the driver merges k-sized heaps) —
    no global sort, no shuffle of the corpus.  Returns
    (id, w, es_key·1e0 rounded to 6) ordered by id.

    The top-k ORDER key is the pow result rounded to 12 digits with
    the id tie-break (r10, r9 advice item 2): JVM Math.pow and libm
    pow are not bit-identical, so ranking on the raw double could let
    a last-ulp difference flip which of two keys straddling the
    k-boundary wins between engines; at 12 digits both engines see
    the same key, and the deterministic id settles exact ties."""
    base = docs.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).select(
        F.col(id_col).alias(id_col),
        F.col(weight_col).cast("double").alias("w"),
        uniform_hash(F.col(id_col)).alias("u"),
    )
    keyed = base.withColumn(
        "es_key", F.round(F.pow(F.col("u"), F.lit(1.0) / F.col("w")), 12)
    )
    return (
        keyed.orderBy(F.desc("es_key"), id_col)
        .limit(k)
        .select(id_col, "w", F.round("es_key", 6).alias("es_key"))
        .orderBy(id_col)
    )


def content_safe_split(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Contamination-safe train/val/test assignment: split by CONTENT
    group, not by id.  :func:`train_test_split` hashes the document
    id, so two COPIES of the same text (different ids — the normal
    state of a web corpus) can straddle train and eval, which is
    precisely the train/test contamination a dedup pipeline exists to
    prevent (Lee et al. 2022 §6: duplicated eval text inflates
    scores).  Here the split key is the exact-duplicate group — the
    md5 fingerprint of whitespace-normalized text (the
    doc_fingerprints idiom) — bucketed with the same portable-hash
    arithmetic, so EVERY copy of a content lands in the SAME split by
    construction (group-atomicity is the tested invariant), and
    membership stays a pure function of content: re-crawls and
    late-arriving shards of known text cannot leak into eval.

    Returns (id, fingerprint, split_bucket, split).  Scale: still a
    pure scan-stage projection — the fingerprint AND its bucket are
    per-row expressions (no groupBy needed: equal text ⇒ equal
    fingerprint ⇒ equal bucket), zero shuffle, zero UDF.  Generalize
    to NEAR-dup safety by substituting the minhash group key from
    `dedup.dup_groups` for the fingerprint — the same one-column swap
    (:func:`content_safe_split_neardup`).

    The whitespace normalizer is the EXPLICIT class [ \\t\\n\\f\\r]+
    (r10, r9 advice item 3): Java-regex \\s includes \\x0B (vertical
    tab) while RE2/DuckDB \\s does not, so a shorthand-\\s fingerprint
    of a document containing \\x0B would differ across engines; the
    explicit class means the fingerprint — and therefore the split —
    is engine-portable."""
    fp = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"[ \t\n\f\r]+", " ")
    )
    bucket = (
        F.conv(F.substring(fp, 1, 12), 16, 10).cast("long") % 100
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        fp.alias("fingerprint"),
        bucket.cast("int").alias("split_bucket"),
        split.alias("split"),
    )


def content_safe_split_neardup(
    docs: DataFrame,
    groups: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """NEAR-dup-safe train/val/test assignment (round 10, r9 verdict
    item 4 — the documented one-key swap on
    :func:`content_safe_split`, registered and invariant-tested in
    its own right): the split key is the NEAR-duplicate group id from
    `dedup.dup_groups` / `minhash_dup_groups` (min doc id reachable
    through the LSH pair graph), so paraphrased/lightly-edited copies
    of a text — which exact fingerprints treat as distinct content —
    land in the same split by construction.  This is Lee et al. 2022
    §6 at full strength: exact-dup safety alone still leaks
    near-verbatim eval text into train.

    `groups` is the (id, group_id) mapping (only docs appearing in
    some near-dup pair need rows; singletons default to their own id
    via the left join + coalesce).  Bucketing is the same portable
    md5 arithmetic as the exact tier, over the group id.

    Scale shape: the minhash/CC group assignment upstream is the real
    cost (banded LSH, never all-pairs); this operator itself adds one
    left join against the group mapping — group-cardinality-bounded,
    broadcastable when the dup fraction is small (it is, post-exact-
    dedup) — and scan-stage bucket expressions."""
    key = F.coalesce(F.col("group_id"), F.col(id_col)).cast("string")
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long") % 100
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.join(
            groups.select(id_col, "group_id"), id_col, "left"
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("group_id"), F.col(id_col)).alias("group_id"),
            bucket.cast("int").alias("split_bucket"),
            split.alias("split"),
        )
    )


MIX_BUDGET_TOKENS = 100_000  # default allocation budget (tokens)


def mix_allocation(
    docs: DataFrame,
    budget_tokens: int = MIX_BUDGET_TOKENS,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a token budget
    across sources, proportional to each source's token supply — the
    INTEGER-EXACT planning step a training-data mix needs before the
    samplers run (token_budget_sample hits a budget in expectation;
    a mix plan must hit it EXACTLY and publish per-source quotas that
    sum to it, the way seats sum to a parliament).

    Semantics (Hamilton 1792, the apportionment classic): source s
    with n_s of N total tokens gets base_s = ⌊B·n_s/N⌋, and the
    leftover B − Σbase seats go to the largest remainders
    B·n_s mod N, ties broken by source ascending.  Everything is
    BIGINT arithmetic — no floats anywhere, so the two engines cannot
    disagree by construction; Σquota = B exactly (asserted in tests).

    100 TB shape: one scan-stage whitespace token count + one
    map-side-combinable groupBy(source) — the only fact-sized work;
    the apportionment itself runs on the #sources-bounded table (one
    broadcast scalar, one bounded window).  Returns
    (stratum, n_tokens, quota) ordered by stratum."""
    if budget_tokens < 0:
        raise ValueError("mix_allocation: budget_tokens must be >= 0")
    n = TQ.ws_token_count(F.col(text_col))
    supply = (
        docs.where(
            F.col(text_col).isNotNull() & F.col(stratum_col).isNotNull()
        )
        .select(F.col(stratum_col).alias("stratum"), n.alias("n_tok"))
        .groupBy("stratum")
        .agg(F.sum(F.col("n_tok").cast("long")).alias("n_tokens"))
    )
    tot = supply.agg(F.sum("n_tokens").alias("total"))
    b = F.lit(budget_tokens).cast("long")
    based = supply.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_tokens",
        (b * F.col("n_tokens")).alias("num"),
        F.col("total"),
    )
    parts = based.select(
        "stratum",
        "n_tokens",
        # INTEGER division (expr `div`), not floor-of-double: Spark's
        # `/` on BIGINTs is IEEE double division, and past ~2^52 the
        # quotient can round UP across an integer boundary (reproduced:
        # num=2^55-1, total=2^53 -> floor(num/total)=4 vs exact 3),
        # breaking Σquota == B and the oracle hash — the trimmed_mean
        # trap, r13 review finding
        F.expr("num div total").alias("base"),
        (F.col("num") % F.col("total")).alias("rem"),
    )
    leftover = parts.agg((b - F.sum("base")).alias("leftover"))
    pick = Window.orderBy(F.desc("rem"), F.asc("stratum"))
    return (
        parts.crossJoin(F.broadcast(leftover))
        .withColumn("_rk", F.row_number().over(pick))
        .select(
            "stratum",
            "n_tokens",
            (
                F.col("base")
                + F.when(F.col("_rk") <= F.col("leftover"), 1).otherwise(0)
            ).alias("quota"),
        )
        .orderBy("stratum")
    )
