"""Byte-pair-encoding merge induction (Sennrich et al. 2016) as a Spark
pipeline stage — the tokenizer-TRAINING step upstream of the engine's
vocabulary induction / encoding / packing chain (operators/search.py:
vocab_coverage → encode_documents → curation.pack_sequences).

Absent from the reference (no subword machinery at all); designed
Spark-first around the observation real BPE trainers exploit: merges are
learned from the WORD-FREQUENCY table, not the token stream.  The only
corpus-sized work is therefore one groupBy(word) count — after that the
working set is vocab-sized (thousands of rows), and the K merge rounds
iterate over THAT:

  round k:  explode adjacent symbol pairs per word (weighted by word
            count) → groupBy(pair) sum → top-1 with deterministic
            tie-break → ONE scalar collect (the CC per-round contract:
            driver actions are O(1) rows, never data) → apply the merge
            to every word's symbol array with a left-to-right greedy
            fold (higher-order `aggregate`, JVM-side) → localCheckpoint
            to truncate lineage (the CC idiom).

At 100 TB the word-count shuffle is the same partial-aggregatable
reduction `word_frequency` runs; rounds cost K × (vocab-sized job +
scalar collect), independent of corpus size.  The driver loop is
inherent to BPE (merge k+1 depends on the table state after merge k) and
bounded by `n_merges`.

Determinism: integer counts; best pair ordered by (count desc, left,
right); within-word application is the standard greedy left-to-right
simultaneous pass (overlapping occurrences: 'aaa' + (a,a) → [aa, a]).
Exact-match differential against a pure-Python reference implementation
in tests/test_bpe.py; the registered query is rows-only (iterative —
not expressible as one SQL statement for the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_symbol_table(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n, symbols) — the vocab-sized training table: Tier-A
    normalize/tokenize, corpus word counts, each word split to
    single-character symbols plus the Sennrich end-of-word marker."""
    from ..functions import text as TX

    toks = df.where(F.col(text_col).isNotNull()).select(
        F.explode(TX.tokenize(TX.normalize_text(F.col(text_col)))).alias("word")
    )
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return counts.select(
        "word",
        "n",
        F.concat(
            F.split(F.col("word"), ""),  # one element per character
            F.array(F.lit(END_OF_WORD)),
        ).alias("symbols"),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, pair_count): adjacent symbol pairs weighted by word
    frequency — all adjacent index pairs, overlaps included (Sennrich's
    counting)."""
    pairs = words.where(F.size("symbols") >= 2).select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("symbols") - 1),
                lambda i: F.struct(
                    F.element_at("symbols", i).alias("left"),
                    F.element_at("symbols", i + 1).alias("right"),
                ),
            )
        ).alias("_p"),
    )
    return pairs.groupBy("_p.left", "_p.right").agg(
        F.sum("n").cast("long").alias("pair_count")
    )


def _apply_merge(symbols: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right simultaneous merge of adjacent (left, right)
    into one symbol — a JVM-side fold over the symbol array."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 30,
    min_pair_count: int = 2,
) -> tuple[list[Row], DataFrame]:
    """Learn up to `n_merges` BPE merges.  Returns (merges, words):
    merges is the ordered list of Row(merge_rank, left, right, merged,
    pair_count) — the artifact a tokenizer serializes — and words is the
    final (word, n, symbols) table after all merges.  Stops early when
    the best pair's count drops below `min_pair_count` (merging
    singletons learns noise)."""
    words = word_symbol_table(df, text_col).localCheckpoint()
    merges: list[Row] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < min_pair_count:
            break
        b = best[0]
        merges.append(
            Row(
                merge_rank=rank,
                left=b["left"],
                right=b["right"],
                merged=b["left"] + b["right"],
                pair_count=b["pair_count"],
            )
        )
        words = words.withColumn(
            "symbols", _apply_merge(F.col("symbols"), b["left"], b["right"])
        ).localCheckpoint()
    return merges, words


def bpe_merges_df(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 30,
    min_pair_count: int = 2,
) -> DataFrame:
    """The learned merge table as a DataFrame (merge_rank, left, right,
    merged, pair_count), ordered by merge_rank — the `queries()` form."""
    spark = df.sparkSession
    merges, _ = bpe_train(df, text_col, n_merges, min_pair_count)
    schema = "merge_rank int, left string, right string, merged string, pair_count long"
    if not merges:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(merges, schema).orderBy("merge_rank")


def bpe_encode(
    df: DataFrame,
    words: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE model: encode each document into subword
    tokens using the word→segmentation table `bpe_train` produced.

    The efficient apply form real tokenizers compile to: instead of
    re-running K merge folds per document, the (vocab-sized) final
    segmentation table broadcast-joins onto the exploded token stream —
    one lookup per token (the encode_documents idiom) — and
    out-of-vocabulary words fall back to character symbols (their
    correct zero-merge segmentation: merges were learned only from
    in-vocab adjacencies).  Positions re-assemble per document with an
    ordered collect_list window, and the per-doc subword arrays flatten
    in order.  Returns (id_col, n_words, n_subwords, subwords).

    Scale: the corpus-side work is explode + broadcast-join + one
    groupBy(id) reassembly — the same plan family as encode_documents,
    plan-safe at any corpus size; the broadcast payload is the
    segmentation table (vocab-sized)."""
    from pyspark.sql import Window
    from ..functions import text as TX

    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(
                TX.tokenize(TX.normalize_text(F.col(text_col)))
            ).alias("_pos", "word"),
        )
    )
    seg = words.select("word", F.col("symbols").alias("_seg"))
    oov = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
    )
    looked = toks.join(F.broadcast(seg), "word", "left").select(
        id_col,
        "_pos",
        F.coalesce(F.col("_seg"), oov).alias("_syms"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        looked.select(
            id_col,
            F.collect_list(F.col("_syms")).over(w).alias("_all"),
            F.row_number().over(Window.partitionBy(id_col).orderBy("_pos")).alias("_rn"),
        )
        .where(F.col("_rn") == 1)
        .select(
            id_col,
            F.size("_all").cast("long").alias("n_words"),
            F.flatten("_all").alias("subwords"),
        )
        .withColumn("n_subwords", F.size("subwords").cast("long"))
        .select(id_col, "n_words", "n_subwords", "subwords")
        .orderBy(id_col)
    )


FROZEN_SEP = "~"  # impossible inside symbols: tokens match
# [\w؀-ۿ‌@.:/]+ and the end-of-word marker uses only < / w >


def bpe_encode_frozen(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Encode documents with a FROZEN merge table — the tokenizer-apply
    step as a pure scan-stage string expression, oracle-replayable.

    `bpe_train` is inherently iterative (merge k+1 depends on the table
    state after merge k), so the training query is rows-only; but a
    tokenizer MODEL is a frozen artifact, and applying one is
    deterministic.  This form compiles the merge list into a chain of
    literal string replaces over a double-separator encoding of each
    document's symbol stream:

        doc  = ~~h~~i~~</w>~~h~~o~~</w>~~
        step = replace('~left~~right~', '~leftright~')

    A match consumes ONE separator from each flanking pair, so the
    output stays canonically double-separated and adjacent matches
    (which share a separator pair) are both found in the same pass.
    For merges with left != right, matches can never overlap (a
    one-symbol overlap would force left == right), so the left-to-right
    non-overlapping global replace is EXACTLY the greedy simultaneous
    merge `_apply_merge` computes — the equivalence
    tests/test_bpe.py pins.  left == right merges are rejected: their
    overlapping-run semantics are not expressible as a single replace.

    Scale: zero joins, zero shuffles before the final ORDER BY — each
    document is K literal replaces inside whole-stage codegen; the
    model rides in the plan as K short string literals.  Returns
    (id_col, n_words, n_subwords, subwords), matching `bpe_encode`.
    """
    from ..functions import text as TX

    for left, right in merges:
        if left == right:
            raise ValueError(
                f"frozen merge ({left!r},{right!r}) has left == right; "
                "overlapping-run greedy semantics need the fold form"
            )
        for sym in (left, right):
            if FROZEN_SEP in sym:
                raise ValueError(f"separator {FROZEN_SEP!r} inside symbol {sym!r}")

    s2 = FROZEN_SEP * 2
    toks = TX.tokenize(TX.normalize_text(F.col(text_col)))
    body = F.concat(
        F.lit(s2),
        F.array_join(
            F.transform(
                toks,
                lambda w: F.concat(
                    F.array_join(F.split(w, ""), s2),
                    F.lit(s2 + END_OF_WORD),
                ),
            ),
            s2,
        ),
        F.lit(s2),
    )
    for left, right in merges:
        body = F.replace(
            body,
            F.lit(FROZEN_SEP + left + s2 + right + FROZEN_SEP),
            F.lit(FROZEN_SEP + left + right + FROZEN_SEP),
        )
    extra = list(extra_cols or [])
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), *extra, toks.alias("_toks"), body.alias("_body"))
        .where(F.size("_toks") > 0)
        .select(
            id_col,
            *extra,
            F.size("_toks").cast("long").alias("n_words"),
            F.filter(
                F.split(F.col("_body"), FROZEN_SEP), lambda s: s != F.lit("")
            ).alias("subwords"),
        )
        .select(
            id_col,
            *extra,
            "n_words",
            F.size("subwords").cast("long").alias("n_subwords"),
            "subwords",
        )
        .orderBy(id_col)
    )


def bpe_fertility_by_group(
    df: DataFrame,
    merges: list[tuple[str, str]],
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer fertility (subwords per word) per document group — the
    per-language efficiency report that drives mixture decisions: a
    tokenizer whose fertility is 2x on one language effectively halves
    that language's context window and doubles its training cost per
    word (cf. multilingual-tokenizer fairness analyses of mBERT/XLM-R).

    Composes the frozen encode (`bpe_encode_frozen`, zero-shuffle
    replace chain with `group_col` carried through the scan — no
    join-back) with one K-group aggregate; word/subword totals are
    exact integers, fertility is their one double division.  Returns
    (group_col, n_docs, total_words, total_subwords, fertility)."""
    enc = bpe_encode_frozen(
        df, merges, text_col=text_col, id_col=id_col, extra_cols=[group_col]
    )
    return (
        enc.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_subwords").alias("total_subwords"),
        )
        .select(
            group_col,
            "n_docs",
            "total_words",
            "total_subwords",
            (
                F.col("total_subwords").cast("double")
                / F.col("total_words").cast("double")
            ).alias("fertility"),
        )
        .orderBy(group_col)
    )
