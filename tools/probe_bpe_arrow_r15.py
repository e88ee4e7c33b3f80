"""Probe (r14 verdict item 6): bpe_encode's 24-literal-replace codegen
chain vs ONE Arrow mapInPandas pass applying the same merges in-worker
(pandas str.replace, same left-to-right non-overlapping global-replace
semantics as F.replace).  Tokenization + double-separator body
construction stay in the JVM in both arms; only the replace chain and
the subword split move across the Arrow boundary in the B arm.

Equality asserted at sf0.01 first; timing interleaved in one session
at sf0.1.

Usage: python tools/probe_bpe_arrow_r15.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def bpe_arrow(spark, sf_dir: str):
    import pandas as pd

    from database_per_keyword_analysis_spark.catalog import FROZEN_BPE_MERGES
    from database_per_keyword_analysis_spark.functions import text as TX
    from database_per_keyword_analysis_spark.operators.bpe import (
        END_OF_WORD,
        FROZEN_SEP,
    )
    from database_per_keyword_analysis_spark.sources.loader import load

    s2 = FROZEN_SEP * 2
    docs = load(spark, sf_dir, "documents", parallel=True)
    toks = TX.tokenize(TX.normalize_text(F.col("text")))
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
    base = (
        docs.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            toks.alias("_toks"),
            body.alias("_body"),
        )
        .where(F.size("_toks") > 0)
        .select(
            "doc_id", F.size("_toks").cast("long").alias("n_words"), "_body"
        )
    )
    reps = [
        (FROZEN_SEP + left + s2 + right + FROZEN_SEP,
         FROZEN_SEP + left + right + FROZEN_SEP)
        for left, right in FROZEN_BPE_MERGES
    ]

    def apply(batches):
        for pdf in batches:
            s = pdf["_body"]
            for a, b in reps:
                s = s.str.replace(a, b, regex=False)
            parts = s.str.split(FROZEN_SEP)
            sub = parts.map(lambda xs: [x for x in xs if x])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pdf["n_words"],
                    "n_subwords": sub.map(len).astype("int64"),
                    "subwords": sub.map(" ".join),
                }
            )

    return base.mapInPandas(
        apply,
        schema="doc_id bigint, n_words bigint, n_subwords bigint, subwords string",
    ).orderBy("doc_id")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from database_per_keyword_analysis_spark import catalog
    from database_per_keyword_analysis_spark.session import get_spark

    spark = get_spark("probe-bpe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = catalog.queries()

    # equality at sf0.01
    want = [tuple(r) for r in qs["bpe_encode"](spark, "/root/testdata/sf0.01").collect()]
    got = [tuple(r) for r in bpe_arrow(spark, "/root/testdata/sf0.01").collect()]
    assert got == want, "arrow arm diverges from the codegen chain"
    print(f"equal at sf0.01: {len(want)} rows", flush=True)

    SF = "/root/testdata/sf0.1"
    arms = {"codegen": lambda: qs["bpe_encode"](spark, SF),
            "arrow": lambda: bpe_arrow(spark, SF)}
    res = {a: [] for a in arms}
    for trip in range(3):
        order = list(arms) if trip % 2 == 0 else list(arms)[::-1]
        for a in order:
            for rep in range(3):
                t0 = time.perf_counter()
                arms[a]().write.format("noop").mode("overwrite").save()
                res[a].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            print(f"trip {trip} {a}: {res[a][-3:]}", flush=True)
    import statistics

    c = statistics.median(res["codegen"])
    ar = statistics.median(res["arrow"])
    print(f"codegen={c} arrow={ar} arrow/codegen={ar / c:.3f}")
    print("RESULT", res)
    spark.stop()


if __name__ == "__main__":
    main()
