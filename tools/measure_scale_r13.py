"""Round-13 scale points (the per-addition standard): every novel
query ships with a measured 10x curve, output contract asserted
BEFORE timing.

* lineitem_price_qty_spearman — 10x key-offset lineitem: the value
  tables and both rank joins grow 10x; output flat (one row).
* event_view_purchase_xcorr — 10x key-offset user replicas: the
  day-grain collapse eats the 10x event volume, the lag join stays
  days x 15; output flat (15 lags).
* embedding_dim_profile — 10x vec_id-offset embedding replicas: the
  posexplode and the d-group agg grow 10x; output flat (d dims).
* source_mix_allocation — 10x cipher-replica documents (sources
  preserved): the token-count scan grows 10x, the apportionment
  stays #sources-bounded; output flat (one row per source).
* doc_length_ranksum_drift — 10x documents: the groupBy(value)
  collapse grows 10x, the rank/tie folds stay value-cardinality
  work; output flat (one row).

Protocol: interleaved warmth (un-timed 1x/10x sweep), median-of-3,
noop sink — measure_scale_tpch.py's protocol.

Usage: python tools/measure_scale_r13.py [--queries a,b]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_per_keyword_analysis_spark import catalog  # noqa: E402
from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402
from tools.measure_scale_r10 import (  # noqa: E402
    BASE,
    _docs10x,
    _events10x,
    _fixture_dir,
    _tpch10x,
    median3,
    run_once,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache")
EMB_ID_STRIDE = 10_000_000


def _emb10x(replicas: int = 10) -> str:
    d = os.path.join(CACHE, "scale_emb1")
    out = os.path.join(d, "embeddings.parquet")
    if not os.path.exists(out):
        spark = get_spark("make-emb-fixture")
        emb = spark.read.parquet(
            os.path.join(BASE, "embeddings.parquet")
        )
        rep = emb.crossJoin(
            spark.range(replicas).select(F.col("id").cast("long").alias("rep"))
        ).select(
            (F.col("vec_id") + F.col("rep") * EMB_ID_STRIDE).alias("vec_id"),
            "embedding",
            "label",
        )
        rep.repartition(32).write.mode("overwrite").parquet(out)
    return d


def main() -> None:
    spark = get_spark("measure-scale-r13")
    only = None
    if "--queries" in sys.argv:
        only = set(sys.argv[sys.argv.index("--queries") + 1].split(","))
    fixtures: dict[str, tuple[str, str]] = {
        # every r13 output is FLAT (row counts equal at both scales)
        "lineitem_price_qty_spearman": (
            BASE,
            _fixture_dir({"lineitem": _tpch10x("lineitem")}, tag="_sprm"),
        ),
        "event_view_purchase_xcorr": (BASE, _events10x()),
        "embedding_dim_profile": (BASE, _emb10x()),
        "source_mix_allocation": (BASE, _docs10x()),
        "doc_length_ranksum_drift": (BASE, _docs10x()),
        # second batch (same flat-output contracts)
        "lineitem_qty_discount_kendall": (
            BASE,
            _fixture_dir({"lineitem": _tpch10x("lineitem")}, tag="_sprm"),
        ),
        "event_type_cusum": (BASE, _events10x()),
        "corpus_vocab_richness": (BASE, _docs10x()),
        "embedding_anisotropy": (BASE, _emb10x()),
        # steady state (the stream_length_ks_drift caveat: the MV fold
        # builds at fixture warmup, cache-keyed); timed cost = the
        # even-half collapse + the rank-sum fold off the counts MV
        "stream_length_ranksum_drift": (BASE, _docs10x()),
        # third batch (flat-output contracts)
        "order_price_trimmed_mean": (
            BASE,
            _fixture_dir({"orders": _tpch10x("orders")}),
        ),
        "source_style_delta": (BASE, _docs10x()),
        # deferred-at-birth additions (flat-output contracts)
        "source_token_js_matrix": (BASE, _docs10x()),
        "orders_open_backlog": (
            BASE,
            _fixture_dir(
                {"orders": _tpch10x("orders"),
                 "lineitem": _tpch10x("lineitem")},
                tag="_bklg",
            ),
        ),
        "event_dow_seasonality": (BASE, _events10x()),
        "basket_frequent_triples": (
            BASE,
            _fixture_dir({"lineitem": _tpch10x("lineitem")}, tag="_sprm"),
        ),
        "copurchase_degree_powerlaw": (
            BASE,
            _fixture_dir({"lineitem": _tpch10x("lineitem")}, tag="_sprm"),
        ),
        # steady state (MV folds at fixture warmup, cache-keyed)
        "stream_event_type_cusum": (BASE, _events10x()),
    }
    if only:
        fixtures = {k: v for k, v in fixtures.items() if k in only}
    qs = catalog.queries()
    for name, (d1, dbig) in fixtures.items():
        # output contract BEFORE timing
        n1 = qs[name](spark, d1).count()
        nbig = qs[name](spark, dbig).count()
        assert nbig == n1, (name, n1, nbig)
        print(json.dumps({"q": name, "rows_1x": n1, "rows_10x": nbig,
                          "contract": "ok"}), flush=True)
    for name, (d1, dbig) in fixtures.items():  # un-timed warmup
        run_once(lambda: qs[name](spark, d1))
        run_once(lambda: qs[name](spark, dbig))
    for name, (d1, dbig) in fixtures.items():
        w1 = median3(lambda: qs[name](spark, d1))
        wbig = median3(lambda: qs[name](spark, dbig))
        print(
            json.dumps({"q": name, "1x": w1, "10x": wbig,
                        "ratio": round(wbig / w1, 2)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
