from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_per_keyword_analysis_spark.operators import multimodal as MM
from database_per_keyword_analysis_spark.sources import load


def _media(spark, sf_dir):
    return MM.with_media_payload(load(spark, sf_dir, "documents"))


def test_payload_schema(spark, sf_dir):
    m = _media(spark, sf_dir)
    schema = dict(zip(m.schema.names, [f.dataType for f in m.schema.fields]))
    assert isinstance(schema["payload"], T.BinaryType)
    meta = schema["meta"]
    assert isinstance(meta, T.StructType)
    assert meta.names == ["mime", "width", "height", "duration_s"]
    kinds = {r.media_kind for r in m.select("media_kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_byte_features_match_hashlib(spark, sf_dir):
    m = _media(spark, sf_dir).where(F.col("doc_id") < 5)
    feats = {r.doc_id: r for r in MM.extract_byte_features(m).collect()}
    for row in m.collect():
        b = bytes(row.payload)
        f = feats[row.doc_id]
        assert f.n_bytes == len(b)
        assert f.payload_md5 == hashlib.md5(b).hexdigest()
        assert f.head_hex == b[:8].hex()


def test_fake_decode_deterministic(spark, sf_dir):
    m = _media(spark, sf_dir).where(F.col("doc_id") < 5)
    a = {r.doc_id: (r.mean_byte, r.n_units) for r in MM.decode_media(m).collect()}
    b = {r.doc_id: (r.mean_byte, r.n_units) for r in MM.decode_media(m).collect()}
    assert a == b
    for row in m.collect():
        raw = bytes(row.payload)
        assert a[row.doc_id] == (sum(raw) / len(raw), len(raw))


def test_real_decode_is_stubbed(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        MM.decode_media(_media(spark, sf_dir), fake=False)


def test_frame_sampling_spacing(spark, sf_dir):
    m = _media(spark, sf_dir)
    frames = MM.sample_frame_offsets(m, n_samples=8)
    by_doc: dict[int, list[int]] = {}
    durs: dict[int, int] = {}
    for r in frames.collect():
        by_doc.setdefault(r.doc_id, []).append(r.frame_s)
        durs[r.doc_id] = r.duration_s
    assert by_doc, "no video rows sampled"
    for doc_id, offs in by_doc.items():
        d = durs[doc_id]
        step = max(1, -(-d // 8))
        assert sorted(offs) == list(range(0, d, step))
        assert len(offs) <= 8 + 1
    # only video rows
    kinds = {
        r.media_kind
        for r in m.join(frames.select("doc_id").distinct(), "doc_id").select(
            "media_kind"
        ).distinct().collect()
    }
    assert kinds == {"video"}
