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


def test_real_decode_gate(spark, sf_dir):
    """fake=False raises ONLY when no codec is importable; with PIL
    present it must run (covered by test_real_decode_with_pil)."""
    if MM.available_codecs():
        pytest.skip("codec importable here; real path covered below")
    with pytest.raises(NotImplementedError):
        MM.decode_media(_media(spark, sf_dir), fake=False)


def test_real_decode_with_pil(spark, sf_dir):
    """Real codec path: decode an actual in-memory PNG and check the
    mean-pixel / pixel-count against known values.  Skips where PIL is
    not importable (this container); runs wherever deps exist."""
    codecs = MM.available_codecs()
    if "image" not in codecs:
        pytest.skip("PIL not importable in this container")
    import io

    img = codecs["image"].new("L", (4, 2), color=7)  # 8 px, all value 7
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()))],
        "doc_id long, media_kind string, payload binary",
    )
    out = MM.decode_media(df, fake=False).collect()[0]
    assert out.n_units == 8
    assert out.mean_byte == pytest.approx(7.0)


def test_real_decode_unknown_kind_falls_back_to_byte_proxy(spark):
    """A kind with no codec (video) must fall back per-row to the byte
    proxy, not fail the batch — mixed corpora are the normal case."""
    if not MM.available_codecs():
        pytest.skip("no codec importable; fake=False raises by contract")
    payload = bytes([10, 20, 30])
    df = spark.createDataFrame(
        [(1, "video", bytearray(payload))],
        "doc_id long, media_kind string, payload binary",
    )
    out = MM.decode_media(df, fake=False).collect()[0]
    assert out.n_units == 3
    assert out.mean_byte == pytest.approx(20.0)


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


def test_fake_resize_stride_semantics(spark, sf_dir):
    """Fake resize: stride = max(1, ceil(w/max_w), ceil(h/max_h)); output
    dims/bytes = ceil(in/stride); payload is every stride-th byte."""
    import math

    m = _media(spark, sf_dir).where(F.col("doc_id") < 30)
    src = {r.doc_id: r for r in m.where(F.col("media_kind") == "image").collect()}
    out = {r.doc_id: r for r in MM.resize_media(m, 64, 64).collect()}
    assert set(out) == set(src), "resize must cover exactly the image rows"
    for doc_id, r in out.items():
        w, h = src[doc_id].meta.width, src[doc_id].meta.height
        b = bytes(src[doc_id].payload)
        stride = max(1, math.ceil(w / 64), math.ceil(h / 64))
        assert (r.in_width, r.in_height) == (w, h)
        assert r.out_width == math.ceil(w / stride) <= 64
        assert r.out_height == math.ceil(h / stride) <= 64
        assert bytes(r.payload) == b[::stride]
        assert r.n_bytes_out == len(b[::stride])


def test_real_resize_gate(spark, sf_dir):
    if "image" in MM.available_codecs():
        pytest.skip("PIL importable; real path covered below")
    with pytest.raises(NotImplementedError):
        MM.resize_media(_media(spark, sf_dir), fake=False)


def test_real_resize_with_pil(spark):
    """Real path: a 100x40 PNG thumbnails to fit 64x64 preserving aspect
    (64x25 or 64x26 depending on PIL rounding); output re-encodes as PNG."""
    codecs = MM.available_codecs()
    if "image" not in codecs:
        pytest.skip("PIL not importable in this container")
    import io

    img = codecs["image"].new("L", (100, 40), color=3)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()), (None, 100, 40, None))],
        "doc_id long, media_kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_s:int>",
    )
    out = MM.resize_media(df, 64, 64, fake=False).collect()[0]
    assert out.out_width == 64 and out.out_height in (25, 26)
    assert bytes(out.payload)[:8] == b"\x89PNG\r\n\x1a\n"


def _media_rows(spark, rows):
    return spark.createDataFrame(
        [(i, "image", bytearray(b)) for i, b in rows],
        "doc_id long, media_kind string, payload binary",
    )


def test_perceptual_hash_byte_ahash_hand_checked(spark):
    # payload of 128 bytes: first half zeros, second half 255s ->
    # chunks 0-31 mean 0 (< global 127.5, bits clear), 32-63 mean 255
    # (> global, bits set) -> phash = bits 32..63 set
    b = bytes([0] * 64 + [255] * 64)
    out = MM.perceptual_hash(_media_rows(spark, [(1, b)])).collect()[0]
    expected = sum(1 << i for i in range(32, 64))
    expected = expected - (1 << 64) if expected >= (1 << 63) else expected
    assert out.phash == expected


def test_perceptual_hash_empty_payload_is_zero(spark):
    out = MM.perceptual_hash(_media_rows(spark, [(1, b"")])).collect()[0]
    assert out.phash == 0


def test_phash_dups_blocked_equals_brute_force(spark):
    import itertools

    base = bytes(range(256)) * 4
    near = bytearray(base)
    near[10] = 255          # perturb one chunk's mean
    far = bytes(reversed(base))
    rows = [(1, base), (2, bytes(near)), (3, far), (4, base)]
    media = _media_rows(spark, rows)
    got = [
        (r.doc_a, r.doc_b, r.hamming)
        for r in MM.media_phash_dups(media, max_hamming=4).collect()
    ]
    # brute force over the same hashes
    hashes = {
        r.doc_id: r.phash for r in MM.perceptual_hash(media).collect()
    }
    exp = sorted(
        (a, b, bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1"))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1") <= 4
    )
    assert sorted(got) == exp
    pairs = {(a, b) for a, b, _ in got}
    assert (1, 4) in pairs          # identical payloads: hamming 0
    assert (1, 2) in pairs          # single-chunk perturbation stays near
    assert (1, 3) not in pairs      # reversed signal lands far


def test_phash_real_gate_raises_without_codecs(spark):
    media = _media_rows(spark, [(1, b"abc")])
    if MM.available_codecs():
        pytest.skip("codecs present; gate not reachable")
    with pytest.raises(NotImplementedError):
        MM.perceptual_hash(media, fake=False)
