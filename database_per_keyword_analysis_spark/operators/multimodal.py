"""Multimodal-column operators (north star; SURVEY.md §2.11).

The reference corpus is text-only (/root/reference/main.py — no binary
columns anywhere), but a training-data pipeline at 100 TB carries
image/audio/video payloads.  The model here: media is an opaque
``binary`` column plus a typed metadata struct; decode / feature-extract
/ frame-sample are Arrow-batched ``mapInPandas`` stages so the heavy
bytes never leave the executor as Python objects row-by-row.

The actual codec step is STUBBED (image/audio libs are not in this
container): ``decode_media`` either raises ``NotImplementedError`` (real
decoder path) or applies a deterministic fake decode (mean byte value /
pseudo sample count) so the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and oracle-checkable.

Scale notes: every operator here is a single projection pass (no
shuffle).  ``mapInPandas`` streams Arrow batches, so a 100 TB corpus of
multi-MB payloads flows batch-by-batch without materializing a partition
in memory; payload bytes are column-pruned away the moment features are
extracted.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ["image", "audio", "video"]
MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}

#: frames sampled per video by default
N_FRAME_SAMPLES = 8

META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.IntegerType()),
    ]
)


def with_media_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stage the `documents` fixture as a multimodal corpus: an opaque
    binary ``payload`` plus a typed ``meta`` struct, all derived
    deterministically from existing columns (no randomness — the oracle
    must reproduce it).

    In a real pipeline this is the ingest schema itself; here it makes
    the text fixture exercise binary-column plumbing.
    """
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    mime_map = F.create_map(
        *[x for k in MEDIA_KINDS for x in (F.lit(k), F.lit(MIMES[k]))]
    )
    return docs.where(F.col(text_col).isNotNull()).select(
        "doc_id",
        kind.alias("media_kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            mime_map[kind].alias("mime"),
            (16 + (F.col("doc_id") % 64) * 16).cast("int").alias("width"),
            (16 + (F.col("doc_id") % 48) * 16).cast("int").alias("height"),
            (1 + F.col("doc_id") % 30).cast("int").alias("duration_s"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def extract_byte_features(media: DataFrame) -> DataFrame:
    """Codec-independent byte features via Arrow-batched ``mapInPandas``:
    size, digest, magic-bytes prefix.  This is the real plumbing a
    decode stage rides on — binary columns in, typed features out,
    payload pruned from the output schema."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "head_hex": pdf["payload"].map(lambda b: bytes(b)[:8].hex()),
                }
            )

    return media.select("doc_id", "media_kind", "payload").mapInPandas(
        batches, _FEATURE_SCHEMA
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("n_units", T.LongType()),
    ]
)


def available_codecs() -> dict:
    """Attempt-import the optional media codecs: PIL for images,
    soundfile for audio.  Returns {kind: module}; empty where the
    container has neither (the baked-in sandbox case)."""
    av: dict = {}
    try:
        from PIL import Image

        av["image"] = Image
    except ImportError:
        pass
    try:
        import soundfile

        av["audio"] = soundfile
    except ImportError:
        pass
    return av


def decode_media(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """Decode stage.  ``fake=True`` (default in this container) applies a
    deterministic stand-in decode — mean byte value as a proxy for "mean
    pixel/sample", unit count = byte count.  ``fake=False`` decodes with
    the REAL codecs where importable (PIL → grayscale mean pixel +
    pixel count; soundfile → mean |sample| + sample count); kinds whose
    codec is absent fall back per-row to the byte proxy, and the call
    raises ``NotImplementedError`` only when NO codec is importable at
    all.  Either way the Spark plumbing is identical: binary column in,
    typed features out via Arrow-batched ``mapInPandas``, payload pruned
    from the output schema."""
    if not fake:
        if not available_codecs():  # driver-side early error beats 32 task errors
            raise NotImplementedError(
                "real media decode needs PIL (images) and/or soundfile "
                "(audio); neither is importable here — use fake=True for "
                "the deterministic stand-in"
            )

        def real_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            import numpy as np

            codecs = available_codecs()  # re-import on the executor
            for pdf in it:
                means: list[float | None] = []
                units: list[int] = []
                for kind, payload in zip(pdf["media_kind"], pdf["payload"]):
                    b = bytes(payload)
                    if kind == "image" and "image" in codecs:
                        arr = np.asarray(
                            codecs["image"].open(io.BytesIO(b)).convert("L"),
                            dtype=np.float64,
                        )
                        means.append(float(arr.mean()) if arr.size else None)
                        units.append(int(arr.size))
                    elif kind == "audio" and "audio" in codecs:
                        data, _sr = codecs["audio"].read(io.BytesIO(b))
                        data = np.asarray(data, dtype=np.float64)
                        means.append(float(np.abs(data).mean()) if data.size else None)
                        units.append(int(data.size))
                    else:  # no codec for this kind: byte proxy
                        means.append(sum(b) / len(b) if b else None)
                        units.append(len(b))
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media_kind": pdf["media_kind"],
                        "mean_byte": pd.Series(means, dtype="float64"),
                        "n_units": pd.Series(units, dtype="int64"),
                    }
                )

        return media.select("doc_id", "media_kind", "payload").mapInPandas(
            real_batches, _DECODE_SCHEMA
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = pdf["payload"].map(bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_kind": pdf["media_kind"],
                    "mean_byte": raw.map(
                        lambda b: sum(b) / len(b) if b else None
                    ).astype("float64"),
                    "n_units": raw.map(len).astype("int64"),
                }
            )

    return media.select("doc_id", "media_kind", "payload").mapInPandas(
        batches, _DECODE_SCHEMA
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("in_width", T.IntegerType()),
        T.StructField("in_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("n_bytes_out", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(
    media: DataFrame, max_w: int = 64, max_h: int = 64, *, fake: bool = True
) -> DataFrame:
    """Resize stage for image payloads (brief: decode / feature-extract /
    resize / frame-sample).  Only ``media_kind == 'image'`` rows are
    processed; the payload stays binary in → binary out.

    ``fake=True`` (this container): deterministic integer-stride
    downsample — stride = max(1, ceil(w/max_w), ceil(h/max_h)), output
    dims = ceil(dim/stride), output payload = every stride-th byte
    (len = ceil(n/stride)).  Pure arithmetic, so dims and byte counts
    replay in SQL for the oracle.  ``fake=False``: PIL decode →
    aspect-preserving thumbnail ≤ (max_w, max_h) → PNG re-encode;
    payloads PIL cannot parse fall back per-row to the stride fake, and
    the call raises ``NotImplementedError`` when PIL is absent.  Same
    Arrow ``mapInPandas`` plumbing either way — at 100 TB this is one
    projection pass, no shuffle, batches streaming through executors.
    """
    if not fake and "image" not in available_codecs():
        raise NotImplementedError(
            "real image resize needs PIL; not importable here — use "
            "fake=True for the deterministic stride downsample"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import math

        pil = None if fake else available_codecs().get("image")
        for pdf in it:
            out_rows = []
            for doc_id, payload, w, h in zip(
                pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                b = bytes(payload)
                if pil is not None:
                    try:
                        img = pil.open(io.BytesIO(b))
                        img.thumbnail((max_w, max_h))
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                        out_rows.append(
                            (doc_id, w, h, img.width, img.height,
                             buf.tell(), buf.getvalue())
                        )
                        continue
                    except Exception:
                        pass  # not a parseable image: stride fallback
                stride = max(1, math.ceil(w / max_w), math.ceil(h / max_h))
                out = b[::stride]
                out_rows.append(
                    (doc_id, w, h, math.ceil(w / stride),
                     math.ceil(h / stride), len(out), out)
                )
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "doc_id", "in_width", "in_height", "out_width",
                    "out_height", "n_bytes_out", "payload",
                ],
            ).astype({"n_bytes_out": "int64"})

    return (
        media.where(F.col("media_kind") == "image")
        .select(
            "doc_id", "payload",
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
        )
        .mapInPandas(batches, _RESIZE_SCHEMA)
    )


def sample_frame_offsets(
    media: DataFrame, n_samples: int = N_FRAME_SAMPLES
) -> DataFrame:
    """Even-spaced frame-sampling plan for video payloads: one row per
    (doc, frame_s).  Pure built-ins (`sequence` + `explode`) — the frame
    *plan* needs no decode; a downstream ``mapInPandas`` decoder consumes
    it.  At scale this is the operator that turns a 100 TB video corpus
    into a bounded per-video sample without reading frames you skip."""
    dur = F.col("meta.duration_s")
    step = F.greatest(F.lit(1), F.ceil(dur / F.lit(n_samples))).cast("int")
    return (
        media.where(F.col("media_kind") == "video")
        .select(
            "doc_id",
            dur.alias("duration_s"),
            F.explode(F.sequence(F.lit(0), dur - 1, step)).alias("frame_s"),
        )
        .select("doc_id", "duration_s", F.col("frame_s").cast("int").alias("frame_s"))
    )


_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)

PHASH_BITS = 64


def perceptual_hash(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """64-bit average-hash (aHash) per media payload — the standard
    perceptual fingerprint for image near-dup detection: bit b is set
    iff region b's mean intensity exceeds the global mean, so the hash
    survives re-encoding, mild crops, and brightness shifts that break
    exact digests.

    ``fake=True`` (this container): the SAME aHash construction over
    the raw byte signal — payload split into 64 contiguous chunks, bit
    = chunk mean > global byte mean (deterministic, codec-free; empty
    chunks read as 0).  ``fake=False``: images decode via PIL to an 8×8
    grayscale thumbnail (the canonical aHash); kinds without a codec
    fall back per-row to the byte-chunk form, and the call raises
    ``NotImplementedError`` only when no codec imports at all —
    `decode_media`'s exact gating pattern.

    Scale shape: one Arrow `mapInPandas` projection, zero shuffle;
    payload bytes are pruned from the output."""
    if not fake and not available_codecs():
        raise NotImplementedError(
            "real perceptual hashing needs PIL; not importable here — "
            "use fake=True for the byte-signal aHash"
        )
    use_real = not fake

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        codecs = available_codecs() if use_real else {}

        def byte_ahash(b: bytes) -> int:
            if not b:
                return 0
            arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            n, total = len(arr), int(arr.sum())
            # chunk mean > global mean, as EXACT integer
            # cross-multiplication (sum_c/len_c > total/n ⇔
            # sum_c·n > total·len_c) — bit decisions never touch
            # floats, so the DuckDB oracle reproduces them exactly.
            if n < PHASH_BITS:
                # tiny payloads have EMPTY chunks, which reduceat cannot
                # express — keep the chunked reference form (rare, cheap)
                chunks = np.array_split(arr, PHASH_BITS)
                v = 0
                for i, c in enumerate(chunks):
                    if c.size and int(c.sum()) * n > total * len(c):
                        v |= 1 << i
                return v - (1 << 64) if v >= (1 << 63) else v
            # vectorized chunk sums (r14, guide §4.2): one reduceat pass
            # replaces 64 array_split allocations + 64 .sum() calls per
            # row; boundaries replicate np.array_split exactly (first
            # n % 64 chunks one element longer).  The ≤64 bit decisions
            # stay Python-int exact (no int64 overflow at any size).
            div, mod = divmod(n, PHASH_BITS)
            sizes = [div + 1] * mod + [div] * (PHASH_BITS - mod)
            starts = np.zeros(PHASH_BITS, dtype=np.int64)
            np.cumsum(np.asarray(sizes[:-1], dtype=np.int64), out=starts[1:])
            sums = np.add.reduceat(arr, starts)
            v = 0
            for i in range(PHASH_BITS):
                if int(sums[i]) * n > total * sizes[i]:
                    v |= 1 << i
            return v - (1 << 64) if v >= (1 << 63) else v

        def image_ahash(b: bytes) -> int:
            img = codecs["image"].open(io.BytesIO(b)).convert("L").resize((8, 8))
            arr = np.asarray(img, dtype=np.float64).ravel()
            gmean = float(arr.mean())
            v = 0
            for i, px in enumerate(arr):
                if px > gmean:
                    v |= 1 << i
            return v - (1 << 64) if v >= (1 << 63) else v

        for pdf in it:
            hashes = []
            for kind, payload in zip(pdf["media_kind"], pdf["payload"]):
                b = bytes(payload)
                if use_real and kind == "image" and "image" in codecs:
                    hashes.append(image_ahash(b))
                else:
                    hashes.append(byte_ahash(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_kind": pdf["media_kind"],
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.select("doc_id", "media_kind", "payload").mapInPandas(
        batches, _PHASH_SCHEMA
    )


def media_phash_dups(media: DataFrame, max_hamming: int = 2, *, fake: bool = True) -> DataFrame:
    """Perceptual near-duplicate media pairs: aHash fingerprints →
    pigeonhole-blocked Hamming join (operators/dedup.py:
    hamming_pairs_blocked — the simhash tier's exact-recall blocking,
    no all-pairs product).  Returns (doc_a, doc_b, hamming) with
    hamming ≤ `max_hamming` — the image-dedup tier of the multimodal
    column, feeding the same dup_groups/keeper machinery as the text
    tiers."""
    from .dedup import hamming_pairs_blocked

    return hamming_pairs_blocked(
        perceptual_hash(media, fake=fake),
        fp_col="phash",
        bits=PHASH_BITS,
        max_hamming=max_hamming,
    )
