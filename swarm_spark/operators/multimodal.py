"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched mapInPandas.

The decode kernels themselves are STUBS in this container (no
PIL/ffmpeg/soundfile): `decoder="fake"` produces deterministic
synthetic features from the byte content so the Spark-side plumbing —
schema, batch shape, partition sizing, UDF signature — is real and
tested; `decoder="real"` raises NotImplementedError until the codec
libraries are installed (import-gated, never at module import time).

Design for 100 TB of media:
  * binary payloads stay OUT of shuffles — features are extracted in a
    narrow mapInPandas pass and the payload column is dropped
    immediately after, so downstream stages move only small vectors.
  * maxRecordsPerBatch bounds Arrow batch memory (set per-job when
    rows are megabytes).
  * frame sampling / chunking fan-out happens inside the iterator, so
    one input row can yield many feature rows without a Spark explode
    of the blob.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes bigint, sha256 string, "
    "feature array<float>, frame_idx int"
)


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decode→embed kernel: features
    are a seeded hash expansion of the bytes (stable across runs)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def extract_features(
    df: DataFrame,
    decoder="fake",
    frames_per_video: int = 3,
    feature_dim: int = 16,
) -> DataFrame:
    """mapInPandas feature extraction. One output row per image/audio,
    frames_per_video rows per video (frame sampling fan-out inside the
    iterator — the blob never passes through an explode).

    decoder: 'fake' (deterministic hash-expansion kernel), 'real'
    (NotImplementedError until codec libs exist), or any CALLABLE
    ``(payload: bytes, dim: int) -> np.ndarray`` — the injection point
    for a real decode→embed kernel; the Spark-side plumbing (schema,
    batching, fan-out, payload lifecycle) is identical for all three.

    The batch loop iterates column ARRAYS via zip (per-blob work is
    inherently per-row, but pandas iterrows adds ~10× constant
    overhead the kernel never needs to pay)."""
    if decoder == "real":
        # stdlib-real: png + 16-bit pcm wav decode fully (media_codecs);
        # codec-library formats (jpeg/mp3/mp4...) raise inside the
        # kernel — the capability boundary, narrowed to where the
        # stdlib truly cannot go
        from .media_codecs import real_feature_kernel

        kernel = real_feature_kernel
    elif decoder == "fake":
        kernel = _fake_decode
    elif callable(decoder):
        kernel = decoder
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, feats = [], [], []
            n_bytes, shas, fidxs = [], [], []
            # zip over raw numpy columns — no per-row pandas Series
            for mid, kind, payload in zip(
                pdf["media_id"].to_numpy(),
                pdf["kind"].to_numpy(),
                pdf["payload"].to_numpy(),
            ):
                buf = bytes(payload) if payload is not None else b""
                n_frames = frames_per_video if kind == "video" else 1
                sha = hashlib.sha256(buf).hexdigest()
                for fi in range(n_frames):
                    # frame sampling: deterministic per-frame salt
                    feat = kernel(buf + fi.to_bytes(4, "big"), feature_dim)
                    ids.append(mid)
                    kinds.append(kind)
                    n_bytes.append(len(buf))
                    shas.append(sha)
                    feats.append(feat.tolist())
                    fidxs.append(fi)
            yield pd.DataFrame({
                "media_id": ids, "kind": kinds, "n_bytes": n_bytes,
                "sha256": shas, "feature": feats, "frame_idx": fidxs,
            })

    # drop the payload column in the SAME pass: downstream moves vectors only
    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


DECODE_SCHEMA = (
    "media_id string, fmt string, width int, height int, n_channels int, "
    "n_samples int, framerate int, duration_ms int, "
    "value_mean double, value_min int, value_max int"
)


def decode_media(df: DataFrame, on_error: str = "raise") -> DataFrame:
    """Real metadata extraction over a binary media column: one
    mapInPandas pass per partition decodes each payload with the
    stdlib codecs (media_codecs.decode_meta — png + pcm wav) and drops
    the blob in the same projection, so only the small typed metadata
    row ever moves downstream (the 100 TB contract shared with
    extract_features).

    on_error: 'raise' propagates NotImplementedError for codec-library
    formats; 'null' emits the row with fmt=sniff(payload) and all
    decoded fields NULL — the triage mode for mixed-format lakes."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error={on_error!r}")
    from .media_codecs import decode_meta, sniff

    cols = [f.split(" ")[0] for f in DECODE_SCHEMA.split(", ")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy()
            ):
                buf = bytes(payload) if payload is not None else b""
                try:
                    meta = decode_meta(buf)
                except NotImplementedError:
                    if on_error == "raise":
                        raise
                    meta = {c: None for c in cols[1:]}
                    meta["fmt"] = sniff(buf)
                rows.append({"media_id": mid, **meta})
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id string, payload binary, width int, height int, "
    "n_channels int, src_width int, src_height int"
)


def resize_images(df: DataFrame, width: int, height: int,
                  on_error: str = "raise") -> DataFrame:
    """REAL image resize over a binary PNG column: decode with the
    stdlib codec, nearest-neighbor sample to (width, height) in one
    vectorized numpy gather, re-encode PNG — all inside a single
    mapInPandas pass, so payloads stream through each partition once
    and never shuffle. Nearest-neighbor is deterministic (index
    arithmetic only, no resampling-kernel float policy), which keeps
    the output byte-reproducible across engines and retries — the
    property every other operator here is built around. Non-PNG /
    codec-library formats follow decode_media's contract: 'raise'
    (default) or 'null' (payload NULL, src dims NULL — triage mode).

    The thumbnail-at-scale shape: output rows carry the RESIZED
    payload (target-size-bounded), so downstream stages shuffle
    thumbnails, not originals."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error={on_error!r}")
    if width <= 0 or height <= 0:
        raise ValueError("target dims must be positive")
    from .media_codecs import png_decode, png_encode, sniff

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy()
            ):
                buf = bytes(payload) if payload is not None else b""
                if sniff(buf) != "png":
                    if on_error == "raise":
                        raise NotImplementedError(
                            f"resize_images: payload for {mid!r} is not PNG "
                            "(codec-library formats are a documented boundary)"
                        )
                    rows.append({"media_id": mid, "payload": None,
                                 "width": width, "height": height,
                                 "n_channels": None,
                                 "src_width": None, "src_height": None})
                    continue
                w0, h0, c, px = png_decode(buf)
                ys = (np.arange(height) * h0) // height
                xs = (np.arange(width) * w0) // width
                out = px[ys][:, xs]  # vectorized nearest-neighbor gather
                rows.append({"media_id": mid, "payload": png_encode(out),
                             "width": width, "height": height,
                             "n_channels": c,
                             "src_width": w0, "src_height": h0})
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height",
                               "n_channels", "src_width", "src_height"])

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


def media_from_documents(docs: DataFrame, limit_ids: int | None = 100) -> DataFrame:
    """Deterministic media table derived from the documents corpus:
    payload = utf-8 bytes of the text, kind cycles by doc_id % 3.
    Every derived value (n_bytes, sha256, frame fan-out) is therefore
    recomputable in plain SQL — the oracle-checkable media fixture
    (unlike synthetic_media, which exists only Spark-side)."""
    from pyspark.sql import functions as F

    m = docs
    if limit_ids is not None:
        m = m.filter(F.col("doc_id") < limit_ids)  # deterministic subset
    return m.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def encoded_media_from_documents(docs: DataFrame, limit_ids: int = 100) -> DataFrame:
    """REAL-encoded deterministic media fixture: even doc_ids become
    8-bit grayscale PNGs, odd doc_ids 16-bit PCM WAVs, with pixel /
    sample values generated by closed-form doc_id formulas —

        png: w = id%16+4, h = id%8+3, pixel[i] = (i*(id%5+1)) % 256
        wav: n = id%50+20, rate 8000, sample[i] = (i*(id%7+1)) % 200 - 100

    so after a real encode→decode roundtrip (media_codecs) EVERY
    decoded value (dims, channels, duration, mean/min/max) is
    predictable arithmetically — the DuckDB oracle for decode_media
    recomputes them from the same formulas without touching a byte
    (__spark_entry__.oracle_sql()['media_decode'])."""
    from pyspark.sql import functions as F

    from .media_codecs import png_encode, wav_encode

    base = docs.filter(F.col("doc_id") < limit_ids).select(
        F.col("doc_id").cast("long").alias("doc_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for d in pdf["doc_id"].to_numpy():
                d = int(d)
                if d % 2 == 0:
                    w, h, step = d % 16 + 4, d % 8 + 3, d % 5 + 1
                    px = (np.arange(w * h) * step % 256).astype(np.uint8)
                    kinds.append("image")
                    payloads.append(png_encode(px.reshape(h, w)))
                else:
                    n, step = d % 50 + 20, d % 7 + 1
                    s = (np.arange(n) * step % 200 - 100).astype(np.int16)
                    kinds.append("audio")
                    payloads.append(wav_encode(s, framerate=8000))
                ids.append(str(d))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads}
            )

    return base.mapInPandas(gen, "media_id string, kind string, payload binary")


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic binary fixtures for the plumbing tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (i % 7 + 1)
        rows.append((
            f"m{i:05d}", kind,
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            64 + i % 512 if kind != "audio" else None,
            64 + (i * 3) % 512 if kind != "audio" else None,
            1000 * (i % 30 + 1) if kind != "image" else None,
            bytearray(payload),
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
