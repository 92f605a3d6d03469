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
        raise NotImplementedError(
            "real decoders need PIL/soundfile/ffmpeg — not in this container; "
            "pass a callable kernel (bytes, dim) -> np.ndarray instead"
        )
    if decoder == "fake":
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
