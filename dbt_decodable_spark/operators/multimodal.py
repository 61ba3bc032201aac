"""Multimodal column conventions (SURVEY §2.12): image/audio/video as opaque
``BinaryType`` payloads plus typed metadata, with decode / feature-extract
implemented as Arrow-batched ``mapInPandas`` operators.

The container has no image/audio libraries, so the *decode step* is stubbed —
``decode_image_meta_pandas`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested — but the Spark-side plumbing
(schemas, UDF signatures, Arrow batch shapes, partitioning) is real and
tested (``tests/test_multimodal.py``).

At 100 TB: payloads live in parquet binary columns (or are referenced by URI
and read via ``spark.read.format("binaryFile")``); metadata extraction is a
narrow map (no shuffle), and downstream filters on metadata columns prune
before any payload is decoded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MULTIMODAL_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, mime string, fake_width int, fake_height int"
)


def attach_binary_payload(df: DataFrame, text_col: str) -> DataFrame:
    """Model a multimodal row: payload BINARY + mime metadata (here the
    payload is the utf-8 encoded text — a deterministic stand-in for image
    bytes)."""
    return df.withColumn("payload", F.col(text_col).cast("binary")).withColumn(
        "mime", F.lit("text/plain")
    )


def fake_decode_meta(df: DataFrame) -> DataFrame:
    """Deterministic 'decode': byte length + fake dimensions derived from
    n_chars. Pure JVM expressions — the fast path when no real decode is
    needed."""
    return (
        df.withColumn("n_bytes", F.length("payload").cast("bigint"))
        .withColumn("fake_width", (F.col("n_chars") % 512).cast("int"))
        .withColumn("fake_height", (F.col("n_chars") % 384).cast("int"))
    )


def decode_image_meta_pandas(df: DataFrame, use_fake: bool = True) -> DataFrame:
    """The real-decoder plumbing: Arrow-batched ``mapInPandas`` over
    (doc_id, payload, n_chars). With ``use_fake`` the decode is the same
    deterministic function as :func:`fake_decode_meta`; otherwise it raises
    (no imaging libs in this environment — swap in PIL/ffmpeg here)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "real image decode needs PIL/libvips — not available in this container"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "mime": "text/plain",
                    "fake_width": (pdf["n_chars"] % 512).astype("int32"),
                    "fake_height": (pdf["n_chars"] % 384).astype("int32"),
                }
            )

    return df.select("doc_id", "payload", "n_chars").mapInPandas(
        decode, schema=MULTIMODAL_META_SCHEMA
    )


FEATURE_SCHEMA = "doc_id bigint, features array<float>"
FEATURE_COUNT_SCHEMA = "doc_id bigint, features array<bigint>"


def extract_features_pandas(
    df: DataFrame, n_bins: int = 16, normalize: bool = True
) -> DataFrame:
    """Feature extraction over binary payloads: a byte histogram
    (``n_bins`` buckets over 0..255) via Arrow-batched ``mapInPandas`` +
    numpy — L1-normalized float32 by default, raw BIGINT counts with
    ``normalize=False`` (the integer form is bit-exact across engines, so
    the driver-gated query uses it for a value-level oracle). Unlike the
    decode step this needs no imaging library — it is a REAL feature
    extractor (byte-distribution signature, usable for near-dup blocking
    on payloads), and doubles as the reference plumbing for swapping in a
    CNN/CLIP embedder: same signature, same batch shape, same output
    schema as an embedding column."""
    import numpy as np
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype="uint8")
                # bucket = byte·n_bins // 256 — exact for ANY n_bins ≤ 256
                # (a shift by bit_length only works for powers of two: with
                # n_bins=10 it would spread bytes over 8 buckets and leave
                # the top two permanently empty)
                hist = np.bincount(
                    arr.astype("int64") * n_bins // 256, minlength=n_bins
                )[:n_bins]
                if normalize:
                    h = hist.astype("float64")
                    total = h.sum()
                    feats.append((h / total if total else h).astype("float32"))
                else:
                    feats.append(hist.astype("int64"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA if normalize else FEATURE_COUNT_SCHEMA
    )


def resize_image_pandas(
    df: DataFrame, width: int, height: int, use_fake: bool = True
) -> DataFrame:
    """Resize plumbing (same contract as :func:`decode_image_meta_pandas`):
    Arrow-batched ``mapInPandas`` emitting (doc_id, payload, width, height).
    The real branch is environment-gated (PIL/libvips absent); the fake
    branch deterministically truncates/pads the payload to width*height
    bytes so batch shapes and sizes behave like a real resize."""
    import pandas as pd

    n_out = width * height

    def resize(batches):
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "real image resize needs PIL/libvips — not available in this container"
                )
            out = [bytes(p)[:n_out].ljust(n_out, b"\0") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        resize, schema="doc_id bigint, payload binary, width int, height int"
    )


def frame_sample(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video-frame-sampling convention: rows are (doc_id, frame_no, payload);
    keep every nth frame. Expressed as a plain filter so partition pruning
    applies when frame_no is a partition column."""
    return df.filter(F.col("frame_no") % every_nth == 0)
