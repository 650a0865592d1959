"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns next to a
typed metadata struct; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so each Python worker sees whole record
batches, never single rows. The decode kernels themselves are STUBBED
(per build constraints: no image/audio libraries in this container) —
``decode_image`` raises ``NotImplementedError`` unless
``fake_decode=True``, which substitutes a deterministic synthetic
decoder so the Spark-side plumbing (schema, batching, partitioning) is
real and testable end-to-end.

Scale notes:
- Binary blobs dominate row size → ``spark.sql.files.maxPartitionBytes``
  and explicit ``repartition`` keep batches within worker memory.
- Metadata-only predicates (width/height/mime filters) are plain
  column filters that prune before any Python decode runs — the
  expensive stage sees only surviving rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload_hash", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic fake media table from ``documents``:
    payload = UTF-8 bytes of the text (stand-in for image bytes),
    metadata derived from doc stats. Used because the test corpus has
    no native binary column; the downstream operators only see
    (binary, metadata) and do not care."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
        (F.length("text") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
    )


def decode_image(payload: bytes) -> object:
    """Real decoder stub — image libs are not available in this
    container. Plug Pillow/torchvision here in production."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake_decode=True for the deterministic stand-in"
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in 'embedding': byte-sum folded per stripe."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, byte in enumerate(payload):
        acc[i % dim] += byte
    total = max(sum(acc), 1)
    return [round(v / total, 6) for v in acc]


def extract_features(
    media: DataFrame, fake_decode: bool = False, dim: int = 8
) -> DataFrame:
    """Batch feature extraction over the binary column via
    ``mapInPandas`` (Arrow record batches in/out; one Python process
    per task, amortized over thousands of rows)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake_decode:
                # Exercise the real path so the stub is honest.
                for payload in pdf["payload"]:
                    decode_image(payload)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ).astype("int32"),
                    # cheap stable content hash (FNV-1a over bytes)
                    "payload_hash": pdf["payload"].map(_fnv1a),
                    "feature": pdf["payload"].map(
                        lambda b: _fake_features(b, dim)
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def _fnv1a(payload: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in payload or b"":
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    # fold to signed 64-bit for Spark LongType
    return h - (1 << 64) if h >= (1 << 63) else h


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("orig_width", T.IntegerType()),
        T.StructField("orig_height", T.IntegerType()),
    ]
)


def resize(
    media: DataFrame, target_w: int, target_h: int, fake_decode: bool = False
) -> DataFrame:
    """Batch resize over the binary column (``mapInPandas``).

    The pixel kernel is stubbed like ``decode_image`` — in production
    the decode→resize→re-encode happens here on the Arrow batch. The
    engine-side contract (schema in/out, metadata rewrite, original
    dims preserved, batch shape) is real and tested. With
    ``fake_decode`` the payload passes through unchanged and only the
    typed metadata is rewritten — deterministic, so downstream
    operators can be tested end-to-end."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake_decode:
                for payload in pdf["payload"]:
                    decode_image(payload)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],
                    "mime": pdf["mime"],
                    "width": target_w,
                    "height": target_h,
                    "orig_width": pdf["width"],
                    "orig_height": pdf["height"],
                }
            )
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling stand-in: keeps rows whose id falls on
    the sampling grid — the real operator applies the same predicate to
    frame indexes inside a decoded container (stubbed decode)."""
    return media.filter(F.col("media_id") % every_n == 0)
