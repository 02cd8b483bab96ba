"""Multimodal column plumbing (project brief): image/audio/video as
opaque ``binary`` columns with typed metadata.

The Spark-side architecture is real and tested — schema, partition-
preserving mapInPandas, Arrow batch shapes, deterministic feature
extraction over raw bytes. The actual media decode (PIL/ffmpeg/etc.) is
STUBBED: those libraries are not in this container, so ``decode_*``
raise NotImplementedError unless ``fake=True`` supplies a deterministic
byte-level fake. Swap ``_decode_image_real`` for a PIL call in a real
deployment; nothing else changes.

Design for 100 TB of media:
- payloads stay opaque bytes end-to-end (no JVM<->Python copies beyond
  the Arrow batches that are actually processed);
- mapInPandas streams record batches — peak memory is one Arrow batch,
  not one partition (set spark.sql.execution.arrow.maxRecordsPerBatch
  to bound batch bytes for large assets);
- metadata predicates (modality, mime, dimensions) are plain columns →
  pushed to the scan, so decode only ever sees selected rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _decode_image_real(payload: bytes) -> "object":
    raise NotImplementedError(
        "media decode requires an image library (e.g. PIL) not present "
        "in this container; pass fake=True for the deterministic fake"
    )


def _byte_features(payload: bytes, n_buckets: int = 16) -> tuple:
    """Deterministic byte-level fake 'decode': histogram over byte
    values as the feature vector + simple statistics."""
    import math

    if payload is None:
        return None, None, None, None
    n = len(payload)
    if n == 0:
        return 0, 0.0, 0.0, [0.0] * n_buckets
    counts = [0] * n_buckets
    total = 0
    for by in payload:
        counts[by * n_buckets // 256] += 1
        total += by
    probs = [c / n for c in counts]
    entropy = -sum(p * math.log2(p) for p in probs if p > 0)
    return n, round(total / n, 6), round(entropy, 6), [round(p, 6) for p in probs]


def extract_features(
    assets: DataFrame,
    fake: bool = True,
    modalities: tuple[str, ...] = ("image", "audio", "video"),
) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Filter on metadata BEFORE this operator — the modality predicate
    here is a safety net, not the access path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                if modality not in modalities:
                    continue
                if not fake:
                    _decode_image_real(payload)  # raises: real decode stub
                n, mean, ent, feat = _byte_features(payload)
                rows.append((asset_id, modality, n, mean, ent, feat))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def frame_sample_plan(
    assets: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling *plan* for video assets: computes the frame
    timestamps to extract from typed metadata (duration_ms), columnar —
    the decode of those frames would run through extract_features.
    Output: asset_id, frame_ts_ms (exploded)."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    ts = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    return (
        assets.where(F.col("modality") == "video")
        .where(F.col("duration_ms").isNotNull())
        .select(
            "asset_id",
            F.explode(F.transform(ts, lambda i: i * every_ms)).alias("frame_ts_ms"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    assets: DataFrame, width: int = 64, height: int = 64, fake: bool = True
) -> DataFrame:
    """Resize image payloads via mapInPandas — the brief's resize op.

    Real deployment: swap the fake for a PIL ``Image.resize`` call;
    the Spark plumbing (schema, Arrow batches, metadata update) is
    identical. The deterministic fake treats the payload as a byte
    grid and nearest-neighbor-samples it to width*height bytes, so
    output sizes, schema, and partitioning are exercised for real.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "image":
                    continue
                if not fake:
                    _decode_image_real(payload)  # raises: real decode stub
                buf = bytes(payload or b"")
                if buf:
                    step = max(len(buf) / target, 1e-9)
                    out = bytes(
                        buf[min(int(i * step), len(buf) - 1)]
                        for i in range(target)
                    )
                else:
                    out = bytes(target)
                rows.append((asset_id, modality, out, width, height))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        run, RESIZED_SCHEMA
    )


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat document text bytes as an
    opaque payload so the multimodal plumbing runs on real testdata."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
    )
