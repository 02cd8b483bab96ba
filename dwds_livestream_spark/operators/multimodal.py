"""Multimodal column plumbing (project brief): image/audio/video as
opaque ``binary`` columns with typed metadata.

The Spark-side architecture is real and tested — schema, partition-
preserving mapInPandas, Arrow batch shapes, deterministic feature
extraction over raw bytes. Image decode is REAL when Pillow is
importable (``fake=False`` decodes/resizes via PIL inside the Arrow
workers); when it is not, ``fake=False`` raises NotImplementedError
(honest gate — never a silent fake), and ``fake=True`` supplies a
deterministic byte-level fake with the SAME output schema either way.
Audio/video decode (ffmpeg) stays stubbed in real mode.

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
    """Decode image bytes with Pillow. Imported lazily INSIDE the Arrow
    worker (executors are separate processes; the driver never needs
    the dependency). Raises NotImplementedError when Pillow is absent —
    an honest gate, never a silent fallback to the fake."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - exercised w/o PIL
        raise NotImplementedError(
            "real media decode requires Pillow, which is not installed; "
            "pass fake=True for the deterministic byte-level fake"
        ) from exc
    import io

    return Image.open(io.BytesIO(bytes(payload)))


def _image_features(payload: bytes, n_buckets: int = 16) -> tuple:
    """Real decode path: luminance statistics with the same output
    shape as the byte-level fake (n_bytes, mean, entropy, histogram
    feature vector) so downstream schemas are identical."""
    import math

    if payload is None:
        return None, None, None, None
    gray = _decode_image_real(payload).convert("L")
    hist = gray.histogram()  # 256 luminance counts
    n_px = sum(hist)
    if n_px == 0:
        return len(payload), 0.0, 0.0, [0.0] * n_buckets
    buckets = [
        sum(hist[b * 256 // n_buckets : (b + 1) * 256 // n_buckets])
        for b in range(n_buckets)
    ]
    entropy = -sum(
        (c / n_px) * math.log2(c / n_px) for c in buckets if c > 0
    )
    # mean = sum(v*c)/n_px and bucket probs are exact integer rationals:
    # round them with _round6_exact like the fake path, so both paths
    # share tie-break semantics and a future oracle/cross-engine check
    # can't flake on the x.xxxxxx5 grid (the seasonal_decompose class).
    return (
        len(payload),
        _round6_exact(sum(v * c for v, c in enumerate(hist)), n_px),
        round(entropy, 6),
        [_round6_exact(c, n_px) for c in buckets],
    )


def _round6_exact(num: int, den: int) -> float:
    """round(num/den, 6) with half-up tie-breaking done in INTEGER
    arithmetic: floor((num*1e6)/den + 1/2) microunits. Exact rationals
    like byte means sit on the x.xxxxxx5 grid routinely, and binary
    doubles round such ties by representation error (the
    seasonal_decompose lesson) — engine-independent output needs the
    tie broken before the value ever becomes a double."""
    return (2_000_000 * num + den) // (2 * den) / 1e6


def _byte_features(payload: bytes, n_buckets: int = 16) -> tuple:
    """Deterministic byte-level fake 'decode': histogram over byte
    values as the feature vector + simple statistics. Rationals
    (mean, bucket probabilities) are rounded in exact integer
    arithmetic so any engine can reproduce the output bit-for-bit."""
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
    entropy = -sum(
        (c / n) * math.log2(c / n) for c in counts if c > 0
    )
    return (
        n,
        _round6_exact(total, n),
        round(entropy, 6),
        [_round6_exact(c, n) for c in counts],
    )


def extract_features(
    assets: DataFrame,
    fake: bool = True,
    modalities: tuple[str, ...] = ("image", "audio", "video"),
) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Filter on metadata BEFORE this operator — the modality predicate
    here is a safety net, not the access path. ``fake=False`` decodes
    images with Pillow (NotImplementedError when it is absent); audio/
    video real decode (ffmpeg) remains stubbed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                if modality not in modalities:
                    continue
                if fake:
                    n, mean, ent, feat = _byte_features(payload)
                elif modality == "image":
                    n, mean, ent, feat = _image_features(payload)
                else:
                    raise NotImplementedError(
                        f"real {modality} decode requires ffmpeg-class "
                        "tooling not modeled here; pass fake=True"
                    )
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

    ``fake=False`` is a real PIL ``Image.resize`` (nearest-neighbor,
    re-encoded in the source format — deterministic), gated on Pillow
    being importable. The deterministic fake treats the payload as a
    byte grid and nearest-neighbor-samples it to width*height bytes;
    both paths share the output schema, so the Spark plumbing
    (Arrow batches, metadata update, partitioning) is exercised for
    real either way.
    """
    target = width * height

    def resize_real(payload) -> bytes:
        import io

        img = _decode_image_real(payload)
        fmt = img.format or "PNG"
        out = img.resize((width, height))
        buf = io.BytesIO()
        out.save(buf, format=fmt)
        return buf.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "image":
                    continue
                if not fake:
                    out = resize_real(payload)
                else:
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
