"""Z-order (Morton-curve) file layout — multi-dimensional data skipping.

The fact-table layout already gives one-dimensional skipping: partition
pruning on ``date`` plus per-file min/max stats on ``lemma`` because
files are lemma-clustered inside a partition (sinks/fact_sink.py,
sinks/compaction.py — the parquet analog of the reference's ts/lemma
B-tree indexes, collector/001-…up.sql:10-12). A lexicographic sort,
however, only tightens the FIRST sort column's per-file ranges; queries
filtering the second column still scan every file.

Z-ordering interleaves the bit representations of several columns into
one Morton key and range-partitions + sorts by it, so every file covers
a small hyper-rectangle: min/max stats stay tight on ALL z-columns at
once, and predicates on any of them skip most files (the OPTIMIZE
ZORDER analog). Everything is JVM bitwise expressions — no UDFs — and
the one global exchange is the same repartitionByRange a plain sorted
write would pay.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def numeric_proxy(df: DataFrame, col: str) -> Column:
    """Order-preserving double proxy for any bucketizable column type:
    numerics cast, dates/timestamps via epoch, strings via the first 7
    bytes (null-padded so prefix ordering survives the numeric view)."""
    t = dict(df.dtypes)[col]
    c = F.col(col)
    if t == "date":
        return F.unix_date(c).cast("double")
    if t.startswith("timestamp"):
        return c.cast("long").cast("double")
    if t in ("string", "varchar"):
        return F.conv(
            F.hex(F.encode(F.rpad(c, 7, "\x00"), "UTF-8")), 16, 10
        ).cast("double")
    return c.cast("double")


def _bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Uniform bucket index in [0, 2^bits) via width_bucket. (Quantile
    boundaries would equalize bucket population under skew — uniform is
    the simple default; pass pre-bucketized int columns for custom
    binning.)"""
    n = 1 << bits
    return (
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(n - 1),
                F.width_bucket(col.cast("double"), F.lit(lo), F.lit(hi), F.lit(n)) - 1,
            ),
        )
    ).cast("long")


def morton_key(buckets: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` of each bucket column into one
    Morton key (round-robin bit interleave, pure bitwise codegen)."""
    ncols = len(buckets)
    parts: list[Column] = []
    for i in range(bits):
        for j, b in enumerate(buckets):
            src_bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            dst = i * ncols + (ncols - 1 - j)
            parts.append(F.shiftleft(src_bit, dst))
    return reduce(lambda a, c: a.bitwiseOR(c), parts)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``.

    One pass computes global min/max per z-column (driver-side scalars),
    a second range-partitions on the Morton key and sorts within tasks —
    exactly the shuffle budget of a plain sorted write, but the
    resulting per-file min/max envelopes are tight in EVERY z dimension
    (asserted quantitatively in tests/test_zorder.py).
    """
    proxies = {c: numeric_proxy(df, c) for c in cols}
    stats = df.agg(
        *[F.min(proxies[c]).alias(f"lo_{c}") for c in cols],
        *[F.max(proxies[c]).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    buckets = [
        _bucketize(proxies[c], stats[f"lo_{c}"], stats[f"hi_{c}"], bits)
        for c in cols
    ]
    (
        df.withColumn("__z", morton_key(buckets, bits))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
