"""Small-file compaction for the streaming-append fact table.

The exactly-once collector (fact_sink.py) appends one file set per
micro-batch; at a 1 s trigger that is ~86k file sets/day/partition —
the classic streaming small-file problem. At 100 TB the scan cost of a
partition is dominated by file-open overhead long before bytes, so
compaction is part of the storage contract, playing the role VACUUM /
OPTIMIZE plays in table formats.

Design:
- per-date selection: only partitions whose file count exceeds the
  target are rewritten (compaction must not rewrite the whole history
  every night).
- ``repartitionByRange(date, lemma)``: each output file covers one
  date and a tight lemma range, preserving BOTH index analogs
  (partition pruning on date, min/max skipping on lemma) that
  fact_sink's sorted writes established.
- dynamic partition overwrite: untouched dates keep their files; the
  rewrite of a date is atomic per partition directory.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_file_stats(path: str) -> dict[str, tuple[int, int]]:
    """{date_value: (n_files, total_bytes)} from the directory layout
    (``date=YYYY-MM-DD`` subdirs). Local-FS walk — on HDFS/S3 the same
    numbers come from the FileSystem API; the selection logic below is
    storage-agnostic."""
    stats: dict[str, tuple[int, int]] = {}
    if not os.path.isdir(path):
        return stats
    for entry in os.listdir(path):
        if not entry.startswith("date="):
            continue
        pdir = os.path.join(path, entry)
        files = [
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        ]
        stats[entry.removeprefix("date=")] = (
            len(files),
            sum(os.path.getsize(f) for f in files),
        )
    return stats


def compact_fact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    max_files_per_partition: int = 4,
    zorder_cols: list[str] | None = None,
    zorder_bits: int = 8,
) -> list[str]:
    """Rewrite fragmented date partitions into size-targeted files.

    ``zorder_cols`` switches the within-partition clustering from the
    default lexicographic (date, lemma) to a Morton key over the given
    columns (sinks/zorder.py) — use when queries filter multiple
    independent columns and the second one deserves file skipping too.

    Returns the list of compacted date values (empty = nothing to do).
    """
    stats = partition_file_stats(path)
    victims = {
        d: bs
        for d, (n, bs) in stats.items()
        if n > max(max_files_per_partition, math.ceil(bs / target_file_bytes))
    }
    if not victims:
        return []
    total_bytes = sum(victims.values())
    n_out = max(len(victims), math.ceil(total_bytes / target_file_bytes))

    df: DataFrame = spark.read.parquet(path).where(
        F.col("date").isin([F.lit(d).cast("date") for d in victims])
    )
    if zorder_cols:
        from .zorder import _bucketize, morton_key, numeric_proxy

        proxies = {c: numeric_proxy(df, c) for c in zorder_cols}
        stats_row = df.agg(
            *[F.min(proxies[c]).alias(f"lo_{c}") for c in zorder_cols],
            *[F.max(proxies[c]).alias(f"hi_{c}") for c in zorder_cols],
        ).collect()[0]
        bucket_cols = [
            _bucketize(
                proxies[c], stats_row[f"lo_{c}"], stats_row[f"hi_{c}"], zorder_bits
            )
            for c in zorder_cols
        ]
        df = df.withColumn("__z", morton_key(bucket_cols, zorder_bits))
        cluster_cols = ["date", "__z"]
    else:
        cluster_cols = ["date", "lemma"]

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.repartitionByRange(n_out, *cluster_cols)
            .sortWithinPartitions(*cluster_cols)
            .drop("__z")
            .write.mode("overwrite")
            .partitionBy("date")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return sorted(victims)
