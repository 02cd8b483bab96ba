"""Bucketed (co-located) table layout — the zero-shuffle path for
big-big joins repeated across many queries.

Broadcast covers the reference's dimension join (J1: lemmata fit in
memory, wbdb.clj:39-40). What it cannot cover at 100 TB is fact-to-fact
joins (orders ⋈ lineitem shapes): both sides too big to broadcast, so
every query pays a full shuffle of both tables. Bucketing moves that
shuffle to WRITE time, once: both tables hash-partitioned into the same
number of buckets on the join key (and sorted within buckets), so every
subsequent join is planned as a SortMergeJoin with NO Exchange on
either side — each task zips bucket i with bucket i.

This is Spark's table-layout answer to the reference's B-tree indexes
(collector/001-…up.sql:10-12): a physical design decision made at
ingest that repeated queries exploit for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and bucket-sorted) on ``key``. The one
    shuffle a later join would need happens here, once. ``buckets``
    must match across tables that will be joined (bucket i joins only
    bucket i); size it so a bucket of the largest table fits an
    executor core (~128-512 MB at scale)."""
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts Spark's EnsureRequirements sees both sides already
    hash-distributed on ``key`` and plans a shuffle-free SortMergeJoin
    (asserted in tests/test_bucketed.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
