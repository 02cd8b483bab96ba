"""TPC-H-style refresh functions over a partitioned parquet fact
table: RF1 (batch insert) and RF2 (delete by key) — the write-path
complement to the 22 query shapes in plans/tpch.py.

Beyond-reference operator (project brief: pipeline ops). Plain parquet
has no DELETE; the scalable emulation is PARTITION-SCOPED rewrite:

- ``insert_rows`` appends partitioned data (no existing file touched).
- ``delete_keys`` first locates the partitions that actually hold the
  doomed keys (one semi-join scan — with the table partitioned on a
  coarse column this prunes to a handful of directories), rewrites
  ONLY those partitions minus the keys via dynamic partition
  overwrite, and leaves every other partition's files physically
  untouched (asserted by mtime in tests). At 100 TB a delete of one
  day's orders rewrites that day, not the table.

Idempotence: re-running a delete is a no-op (anti join of absent keys
rewrites identical content); re-running an insert duplicates — wrap
inserts in the batch ledger (sinks/fact_sink.idempotent) exactly like
the streaming sink does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def insert_rows(
    table_path: str, rows: DataFrame, partition_col: str
) -> None:
    """RF1: append ``rows`` into the partitioned layout."""
    rows.write.mode("append").partitionBy(partition_col).parquet(table_path)


def delete_keys(
    spark: SparkSession,
    table_path: str,
    keys: DataFrame,
    key_col: str,
    partition_col: str,
) -> int:
    """RF2: remove every row whose ``key_col`` appears in ``keys``.
    Returns the number of partitions rewritten. Partitions without any
    doomed key keep their files byte-for-byte."""
    tbl = spark.read.parquet(table_path)
    k = F.broadcast(keys.select(key_col).distinct())
    touched = [
        r[0]
        for r in tbl.join(k, key_col, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not touched:
        return 0
    kept = (
        tbl.where(F.col(partition_col).isin(touched))
        .join(k, key_col, "left_anti")
    )
    # dynamic overwrite only replaces partitions PRESENT in the output:
    # a partition whose every row is doomed would silently keep its old
    # files. Find those and remove their directories explicitly.
    kept_parts = {
        r[0] for r in kept.select(partition_col).distinct().collect()
    }
    emptied = [p for p in touched if p not in kept_parts]
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if kept_parts:
            (
                kept.write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(table_path)
            )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    import shutil

    for p in emptied:
        shutil.rmtree(
            f"{table_path}/{partition_col}={p}", ignore_errors=True
        )
    return len(touched)
