"""Incremental time-bucket rollup maintenance — the hypertable
"continuous aggregate" analog over the date-partitioned fact table
(project brief: operators Spark lacks, expressed as compositions of
DataFrame ops).

The fact table (sinks/fact_sink.py::parquet_writer) is partitioned by
``date``; the reference built its Postgres table for exactly this kind
of longer-period aggregation (README.md:9-12, indexes on ts/lemma/
source — collector/001-create-wb-page-request.up.sql:10-12). At 100 TB
you never re-aggregate the whole table: a micro-batch only touches a
handful of dates, so maintenance

1. derives the touched dates from the batch itself (driver-side list of
   *dates*, never rows),
2. re-aggregates ONLY those partitions — the ``date IN (...)`` filter is
   a partition filter, so the scan reads just the changed partitions,
3. dynamic-partition-overwrites the matching rollup partitions — closed
   buckets are immutable and never rewritten.

Recompute-per-touched-partition (instead of merging deltas into the
rollup) keeps maintenance idempotent: replaying a micro-batch after a
failure converges to the same rollup, so foreachBatch + checkpoint
stays exactly-once end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MEASURES: dict[str, str] = {"n_events": "count(*)"}


def touched_dates(batch: DataFrame, ts_col: str = "ts") -> list[str]:
    """Distinct event dates in a micro-batch, as ISO strings. Driver
    holds O(dates), not O(rows) — a batch covers a few dates even when
    it covers millions of rows."""
    rows = (
        batch.select(F.col(ts_col).cast("date").cast("string").alias("d"))
        .distinct()
        .collect()
    )
    return sorted(r.d for r in rows)


def _aggregate(
    fact: DataFrame, group_cols: list[str], measures: dict[str, str]
) -> DataFrame:
    aggs: list[Column] = [
        F.expr(expr).alias(name) for name, expr in measures.items()
    ]
    return fact.groupBy("date", *group_cols).agg(*aggs)


def update_rollup(
    spark: SparkSession,
    fact_path: str,
    rollup_path: str,
    dates: list[str],
    group_cols: list[str] | None = None,
    measures: dict[str, str] | None = None,
) -> None:
    """Re-aggregate the given fact-table date partitions into the
    rollup table. Only those partitions are scanned (partition pruning
    on the ``date IN`` predicate) and only those rollup partitions are
    replaced (dynamic partition overwrite — the parquet analog of the
    atomic snapshot swap in wbdb.clj:46)."""
    if not dates:
        return
    group_cols = list(group_cols or ["lemma"])
    measures = dict(measures or DEFAULT_MEASURES)
    fact = spark.read.parquet(fact_path).where(
        F.col("date").isin([str(d) for d in dates])
    )
    agg = _aggregate(fact, group_cols, measures)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            agg.repartition(1, "date")
            .write.mode("overwrite")
            .partitionBy("date")
            .parquet(rollup_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def maintained_parquet_writer(
    fact_path: str,
    rollup_path: str,
    group_cols: list[str] | None = None,
    measures: dict[str, str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer: append the batch to the fact table, then
    incrementally refresh the rollup for the touched dates. Both steps
    are idempotent per batch replay, so checkpointed streaming keeps
    the pair consistent."""
    from ..sinks.fact_sink import parquet_writer

    append = parquet_writer(fact_path)

    def write(batch: DataFrame, batch_id: int) -> None:
        append(batch, batch_id)
        update_rollup(
            batch.sparkSession,
            fact_path,
            rollup_path,
            touched_dates(batch),
            group_cols=group_cols,
            measures=measures,
        )

    return write


def serve_with_tail(
    spark: SparkSession,
    rollup_path: str,
    fact_path: str,
    hot_dates: list[str],
    group_cols: list[str] | None = None,
    measures: dict[str, str] | None = None,
) -> DataFrame:
    """Serving-side union: closed buckets come from the (tiny) rollup,
    the hot tail is aggregated from raw fact partitions — both sides
    partition-pruned. This is the continuous-aggregate read path: a
    query over years of data scans the rollup plus only today's raw
    partition."""
    group_cols = list(group_cols or ["lemma"])
    measures = dict(measures or DEFAULT_MEASURES)
    hot = [str(d) for d in hot_dates]
    closed = spark.read.parquet(rollup_path).where(~F.col("date").isin(hot))
    tail = _aggregate(
        spark.read.parquet(fact_path).where(F.col("date").isin(hot)),
        group_cols,
        measures,
    )
    return closed.select(tail.columns).unionByName(tail)
