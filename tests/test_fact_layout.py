"""Fact-table storage layout (sinks/fact_sink.py::parquet_writer): the
reference's B-tree indexes (ts, lemma, article_source —
collector/001-…up.sql:10-12) map to partition pruning + parquet min/max
stats. These tests pin that the written layout actually delivers both
access paths."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dwds_livestream_spark.sinks.fact_sink import parquet_writer


def _sink_rows(spark, n=2000):
    return spark.range(n).select(
        (
            F.lit(dt.datetime(2024, 12, 1)).cast("timestamp")
            + F.make_interval(hours=(F.col("id") % 72))
        ).alias("ts"),
        F.concat(F.lit("lemma"), F.format_string("%05d", F.col("id") % 500)).alias(
            "lemma"
        ),
        F.lit("Vollartikel").alias("article_type"),
        F.lit("WDG").alias("article_source"),
        F.lit(dt.date(1974, 1, 1)).alias("article_date"),
    )


def test_partition_pruning_and_lemma_pushdown(spark, tmp_path):
    path = str(tmp_path / "fact")
    parquet_writer(path)(_sink_rows(spark), 0)

    back = spark.read.parquet(path)
    q = back.where(
        (F.col("date") == "2024-12-02") & (F.col("lemma") == "lemma00123")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # ts-index analog: the date predicate prunes directories, never
    # touching other days' files
    assert "PartitionFilters" in plan and "date" in plan.split("PartitionFilters")[1].splitlines()[0]
    # lemma-index analog: the equality predicate reaches the scan as a
    # pushed filter, evaluated against file/rowgroup min-max stats
    assert "PushedFilters" in plan
    assert "EqualTo(lemma,lemma00123)" in plan.split("PushedFilters")[1].splitlines()[0]
    # and the data actually lands where pruning expects it
    assert q.count() > 0
    days = {r["date"] for r in q.select("date").distinct().collect()}
    assert days == {dt.date(2024, 12, 2)}


def test_append_batches_accumulate(spark, tmp_path):
    path = str(tmp_path / "fact")
    w = parquet_writer(path)
    w(_sink_rows(spark, 100), 0)
    w(_sink_rows(spark, 100), 1)
    assert spark.read.parquet(path).count() == 200


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from dwds_livestream_spark.sinks.compaction import (
        compact_fact_table,
        partition_file_stats,
    )

    path = str(tmp_path / "fact")
    w = parquet_writer(path)
    # 8 micro-batch appends -> many files per date partition
    for b in range(8):
        w(_sink_rows(spark, 300), b)
    before = partition_file_stats(path)
    assert max(n for n, _ in before.values()) > 4
    total_before = spark.read.parquet(path).count()

    compacted = compact_fact_table(spark, path, max_files_per_partition=4)
    assert compacted  # something was fragmented

    after = partition_file_stats(path)
    assert max(n for n, _ in after.values()) <= 4
    back = spark.read.parquet(path)
    assert back.count() == total_before
    # layout contract survives compaction: pruning + lemma pushdown
    # id=123 -> hour 51 -> 2024-12-03 03:00 with 300-row batches
    q = back.where((F.col("date") == "2024-12-03") & (F.col("lemma") == "lemma00123"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(lemma,lemma00123)" in plan.split("PushedFilters")[1].splitlines()[0]
    assert q.count() > 0


def test_zorder_compaction_preserves_rows_and_prunes(spark, tmp_path):
    """compact_fact_table(zorder_cols=...) keeps the row set and date
    pruning while clustering files along the Morton curve."""
    from dwds_livestream_spark.sinks.compaction import (
        compact_fact_table,
        partition_file_stats,
    )

    path = str(tmp_path / "factz")
    w = parquet_writer(path)
    for b in range(8):
        w(_sink_rows(spark, 300), b)
    total_before = spark.read.parquet(path).count()

    compacted = compact_fact_table(
        spark, path, max_files_per_partition=4, zorder_cols=["lemma", "article_date"]
    )
    assert compacted

    after = partition_file_stats(path)
    assert max(n for n, _ in after.values()) <= 4
    back = spark.read.parquet(path)
    assert back.count() == total_before
    assert back.columns == ["ts", "lemma", "article_type", "article_source",
                            "article_date", "date"]  # __z never persisted
    plan = (
        back.where(F.col("date") == "2024-12-03")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
