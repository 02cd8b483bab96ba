"""sinks/rollup_sink.py — exactly-once incremental maintenance of the
histogram rollup table: streamed increments reproduce the batch
rollup, a replayed micro-batch overwrites (not double-counts) its own
partition, and compaction folds closed days without changing any sum,
surviving an interrupted swap."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from dwds_livestream_spark.operators.quantile_hist import histogram_rollup
from dwds_livestream_spark.sinks.rollup_sink import (
    compact_rollup,
    histogram_rollup_writer,
    read_rollup,
)

SCHEMA = "ts timestamp, value double"


def _rows(day: str, values):
    return [{"ts": f"{day} 12:00:00", "value": v} for v in values]


def _write_jsonl(p, rows):
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _table(df):
    return {(str(r.day), r.bin): r.cnt for r in df.collect()}


def test_streamed_rollup_equals_batch_and_replay_is_idempotent(
    spark, tmp_path
):
    src = tmp_path / "src"
    src.mkdir()
    b1 = _rows("2024-01-01", [3.0, 17.5, 100.0]) + _rows(
        "2024-01-02", [480.0, 600.0]
    )
    b2 = _rows("2024-01-02", [-5.0, 42.0, 42.0])
    _write_jsonl(src / "b1.jsonl", b1)
    _write_jsonl(src / "b2.jsonl", b2)
    table = str(tmp_path / "rollup")

    writer = histogram_rollup_writer(table)
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = histogram_rollup(spark.read.schema(SCHEMA).json(str(src)))
    assert _table(read_rollup(spark, table)) == _table(batch)

    # replay micro-batch 1 (restart between write and checkpoint
    # commit): same batch_id -> same day/__batch partitions -> the
    # rewrite lands on top of itself, sums unchanged
    writer(spark.read.schema(SCHEMA).json(str(src / "b2.jsonl")), 1)
    assert _table(read_rollup(spark, table)) == _table(batch)


def test_compaction_folds_closed_days_and_recovers(spark, tmp_path):
    table = str(tmp_path / "rollup2")
    writer = histogram_rollup_writer(table)
    all_rows = []
    for i, (day, vals) in enumerate(
        [
            ("2024-01-01", [1.0, 9.0]),
            ("2024-01-01", [17.0]),
            ("2024-01-02", [100.0, 200.0]),
        ]
    ):
        rows = _rows(day, vals)
        all_rows += rows
        df = spark.createDataFrame(
            [(r["ts"], r["value"]) for r in rows],
            "ts string, value double",
        ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
        writer(df, i)

    want = _table(read_rollup(spark, table))
    compact_rollup(spark, table, upto_day="2024-01-01")
    assert _table(read_rollup(spark, table)) == want

    # closed day is now ONE leaf; open day keeps its increments
    d1 = os.path.join(table, "day=2024-01-01")
    assert sorted(os.listdir(d1)) == ["__batch=-1"]
    d2_batches = [
        b for b in os.listdir(os.path.join(table, "day=2024-01-02"))
        if b.startswith("__batch=")
    ]
    assert d2_batches == ["__batch=2"]

    # compaction is idempotent
    compact_rollup(spark, table, upto_day="2024-01-01")
    assert _table(read_rollup(spark, table)) == want

    # interrupted swap: a fully-written stage left on disk is recovery
    # input — re-running finishes the move and sums are intact
    import shutil

    stage = table + ".compacting"
    writer_df = spark.read.parquet(table)
    (
        writer_df.where(F.col("day") <= F.lit("2024-01-02"))
        .groupBy("day", "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("__batch", F.lit(-1))
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("day", "__batch")
        .parquet(stage)
    )
    assert os.path.exists(os.path.join(stage, "_SUCCESS"))
    compact_rollup(spark, table, upto_day="ignored-due-to-recovery")
    assert not os.path.isdir(stage)
    assert _table(read_rollup(spark, table)) == want
    assert sorted(
        b for b in os.listdir(os.path.join(table, "day=2024-01-02"))
        if b.startswith("__batch=")
    ) == ["__batch=-1"]


def _df(spark, rows):
    return spark.createDataFrame(
        [(r["ts"], r["value"]) for r in rows], "ts string, value double"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")


def test_compaction_racing_writer_restart_never_double_counts(
    spark, tmp_path
):
    """VERDICT r2 #7: the crash window the batch-addressed layout alone
    can't cover — batch N is WRITTEN but not checkpoint-committed when
    the stream dies; compaction runs before the restart; the restart
    REPLAYS batch N. With max_batch = last COMMITTED id the fold leaves
    N's increment alone, so the replay overwrites itself (sums exact).
    The recovery path must honor the same boundary."""
    table = str(tmp_path / "rollup3")
    writer = histogram_rollup_writer(table)
    b0 = _rows("2024-01-01", [1.0, 9.0, 300.0])
    b1 = _rows("2024-01-01", [17.0, 17.0])  # same (closed) day as b0
    writer(_df(spark, b0), 0)  # committed
    writer(_df(spark, b1), 1)  # written; commit never happened
    want = _table(read_rollup(spark, table))

    # maintenance job runs while the stream is down: fold only batches
    # the checkpoint commit log confirms (<= 0)
    compact_rollup(spark, table, upto_day="2024-01-01", max_batch=0)
    assert _table(read_rollup(spark, table)) == want
    d1 = os.path.join(table, "day=2024-01-01")
    assert sorted(os.listdir(d1)) == ["__batch=-1", "__batch=1"]

    # stream restarts and replays batch 1 -> lands on its own leaf
    writer(_df(spark, b1), 1)
    assert _table(read_rollup(spark, table)) == want

    # a second bounded compaction folds the (now committed) replay
    compact_rollup(spark, table, upto_day="2024-01-01", max_batch=1)
    assert _table(read_rollup(spark, table)) == want
    assert sorted(os.listdir(d1)) == ["__batch=-1"]


def test_bounded_compaction_recovery_honors_staged_boundary(
    spark, tmp_path
):
    """Crash after the stage completed (_SUCCESS present) but before
    the swap: re-running must delete exactly the folded leaves — the
    staged sidecar carries the boundary, so an uncommitted leaf
    survives for its replay even across the crash."""
    import shutil

    table = str(tmp_path / "rollup4")
    writer = histogram_rollup_writer(table)
    b0 = _rows("2024-01-01", [1.0, 9.0])
    b1 = _rows("2024-01-01", [300.0])
    writer(_df(spark, b0), 0)
    writer(_df(spark, b1), 1)  # uncommitted
    want = _table(read_rollup(spark, table))

    stage = table + ".compacting"
    sidecar = stage + ".maxbatch"
    with open(sidecar, "w") as fh:
        fh.write("0")
    (
        spark.read.parquet(table)
        .where((F.col("day") <= "2024-01-01") & (F.col("__batch") <= 0))
        .groupBy("day", "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("__batch", F.lit(-1))
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("day", "__batch")
        .parquet(stage)
    )
    assert os.path.exists(os.path.join(stage, "_SUCCESS"))

    # recovery run: args are ignored, the staged fold + sidecar win
    compact_rollup(spark, table, upto_day="ignored")
    assert not os.path.isdir(stage)
    assert not os.path.exists(sidecar)
    d1 = os.path.join(table, "day=2024-01-01")
    assert sorted(os.listdir(d1)) == ["__batch=-1", "__batch=1"]
    assert _table(read_rollup(spark, table)) == want

    # replay of the surviving leaf stays idempotent post-recovery
    writer(_df(spark, b1), 1)
    assert _table(read_rollup(spark, table)) == want
    shutil.rmtree(table)
