"""Incremental rollup maintenance (operators/rollup_maintain.py):
touched-partition recompute == full recompute; closed partitions never
rewritten; pruning reaches the scan; serve_with_tail == direct
aggregate."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from dwds_livestream_spark.operators.rollup_maintain import (
    serve_with_tail,
    touched_dates,
    update_rollup,
)
from dwds_livestream_spark.sinks.fact_sink import parquet_writer


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(ts=ts, lemma=lemma, article_source="s") for ts, lemma in rows]
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _full_rollup(spark, fact_path):
    return {
        (r.date.isoformat(), r.lemma): r.n_events
        for r in spark.read.parquet(fact_path)
        .groupBy("date", "lemma")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }


def _rollup(spark, rollup_path):
    return {
        (str(r.date), r.lemma): r.n_events
        for r in spark.read.parquet(rollup_path).collect()
    }


def test_incremental_equals_full_and_skips_closed(spark, tmp_path):
    fact = str(tmp_path / "fact")
    roll = str(tmp_path / "rollup")
    write = parquet_writer(fact)

    b1 = _batch(
        spark,
        [
            ("2024-12-01 10:00:00", "a"),
            ("2024-12-01 11:00:00", "a"),
            ("2024-12-02 09:00:00", "b"),
        ],
    )
    write(b1, 0)
    d1 = touched_dates(b1)
    assert d1 == ["2024-12-01", "2024-12-02"]
    update_rollup(spark, fact, roll, d1)
    assert _rollup(spark, roll) == _full_rollup(spark, fact)

    # snapshot the closed 12-01 partition's files before the next batch
    closed_dir = os.path.join(roll, "date=2024-12-01")
    before = {
        f: os.path.getmtime(os.path.join(closed_dir, f))
        for f in os.listdir(closed_dir)
    }

    b2 = _batch(
        spark,
        [
            ("2024-12-02 12:00:00", "b"),
            ("2024-12-02 13:00:00", "c"),
            ("2024-12-03 08:00:00", "a"),
        ],
    )
    write(b2, 1)
    update_rollup(spark, fact, roll, touched_dates(b2))
    assert _rollup(spark, roll) == _full_rollup(spark, fact)
    # dynamic partition overwrite must not touch the closed partition
    after = {
        f: os.path.getmtime(os.path.join(closed_dir, f))
        for f in os.listdir(closed_dir)
    }
    assert before == after


def test_maintenance_scan_is_partition_pruned(spark, tmp_path):
    fact = str(tmp_path / "factp")
    write = parquet_writer(fact)
    write(_batch(spark, [("2024-12-01 10:00:00", "a"), ("2024-12-02 10:00:00", "b")]), 0)
    scan = spark.read.parquet(fact).where(F.col("date").isin(["2024-12-02"]))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "date" in plan.split("PartitionFilters")[1][:120]


def test_replay_is_idempotent(spark, tmp_path):
    fact = str(tmp_path / "factr")
    roll = str(tmp_path / "rollupr")
    write = parquet_writer(fact)
    b = _batch(spark, [("2024-12-01 10:00:00", "a")])
    write(b, 0)
    update_rollup(spark, fact, roll, touched_dates(b))
    first = _rollup(spark, roll)
    # failure replay: maintenance runs again for the same dates
    update_rollup(spark, fact, roll, touched_dates(b))
    assert _rollup(spark, roll) == first


def test_serve_with_tail_equals_direct(spark, tmp_path):
    fact = str(tmp_path / "facts")
    roll = str(tmp_path / "rollups")
    write = parquet_writer(fact)
    write(
        _batch(
            spark,
            [
                ("2024-12-01 10:00:00", "a"),
                ("2024-12-02 09:00:00", "b"),
                ("2024-12-03 08:00:00", "a"),
            ],
        ),
        0,
    )
    # rollup maintained only for closed dates; 12-03 is the hot tail
    update_rollup(spark, fact, roll, ["2024-12-01", "2024-12-02"])
    served = serve_with_tail(spark, roll, fact, hot_dates=["2024-12-03"])
    got = {(str(r.date), r.lemma): r.n_events for r in served.collect()}
    assert got == _full_rollup(spark, fact)


def test_maintained_writer_in_streaming_query(spark, tmp_path):
    """maintained_parquet_writer behind a real checkpointed streaming
    query: after availableNow drains, fact and rollup are consistent."""
    import json

    from dwds_livestream_spark.operators.rollup_maintain import (
        maintained_parquet_writer,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.jsonl").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"ts": "2024-12-01T10:00:00Z", "lemma": "a"},
                {"ts": "2024-12-01T11:00:00Z", "lemma": "a"},
                {"ts": "2024-12-02T09:00:00Z", "lemma": "b"},
            ]
        )
    )
    fact = str(tmp_path / "fact")
    roll = str(tmp_path / "rollup")
    stream = (
        spark.readStream.format("text")
        .load(str(src))
        .selectExpr("from_json(value, 'ts timestamp, lemma string') AS e")
        .select("e.ts", "e.lemma")
    )
    q = (
        stream.writeStream.foreachBatch(maintained_parquet_writer(fact, roll))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rollup(spark, roll) == _full_rollup(spark, fact)
    assert _rollup(spark, roll) == {
        ("2024-12-01", "a"): 2,
        ("2024-12-02", "b"): 1,
    }


def test_idempotent_writer_skips_replayed_batch(spark, tmp_path):
    from dwds_livestream_spark.sinks.fact_sink import idempotent

    fact = str(tmp_path / "fact_i")
    write = idempotent(parquet_writer(fact), str(tmp_path / "ledger"))
    b = _batch(spark, [("2024-12-01 10:00:00", "a")])
    write(b, 7)
    write(b, 7)  # replay after a crash between write and checkpoint
    assert spark.read.parquet(fact).count() == 1
    write(b, 8)  # a genuinely new batch still appends
    assert spark.read.parquet(fact).count() == 2


def test_join_delta_equals_full_recompute(spark):
    """Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — appended deltas reconstruct
    the full joined view exactly (operators/incremental_join.py)."""
    from pyspark.sql import functions as F

    from dwds_livestream_spark.operators.incremental_join import join_delta

    a = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("av")
    )
    b = spark.range(0, 300).select(
        (F.col("id") % 120).alias("k"), F.col("id").alias("bv")
    )
    a_old, d_a = a.where("k % 3 != 0"), a.where("k % 3 = 0")
    b_old, d_b = b.where("bv % 2 = 0"), b.where("bv % 2 = 1")
    old_view = a_old.join(b_old, "k")
    delta = join_delta(a_old, b_old, d_a, d_b, on="k")
    maintained = old_view.unionByName(delta)
    full = a.join(b, "k")
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_join_delta_one_sided_and_errors(spark):
    import pytest as _pt

    from pyspark.sql import functions as F

    from dwds_livestream_spark.operators.incremental_join import join_delta

    a = spark.range(10).select(F.col("id").alias("k"))
    b = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    d_b = spark.range(10, 15).select(F.col("id").alias("k"), F.lit(2).alias("v"))
    # only B grows: delta is a_old ⋈ ΔB
    out = join_delta(a, b, None, d_b, on="k")
    assert out.count() == 0  # ΔB keys outside a_old
    with _pt.raises(ValueError):
        join_delta(a, b, None, None, on="k")
    with _pt.raises(ValueError):
        join_delta(a, b, a, None, on="k", how="left")
