"""Dead-letter quarantine sink (sinks/quarantine.py): routing, rule
attribution, idempotent replay."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dwds_livestream_spark.sinks.quarantine import (
    quarantine_writer,
    start_quarantine_sink,
    with_violations,
)

def rules():
    # Column exprs need an active SparkContext in classic mode — build
    # lazily inside tests, not at import
    return [
        ("null_user", F.col("user_id").isNull()),
        ("bad_value", F.col("value") < 0),
        ("bad_type", ~F.col("event_type").rlike("^[a-z]+$")),
    ]


def _write_batch(tmp_path, rows, name="b0.jsonl"):
    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return src


SCHEMA = "user_id long, value double, event_type string"


def test_routes_and_attributes_rules(spark, tmp_path):
    rows = [
        {"user_id": 1, "value": 5.0, "event_type": "view"},
        {"user_id": None, "value": -2.0, "event_type": "view"},
        {"user_id": 3, "value": 1.0, "event_type": "X!"},
    ]
    src = _write_batch(tmp_path, rows)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = start_quarantine_sink(
        stream,
        rules(),
        good_path=str(tmp_path / "good"),
        bad_path=str(tmp_path / "bad"),
        checkpoint=str(tmp_path / "ck"),
        ledger=str(tmp_path / "ledger"),
    )
    q.awaitTermination(120)
    good = spark.read.parquet(str(tmp_path / "good")).collect()
    bad = spark.read.parquet(str(tmp_path / "bad")).collect()
    assert [r["user_id"] for r in good] == [1]
    assert "violated" not in good[0].asDict()
    by_user = {r["user_id"]: r for r in bad}
    assert by_user[None]["violated"] == ["bad_value", "null_user"]
    assert by_user[3]["violated"] == ["bad_type"]
    assert all(r["batch_id"] == 0 for r in bad)


def test_replayed_batch_is_skipped(spark, tmp_path):
    rows = [{"user_id": 1, "value": 5.0, "event_type": "view"},
            {"user_id": None, "value": 1.0, "event_type": "view"}]
    src = _write_batch(tmp_path, rows)
    batch = spark.read.schema(SCHEMA).json(str(src))
    writer = quarantine_writer(
        str(tmp_path / "good"), str(tmp_path / "bad"), rules()
    )
    from dwds_livestream_spark.sinks.fact_sink import idempotent

    w = idempotent(writer, str(tmp_path / "ledger"))
    w(batch, 7)
    w(batch, 7)  # replay: the gap foreachBatch leaves open
    assert spark.read.parquet(str(tmp_path / "good")).count() == 1
    assert spark.read.parquet(str(tmp_path / "bad")).count() == 1


def test_with_violations_is_map_only(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "view")], SCHEMA
    )
    plan = (
        with_violations(df, rules())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_gate_metrics_are_observed(spark, tmp_path):
    """df.observe on the marked stream surfaces rows_total/rows_bad in
    every progress event — the per-batch data-quality meter."""
    from dwds_livestream_spark.streaming.metrics import ThroughputListener

    rows = [
        {"user_id": 1, "value": 5.0, "event_type": "view"},
        {"user_id": None, "value": 1.0, "event_type": "view"},
        {"user_id": 3, "value": -1.0, "event_type": "view"},
    ]
    src = _write_batch(tmp_path, rows)
    listener = ThroughputListener()
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = start_quarantine_sink(
            stream,
            rules(),
            good_path=str(tmp_path / "good"),
            bad_path=str(tmp_path / "bad"),
            checkpoint=str(tmp_path / "ck"),
        )
        q.awaitTermination(120)
        import time as _t

        gate = None
        for _ in range(50):
            for snap in listener.snapshots.values():
                if snap.get("observed", {}).get("gate"):
                    gate = snap["observed"]["gate"]
            if gate:
                break
            _t.sleep(0.2)
        assert gate is not None
        assert gate["rows_total"] == 3 and gate["rows_bad"] == 2
    finally:
        spark.streams.removeListener(listener)


def test_null_predicate_rows_are_quarantined_fail_closed(spark):
    """Review fix: a rule predicate that evaluates to NULL (e.g.
    length(lemma) > 128 on a NULL lemma) must count as VIOLATED —
    three-valued logic would otherwise route exactly the rows a
    dead-letter gate exists to catch into the good table."""
    import pyspark.sql.functions as F

    from dwds_livestream_spark.sinks.quarantine import with_violations

    df = spark.createDataFrame(
        [("ok", 5), (None, 5), ("x" * 200, 5)], "lemma string, n int"
    )
    out = with_violations(
        df, [("too_long", F.length("lemma") > 128)]
    )
    rows = {r.lemma: list(r.violated) for r in out.collect()}
    assert rows["ok"] == []
    assert rows[None] == ["too_long"]  # NULL lemma -> fail closed
    assert rows["x" * 200] == ["too_long"]
