"""Offline state introspection (streaming/state_inspect.py): state
rows match the aggregation, metadata lists the operator, summary is
partition-bounded."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from dwds_livestream_spark.streaming.state_inspect import (
    read_state,
    state_metadata,
    state_summary,
)


@pytest.fixture(scope="module")
def checkpoint(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("state")
    src = d / "src"
    src.mkdir()
    rows = [
        {"k": f"u{i % 3}", "ts": f"2024-01-01T10:{i:02d}:00Z"}
        for i in range(20)
    ]
    (src / "b.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    stream = spark.readStream.schema("k string, ts timestamp").json(str(src))
    agg = stream.withWatermark("ts", "10 minutes").groupBy("k").count()
    ck = str(d / "ck")
    q = (
        agg.writeStream.format("memory")
        .queryName("state_fixture")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return ck


def test_state_rows_match_aggregation(spark, checkpoint):
    st = read_state(spark, checkpoint)
    got = {r["key"]["k"]: r["value"]["count"] for r in st.collect()}
    assert got == {"u0": 7, "u1": 7, "u2": 6}


def test_state_metadata_lists_operator(spark, checkpoint):
    md = state_metadata(spark, checkpoint).collect()
    assert len(md) >= 1
    names = {r["operatorName"] for r in md}
    assert "stateStoreSave" in names


def test_state_summary_counts_keys(spark, checkpoint):
    s = state_summary(spark, checkpoint)
    rows = s.collect()
    assert sum(r["n_keys"] for r in rows) == 3
    assert all(r["n_keys"] >= 1 for r in rows)
