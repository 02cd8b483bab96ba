"""Streaming count-min (streaming/sketches.py): the streamed cells
after ingesting all batches equal the batch sketch; state stays
bounded at depth×width."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dwds_livestream_spark.operators.sketches import (
    countmin_estimate,
    countmin_sketch,
)
from dwds_livestream_spark.streaming.sketches import countmin_stream

W, D = 32, 3


def test_streamed_sketch_equals_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    batch1 = [{"w": w} for w in ["a"] * 10 + ["b"] * 3 + ["c"]]
    batch2 = [{"w": w} for w in ["a"] * 5 + ["d"] * 7]
    (src / "b1.jsonl").write_text(
        "\n".join(json.dumps(r) for r in batch1) + "\n"
    )
    (src / "b2.jsonl").write_text(
        "\n".join(json.dumps(r) for r in batch2) + "\n"
    )

    stream = spark.readStream.schema("w string").json(str(src))
    cells = countmin_stream(stream, "w", width=W, depth=D)
    q = (
        cells.writeStream.format("memory")
        .queryName("cm_cells")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.table("cm_cells")
    assert streamed.count() <= W * D

    batch_df = spark.read.schema("w string").json(str(src))
    want = {
        (r["d"], r["pos"]): r["cnt"]
        for r in countmin_sketch(batch_df, "w", width=W, depth=D).collect()
    }
    got = {(r["d"], r["pos"]): r["cnt"] for r in streamed.collect()}
    assert got == want

    # estimates off the streamed cells behave like batch estimates
    est = {
        r["item"]: r["est"]
        for r in countmin_estimate(
            streamed, batch_df.distinct(), "w", width=W, depth=D
        ).collect()
    }
    true = {"a": 15, "b": 3, "c": 1, "d": 7}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t
