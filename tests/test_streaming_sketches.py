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


def test_streamed_histogram_equals_batch_and_answers_quantiles(
    spark, tmp_path
):
    """streaming/sketches.py::histogram_stream — after ingesting all
    batches the streamed (day, bin, cnt) table equals the batch
    histogram_rollup, and range_quantiles over the STREAMED table
    reproduces the batch answer (continuous percentile serving with no
    event rescan)."""
    import json as _json

    from dwds_livestream_spark.operators.quantile_hist import (
        histogram_rollup,
        range_quantiles,
    )
    from dwds_livestream_spark.streaming.sketches import histogram_stream

    src = tmp_path / "hsrc"
    src.mkdir()
    rows1 = [
        {"ts": f"2024-01-0{d} 10:00:00", "value": v}
        for d in (1, 2) for v in (3.0, 17.5, 100.0, 480.0, 600.0)
    ]
    rows2 = [
        {"ts": "2024-01-02 23:59:59", "value": v}
        for v in (-5.0, 42.0, 42.0, 255.9)
    ]
    (src / "b1.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows1) + "\n"
    )
    (src / "b2.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows2) + "\n"
    )
    schema = "ts timestamp, value double"

    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        histogram_stream(stream)
        .writeStream.format("memory")
        .queryName("hist_cells")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "hck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.table("hist_cells")
    batch = histogram_rollup(spark.read.schema(schema).json(str(src)))
    got = {(str(r.day), r.bin): r.cnt for r in streamed.collect()}
    want = {(str(r.day), r.bin): r.cnt for r in batch.collect()}
    assert got == want and sum(want.values()) == len(rows1) + len(rows2)

    ans_stream = {
        r.q: r.est
        for r in range_quantiles(
            streamed, "2024-01-01", "2024-01-02"
        ).collect()
    }
    ans_batch = {
        r.q: r.est
        for r in range_quantiles(batch, "2024-01-01", "2024-01-02").collect()
    }
    assert ans_stream == ans_batch and set(ans_stream) == {0.5, 0.9, 0.99}
