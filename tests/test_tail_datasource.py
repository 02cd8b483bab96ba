"""Python Data Source tail stream (sources/tail_datasource.py):
append pickup, complete-line holdback, rotation reopen, fromEnd."""

from __future__ import annotations

import os
import time

import pytest

from dwds_livestream_spark.sources.tail_datasource import (
    TailDataSource,
    TailStreamReader,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(TailDataSource)
    return spark


def _drain(spark, q, name, want, timeout=60):
    t0 = time.time()
    while time.time() - t0 < timeout:
        q.processAllAvailable()
        got = spark.table(name).count()
        if got >= want:
            return
        time.sleep(0.3)
    raise AssertionError(f"timed out at {spark.table(name).count()}/{want}")


def test_stream_picks_up_appends_and_rotation(registered, tmp_path):
    spark = registered
    log = tmp_path / "access.log"
    log.write_text("old line should be skipped\n")
    q = (
        spark.readStream.format("tail")
        .option("path", str(log))
        .option("fromEnd", "true")
        .load()
        .writeStream.format("memory")
        .queryName("tail_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        # wait for the reader to attach (fromEnd snapshots the size at
        # reader construction — appends before that are "pre-existing")
        t0 = time.time()
        while q.lastProgress is None and time.time() - t0 < 60:
            time.sleep(0.2)
        assert q.lastProgress is not None
        with open(log, "a") as fh:
            fh.write("line one\nline two\npartial")
        _drain(spark, q, "tail_out", 2)
        vals = {r["value"] for r in spark.table("tail_out").collect()}
        # fromEnd skipped the pre-existing line; partial held back
        assert vals == {"line one", "line two"}
        with open(log, "a") as fh:
            fh.write(" completed\n")
        _drain(spark, q, "tail_out", 3)
        assert "partial completed" in {
            r["value"] for r in spark.table("tail_out").collect()
        }
        # logrotate: replace the file (new inode), write fresh lines
        os.remove(log)
        log.write_text("after rotation\n")
        _drain(spark, q, "tail_out", 4)
        assert "after rotation" in {
            r["value"] for r in spark.table("tail_out").collect()
        }
    finally:
        q.stop()


def test_reader_offsets_hold_back_partial_lines(tmp_path):
    log = tmp_path / "f.log"
    log.write_text("a\nb\nc")  # no trailing newline on 'c'
    r = TailStreamReader({"path": str(log), "fromEnd": "false"})
    assert r.initialOffset() == {"epoch": 0, "offset": 0}
    off = r.latestOffset()
    assert off == {"epoch": 0, "offset": 4}  # just past 'b\n'
    [p] = r.partitions({"epoch": 0, "offset": 0}, off)
    assert [t[0] for t in r.read(p)] == ["a", "b"]


def test_reader_epoch_bumps_on_truncation(tmp_path):
    log = tmp_path / "f.log"
    log.write_text("long line content here\n")
    r = TailStreamReader({"path": str(log), "fromEnd": "false"})
    first = r.latestOffset()
    assert first["epoch"] == 0
    log.write_text("x\n")  # shrink == copytruncate rotation
    second = r.latestOffset()
    assert second["epoch"] == 1 and second["offset"] == 2
    [p] = r.partitions(first, second)
    assert [t[0] for t in r.read(p)] == ["x"]
