"""HTTP long-poll Python Data Source (sources/http_poll_datasource.py):
lines arrive through a mid-stream disconnect; offsets are durable
spool byte offsets; only one instance pulls."""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from dwds_livestream_spark.sources.http_poll_datasource import (
    HttpPollDataSource,
    HttpPollSimpleReader,
)

FIRST = [f"alpha-{i}" for i in range(5)]
SECOND = [f"beta-{i}" for i in range(5)]


@pytest.fixture()
def replay_server():
    stopping = threading.Event()

    class Handler(BaseHTTPRequestHandler):
        served = 0
        lock = threading.Lock()

        def log_message(self, *a):
            pass

        def do_GET(self):  # noqa: N802
            cls = type(self)
            with cls.lock:
                cls.served += 1
                turn = cls.served
            self.send_response(200)
            self.send_header("Content-Type", "text/jsonl")
            self.send_header("Connection", "close")
            self.end_headers()
            payload = FIRST if turn == 1 else SECOND if turn == 2 else None
            if payload is None:
                while not stopping.wait(0.05):
                    pass
                return
            for line in payload:
                self.wfile.write(line.encode() + b"\n")
                self.wfile.flush()
            # abrupt close = mid-stream IOException on the client

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/api/jsonl"
    stopping.set()
    srv.shutdown()
    srv.server_close()


def test_stream_survives_disconnect(spark, replay_server, tmp_path):
    spark.dataSource.register(HttpPollDataSource)
    q = (
        spark.readStream.format("http_poll")
        .option("url", replay_server)
        .option("spoolDir", str(tmp_path / "spool"))
        .option("baseBackoffS", "0.2")
        .load()
        .writeStream.format("memory")
        .queryName("http_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        t0 = time.time()
        while time.time() - t0 < 90:
            q.processAllAvailable()
            if spark.table("http_out").count() >= 10:
                break
            time.sleep(0.3)
        vals = [r["value"] for r in spark.table("http_out").collect()]
        # both halves arrived, across the abrupt disconnect, in order
        assert vals == FIRST + SECOND
    finally:
        q.stop()


def test_reader_offsets_replay_and_holdback(replay_server, tmp_path):
    r = HttpPollSimpleReader(
        {"url": replay_server, "spoolDir": str(tmp_path / "sp"),
         "baseBackoffS": "0.1"}
    )
    try:
        total = sum(len(x) + 1 for x in FIRST + SECOND)
        end = {"offset": 0}
        t0 = time.time()
        while time.time() - t0 < 30 and end["offset"] < total:
            _, end = r.read({"offset": 0})
            time.sleep(0.2)
        assert end["offset"] == total
        rows = list(r.readBetweenOffsets({"offset": 0}, end))
        assert [t[0] for t in rows] == FIRST + SECOND
        # replay of an arbitrary committed sub-range works from ANY
        # instance (fresh object, no puller) — the restart path
        r2 = HttpPollSimpleReader(
            {"url": replay_server, "spoolDir": str(tmp_path / "sp")}
        )
        part = list(r2.readBetweenOffsets({"offset": 8}, end))
        assert [t[0] for t in part] == (FIRST + SECOND)[1:]
        assert r.reconnects >= 1
    finally:
        r.stop()


def test_second_instance_does_not_pull(replay_server, tmp_path):
    opts = {"url": replay_server, "spoolDir": str(tmp_path / "sp"),
            "baseBackoffS": "0.1"}
    a = HttpPollSimpleReader(opts)
    b = HttpPollSimpleReader(opts)
    try:
        a.read({"offset": 0})  # a becomes the puller
        b.read({"offset": 0})  # b must NOT start a second connection
        assert a._thread is not None
        assert b._thread is None
    finally:
        a.stop()
        b.stop()
