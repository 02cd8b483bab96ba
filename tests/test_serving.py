"""K2/K3 serving shim: SSE/JSONL endpoints over the BroadcastHub —
framing, headers, epm validation, per-client tap lifecycle. Pure
stdlib (no Spark session needed)."""

from __future__ import annotations

import http.client
import threading
import time

import pytest

from dwds_livestream_spark.sinks.serving import LivestreamHTTPServer
from dwds_livestream_spark.streaming.hub import BroadcastHub


@pytest.fixture()
def served():
    hub = BroadcastHub()
    server = LivestreamHTTPServer(hub).start()
    yield hub, server.port
    server.stop()


def _feed(hub, lines, period=0.1):
    def run():
        for i, line in enumerate(lines):
            hub.publish([line], batch_id=i)
            time.sleep(period)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def _get(port, path, timeout=5.0):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("GET", path)
    return conn, conn.getresponse()


def test_jsonl_stream_frames_and_headers(served):
    hub, port = served
    conn, resp = _get(port, "/api/jsonl")
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/jsonl"
    assert resp.getheader("Cache-Control") == "no-cache"
    assert resp.getheader("X-Accel-Buffering") == "no"
    _feed(hub, ['{"lemma": "a"}', '{"lemma": "b"}'])
    lines = [resp.fp.readline().decode() for _ in range(2)]
    assert lines == ['{"lemma": "a"}\n', '{"lemma": "b"}\n']
    conn.close()


def test_sse_stream_framing(served):
    hub, port = served
    conn, resp = _get(port, "/api/events")
    assert resp.getheader("Content-Type") == "text/event-stream"
    _feed(hub, ['{"lemma": "x"}'])
    chunk = resp.fp.readline() + resp.fp.readline()
    assert chunk.decode() == 'data: {"lemma": "x"}\n\n'
    conn.close()


def test_epm_validation(served):
    _, port = served
    for bad in ("epm=0", "epm=-5", "epm=abc"):
        conn, resp = _get(port, f"/api/jsonl?{bad}")
        assert resp.status == 400, bad
        conn.close()


def test_unknown_path_404(served):
    _, port = served
    conn, resp = _get(port, "/api/nope")
    assert resp.status == 404
    conn.close()


def test_client_tap_removed_on_disconnect(served):
    hub, port = served
    conn, resp = _get(port, "/api/jsonl")
    _feed(hub, ['{"a": 1}'])
    resp.fp.readline()  # stream is live -> exactly one subscriber
    assert len(hub._subs) == 1
    resp.close()  # the response holds its own dup of the socket fd
    conn.close()
    deadline = time.monotonic() + 5
    while hub._subs and time.monotonic() < deadline:
        hub.publish(['{"tick": 1}'], batch_id=99)  # drive the write loop
        time.sleep(0.05)
    assert not hub._subs  # untap on disconnect (http.clj finally-block)
