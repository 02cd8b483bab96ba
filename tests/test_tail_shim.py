"""FileTailShim (S1 strict tail parity): appended-lines tailing of one
live file, rotation reopen, partial-line holdback, and e2e into the
access-log streaming pipeline."""

from __future__ import annotations

import os

from dwds_livestream_spark.sources.tail import FileTailShim

UA = "Mozilla/5.0 (Windows NT 10.0; Win64; x64)"


def _logline(s, word):
    return (
        f'10.0.0.1 - - [08/Dec/2024:23:00:{s:02d} +0000] '
        f'"GET /wb/{word} HTTP/1.1" 200 100 "-" "{UA}"'
    )


def _spooled(spool):
    got = []
    for f in sorted(spool.glob("*.log")):
        got.extend(f.read_text().splitlines())
    return got


def test_tail_appended_lines_and_partial_holdback(tmp_path):
    log = tmp_path / "access.log"
    spool = tmp_path / "spool"
    log.write_text("old-line-before-attach\n")
    shim = FileTailShim(str(log), str(spool), from_end=True)
    assert shim.poll_once(attach=True) == 0  # live attach skips history

    with open(log, "a") as fh:
        fh.write(_logline(1, "w1") + "\n" + _logline(2, "w2") + "\n")
        fh.write("partial-without-newline")
    assert shim.poll_once() == 2  # the partial line is held back
    with open(log, "a") as fh:
        fh.write("-now-complete\n")
    assert shim.poll_once() == 1
    assert _spooled(spool) == [
        _logline(1, "w1"),
        _logline(2, "w2"),
        "partial-without-newline-now-complete",
    ]


def test_tail_reopens_on_rotation(tmp_path):
    log = tmp_path / "access.log"
    spool = tmp_path / "spool"
    log.write_text(_logline(1, "a") + "\n")
    shim = FileTailShim(str(log), str(spool), from_end=False)
    assert shim.poll_once(attach=True) == 1

    # logrotate: move aside, recreate (new inode), write fresh lines
    os.rename(log, tmp_path / "access.log.1")
    assert shim.poll_once() == 0  # gone; no crash
    log.write_text(_logline(2, "b") + "\n")
    assert shim.poll_once() == 1
    assert shim.rotations >= 1
    assert _spooled(spool) == [_logline(1, "a"), _logline(2, "b")]


def test_tail_truncation_in_place(tmp_path):
    log = tmp_path / "access.log"
    spool = tmp_path / "spool"
    log.write_text(_logline(1, "a") + "\n" + _logline(2, "b") + "\n")
    shim = FileTailShim(str(log), str(spool), from_end=False)
    assert shim.poll_once(attach=True) == 2
    log.write_text(_logline(3, "c") + "\n")  # copytruncate-style shrink
    assert shim.poll_once() == 1
    assert _spooled(spool)[-1] == _logline(3, "c")


def test_tail_feeds_access_log_pipeline_e2e(spark, tmp_path):
    from dwds_livestream_spark.functions.access_log import (
        access_log_to_events,
    )
    from dwds_livestream_spark.sources.access_log_source import (
        stream_access_log,
    )

    log = tmp_path / "access.log"
    spool = tmp_path / "spool"
    log.write_text("")
    shim = FileTailShim(str(log), str(spool), from_end=False)
    shim.poll_once(attach=True)
    with open(log, "a") as fh:
        for i in range(5):
            fh.write(_logline(i, f"wort{i}") + "\n")
    assert shim.poll_once() == 5

    events = access_log_to_events(stream_access_log(spark, str(spool)))
    q = (
        events.writeStream.format("memory")
        .queryName("tail_e2e")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(60)
    got = sorted(
        r.lemma for r in spark.sql("select lemma from tail_e2e").collect()
    )
    assert got == [f"wort{i}" for i in range(5)]


def test_tail_does_not_split_on_embedded_control_chars(tmp_path):
    """Framing is strictly \\n: a vertical-tab/formfeed inside a UA
    must not fragment the log line (str.splitlines would)."""
    log = tmp_path / "access.log"
    spool = tmp_path / "spool"
    weird = ('a - - [x] "GET /wb/w \x0b\x0c\u2028 HTTP/1.1" 200 1 "-" "UA\x1d"')
    log.write_text(weird + "\n", newline="")
    shim = FileTailShim(str(log), str(spool), from_end=False)
    assert shim.poll_once(attach=True) == 1
    # read raw: _spooled's splitlines would itself split on
    # the control chars this test plants
    raw = [
        x
        for f in sorted(spool.glob('*.log'))
        for x in f.read_text().split('\n')
        if x
    ]
    assert raw == [weird]
