"""S1 as a FIRST-CLASS Spark source: a Python Data Source (Spark 4
DataSource V2 API) that tails a single appended-to file —
``spark.readStream.format("tail").option("path", ...)`` — instead of
the spool-directory shim (sources/tail.py), which remains for Spark-3
compatibility.

Reference parity (access_log.clj:101-125, commons-io Tailer): poll the
file each micro-batch, emit newly appended COMPLETE lines, reopen from
the start on rotation/truncation, optionally skip pre-existing content
on attach (``fromEnd``, the Tailer's end=true).

Offset model: {"epoch": E, "offset": B} — B is a byte offset into the
current incarnation of the file; E increments when rotation is
detected (inode change or shrink below the committed offset), so every
(epoch, offset) range identifies bytes unambiguously and Spark's
checkpoint restores mid-file. ``latestOffset`` advances only to the
last complete newline, so a partially-written line is never split
across batches (same hold-back rule as the shim).

Executor access: ``read`` re-opens the path on the executor — correct
for local[] and for any shared mount (NFS/EBS/hostPath), which is the
deployment shape a single live access.log implies anyway. Lines lost
to an unseen rotation BETWEEN poll and read yield a truncated batch,
never an error (at-least-once on rotation races, exactly-once
otherwise — strictly stronger than the reference's Tailer, which can
silently drop on fast double-rotation).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class TailPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int, encoding: str):
        self.path = path
        self.start = start
        self.end = end
        self.encoding = encoding


class TailStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.encoding = options.get("encoding", "utf-8")
        from_end = str(options.get("fromEnd", "true")).lower() == "true"
        self._epoch = 0
        self._ino: int | None = None
        init = 0
        try:
            st = os.stat(self.path)
            self._ino = st.st_ino
            if from_end:
                init = self._last_newline_end(0, st.st_size)
        except FileNotFoundError:
            pass
        self._init = {"epoch": 0, "offset": init}
        self._last = dict(self._init)

    def _last_newline_end(self, lo: int, hi: int) -> int:
        """Largest position in (lo, hi] just past a '\\n' — the
        complete-line frontier; lo if no newline arrived yet. Scans
        BACKWARD from hi in bounded chunks, so the driver never holds
        the whole appended range (or, on a fromEnd attach, the whole
        multi-GB file) in memory just to find the frontier."""
        if hi <= lo:
            return lo
        chunk = 1 << 16
        with open(self.path, "rb") as fh:
            pos = hi
            while pos > lo:
                step = min(chunk, pos - lo)
                fh.seek(pos - step)
                buf = fh.read(step)
                cut = buf.rfind(b"\n")
                if cut >= 0:
                    return pos - step + cut + 1
                pos -= step
        return lo

    def initialOffset(self) -> dict:
        return dict(self._init)

    def latestOffset(self) -> dict:
        try:
            st = os.stat(self.path)
        except FileNotFoundError:
            return dict(self._last)
        rotated = (
            self._ino is not None and st.st_ino != self._ino
        ) or st.st_size < self._last["offset"]
        if rotated:
            self._epoch += 1
            self._last = {
                "epoch": self._epoch,
                "offset": self._last_newline_end(0, st.st_size),
            }
        else:
            self._last = {
                "epoch": self._epoch,
                "offset": self._last_newline_end(
                    self._last["offset"], st.st_size
                ),
            }
        self._ino = st.st_ino
        return dict(self._last)

    def partitions(
        self, start: dict, end: dict
    ) -> list[InputPartition]:
        if start["epoch"] > end["epoch"]:
            # query RESTART: this reader's in-memory epoch counter
            # began again at 0 while the checkpointed offset is at
            # epoch N — without this branch the epoch mismatch would
            # fall into the rotation path and replay the entire file.
            # If the current file still reaches the checkpointed byte,
            # it is the same incarnation: continue from it (this also
            # covers bytes appended while the query was down, which
            # the fromEnd re-attach baseline alone would skip). If it
            # is shorter, the file rotated while down: replay from 0
            # as a new epoch.
            try:
                size = os.stat(self.path).st_size
            except FileNotFoundError:
                size = 0
            if size >= start["offset"]:
                adopted, lo = start["epoch"], start["offset"]
            else:
                adopted, lo = start["epoch"] + 1, 0
            self._epoch = adopted
            self._last = {
                "epoch": adopted,
                "offset": max(end["offset"], lo),
            }
            return [
                TailPartition(self.path, lo, end["offset"], self.encoding)
            ]
        lo = start["offset"] if start["epoch"] == end["epoch"] else 0
        return [TailPartition(self.path, lo, end["offset"], self.encoding)]

    def read(self, partition: TailPartition) -> Iterator[tuple]:
        if partition.end <= partition.start:
            return
        try:
            with open(partition.path, "rb") as fh:
                fh.seek(partition.start)
                buf = fh.read(partition.end - partition.start)
        except FileNotFoundError:
            return
        # drop a trailing partial line if the file rotated under us
        cut = buf.rfind(b"\n")
        if cut < 0:
            return
        # split strictly on \n (same framing rule as sources/tail.py):
        # splitlines() would fragment a log line on embedded \v, \f,
        # \x1c-\x1e bytes and desync rows from the \n-aligned offsets
        for line in buf[:cut].split(b"\n"):
            yield (line.decode(partition.encoding, errors="replace"),)

    def commit(self, end: dict) -> None:
        pass


class TailDataSource(DataSource):
    """``spark.dataSource.register(TailDataSource)`` then
    ``spark.readStream.format("tail").option("path", p).load()`` →
    a one-column (``value string``) stream of appended lines."""

    @classmethod
    def name(cls) -> str:
        return "tail"

    def schema(self) -> str:
        return "value string"

    def streamReader(self, schema) -> TailStreamReader:
        return TailStreamReader(dict(self.options))
