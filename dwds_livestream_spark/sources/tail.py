"""Single-file tail → spool-directory shim: S1 strict transport parity.

The reference tails ONE live access.log with a commons-io Tailer
(reference access_log.clj:101-125: 1000 ms poll, reopen on rotation,
read from end on attach). Spark's file source wants a directory of
immutable files, so — like sources/http_poll.py for S2 — this shim
bridges the ops reality (one file being appended and logrotated) to
the Spark shape: it polls the file, reads newly appended complete
lines, and spools them as atomic batch files into the directory
``stream_access_log`` consumes.

Rotation handling: a shrink of the file below the last-read offset, or
an inode change, means the file was rotated/truncated — the shim
reopens from offset 0 (reference Tailer ``reOpen`` semantics). A
partial last line (no trailing newline yet) is left in the file until
its newline arrives, so lines are never split across spool files.
"""

from __future__ import annotations

import os
import threading
import time

__all__ = ["FileTailShim"]


class FileTailShim:
    """Tail ``path`` into ``spool_dir`` as immutable .log batch files.

    ``from_end=True`` (reference default for a live attach) skips the
    file's existing content; ``False`` replays it (dev/replay mode).
    ``poll_interval_s`` mirrors the reference's 1000 ms Tailer delay.
    """

    def __init__(
        self,
        path: str,
        spool_dir: str,
        *,
        poll_interval_s: float = 1.0,
        from_end: bool = True,
        encoding: str = "utf-8",
    ) -> None:
        self.path = path
        self.spool_dir = spool_dir
        self.poll_interval_s = poll_interval_s
        self.from_end = from_end
        self.encoding = encoding
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._offset = 0
        self._ino: int | None = None
        self._seq = 0
        self.lines_spooled = 0
        self.rotations = 0
        os.makedirs(spool_dir, exist_ok=True)

    def start(self) -> FileTailShim:
        self._thread = threading.Thread(
            target=self.run_forever, name="file-tail-shim", daemon=True
        )
        self._thread.start()
        return self

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)

    def run_forever(self) -> None:
        first = True
        while not self._stop.is_set():
            self.poll_once(attach=first)
            first = False
            self._stop.wait(self.poll_interval_s)

    def poll_once(self, attach: bool = False) -> int:
        """One tail poll; returns lines spooled. Public for tests and
        for driving from an external scheduler."""
        try:
            st = os.stat(self.path)
        except FileNotFoundError:
            return 0  # rotated away and not recreated yet
        if self._ino is None:  # first sighting
            self._ino = st.st_ino
            self._offset = st.st_size if (attach and self.from_end) else 0
        elif st.st_ino != self._ino or st.st_size < self._offset:
            self._ino = st.st_ino  # rotation/truncation: reopen at 0
            self._offset = 0
            self.rotations += 1
        if st.st_size == self._offset:
            return 0
        with open(self.path, "rb") as fh:
            fh.seek(self._offset)
            chunk = fh.read(st.st_size - self._offset)
        # only complete lines; the partial tail stays for the next poll
        last_nl = chunk.rfind(b"\n")
        if last_nl < 0:
            return 0
        complete, self._offset = chunk[: last_nl + 1], self._offset + last_nl + 1
        # frame strictly on \n (str.splitlines would also split on
        # \v \f \x1c-\x1e  … — an embedded control char in a UA or
        # URL must not fragment a log line); \r\n handled by rstrip
        lines = [
            ln.decode(self.encoding, "replace").rstrip("\r")
            for ln in complete.split(b"\n")
            if ln.rstrip(b"\r")
        ]
        if lines:
            self._spool(lines)
        return len(lines)

    def _spool(self, lines: list[str]) -> None:
        self._seq += 1
        name = f"{time.time_ns():020d}-{self._seq:08d}.log"
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        with open(tmp, "w", encoding=self.encoding) as fh:
            fh.write("\n".join(lines) + "\n")
        os.replace(tmp, os.path.join(self.spool_dir, name))
        self.lines_spooled += len(lines)
