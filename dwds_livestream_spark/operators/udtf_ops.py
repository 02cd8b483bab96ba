"""Python UDTFs (Spark 4 user-defined TABLE functions): row → N typed
rows with lateral-join composition — the surface for transforms whose
output cardinality is data-dependent and whose logic doesn't fit an
expression.

Beyond-reference API coverage. Everything else in this engine prefers
built-in expressions (explode/sequence/transform) — see chunking.py
for the codegen'd version of exactly this shape; a UDTF is the escape
hatch when per-row logic needs real Python (stateful parsers, external
format readers). ``HourSplit`` is the canonical interval-unbundling
example: one (start, end) session row → one row per clock hour it
overlaps, with the per-hour overlap seconds (billing / occupancy /
concurrency inputs).

Usage (registered):
    spark.udtf.register("hour_split", HourSplit)
    spark.sql(\"\"\"
      SELECT s.session_id, h.*
      FROM sessions s,
           LATERAL hour_split(s.start_ts, s.end_ts) h
    \"\"\")
or directly: ``HourSplit(F.lit(...), F.lit(...))``.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.functions import udtf


@udtf(returnType="hour_start timestamp, seconds_in_hour double")
class HourSplit:
    """Split [start, end) into clock-hour slices. Emits nothing for
    NULL or non-positive intervals (malformed-guard parity with the
    engine's try_-style null-outs)."""

    def eval(self, start: datetime, end: datetime):
        if start is None or end is None or end <= start:
            return
        cur = start.replace(minute=0, second=0, microsecond=0)
        while cur < end:
            nxt = cur + timedelta(hours=1)
            lo = max(cur, start)
            hi = min(nxt, end)
            if hi > lo:
                yield (cur, (hi - lo).total_seconds())
            cur = nxt
