"""Streaming deduplication — the dedup family's streaming form.

The reference's persistence path is at-least-once (SURVEY.md §1.4: a
retried batch re-insert can duplicate rows, collector.clj:100-105, no
idempotence key). The batch engine removes such duplicates after the
fact (operators/dedup.py); this module prevents them *in-flight*:

- ``dedup_stream``: drop re-deliveries of the same event key within a
  watermark-bounded horizon (``dropDuplicatesWithinWatermark``). State
  per key expires once the watermark passes it — bounded memory at any
  input rate, unlike a naive ``dropDuplicates`` whose state grows
  forever on an unbounded stream.
- ``dedup_stream_exact``: unbounded-horizon exact dedup
  (``dropDuplicates``) for bounded replays (availableNow backfills)
  where full-history state is affordable and exactness is required.

Scale: state is hash-partitioned by key across executors; the horizon
bounds per-key lifetime, so total state ~ (arrival rate x horizon),
independent of stream age. The same call works on a batch frame
(watermark is a no-op, dropDuplicates is exact) — operator batch/stream
parity as everywhere in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "timestamp",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate deliveries of the same key within ``horizon``.

    ``keys`` defaults to all columns except ``ts_col`` (re-delivery =
    same payload; the duplicate's own timestamp may differ, which is
    exactly the at-least-once re-insert shape of collector.clj).
    """
    keys = keys or [c for c in events.columns if c != ts_col]
    wm = events.withWatermark(ts_col, horizon)
    if wm.isStreaming:
        return wm.dropDuplicatesWithinWatermark(keys)
    return wm.dropDuplicates(keys)


def dedup_stream_exact(events: DataFrame, keys: list[str]) -> DataFrame:
    """Unbounded exact dedup on ``keys`` — for bounded backfill streams
    (availableNow) or batch frames; state never expires."""
    return events.dropDuplicates(keys)
