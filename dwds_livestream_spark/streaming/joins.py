"""Stream-stream join — beyond the reference surface (SURVEY.md §2.4
"not present: stream–stream joins"): correlate two live event streams
within a bounded event-time window.

Spark's stream-stream inner join requires watermarks on both sides plus
a time-bound join condition so state on each side can be evicted — this
wrapper packages exactly that contract. State per side is bounded by
(watermark delay + window) of input, independent of stream lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    within: str = "10 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Inner-join two streams on ``on`` where the right event falls in
    ``[left_ts, left_ts + within)``. Both sides get ``watermark`` so
    Spark can bound and evict join state.

    Output: all left columns + all right columns (right's key/ts
    columns suffixed ``_r`` to avoid collisions).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    for c in rw.columns:
        if c in set(lw.columns):
            rw = rw.withColumnRenamed(c, f"{c}_r")
    on_r = f"{on}_r" if f"{on}_r" in rw.columns else on
    ts_r = f"{right_ts}_r" if f"{right_ts}_r" in rw.columns else right_ts
    cond = (
        (F.col(on) == F.col(on_r))
        & (F.col(ts_r) >= F.col(left_ts))
        & (F.col(ts_r) < F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner")


def stream_stream_left_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    within: str = "10 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream join: same time-bound contract as
    ``stream_stream_join``, but a left event with no right match is
    EMITTED WITH NULLS once the watermark passes its join window (i.e.
    the engine can prove no match can still arrive). This is the
    "enrich if correlated, emit regardless" shape — e.g. page views
    joined to purchases that may never come.

    State bounds are identical to the inner join; the only difference
    is the deferred null emission, which arrives one watermark advance
    AFTER the window closes (Spark emits outer results on state
    eviction).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    for c in rw.columns:
        if c in set(lw.columns):
            rw = rw.withColumnRenamed(c, f"{c}_r")
    on_r = f"{on}_r" if f"{on}_r" in rw.columns else on
    ts_r = f"{right_ts}_r" if f"{right_ts}_r" in rw.columns else right_ts
    cond = (
        (F.col(on) == F.col(on_r))
        & (F.col(ts_r) >= F.col(left_ts))
        & (F.col(ts_r) < F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "leftOuter")
