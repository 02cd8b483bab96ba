"""Streaming count-min maintenance: the sketch as a bounded
Structured-Streaming aggregate.

Count-min cells are ADDITIVE (operators/sketches.py), which makes the
sketch the rare analytics state that streams for free: groupBy(d, pos)
count over the stream IS the continuously-maintained sketch, its state
bounded at depth×width rows forever — no watermark needed, no state
eviction, no custom stateful processor. Complete output mode is safe
for exactly the same reason (the result table can never outgrow
depth×width).

After any micro-batch the streamed sketch equals the batch sketch of
everything ingested so far — asserted in
tests/test_streaming_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import _cm_pos


def countmin_stream(
    stream: DataFrame, col: str, width: int = 512, depth: int = 4
) -> DataFrame:
    """Continuously-maintained count-min cells over a streaming frame.
    Same cell layout as the batch ``countmin_sketch`` (md5-based), so
    estimates computed against the streamed cells with
    ``countmin_estimate`` are identical to batch estimates over the
    ingested prefix. Use output mode 'complete' (bounded result) or
    'update' (changed cells only).
    """
    item = F.col(col).cast("string")
    cells = stream.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cm_pos(item, d, width).alias("pos")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.pos")
    return cells.groupBy("d", "pos").agg(F.count("*").alias("cnt"))


def histogram_stream(
    stream: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    lo: float = 0.0,
    hi: float = 512.0,
    n_bins: int = 64,
) -> DataFrame:
    """Continuously-maintained quantile-histogram rollup
    (operators/quantile_hist.py) over a streaming frame — bins are
    additive exactly like count-min cells, so groupBy(day, bin) count
    IS the maintained rollup: after any micro-batch the streamed table
    equals ``histogram_rollup`` of everything ingested so far, and
    ``range_quantiles`` answers percentile questions against it with
    no event rescan.

    State is |days seen| x n_bins rows — unlike count-min it grows
    with the calendar, so at retention scale run output mode 'update'
    (changed day-bins only; the sink upserts) rather than 'complete'.
    A watermark is deliberately NOT applied: late events must still
    land in their day's bins for the streamed==batch identity to hold;
    bound state by retiring closed days from the SINK table instead.
    """
    from ..operators.quantile_hist import histogram_rollup

    # the batch rollup IS the streaming aggregation — one shared body,
    # so the streamed==batch identity can't drift
    return histogram_rollup(stream, value_col, ts_col, lo, hi, n_bins)
