"""Event-time windowed aggregation for the streaming analytics layer.

The reference carries event time (parsed `timestamp`, SURVEY.md §2.3 P2)
but processes in arrival order with no windows or late-data handling
(§2.6 "not present"). Spark gets watermarks + windows natively; this
module exposes them over the enriched event stream — the streaming form
of the batch throughput/trend queries (A3, §7 Phase 5).

All functions work on batch frames too (window/session_window are plain
expressions); watermarks are no-ops in batch, so batch/stream parity
holds structurally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "timestamp",
    group_cols: list[str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding) window counts per group
    with a late-data watermark — the streaming equivalent of the
    reference's per-minute meters (metrics.clj:16-26) as a first-class
    query; with ``slide`` it is the streaming twin of the batch
    ``trending_topk`` aggregation (the per-window rank runs in
    foreachBatch, where window rows are final past the watermark).

    Output: window_start, window_end, [group_cols...], n_events.
    State scales with (open windows x groups), bounded by the watermark
    — constant per key over time, safe at any input volume.
    """
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    grouped = (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("__w"), *(group_cols or []))
        .agg(F.count("*").alias("n_events"))
    )
    return grouped.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *(group_cols or []),
        "n_events",
    )


def rank_topk_batch(k: int = 3, by: str = "n_events") -> "Callable":
    """foreachBatch companion for sliding ``windowed_counts``: rank
    rows per window and keep the top-k, with a deterministic
    tie-break. Rank is not allowed inside an update-mode streaming
    aggregation, so it runs batch-side where the micro-batch's window
    rows are concrete — each emitted batch carries the current top-k
    per (updated) window.

    Usage::

        counts = windowed_counts(stream, "1 hour", slide="15 minutes",
                                 group_cols=["lemma"])
        q = (counts.writeStream.outputMode("update")
             .foreachBatch(rank_topk_batch(3)(sink)) ...)
    """
    from pyspark.sql import Window as W

    def wrap(sink: "Callable[[DataFrame, int], None]"):
        def process(batch: DataFrame, batch_id: int) -> None:
            group = [c for c in batch.columns
                     if c not in ("window_start", "window_end", by)]
            rnk = F.row_number().over(
                W.partitionBy("window_start").orderBy(
                    F.desc(by), *[F.asc(c) for c in group]
                )
            )
            sink(
                batch.withColumn("rnk", rnk).where(F.col("rnk") <= k),
                batch_id,
            )

        return process

    return wrap


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 minutes",
    ts_col: str = "timestamp",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Sessionization via the native session_window operator —
    state-store-backed gap sessions that merge across micro-batches.
    The batch twin is plans/analytics.py::q_sessionize (lag/cumsum
    windows); this is the streaming-native form.

    Output: [key_cols...], session_start, session_end, n_events.
    """
    grouped = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("__s"), *(key_cols or []))
        .agg(F.count("*").alias("n_events"))
    )
    return grouped.select(
        *(key_cols or []),
        F.col("__s.start").alias("session_start"),
        F.col("__s.end").alias("session_end"),
        "n_events",
    )


def windowed_distinct_users(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "timestamp",
    user_col: str = "user_id",
    rsd: float = 0.05,
    exact: bool = False,
) -> DataFrame:
    """Per-window unique-visitor counts (the classic streaming
    cardinality query). Default is approx_count_distinct — a mergeable
    HyperLogLog++ sketch, which is the ONLY way distinct counting
    composes with incremental streaming aggregation state (exact
    distinct would need per-key sets in state, unbounded per window at
    100 TB; Spark rejects COUNT(DISTINCT) in streaming for exactly this
    reason). ``exact=True`` is the batch-mode oracle twin used by the
    parity test.

    Output: window_start, window_end, n_users. State per open window is
    one fixed-size sketch (~1.5 KB at rsd=5%)."""
    agg = (
        F.count_distinct(F.col(user_col))
        if exact
        else F.approx_count_distinct(user_col, rsd)
    )
    grouped = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("__w"))
        .agg(agg.alias("n_users"))
    )
    return grouped.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        "n_users",
    )
