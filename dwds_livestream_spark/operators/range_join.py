"""Binned range (interval) join — point-in-interval matching, an
operator class the reference lacks (SURVEY.md §2.4 "not present") and
which naive Spark expresses as a cross join + filter (BroadcastNestedLoop
— unusable at scale when neither side broadcasts).

Plan: quantize time into fixed-width bins. Each point lands in exactly
one bin; each interval explodes into the bins it overlaps. An equi-join
on (bin [+ user equi keys]) then produces candidates, refined by the
exact range predicate. Because a point has exactly one bin, no
dedup step is needed — each qualifying pair appears exactly once.

Scale: the shuffle is an equi hash join on the bin key, so Catalyst uses
SortMergeJoin/ShuffledHashJoin (never a nested loop). Interval-side
row growth = ceil(interval_len / bin_width) + 1; pick ``bin_width``
near the typical interval length to keep the blowup ~2x. Long-tail
intervals (many bins) are the skew risk — cap via pre-splitting or
choose wider bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width_seconds: int = 86_400,
    equi: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end`` (half-open), optionally also matching ``equi``
    key columns. Output: all point columns + all interval columns
    (minus duplicated equi keys)."""
    w = int(bin_width_seconds)

    def epoch(c: str):
        # TIMESTAMP_NTZ can't cast straight to long; via TIMESTAMP it
        # resolves in the session timezone (UTC), a no-op for LTZ.
        return F.col(c).cast("timestamp").cast("long")

    p = points.withColumn("__bin", F.floor(epoch(ts_col) / w))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(epoch(start_col) / w),
                # end is exclusive: a zero-length [t, t) interval still
                # needs its own bin, hence no -1 on an exact boundary
                F.floor((epoch(end_col) - 1) / w),
            )
        ),
    )
    keys = ["__bin"] + (equi or [])
    if how == "inner":
        joined = p.join(i, on=keys, how=how).where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        return joined.drop("__bin")
    # outer joins: the range predicate must live IN the join condition
    # — as a post-join .where() it evaluates to NULL on unmatched rows'
    # null interval columns and silently deletes them, turning
    # how='left' into an inner join
    pa, ia = p.alias("__p"), i.alias("__i")
    cond = F.col("__p.__bin") == F.col("__i.__bin")
    for k in equi or []:
        cond = cond & (F.col(f"__p.{k}") == F.col(f"__i.{k}"))
    cond = (
        cond
        & (F.col(f"__p.{ts_col}") >= F.col(f"__i.{start_col}"))
        & (F.col(f"__p.{ts_col}") < F.col(f"__i.{end_col}"))
    )
    out_cols = [F.col(f"__p.{c}") for c in points.columns] + [
        F.col(f"__i.{c}")
        for c in intervals.columns
        if c not in (equi or [])
    ]
    return pa.join(ia, cond, how).select(*out_cols)
