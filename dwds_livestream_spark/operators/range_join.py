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

Outer modes are compositional: the inner match plus null-safe
anti-joined unmatched rows from the preserved side(s). Joining the
preserved interval side through its EXPLODED form would emit an
unmatched interval once per overlapped bin (k duplicates); the
anti-join runs against the original un-exploded frame, so every
unmatched row appears exactly once and empty intervals (end <= start,
which match nothing by the half-open predicate) still surface in
right/full output. Cost: one extra hash join per preserved side —
still never a nested loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch(c: str) -> Column:
    # TIMESTAMP_NTZ can't cast straight to long; via TIMESTAMP it
    # resolves in the session timezone (UTC), a no-op for LTZ.
    return F.col(c).cast("timestamp").cast("long")


def _anti_nullsafe(keep: DataFrame, drop: DataFrame) -> DataFrame:
    """keep LEFT ANTI drop on ALL of keep's columns, null-safely (a
    plain anti join would treat any NULL-bearing row as unmatched and
    resurrect it). Duplicate unmatched rows keep their multiplicity."""
    d = drop.select(*[F.col(c).alias(f"__d_{c}") for c in keep.columns])
    cond = None
    for c in keep.columns:
        eq = F.col(c).eqNullSafe(F.col(f"__d_{c}"))
        cond = eq if cond is None else cond & eq
    return keep.join(d, cond, "left_anti")


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
    (minus duplicated equi keys); on outer rows the ``equi`` columns are
    filled from whichever side exists."""
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"unsupported how={how!r}")
    w = int(bin_width_seconds)
    eq = list(equi or [])
    icols_out = [c for c in intervals.columns if c not in eq]

    p = points.withColumn("__bin", F.floor(_epoch(ts_col) / w))
    # empty intervals (end <= start) match nothing under the half-open
    # predicate; filtering them BEFORE the bin explode also prevents
    # sequence()'s descending mode from fanning an inverted interval
    # into every bin between its endpoints
    i = (
        intervals.where(_epoch(end_col) > _epoch(start_col))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(_epoch(start_col) / w),
                    F.floor((_epoch(end_col) - 1) / w),
                )
            ),
        )
    )
    inner = (
        p.join(i, on=["__bin", *eq], how="inner")
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .select(*points.columns, *icols_out)
    )
    if how == "inner":
        return inner

    parts = [inner]
    if how in ("left", "full"):
        unmatched_p = _anti_nullsafe(points, inner.select(*points.columns))
        parts.append(
            unmatched_p.select(
                *points.columns,
                *[
                    F.lit(None).cast(intervals.schema[c].dataType).alias(c)
                    for c in icols_out
                ],
            )
        )
    if how in ("right", "full"):
        # reconstruct the matched interval rows from the inner output:
        # the equi columns are shared with the point side by definition
        matched_i = inner.select(*intervals.columns)
        unmatched_i = _anti_nullsafe(intervals, matched_i)
        pcols_null = [
            F.col(c).alias(c)
            if c in eq
            else F.lit(None).cast(points.schema[c].dataType).alias(c)
            for c in points.columns
        ]
        parts.append(unmatched_i.select(*pcols_null, *icols_out))
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out
