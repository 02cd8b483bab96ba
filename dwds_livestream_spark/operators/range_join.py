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

from pyspark.sql import Column, DataFrame, Window
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


def _bounded_candidates(
    left: DataFrame,
    right: DataFrame,
    bound_seconds: int,
    ts_col: str,
    right_ts_col: str | None,
    equi: list[str] | None,
    right_id_col: str,
    out_id: str = "preceding_id",
    direction: str = "preceding",
) -> DataFrame:
    """Shared candidate stage for the bounded temporal-join family:
    all (left row, right row) pairs with 0 <= left.ts - right.ts <=
    bound (``preceding``) or 0 <= right.ts - left.ts <= bound
    (``following``). Binned shape (see knearest_preceding docstring):
    a qualifying right row lies in the left row's bin or the adjacent
    one, so the right side explodes into exactly 2 bound-width bins
    and candidates come from an equi hash join on (equi, __bin) —
    never a nested loop. Output: left columns + ``__l_us``,
    ``out_id``, ``__r_us``."""
    # Whole seconds only, and loudly: int() truncation would silently
    # narrow ANY fractional bound (2.7 -> 2 excludes rows 2.0-2.7 s
    # back with no signal; a float in (0,1) would even reach w=0 and
    # NULL every bin). Reject instead of narrowing.
    w = int(bound_seconds)
    if w != bound_seconds:
        raise ValueError(
            f"bound_seconds must be a whole number of seconds: "
            f"{bound_seconds!r} (a fractional bound would be silently "
            f"truncated)"
        )
    if w <= 0:
        raise ValueError(f"bound_seconds must be >= 1 second: {bound_seconds!r}")
    rts = right_ts_col or ts_col
    eq = list(equi or [])
    # preceding: rt in [lt-bound, lt] -> right bins {b(rt), b(rt)+1};
    # following: rt in [lt, lt+bound] -> right bins {b(rt), b(rt)-1}
    shift = 1 if direction == "preceding" else -1

    lt_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    rt_us = F.unix_micros(F.col(rts).cast("timestamp"))
    l = left.withColumn("__l_us", lt_us).withColumn(
        "__bin", F.floor(F.col("__l_us") / (w * 1_000_000))
    )
    r = (
        right.select(
            *eq,
            F.col(right_id_col).alias(out_id),
            rt_us.alias("__r_us"),
        )
        .withColumn(
            "__bin",
            F.explode(
                F.array(
                    F.floor(F.col("__r_us") / (w * 1_000_000)),
                    F.floor(F.col("__r_us") / (w * 1_000_000)) + shift,
                )
            ),
        )
    )
    gap = (
        F.col("__l_us") - F.col("__r_us")
        if direction == "preceding"
        else F.col("__r_us") - F.col("__l_us")
    )
    return (
        l.join(r, on=["__bin", *eq], how="inner")
        .where((gap >= 0) & (gap <= w * 1_000_000))
        .drop("__bin")
    )


def _preceding_candidates(
    left: DataFrame,
    right: DataFrame,
    bound_seconds: int,
    ts_col: str,
    right_ts_col: str | None,
    equi: list[str] | None,
    right_id_col: str,
) -> DataFrame:
    return _bounded_candidates(
        left, right, bound_seconds, ts_col, right_ts_col, equi,
        right_id_col, out_id="preceding_id", direction="preceding",
    )


def knearest_preceding(
    left: DataFrame,
    right: DataFrame,
    k: int,
    bound_seconds: int,
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    equi: list[str] | None = None,
    left_id_col: str = "event_id",
    right_id_col: str = "event_id",
) -> DataFrame:
    """Order-book-style temporal join (ROADMAP r6): for every left row,
    the ``k`` nearest PRECEDING right rows within ``bound_seconds`` —
    right.ts <= left.ts and left.ts - right.ts <= bound — ranked
    nearest-first. The as-of join (operators/asof.py) is the k=1,
    unbounded special case; a naive Spark formulation is a theta join
    (BroadcastNestedLoop — unusable when neither side broadcasts).

    Plan (the binned range-join shape above): quantize time into
    ``bound_seconds``-wide bins. A qualifying right row can only lie in
    the left row's bin or the one before it, so the right side explodes
    into exactly 2 (bin, bin+1) rows, an equi hash join on
    (equi, __bin) produces candidates (SortMergeJoin/ShuffledHashJoin,
    never a nested loop), the exact range predicate refines, and a
    per-left-row window keeps rank <= k. Shuffle = |left| + 2|right| +
    candidates; candidates per left row are bounded by the right-rate
    within one bound window. Hot equi keys are the skew risk — same
    mitigation as range_join (salt or widen equi).

    Ranking is deterministic: nearest first (largest right ts), ties on
    ts broken by ascending ``right_id_col``. ``left_id_col`` must
    uniquely identify left rows (it is the rank window's partition
    key — duplicate ids would merge candidate sets and double-count
    neighbors). Output: all left columns + ``rank``, right's id as
    ``preceding_id``, and ``gap_us`` (microseconds, exact integer).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    cand = _preceding_candidates(
        left, right, bound_seconds, ts_col, right_ts_col, equi,
        right_id_col,
    )
    rank_w = Window.partitionBy(left_id_col).orderBy(
        F.desc("__r_us"), F.asc("preceding_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select(
            *left.columns,
            "rank",
            "preceding_id",
            (F.col("__l_us") - F.col("__r_us")).alias("gap_us"),
        )
    )


def preceding_window_agg(
    left: DataFrame,
    right: DataFrame,
    bound_seconds: int,
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    equi: list[str] | None = None,
    right_id_col: str = "event_id",
) -> DataFrame:
    """Attribution-window aggregate — the aggregate twin of
    :func:`knearest_preceding`: for EVERY left row, summary statistics
    of ALL preceding right rows within ``bound_seconds`` (count, mean /
    min / max gap). The feature-engineering shape of the bounded
    temporal join ("clicks in the hour before each purchase"); left
    rows with NO preceding right rows are preserved with n_preceding=0
    and NULL gaps (left outer semantics).

    Plan: the shared binned candidate stage (equi hash join on 2
    bound-width bins — never a nested loop), one map-side-combined
    aggregate on the candidate set keyed by the left row, then one
    left join back to the full left frame so zero-match rows survive.
    Shuffle = |left| + 2|right| + candidates + |matched left| — no
    window at all, so this form is cheaper than the top-k one and is
    the right tool when only aggregates are needed. Gap statistics are
    exact integer microseconds except the mean: the double SUM of
    microsecond gaps is EXACT whenever the total stays under 2^53
    (bound * |matches| — comfortably true for real windows), so the
    mean is one IEEE division + round(6), order-free and
    engine-identical. Left rows are identified by their full column
    tuple in the join-back; NULL-bearing left rows would fail the
    equi join back — keep objective/time/key columns non-null (the
    registry query selects non-null columns only). For the same
    reason left rows must be DISTINCT as full tuples: two identical
    left rows collapse into one group whose candidate set holds both
    copies' matches, so each surviving row would report a doubled
    n_preceding (same uniqueness contract as knearest_preceding's
    ``left_id_col`` — add a generated per-row id column if the input
    can carry exact duplicates).
    """
    cand = _preceding_candidates(
        left, right, bound_seconds, ts_col, right_ts_col, equi,
        right_id_col,
    )
    gap = F.col("__l_us") - F.col("__r_us")
    per_left = (
        cand.groupBy(*left.columns)
        .agg(
            F.count("*").alias("n_preceding"),
            F.round(
                F.sum(gap.cast("double")) / F.count("*"), 6
            ).alias("mean_gap_us"),
            F.min(gap).alias("min_gap_us"),
            F.max(gap).alias("max_gap_us"),
        )
    )
    return (
        left.join(per_left, on=left.columns, how="left")
        .withColumn("n_preceding", F.coalesce("n_preceding", F.lit(0)))
    )


def knearest_following(
    left: DataFrame,
    right: DataFrame,
    k: int,
    bound_seconds: int,
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    equi: list[str] | None = None,
    left_id_col: str = "event_id",
    right_id_col: str = "event_id",
) -> DataFrame:
    """Forward twin of :func:`knearest_preceding`: for every left row,
    the ``k`` nearest FOLLOWING right rows within ``bound_seconds`` —
    left.ts <= right.ts and right.ts - left.ts <= bound — ranked
    nearest-first (smallest right ts; ties by ascending
    ``right_id_col``). The "what happened next" feature shape
    (next-action windows, response-time joins). Identical binned plan
    and determinism contract as the preceding form; ``left_id_col``
    must uniquely identify left rows. Output: all left columns +
    ``rank``, ``following_id``, ``gap_us``."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    cand = _bounded_candidates(
        left, right, bound_seconds, ts_col, right_ts_col, equi,
        right_id_col, out_id="following_id", direction="following",
    )
    rank_w = Window.partitionBy(left_id_col).orderBy(
        F.asc("__r_us"), F.asc("following_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select(
            *left.columns,
            "rank",
            "following_id",
            (F.col("__r_us") - F.col("__l_us")).alias("gap_us"),
        )
    )
