"""Time-series gap filling with LOCF — the hypertable ``locf()`` /
``time_bucket_gapfill()`` analog (beyond the reference surface; its
persisted fact table exists precisely for this kind of longer-period
time-series analysis, README.md:9-12).

Dense time series from sparse events in three relational steps:

1. bucket + aggregate observations (one partial-combined shuffle);
2. per-key spine = explode(sequence(min_bucket, max_bucket, step)) —
   generated, never read, O(buckets) rows per key;
3. left-join observations onto the spine and carry the last non-null
   observation forward (``F.last(ignorenulls=True)`` over an unbounded
   preceding frame — one window pass per key, no self-join).

Scale: shuffle keys for steps 1 and 3 are identical
((key, bucket) hash), and the LOCF window partitions by key only —
state is one row per key. Spine size is keys x buckets regardless of
fact-table size, so the operator's cost is dominated by the one
aggregation scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_STEPS = ("minute", "hour", "day", "week", "month")


def gap_fill_locf(
    df: DataFrame,
    key_cols: list[str | Column],
    ts_col: str,
    values: dict[str, Column],
    step: str = "hour",
) -> DataFrame:
    """Dense per-key time series at ``step`` granularity with LOCF.

    ``values`` maps output names to aggregate expressions evaluated per
    (key, bucket). Output: keys, bucket, <name> (raw, null on gaps),
    <name>_filled (LOCF), is_gap.
    """
    if step not in _STEPS:
        raise ValueError(f"step must be one of {_STEPS}")
    keyed = df.select(
        *[
            c.alias(f"k{i}") if isinstance(c, Column) else F.col(c).alias(f"k{i}")
            for i, c in enumerate(key_cols)
        ],
        F.date_trunc(step, F.col(ts_col)).alias("bucket"),
        "*",
    )
    keys = [f"k{i}" for i in range(len(key_cols))]
    obs = keyed.groupBy(*keys, "bucket").agg(
        *[v.alias(name) for name, v in values.items()]
    )
    spine = (
        obs.groupBy(*keys)
        .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
        .select(
            *keys,
            F.explode(
                F.expr(f"sequence(__lo, __hi, interval 1 {step})")
            ).alias("bucket"),
        )
    )
    joined = spine.join(obs, [*keys, "bucket"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for name in values:
        out = out.withColumn(
            f"{name}_filled", F.last(name, ignorenulls=True).over(w)
        )
    first = next(iter(values))
    return out.withColumn("is_gap", F.col(first).isNull())


def gap_fill_interpolate(
    df: DataFrame,
    key_cols: list[str | Column],
    ts_col: str,
    value: Column,
    value_name: str = "v",
    step: str = "hour",
) -> DataFrame:
    """Like :func:`gap_fill_locf` but gaps are LINEARLY interpolated
    between the surrounding observations (the ``interpolate()``
    companion to ``locf()``). Leading/trailing edges (no observation on
    one side) fall back to the nearest observation.

    Two window passes per key — one backward-looking (previous non-null
    observation and its bucket), one forward-looking — then a pure
    arithmetic projection; still no self-join, state one row per key
    per direction."""
    if step not in _STEPS:
        raise ValueError(f"step must be one of {_STEPS}")
    dense = gap_fill_locf(df, key_cols, ts_col, {value_name: value}, step=step)
    keys = [f"k{i}" for i in range(len(key_cols))]
    v = F.col(value_name)
    obs_bucket = F.when(v.isNotNull(), F.col("bucket"))
    back = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(obs_bucket, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_t = F.first(obs_bucket, ignorenulls=True).over(fwd)
    span = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    frac = (F.unix_timestamp("bucket") - F.unix_timestamp(prev_t)) / span
    # no final rounding: inputs are already rounded, and the bare IEEE
    # expression is bit-reproducible across engines, while ROUND
    # implementations differ by one ulp at 5-at-the-boundary cases
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)  # leading edge
        .when(next_v.isNull(), prev_v)  # trailing edge
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return dense.select(
        *keys,
        "bucket",
        v.alias(value_name),
        interp.alias(f"{value_name}_interp"),
        "is_gap",
    )
