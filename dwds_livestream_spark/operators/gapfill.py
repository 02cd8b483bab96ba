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
